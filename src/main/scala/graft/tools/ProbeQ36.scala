package graft.tools

object ProbeQ36 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q36_ngram_jaccard")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("== document scans: " + "Scan parquet".r.findAllIn(p).size)
    println("== reused refs: " + "ShuffleQueryStage [0-9]+, Statistics".r.findAllIn(p).size)
    println(p.linesIterator.filter(l =>
      l.contains("Scan parquet") || l.contains("Exchange") ||
        l.contains("ShuffleQueryStage") || l.contains("Reused"))
      .mkString("\n"))
  }
}
