package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off plan probe for q113 (MMR re-rank): how many times does the
  * physical plan SCAN the embeddings parquet, and does ReuseExchange
  * dedupe the repeated shortlist subtree? Measurement harness only. */
object ProbeMmr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q113_mmr_rerank")(
      spark, "/root/testdata/sf0.01")
    df.count() // let AQE finalize
    val p = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).size
    val reused = "ReusedExchange".r.findAllIn(p).size
    println(s"[probe-mmr] parquet scans=$scans reusedExchanges=$reused")
    println(p.linesIterator.filter(l =>
      l.contains("Scan parquet") || l.contains("ReusedExchange") ||
        l.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
