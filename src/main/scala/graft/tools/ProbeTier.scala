package graft.tools

import graft.{GraftSession, SparkEntry}

// Scratch: executed-plan dump of the two-tier df join (q97/q102) under the
// default / all-head / all-tail spark.graft.dfHeadPct settings.
object ProbeTier {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    for (pct <- Seq("2", "-1", "101"); q <- Seq("q97_sparse_cosine", "q102_hybrid_rank")) {
      spark.conf.set("spark.graft.dfHeadPct", pct)
      val df = SparkEntry.queries(q)(spark, d)
      val rows = df.collect()
      println(s"===== $q dfHeadPct=$pct rows=${rows.length} hash=${rows.toSeq.hashCode} =====")
      if (pct == "2") println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
