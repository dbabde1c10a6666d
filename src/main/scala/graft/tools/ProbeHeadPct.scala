package graft.tools

import graft.{Bench, GraftSession, SparkEntry}

// Scratch: sensitivity of the two-tier df join's head/tail split point
// (spark.graft.dfHeadPct) — q97 on the scale10 corpus at head 1 / 2 / 5.
// Backs the measured knob table in SCALING.md: the head percent trades
// broadcast-side size (terms in > pct of docs ride the broadcast tier)
// against shuffle-side skew (the worst surviving tail key is pct of the
// corpus). Results are conf-independent (ProbeTier-pinned parity), so
// this is purely a wall-clock probe.
object ProbeHeadPct {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    spark.read.parquet(s"$sf/documents.parquet").count() // warm
    val dir = Bench.buildScale10(spark, sf)
    println(s"[headpct] scale10 corpus at $dir")
    try {
      for (pct <- Seq(1, 2, 5)) {
        spark.conf.set("spark.graft.dfHeadPct", pct.toString)
        // fresh session memos would be ideal, but the forward index is
        // head-pct-independent (the memo is upstream of the split), so a
        // shared warm index is exactly what a deployment's repeated
        // retrieval passes see — and lets this probe isolate the join tiers
        val dts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val n = SparkEntry.queries("q97_sparse_cosine")(spark, dir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          require(n > 0, "empty q97")
          dt
        }
        println(f"[headpct] head=$pct%d%%  min=${dts.min}%6.2f s  runs=${dts.map(d => f"$d%.2f").mkString(", ")}")
      }
    } finally Bench.deleteRec(dir) // a probe must not leak a corpus-sized tree per run
    spark.stop()
  }
}
