package graft.tools

import graft.{GraftSession, Tables}

// Scratch: registered-path timing of the q97/q102 store branch against
// the cold rebuild — the decision probe that landed the round-10
// inversion fix (VERDICT r9 task 2). Times the REAL registered queries,
// not a reconstruction. The strategy knob it once swept is gone: the
// landed branch is scan-only + df sidecars (see ProbeTermStore's header
// for the full measurement history).
object ProbeTermStore2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ts2] $tag%-36s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    spark.read.parquet(s"$d/documents.parquet").count() // warm
    val dir = graft.TempDirs.create("graft-probe-ts2").toString
    try {
      graft.sources.TermStore.saveBucketed(
        Tables.documents(spark, d), "probe_termstore2",
        buckets = 32, path = Some(s"$dir/terms"))
      def forceCold(): Unit = {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        graft.queries.TextQueries.invalidateSessionMemos(spark)
        spark.sharedState.cacheManager.clearCache()
      }
      // cold baseline (conf unset): full rebuild per rep
      (1 to 2).foreach { r =>
        forceCold()
        time(s"cold q97 rep$r") {
          graft.SparkEntry.queries("q97_sparse_cosine")(spark, d).count()
        }
      }
      // the LANDED store branch (scan-only + df sidecars; the round-10
      // strategy knob is gone — persist/pinned lost, see ProbeTermStore's
      // header note). Historical strategy minima at this scale: persist
      // 3.64 s, pinned 3.00 s, scan-only (no sidecars) 1.78 s.
      spark.conf.set("spark.graft.termStore", s"$d=probe_termstore2")
      forceCold()
      (1 to 3).foreach { r =>
        time(s"store q97 rep$r") {
          graft.SparkEntry.queries("q97_sparse_cosine")(spark, d).count()
        }
      }
      time("store q102 warm") {
        graft.SparkEntry.queries("q102_hybrid_rank")(spark, d).count()
      }
    } finally {
      graft.sources.TermStore.tablesOf("probe_termstore2")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      graft.TempDirs.deleteRec(dir)
      spark.stop()
    }
  }
}
