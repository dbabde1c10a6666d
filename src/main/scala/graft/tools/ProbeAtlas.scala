package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.argo.Atlas

/** Stage-level timing breakdown of the atlas queries (q71-q74): splits
  * interp / pair-join / TS-agg / EAPE passes so a slow total can be
  * attributed to a stage instead of guessed at. Scratch tool, not API. */
object ProbeAtlas {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Warmup.run() // C2-compile the kernels, as Bench does
    val profiles = graft.queries.ArgoQueries.profilesProbe(spark, sfDir)
    val atlas = new Atlas(box = (-20.0, 50.0, -50.0, -20.0), reso = 5.0)
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      time("summary+interp")(profiles.count())
      val cached = profiles.persist()
      cached.count()
      time("pairs")(atlas.pairs(spark, cached).count())
      time("climTS (pairs+agg)")(
        atlas.climTS(spark, cached).filter(col("CT") =!= 0.0f).count())
      time("climEAPE R14")(
        atlas.climEAPE(spark, cached, "R14").filter(col("SIGSTAR") =!= 0.0f).count())
      time("climEAPE T25")(
        atlas.climEAPE(spark, cached, "T25").filter(col("SIGSTAR") =!= 0.0f).count())
      cached.unpersist(blocking = true)
    }
    spark.stop()
  }
}
