package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

// Scratch: where the q71-via-AtlasStore wall goes (BENCH_r07 measured the
// store path SLOWER than the cold recompute at sf0.1: 1.65 vs 1.09 s).
// Splits the store path into its stages — bare bucketed scan, scan +
// pack3 projection, the full pair join + aggregation — and times the
// recompute path's stages next to them. Backs the crossover analysis in
// SCALING.md.
object ProbeAtlasStore {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    spark.read.parquet(s"$sf/orders.parquet").count() // warm
    val atlas = graft.queries.ArgoQueries.ExportAtlas
    val dir = graft.TempDirs.create("graft-probe-store").toString
    def t(label: String)(body: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (dt, n) = runs.minBy(_._1)
      println(f"[store] $label%-28s $dt%6.2f s ($n rows; runs ${runs.map(r => f"${r._1}%.2f").mkString(", ")})")
    }
    try {
      val prof = graft.queries.ArgoQueries.profilesProbe(spark, sf)
      t("pipeline recompute")(prof.count())
      graft.argo.AtlasStore.saveBucketed(prof, atlas, "probe_atlasstore",
        buckets = 32, path = Some(s"$dir/atlas"))
      val store = graft.argo.AtlasStore.loadBucketed(spark, "probe_atlasstore")
      t("store scan (count)")(store.count())
      t("store scan (arrays)")(store.agg(sum(size(col("CT")))).head().getLong(0))
      t("climTS over store")(atlas.climTS(spark, store)
        .filter(col("CT") =!= 0.0f).count())
      t("climTS over recompute")(atlas.climTS(spark, prof)
        .filter(col("CT") =!= 0.0f).count())
      spark.conf.set("spark.graft.atlasStore", s"$sf=probe_atlasstore")
      t("q71 via store")(SparkEntry.queries("q71_argo_atlas")(spark, sf).count())
      spark.conf.unset("spark.graft.atlasStore")
      t("q71 via memo")(SparkEntry.queries("q71_argo_atlas")(spark, sf).count())
      // marginal rates: at 1x the bucketed scan is OVERHEAD-bound (~500
      // rows/bucket file) — the 10x numbers give the per-profile rates
      // the crossover argument needs
      val p10 = prof.crossJoin(
        spark.range(10).select(col("id").as("__rep")))
        .withColumn("WMO", col("WMO") + col("__rep").cast("int") * 1000000)
        .drop("__rep")
      graft.argo.AtlasStore.saveBucketed(p10, atlas, "probe_atlasstore10",
        buckets = 32, path = Some(s"$dir/atlas10"))
      val store10 = graft.argo.AtlasStore.loadBucketed(spark, "probe_atlasstore10")
      t("store scan 10x (arrays)")(store10.agg(sum(size(col("CT")))).head().getLong(0))
      // (the 10x interp recompute is NOT timed here: the pipeline's
      // kernel rate is already a published stage metric —
      // interp_profiles_per_sec — and is linear in profiles)
      // plan shapes, for the join-strategy check
      println("=== store plan ===")
      atlas.climTS(spark, store).explain("formatted")
    } finally {
      spark.sql("DROP TABLE IF EXISTS probe_atlasstore"); spark.sql("DROP TABLE IF EXISTS probe_atlasstore10")
      graft.Bench.deleteRec(dir)
    }
    spark.stop()
  }
}
