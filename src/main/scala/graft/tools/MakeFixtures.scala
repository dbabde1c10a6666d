package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.queries.FixtureOracle

/** Regenerates the golden-fixture parquet under fixtures/sf&#42; for every
  * fixture-verified query (see [[graft.queries.FixtureOracle]]). Run after
  * any change to the numeric kernels or the atlas aggregation:
  *
  *   sbt "runMain graft.tools.MakeFixtures"
  *
  * The outputs are deterministic (per-row kernels + fixed-point
  * aggregation), so a diff in regenerated fixtures IS a semantic change. */
object MakeFixtures {
  val FixtureQueries: Seq[String] = Seq(
    "q45_ann_ivf_kmeans", "q69_pq_ann", "q78_ivfpq_ann", "q95_bpe_train",
    "q99_pca_project", "q103_bpe_tokenize", "q104_quality_classifier",
    "q107_pca_ann",
    "q47_countmin_hh", "q49_hll_distinct",
    "q61_cubic_spline", "q62_gammat",
    "q63_pchip_interp", "q64_mr_pchip", "q70_argo_interp", "q71_argo_atlas",
    "q72_argo_eape_r14", "q73_argo_eape_t25", "q74_argo_atlas_masked")

  def main(args: Array[String]): Unit = {
    val testRoot = args.headOption.getOrElse("/root/testdata")
    // optional 2nd arg: comma-separated name prefixes — regenerate ONLY
    // those fixtures (adding one query shouldn't churn every committed
    // part-file name; results are deterministic, so a partial regen can
    // never drift the others)
    val only = args.lift(1).map(_.split(",").toSeq)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((sf, _) <- FixtureOracle.Scales;
         name <- FixtureQueries if only.forall(_.exists(name.startsWith))) {
      val df = SparkEntry.queries(name)(spark, s"$testRoot/$sf")
      df.coalesce(1).write.mode("overwrite")
        .parquet(s"${FixtureOracle.Root}/$sf/$name.parquet")
      println(s"fixture $sf/$name written")
    }
    spark.stop()
  }
}
