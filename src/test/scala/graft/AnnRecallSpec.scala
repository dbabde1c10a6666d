package graft

import org.apache.spark.sql.functions._

/** Index QUALITY floors for the LSH family — the properties the oracle
  * gate structurally cannot see (the oracles mirror the index definition,
  * so an index that finds nothing can still hash-match). Round 6's plane
  * fix made bucket occupancy real; these tests keep the recall side
  * honest: a regression to degenerate planes, a dropped table, or an
  * over-tight bucket would fail here even with every oracle green.
  * Deterministic: fixed corpus + deterministic planes → exact reruns.
  */
class AnnRecallSpec extends SparkSuite
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  @volatile private var plantedBuilt = false

  test("q41 multi-table LSH recall@3 vs the q40 ground truth stays above the floor") {
    // measured 0.967 on this corpus with Hamming-1 multiprobe (history:
    // single-table 6-bit 0.07; 4×4-bit multi-table 0.40 — the
    // pre-round-6 plane family measured high ONLY because its two
    // degenerate buckets made half the corpus a candidate)
    val truth = SparkEntry.queries("q40_knn_bruteforce")(spark, d)
      .filter(col("rank") <= 3).select(col("q_id"), col("n_id"))
    val approx = SparkEntry.queries("q41_ann_lsh")(spark, d)
      .select(col("q_id"), col("n_id")).withColumn("hit", lit(1))
    val r = truth.join(approx, Seq("q_id", "n_id"), "left")
      .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("h"))
      .head()
    val recall = r.getLong(1).toDouble / r.getLong(0)
    info(f"q41 recall@3 = $recall%.3f")
    assert(recall >= 0.7, f"q41 recall@3 degraded to $recall%.3f (floor 0.7)")
  }

  /** Corpus with a planted near-duplicate of every vector (one dimension
    * nudged — cosine ≈ 0.999), landed ONCE and shared by both recall
    * tests (the corpus does not depend on the bits knob). (dir, n):
    * planted pair i ↔ i+n. Cleaned up in [[afterAll]]. */
  private lazy val plantedCorpus: (String, Long) = {
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val copies = emb
      .withColumn("vec_id", col("vec_id") + n)
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          when(i === 0, x * 1.05f).otherwise(x)))
    val dir = graft.TempDirs.create("graft-recall").toString
    emb.unionByName(copies).coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    plantedBuilt = true
    (dir, n)
  }

  override protected def afterAll(): Unit = {
    // guard: touching the lazy here would BUILD the corpus just to
    // delete it when no recall test ran
    try if (plantedBuilt) Bench.deleteRec(plantedCorpus._1)
    finally super.afterAll()
  }

  private def plantedRecall(dir: String, n: Long): Double = {
    val pairs = graft.queries.EmbeddingQueries.nearDupPairs(spark, dir)
      .select(col("d1"), col("d2")).as[(Long, Long)].collect().toSet
    (0L until n).count(i => pairs.contains((i, i + n))).toDouble / n
  }

  test("near-dup pair generation finds essentially all true near-duplicates") {
    // require the multi-table candidates to surface ≥ 95% of the planted
    // pairs. Theory: one 4-bit table catches a cos≈0.999 pair with prob
    // ~0.91; four tables ~1-1e-4. A single table's miss rate (~9%) would
    // flunk this; so would any plane degeneration that piles everything
    // into shared buckets and then times out, or splits true pairs
    // across buckets.
    val (dir, n) = plantedCorpus
    val recall = plantedRecall(dir, n)
    info(f"planted pair recall at default bits = $recall%.3f")
    assert(recall >= 0.95,
      f"planted near-dup recall $recall%.3f under the 0.95 floor")
  }

  test("near-dup pair recall holds at the deployment density (8 bits per table)") {
    // the bits the scale10 stage MEASURES and a 10x-denser corpus runs
    // (and, set at JVM launch, the oracle gate verifies) — recall there
    // was previously argued from the random-hyperplane formula only
    // (per-table (1-θ/π)^8 ≈ 0.89 at cos 0.999; four tables ≈ 1-1.4e-4).
    // This pins it empirically: a miss would mean the centered
    // deterministic planes behave worse than the formula at depth 8.
    val (dir, n) = plantedCorpus
    spark.conf.set("spark.graft.nearDupBits", "8")
    try {
      val recall = plantedRecall(dir, n)
      info(f"planted pair recall at 8 bits = $recall%.3f")
      assert(recall >= 0.95,
        f"planted near-dup recall at 8 bits $recall%.3f under the 0.95 floor")
    } finally spark.conf.unset("spark.graft.nearDupBits")
  }
}
