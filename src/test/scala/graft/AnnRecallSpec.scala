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
class AnnRecallSpec extends SparkSuite {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

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

  test("near-dup pair generation finds essentially all true near-duplicates") {
    // plant a near-duplicate of every vector (one dimension nudged —
    // cosine ≈ 0.999) and require the multi-table candidates to surface
    // ≥ 95% of the planted pairs. Theory: one 4-bit table catches a
    // cos≈0.999 pair with prob ~0.91; four tables ~1-1e-4. A single
    // table's miss rate (~9%) would flunk this; so would any plane
    // degeneration that piles everything into shared buckets and then
    // times out, or splits true pairs across buckets.
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val copies = emb
      .withColumn("vec_id", col("vec_id") + n)
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          when(i === 0, x * 1.05f).otherwise(x)))
    val dir = java.nio.file.Files.createTempDirectory("graft-recall").toString
    emb.unionByName(copies).coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val pairs = graft.queries.EmbeddingQueries.nearDupPairs(spark, dir)
      .select(col("d1"), col("d2")).as[(Long, Long)].collect().toSet
    val found = (0L until n).count(i => pairs.contains((i, i + n)))
    val recall = found.toDouble / n
    assert(recall >= 0.95,
      f"planted near-dup recall $recall%.3f ($found of $n) under the 0.95 floor")
  }
}
