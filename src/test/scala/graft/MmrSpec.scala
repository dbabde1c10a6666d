package graft

import org.apache.spark.sql.functions._

/** Properties of q113 (MMR diversified re-rank) the oracle gate cannot
  * see. The oracle proves the engine walks the exact greedy MMR
  * trajectory; these tests pin WHY the re-rank is the production-correct
  * retrieval answer, and that its plan carries no corpus-scale rework:
  *  - the diversification DOES something on this corpus: the MMR set
  *    differs from the plain relevance top-4 for a substantial share of
  *    probes (the embedding clusters make near-duplicate answers the
  *    common case, which is the operator's reason to exist);
  *  - the selected set is measurably more diverse: mean pairwise
  *    similarity within the MMR 4 is strictly below the plain top-4's;
  *  - relevance is not sacrificed where it matters: rank 1 is always
  *    the pure-relevance winner (MMR's first step has no penalty term);
  *  - per-probe output is exactly 4 distinct neighbors, ranks 1..4;
  *  - the K unrolled stages reuse ONE materialized shortlist — the final
  *    plan contains no parquet scan at all (the un-checkpointed unroll
  *    measured 15 corpus passes: the subtree doubles per stage and
  *    ReuseExchange does not dedupe across branches).
  */
class MmrSpec extends SparkSuite {
  private val d = "/root/testdata/sf0.001"

  private def mmr = SparkEntry.queries("q113_mmr_rerank")(spark, d)

  /** Plain relevance top-4 per probe from the verified q40 shape (its
    * committed k is 5, so take ranks 1..4). */
  private def plain = SparkEntry.queries("q40_knn_bruteforce")(spark, d)
    .filter(col("rank") <= 4)

  /** Mean pairwise cosine among each probe's selected set, averaged over
    * probes — the diversity metric MMR trades relevance against. */
  private def meanPairwiseSim(sel: org.apache.spark.sql.DataFrame): Double = {
    val e = Tables.embeddings(spark, d).select(
      col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val withVec = sel.select(col("q_id"), col("n_id"))
      .join(e, sel("n_id") === e("vec_id")).select(col("q_id"), col("n_id"),
        col("vec"), functions.VecFns.norm(col("vec")).as("nrm"))
    val a = withVec.select(col("q_id"), col("n_id").as("i"),
      col("vec").as("vi"), col("nrm").as("ni"))
    val b = withVec.select(col("q_id"), col("n_id").as("j"),
      col("vec").as("vj"), col("nrm").as("nj"))
    a.join(b, Seq("q_id")).filter(col("i") < col("j"))
      .select((functions.VecFns.dot(col("vi"), col("vj")) /
        (col("ni") * col("nj"))).as("cos"))
      .agg(avg(col("cos"))).head().getDouble(0)
  }

  test("MMR actually diversifies: selected sets differ from plain top-4 and are less self-similar") {
    val changed = mmr.select(col("q_id"), col("n_id"))
      .exceptAll(plain.select(col("q_id"), col("n_id")))
      .select(col("q_id")).distinct().count()
    val probes = mmr.select(col("q_id")).distinct().count()
    info(s"$changed of $probes probes get a different set than plain top-4")
    assert(changed > 0, "MMR never changed any probe's answer — " +
      "the diversity term is dead")
    val simMmr = meanPairwiseSim(mmr)
    val simPlain = meanPairwiseSim(plain)
    info(f"mean pairwise cosine: MMR $simMmr%.4f vs plain top-4 $simPlain%.4f")
    assert(simMmr < simPlain,
      f"MMR set ($simMmr%.4f) should be less self-similar than plain top-4 ($simPlain%.4f)")
  }

  test("rank 1 is the pure-relevance winner; each probe gets exactly 4 distinct neighbors, ranks 1..4") {
    val top1 = plain.filter(col("rank") === 1)
      .select(col("q_id"), col("n_id"))
    val mismatched = mmr.filter(col("mmr_rank") === 1)
      .select(col("q_id"), col("n_id"))
      .exceptAll(top1).count()
    assert(mismatched == 0,
      s"$mismatched probes' MMR rank 1 differs from the relevance winner")
    val bad = mmr.groupBy("q_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("n_id")).as("nd"),
        min(col("mmr_rank")).as("mn"), max(col("mmr_rank")).as("mx"))
      .filter(col("n") =!= 4 || col("nd") =!= 4 ||
        col("mn") =!= 1 || col("mx") =!= 4)
      .count()
    assert(bad == 0, s"$bad probes violate the 4-distinct-ranks contract")
  }

  test("the in-row kernel at K=4 over the same shortlist equals the unrolled q113 bit-for-bit") {
    // The two MMR forms must be the SAME function: identical packed dot,
    // identical nano rounding, identical integer score and tie-break —
    // so the kernel (the K≥8 production form, q119) is pinned against
    // the fully oracle-verified unrolled trajectory at the one K where
    // both exist. Row-for-row equality including scores, not just sets.
    val kern = queries.EmbeddingQueries.mmrKernel(
      queries.EmbeddingQueries.mmrShortlistProbe(spark, d, 8), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    val unrolled = mmr
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(kern == unrolled,
      "kernel MMR must walk the identical greedy trajectory as the unrolled form")
    assert(unrolled.nonEmpty)
  }

  test("q119 (K=8 kernel): 8 distinct neighbors per probe, rank 1 is the relevance winner") {
    val k8 = SparkEntry.queries("q119_mmr_kernel")(spark, d)
    val bad = k8.groupBy("q_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("n_id")).as("nd"),
        min(col("mmr_rank")).as("mn"), max(col("mmr_rank")).as("mx"))
      .filter(col("n") =!= 8 || col("nd") =!= 8 ||
        col("mn") =!= 1 || col("mx") =!= 8)
      .count()
    assert(bad == 0, s"$bad probes violate the 8-distinct-ranks contract")
    val top1 = plain.filter(col("rank") === 1).select(col("q_id"), col("n_id"))
    val mismatched = k8.filter(col("mmr_rank") === 1)
      .select(col("q_id"), col("n_id")).exceptAll(top1).count()
    assert(mismatched == 0,
      s"$mismatched probes' K=8 rank 1 differs from the relevance winner")
  }

  test("the unrolled stages read the checkpointed shortlist: no parquet scan in the final plan") {
    val df = mmr
    df.count() // let AQE finalize the plan
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Scan parquet"),
      s"q113's plan re-scans parquet above the shortlist checkpoint:\n$p")
  }
}
