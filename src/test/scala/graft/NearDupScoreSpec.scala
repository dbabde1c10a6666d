package graft

/** The embedding near-dup pair set must be branch-invariant (r14): under
  * the broadcast cap the candidate join broadcasts and scoring runs
  * through the driver model (vec_id → packed vector/norm, compiled
  * DotPackedExpr.dot per pair); past the cap candidates salt-join and
  * scoring joins the packed payloads back in. Same packed bytes, same
  * fold, same rounding — so forcing the at-scale branch must reproduce
  * the fast path bit-for-bit, the PageRankSpec fast≡loop discipline. */
class NearDupScoreSpec extends SparkSuite {
  import spark.implicits._

  test("driver-model scoring ≡ salted-join + payload-join scoring, bit-for-bit") {
    val d = "/root/testdata/sf0.001"
    def pairs(): Seq[(Long, Long, Long)] =
      graft.queries.EmbeddingQueries.nearDupPairs(spark, d)
        .as[(Long, Long, Long)].collect().toSeq.sorted
    val fast = pairs() // default cap: broadcast candidates + driver model
    val prior = spark.conf.getOption("spark.graft.broadcastMaxRows")
    spark.conf.set("spark.graft.broadcastMaxRows", "0")
    val slow = try pairs() // forced: salted candidate join + payload joins
    finally prior match {
      case Some(v) => spark.conf.set("spark.graft.broadcastMaxRows", v)
      case None => spark.conf.unset("spark.graft.broadcastMaxRows")
    }
    assert(fast == slow,
      "scoring branches diverged — the cap must be output-invisible")
    assert(fast.nonEmpty, "degenerate fixture: no near-dup pairs at all")
  }
}
