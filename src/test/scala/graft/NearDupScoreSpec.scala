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

  test("BYTE budget alone forces the distributed branch, output-invariant (r15)") {
    // the r15 byte-aware cap (Joins.maxRowsSized): a corpus whose
    // rows × estimated width exceed spark.graft.broadcastMaxBytes must
    // take the join/salt path even when the ROW cap would admit it —
    // this corpus is 4,000 rows against the 2M row cap, so pinning the
    // byte budget to 1 exercises exactly the byte term
    val d = "/root/testdata/sf0.001"
    import spark.implicits._
    def pairs(): Seq[(Long, Long, Long)] =
      graft.queries.EmbeddingQueries.nearDupPairs(spark, d)
        .as[(Long, Long, Long)].collect().toSeq.sorted
    val fast = pairs()
    val prior = spark.conf.getOption("spark.graft.broadcastMaxBytes")
    spark.conf.set("spark.graft.broadcastMaxBytes", "1")
    val overByte = try pairs()
    finally prior match {
      case Some(v) => spark.conf.set("spark.graft.broadcastMaxBytes", v)
      case None => spark.conf.unset("spark.graft.broadcastMaxBytes")
    }
    assert(fast == overByte,
      "byte-capped distributed branch diverged from the driver-model path")
  }
}
