package graft

import org.apache.spark.sql.functions._

import graft.operators.Logit

class LogitSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 3

  /** Linearly separable hash-driven data: y = 1 iff x1 + x2 > 1. */
  private def data(n: Int) = {
    (0 until n).map { i =>
      val x1 = (i * 7919 % 101) / 100.0
      val x2 = (i * 104729 % 97) / 96.0
      val y = if (x1 + x2 > 1.0) 1.0 else 0.0
      (i.toLong, Seq(1.0, x1, x2), y)
    }.toDF("id", "x", "y")
  }

  test("learns a separating boundary on separable data") {
    val df = data(400)
    val w = Logit.fit(df, "x", "y", dim, iters = 200, lr = 4.0)
    val scored = Logit.score(df, w, "x", "s")
      .select($"y", ($"s" >= 500000L).as("pred"))
      .as[(Double, Boolean)].collect()
    val acc = scored.count { case (y, p) => (y == 1.0) == p }.toDouble / scored.length
    assert(acc >= 0.95, s"accuracy $acc, weights ${w.toSeq}")
    // the boundary direction is learned: positive slope on both features
    assert(w(1) > 0 && w(2) > 0, w.toSeq)
  }

  test("fit is bit-identical across partitionings and vs the driver path") {
    val df = data(300)
    val a = Logit.fit(df.repartition(1), "x", "y", dim, 25, 2.0,
      allowDriverFastPath = false)
    val b = Logit.fit(df.repartition(7, $"id"), "x", "y", dim, 25, 2.0,
      allowDriverFastPath = false)
    val drv = Logit.fit(df, "x", "y", dim, 25, 2.0)
    assert(a.toSeq === b.toSeq, "distributed loop not partition-invariant")
    assert(a.toSeq === drv.toSeq, "driver fast path drifted from the loop")
  }

  test("score is the µ-rounded sigmoid of w·x") {
    val df = Seq((0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(1.0, 1.0, 1.0)))
      .toDF("id", "x")
    val w = Array(0.0, 1.0, -1.0)
    val s = Logit.score(df, w, "x", "s").orderBy($"id")
      .select($"s").as[Long].collect()
    assert(s(0) === 500000L) // σ(0) = 0.5
    assert(s(1) === 500000L) // σ(1·1 + (−1)·1) = σ(0)
    val w2 = Array(2.0, 0.0, 0.0)
    val s2 = Logit.score(df, w2, "x", "s").select($"s").as[Long].collect()
    val expect = graft.functions.FP.roundHalfAway(1e6 / (1.0 + math.exp(-2.0)))
    assert(s2.forall(_ === expect))
  }
}
