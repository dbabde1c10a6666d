package graft

import org.apache.spark.sql.functions._

import graft.plans.BandJoinRewrite

/** [[graft.plans.BandJoinRewrite]]: the naive |a−b| ≤ c theta-join must
  * become a binned equi-join with EXACTLY the naive pair set — including
  * negative values (floor vs truncating division), the inclusive/exclusive
  * boundary, and values sitting exactly on bin edges. */
class BandJoinSpec extends SparkSuite {
  import spark.implicits._

  BandJoinRewrite.ensure(spark)

  /** Hash-driven longs, mixed signs, dense enough for real bands, plus
    * exact bin-edge and boundary-distance values. */
  private val as: Seq[Long] =
    (0 until 120).map(i => (i * 7919L % 997) * 13 - 6000) ++
      Seq(-100L, -1L, 0L, 1L, 100L, 99L, -99L, 200L)
  private val bs: Seq[Long] =
    (0 until 140).map(i => (i * 104729L % 991) * 11 - 5200) ++
      Seq(-199L, -100L, 0L, 100L, 199L, 299L)
  private val C = 100L

  private def naivePairs(le: Boolean): Set[(Long, Long)] =
    (for { a <- as; b <- bs
           if (if (le) math.abs(a - b) <= C else math.abs(a - b) < C) }
      yield (a, b)).toSet

  test("rewritten join emits exactly the naive pair multiset (<=)") {
    val df = as.toDF("a").crossJoin(bs.toDF("b"))
      .filter(abs(col("a") - col("b")) <= lit(C))
    val got = df.as[(Long, Long)].collect().toSet
    assert(got === naivePairs(le = true))
    assert(got.nonEmpty)
  }

  test("strict < keeps the boundary pairs out") {
    val df = as.toDF("a").crossJoin(bs.toDF("b"))
      .filter(abs(col("a") - col("b")) < lit(C))
    val got = df.as[(Long, Long)].collect().toSet
    assert(got === naivePairs(le = false))
    // the exact-distance pairs exist in the data and are excluded
    assert(naivePairs(le = true).size > got.size)
  }

  test("the naive form plans as an equi-join, not a nested loop") {
    val df = as.toDF("a").crossJoin(bs.toDF("b"))
      .filter(abs(col("a") - col("b")) <= lit(C))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("Long-extreme values neither overflow nor change the pair set") {
    // width-c bins would compute Long.MaxValue + 1 on the explode side
    // for c = 1 (ANSI abort); the 2c width keeps every bin at ≤ 2⁶²
    val ext = Seq(Long.MaxValue, Long.MaxValue - 1, Long.MinValue,
      Long.MinValue + 1, 0L, 1L)
    val df = ext.toDF("a").crossJoin(ext.toDF("b"))
      .filter(abs(col("a") - col("b")) <= lit(1L))
    // the re-applied a−b itself overflows under ANSI for far-apart pairs
    // in the NAIVE plan too — the rewrite must only ever see pairs whose
    // bins adjoin, so the in-band pairs come back and nothing throws
    val got = df.as[(Long, Long)].collect().toSet
    val want = (for { a <- ext; b <- ext
                      if (BigInt(a) - BigInt(b)).abs <= 1 } yield (a, b)).toSet
    assert(got === want)
    assert(want.size === 12) // 6 self-pairs + 3 adjacent pairs × 2 orders
  }

  test("declines when the join already carries an inter-side equi-key") {
    // A keyed interval join written with abs(): the equi-key already gives
    // Spark a selective hash join — the x3 explode + bin shuffle could
    // only regress it, so the rule must leave the plan alone. Pair set is
    // identical either way; what's pinned is the ABSENCE of the band
    // machinery (its Tag-prefixed helper columns) from the plan.
    val l = Seq((1L, 10L), (2L, 20L), (2L, 205L)).toDF("k", "a")
    val r = Seq((1L, 15L), (2L, 100L), (2L, 210L)).toDF("k", "b")
    val df = l.join(r, l("k") === r("k") &&
      abs(col("a") - col("b")) <= lit(C))
    val got = df.select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 15L), (20L, 100L), (205L, 210L)))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__band_"),
      s"equi-keyed join must not be band-rewritten:\n$plan")
  }

  test("declines gracefully when it cannot help") {
    // double operands: left to run as written (still correct)
    val dd = Seq(0.5, 1.5, 99.9).toDF("a")
      .crossJoin(Seq(0.6, 120.0).toDF("b"))
      .filter(abs(col("a") - col("b")) <= lit(1L))
    assert(dd.count() === 2) // (0.5,0.6), (1.5,0.6)
    // non-positive threshold: equality-only band, left as written
    val z = Seq(5L, 6L).toDF("a").crossJoin(Seq(5L).toDF("b"))
      .filter(abs(col("a") - col("b")) <= lit(0L))
    assert(z.count() === 1)
  }
}
