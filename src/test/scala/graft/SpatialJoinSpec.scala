package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Geo, HaversineArgExpr}
import graft.plans.SpatialJoinRewrite

/** The distance theta-join rewrite (graft.plans.SpatialJoinRewrite).
  *
  * Ground truth is the SAME query expressed with the composed built-in
  * [[Geo.haversineArg]] — the rule cannot match that form, so it executes
  * as a genuine nested-loop join; [[HaversineArgExpr]] is bit-identical to
  * it, so the rewritten plan must return the exact same pair set. The data
  * deliberately covers the two classic under-coverage traps: the ±180°
  * dateline (bin wrap) and high latitude (longitude fan-out must widen
  * with 1/cos φ).
  */
class SpatialJoinSpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic probe points: a global spread, a cluster straddling the
    * ±180° dateline, and a cluster inside the polar cap. */
  private def points(n: Int, seed: Int): DataFrame = {
    val k = col("id") * 7919 + seed * 131
    spark.range(n.toLong).select(
      col("id").cast("int").as(s"id$seed"),
      (pmod(
        when(col("id") % 2 === 0, (k % 3600).cast("double") / 10.0)
          .otherwise(lit(176.0) + (k % 80).cast("double") / 10.0) + 180.0,
        lit(360.0)) - 180.0).as(s"plon$seed"),
      when(col("id") % 3 === 1, lit(83.0) + (k % 65).cast("double") / 10.0)
        .otherwise((k % 1780).cast("double") / 10.0 - 89.0).as(s"plat$seed"))
  }

  private val c = { val s0 = math.sin(math.toRadians(6.0) / 2); s0 * s0 }

  /** Pairs under a predicate, as a sorted MULTISET: a pmod-wrap bug that
    * emits the same pair under two bin residues must fail the comparison,
    * not disappear into a Set. */
  private def pairs(a: DataFrame, b: DataFrame,
                    pred: org.apache.spark.sql.Column): Seq[(Int, Int)] =
    a.crossJoin(b).filter(pred)
      .select(col("id1"), col("id2")).as[(Int, Int)].collect().toSeq.sorted

  /** Assert the rewritten form (native expr, rule fires) returns the exact
    * pair multiset of the naive form (composed built-ins, unrewritable). */
  private def assertSameAsNaive(a: DataFrame, b: DataFrame, cc: Double,
                                label: String): Seq[(Int, Int)] = {
    val naive = pairs(a, b,
      Geo.haversineArg($"plon1", $"plat1", $"plon2", $"plat2") < lit(cc))
    val rew = pairs(a, b,
      HaversineArgExpr.havArg($"plon1", $"plat1", $"plon2", $"plat2") < lit(cc))
    assert(rew == naive, s"$label: missing=${naive.diff(rew).take(5)} " +
      s"extra=${rew.diff(naive).take(5)}")
    naive
  }

  test("rewrite returns exactly the naive join's pairs (dateline + polar)") {
    val naive = assertSameAsNaive(points(150, 1), points(400, 2), c, "base clouds")
    assert(naive.nonEmpty, "degenerate test: no pairs in radius")
  }

  test("the rewritten plan is an equi-join, not a nested loop") {
    val a = points(150, 1)
    val b = points(400, 2)
    val q = a.crossJoin(b).filter(
      HaversineArgExpr.havArg($"plon1", $"plat1", $"plon2", $"plat2") < lit(c))
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"theta-join not rewritten:\n$p")
    assert(p.contains("HashJoin"), s"expected a hash equi-join:\n$p")
  }

  test("a plain cross join without the distance predicate is left alone") {
    val a = points(10, 1)
    val b = points(10, 2)
    assert(a.crossJoin(b).count() == 100)
  }

  test("haversine_arg is registered as a SQL function via GraftExtensions") {
    val v = spark.sql("SELECT haversine_arg(0D, 0D, 90D, 0D) AS h").as[Double].head()
    assert(math.abs(v - 0.5) < 1e-12) // hav(90° of arc) = sin²(45°) = 1/2
  }

  test("SQL theta-join through the registered function is rewritten too") {
    points(80, 1).createOrReplaceTempView("sj_a")
    points(200, 2).createOrReplaceTempView("sj_b")
    val q = spark.sql(
      s"SELECT id1, id2 FROM sj_a JOIN sj_b ON haversine_arg(plon1, plat1, plon2, plat2) < $c")
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"SQL theta-join not rewritten:\n$p")
    val naive = points(80, 1).crossJoin(points(200, 2)).filter(
      Geo.haversineArg($"plon1", $"plat1", $"plon2", $"plat2") < lit(c))
      .select($"id1", $"id2").as[(Int, Int)].collect().toSet
    assert(q.as[(Int, Int)].collect().toSet == naive)
  }

  test("randomized radii and point clouds: rewritten == naive, both explode sides") {
    val rnd = new scala.util.Random(20260812L)
    // forced edge cases: exact poles, exact dateline, equator/meridian zero
    val edge = Seq((-180.0, 90.0), (180.0, -90.0), (-180.0, -90.0),
      (0.0, 0.0), (179.999, 89.5), (-179.999, -89.5))
    def cloud(n: Int): Seq[(Double, Double)] =
      edge ++ Seq.fill(n - edge.size)(
        (rnd.nextDouble() * 360.0 - 180.0, rnd.nextDouble() * 180.0 - 90.0))
    for (trial <- 0 until 5) {
      val radiusDeg = Seq(0.7, 3.0, 11.0, 28.0, 55.0)(trial)
      val cc = { val sh = math.sin(math.toRadians(radiusDeg) / 2); sh * sh }
      // alternate which side is bigger so both explode-left and
      // explode-right paths of the rule run
      val (na, nb) = if (trial % 2 == 0) (60, 220) else (220, 60)
      val a = cloud(na).zipWithIndex.map { case ((lo, la), i) => (i, lo, la) }
        .toDF("id1", "plon1", "plat1")
      val b = cloud(nb).zipWithIndex.map { case ((lo, la), i) => (i, lo, la) }
        .toDF("id2", "plon2", "plat2")
      assertSameAsNaive(a, b, cc, s"radius=$radiusDeg")
    }
  }

  test("sub-degree radius at the pole: saturation must not truncate (regression)") {
    // radius 0.1°: near the pole two points 170° of longitude apart are
    // still within radius. A latitude CLAMP (min(89.9, |lat|+r)) instead
    // of true saturation evaluates the Δλ bound at 89.9° where
    // cos > sin(r/2), yielding a finite 60°-ish fan-out — and silently
    // drops this pair. True saturation forces the full ring.
    val cc = { val sh = math.sin(math.toRadians(0.1) / 2); sh * sh }
    val a = Seq((1, 0.0, 89.95), (2, 10.0, 45.0)).toDF("id1", "plon1", "plat1")
    val b = Seq((1, 170.0, 89.99), (2, 10.02, 45.0), (3, -179.0, 89.97))
      .toDF("id2", "plon2", "plat2")
    val naive = assertSameAsNaive(a, b, cc, "polar 0.1-degree radius")
    assert(naive.contains((1, 1)), "fixture must contain a cross-polar in-radius pair")
  }

  test("ensure() is idempotent on a plain session") {
    SpatialJoinRewrite.ensure(spark)
    SpatialJoinRewrite.ensure(spark)
    assert(spark.experimental.extraOptimizations.count(_ == SpatialJoinRewrite) <= 1)
  }
}
