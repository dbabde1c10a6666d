package graft

import org.apache.spark.sql.functions._

import graft.functions.{VecFns => V}

/** The packed-vector kernel twins: the native codegen dot must be
  * bit-identical to the HOF executable spec, and must actually be an
  * expression, not a ScalaUDF. */
class VecFnsSpec extends SparkSuite {
  import spark.implicits._

  test("native packed dot ≡ HOF dot, bit-exact, including edge values") {
    val rows = Seq(
      (Seq(1.5, -2.25, 3.0e-7, 1e18), Seq(-0.5, 4.0, 2.0e7, 1e-18)),
      (Seq(0.0, -0.0), Seq(-0.0, 0.0)),
      (Seq.fill(64)(math.Pi / 3), Seq.tabulate(64)(i => math.sin(i.toDouble))))
      .toDF("a", "b")
    val got = rows.select(
      V.dotPacked(V.packVec(col("a")), V.packVec(col("b"))).as("native"),
      V.dot(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToRawLongBits(n) ===
        java.lang.Double.doubleToRawLongBits(h), s"$n != $h bitwise")
    }
  }

  test("null inputs propagate null, and the plan carries no ScalaUDF") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val out = df.select(
      V.dotPacked(V.packVec(col("a")), V.packVec(col("b"))).as("d"))
    assert(out.collect().head.isNullAt(0))
    val bin = Seq((
      java.nio.ByteBuffer.allocate(8).putDouble(1.5).array(),
      java.nio.ByteBuffer.allocate(8).putDouble(-2.0).array()))
      .toDF("pa", "pb")
    val scored = bin.select(
      graft.functions.DotPackedExpr.dotPackedNative(col("pa"), col("pb")).as("d"))
    assert(scored.as[Double].head() === -3.0)
    // literals constant-fold away; a non-foldable input keeps the
    // expression visible in the executed plan
    val lazyDf = spark.range(1).select(
      graft.functions.DotPackedExpr.dotPackedNative(
        col("id").cast("string").cast("binary"),
        col("id").cast("string").cast("binary")).as("d"))
    val plan = lazyDf.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dot_packed"), s"expression missing:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"dot must not be a UDF:\n$plan")
  }
}
