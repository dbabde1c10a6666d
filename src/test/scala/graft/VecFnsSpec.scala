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

  test("generated dot code really executes (no silent interpreted fallback)") {
    // LocalRelation inputs constant-fold to interpreted eval, so the tests
    // above never run the doGenCode output. Drive the expression from
    // spark.range (whole-stage codegen compiles it) with the fallback OFF,
    // so a Janino-breaking typo in the generated call FAILS here instead
    // of silently degrading the hot path to interpreted dispatch.
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = 8
      def a = array((0 until n).map(i => (col("id") * (i + 1)).cast("double") / 7.0d): _*)
      def b = array((0 until n).map(i => (col("id") - 3 * i).cast("double") * 1.25d): _*)
      // the HOF spec column is CodegenFallback and would evict the whole
      // projection from codegen — keep the native column in its own plan
      val native = spark.range(0, 64, 1, 4)
        .select(V.dotPacked(V.packVec(a), V.packVec(b)).as("native"))
      val span = native.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.toString
      }
      assert(span.exists(_.contains("dot_packed")),
        s"dot_packed not inside a codegen span:\n${native.queryExecution.executedPlan}")
      val hof = spark.range(0, 64, 1, 4).select(V.dot(a, b).as("hof"))
      native.as[Double].collect().zip(hof.as[Double].collect()).foreach { case (nv, h) =>
        assert(java.lang.Double.doubleToRawLongBits(nv) ===
          java.lang.Double.doubleToRawLongBits(h), s"$nv != $h bitwise")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("native sumSq ≡ HOF aggregate fold, bit-exact, incl. null/NaN elements") {
    // the executable spec the gate/norm kernel replaced (r15): widen to
    // double, left-to-right acc + x*x — every case must match bit-for-bit,
    // and a NULL element must fold the whole sum to NULL (the dirty-corpus
    // gate semantics EdgeVecsSpec sweeps end to end)
    def hof(c: org.apache.spark.sql.Column) =
      aggregate(c.cast("array<double>"), lit(0.0), (a, x) => a + x * x)
    val rows = Seq(
      Some(Seq[java.lang.Double](1.5, -2.25, 3.0e-7, 1e18)),
      Some(Seq[java.lang.Double](0.0, -0.0)),
      Some(Seq[java.lang.Double](Double.NaN, 1.0)),
      Some(Seq[java.lang.Double](1.0, null, 2.0)), // null element → NULL sum
      Some(Seq.tabulate(64)(i => java.lang.Double.valueOf(math.sin(i.toDouble)))),
      Option.empty[Seq[java.lang.Double]]) // null array → NULL
      .toDF("a")
    val got = rows.select(V.sumSq(col("a")).as("native"), hof(col("a")).as("spec"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null disagreement: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"$r bitwise")
    }
    // float arrays widen exactly — same fold as cast-to-double-first
    val fRows = Seq(Seq(1.5f, -2.25f, 3.0e-7f, 0.1f)).toDF("a")
    val f = fRows.select(V.sumSq(col("a")).as("native"), hof(col("a")).as("spec"))
      .as[(Double, Double)].collect().head
    assert(java.lang.Double.doubleToRawLongBits(f._1) ===
      java.lang.Double.doubleToRawLongBits(f._2))
  }

  test("generated sumSq code really executes (no silent interpreted fallback)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = 8
      def a = array((0 until n).map(i => (col("id") * (i + 1)).cast("double") / 7.0d): _*)
      val native = spark.range(0, 64, 1, 4).select(V.sumSq(a).as("s"))
      val span = native.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.toString
      }
      assert(span.exists(_.contains("vec_sum_sq")),
        s"vec_sum_sq not inside a codegen span:\n${native.queryExecution.executedPlan}")
      val hof = spark.range(0, 64, 1, 4)
        .select(aggregate(a, lit(0.0), (acc, x) => acc + x * x).as("s"))
      native.as[Double].collect().zip(hof.as[Double].collect()).foreach { case (nv, h) =>
        assert(java.lang.Double.doubleToRawLongBits(nv) ===
          java.lang.Double.doubleToRawLongBits(h), s"$nv != $h bitwise")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("native planeProj ≡ HOF spec, bit-exact, and really compiles (r15)") {
    // equivalence on stored rows (interpreted eval path), incl. a null
    // element folding the projection to NULL
    val rows = Seq(
      Some(Seq[java.lang.Double](1.5, -2.25, 3.0e-7, 1e12, 0.25, -8.5, 2.0, 0.125)),
      Some(Seq[java.lang.Double](1.0, null, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0)),
      Option.empty[Seq[java.lang.Double]])
      .toDF("a")
    for (p <- 0 until 4) {
      val got = rows.select(V.planeProj(col("a"), p, 8).as("native"),
        V.planeProjHof(col("a"), p, 8).as("spec")).collect()
      got.foreach { r =>
        assert(r.isNullAt(0) === r.isNullAt(1), s"plane $p null disagreement: $r")
        if (!r.isNullAt(0))
          assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
            java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"plane $p: $r")
      }
    }
    // codegen path with the fallback off — a Janino reject must be loud
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      def a = array((0 until 8).map(i =>
        (col("id") * (i + 1)).cast("double") / 3.0d): _*)
      val native = spark.range(0, 64, 1, 4)
        .select(V.planeProj(a, 1, 8).as("s"))
      val span = native.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.toString
      }
      assert(span.exists(_.contains("plane_proj")),
        s"plane_proj not inside a codegen span:\n${native.queryExecution.executedPlan}")
      val hof = spark.range(0, 64, 1, 4).select(V.planeProjHof(a, 1, 8).as("s"))
      native.as[Double].collect().zip(hof.as[Double].collect()).foreach { case (nv, h) =>
        assert(java.lang.Double.doubleToRawLongBits(nv) ===
          java.lang.Double.doubleToRawLongBits(h), s"$nv != $h bitwise")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("generated packed-Jaccard code really executes, and mismatched dims throw") {
    import graft.functions.{TextFns => T, JaccardMicroPackedExpr => J}
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val t1 = concat_ws(" ", lit("alpha beta gamma delta"), col("id").cast("string"))
      val t2 = concat_ws(" ", lit("alpha beta gamma epsilon"), (col("id") % 2).cast("string"))
      val df = spark.range(0, 32, 1, 4)
        .select(T.shingleHashesPacked(2)(t1).as("h1"), T.shingleHashesPacked(2)(t2).as("h2"))
        .select(col("h1"), col("h2"), T.jaccardMicroPacked(col("h1"), col("h2")).as("j"))
      val span = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.toString
      }
      assert(span.exists(_.contains("jaccard_micro_packed")),
        s"jaccard_micro_packed not inside a codegen span:\n${df.queryExecution.executedPlan}")
      df.collect().foreach { r =>
        assert(r.getLong(2) ===
          J.jaccardMicro(r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1)))
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)

    // dot over unequal packed dimensions must fail loudly, not truncate
    val e = intercept[IllegalArgumentException] {
      graft.functions.DotPackedExpr.dot(new Array[Byte](16), new Array[Byte](8))
    }
    assert(e.getMessage.contains("mismatched packed lengths"))
  }
}
