package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.types.BinaryType

/** Codegen pins for the embedding hot path (VERDICT r12 task 1) — the
  * Bloom/Janino lesson generalized: when generated code fails to
  * compile, Spark falls back to INTERPRETED eval silently — results stay
  * bit-identical while the hot path loses an order of magnitude, which
  * is exactly the signature of an unattributable scale regression
  * (unchanged code, identical candidate counts, 1.7× the wall). These
  * pins make that failure mode LOUD for the q43/q67 family the way
  * BloomSpec made it loud for the q128 probe. */
class EmbeddingCodegenSpec extends SparkSuite {

  private def packed(vals: Double*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * vals.length)
    vals.foreach(bb.putDouble)
    bb.array()
  }

  test("DotPackedExpr generated code COMPILES and agrees with interpreted eval") {
    // GenerateMutableProjection THROWS on a Janino reject, so a broken
    // static path (the Bloom regression's shape: generated code naming a
    // JVM-invisible nested Scala object) fails here loudly instead of
    // de-optimizing every pair-scoring stage silently
    val expr = graft.functions.DotPackedExpr(
      BoundReference(0, BinaryType, nullable = true),
      BoundReference(1, BinaryType, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(expr))
    val a = packed(1.5, -2.0, 3.25, 0.5)
    val b = packed(2.0, 4.0, -1.0, 8.0)
    val row = InternalRow(a, b)
    val want = expr.eval(row).asInstanceOf[Double]
    assert(want == 1.5 * 2.0 + (-2.0) * 4.0 + 3.25 * (-1.0) + 0.5 * 8.0)
    assert(proj(row).getDouble(0) == want,
      "compiled dot_packed disagrees with interpreted eval")
    // null propagates through the generated null checks
    assert(expr.eval(InternalRow(null, b)) == null)
  }

  test("q43/q67 stay correct under CODEGEN_ONLY (fallback disabled)") {
    // the end-to-end guard: every expression in the near-dup family's
    // plans — the hyperplane bucket arithmetic, packVec/opaqueBucket's
    // ScalaUDF shims, dot_packed, the CC passes' join projections — must
    // come out of the codegen factory, or this run throws instead of
    // silently interpreting a stage (the attribution defense: after this
    // pin, a q43/q67 wall regression at fixed candidate counts cannot be
    // a hidden codegen fallback)
    val d = "/root/testdata/sf0.001"
    val conf = spark.conf
    for (q <- Seq("q43_embedding_neardup", "q67_semantic_clusters")) {
      val want = SparkEntry.queries(q)(spark, d).collect().toSeq
      val prevFallback = conf.get("spark.sql.codegen.fallback", "true")
      val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
      try {
        conf.set("spark.sql.codegen.fallback", "false")
        conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
        val got = SparkEntry.queries(q)(spark, d).collect().toSeq
        assert(got == want && got.nonEmpty,
          s"$q under CODEGEN_ONLY diverged from the default run")
      } finally {
        conf.set("spark.sql.codegen.fallback", prevFallback)
        conf.set("spark.sql.codegen.factoryMode", prevFactory)
      }
    }
  }
}
