package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns.
  *
  * All arithmetic is done in Double after an explicit element cast (float →
  * double is exact), with left-to-right fold order, so Spark and the DuckDB
  * oracles produce bit-identical results. Built from codegen'd higher-order
  * functions — no UDFs in the hot path.
  */
object VecFns {
  /** Dot product of two array<double> columns (left-to-right fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** DuckDB twin: `a`,`b` are list expressions of the same length `n`. */
  def sqlDot(a: String, b: String, n: Int): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, ${n + 1}), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  def sqlNorm(a: String, n: Int): String = s"sqrt(${sqlDot(a, a, n)})"

  /** Signed ±1.0 pseudo-random hyperplane component for plane `p`, dim `i`
    * (1-based column): parity of an affine hash. Deterministic and portable
    * — the "random" planes are a pure function of (p, i). */
  def planeSign(p: Int, i: Column): Column =
    when(((i * lit(2L * p + 3L) + lit(97L * p + 13L)) % TextFns.HashMod) % 2 === 1,
      lit(1.0)).otherwise(lit(-1.0))

  def sqlPlaneSign(p: Int, i: String): String =
    s"CASE WHEN (($i * ${2L * p + 3L} + ${97L * p + 13L}) % ${TextFns.HashMod}) % 2 = 1 " +
      "THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END"

  /** Projection of the vector onto pseudo-random hyperplane `p`. */
  def planeProj(vec: Column, p: Int, n: Int): Column =
    aggregate(sequence(lit(1), lit(n)), lit(0.0),
      (acc, i) => acc + element_at(vec, i) * planeSign(p, i))

  def sqlPlaneProj(vec: String, p: Int, n: Int): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, ${n + 1}), i -> " +
      s"CAST($vec[i] AS DOUBLE) * ${sqlPlaneSign(p, "i")})), (acc, x) -> acc + x)"

  /** Random-hyperplane LSH bucket: `bits` sign bits packed into a long.
    * Collision probability rises with cosine similarity — the standard
    * SimHash-for-vectors scheme. At scale this turns all-pairs similarity
    * into an equi-join on bucket. */
  def lshBucket(vec: Column, bits: Int, n: Int): Column =
    (0 until bits).map(p =>
      when(planeProj(vec, p, n) > 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Identity over a bucket value, marked non-deterministic — which it is
    * NOT (it forwards its argument bit-for-bit; fixtures and oracles are
    * unaffected). The marker exists purely to stop constraint propagation
    * from recording `bucketAttr <=> <whole bucket expression>` at the
    * projection: on a bucket self-join (both sides derived from the same
    * table), Spark 4.1's InferFiltersFromConstraints substitutes the join
    * key through that constraint and pushes a filter containing ONE
    * side's `vec` reference into the OTHER side's branch — an unresolvable
    * plan that fails at runtime with INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
    * (surfaces under aggressive pruning, e.g. count() over the pairs).
    * A single cached instance so repeated builds stay `sameResult`. */
  val opaqueBucket: Column => Column = {
    val u = udf((b: Long) => b).asNondeterministic()
    u(_)
  }

  def sqlLshBucket(vec: String, bits: Int, n: Int): String =
    (0 until bits).map(p =>
      s"CASE WHEN ${sqlPlaneProj(vec, p, n)} > 0 THEN ${1L << p} ELSE 0 END")
      .mkString("(", " + ", ")")

  // ---- compiled kernel (hot path) -----------------------------------------
  /** Compiled twin of [[dot]]: the same left-to-right double fold, so the
    * result is BIT-IDENTICAL to the HOF form (and the DuckDB oracle) — but
    * a tight JVM loop instead of a per-element interpreted lambda. Use in
    * per-PAIR similarity paths (joins), where candidate count × dimension
    * dominates; the HOF form remains the executable spec. */
  val dotJvm: (Column, Column) => Column = {
    val u = udf((a: Seq[Double], b: Seq[Double]) => {
      var acc = 0.0
      var i = 0
      val n = a.length
      while (i < n) { acc += a(i) * b(i); i += 1 }
      acc
    })
    u(_, _)
  }

  /** Vector packed to flat bytes (64-bit big-endian doubles — ByteBuffer's
    * default order, which [[DotPackedExpr.dot]] decodes) ONCE per row: per-PAIR
    * paths then decode a single binary value instead of a boxed
    * Seq[Double] — the array-element boxing is what dominates pairwise
    * similarity once candidates × dimension reach the tens of millions. */
  val packVec: Column => Column = {
    // null-safe by hand: Spark passes a null Seq straight into the lambda
    // (only primitive-typed UDF args get the automatic null short-circuit)
    val u = udf((a: Seq[Double]) =>
      if (a == null) null
      else {
        val bb = java.nio.ByteBuffer.allocate(8 * a.length)
        var i = 0
        while (i < a.length) { bb.putDouble(a(i)); i += 1 }
        bb.array()
      })
    u(_)
  }

  /** Dot over two packed vectors; same left-to-right fold → bit-identical
    * to [[dot]]/[[sqlDot]]. Native codegen expression (not a UDF): the
    * per-pair dispatch cost is what dominates once candidates × dimension
    * reach the tens of millions — see [[DotPackedExpr]]. */
  val dotPacked: (Column, Column) => Column =
    DotPackedExpr.dotPackedNative(_, _)
}
