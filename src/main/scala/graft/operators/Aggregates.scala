package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregators.
  *
  * Each is an `Aggregator[IN, BUF, OUT]`, which Spark plans as a regular
  * hash aggregate with partial (map-side) + final merge — the combine step
  * the reference's multiprocessing fan-out lacks entirely. At 100 TB this is
  * the difference between shuffling every row and shuffling one buffer per
  * (partition × key).
  */
object Aggregates {

  /** Product-combine of integer codes, the reference's QC reduction
    * `FLAG = Π qc` (/root/reference/src/argostats/toctools.py:186-187):
    * any zero code poisons the group to zero; all-ones ⟺ all good. */
  class ProductLong extends Aggregator[Long, Long, Long] {
    def zero: Long = 1L
    def reduce(b: Long, a: Long): Long = b * a
    def merge(b1: Long, b2: Long): Long = b1 * b2
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Weighted elementwise mean of fixed-length float arrays — the
    * reference's per-cell profile mean `Σ(X·coef)/Σcoef`
    * (/root/reference/src/argostats/atlas.py:93-96,116-142), generalized.
    *
    * IN  = (weight, values); BUF = packed sums [Σw·x₀ … Σw·xₙ₋₁, Σw·1e6];
    * OUT = the buffer (callers divide / scale as needed).
    *
    * Contributions are rounded to integer nano-units per row (see
    * [[graft.functions.FP]]) so the aggregate is order-independent and
    * bit-reproducible under any partitioning.
    */
  class WeightedArrayMeanFP(n: Int) extends Aggregator[(Long, Seq[Float]), Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](n + 1)
    def reduce(b: Array[Long], a: (Long, Seq[Float])): Array[Long] = {
      val (w, xs) = a
      if (xs != null) {
        var i = 0
        val m = math.min(n, xs.length)
        while (i < m) {
          b(i) += w * graft.functions.FP.roundHalfAway(xs(i).toDouble * 1e9)
          i += 1
        }
        b(n) += w
      }
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i <= n) { b1(i) += b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** SimHash of a bag of 64-bit token hashes: per bit, sum ±1 votes; the
    * sign vector is the fingerprint. Near-duplicate docs land within a small
    * Hamming distance. Aggregating votes (buffer = 64 ints) instead of
    * exploding doc × bit rows keeps the shuffle at one row per document. */
  class SimHash64 extends Aggregator[Long, Array[Int], Long] {
    def zero: Array[Int] = new Array[Int](64)
    def reduce(b: Array[Int], h: Long): Array[Int] = {
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) b(i) += 1 else b(i) -= 1
        i += 1
      }
      b
    }
    def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { b1(i) += b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Int]): Long = {
      var sig = 0L
      var i = 0
      while (i < 64) { if (b(i) > 0) sig |= (1L << i); i += 1 }
      sig
    }
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column-API handles. */
  def productLong(c: Column): Column = udaf(new ProductLong).apply(c)
  def simhash64(c: Column): Column = udaf(new SimHash64).apply(c)
  def weightedArrayMeanFP(n: Int)(w: Column, xs: Column): Column =
    udaf(new WeightedArrayMeanFP(n),
      ExpressionEncoder[(Long, Seq[Float])]()).apply(w, xs)
}
