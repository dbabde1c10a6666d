package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable sketches for approximate query processing at corpus scale.
  *
  * At 100 TB an exact `groupBy(token).count` over a trillion tokens is a
  * full shuffle of the tokenized corpus; a sketch is ONE fixed-size buffer
  * per partition, merged cell-wise — the shuffle volume is
  * O(partitions × sketch size), independent of data volume.
  *
  * Both sketches here are per-row deterministic and their merges are
  * commutative + associative on the buffer cells (sum / max), so results
  * are PARTITION-INVARIANT: bit-identical under any parallelism, which is
  * what lets the sketch queries carry golden-fixture oracles (same
  * contract as the atlas fixed-point aggregation, see
  * [[graft.queries.FixtureOracle]]).
  */
object Sketches {

  /** splitmix64 finalizer — the standard public-domain 64-bit mixer; used
    * to derive the d row hashes of one key from fixed seeds. */
  @inline private[operators] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005): depth×width counter
    * matrix; each key increments one cell per row; the estimate is the MIN
    * over its cells — a one-sided (over-)estimate with error ≤ e·N/width
    * at probability 1−e^−depth.
    *
    * IN = pre-hashed key (pair with `xxhash64(col)` upstream so the
    * hashing is codegen'd); BUF/OUT = the flattened counter matrix.
    */
  class CountMin(depth: Int, width: Int)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](depth * width)
    def reduce(b: Array[Long], key: Long): Array[Long] = {
      var d = 0
      while (d < depth) {
        b(d * width + CountMin.cell(key, d, width)) += 1L
        d += 1
      }
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Long]): Seq[Long] = b.toIndexedSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  object CountMin {
    /** Row-d cell index of a key: splitmix64 of (key ⊕ seed_d), mod width. */
    @inline def cell(key: Long, d: Int, width: Int): Int = {
      val h = mix64(key ^ (0xD6E8FEB86659FD93L * (d + 1)))
      // floor-mod for a non-negative index
      (((h % width) + width) % width).toInt
    }

    /** Point estimate: min over the key's depth cells. */
    def estimate(sketch: IndexedSeq[Long], key: Long,
                 depth: Int, width: Int): Long = {
      var best = Long.MaxValue
      var d = 0
      while (d < depth) {
        val v = sketch(d * width + cell(key, d, width))
        if (v < best) best = v
        d += 1
      }
      best
    }
  }

  def countMin(depth: Int, width: Int): Column => Column = {
    val u = udaf(new CountMin(depth, width), ExpressionEncoder[Long]())
    u(_)
  }
}
