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

  /** Log-bucketed quantile histogram — the DDSketch idea (Masson, Rim &
    * Lee, VLDB 2019): values land in geometrically-spaced buckets
    * `floor(ln(x)·K)`, giving every quantile a bounded RELATIVE error of
    * ~e^(1/K)−1 (2% at K=50) from counts alone. Unlike a GK/QuantileSummaries
    * sketch (Spark's `approx_percentile`), whose compress steps make the
    * result depend on merge order, the buffer here is a plain counter
    * array and merge is cell-wise sum — commutative, associative,
    * PARTITION-INVARIANT, so quantile queries built on it are exactly
    * reproducible at any parallelism and cross-engine (the bucket function
    * is elementary arithmetic both engines evaluate identically, margins
    * checked empirically in the query that uses it). */
  class DdHist(k: Double, nBuckets: Int)
      extends Aggregator[Double, Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](nBuckets)
    def reduce(b: Array[Long], x: Double): Array[Long] = {
      b(DdHist.bucket(x, k, nBuckets)) += 1L
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

  object DdHist {
    /** Bucket of x: floor(ln(x)·K) clamped to [0, nBuckets); nonpositive
      * x maps to bucket 0 (callers with signed data offset upstream). */
    @inline def bucket(x: Double, k: Double, nBuckets: Int): Int =
      if (!(x > 0)) 0
      else math.min(nBuckets - 1L, math.max(0L, math.floor(math.log(x) * k).toLong)).toInt

    /** First bucket whose cumulative count reaches rank ceil(q‰·n/1000),
      * with the cumulative count at that bucket — integer-exact, the form
      * a SQL oracle reproduces with a window cumsum. */
    def quantileBucket(counts: IndexedSeq[Long], qPm: Long): (Int, Long, Long) = {
      val n = counts.sum
      var cum = 0L
      var i = 0
      while (i < counts.length) {
        cum += counts(i)
        if (1000L * cum >= qPm * n && cum > 0) return (i, cum, n)
        i += 1
      }
      (counts.length - 1, cum, n)
    }
  }

  def ddHist(k: Double, nBuckets: Int): Column => Column = {
    val u = udaf(new DdHist(k, nBuckets), ExpressionEncoder[Double]())
    u(_)
  }

  /** Bloom filter (Bloom 1970) over pre-hashed 64-bit keys: a fixed-size
    * bitset where each key sets k positions; membership tests k positions
    * and can say "definitely absent" (no false negatives) or "possibly
    * present". The merge is bitwise OR — commutative, associative,
    * idempotent — so the built filter is PARTITION-INVARIANT like the
    * other sketches here.
    *
    * The 100 TB role is the runtime semi-join filter: build the filter
    * over the SMALL side of a join (an ingest batch's fingerprints,
    * m/8 bytes total), ship it to the scan of the HUGE side, and drop
    * non-matching rows BEFORE the shuffle — exactly what Spark's own
    * `InjectRuntimeFilter` does for equi-joins, made explicit so the
    * pruned column can be a derived fingerprint the optimizer cannot see
    * through. False positives only let a few extra rows reach the exact
    * join that follows; false negatives cannot occur, so composed results
    * stay exact (q128's oracle is plain SQL, no fixture needed).
    *
    * IN = pre-hashed key (pair with [[graft.functions.CharHashExpr]] or
    * `xxhash64` upstream); BUF = the long-word bitset; OUT = the bitset
    * packed little-endian into bytes, the shape
    * [[graft.functions.BloomProbeExpr]] tests against.
    */
  class BloomFilter(mBits: Int, k: Int)
      extends Aggregator[Long, Array[Long], Array[Byte]] {
    require(mBits >= 64 && (mBits & 63) == 0, "mBits must be a multiple of 64")
    def zero: Array[Long] = new Array[Long](mBits >>> 6)
    def reduce(b: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < k) {
        val j = Bloom.pos(h, i, mBits)
        b(j >>> 6) |= 1L << (j & 63)
        i += 1
      }
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) |= b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Long]): Array[Byte] = {
      val out = new Array[Byte](b.length * 8)
      val bb = java.nio.ByteBuffer.wrap(out)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.asLongBuffer().put(b)
      out
    }
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
  }

  object Bloom {
    /** Position i of key h: splitmix64 of (h ⊕ seed_i), floor-mod m —
      * the same independent-row derivation as [[CountMin.cell]]. */
    @inline def pos(h: Long, i: Int, mBits: Int): Int = {
      val x = mix64(h ^ (0xA24BAED4963EE407L * (i + 1)))
      (((x % mBits) + mBits) % mBits).toInt
    }

    /** Membership test against the little-endian packed bitset. Bit j
      * lives at byte j>>>3, in-byte position j&7 (LE long packing keeps
      * the byte/bit numbering identical to the builder's word/bit one). */
    def mightContain(bits: Array[Byte], h: Long, k: Int): Boolean = {
      val mBits = bits.length << 3
      var i = 0
      while (i < k) {
        val j = pos(h, i, mBits)
        if (((bits(j >>> 3) >>> (j & 7)) & 1) == 0) return false
        i += 1
      }
      true
    }
  }

  def bloomFilter(mBits: Int, k: Int): Column => Column = {
    val u = udaf(new BloomFilter(mBits, k), ExpressionEncoder[Long]())
    u(_)
  }
}
