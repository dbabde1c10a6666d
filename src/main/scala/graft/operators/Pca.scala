package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * dimensionality-reduction / whitening pass a training-data pipeline runs
  * before ANN indexing or semantic clustering (FAISS's OPQ/PCA pre-rotation
  * does exactly this).
  *
  * Scale design: the corpus is touched by ONE narrow aggregation that
  * reduces each partition to a single packed co-moment buffer
  * (1 + d + d(d+1)/2 longs ≈ 17 kB at d=64) — map-side combine makes
  * reducer input O(partitions × buffer), independent of row count. The
  * eigensolve happens on the driver over the d×d covariance (a
  * microseconds-scale Jacobi at d=64 — the MODEL is tiny, like
  * [[KMeans]]'s centroids), and the projection back over the corpus is a
  * per-row map against the broadcast components.
  *
  * Determinism: inputs are quantized to 1e-4 units per row
  * ([[graft.functions.FP.roundHalfAway]]) and all accumulation is exact
  * integer sums of quanta products — partition-invariant, AQE-safe,
  * speculative-execution-safe. Products of quanta are ≤ 1e8 per row for
  * unit-scale embeddings, so the Long sums hold ~10¹⁰ rows before
  * overflow — corpus scale. The Jacobi solve and the per-row projection
  * are deterministic double arithmetic over those exact sums, so the whole
  * result is bit-reproducible under any parallelism (PcaSpec asserts it).
  */
object Pca {

  /** Input quantization: 1e-4 units keep per-row co-moment products at
    * ≤ ~1e8 for unit-scale embeddings — 4 significant digits on the data,
    * ~10 orders of magnitude of summation headroom. */
  val Quantum = 1e4

  final case class Model(mean: Array[Double],
                         eigenvalues: Array[Double],
                         components: Array[Array[Double]]) // components(j) = j-th PC

  /** Packed second-moment accumulator: buffer =
    * [n, Σq₀ … Σq_{d−1}, Σq₀q₀, Σq₀q₁ … (upper triangle row-major)]
    * where qᵢ = roundHalfAway(xᵢ·1e4). */
  class CoMomentFP(d: Int) extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {
    private val len = 1 + d + d * (d + 1) / 2
    def zero: Array[Long] = new Array[Long](len)
    def reduce(b: Array[Long], xs: Seq[Float]): Array[Long] = {
      if (xs != null && xs.length >= d) accumulate(b, xs, d)
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < len) { b1(i) += b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** The ONE accumulation kernel — shared by the distributed aggregator and
    * the driver fast path so the two fits cannot drift. */
  private[operators] def accumulate(b: Array[Long], xs: Seq[Float], d: Int): Unit = {
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      q(i) = graft.functions.FP.roundHalfAway(xs(i).toDouble * Quantum)
      i += 1
    }
    b(0) += 1L
    i = 0
    while (i < d) { b(1 + i) += q(i); i += 1 }
    var off = 1 + d
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        b(off) += q(i) * q(j)
        off += 1
        j += 1
      }
      i += 1
    }
  }

  /** Fit the PCA model. Size-conditional like [[KMeans.fit]]: a corpus
    * under the width-scaled broadcast cap accumulates on the driver with
    * the exact kernel above (bit-identical — PcaSpec asserts it); past the
    * cap, the one-pass distributed aggregation runs. Either way the
    * eigensolve sees the same integer sums. */
  def fit(vecs0: DataFrame, vecCol: String, dim: Int,
          allowDriverFastPath: Boolean = true): Model = {
    // persist around the count + (collect | agg) pair, like KMeans.fit:
    // without it the size probe and the accumulation each re-run the
    // upstream scan/projection
    val vecs = vecs0.select(col(vecCol).cast("array<float>").as("v")).persist()
    try {
      val len = 1 + dim + dim * (dim + 1) / 2
      val rowCap = math.max(1L, Joins.maxRows(vecs) / math.max(1, dim / 2))
      val sums: Array[Long] =
        if (allowDriverFastPath && vecs.count() <= rowCap) {
          val b = new Array[Long](len)
          vecs.collect().foreach { r =>
            val xs = r.getSeq[Float](0)
            if (xs != null && xs.length >= dim) accumulate(b, xs, dim)
          }
          b
        } else {
          vecs.agg(udaf(new CoMomentFP(dim), ExpressionEncoder[Seq[Float]]())
            .apply(col("v")).as("s"))
            .head().getSeq[Long](0).toArray
        }
      fromSums(sums, dim)
    } finally vecs.unpersist(blocking = false)
  }

  /** Covariance from the packed integer sums, then the eigensolve. */
  private def fromSums(s: Array[Long], d: Int): Model = {
    val n = s(0).toDouble
    require(n >= 2, s"need >= 2 vectors to fit PCA, got ${s(0)}")
    val mean = Array.tabulate(d)(i => s(1 + i) / n / Quantum)
    val cov = Array.ofDim[Double](d, d)
    var off = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        // E[q_i q_j]/µ² − mean_i·mean_j
        val c = s(off) / n / (Quantum * Quantum) - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        off += 1
        j += 1
      }
      i += 1
    }
    val (evals, evecs) = symEigen(cov)
    Model(mean, evals, evecs)
  }

  /** Cyclic Jacobi eigensolve for a symmetric matrix: fixed sweep bound,
    * threshold-free rotation order — deterministic for a given input.
    * Returns eigenpairs sorted by eigenvalue DESC (ties → lower original
    * index), each eigenvector sign-normalized so its largest-magnitude
    * entry is positive (the first such index wins ties) — a total,
    * reproducible orientation. */
  def symEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    val MaxSweeps = 50
    var off = offDiag(a)
    while (sweep < MaxSweeps && off > 1e-14 * math.max(1.0, frob(a))) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 0) {
            // classic Jacobi rotation annihilating a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta match { case 0.0 => 1.0; case x => x }) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    // sort eigenpairs: eigenvalue desc, ties to the lower original index
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      // sign: largest-|entry| (first index wins ties) must be positive
      var best = 0
      var k = 1
      while (k < d) { if (math.abs(col(k)) > math.abs(col(best))) best = k; k += 1 }
      if (col(best) < 0) col.map(x => -x) else col
    }.toArray
    (evals, evecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frob(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** df + `pc`: the k leading principal components of `vecCol`, each
    * µ-rounded to a Long (hash-stable output, deterministic per row). A
    * narrow map against the broadcast model — no shuffle. */
  def project(df: DataFrame, model: Model, vecCol: String, k: Int): DataFrame = {
    val mean = model.mean
    val comps = model.components.take(k)
    val d = mean.length
    val proj = udf((xs: Seq[Float]) => {
      if (xs == null || xs.length < d) null
      else {
        val cent = new Array[Double](d)
        var i = 0
        while (i < d) { cent(i) = xs(i).toDouble - mean(i); i += 1 }
        val out = new Array[Long](comps.length)
        var j = 0
        while (j < comps.length) {
          val c = comps(j)
          var dot = 0.0
          i = 0
          while (i < d) { dot += c(i) * cent(i); i += 1 }
          out(j) = graft.functions.FP.roundHalfAway(dot * 1e6)
          j += 1
        }
        out.toSeq
      }
    })
    df.withColumn("pc", proj(col(vecCol)))
  }
}
