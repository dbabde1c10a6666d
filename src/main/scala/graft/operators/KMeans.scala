package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic distributed Lloyd's k-means — the coarse-quantizer
  * training an IVF index needs (q44's scale path).
  *
  * Every step is partition-invariant, so the trained model (and every
  * fixture built on it) is bit-reproducible under any parallelism:
  *
  *  - init: the k vectors with the SMALLEST ids — a distributed top-k
  *    (TakeOrdered), no global sort, no RNG;
  *  - assignment: argmax cosine against the broadcast centroids, ties to
  *    the lowest cell — a narrow map over the corpus;
  *  - update: one `groupBy(cell)` with integer nano-unit sums
  *    ([[Aggregates.weightedArrayMeanFP]]); empty cells keep their
  *    previous centroid;
  *  - fixed iteration count (no data-dependent convergence test).
  *
  * Each iteration moves k×dim doubles driver↔executors — the MODEL, not
  * the data; corpus rows are touched once per iteration in a narrow
  * map + one partial-aggregated shuffle of k buffer rows per partition.
  */
object KMeans {

  /** @param vecs   (idCol: long, vecCol: array&lt;float&gt;) corpus
    * @return k centroids (index = cell id), as doubles */
  def fit(vecs0: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
          iters: Int): Array[Array[Double]] = {
    // Cache the training vectors for the duration of the fit: init + every
    // Lloyd iteration scans them, and without a persist each pass re-runs
    // the upstream scan/projection (MLlib's trainers cache their input for
    // the same reason). Unpersisted before returning.
    val vecs = vecs0.select(col(idCol), col(vecCol)).persist()
    try {
      fitCached(vecs, idCol, vecCol, dim, k, iters)
    } finally vecs.unpersist(blocking = false)
  }

  private def fitCached(vecs: DataFrame, idCol: String, vecCol: String,
                        dim: Int, k: Int, iters: Int): Array[Array[Double]] = {
    var centroids = vecs.orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    var it = 0
    while (it < iters) {
      val sums = withCell(vecs, centroids, vecCol)
        .groupBy(col("cell"))
        .agg(Aggregates.weightedArrayMeanFP(dim)(lit(1L), col(vecCol)).as("s"))
        .collect()
      val next = centroids.map(_.clone()) // empty cells keep their centroid
      sums.foreach { r =>
        val cell = r.getInt(0)
        val s = r.getSeq[Long](1)
        val cnt = s(dim).toDouble
        if (cnt > 0) next(cell) = Array.tabulate(dim)(i => s(i) / 1e9 / cnt)
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** df + `cell` = [[nearestCell]] assignment of `vecCol` under `model` —
    * the ONE assignment path shared by the IVF queries and the
    * partitioned store ([[graft.sources.VecStore]]). A second copy
    * drifting (tie-breaking, norm handling) would land vectors in cells
    * the probe side never prunes to — wrong results, not just wasted IO. */
  def withCell(df: DataFrame, model: Array[Array[Double]],
               vecCol: String): DataFrame = {
    val norms = model.map(c => math.sqrt(c.map(x => x * x).sum))
    val assign = udf((v: Seq[Float]) => nearestCell(model, norms, v))
    df.withColumn("cell", assign(col(vecCol)))
  }

  /** argmax of cos(v, centroid); |v| is a common factor so only the
    * centroid norm divides. Strict `>` ⇒ ties break to the lowest cell.
    * Public: the IVF queries assign the corpus with the same kernel the
    * trainer used. */
  def nearestCell(cents: Array[Array[Double]],
                  norms: Array[Double], v: Seq[Float]): Int = {
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dot = 0.0
      var i = 0
      val m = math.min(cent.length, v.length)
      while (i < m) { dot += cent(i) * v(i); i += 1 }
      val score = if (norms(c) > 0) dot / norms(c) else Double.NegativeInfinity
      if (score > bestScore) { best = c; bestScore = score }
      c += 1
    }
    best
  }
}
