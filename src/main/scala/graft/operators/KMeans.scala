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
          iters: Int,
          allowDriverFastPath: Boolean = true): Array[Array[Double]] = {
    // Cache the training vectors for the duration of the fit: init + every
    // Lloyd iteration scans them, and without a persist each pass re-runs
    // the upstream scan/projection (MLlib's trainers cache their input for
    // the same reason). Unpersisted before returning.
    val vecs = vecs0.select(col(idCol), col(vecCol)).persist()
    try {
      // Size-conditional driver fast path, same contract as [[fitPq]]:
      // under the width-scaled broadcast cap the Lloyd loop runs in
      // memory with the exact distributed arithmetic (bit-identical —
      // KMeansSpec asserts it); past the cap, the per-iteration jobs.
      val rowCap = math.max(1L, Joins.maxRows(vecs) / math.max(1, dim / 2))
      if (allowDriverFastPath && vecs.count() <= rowCap) {
        val rows = vecs.select(col(idCol), col(vecCol)).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        fitDriver(rows, dim, k, iters)
      } else fitCached(vecs, idCol, vecCol, dim, k, iters)
    } finally vecs.unpersist(blocking = false)
  }

  /** Driver-side twin of [[fitCached]]: smallest-id init, cosine
    * assignment via the SAME [[nearestCell]] kernel, nano-unit integer
    * sums, `s/1e9/cnt` means — bit-identical output. */
  private def fitDriver(rows0: Array[(Long, Array[Float])], dim: Int, k: Int,
                        iters: Int): Array[Array[Double]] = {
    val rows = rows0.sortBy(_._1)
    var centroids: Array[Array[Double]] =
      rows.take(k).map(_._2.map(_.toDouble))
    var it = 0
    while (it < iters) {
      val norms = centroids.map(c => math.sqrt(c.map(x => x * x).sum))
      val sums = Array.ofDim[Long](k, dim)
      val counts = new Array[Long](k)
      rows.foreach { case (_, v) =>
        val cell = nearestCell(centroids, norms, v)
        val s = sums(cell)
        var i = 0
        val m = math.min(dim, v.length)
        while (i < m) {
          s(i) += graft.functions.FP.roundHalfAway(v(i).toDouble * 1e9)
          i += 1
        }
        counts(cell) += 1L
      }
      val next = centroids.map(_.clone()) // empty cells keep their centroid
      var cell = 0
      while (cell < k) {
        val cnt = counts(cell).toDouble
        if (cnt > 0) next(cell) = Array.tabulate(dim)(i => sums(cell)(i) / 1e9 / cnt)
        cell += 1
      }
      centroids = next
      it += 1
    }
    centroids
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

  // ---- L2 variant (product-quantization codebooks) -------------------------
  // PQ trains per-subspace codebooks under EUCLIDEAN distance (the ADC
  // score is a sum of subspace L2² terms), where the cosine assignment
  // above is wrong for sub-vectors: a subspace slice can have near-zero
  // norm, making cosine unstable exactly where quantization must still
  // pick a consistent cell. Same determinism discipline as [[fit]]:
  // smallest-id init, strict `<` ties to the lowest cell, fixed-point
  // integer mean updates, fixed iteration count.

  /** argmin of ‖v − centroid‖²; strict `<` ⇒ ties break to the lowest
    * cell. `v` may be shorter than dim (never happens for valid input);
    * extra centroid dims then count as (0 − c_i)². */
  def nearestCellL2(cents: Array[Array[Double]], v: Seq[Double]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0
      var i = 0
      while (i < cent.length) {
        val x = (if (i < v.length) v(i) else 0.0) - cent(i)
        d += x * x
        i += 1
      }
      if (d < bestD) { best = c; bestD = d }
      c += 1
    }
    best
  }

  /** Product-quantization codebooks: `m` per-subspace k-means trained
    * JOINTLY — one assignment job per Lloyd iteration covers every
    * subspace (cells explode to (m, cell) rows pre-aggregation; map-side
    * combine collapses each partition to m×k packed buffers), instead of
    * m independent fits each paying init + iters jobs of scheduling.
    *
    * @param vecs (idCol: long, vecCol: array&lt;float&gt; of m·subDim dims)
    * @return codebooks(m)(cell) = centroid, as doubles */
  def fitPq(vecs0: DataFrame, idCol: String, vecCol: String,
            m: Int, subDim: Int, k: Int, iters: Int,
            allowDriverFastPath: Boolean = true): Array[Array[Array[Double]]] = {
    val vecs = vecs0
      .select(col(idCol), col(vecCol).cast("array<double>").as("v")).persist()
    try {
      // Size-conditional, like Graph/Bpe: a training set under the
      // broadcast cap (scaled by vector width — a row here is dim doubles,
      // not two longs) trains ON THE DRIVER. The distributed fit costs
      // ~2 jobs per Lloyd iteration, pure orchestration overhead for an
      // in-memory problem; at 100 TB the PQ trainer runs on a
      // hash-sampled subset that is ALSO driver-sized (FAISS trains
      // codebooks on ~10^5-10^6 samples), so this is the path a real
      // deployment takes too — the loop remains for oversized training
      // sets and is pinned by KMeansSpec's equivalence test, which
      // asserts the two paths produce bit-identical codebooks.
      val rowCap = math.max(1L, Joins.maxRows(vecs) / math.max(1, m * subDim / 2))
      if (allowDriverFastPath && vecs.count() <= rowCap) {
        val rows = vecs.collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        return fitPqDriver(rows, m, subDim, k, iters)
      }
      // Init: one representative per id-hash STRATUM, not the k smallest
      // ids — adjacent ids are often near-duplicates (same source, same
      // shard), and seeding all k cells inside one neighborhood leaves
      // most of the space uncovered for the few fixed Lloyd iterations to
      // fix. The MINSTD hash spreads selection pseudo-randomly with zero
      // RNG state, and the whole init is one groupBy(min_by) — fully
      // parallel and partition-invariant (a row_number stride over id
      // order would need a global single-partition window, the exact
      // shape this engine bans from every registered plan). Rare empty
      // strata are filled from the k smallest unused ids (TakeOrdered —
      // also distributed).
      val strata = vecs
        .withColumn("stratum",
          pmod(col(idCol) * 48271L % 2147483647L, lit(k)).cast("int"))
        .groupBy(col("stratum"))
        .agg(min_by(col("v"), col(idCol)).as("v"), min(col(idCol)).as("mid"))
        .collect()
        .map(r => r.getInt(0) -> (r.getSeq[Double](1).toArray, r.getLong(2)))
        .toMap
      // All k strata covered ⇒ n >= k and no fallback needed; the count()
      // and TakeOrdered jobs below only run in the rare sparse case, which
      // matters when training costs are dominated by job scheduling (a
      // typical fit here is ~8 short jobs over a persisted corpus).
      lazy val fallback: Array[(Array[Double], Long)] = {
        val n = vecs.count()
        require(n >= k, s"need >= $k training vectors, got $n")
        val usedIds = strata.values.map(_._2).toSet
        vecs.orderBy(col(idCol)).limit(2 * k)
          .select(col("v"), col(idCol)).collect()
          .map(r => (r.getSeq[Double](0).toArray, r.getLong(1)))
          .filterNot { case (_, id) => usedIds.contains(id) }
      }
      var fb = 0
      val initRows = Array.tabulate(k) { c =>
        strata.get(c) match {
          case Some((v, _)) => v
          case None => val v = fallback(fb)._1; fb += 1; v
        }
      }
      var books: Array[Array[Array[Double]]] = Array.tabulate(m)(mm =>
        Array.tabulate(k)(j =>
          java.util.Arrays.copyOfRange(initRows(j), mm * subDim, (mm + 1) * subDim)))
      var it = 0
      while (it < iters) {
        val model = books
        val assignAll = udf((v: Seq[Double]) => {
          val cells = new Array[Int](m)
          var mm = 0
          while (mm < m) {
            val sub = new Array[Double](subDim)
            var i = 0
            while (i < subDim) { sub(i) = v(mm * subDim + i); i += 1 }
            cells(mm) = nearestCellL2(model(mm), sub)
            mm += 1
          }
          cells
        })
        val sums = vecs
          .withColumn("cells", assignAll(col("v")))
          .select(col("v"), posexplode(col("cells")).as(Seq("m", "cell")))
          // back to float for the aggregator's input encoder — lossless,
          // the doubles are exact float values from the corpus cast above
          .select(col("m"), col("cell"),
            expr(s"cast(slice(v, m * $subDim + 1, $subDim) as array<float>)").as("sub"))
          .groupBy(col("m"), col("cell"))
          .agg(Aggregates.weightedArrayMeanFP(subDim)(lit(1L), col("sub")).as("s"))
          .collect()
        val next = books.map(_.map(_.clone())) // empty cells keep their centroid
        sums.foreach { r =>
          val mm = r.getInt(0)
          val cell = r.getInt(1)
          val s = r.getSeq[Long](2)
          val cnt = s(subDim).toDouble
          if (cnt > 0) next(mm)(cell) = Array.tabulate(subDim)(i => s(i) / 1e9 / cnt)
        }
        books = next
        it += 1
      }
      books
    } finally vecs.unpersist(blocking = false)
  }

  /** Driver-side twin of the distributed PQ fit. Replicates the loop's
    * arithmetic EXACTLY — hash-stratified min-id init with the smallest-
    * unused-id fallback, per-subspace float-cast slices, nano-unit
    * half-away rounding before integer sums, `s/1e9/cnt` means — so the
    * codebooks are bit-identical whichever path ran (asserted in
    * KMeansSpec). */
  private def fitPqDriver(rows: Array[(Long, Array[Double])], m: Int,
                          subDim: Int, k: Int,
                          iters: Int): Array[Array[Array[Double]]] = {
    // init: one representative per MINSTD stratum (min id wins)
    val strata = new java.util.HashMap[Int, (Array[Double], Long)]()
    rows.foreach { case (id, v) =>
      val stratum = ((id * 48271L % 2147483647L % k) + k) % k
      val cur = strata.get(stratum.toInt)
      if (cur == null || id < cur._2) strata.put(stratum.toInt, (v, id))
    }
    lazy val fallback: Array[Array[Double]] = {
      require(rows.length >= k, s"need >= $k training vectors, got ${rows.length}")
      val used = (0 until k).flatMap(c => Option(strata.get(c)).map(_._2)).toSet
      rows.sortBy(_._1).iterator
        .filterNot { case (id, _) => used.contains(id) }
        .take(k).map(_._2).toArray
    }
    var fb = 0
    val initRows = Array.tabulate(k) { c =>
      strata.get(c) match {
        case null => val v = fallback(fb); fb += 1; v
        case (v, _) => v
      }
    }
    var books: Array[Array[Array[Double]]] = Array.tabulate(m)(mm =>
      Array.tabulate(k)(j =>
        java.util.Arrays.copyOfRange(initRows(j), mm * subDim, (mm + 1) * subDim)))
    val sub = new Array[Double](subDim)
    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Long](m, k, subDim)
      val counts = Array.ofDim[Long](m, k)
      rows.foreach { case (_, v) =>
        var mm = 0
        while (mm < m) {
          val off = mm * subDim
          var i = 0
          while (i < subDim) { sub(i) = v(off + i); i += 1 }
          val cell = nearestCellL2(books(mm), sub)
          val s = sums(mm)(cell)
          i = 0
          while (i < subDim) {
            // the loop aggregates float-cast slices: same quantization here
            s(i) += graft.functions.FP.roundHalfAway(v(off + i).toFloat.toDouble * 1e9)
            i += 1
          }
          counts(mm)(cell) += 1L
          mm += 1
        }
      }
      val next = books.map(_.map(_.clone())) // empty cells keep their centroid
      var mm = 0
      while (mm < m) {
        var cell = 0
        while (cell < k) {
          val cnt = counts(mm)(cell).toDouble
          if (cnt > 0) {
            val s = sums(mm)(cell)
            next(mm)(cell) = Array.tabulate(subDim)(i => s(i) / 1e9 / cnt)
          }
          cell += 1
        }
        mm += 1
      }
      books = next
      it += 1
    }
    books
  }
}
