package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic distributed logistic regression — the trained quality
  * classifier a curation pipeline runs where heuristics stop being enough
  * (the CCNet/fastText pattern: train a small linear model on a
  * weak-labeled subset, score the whole corpus with it).
  *
  * Same training discipline as [[KMeans]]/[[Bpe]]:
  *
  *  - full-batch gradient descent with a FIXED iteration count and a fixed
  *    learning rate — no RNG, no data-dependent stopping;
  *  - each iteration is ONE aggregation job over the persisted feature
  *    frame: per-row gradient contributions (σ(w·x) − y)·x quantize to
  *    integer nano-units ([[graft.functions.FP.roundHalfAway]]) before the
  *    sum, so the gradient — and therefore the whole weight trajectory —
  *    is bit-identical under any partitioning (map-side combine collapses
  *    each partition to `dim` rows);
  *  - the driver holds only the weight vector (the MODEL, never the data);
  *  - size-conditional driver fast path with the exact same arithmetic
  *    (spec-asserted bit-identical), the branch a bounded training subset
  *    takes in deployment.
  *
  * Scoring is a narrow map against the broadcast weights — embarrassingly
  * parallel, like every other apply path in this engine.
  */
object Logit {

  /** @param feats (xCol: array&lt;double&gt; of dim, yCol: 0.0/1.0 label)
    * @return weights, index-aligned with xCol */
  def fit(feats0: DataFrame, xCol: String, yCol: String, dim: Int,
          iters: Int, lr: Double,
          allowDriverFastPath: Boolean = true): Array[Double] = {
    // rows with a null/short feature vector or null label are SKIPPED
    // (and excluded from n, the gradient divisor) — both fit paths must
    // see exactly the same row set or their bit-equality breaks
    val feats = feats0
      .select(col(xCol).cast("array<double>").as("x"),
        col(yCol).cast("double").as("y"))
      .filter(col("x").isNotNull && size(col("x")) >= dim &&
        col("y").isNotNull)
      .persist()
    try {
      val n = feats.count()
      require(n > 0, "empty training set")
      val rowCap = math.max(1L, Joins.maxRows(feats) / math.max(1, dim / 2))
      if (allowDriverFastPath && n <= rowCap) {
        val rows = feats.collect()
          .map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
        fitDriver(rows, dim, iters, lr)
      } else {
        var w = new Array[Double](dim)
        var it = 0
        while (it < iters) {
          val wCur = w
          val gradUdf = udf((x: Seq[Double], y: Double) =>
            gradQuantized(wCur, x, y))
          val sums = feats
            .select(posexplode(gradUdf(col("x"), col("y"))).as(Seq("j", "g")))
            .groupBy(col("j")).agg(sum(col("g")).as("gs"))
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
          w = step(w, j => sums.getOrElse(j, 0L), n, lr)
          it += 1
        }
        w
      }
    } finally feats.unpersist(blocking = false)
  }

  /** Per-row gradient (σ(w·x) − y)·x, nano-quantized — THE shared kernel
    * of both fit paths (a drifted copy would break their bit-equality). */
  private[operators] def gradQuantized(w: Array[Double], x: Seq[Double],
                                       y: Double): Array[Long] = {
    var z = 0.0
    var j = 0
    val m = math.min(w.length, x.length)
    while (j < m) { z += w(j) * x(j); j += 1 }
    val p = 1.0 / (1.0 + math.exp(-z))
    val out = new Array[Long](w.length)
    j = 0
    while (j < m) {
      out(j) = graft.functions.FP.roundHalfAway((p - y) * x(j) * 1e9)
      j += 1
    }
    out
  }

  private def step(w: Array[Double], g: Int => Long, n: Long,
                   lr: Double): Array[Double] =
    Array.tabulate(w.length)(j => w(j) - lr * (g(j) / 1e9) / n.toDouble)

  /** Driver twin: same quantized gradient, same update order. */
  private def fitDriver(rows: Array[(Array[Double], Double)], dim: Int,
                        iters: Int, lr: Double): Array[Double] = {
    var w = new Array[Double](dim)
    var it = 0
    while (it < iters) {
      val sums = new Array[Long](dim)
      rows.foreach { case (x, y) =>
        val g = gradQuantized(w, x, y)
        var j = 0
        while (j < dim) { sums(j) += g(j); j += 1 }
      }
      w = step(w, sums(_), rows.length.toLong, lr)
      it += 1
    }
    w
  }

  /** df + `scoreCol`: σ(w·x) in fixed-point micro-units — a narrow map
    * against the broadcast weights. */
  def score(df: DataFrame, w: Array[Double], xCol: String,
            scoreCol: String): DataFrame = {
    val u = udf((x: Seq[Double]) =>
      if (x == null) null
      else {
        var z = 0.0
        var j = 0
        val m = math.min(w.length, x.length)
        while (j < m) { z += w(j) * x(j); j += 1 }
        java.lang.Long.valueOf(
          graft.functions.FP.roundHalfAway(1e6 / (1.0 + math.exp(-z))))
      })
    df.withColumn(scoreCol, u(col(xCol)))
  }
}
