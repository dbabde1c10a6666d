package graft

import graft.operators.KMeans

class KMeansSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 4

  /** Three well-separated directional clusters. */
  private def corpus(n: Int) = {
    val protos = Seq(
      Array(1.0f, 0f, 0f, 0f), Array(0f, 1.0f, 0f, 0f), Array(0f, 0f, 1.0f, 0f))
    (0 until n).map { i =>
      val p = protos(i % 3)
      val jitter = 0.05f * ((i * 7919 % 13) - 6) / 6.0f
      (i.toLong, p.toSeq.map(x => x + (if (x == 0f) jitter.abs else 0f)))
    }.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
  }

  test("recovers separated directional clusters") {
    val model = KMeans.fit(corpus(90), "vec_id", "embedding", dim, 3, 5)
    val norms = model.map(c => math.sqrt(c.map(x => x * x).sum))
    // every cluster prototype lands in its own cell
    val cells = Seq(
      Seq(1.0f, 0f, 0f, 0f), Seq(0f, 1.0f, 0f, 0f), Seq(0f, 0f, 1.0f, 0f))
      .map(p => KMeans.nearestCell(model, norms, p))
    assert(cells.distinct.length === 3, s"prototypes collapsed: $cells")
    // and each centroid is dominated by its prototype axis
    model.foreach { c =>
      val maxAbs = c.map(math.abs).max
      assert(maxAbs > 0.8, s"centroid not aligned: ${c.toSeq}")
    }
  }

  test("deterministic across partitionings (fixed-point updates)") {
    val a = KMeans.fit(corpus(90).repartition(1), "vec_id", "embedding", dim, 3, 5)
    val b = KMeans.fit(corpus(90).repartition(7, $"vec_id"), "vec_id", "embedding", dim, 3, 5)
    a.zip(b).foreach { case (ca, cb) =>
      assert(ca.toSeq === cb.toSeq, "centroids differ across partitionings")
    }
  }

  test("empty cells keep their previous centroid") {
    // k = 5 over 3 clusters: at least 2 cells can end up empty; fit must
    // not NaN them
    val model = KMeans.fit(corpus(30), "vec_id", "embedding", dim, 5, 4)
    model.foreach(c => assert(c.forall(x => !x.isNaN && !x.isInfinite)))
  }
}
