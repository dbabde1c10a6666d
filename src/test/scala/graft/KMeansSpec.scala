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

  test("deterministic across partitionings (distributed loop pinned)") {
    val a = KMeans.fit(corpus(90).repartition(1), "vec_id", "embedding",
      dim, 3, 5, allowDriverFastPath = false)
    val b = KMeans.fit(corpus(90).repartition(7, $"vec_id"), "vec_id",
      "embedding", dim, 3, 5, allowDriverFastPath = false)
    a.zip(b).foreach { case (ca, cb) =>
      assert(ca.toSeq === cb.toSeq, "centroids differ across partitionings")
    }
  }

  test("fit driver fast path is bit-identical to the distributed loop") {
    val df = corpus(90)
    val driver = KMeans.fit(df, "vec_id", "embedding", dim, 3, 5)
    val loop = KMeans.fit(df, "vec_id", "embedding", dim, 3, 5,
      allowDriverFastPath = false)
    driver.zip(loop).foreach { case (ca, cb) =>
      assert(ca.toSeq === cb.toSeq, "driver and loop centroids differ")
    }
  }

  test("empty cells keep their previous centroid") {
    // k = 5 over 3 clusters: at least 2 cells can end up empty; fit must
    // not NaN them
    val model = KMeans.fit(corpus(30), "vec_id", "embedding", dim, 5, 4)
    model.foreach(c => assert(c.forall(x => !x.isNaN && !x.isInfinite)))
  }

  // ---- PQ codebooks (fitPq / nearestCellL2) --------------------------------

  /** 8-dim corpus = 2 subspaces × 4 dims, clusters in each subspace. */
  private def corpus8(n: Int) = {
    (0 until n).map { i =>
      val a = if (i % 2 == 0) 1.0f else -1.0f
      val b = if (i % 3 == 0) 2.0f else 0.5f
      val j = 0.01f * (i % 7)
      (i.toLong, Seq(a + j, a, j, a, b, b + j, b, j))
    }.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
  }

  test("fitPq is deterministic across partitionings (distributed loop pinned)") {
    val a = KMeans.fitPq(corpus8(60).repartition(1), "vec_id", "embedding",
      2, 4, 4, 3, allowDriverFastPath = false)
    val b = KMeans.fitPq(corpus8(60).repartition(7, $"vec_id"), "vec_id",
      "embedding", 2, 4, 4, 3, allowDriverFastPath = false)
    a.zip(b).foreach { case (ba, bb) =>
      ba.zip(bb).foreach { case (ca, cb) =>
        assert(ca.toSeq === cb.toSeq, "PQ codebooks differ across partitionings")
      }
    }
  }

  test("fitPq driver fast path is bit-identical to the distributed loop") {
    // plain ids, and a strided id space (changes the MINSTD strata and can
    // leave some sparse — exercising the smallest-unused-id fallback)
    for (idExpr <- Seq("vec_id", "vec_id * 7 + 3")) {
      val df = corpus8(40).selectExpr(s"$idExpr as vec_id", "embedding")
      val driver = KMeans.fitPq(df, "vec_id", "embedding", 2, 4, 4, 3)
      val loop = KMeans.fitPq(df, "vec_id", "embedding", 2, 4, 4, 3,
        allowDriverFastPath = false)
      driver.zip(loop).foreach { case (ba, bb) =>
        ba.zip(bb).foreach { case (ca, cb) =>
          assert(ca.toSeq === cb.toSeq,
            s"driver and loop codebooks differ (ids: $idExpr)")
        }
      }
    }
  }

  test("ADC identity: sum of subspace tables equals L2² to the reconstruction") {
    // For any query q and code c: Σ_m ‖q_m − book(m)(c_m)‖² must equal
    // ‖q − decode(c)‖² exactly (same additions, disjoint dims) — the
    // algebra ADC search relies on.
    val books = KMeans.fitPq(corpus8(60), "vec_id", "embedding", 2, 4, 4, 3)
    val q = Array(0.9, 0.8, 0.1, 1.1, 1.9, 2.2, 1.8, 0.2)
    val code = (0 until 2).map { m =>
      KMeans.nearestCellL2(books(m), q.slice(4 * m, 4 * m + 4).toSeq)
    }
    val viaTables = (0 until 2).map { m =>
      val cent = books(m)(code(m))
      (0 until 4).map { i => val x = q(4 * m + i) - cent(i); x * x }.sum
    }.sum
    val recon = (0 until 2).flatMap(m => books(m)(code(m)))
    val direct = q.indices.map { i => val x = q(i) - recon(i); x * x }.sum
    // identical sums in different association order — equal up to fp
    // rounding (the subspace dims are disjoint, so the terms are the same)
    assert(math.abs(viaTables - direct) <= 1e-12 * math.max(1.0, direct),
      s"$viaTables vs $direct")
  }

  test("nearestCellL2 breaks exact ties to the lowest cell") {
    val cents = Array(Array(1.0, 0.0), Array(-1.0, 0.0), Array(1.0, 0.0))
    assert(KMeans.nearestCellL2(cents, Seq(0.0, 5.0)) === 0)
    assert(KMeans.nearestCellL2(cents, Seq(1.0, 0.0)) === 0)
    assert(KMeans.nearestCellL2(cents, Seq(-0.9, 0.0)) === 1)
  }
}
