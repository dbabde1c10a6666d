package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

class PcaSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 6

  /** Deterministic anisotropic cloud: variance concentrated on a known
    * 2-D plane (axes e0+e1 and e2), small hash-noise elsewhere. */
  private def corpus(n: Int) = {
    (0 until n).map { i =>
      val a = ((i * 7919 % 101) - 50) / 10.0 // spread ±5 on the main axis
      val b = ((i * 104729 % 61) - 30) / 15.0 // spread ±2 on the second
      val noise = (j: Int) => ((i * 31 + j * 17) % 7 - 3) / 100.0
      val v = Array(
        a + noise(0), a + noise(1), b + noise(2),
        noise(3), noise(4), noise(5)).map(_.toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
  }

  test("symEigen: diagonalizes a hand matrix (analytic eigenpairs)") {
    // [[2,1],[1,2]] has eigenvalues 3, 1 with vectors (1,1)/√2, (1,-1)/√2
    val (evals, evecs) = Pca.symEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(evals(0) - 3.0) < 1e-12)
    assert(math.abs(evals(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(evecs(0)(0) - s) < 1e-12 && math.abs(evecs(0)(1) - s) < 1e-12)
    // sign normalization: largest-|entry| positive, first index wins ties
    assert(math.abs(math.abs(evecs(1)(0)) - s) < 1e-12)
    assert(evecs(1)(0) > 0 && evecs(1)(1) < 0)
  }

  test("symEigen: eigenvectors are orthonormal and reconstruct the matrix") {
    // pseudo-random symmetric 8x8 (hash-driven, no RNG state)
    val d = 8
    val m = Array.tabulate(d, d) { (i, j) =>
      val k = math.min(i, j) * 31 + math.max(i, j) * 7
      ((k * 2654435761L % 1000) - 500) / 500.0
    }
    val (evals, v) = Pca.symEigen(m)
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => v(i)(k) * v(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"V not orthonormal at ($i,$j): $dot")
      val rec = (0 until d).map(k => evals(k) * v(k)(i) * v(k)(j)).sum
      assert(math.abs(rec - m(i)(j)) < 1e-9, s"VΛVᵀ ≠ M at ($i,$j)")
    }
    // sorted descending
    assert(evals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
  }

  test("fit recovers the dominant variance directions") {
    val model = Pca.fit(corpus(300), "embedding", dim)
    // top eigenvalue belongs to the (1,1,0,..)/√2 axis
    val c0 = model.components(0)
    assert(math.abs(math.abs(c0(0)) - 1 / math.sqrt(2)) < 0.05, c0.toSeq)
    assert(math.abs(math.abs(c0(1)) - 1 / math.sqrt(2)) < 0.05, c0.toSeq)
    // second component is the e2 axis
    val c1 = model.components(1)
    assert(math.abs(math.abs(c1(2)) - 1.0) < 0.05, c1.toSeq)
    // noise dims carry ~zero variance
    assert(model.eigenvalues(0) > 10 * model.eigenvalues(2))
  }

  test("fit is bit-identical across partitionings and vs the driver path") {
    val df = corpus(300)
    val a = Pca.fit(df.repartition(1), "embedding", dim,
      allowDriverFastPath = false)
    val b = Pca.fit(df.repartition(7, $"vec_id"), "embedding", dim,
      allowDriverFastPath = false)
    val drv = Pca.fit(df, "embedding", dim)
    for (m <- Seq(b, drv)) {
      assert(a.mean.toSeq === m.mean.toSeq)
      assert(a.eigenvalues.toSeq === m.eigenvalues.toSeq)
      a.components.zip(m.components).foreach { case (x, y) =>
        assert(x.toSeq === y.toSeq)
      }
    }
  }

  test("projection decorrelates: projected co-moments are ~diagonal") {
    val df = corpus(300)
    val model = Pca.fit(df, "embedding", dim)
    val k = 3
    val rows = Pca.project(df, model, "embedding", k)
      .select(col("pc")).collect().map(_.getSeq[Long](0).map(_ / 1e6).toArray)
    val n = rows.length.toDouble
    val mean = Array.tabulate(k)(j => rows.map(_(j)).sum / n)
    for (i <- 0 until k; j <- 0 until k if i != j) {
      val cov = rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
      val scale = math.sqrt(model.eigenvalues(i) * model.eigenvalues(j))
      assert(math.abs(cov) < 0.02 * scale + 1e-4,
        s"projected dims $i,$j correlated: $cov")
    }
    // per-component variance tracks the eigenvalue (µ-rounding noise aside)
    for (j <- 0 until k) {
      val varJ = rows.map(r => (r(j) - mean(j)) * (r(j) - mean(j))).sum / n
      assert(math.abs(varJ - model.eigenvalues(j)) <
        0.02 * model.eigenvalues(j) + 1e-4)
    }
  }
}
