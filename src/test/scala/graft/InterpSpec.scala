package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Interp

class InterpSpec extends AnyFunSuite {
  private val xs = Array(0.0, 1.0, 2.5, 4.0, 6.0)
  private val ys = Array(1.0, 3.0, 2.0, 5.0, 4.0)

  test("linear reproduces nodes") {
    xs.indices.foreach { i =>
      assert(Interp.linear(xs, ys, xs(i)) === ys(i))
    }
  }

  test("linear interpolates midpoints and clamps ends (np.interp semantics)") {
    assert(Interp.linear(xs, ys, 0.5) === 2.0)
    assert(Interp.linear(xs, ys, -10.0) === 1.0) // clamp left
    assert(Interp.linear(xs, ys, 100.0) === 4.0) // clamp right
  }

  test("spline reproduces nodes") {
    val m = Interp.splineMoments(xs, ys)
    xs.indices.foreach { i =>
      assert(math.abs(Interp.splineEval(xs, ys, m, xs(i)) - ys(i)) < 1e-12)
    }
  }

  test("not-a-knot spline reproduces cubic polynomials exactly (incl. extrapolation)") {
    // A single cubic satisfies all not-a-knot constraints, so the spline
    // must BE that cubic — this distinguishes not-a-knot (scipy
    // interp1d(kind="cubic")) from a natural spline, which would fail.
    def p(x: Double) = 2.0 * x * x * x - 3.0 * x * x + 0.5 * x - 7.0
    val px = Array(-2.0, -0.5, 1.0, 2.0, 4.5, 7.0)
    val py = px.map(p)
    val m = Interp.splineMoments(px, py)
    Seq(-5.0, -1.9, 0.0, 1.7, 3.3, 6.9, 12.0).foreach { t =>
      assert(math.abs(Interp.splineEval(px, py, m, t) - p(t)) < 1e-8,
        s"at t=$t")
    }
  }

  test("spline degenerate sizes: n=2 linear, n=3 parabola") {
    val x2 = Array(0.0, 2.0); val y2 = Array(1.0, 5.0)
    val m2 = Interp.splineMoments(x2, y2)
    assert(Interp.splineEval(x2, y2, m2, 1.0) === 3.0)
    def q(x: Double) = x * x - 2 * x + 3
    val x3 = Array(0.0, 1.0, 3.0); val y3 = x3.map(q)
    val m3 = Interp.splineMoments(x3, y3)
    Seq(0.5, 2.0, -1.0, 4.0).foreach { t =>
      assert(math.abs(Interp.splineEval(x3, y3, m3, t) - q(t)) < 1e-10)
    }
  }

  test("spline is C2: moments equation implies continuous 1st derivative at knots") {
    val m = Interp.splineMoments(xs, ys)
    // numeric derivative from both sides of an interior knot
    val eps = 1e-7
    (1 until xs.length - 1).foreach { i =>
      val dl = (Interp.splineEval(xs, ys, m, xs(i)) -
        Interp.splineEval(xs, ys, m, xs(i) - eps)) / eps
      val dr = (Interp.splineEval(xs, ys, m, xs(i) + eps) -
        Interp.splineEval(xs, ys, m, xs(i))) / eps
      assert(math.abs(dl - dr) < 1e-5, s"kink at knot $i")
    }
  }

  test("pchip reproduces nodes and linear data exactly") {
    val got = Interp.pchipOnto(xs, ys, xs)
    xs.indices.foreach(i => assert(math.abs(got(i) - ys(i)) < 1e-12))
    // all secants equal → every derivative is that slope → the line
    val lx = Array(0.0, 1.0, 3.0, 4.5)
    val ly = lx.map(x => 2.0 * x - 1.0)
    Seq(-1.0, 0.5, 2.0, 4.0, 6.0).foreach { t =>
      val v = Interp.pchipOnto(lx, ly, Array(t))(0)
      assert(math.abs(v - (2.0 * t - 1.0)) < 1e-12, s"at t=$t")
    }
  }

  test("pchip matches the Fritsch-Carlson hand computation at a local max") {
    // xs=[0,1,2], ys=[0,1,0]: interior secants +1/-1 → d1=0;
    // edge d0 = ((2+1)*1 - 1*(-1))/2 = 2 (kept: |2| <= 3|m0|).
    // Segment 0 Hermite: y(0.5) = 2*0.5 + (3*1-2*2-0)*0.25 = 0.75.
    val v = Interp.pchipOnto(Array(0.0, 1.0, 2.0), Array(0.0, 1.0, 0.0),
      Array(0.5))(0)
    assert(math.abs(v - 0.75) < 1e-12)
  }

  test("pchip is shape-preserving: no overshoot on monotone data") {
    // the not-a-knot spline DOES overshoot this step-like data; pchip must not
    val sx = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    val sy = Array(0.0, 0.0, 0.1, 9.9, 10.0, 10.0)
    val ts = (0 to 500).map(i => i * 0.01).toArray
    val vals = Interp.pchipOnto(sx, sy, ts)
    assert(vals.forall(v => v >= -1e-12 && v <= 10.0 + 1e-12),
      s"overshoot: min=${vals.min} max=${vals.max}")
    // and monotone between nodes
    ts.indices.drop(1).foreach { i =>
      assert(vals(i) >= vals(i - 1) - 1e-12, s"non-monotone at ${ts(i)}")
    }
  }

  test("sortDedup sorts by x and keeps first occurrence") {
    val (dx, dy) = Interp.sortDedup(
      Array(3.0, 1.0, 3.0, 2.0), Array(30.0, 10.0, 31.0, 20.0))
    assert(dx.toSeq == Seq(1.0, 2.0, 3.0))
    assert(dy.toSeq == Seq(10.0, 20.0, 30.0))
  }
}
