package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches
import graft.operators.Sketches.CountMin

/** Count-Min properties, Spark-free: the aggregator is exercised directly
  * as (zero | reduce | merge) so the partition-invariance claim — the
  * basis of q47's golden-fixture oracle — is tested against every split of
  * the input, not just the one Spark happened to pick. */
class SketchSpec extends AnyFunSuite {
  private val Depth = 4
  private val Width = 256

  // deterministic multiset: token i appears freq(i) times
  private val freqs: Map[Long, Int] =
    (0 until 200).map(i => (i * 0x9E3779B9L + 7L, 1 + (i % 37))).toMap
  private val stream: Seq[Long] =
    freqs.toSeq.flatMap { case (k, n) => Seq.fill(n)(k) }
  private val n = stream.length

  private def build(keys: Seq[Long]): Array[Long] = {
    val agg = new Sketches.CountMin(Depth, Width)
    keys.foldLeft(agg.zero)(agg.reduce)
  }

  test("estimates are one-sided: never below the true count") {
    val cms = build(stream).toIndexedSeq
    freqs.foreach { case (k, f) =>
      val est = CountMin.estimate(cms, k, Depth, Width)
      assert(est >= f, s"key $k: est $est < true $f")
    }
  }

  test("estimates respect the e·N/width error bound") {
    val cms = build(stream).toIndexedSeq
    // P(err > e·N/w) ≤ e^-depth ≈ 1.8% per key; with 200 keys allow the
    // expected handful of outliers but cap them and the excess magnitude
    val bound = math.ceil(math.E * n / Width).toLong
    val excesses = freqs.toSeq.map { case (k, f) =>
      CountMin.estimate(cms, k, Depth, Width) - f
    }
    assert(excesses.count(_ > bound) <= 8,
      s"too many estimates past e*N/w=$bound: ${excesses.sorted.reverse.take(10)}")
  }

  test("merge is partition-invariant: any split, any order, same cells") {
    val whole = build(stream)
    val agg = new Sketches.CountMin(Depth, Width)
    Seq(1, 7, 64).foreach { parts =>
      val chunks = stream.grouped(math.max(1, stream.length / parts)).toSeq
      val merged = chunks.reverse // merge in a different order too
        .map(build).reduce(agg.merge)
      assert(merged.toSeq === whole.toSeq, s"split into $parts differs")
    }
  }

  test("sketch of a shuffled stream is identical (order-free)") {
    // deterministic shuffle: sort by a cheap mixed key
    val shuffled = stream.zipWithIndex
      .sortBy { case (k, i) => (k * 2654435761L + i) ^ (k >>> 13) }.map(_._1)
    assert(build(shuffled).toSeq === build(stream).toSeq)
  }
}
