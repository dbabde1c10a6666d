package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Bpe

/** ScalaCheck fuzz for BPE training: BpeSpec pins hand-derived merges;
  * this spec hammers the two training paths with ARBITRARY weighted
  * histograms — repeated symbols (overlap greediness), heavy tie
  * plateaus (uniform weights), single-char and repeated-char words —
  * asserting the driver fast path and the distributed loop stay
  * bit-identical, and that application invariants hold for any learned
  * table. Spark cases are capped (each distributed fit runs ~2 jobs per
  * merge); the pure-JVM application properties run at full volume.
  */
class BpePropertySpec extends SparkSuite {
  import spark.implicits._

  private def check(p: Prop, min: Int): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(r.passed, r.status.toString)
  }

  // small alphabet so pair collisions and ties are common
  private val word: Gen[String] = for {
    n <- Gen.choose(1, 6)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val histogram: Gen[Seq[(String, Long)]] = for {
    n <- Gen.choose(1, 8)
    ws <- Gen.listOfN(n, word)
    // duplicates collapse by summing — a histogram has distinct keys
    wcs <- Gen.listOfN(n, Gen.choose(1L, 5L))
  } yield ws.zip(wcs).groupBy(_._1).map { case (w, g) =>
    (w, g.map(_._2).sum)
  }.toSeq

  test("driver fast path ≡ distributed loop on arbitrary histograms") {
    check(Prop.forAll(histogram, Gen.choose(1, 6)) { (rows, nMerges) =>
      val df = rows.toDF("w", "wc")
      val driver = Bpe.train(df, "w", "wc", nMerges)
      val loop = Bpe.train(df, "w", "wc", nMerges, allowDriverFastPath = false)
      driver == loop
    }, min = 30)
  }

  test("application invariants for any learned table") {
    check(Prop.forAll(histogram, Gen.choose(1, 8)) { (rows, nMerges) =>
      val df = rows.toDF("w", "wc")
      val merges = Bpe.train(df, "w", "wc", nMerges)
      val pairs = merges.map(m => (m.left, m.right))
      rows.forall { case (w, _) =>
        val syms = Bpe.symbolize(w, pairs)
        // reconstruction: concatenating symbols recovers word + marker
        syms.mkString == w + Bpe.EndOfWord &&
          // counts are positive and non-increasing in training order
          merges.sliding(2).forall {
            case Seq(a, b) => a.count >= b.count && b.count > 0
            case _ => merges.forall(_.count > 0)
          }
      }
    }, min = 15)
  }

  test("symbolize is deterministic and prefix-stable") {
    // applying a PREFIX of the merge table then the rest equals applying
    // the whole table (merges replay strictly in order)
    check(Prop.forAll(histogram, Gen.choose(2, 6)) { (rows, nMerges) =>
      val merges = Bpe.train(rows.toDF("w", "wc"), "w", "wc", nMerges)
        .map(m => (m.left, m.right))
      rows.forall { case (w, _) =>
        val whole = Bpe.symbolize(w, merges).toSeq
        val k = merges.length / 2
        val staged = Bpe.applyMerges(
          Bpe.symbolize(w, merges.take(k)), merges.drop(k)).toSeq
        whole == staged
      }
    }, min = 15)
  }
}
