package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Media

/** ScalaCheck fuzz for the binary media parsers: MediaSpec pins
  * hand-picked adversarial cases; this hammers the PGM header scanner and
  * the RIFF chunk walk with arbitrary shapes and corruptions. The safety
  * property for corrupt bytes is FAIL CLOSED: every malformed payload
  * must surface as the decoders' own IllegalArgumentException (a
  * BufferUnderflow/ArrayIndexOutOfBounds escaping means an unguarded
  * read; a hang means an unbounded scan).
  */
class MediaPropertySpec extends AnyFunSuite {
  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("PGM round-trips arbitrary rasters") {
    check(Prop.forAll(Gen.choose(1, 40), Gen.choose(1, 40),
      Gen.choose(0, Int.MaxValue)) { (w, h, seed) =>
      val px = Array.tabulate(w * h)(i => ((i * 2654435761L + seed) >>> 16).toInt & 0xFF)
      val (gw, gh, maxv, data) = new Media.PgmDecoder().decode(Media.encodePgm(w, h, px(_)))
      gw == w && gh == h && maxv == 255 && data.map(_ & 0xFF).sameElements(px)
    })
  }

  test("WAV round-trips arbitrary PCM16 streams") {
    check(Prop.forAll(Gen.choose(1, 192000), Gen.choose(0, 500),
      Gen.choose(0, Int.MaxValue)) { (rate, n, seed) =>
      val s = Array.tabulate(n)(i => (((i * 40503L + seed) % 65536) - 32768).toInt)
      val (gr, out) = new Media.WavDecoder().decode(Media.encodeWav(rate, s(_), n))
      gr == rate && out.length == n && out.indices.forall(i => out(i) == s(i).toShort)
    })
  }

  test("truncated or bit-flipped payloads fail closed") {
    val pgm = Media.encodePgm(7, 5, i => i)
    val wav = Media.encodeWav(8000, i => i, 9)
    // a corruption may still parse (e.g. a flipped pixel byte, or a header
    // digit that shrinks the raster over valid bytes) — what must never
    // happen is an exception other than the decoders' own IAE
    def safe(f: => Any): Boolean =
      try { f; true } catch { case _: IllegalArgumentException => true }
    check(Prop.forAll(Gen.choose(0, pgm.length - 1)) { cut =>
      safe(new Media.PgmDecoder().decode(pgm.take(cut)))
    })
    check(Prop.forAll(Gen.choose(0, wav.length - 1)) { cut =>
      safe(new Media.WavDecoder().decode(wav.take(cut)))
    })
    check(Prop.forAll(Gen.choose(0, pgm.length - 1), Gen.choose(1, 255)) { (i, x) =>
      val b = pgm.clone(); b(i) = (b(i) ^ x).toByte
      safe(new Media.PgmDecoder().decode(b))
    })
    check(Prop.forAll(Gen.choose(0, wav.length - 1), Gen.choose(1, 255)) { (i, x) =>
      val b = wav.clone(); b(i) = (b(i) ^ x).toByte
      safe(new Media.WavDecoder().decode(b))
    })
  }
}
