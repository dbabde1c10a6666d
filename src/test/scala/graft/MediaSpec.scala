package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Media

/** Unit coverage for the REAL media parsers (the oracle queries q93/q94
  * verify them end-to-end through Spark; these pin the format edge cases
  * directly: header comments, chunk order, alignment, malformed input). */
class MediaSpec extends AnyFunSuite {

  test("PGM round-trip: encode → decode recovers dims and every pixel") {
    val dec = new Media.PgmDecoder
    for ((w, h) <- Seq((1, 1), (8, 14), (16, 9), (255, 3))) {
      val px = Array.tabulate(w * h)(i => (i * 31 + 7) % 256)
      val (dw, dh, maxval, out) = dec.decode(Media.encodePgm(w, h, px(_)))
      assert((dw, dh, maxval) == (w, h, 255))
      assert(out.map(_ & 0xff).toSeq == px.toSeq)
    }
  }

  test("PGM header comments are skipped wherever whitespace is legal") {
    val dec = new Media.PgmDecoder
    val bytes = "P5\n#c1\n # not this: 9\n12 # trailing\n5\n255\n"
      .getBytes("US-ASCII") ++ Array.fill(60)(42.toByte)
    val (w, h, _, px) = dec.decode(bytes)
    assert((w, h) == (12, 5) && px.length == 60 && px.forall(_ == 42))
  }

  test("PGM rejects bad magic, truncated pixels, 16-bit maxval, and overflow dims") {
    val dec = new Media.PgmDecoder
    intercept[IllegalArgumentException](dec.decode("P6\n2 2\n255\n1234".getBytes))
    intercept[IllegalArgumentException](
      dec.decode("P5\n4 4\n255\n".getBytes ++ Array.fill(3)(0.toByte)))
    // maxval > 255 = two bytes/sample per the spec: reject, don't misread
    intercept[IllegalArgumentException](
      dec.decode("P5\n2 2\n65535\n".getBytes ++ Array.fill(8)(0.toByte)))
    // w*h overflows Int: the truncation check must not wrap into a pass
    intercept[IllegalArgumentException](
      dec.decode("P5\n65536 65536\n255\n".getBytes ++ Array.fill(16)(0.toByte)))
  }

  test("WAV round-trip: negative amplitudes survive the 16-bit decode") {
    val dec = new Media.WavDecoder
    val samples = Array.tabulate(321)(i => (i * 211) % 65536 - 32768)
    val (rate, out) = dec.decode(Media.encodeWav(44100, samples(_), samples.length))
    assert(rate == 44100)
    assert(out.map(_.toInt).toSeq == samples.toSeq)
  }

  test("WAV walks chunks in any order and skips unknown ones") {
    // encodeWav already emits LIST before fmt; additionally append a bogus
    // trailing chunk and re-wrap — the parser must ignore it
    val base = Media.encodeWav(8000, i => i, 5)
    val extra = "junk".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // size 3 + pad
    val total = base.length + extra.length
    val bb = java.nio.ByteBuffer.wrap(base.clone() ++ extra)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, total - 8) // fix the RIFF size
    val (rate, out) = new Media.WavDecoder().decode(bb.array())
    assert(rate == 8000 && out.toSeq == Seq[Short](0, 1, 2, 3, 4))
  }

  test("WAV rejects non-RIFF payloads, overrunning and overflowing chunks") {
    val dec = new Media.WavDecoder
    intercept[IllegalArgumentException](dec.decode("OGGS everything".getBytes))
    def corrupt(patch: (java.nio.ByteBuffer, Int, Int) => Unit): Array[Byte] = {
      val b = Media.encodeWav(8000, i => i, 4)
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      patch(bb, b.indexOfSlice("data".getBytes("US-ASCII")),
        b.indexOfSlice("fmt ".getBytes("US-ASCII")))
      b
    }
    // data chunk declares more bytes than the payload has
    intercept[IllegalArgumentException](
      dec.decode(corrupt((bb, d, _) => bb.putInt(d + 4, 1 << 20))))
    // declared size near Int.MaxValue: pos+8+size must not wrap negative
    intercept[IllegalArgumentException](
      dec.decode(corrupt((bb, d, _) => bb.putInt(d + 4, Int.MaxValue - 4))))
    // fmt chunk shorter than its 16 mandatory bytes
    intercept[IllegalArgumentException](
      dec.decode(corrupt((bb, _, f) => bb.putInt(f + 4, 4))))
  }
}
