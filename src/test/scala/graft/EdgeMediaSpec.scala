package graft

import graft.multimodal.Media

/** The media decode-validity gate under planted garbage — the
  * EdgeVecsSpec discipline for the binary column: at corpus scale the
  * media column WILL carry truncated payloads, wrong-magic blobs and
  * crafted headers, and the decoders require() on structure, so without
  * the gate ONE bad row aborts the whole decode stage. These tests mix
  * garbage beside well-formed rows through every real-decoder surface
  * and pin the drop semantics: good rows unchanged, bad rows gone, no
  * exception.
  */
class EdgeMediaSpec extends SparkSuite {
  import spark.implicits._

  private def goodImg(id: Long) =
    (id, Media.encodePgm(16, 16, p => (p * 3 + id.toInt) % 200))

  private val badImgs: Seq[(Long, Array[Byte])] = Seq(
    (100L, Array.empty[Byte]),                               // empty
    (101L, "P6\n2 2\n255\n0000".getBytes("US-ASCII")),       // wrong magic (PPM)
    (102L, "P5\n16 16\n255\nshort".getBytes("US-ASCII")),    // truncated raster
    (103L, "P5\n1000000 1000000\n255\n".getBytes("US-ASCII")), // crafted dims
    (104L, "P5\n0 4\n255\n".getBytes("US-ASCII")),           // zero width
    (105L, "P5\n2 2\n70000\n00000000".getBytes("US-ASCII"))) // 16-bit maxval

  private def goodWav(id: Long) =
    (id, Media.encodeWav(16000, i => (i * 31 + id.toInt) % 1000 - 500, 96))

  private val badWavs: Seq[(Long, Array[Byte])] = Seq(
    (200L, Array.empty[Byte]),                               // empty
    (201L, "RIFX0000WAVE".getBytes("US-ASCII")),             // wrong magic
    (202L, "RIFF0000JUNK".getBytes("US-ASCII")),             // not WAVE
    (203L, Media.encodeWav(16000, _ => 1, 96).dropRight(40))) // torn data chunk

  test("image surfaces drop undecodable rows and keep the rest") {
    val mixed = (Seq(goodImg(0), goodImg(1), goodImg(2)) ++ badImgs)
      .toDF("doc_id", "media")
    val feats = Media.imageFeatures(mixed)
    // drops are WITNESSED: the session accumulator ticks once per
    // dropped row, so a systematic decoder regression at corpus scale
    // is a visible counter, not a silently smaller result set
    val drops0 = Media.decodeDrops(spark).value
    assert(feats.count() == 3)
    assert(Media.decodeDrops(spark).value - drops0 == badImgs.size,
      "every planted-garbage drop must tick the decode_drops accumulator")
    assert(feats.select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
    // values of the survivors are EXACTLY the clean-frame values — the
    // gate must not perturb, only drop
    val clean = Media.imageFeatures(
      Seq(goodImg(0), goodImg(1), goodImg(2)).toDF("doc_id", "media"))
    assert(feats.orderBy("doc_id").collect().toSeq ==
      clean.orderBy("doc_id").collect().toSeq)
    val ph = Media.imagePHash(mixed)
    assert(ph.count() == 3)
  }

  test("audio surfaces drop undecodable rows and keep the rest") {
    val mixed = (Seq(goodWav(0), goodWav(1)) ++ badWavs).toDF("doc_id", "media")
    assert(Media.audioFeatures(mixed).count() == 2)
    assert(Media.audioFingerprint(mixed).count() == 2)
    assert(Media.audioEnvelope64(mixed).count() == 2)
    val clean = Media.audioFingerprint(
      Seq(goodWav(0), goodWav(1)).toDF("doc_id", "media"))
    assert(Media.audioFingerprint(mixed).orderBy("doc_id").collect().toSeq ==
      clean.orderBy("doc_id").collect().toSeq)
  }

  test("a torn multi-frame container is dropped whole; intact ones keep every frame") {
    val intact = (0L, (0 until 3).map(f =>
      Media.encodePgm(8, 8, p => (p + f) % 100)).reduce(_ ++ _))
    // valid first frame, garbage tail: fails mid-walk → whole row dropped
    val torn = (1L, intact._2.take(
      intact._2.length / 3) ++ "garbage".getBytes("US-ASCII"))
    val out = Media.videoFrameHashes(Seq(intact, torn).toDF("doc_id", "media"))
    val rows = out.select("doc_id", "frame_idx")
      .as[(Long, Long)].collect().toSet
    assert(rows == Set((0L, 0L), (0L, 1L), (0L, 2L)),
      s"expected exactly the intact container's 3 frames, got $rows")
  }
}
