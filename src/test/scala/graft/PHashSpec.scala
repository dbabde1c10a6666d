package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Media

/** Properties of q117 (perceptual-hash image dedup) the oracle gate
  * cannot see — the gate proves both engines compute the identical
  * hash/grouping; these tests pin the capability DELTA the operator
  * exists for:
  *  - byte-exact hashing (the q30 md5 discipline) finds ZERO duplicates
  *    on this corpus — every re-exposure has different bytes — while the
  *    perceptual hash groups every brightness-shifted copy;
  *  - the groups are exactly the planted pattern groups (doc_id % 25):
  *    brightness invariance holds for every delta, and no two distinct
  *    patterns collide;
  *  - invariance is exact arithmetic, not tolerance: a +1 brightness
  *    step yields a bit-identical hash through the real decoder.
  */
class PHashSpec extends SparkSuite {
  private val d = "/root/testdata/sf0.001"

  private def dedup = SparkEntry.queries("q117_image_phash_dedup")(spark, d)

  test("md5 sees every re-exposure as unique; the perceptual hash groups them all") {
    val out = dedup
    val docs = Tables.documents(spark, d).count()
    // exact-byte dedup over the SAME synthesized media: zero duplicates
    val enc = udf((id: Long) => {
      val g = (id % 25).toInt
      val delta = ((id / 25) % 40).toInt
      Media.encodePgm(8 + g % 9, 8 + g % 7, i => (i * 31 + g * 17) % 200 + delta)
    })
    val mediaHashes = Tables.documents(spark, d)
      .select(md5(enc(col("doc_id"))).as("mh")).distinct().count()
    assert(mediaHashes == docs,
      s"expected every media payload byte-distinct, got $mediaHashes of $docs")
    // the perceptual hash collapses each pattern group to ONE canonical
    val groups = out.select("ph_hi", "ph_lo").distinct().count()
    assert(groups == 25L, s"expected 25 perceptual groups, got $groups")
    val dups = out.filter(col("is_dup")).count()
    assert(dups == docs - 25,
      s"expected ${docs - 25} brightness-shifted duplicates, got $dups")
  }

  test("groups are exactly the planted patterns: same g ⇒ same hash, different g ⇒ different hash") {
    val withG = dedup.withColumn("g", col("doc_id") % 25)
    val perG = withG.groupBy("g")
      .agg(countDistinct(col("ph_hi"), col("ph_lo")).as("nh"))
      .filter(col("nh") =!= 1).count()
    assert(perG == 0, s"$perG pattern groups split across hashes " +
      "(brightness invariance broken)")
    val perHash = withG.groupBy("ph_hi", "ph_lo")
      .agg(countDistinct(col("g")).as("ng"))
      .filter(col("ng") =!= 1).count()
    assert(perHash == 0, s"$perHash hashes shared by distinct patterns " +
      "(collision on this corpus)")
  }

  test("q118: few-bit perturbed replicas group with their base; exact-hash equality misses them") {
    val out = SparkEntry.queries("q118_image_neardup")(spark, d)
    val n = out.count()
    // every replica resolves to its group base (doc_id % 25): replicas
    // flip 0–3 sampled cells by construction — always within the 3-bit
    // tolerance of the base, never within 3 bits of another group
    val unresolved = out.filter(col("doc_id") =!= col("doc_id") % 25)
      .filter(col("dup_of") =!= col("doc_id") % 25).count()
    assert(unresolved == 0,
      s"$unresolved replicas failed to resolve to their base")
    val dups = out.filter(col("is_dup")).count()
    assert(dups == n - 25, s"expected ${n - 25} near-dups, got $dups")
    // the capability delta vs q117's exact grouping: only replicas with
    // ZERO flipped cells (r % 4 == 0 — brightness-only copies) share the
    // base's exact hash; each perturbed replica's distinct flip set gives
    // a distinct hash, so Hamming-0 grouping finds just the
    // brightness-only dups and keeps every content-perturbed one
    val distinctHashes = out.select("ph_hi", "ph_lo").distinct().count()
    val exactDups = n - distinctHashes
    assert(exactDups < dups,
      s"exact grouping ($exactDups dups) should find strictly fewer than " +
        s"Hamming-3 grouping ($dups)")
    // 20 replicas per group: 5 with r%4==0 share one hash (4 exact dups),
    // 15 perturbed are unique → 16 hashes/group, 4 exact dups/group
    assert(distinctHashes == 25 * 16,
      s"expected 400 distinct hashes (16 per group), got $distinctHashes")
    assert(exactDups == 25 * 4,
      s"expected 100 exact dups (brightness-only copies), got $exactDups")
  }

  test("brightness invariance is exact: +1 on every pixel gives a bit-identical hash") {
    import spark.implicits._
    def hashOf(delta: Int): (Long, Long) = {
      val bytes = Media.encodePgm(11, 9, i => (i * 31 + 5) % 200 + delta)
      val df = Seq((1L, bytes)).toDF("doc_id", "media")
      val r = Media.imagePHash(df).head()
      (r.getLong(1), r.getLong(2))
    }
    assert(hashOf(0) == hashOf(1))
    assert(hashOf(0) == hashOf(39))
  }

  test("q121: gain-scaled re-masters fingerprint-identical; byte hash finds none of them") {
    val out = SparkEntry.queries("q121_audio_fingerprint_dedup")(spark, d)
    val docs = Tables.documents(spark, d).count()
    // the q121 fixture: pattern group g = doc_id % 25, gain k = 1 + (doc_id/25) % 3
    val withG = out.withColumn("g", col("doc_id") % 25)
    val split = withG.groupBy("g")
      .agg(countDistinct(col("n_samples"), col("afp")).as("nf"))
      .filter(col("nf") =!= 1).count()
    assert(split == 0, s"$split pattern groups split across fingerprints " +
      "(gain invariance broken)")
    val merged = withG.groupBy("n_samples", "afp")
      .agg(countDistinct(col("g")).as("ng"))
      .filter(col("ng") =!= 1).count()
    assert(merged == 0, s"$merged fingerprints shared by distinct patterns")
    val dups = out.filter(col("is_dup")).count()
    assert(dups == docs - 25, s"expected ${docs - 25} re-master dups, got $dups")
    // the capability delta: the same WAV payloads byte-hashed are all
    // unique — gain ×2/×3 changes every sample's bytes
    import spark.implicits._
    val enc = udf((id: Long) => {
      val g = (id % 25).toInt
      val k = 1 + ((id / 25) % 3).toInt
      Media.encodeWav(16000,
        i => (((i.toLong * 7 + g * 13) % 4096 - 2048) * k).toInt, 100 + g)
    })
    val byteHashes = Tables.documents(spark, d)
      .select(md5(enc(col("doc_id"))).as("mh")).distinct().count()
    // gains repeat with period 3 in doc_id/25, so only (g, k) pairs are
    // byte-distinct: 75 payload variants cover the whole corpus
    assert(byteHashes == 75L,
      s"expected 75 byte-distinct payloads (25 patterns x 3 gains), got $byteHashes")
    assert(docs - byteHashes.toLong > 0 && byteHashes > 25L,
      "byte hashing must find fewer dups than the fingerprint")
  }

  test("q123: a 1-bit-shifted re-master resolves to its base; exact envelope equality misses it") {
    import spark.implicits._
    import graft.queries.StreamMultimodalQueries.{AudioCodebook, envelopeAmps}
    // hand-built pair: the group-0 base clip vs a re-master with window 1
    // raised just above window 2 (the site-1 flip) AND gain x2 — the
    // envelope moves exactly ONE bit, so exact-fingerprint equality
    // separates them while the Hamming-tolerant tier must not
    val base = envelopeAmps(AudioCodebook(0))
    val shifted = base.clone(); shifted(1) = base(2) + 5
    def wav(a: Array[Int], k: Int) = Media.encodeWav(16000, i => a(i / 4) * k, 256)
    val fps = Media.audioEnvelope64(
      Seq((0L, wav(base, 1)), (1L, wav(shifted, 2))).toDF("doc_id", "media"))
      .orderBy("doc_id")
      .select(col("ph_hi"), col("ph_lo")).as[(Long, Long)].collect()
    assert(fps(0) != fps(1), "exact fingerprints must differ (the exact-tier miss)")
    val ham = java.lang.Long.bitCount(fps(0)._1 ^ fps(1)._1) +
      java.lang.Long.bitCount(fps(0)._2 ^ fps(1)._2)
    assert(ham == 1, s"the site-1 flip must move exactly one bit, got $ham")
    // the registered near-dup query resolves EVERY re-master (bit flips
    // and gain together) to its group base
    val out = SparkEntry.queries("q123_audio_neardup")(spark, d)
    val wrong = out.filter(col("dup_of") =!= col("doc_id") % 25).count()
    assert(wrong == 0, s"$wrong docs resolved off their group base")
    val docs = Tables.documents(spark, d).count()
    assert(out.filter(col("is_dup")).count() == docs - 25)
    // the capability delta vs the exact tier, measured on the SAME
    // output: the four nested flip prefixes per group are four DISTINCT
    // exact fingerprints (gain never splits one — invariance), so exact
    // dedup keeps 100 survivors where the near tier keeps 25
    val nfp = out.select(col("ph_hi"), col("ph_lo")).distinct().count()
    assert(nfp == 100, s"expected 25 groups x 4 flip prefixes = 100 " +
      s"distinct exact fingerprints, got $nfp")
  }

  test("q125: head-trimmed, re-graded video re-masters resolve to their base; md5 misses all") {
    import spark.implicits._
    // the real multi-frame walk: a 3-frame container decodes to 3 rasters
    val clip = (0 until 3).map(f =>
      Media.encodePgm(16, 16, p => (p + f * 7) % 200)).reduce(_ ++ _)
    val frames = new Media.PgmDecoder().decodeAll(clip)
    assert(frames.size == 3 && frames.forall { case (w, h, px) =>
      w == 16 && h == 16 && px.length == 256 })
    // the registered near-dup query resolves EVERY re-master (head trim
    // of r%3 frames AND +r re-grade together) to its group base
    val out = SparkEntry.queries("q125_video_neardup")(spark, d)
    val wrong = out.filter(col("dup_of") =!= col("doc_id") % 25).count()
    assert(wrong == 0, s"$wrong videos resolved off their group base")
    val docs = Tables.documents(spark, d).count()
    assert(out.filter(col("is_dup")).count() == docs - 25)
    // trims really happened: kept-frame counts span {4, 5, 6}
    val nfs = out.select(col("n_frames")).distinct()
      .as[Long].collect().toSet
    assert(nfs == Set(4L, 5L, 6L), s"unexpected frame counts $nfs")
    // byte hashing finds NO duplicates: every (g, r) payload differs
    // (the re-grade touches every pixel byte, the trim changes length)
    val enc = udf((id: Long) => {
      val g = id % 25
      val r = ((id / 25) % 20).toInt
      (r % 3 until 6).map { f =>
        Media.encodePgm(16, 16, p =>
          graft.queries.StreamMultimodalQueries.bimodalBase(g * 6 + f, p.toLong) + r)
      }.reduce(_ ++ _)
    })
    val byteHashes = Tables.documents(spark, d)
      .select(md5(enc(col("doc_id"))).as("mh")).distinct().count()
    assert(byteHashes == 500L,
      s"every (pattern, re-master) payload must be byte-unique, got $byteHashes")
  }

  test("q127: per-frame re-encode drift (r%4 bits per frame) resolves to its base; exact frame equality misses it") {
    import spark.implicits._
    // the registered Hamming-tolerant query resolves EVERY re-master
    // (head trim + re-grade + per-frame cell flips together) to its base
    val out = SparkEntry.queries("q127_video_neardup_hamming")(spark, d)
    val wrong = out.filter(col("dup_of") =!= col("doc_id") % 25).count()
    assert(wrong == 0, s"$wrong drifted videos resolved off their group base")
    val docs = Tables.documents(spark, d).count()
    assert(out.filter(col("is_dup")).count() == docs - 25)
    // the capability delta, measured on the SAME flipped corpus: exact
    // frame-hash matching (q125's tier) only links replicas whose frames
    // are UNperturbed (r%4 == 0 — 5 of 20 per group; flip sets are keyed
    // by r, so any two distinct perturbed replicas share zero exact
    // frame hashes), leaving every drifted replica unresolved
    val encFlip = udf((id: Long) => {
      val g = id % 25
      val r = ((id / 25) % 20).toInt
      (r % 3 until 6).map { f =>
        val pert = (0 until r % 4)
          .map(j => (r * 17 + j * 29 + f * 31) % 64)
          .map(t => 32 * (t / 8) + 2 * (t % 8)).toSet
        Media.encodePgm(16, 16, { p =>
          val b = graft.queries.StreamMultimodalQueries.bimodalBase(g * 6 + f, p.toLong)
          (if (pert(p)) 200 - b else b) + r
        })
      }.reduce(_ ++ _)
    })
    val fd = Media.videoFrameHashes(Tables.documents(spark, d)
        .select(col("doc_id"), encFlip(col("doc_id")).as("media")))
      .select(col("doc_id"), col("fh_hi"), col("fh_lo")).distinct()
    val exactDups = fd.as("a").join(fd.as("b"),
        col("a.fh_hi") === col("b.fh_hi") && col("a.fh_lo") === col("b.fh_lo") &&
          col("b.doc_id") < col("a.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id")).count()
      .filter(col("count") >= 4)
      .select(col("a.doc_id")).distinct().count()
    // 5 unperturbed replicas per group, 4 of them non-minimal → 100
    assert(exactDups == 100,
      s"exact frame matching must catch only the unflipped re-masters (100), got $exactDups")
  }

  test("gain invariance is exact arithmetic: x2 and x7 re-masters fingerprint-identically") {
    import spark.implicits._
    def fpOf(k: Int): (Long, Long) = {
      val bytes = Media.encodeWav(8000,
        i => (((i * 11 + 3) % 512 - 256) * k), 97)
      val r = Media.audioFingerprint(Seq((1L, bytes)).toDF("doc_id", "media")).head()
      (r.getLong(1), r.getLong(2))
    }
    assert(fpOf(1) == fpOf(2))
    assert(fpOf(1) == fpOf(7))
  }
}
