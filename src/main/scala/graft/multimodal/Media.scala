package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * Spark-side design (all real and tested): schema carries
  * `media: binary` + `media_meta: struct(kind, width, height)`; feature
  * extraction runs in a TYPED `Dataset.mapPartitions`, so a real decoder is
  * initialized ONCE per partition and fed a stream of rows (the JVM analog
  * of the `mapInPandas` batch shape — at 100 TB, per-row decoder init is
  * the difference between hours and days) while the operator stays inside
  * the SQL engine: Tungsten binary rows in and out, no RDD[Row] round-trip,
  * no scan barrier in the plan. Binary payloads stay opaque to Catalyst:
  * nothing ever stringifies them, and column pruning drops them whenever a
  * query reads only metadata.
  *
  * The DECODE step itself is a clearly-marked deterministic stub — image/
  * audio codecs are not available in this environment; swap `StubDecoder`
  * for a real one without touching the plumbing.
  */
object Media {

  /** STUB decoder: deterministic features from the raw bytes. A real
    * implementation would decode the codec and emit true dimensions /
    * embeddings; the interface and batch shape are the production ones. */
  final class StubDecoder {
    def decode(bytes: Array[Byte]): (Int, Long, Int, Int) = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      // fake dimensions derived from content (deterministic)
      val w = 16 + (sum % 16).toInt
      val h = 16 + ((sum / 16) % 16).toInt
      (bytes.length, sum, w, h)
    }
  }

  /** REAL image decoder: netpbm binary PGM ("P5"), parsed from the public
    * format spec with no external codec — magic, optional `#` comment
    * lines, whitespace-separated width/height/maxval, then one raw byte
    * per pixel. Exists so at least one media path exercises the plumbing
    * with a genuine decode (header parsing, dimension extraction, pixel
    * access), not a checksum stand-in; container formats whose codecs are
    * not in this environment stay behind [[StubDecoder]]. */
  final class PgmDecoder {
    /** @return (width, height, maxval, pixel bytes) */
    def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
      val (w, h, maxval, px, _) = decodeAt(bytes, 0)
      (w, h, maxval, px)
    }

    /** Walk ALL frames of a raw PGM-sequence container (frames laid
      * back-to-back — each P5 header declares its own extent, so the
      * container needs no index; the y4m/raw-frames analog for an
      * environment without video codecs, parsed by the REAL still-image
      * parser). */
    def decodeAll(bytes: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
      val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Array[Byte])]()
      var pos = 0
      while (pos < bytes.length) {
        val (w, h, _, px, next) = decodeAt(bytes, pos)
        out += ((w, h, px))
        pos = next
      }
      out.toSeq
    }

    /** One frame starting at `off`; returns the raster plus the offset of
      * the next frame. */
    private def decodeAt(bytes: Array[Byte], off: Int)
        : (Int, Int, Int, Array[Byte], Int) = {
      require(bytes.length >= off + 2 && bytes(off) == 'P' && bytes(off + 1) == '5',
        "not a binary PGM (P5) payload")
      var pos = off + 2
      def skipWs(): Unit = {
        var done = false
        while (!done && pos < bytes.length) {
          val b = bytes(pos)
          if (b == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
          else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
          else done = true
        }
      }
      def int(): Int = {
        skipWs()
        var v = 0
        require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
          s"malformed PGM header at byte $pos")
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
        }
        v
      }
      val w = int(); val h = int(); val maxval = int()
      pos += 1 // exactly one whitespace byte separates maxval from pixels
      require(w > 0 && h > 0, s"bad PGM dimensions ${w}x$h")
      // maxval > 255 means TWO bytes per sample per the spec — reject
      // rather than silently misread the raster as 8-bit
      require(maxval > 0 && maxval < 256, s"only 8-bit PGM supported (maxval $maxval)")
      // Long arithmetic: w*h can overflow Int for a crafted header, which
      // would wrap the truncation check into a pass
      val nPix = w.toLong * h
      require(bytes.length >= pos + nPix, s"truncated PGM: ${bytes.length} < ${pos + nPix}")
      (w, h, maxval,
        java.util.Arrays.copyOfRange(bytes, pos, pos + nPix.toInt),
        pos + nPix.toInt)
    }
  }

  /** Encode a grayscale image as binary PGM (the inverse of [[PgmDecoder]];
    * used by tests/queries to synthesize real payloads). */
  def encodePgm(w: Int, h: Int, pixel: Int => Int): Array[Byte] = {
    val header = s"P5\n# graft synthetic\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < w * h) { out(header.length + i) = pixel(i).toByte; i += 1 }
    out
  }

  /** Session-scoped counter of rows the decode gate dropped — the drop
    * semantics below are deliberate, but a SILENT drop rate is not: at
    * corpus scale a systematic decoder regression (or an arithmetic
    * overflow upstream of it) would otherwise manifest only as a
    * slightly smaller result set nobody can distinguish from a smaller
    * corpus. One accumulator per SparkContext, shared by every decode
    * surface; read it after an action (EdgeMediaSpec pins that planted
    * garbage is counted here, not just absent from the output). */
  private val dropAccs = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.SparkContext, org.apache.spark.util.LongAccumulator]()
  def decodeDrops(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.util.LongAccumulator =
    dropAccs.computeIfAbsent(spark.sparkContext,
      sc => sc.longAccumulator("graft.media.decode_drops"))

  /** Decode-validity gate — the multimodal twin of the vector validity
    * gate (EdgeVecsSpec's discipline): at corpus scale the media column
    * WILL carry truncated payloads, wrong-magic blobs and crafted
    * headers, and the decoders require() on structure, so ONE bad row
    * would otherwise abort the whole decode stage (task failure, ANSI
    * style). Every real-decoder surface maps through this: an
    * undecodable row is DROPPED — the QC-drop semantics the text and
    * vector families already use — never a stage abort. A torn
    * multi-frame container is dropped WHOLE (a file that fails mid-walk
    * is not trustworthy from its first frame either). Fixtures are
    * well-formed, so every verified result is unchanged; EdgeMediaSpec
    * plants garbage beside good rows and pins the drop semantics.
    * Drops are WITNESSED, never silent: each one ticks the session's
    * [[decodeDrops]] accumulator and an exhausted partition that dropped
    * anything logs one summary line. */
  private def decodeOpt[A, B](iter: Iterator[A],
      drops: org.apache.spark.util.LongAccumulator)(f: A => B): Iterator[B] = {
    var nDrop = 0L
    iter.flatMap { a =>
      try Iterator.single(f(a))
      catch {
        case scala.util.control.NonFatal(_) =>
          nDrop += 1
          drops.add(1L)
          Iterator.empty
      }
    } ++ {
      // evaluated lazily once the wrapped iterator exhausts — one line
      // per partition that actually dropped, not one per row
      if (nDrop > 0)
        System.err.println(s"[media] dropped $nDrop undecodable row(s) in one partition")
      Iterator.empty
    }
  }

  /** Real image features through the production batch shape: decoder init
    * once per partition, typed rows, no RDD barrier. Emits true dimensions,
    * total luminance, and a 4×4 nearest-neighbor thumbnail signature
    * (Σ pixel·(position+1) — sensitive to both values and placement). */
  def imageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val drops = decodeDrops(spark) // registered driver-side, ticked on executors
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val decoder = new PgmDecoder // once per partition
        decodeOpt(iter, drops) { case (id, bytes) =>
          val (w, h, _, px) = decoder.decode(bytes)
          var luma = 0L
          var i = 0
          while (i < px.length) { luma += px(i) & 0xff; i += 1 }
          var thumb = 0L
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val p = px((r * h / 4) * w + (c * w / 4)) & 0xff
              thumb += p.toLong * (r * 4 + c + 1)
              c += 1
            }
            r += 1
          }
          (id, w.toLong, h.toLong, luma, thumb)
        }
      }
      .toDF("doc_id", "width", "height", "luma_sum", "thumb_sum")
  }

  /** Perceptual average-hash (aHash) of each PGM image, through the same
    * decoder-init-once batch shape as [[imageFeatures]]: 8×8
    * nearest-neighbor downsample of the decoded pixels, threshold each
    * cell STRICTLY against the integer mean of the 64 cells, pack the 64
    * bits as two unsigned-32 halves (`ph_lo` = bits 0–31, `ph_hi` = bits
    * 32–63 — two longs so no expression ever constructs the sign bit,
    * which matters under ANSI and keeps the DuckDB oracle in plain `<<`
    * arithmetic). The threshold-vs-mean construction is what makes the
    * hash BRIGHTNESS-INVARIANT: adding a constant to every pixel shifts
    * each cell and the mean by exactly that constant (64·δ/64 is exact),
    * so re-exposed duplicates collapse to one hash while their bytes —
    * and any exact content hash — differ. */
  def imagePHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val drops = decodeDrops(spark) // registered driver-side, ticked on executors
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val decoder = new PgmDecoder // once per partition
        decodeOpt(iter, drops) { case (id, bytes) =>
          val (w, h, _, px) = decoder.decode(bytes)
          val (hi, lo) = aHash64(px, w, h)
          (id, hi, lo)
        }
      }
      .toDF("doc_id", "ph_hi", "ph_lo")
  }

  /** THE aHash kernel — one implementation for still images
    * ([[imagePHash]]) and per-frame video hashing ([[videoFrameHashes]]);
    * a second copy drifting would hash a video frame differently from
    * the same image at rest and silently miss cross-references. */
  private[graft] def aHash64(px: Array[Byte], w: Int, h: Int): (Long, Long) = {
    val cells = new Array[Int](64)
    var sum = 0L
    var t = 0
    while (t < 64) {
      val r = t / 8
      val c = t % 8
      val p = px((r * h / 8) * w + (c * w / 8)) & 0xff
      cells(t) = p
      sum += p
      t += 1
    }
    val mean = sum / 64 // all cells non-negative → floor division
    var lo = 0L
    var hi = 0L
    t = 0
    while (t < 64) {
      if (cells(t) > mean) {
        if (t < 32) lo |= 1L << t else hi |= 1L << (t - 32)
      }
      t += 1
    }
    (hi, lo)
  }

  /** Per-frame perceptual hashes of a raw PGM-sequence video container
    * (1 media row → one row per frame), through the decoder-init-once
    * batch shape: the REAL still-image parser walks the self-delimiting
    * frames ([[PgmDecoder.decodeAll]]) and each raster goes through the
    * SHARED [[aHash64]] kernel. The video member of the perceptual
    * family: brightness drift per frame is absorbed by the hash
    * (q117's invariance), and temporal edits (drops, trims) only
    * remove rows — which is exactly what frame-SET matching (q125)
    * tolerates. */
  def videoFrameHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val drops = decodeDrops(spark) // registered driver-side, ticked on executors
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val decoder = new PgmDecoder // once per partition
        decodeOpt(iter, drops) { case (id, bytes) =>
          decoder.decodeAll(bytes).zipWithIndex.map {
            case ((w, h, px), idx) =>
              val (hi, lo) = aHash64(px, w, h)
              (id, idx.toLong, hi, lo)
          }
        }.flatten
      }
      .toDF("doc_id", "frame_idx", "fh_hi", "fh_lo")
  }

  /** THE 4×16-bit chunk split of a 64-bit perceptual hash — shared by
    * the batch Hamming-tolerant near-dup (q118), its bucket-summary twin
    * (q120) and the streaming first-seen maintenance (StreamingSpec's
    * MemoryStream replay); a second copy drifting would bucket stream-side
    * images differently from the batch dedup and silently miss
    * duplicates. `ph` must carry (doc_id, ph_hi, ph_lo) —
    * [[imagePHash]]'s shape. Chunk identity `ci` is posexplode's 0-based
    * array position: 0/1 from the low word, 2/3 from the high. By
    * pigeonhole, Hamming distance ≤ 3 guarantees at least one identical
    * chunk, so candidates come from a (ci, ck) equi-join — never
    * pairwise. */
  def phashChunks(ph: DataFrame): DataFrame =
    ph.select(col("doc_id"), col("ph_hi"), col("ph_lo"),
      posexplode(array(
        col("ph_lo") % 65536L,
        expr("shiftright(ph_lo, 16)") % 65536L,
        col("ph_hi") % 65536L,
        expr("shiftright(ph_hi, 16)") % 65536L)).as(Seq("ci", "ck")))

  /** REAL audio decoder: RIFF/WAVE PCM, parsed from the public format
    * spec — RIFF container walk (arbitrary chunk order, unknown chunks
    * skipped by their declared size), fmt validation, 16-bit little-endian
    * mono samples. The audio twin of [[PgmDecoder]]. */
  final class WavDecoder {
    /** @return (sampleRate, samples) for PCM16 mono. */
    def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
        "not a RIFF/WAVE payload")
      var pos = 12
      var sampleRate = -1
      var samples: Array[Short] = null
      while (pos + 8 <= bytes.length) {
        val id = tag(pos)
        val size = bb.getInt(pos + 4)
        // Long arithmetic: a declared size near Int.MaxValue would wrap
        // pos+8+size negative and defeat this guard
        require(size >= 0 && pos + 8L + size <= bytes.length,
          s"chunk $id overruns the payload")
        id match {
          case "fmt " =>
            require(size >= 16, s"fmt chunk too short ($size bytes)")
            require(bb.getShort(pos + 8) == 1, "only PCM (format 1) supported")
            require(bb.getShort(pos + 10) == 1, "only mono supported")
            sampleRate = bb.getInt(pos + 12)
            require(bb.getShort(pos + 22) == 16, "only 16-bit supported")
          case "data" =>
            samples = new Array[Short](size / 2)
            var i = 0
            while (i < samples.length) { samples(i) = bb.getShort(pos + 8 + 2 * i); i += 1 }
          case _ => // skip unknown chunks (LIST, cue, ...) by declared size
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(sampleRate > 0 && samples != null, "missing fmt or data chunk")
      (sampleRate, samples)
    }
  }

  /** Encode PCM16 mono as RIFF/WAVE (inverse of [[WavDecoder]]; includes a
    * LIST chunk before fmt so decoders must genuinely walk the container). */
  def encodeWav(sampleRate: Int, sample: Int => Int, n: Int): Array[Byte] = {
    val info = "graft".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val listSize = info.length + (info.length & 1)
    val total = 12 + (8 + listSize) + (8 + 16) + (8 + 2 * n)
    val bb = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = bb.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    tag("RIFF"); bb.putInt(total - 8); tag("WAVE")
    tag("LIST"); bb.putInt(info.length); bb.put(info)
    if ((info.length & 1) == 1) bb.put(0.toByte)
    tag("fmt "); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2); bb.putShort(2); bb.putShort(16)
    tag("data"); bb.putInt(2 * n)
    var i = 0
    while (i < n) { bb.putShort(sample(i).toShort); i += 1 }
    bb.array()
  }

  /** Gain-invariant audio fingerprint through the REAL WAV decoder — the
    * audio member of the perceptual-dedup tier (q117's aHash for sound):
    * the sample stream splits into 16 equal windows and fingerprint bit
    * w (w < 15) is set iff window w's absolute-amplitude sum STRICTLY
    * exceeds window w+1's — the energy-envelope shape, not the levels.
    * Re-mastering that scales every sample by a gain factor scales all
    * window energies together, so the comparison pattern (and the
    * fingerprint) is invariant, while a byte-exact hash sees every
    * re-mastered copy as unique. All arithmetic is integer (|sample|
    * sums, strict compares), so an oracle recomputes the fingerprint
    * exactly from generator arithmetic. Emits (doc_id, n_samples, afp);
    * dedup keys on BOTH — n_samples separates streams the 15-bit
    * envelope could accidentally collide. */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val drops = decodeDrops(spark) // registered driver-side, ticked on executors
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val decoder = new WavDecoder // once per partition
        decodeOpt(iter, drops) { case (id, bytes) =>
          val (_, px) = decoder.decode(bytes)
          val n = px.length
          val e = new Array[Long](16)
          var w = 0
          while (w < 16) {
            // Long bounds: w*n overflows Int past ~134M samples (~2.3 h at
            // 16 kHz) and the negative index would throw — silently
            // dropping a perfectly valid long clip through decodeOpt
            var i = (w.toLong * n / 16).toInt
            val end = ((w + 1).toLong * n / 16).toInt
            var s = 0L
            while (i < end) { s += math.abs(px(i).toLong); i += 1 }
            e(w) = s
            w += 1
          }
          var fp = 0L
          w = 0
          while (w < 15) {
            if (e(w) > e(w + 1)) fp |= 1L << w
            w += 1
          }
          (id, n.toLong, fp)
        }
      }
      .toDF("doc_id", "n_samples", "afp")
  }

  /** FINE-grained gain-invariant audio envelope for the NEAR-dup tier —
    * [[audioFingerprint]]'s 16-window form is the exact-dedup key (q121);
    * Hamming-tolerant matching needs more bits to bucket on, exactly as
    * the image tier needs the 64-bit aHash rather than a 16-bit one. The
    * sample stream splits into 64 equal windows; bit w (w < 63) is set
    * iff window w's absolute-amplitude sum STRICTLY exceeds window
    * w+1's. Gain-invariant for the q121 reason (a positive gain scales
    * all window energies together). The 63 bits pack into the
    * (ph_hi, ph_lo) layout of [[imagePHash]] ON PURPOSE: the 4×16-bit
    * chunk split ([[phashChunks]]), the pigeonhole bound and the
    * first-seen bucket maintenance are SHARED with the image tier —
    * audio near-dup (q123) and its streaming twin (q124) reuse the same
    * constructions the image pair (q118/q120) verified. */
  def audioEnvelope64(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val drops = decodeDrops(spark) // registered driver-side, ticked on executors
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val decoder = new WavDecoder // once per partition
        decodeOpt(iter, drops) { case (id, bytes) =>
          val (_, px) = decoder.decode(bytes)
          val n = px.length
          val e = new Array[Long](64)
          var w = 0
          while (w < 64) {
            // Long bounds: w*n overflows Int past ~34M samples (~35 min at
            // 16 kHz) and the negative index would throw — silently
            // dropping a perfectly valid long clip through decodeOpt
            var i = (w.toLong * n / 64).toInt
            val end = ((w + 1).toLong * n / 64).toInt
            var s = 0L
            while (i < end) { s += math.abs(px(i).toLong); i += 1 }
            e(w) = s
            w += 1
          }
          var hi = 0L
          var lo = 0L
          w = 0
          while (w < 63) {
            if (e(w) > e(w + 1)) {
              if (w < 32) lo |= 1L << w else hi |= 1L << (w - 32)
            }
            w += 1
          }
          (id, n.toLong, hi, lo)
        }
      }
      .toDF("doc_id", "n_samples", "ph_hi", "ph_lo")
  }

  /** Real audio features: sample count, rate, total |amplitude|, peak. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val drops = decodeDrops(spark) // registered driver-side, ticked on executors
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val decoder = new WavDecoder // once per partition
        decodeOpt(iter, drops) { case (id, bytes) =>
          val (rate, px) = decoder.decode(bytes)
          var sumAbs = 0L
          var peak = 0L
          var i = 0
          while (i < px.length) {
            val a = math.abs(px(i).toLong)
            sumAbs += a
            if (a > peak) peak = a
            i += 1
          }
          (id, rate.toLong, px.length.toLong, sumAbs, peak)
        }
      }
      .toDF("doc_id", "sample_rate", "n_samples", "sum_abs", "peak")
  }

  /** Per-partition feature extraction over (doc_id, media) rows: decoder
    * init amortized across the partition. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val decoder = new StubDecoder // once per partition
        iter.map { case (id, bytes) =>
          val (n, sum, w, h) = decoder.decode(bytes)
          (id, n, sum, w, h)
        }
      }
      .toDF("doc_id", "n_bytes", "checksum", "width", "height")
  }

  /** STUB frame sampler: a real implementation seeks key-frames in the
    * container; the stub slices `nFrames` equal byte ranges (last frame
    * takes the remainder). The plumbing — one input row fanning out to
    * `nFrames` feature rows, decoder init once per partition, frames never
    * materialized as a column unless asked for — is the production shape. */
  def frameSample(media: DataFrame, nFrames: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val decoder = new StubDecoder // once per partition
        iter.flatMap { case (id, bytes) =>
          val q = bytes.length / nFrames
          (0 until nFrames).iterator.map { i =>
            val from = i * q
            val until = if (i < nFrames - 1) (i + 1) * q else bytes.length
            val (n, sum, _, _) =
              decoder.decode(java.util.Arrays.copyOfRange(bytes, from, until))
            (id, i.toLong, n.toLong, sum)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "n_bytes", "checksum")
  }

  /** STUB resize: a real implementation decodes, scales, re-encodes; the
    * stub keeps every 2nd byte (deterministic 2x downsample). Emits the
    * resized payload's size and checksum. */
  def resize(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        val decoder = new StubDecoder // once per partition
        iter.map { case (id, bytes) =>
          val out = new Array[Byte]((bytes.length + 1) / 2)
          var i = 0
          while (i < out.length) { out(i) = bytes(2 * i); i += 1 }
          val (n, sum, _, _) = decoder.decode(out)
          (id, bytes.length.toLong, n.toLong, sum)
        }
      }
      .toDF("doc_id", "orig_bytes", "resized_bytes", "checksum")
  }
}
