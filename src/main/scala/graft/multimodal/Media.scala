package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * Spark-side design (all real and tested): schema carries
  * `media: binary` + `media_meta: struct(kind, width, height)`; feature
  * extraction runs in `mapPartitions` so a real decoder is initialized
  * ONCE per partition and fed a stream of rows (the JVM analog of the
  * `mapInPandas` batch shape — at 100 TB, per-row decoder init is the
  * difference between hours and days). Binary payloads stay opaque to
  * Catalyst: nothing ever stringifies them, and column pruning drops them
  * whenever a query reads only metadata.
  *
  * The DECODE step itself is a clearly-marked deterministic stub — image/
  * audio codecs are not available in this environment; swap `StubDecoder`
  * for a real one without touching the plumbing.
  */
object Media {
  val metaType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

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

  /** Per-partition feature extraction over (doc_id, media) rows: decoder
    * init amortized across the partition. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id").cast("long"), col("media")).rdd
      .mapPartitions { iter =>
        val decoder = new StubDecoder // once per partition
        iter.map { r =>
          val (n, sum, w, h) = decoder.decode(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), n, sum, w, h)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** STUB frame sampler: a real implementation seeks key-frames in the
    * container; the stub slices `nFrames` equal byte ranges (last frame
    * takes the remainder). The plumbing — one input row fanning out to
    * `nFrames` feature rows, decoder init once per partition, frames never
    * materialized as a column unless asked for — is the production shape. */
  def frameSample(media: DataFrame, nFrames: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id").cast("long"), col("media")).rdd
      .mapPartitions { iter =>
        val decoder = new StubDecoder // once per partition
        iter.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val q = bytes.length / nFrames
          (0 until nFrames).iterator.map { i =>
            val from = i * q
            val until = if (i < nFrames - 1) (i + 1) * q else bytes.length
            val (n, sum, _, _) =
              decoder.decode(java.util.Arrays.copyOfRange(bytes, from, until))
            Row(r.getLong(0), i.toLong, n.toLong, sum)
          }
        }
      }
    spark.createDataFrame(rdd, frameSchema)
  }

  val resizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("orig_bytes", LongType, nullable = false),
    StructField("resized_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** STUB resize: a real implementation decodes, scales, re-encodes; the
    * stub keeps every 2nd byte (deterministic 2x downsample). Emits the
    * resized payload's size and checksum. */
  def resize(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id").cast("long"), col("media")).rdd
      .mapPartitions { iter =>
        val decoder = new StubDecoder // once per partition
        iter.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val out = new Array[Byte]((bytes.length + 1) / 2)
          var i = 0
          while (i < out.length) { out(i) = bytes(2 * i); i += 1 }
          val (n, sum, _, _) = decoder.decode(out)
          Row(r.getLong(0), bytes.length.toLong, n.toLong, sum)
        }
      }
    spark.createDataFrame(rdd, resizeSchema)
  }
}
