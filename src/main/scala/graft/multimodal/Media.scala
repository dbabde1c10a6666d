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
}
