package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.FP
import graft.multimodal.Media
import graft.streaming.EventStreams

/** Streaming-consistent event analytics (run here in batch; the identical
  * transformations run under Structured Streaming in StreamingSpec) and the
  * multimodal binary-column pipeline.
  */
object StreamMultimodalQueries extends QueryModule {

  // ---- q80: tumbling-window event stats (streaming-shared code) ----------
  private def q80(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("value", FP.micro(col("value"))) // long µ-units → exact sums
    EventStreams.windowedStats(ev, "1 hour")
      .select(unix_micros(col("window_start")).as("window_us"),
        col("event_type"), col("n_events"), col("sum_value").as("sum_value_u"))
      .orderBy("window_us", "event_type")
  }

  private val q80Sql =
    s"""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_us,
       | event_type, count(*) AS n_events,
       | CAST(sum(${FP.sqlMicro("value")}) AS BIGINT) AS sum_value_u
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- q81: per-user activity state (streaming-shared code) --------------
  private def q81(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("value", FP.micro(col("value")))
    EventStreams.userActivity(ev)
      .select(col("user_id"), col("n_events"),
        unix_micros(col("last_seen")).as("last_seen_us"),
        col("total_value").as("total_value_u"))
      .orderBy("user_id")
  }

  private val q81Sql =
    s"""SELECT user_id, count(*) AS n_events,
       | max(epoch_us(ts)) AS last_seen_us,
       | CAST(sum(${FP.sqlMicro("value")}) AS BIGINT) AS total_value_u
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q90: multimodal binary columns + per-partition decode -------------
  private def q90(s: SparkSession, d: String): DataFrame = {
    val media = Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(lit("text/plain").as("kind"), lit(0).as("width"),
        lit(0).as("height")).as("media_meta"))
    Media.decodeFeatures(media)
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        col("checksum"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy("doc_id")
  }

  // ASCII text ⇒ byte sum == codepoint sum; fake dims mirror the stub
  private val q90Sql =
    """WITH f AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |    list_sum(list_transform(string_split(text, ''),
      |      c -> CAST(ascii(c) AS BIGINT))) AS checksum
      |  FROM documents)
      |SELECT doc_id, n_bytes, CAST(checksum AS BIGINT) AS checksum,
      |  CAST(16 + checksum % 16 AS BIGINT) AS width,
      |  CAST(16 + (checksum // 16) % 16 AS BIGINT) AS height
      |FROM f ORDER BY 1""".stripMargin

  def defs: Map[String, QueryDef] = Map(
    "q80_windowed_events" -> QueryDef(q80, Some(q80Sql)),
    "q81_user_activity" -> QueryDef(q81, Some(q81Sql)),
    "q90_multimodal_decode" -> QueryDef(q90, Some(q90Sql)))
}
