package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2.9: the reference is
  * batch-only; this is the engine's upgrade path for incremental ingest).
  *
  * Every transformation here is written once against an unbounded
  * DataFrame and works IDENTICALLY in batch — the Spark way to keep the
  * two paths provably consistent (the StreamingSpec replays a batch
  * through `MemoryStream` and asserts equality against the batch run).
  *
  * At scale: windowed aggregations with watermarks bound state; the
  * shuffle is on (window, event_type) — partitions stay balanced as long
  * as event time advances.
  */
object EventStreams {
  /** Normalize the events table: epoch-nano long → timestamp (µs). */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling-window counts + value sums per event type. Works on both
    * batch and streaming frames; pass a watermark for streaming state GC. */
  def windowedStats(events: DataFrame, windowLen: String = "1 hour",
                    watermark: Option[String] = None): DataFrame = {
    val base = withEventTime(events)
    val marked = watermark.fold(base)(w => base.withWatermark("event_time", w))
    marked
      .groupBy(window(col("event_time"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Per-user session activity: last event time and running event count —
    * the mapGroupsWithState-shaped problem expressed with windowed agg for
    * determinism; a custom-state variant lives in the spec. */
  def userActivity(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val base = withEventTime(events)
    val marked = watermark.fold(base)(w => base.withWatermark("event_time", w))
    marked.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(col("event_time")).as("last_seen"),
        sum(col("value")).as("total_value"))
  }
}
