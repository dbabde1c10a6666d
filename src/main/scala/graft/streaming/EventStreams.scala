package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
  /** Normalize `ts` to an `event_time` timestamp (µs precision). Accepts
    * either an epoch-nano long (legacy generator / test fixtures) or a
    * (possibly NTZ) timestamp column, so the same transformation runs
    * over batch tables and MemoryStream frames alike. */
  def withEventTime(events: DataFrame): DataFrame = {
    val et = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ =>
        col("ts").cast(org.apache.spark.sql.types.TimestampType)
    }
    events.withColumn("event_time", et)
  }

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

  /** Per-user activity: last event time and running event count. */
  def userActivity(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val base = withEventTime(events)
    val marked = watermark.fold(base)(w => base.withWatermark("event_time", w))
    marked.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(col("event_time")).as("last_seen"),
        sum(col("value")).as("total_value"))
  }

  /** Streaming exact dedup — the ingest-side half of the dedup family: a
    * content fingerprint (native codegen char hash) keyed to its first-seen
    * time and duplicate count. Identical in batch; under streaming the
    * state is one row per DISTINCT fingerprint (not per event), the same
    * bound a dedup filter fundamentally needs. */
  def dedupFirstSeen(events: DataFrame): DataFrame =
    withEventTime(events)
      .withColumn("fp", graft.functions.CharHashExpr.charHashNative(
        concat(col("event_type"), lit(":"), coalesce(col("props"), lit("")))))
      .groupBy(col("fp"))
      .agg(min(unix_micros(col("event_time"))).as("first_seen_us"),
        count(lit(1)).as("n_dups"))

  /** Stream-stream INTERVAL JOIN: each purchase joined to the same user's
    * clicks in the preceding `windowUs` — the attribution-join shape, and
    * the one §2.9 Structured Streaming operator the rest of this file
    * doesn't exercise. Written once against unbounded frames: in batch it
    * is a plain range join; under streaming BOTH sides carry watermarks
    * and the time-bound condition lets Spark GC each side's buffered rows
    * once the watermark passes the interval (state stays O(window), not
    * O(stream)). StreamingSpec replays a batch through MemoryStreams and
    * asserts the joined pairs are identical.
    *
    * @param watermark e.g. Some("0 seconds") for streaming inputs; None in
    *                  batch (withWatermark is a no-op there but keeping the
    *                  plans literally identical makes the equality test
    *                  sharper) */
  def purchaseClickJoin(events: DataFrame, windowUs: Long,
                        watermark: Option[String] = None): DataFrame = {
    val base = withEventTime(events)
    val marked = watermark.fold(base)(w => base.withWatermark("event_time", w))
    val purchases = marked.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("event_time").as("p_time"))
    val clicks = marked.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("c_time"))
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_time") <= col("p_time") &&
        col("c_time") >= col("p_time") - expr(s"INTERVAL $windowUs MICROSECOND"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        unix_micros(col("p_time")).as("p_us"), unix_micros(col("c_time")).as("c_us"))
  }

  // ---- gap-based sessionization (custom streaming state) ------------------

  /** One event inside the sessionizer. `vU` is the value in fixed-point
    * micro-units so session sums are order-independent and exact. */
  case class SessEvent(user_id: Long, t_us: Long, v_u: Long)

  /** A closed session. */
  case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, total_value_u: Long)

  /** Open-session state (public: Catalyst codegen instantiates it). */
  case class OpenSession(start: Long, end: Long, n: Long, vsum: Long)

  /** Batch form: lag → new-session flag → running sum → group. Used by the
    * verified q82; the streaming form below must produce the same sessions
    * (asserted in StreamingSpec). */
  def sessionizeBatch(events: DataFrame, gapUs: Long): DataFrame = {
    val base = withEventTime(events)
      .select(col("user_id"), unix_micros(col("event_time")).as("t_us"),
        col("value").as("v_u"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"))
    base
      .withColumn("prev", lag(col("t_us"), 1).over(w))
      .withColumn("ns",
        when(col("prev").isNull || col("t_us") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("ns"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("t_us")).as("session_start_us"),
        max(col("t_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("v_u")).as("total_value_u"))
  }

  /** Streaming form: `flatMapGroupsWithState` keeps ONE open session per
    * user (bounded state — this is what makes it viable over an unbounded
    * stream at scale), closes it when a later event arrives past the gap,
    * and flushes it on event-time timeout once the watermark passes
    * `session end + gap`. Within a micro-batch events arrive unordered —
    * they are sorted in-memory per (user × batch), which is bounded by the
    * batch, not the stream. */
  def sessionizeStream(events: Dataset[SessEvent], gapUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", timestamp_micros(col("t_us")))
      .withWatermark("event_time", "0 seconds")
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.end, s.n, s.vsum))
          } else {
            val sorted = rows.toArray.sortBy(e => (e._2, e._3))
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(s) if e._2 - s.end <= gapUs =>
                  open = Some(OpenSession(s.start, math.max(s.end, e._2),
                    s.n + 1, s.vsum + e._3))
                case Some(s) =>
                  closed += Session(userId, s.start, s.end, s.n, s.vsum)
                  open = Some(OpenSession(e._2, e._2, 1, e._3))
                case None =>
                  open = Some(OpenSession(e._2, e._2, 1, e._3))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.end + gapUs) / 1000 + 1)
            }
            closed.iterator
          }
      }
  }
}
