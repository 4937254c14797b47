package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-window aggregations over an event stream `(event_id, ts, user_id,
  * event_type, value, ...)` — the Structured-Streaming surface of the
  * engine. Each transform is a pure DataFrame function, so the SAME code
  * runs in batch (over the events table, DuckDB-oracled) and as a
  * `readStream` stage with a watermark (spec-tested with MemoryStream):
  * Spark's unified Dataset API is the whole point — no separate streaming
  * operator implementations to keep in sync.
  *
  * Scale notes (10^12 events/day shape):
  *  - both aggregations shuffle once on (window/session keys) with map-side
  *    partial aggregation; no per-event driver work;
  *  - the watermark bounds state: windows/sessions older than the horizon
  *    are emitted and dropped, so state is O(active windows), not O(stream);
  *  - `value` sums are kept as double but emitted ROUNDED — float summation
  *    order varies across partitionings, the rounded value is stable.
  */
object EventAggregates {

  /** Tumbling-window counts and value totals per event_type.
    * Window buckets are half-open `[start, start + dur)` — identical to
    * DuckDB `time_bucket`. */
  def windowedCounts(events: DataFrame, dur: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), dur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Same aggregation with a watermark, for `readStream` inputs: append-mode
    * emission once the watermark passes a window's end, state bounded by the
    * horizon. */
  def windowedCountsStream(events: DataFrame, dur: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    windowedCounts(events.withWatermark("ts", watermark), dur)

  /** Per-user session windows with inactivity gap `gap`: consecutive events
    * of one user belong to one session while the inter-event gap is
    * strictly under `gap` (Spark `session_window` semantics; the session
    * end is `last_ts + gap`). */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"), col("total_value"))

  /** Streaming variant: session windows require a watermark in streaming
    * (state for a user's open session is dropped once the watermark passes
    * its close). */
  def sessionizeStream(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    sessionize(events.withWatermark("ts", watermark), gap)
}
