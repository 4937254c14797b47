package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The batch and streaming paths are the SAME DataFrame function; these
  * specs pin (a) batch==stream parity for windowed counts under a
  * watermark (append mode only emits closed windows), and (b) the exact
  * session_window semantics the DuckDB oracle replicates (strict-gap
  * extension, end = last_ts + gap). */
class EventAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:$sec%02d")

  test("windowed counts: streaming (watermark, append) == batch on closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (1L, ts(0, 10), "click", 1.5),
      (2L, ts(1, 0), "view", 2.0),
      (3L, ts(4, 59), "click", 0.5),
      (4L, ts(5, 1), "click", 3.0),
      (5L, ts(7, 30), "error", 1.0),
      (6L, ts(11, 0), "view", 4.0)
    )
    val cols = Seq("event_id", "ts", "event_type", "value")
    val batch = EventAggregates.windowedCounts(events.toDF(cols: _*), "5 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val out = EventAggregates.windowedCountsStream(
      stream.toDF().toDF(cols: _*), "5 minutes", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ev_wc")
      .outputMode("append").start()
    stream.addData(events.take(3))
    q.processAllAvailable()
    stream.addData(events.drop(3))
    q.processAllAvailable()
    // sentinel far past the horizon: watermark passes every real window's end
    stream.addData((99L, ts(59, 59), "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ev_wc")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // every closed real window must be emitted exactly as batch computed it
    assert(streamed.filterNot(_._2 == "sentinel") == batch,
      s"streamed=$streamed batch=$batch")
  }

  test("session_window semantics: inclusive-gap extension, end = last + gap") {
    // user 1: two events 29:59 apart -> ONE session; end = second + 30m
    // user 2: exactly 30:00 apart -> STILL one session (inclusive boundary;
    //         pinned here because the DuckDB oracle must split on > gap,
    //         not >= gap)
    // user 3: 30:01 apart -> TWO sessions
    val df = Seq(
      (1L, ts(0), 1.0), (1L, Timestamp.valueOf("2024-01-01 00:29:59"), 2.0),
      (2L, ts(0), 1.0), (2L, ts(30), 2.0),
      (3L, ts(0), 1.0), (3L, Timestamp.valueOf("2024-01-01 00:30:01"), 2.0))
      .toDF("user_id", "ts", "value")
    val got = EventAggregates.sessionize(df, "30 minutes")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2.getTime))
    assert(got.toSeq == Seq(
      (1L, ts(0), Timestamp.valueOf("2024-01-01 00:59:59"), 2L),
      (2L, ts(0), Timestamp.valueOf("2024-01-01 01:00:00"), 2L),
      (3L, ts(0), Timestamp.valueOf("2024-01-01 00:30:00"), 1L),
      (3L, Timestamp.valueOf("2024-01-01 00:30:01"),
        Timestamp.valueOf("2024-01-01 01:00:01"), 1L)
    ), got.mkString(", "))
  }
}
