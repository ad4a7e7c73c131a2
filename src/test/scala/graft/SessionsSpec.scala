package graft

import graft.ops.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Top-level so Spark can build an Encoder without an outer scope. */
case class SessEvent(user_id: Long, ts: Timestamp, value: Double)

/** Gap-based sessionization: label semantics, native-session_window
  * parity (including the exact-boundary case), streaming twin. */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, us: Long, value: Double = 1.0) =
    (id, user, us, value)

  private def toDf(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("event_id", "user_id", "us", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"), col("value"))

  test("sessionize: hand-computed labels; a gap EXACTLY equal to the threshold merges") {
    val gap = 10L // seconds
    val rows = Seq(
      ev(1, 7, 0L),
      ev(2, 7, 10_000_000L),      // exactly gap after #1 -> same session
      ev(3, 7, 20_000_001L),      // gap + 1 us after #2 -> break
      ev(4, 7, 21_000_000L),      // same session as #3
      ev(5, 9, 5_000_000L))       // other user: own sequence
    val got = Sessions.sessionize(toDf(rows), "user_id", "ts", "event_id", gap)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L), got.toString)
  }

  test("sessionize ties on timestamp are broken by id (total, reproducible)") {
    val rows = Seq(ev(2, 1, 100L), ev(1, 1, 100L), ev(3, 1, 100L))
    val got = Sessions.sessionize(toDf(rows), "user_id", "ts", "event_id", 10)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // all within gap: one session regardless of tie order
    assert(got.values.toSet == Set(0L), got.toString)
  }

  test("sessionStats (native session_window) equals the lag-formulation aggregate") {
    // pseudo-random but deterministic event times incl. exact-boundary gaps
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      val user = (i % 13).toLong
      val us = (i / 13).toLong * 3_000_000L +
        (if (rnd.nextBoolean()) 0L else rnd.nextInt(20_000_000).toLong)
      ev(i.toLong, user, us, (rnd.nextInt(1000) + 1) / 100.0)
    } ++ Seq(ev(1000, 50, 0), ev(1001, 50, 8_000_000L)) // exact-gap pair
    val df = toDf(rows)
    val gap = 8L

    val native = Sessions.sessionStats(df, "user_id", "ts", "value", gap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet

    val labeled = Sessions.sessionize(df, "user_id", "ts", "event_id", gap)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(unix_micros(col("ts"))).as("s"),
        (max(unix_micros(col("ts"))) + gap * 1000000L).as("e"),
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .select("user_id", "s", "e", "n", "sv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet

    assert(native == labeled,
      s"native-only=${native -- labeled}\nlabeled-only=${labeled -- native}")
  }

  test("sessionStats sum scale is configurable; defaults round to 2 digits") {
    // one 2-event session with 4 fractional digits per value
    val rows = Seq(ev(0, 1, 0, 0.1234), ev(1, 1, 1_000_000L, 0.1111))
    def sumOf(scale: Int) =
      Sessions.sessionStats(toDf(rows), "user_id", "ts", "value", 60,
        sumScale = scale).head().getDouble(4)
    assert(sumOf(2) == 0.23) // per-event HALF_UP rounding before the sum
    assert(sumOf(4) == 0.2345)
    intercept[IllegalArgumentException](
      Sessions.sessionStats(toDf(rows), "user_id", "ts", "value", 60,
        sumPrecision = 4, sumScale = 7).head())
  }

  test("streamingSessionStats: finalized sessions match the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[SessEvent]
    val q = Sessions.streamingSessionStats(source.toDF(), "user_id", "ts",
      "value", gapSeconds = 60, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      val batch1 = Seq(
        SessEvent(1, Timestamp.valueOf("2026-01-01 00:00:00"), 1.5),
        SessEvent(1, Timestamp.valueOf("2026-01-01 00:00:30"), 2.0), // same session
        SessEvent(2, Timestamp.valueOf("2026-01-01 00:00:10"), 4.0))
      source.addData(batch1: _*)
      q.processAllAvailable()
      // advance the watermark far past the sessions so they finalize
      source.addData(SessEvent(9, Timestamp.valueOf("2026-01-01 02:00:00"), 0.0))
      q.processAllAvailable()

      val streamed = spark.table("sess_stream")
        .where(col("user_id") =!= 9)
        .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      val batch = Sessions.sessionStats(batch1.toDF(), "user_id", "ts", "value", 60)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("topTerms: deterministic k-cut with tie-break") {
    val df = Seq("b b b a a c", "a c d", "e").toDF("text")
    val got = graft.ops.TextAnalysis.topTerms(df, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 3L), ("b", 3L), ("c", 2L)), got.toString)
  }
}
