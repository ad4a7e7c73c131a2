package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — the standard shape for
  * turning raw interaction logs into training-ready episodes (and the one
  * genuinely stateful per-entity operator a curation pipeline needs).
  *
  * Two formulations with identical session semantics (a session breaks
  * when the gap to the entity's previous event EXCEEDS `gapSeconds`):
  *
  *  - [[sessionize]]: per-event labels via lag + running sum over a
  *    window partitioned by the entity. One shuffle on the entity key;
  *    the sort is per-entity (bounded by an entity's event count), never
  *    global. Skew note: a bot-grade entity with 10^8 events serializes
  *    into one task's sort — pass a [[HotKeys.SkewGuard]] to detect and
  *    raise or drop-and-route such keys (the window-sort mirror of the
  *    LSH hot-bucket guard).
  *  - [[sessionStats]]: per-session aggregates via Spark's native
  *    `session_window` — plans as partial hash-aggregation of per-event
  *    candidate sessions, exchange on the entity, then a per-partition
  *    sort + MergingSessions pass (the sort is shuffle-local, and
  *    map-side session merging can be enabled via
  *    `spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition`
  *    to shrink the exchange further). Unlike [[sessionize]] it emits
  *    one row per SESSION, not per event, and is streaming-capable:
  *    [[streamingSessionStats]] is the same call with a watermark.
  *    SessionsSpec pins the two formulations to each other.
  *
  * Timestamps are compared as exact integer microseconds (`unix_micros`),
  * so session boundaries are deterministic and SQL-oracle-restateable —
  * no double rounding at the gap comparison.
  */
object Sessions {

  /** Exact integer microseconds of a timestamp column. Parquet event
    * tables often carry TIMESTAMP_NTZ, which `unix_micros` rejects; the
    * cast interprets NTZ wall-time in the session timezone (this library
    * pins UTC in every entrypoint), keeping boundaries deterministic. */
  private def micros(ts: Column): Column = unix_micros(ts.cast("timestamp"))

  /** Per-event session labels: `session_seq` (0-based per entity, in time
    * order) appended to the input columns. Ties on the timestamp are
    * broken by `idCol` so the labeling is total and reproducible.
    * `guard` caps per-entity event counts ahead of the window sort (the
    * bot-entity skew hazard — see [[HotKeys]]); default Off. */
  def sessionize(df0: DataFrame, entityCol: String, tsCol: String, idCol: String,
                 gapSeconds: Long,
                 guard: HotKeys.SkewGuard = HotKeys.SkewGuard.Off): DataFrame = {
    val df = HotKeys.applyGuard(df0, Seq(entityCol), guard, "sessionize")
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(idCol))
    val us = micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val brk = when(prev.isNull || us - prev > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("_brk", brk)
      .withColumn("session_seq",
        (sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
          .cast("long"))
      .drop("_brk")
  }

  /** Per-session aggregates via the native session aggregation:
    * (entity, session_start_us, session_end_us, n_events, sum_value).
    * `session_end_us` is the LAST EVENT's timestamp + gap (Spark's
    * session_window end semantics). `valueCol` is summed as
    * DECIMAL(sumPrecision, sumScale) so the result is order-independent
    * and exact, then returned as double — NOTE each event's value is
    * rounded to `sumScale` fractional digits BEFORE summing (default
    * (18,2) suits currency-like values; raise `sumScale` for
    * finer-grained inputs). */
  def sessionStats(df: DataFrame, entityCol: String, tsCol: String,
                   valueCol: String, gapSeconds: Long,
                   sumPrecision: Int = 18, sumScale: Int = 2): DataFrame = {
    require(sumPrecision >= 1 && sumPrecision <= 38 &&
      sumScale >= 0 && sumScale < sumPrecision,
      s"invalid decimal($sumPrecision,$sumScale) for the session sum")
    df.groupBy(col(entityCol),
        session_window(col(tsCol), s"$gapSeconds seconds").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(s"decimal($sumPrecision,$sumScale)")).as("_sv"))
      .select(col(entityCol),
        micros(col("w.start")).as("session_start_us"),
        micros(col("w.end")).as("session_end_us"),
        col("n_events"),
        col("_sv").cast("double").as("sum_value"))
  }

  /** Streaming twin of [[sessionStats]]: identical aggregation with a
    * watermark bounding session state (sessions older than the watermark
    * are finalized and emitted; use append output mode). */
  def streamingSessionStats(stream: DataFrame, entityCol: String, tsCol: String,
                            valueCol: String, gapSeconds: Long,
                            watermark: String): DataFrame =
    sessionStats(stream.withWatermark(tsCol, watermark),
      entityCol, tsCol, valueCol, gapSeconds)
}
