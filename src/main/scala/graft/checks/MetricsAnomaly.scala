package graft.checks

import graft.ops.Outliers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Run-over-run anomaly detection on CHECK METRICS — the meta-monitoring
  * layer: the drift/stats checks watch the data, this watches the checks.
  * Feed it the accumulated per-run verdict metrics (the `metric_value`
  * rows every [[Check]] emits, unioned across runs with a run column —
  * exactly what a scheduled validation pipeline appends each day) and it
  * flags the current run's metrics that sit outside the history's robust
  * band: |value − median| > k · 1.4826 · MAD (the Iglewicz–Hoaglin rule
  * [[Outliers]] uses row-wise, applied per metric key).
  *
  * Median/MAD — not mean/stddev — because metric histories contain the
  * very anomalies being hunted; a past incident inflates a stddev band
  * until it hides the next incident, while the robust band shrugs it off.
  *
  * Scale shape: the metrics frame is runs × checks × partitions — tiny by
  * construction — so the two grouped exact-median aggregates and the
  * joins are trivially broadcastable; this check adds no meaningful load
  * to a pipeline run at any corpus size.
  */
object MetricsAnomaly {

  /** Score `current` against `history`, both shaped (keyCols…, valueCol).
    * Returns `current` + `hist_median`, `hist_mad`, `robust_z`,
    * `anomalous`:
    *  - mad > 0: robust z as usual, anomalous iff |z| > k;
    *  - mad = 0 (perfectly stable history): z is NULL, anomalous iff the
    *    value moved at all;
    *  - no history for the key: both stats NULL, anomalous = true (an
    *    unknown metric key is itself the anomaly — a check appeared that
    *    the history never saw). */
  def flag(history: DataFrame, current: DataFrame, keyCols: Seq[String],
           valueCol: String, k: Double = 3.5): DataFrame = {
    require(keyCols.nonEmpty, "flag needs at least one metric key column")
    val keys = keyCols.map(col)
    val med = history.groupBy(keys: _*)
      .agg(median(col(valueCol)).as("hist_median"))
    val mad = history.join(med, keyCols)
      .groupBy(keys: _*)
      .agg(median(abs(col(valueCol) - col("hist_median"))).as("hist_mad"))
    val v = col(valueCol)
    current
      .join(broadcast(med), keyCols, "left")
      .join(broadcast(mad), keyCols, "left")
      .withColumn("robust_z",
        Outliers.scoreWith(v, col("hist_median"), col("hist_mad")))
      .withColumn("anomalous",
        when(col("hist_median").isNull, lit(true))
          .when(col("hist_mad") > 0, abs(col("robust_z")) > k)
          .otherwise(v =!= col("hist_median")))
  }

  /** Convenience split for a single frame carrying a run column: history
    * = every run except `currentRun`, current = that run. */
  def flagRun(metrics: DataFrame, runCol: String, currentRun: Any,
              keyCols: Seq[String], valueCol: String,
              k: Double = 3.5): DataFrame =
    flag(metrics.where(col(runCol) =!= lit(currentRun)),
      metrics.where(col(runCol) === lit(currentRun)),
      keyCols, valueCol, k)
}
