package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier detection over a numeric column — the
  * standard distribution-free screen for corrupted numeric fields in a
  * training corpus (mean/stddev z-scores break down exactly when outliers
  * are present, because the outliers inflate both).
  *
  * Scale shape: the two location statistics are EXACT medians computed by
  * full aggregations whose 1-row results are broadcast back via lazy
  * cross-joins (the Chi2DriftCheck pattern — no driver-side `.head()`
  * splitting the job, no collected literals baked into the plan). Cost is
  * three passes over the column: median, MAD, score. For streams or when
  * three passes are too dear, feed quantiles from the mergeable KLL sketch
  * ([[graft.sketch.KllSketch]]) into [[scoreWith]] instead — same scoring
  * plan, sketch-approximate cutoffs, single pass.
  */
object Outliers {

  /** Consistency constant: MAD × 1.4826 estimates σ under normality, so
    * `robust_z` reads on the familiar z scale (Iglewicz–Hoaglin). */
  val MadSigma = 1.4826

  /** df + (`_med`, `_mad`) columns: exact median and median absolute
    * deviation of `value`, attached in-plan. */
  private def withMedMad(df: DataFrame, value: Column): DataFrame = {
    val med = df.agg(median(value).as("_med"))
    val withMed = df.crossJoin(broadcast(med))
    val mad = withMed.agg(median(abs(value - col("_med"))).as("_mad"))
    withMed.crossJoin(broadcast(mad))
  }

  /** Pure scoring step over precomputed location stats: robust z =
    * (x − med) / (MadSigma · mad); NULL when mad = 0 (a constant column
    * has no robust scale — callers decide, rather than everything
    * becoming ±∞) or when x is NULL. */
  def scoreWith(value: Column, med: Column, mad: Column): Column =
    when(mad > 0, (value - med) / (mad * MadSigma))

  /** All rows scored: df + `robust_z`. */
  def robustZ(df: DataFrame, value: Column): DataFrame =
    withMedMad(df, value)
      .withColumn("robust_z", scoreWith(value, col("_med"), col("_mad")))
      .drop("_med", "_mad")

  /** Rows whose |robust z| exceeds `k` (3.5 is the published
    * Iglewicz–Hoaglin cutoff): df + `robust_z`, flagged rows only. */
  def madOutliers(df: DataFrame, value: Column, k: Double = 3.5): DataFrame =
    robustZ(df, value).where(abs(col("robust_z")) > k)
}
