package graft.streaming

import graft.Validator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous validation over Structured Streaming sources: the same
  * compiled constraint Columns applied to a stream (`readStream` →
  * validate → `writeStream`), with watermarked windowed verdicts.
  *
  * The row-level validator is a stateless narrow projection, so it adds
  * no state store; only the verdict aggregation keeps (window × part)
  * state, bounded by the watermark. At production scale the violations
  * stream appends straight to the violations table while verdicts upsert
  * per (window, part) — the streaming twin of the batch pipeline's
  * outputs (FIXTURES.md §5).
  */
object StreamingValidation {

  /** Stream + `valid`/`errors` columns (stateless). */
  def withValidation(stream: DataFrame, validator: Validator): DataFrame =
    validator.withValidation(stream)

  /** One violation row per error, with the event time carried through. */
  def violations(stream: DataFrame, validator: Validator,
                 idCol: String, tsCol: String): DataFrame =
    withValidation(stream, validator)
      .where(!col("valid"))
      .select(col(idCol), col(tsCol), explode(col("errors")).as("error"))
      .select(
        col(idCol), col(tsCol),
        col("error.path").as("path"),
        col("error.keyword").as("keyword"),
        col("error.message").as("message"),
        col("error.additionalProperties").as("additional_properties"))

  /** Watermarked per-window verdicts: (window, part, passed,
    * violation_count, rows). */
  def windowedVerdicts(stream: DataFrame, validator: Validator,
                       tsCol: String, partCol: String,
                       windowDuration: String = "1 minute",
                       watermarkDelay: String = "2 minutes"): DataFrame =
    withValidation(stream, validator)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(partCol))
      .agg(
        bool_and(col("valid")).as("passed"),
        sum(when(col("valid"), 0L).otherwise(size(col("errors")).cast("long")))
          .as("violation_count"),
        count(lit(1)).as("rows_validated"))
}
