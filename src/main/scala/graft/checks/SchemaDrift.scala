package graft.checks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-drift check — the table-level twin of the value-distribution
  * drift family ([[DriftChecks]]): compare a batch's ACTUAL schema
  * against the pipeline's reference contract and report, per column,
  * whether it is missing, added, retyped, or nullability-loosened.
  * Production failure mode: an upstream writer silently changes a
  * column's type (int32 → int64, decimal scale) or starts emitting a
  * new column — the value-level checks can stay green while every
  * downstream consumer breaks at read time.
  *
  * Pure driver-side metadata work (two StructTypes — zero jobs, zero
  * scans); the verdict frame is built with `createDataFrame` so it
  * composes with [[graft.pipeline.ValidationPipeline]] reporting like
  * any other check's verdicts. Nested struct fields are compared by
  * their canonical DDL type string (a nested change reads as a retype
  * of the top-level column — the consumer-visible granularity).
  *
  * Statuses: `ok`, `missing` (in reference, absent in batch), `added`
  * (in batch, absent in reference), `type_changed`, and
  * `nullability_loosened` (reference required a non-null column, the
  * batch declares it nullable — the only nullability direction that
  * breaks a consumer). Column-name match is case-sensitive, Spark's
  * resolution default.
  */
object SchemaDrift {

  final case class ColumnDrift(
      column: String,
      status: String,
      batch_type: Option[String],
      reference_type: Option[String])

  private def typeOf(f: StructField): String = f.dataType.sql.toLowerCase

  /** Per-column drift rows, every column of either schema present
    * exactly once, ordered by column name (deterministic output). */
  def diff(batch: StructType, reference: StructType): Seq[ColumnDrift] = {
    val b = batch.fields.map(f => f.name -> f).toMap
    val r = reference.fields.map(f => f.name -> f).toMap
    (b.keySet ++ r.keySet).toSeq.sorted.map { name =>
      (b.get(name), r.get(name)) match {
        case (Some(bf), None) =>
          ColumnDrift(name, "added", Some(typeOf(bf)), None)
        case (None, Some(rf)) =>
          ColumnDrift(name, "missing", None, Some(typeOf(rf)))
        case (Some(bf), Some(rf)) if typeOf(bf) != typeOf(rf) =>
          ColumnDrift(name, "type_changed", Some(typeOf(bf)), Some(typeOf(rf)))
        case (Some(bf), Some(rf)) if bf.nullable && !rf.nullable =>
          ColumnDrift(name, "nullability_loosened",
            Some(typeOf(bf)), Some(typeOf(rf)))
        case (Some(bf), Some(rf)) =>
          ColumnDrift(name, "ok", Some(typeOf(bf)), Some(typeOf(rf)))
        case (None, None) => throw new IllegalStateException("unreachable")
      }
    }
  }

  /** Drift rows as a DataFrame (column, status, batch_type,
    * reference_type) — the gate/reporting surface. */
  def diffDf(spark: SparkSession, batch: StructType,
             reference: StructType): DataFrame = {
    import spark.implicits._
    diff(batch, reference).toDF("column", "status", "batch_type", "reference_type")
  }

  /** Convenience: a batch frame against a reference contract; pass
    * `failOnDrift = true` to throw on any non-ok row (the pipeline
    * fail-fast mode). */
  def check(df: DataFrame, reference: StructType,
            failOnDrift: Boolean = false): DataFrame = {
    val out = diffDf(df.sparkSession, df.schema, reference)
    if (failOnDrift) {
      val bad = diff(df.schema, reference).filter(_.status != "ok")
      if (bad.nonEmpty)
        throw new IllegalStateException(
          s"schema drift: ${bad.map(d => s"${d.column}=${d.status}").mkString(", ")}")
    }
    out
  }
}
