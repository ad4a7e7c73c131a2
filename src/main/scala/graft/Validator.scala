package graft

import graft.compile.{ConstraintCompiler, ValidatorOptions}
import graft.json.{JValue, Json}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** One error record, typed (mirrors ConstraintCompiler.errorSchema). */
final case class ErrorRecord(
    path: String, keyword: String,
    message: Option[String], additionalProperties: Option[String])

/** Typed validation result: the untouched input row (token-array byte
  * identity by construction), the valid flag, and the error records. */
final case class Validated[T](row: T, valid: Boolean, errors: Seq[ErrorRecord])

/** Public API of the row-constraint engine — the table-level analog of
  * `jsen(schema)` → `validate(data)` (/root/reference/lib/jsen.js:1045-1089).
  *
  * {{{
  * val v = Validator("""{"properties":{"n_tok":{"minimum":1}}}""")
  * df.withColumn("valid", v.valid(df.schema))          // boolean per row
  * v.withValidation(df)                                 // valid + errors
  * v.violations(df, Seq("doc_id"))                      // one row per error
  * }}}
  *
  * Everything is a narrow, codegen-friendly projection: no shuffle, no UDFs.
  */
final class Validator(val spec: JValue, val options: ValidatorOptions) extends Serializable {

  /** Pure boolean validity for a row of the given schema (fast path —
    * analog of `validate(data)`'s return value with no error collection). */
  def valid(schema: StructType): Column =
    ConstraintCompiler.compile(spec, schema, options).valid

  /** Error-record array per row (analog of `validate.errors`). Respects
    * `options.greedy`: non-greedy yields only the first error group. */
  def errors(schema: StructType): Column =
    ConstraintCompiler.compile(spec, schema, options).errors

  /** Validate a single value column of known type (nested use). */
  def forValue(value: Column, dt: org.apache.spark.sql.types.DataType): (Column, Column) = {
    val c = ConstraintCompiler.compileForValue(spec, value, dt, options)
    (c.valid, c.errors)
  }

  /** Input DF + `valid` boolean + `errors` array columns. */
  def withValidation(df: DataFrame): DataFrame = {
    val compiled = ConstraintCompiler.compile(spec, df.schema, options)
    df.withColumn("valid", compiled.valid).withColumn("errors", compiled.errors)
  }

  /** Typed path (`Dataset[T]` in, `Dataset[Validated[T]]` out): the same
    * compiled Catalyst expressions — no row-by-row closure, the Encoder
    * only shapes the result. The input row travels as an untouched struct,
    * so per-row invariants (token-array byte identity) hold by
    * construction. */
  def validateTyped[T](ds: Dataset[T])(implicit ev: Encoder[Validated[T]]): Dataset[Validated[T]] = {
    val compiled = ConstraintCompiler.compile(spec, ds.schema, options)
    ds.select(
      struct(ds.columns.map(col).toSeq: _*).as("row"),
      compiled.valid.as("valid"),
      compiled.errors.as("errors")).as[Validated[T]]
  }

  /** One output row per violation: id columns + (path, keyword, message,
    * additional_properties). Valid rows produce no output. */
  def violations(df: DataFrame, idCols: Seq[String]): DataFrame = {
    val compiled = ConstraintCompiler.compile(spec, df.schema, options)
    df.select((idCols.map(col) :+ explode(compiled.errors).as("error")): _*)
      .select(idCols.map(col) ++ Seq(
        col("error.path").as("path"),
        col("error.keyword").as("keyword"),
        col("error.message").as("message"),
        col("error.additionalProperties").as("additional_properties")): _*)
  }
}

object Validator {
  def apply(specJson: String, options: ValidatorOptions = ValidatorOptions()): Validator =
    new Validator(Json.parse(specJson), options)
  def apply(spec: JValue): Validator = new Validator(spec, ValidatorOptions())
  def apply(spec: JValue, options: ValidatorOptions): Validator = new Validator(spec, options)
}
