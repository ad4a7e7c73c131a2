package graft.sources

import graft.Validator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-validated ingest: read raw JSONL / CSV documents and attach the
  * jsen-style `valid` + `errors` columns in the same pass — the closest
  * Spark analog of the reference's own use case (parse a JSON document,
  * call `validate(data)` on it).
  *
  * Malformed records are NEVER silently dropped (the default DSv2
  * behavior would null them away): PERMISSIVE mode captures the raw line
  * in a corrupt-record column, and such rows surface as
  * `valid = false` with a single root-path `type` violation — the same
  * verdict jsen gives a document that is not the instance shape the
  * schema expects. The raw line is carried in
  * `errors[0].additionalProperties` for quarantine/debugging.
  *
  * Scale shape: both readers are a single narrow scan — parsing,
  * validation, and corrupt handling all live in one projection over the
  * file scan (no shuffle, no second pass); Spark's own text/CSV splitting
  * drives parallelism.
  */
object ValidatedSource {

  private val CorruptCol = "_graft_corrupt"

  /** One violation row array for an unparseable record. */
  private def corruptErrors(raw: org.apache.spark.sql.Column) =
    array(struct(
      lit("").as("path"),
      lit("type").as("keyword"),
      lit("is required to be parseable").as("message"),
      raw.as("additionalProperties")))
      .cast(graft.compile.ConstraintCompiler.errorsType.sql)

  /** Compile against the DECLARED row schema (the corrupt column must not
    * leak into the spec's view of the instance), then resolve the
    * compiled columns by name over the parsed frame. A record Spark
    * flags as corrupt (unparseable line, type-mismatched field) gets the
    * root `type` verdict — jsen would equally reject the mistyped value,
    * it just never sees unparseable text (its caller parses). */
  private def withCorruptHandling(parsed: DataFrame, rowSchema: StructType,
                                  validator: Validator): DataFrame = {
    val compiled = graft.compile.ConstraintCompiler.compile(
      validator.spec, rowSchema, validator.options)
    val corrupt = col(CorruptCol).isNotNull
    parsed
      .withColumn("valid", when(corrupt, lit(false)).otherwise(compiled.valid))
      .withColumn("errors",
        when(corrupt, corruptErrors(col(CorruptCol))).otherwise(compiled.errors))
      .drop(CorruptCol)
  }

  /** JSON-lines source: one document per line, validated against the
    * constraint spec. Returns the declared columns + `valid` + `errors`. */
  def jsonl(spark: SparkSession, path: String, rowSchema: StructType,
            validator: Validator): DataFrame = {
    val schema = StructType(rowSchema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    val parsed = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
    withCorruptHandling(parsed, rowSchema, validator)
  }

  /** CSV source (header-less; columns positional per `rowSchema`). */
  def csv(spark: SparkSession, path: String, rowSchema: StructType,
          validator: Validator, header: Boolean = false,
          delimiter: String = ","): DataFrame = {
    val schema = StructType(rowSchema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    val parsed = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)
    withCorruptHandling(parsed, rowSchema, validator)
  }

  /** ORC source: rows arrive already typed (columnar formats have no
    * per-record corrupt channel — file-level corruption fails the read,
    * Spark's contract for binary formats), so validated ingest is the
    * constraint pass alone, still one narrow scan-fused projection.
    * Returns the file's columns + `valid` + `errors`. */
  def orc(spark: SparkSession, path: String, validator: Validator): DataFrame =
    validator.withValidation(spark.read.orc(path))

  /** Parquet source — same contract as [[orc]]. */
  def parquet(spark: SparkSession, path: String,
              validator: Validator): DataFrame =
    validator.withValidation(spark.read.parquet(path))
}
