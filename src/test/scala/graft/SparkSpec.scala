package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, sbt Test/fork). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** One-row DF with a single column `x` of the given type. */
  def valueDf(value: Any, dt: DataType): DataFrame = {
    val schema = StructType(Seq(StructField("x", dt, nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(value)), schema)
  }

  /** jsen-style conformance check on a single value instance: the value is
    * the whole instance (like `validate(data)`), expected errors as
    * (path, keyword) pairs compared after canonical sort. */
  def checkValue(specJson: String, value: Any, dt: DataType, expectValid: Boolean,
                 expectErrors: Seq[(String, String)] = null,
                 greedy: Boolean = true,
                 options: compile.ValidatorOptions = null): Unit = {
    val opts0 = Option(options).getOrElse(compile.ValidatorOptions())
    val opts = opts0.copy(greedy = greedy)
    val v = Validator(specJson, opts)
    val df = valueDf(value, dt)
    val (validCol, errsCol) = v.forValue(df.col("x"), dt)
    val row = df.select(validCol.as("valid"), errsCol.as("errors")).head()
    val valid = row.getBoolean(0)
    val errs = row.getSeq[Row](1).map(r => (r.getString(0), r.getString(1)))
    assert(valid == expectValid,
      s"valid: got $valid want $expectValid (errors=$errs) for spec=$specJson value=$value")
    assert(valid == errs.isEmpty, s"valid flag and errors disagree: $valid vs $errs")
    if (expectErrors != null) {
      assert(errs.sorted == expectErrors.sorted,
        s"errors: got ${errs.sorted} want ${expectErrors.sorted} for spec=$specJson value=$value")
    }
  }

  def rowOf(values: Any*): Row = Row(values: _*)
}
