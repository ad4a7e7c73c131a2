package graft.checks

import graft.json._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-driven constraint suggestion — the inverse of the reference's
  * `build()` (defaults builder, jsen.js:1080-1120): instead of
  * schema → instance, profile an instance CORPUS and emit the draft-4
  * spec its columns currently satisfy. The suggested spec compiles
  * through [[graft.Validator]] and passes on the profiled data by
  * construction (pinned in ChecksSpec), giving pipelines a one-call
  * bootstrap for regression validation: profile today's good batch,
  * validate tomorrow's against it.
  *
  * Scale shape: ONE aggregate job over the corpus for all columns
  * (min/max/null counts/distinct counts with partial combine), plus one
  * bounded second aggregate that gathers literal values ONLY for columns
  * the first pass proved low-cardinality (state ≤ `enumMaxDistinct`
  * entries per column by definition). The profile output is O(columns).
  * At extreme scale pass `exactDistinct = false` to use HLL++ distinct
  * counts (enum candidacy then errs conservative via the cap margin);
  * the gate uses exact counts so the oracle matches exactly. */
object SuggestConstraints {

  final case class Config(
      enumMaxDistinct: Int = 8,
      requiredMaxNullFrac: Double = 0.0,
      exactDistinct: Boolean = true)

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }

  /** One row per profiled column:
    * (column, dtype, n_rows, n_nulls, null_frac, n_distinct,
    *  min_num, max_num, min_len, max_len, enum_values).
    * Numeric bounds are doubles (NULL for non-numeric columns); length
    * bounds cover string columns; `enum_values` lists the SORTED distinct
    * values (rendered as strings) for columns whose exact distinct count
    * is ≤ `enumMaxDistinct`, else NULL. */
  def profile(df: DataFrame, cols: Seq[String],
              cfg: Config = Config()): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession
    val schema = df.schema
    val aggs = cols.flatMap { c =>
      val dt = schema(c).dataType
      val base = Seq(
        count(lit(1)).as(s"${c}__rows"),
        count(col(c)).as(s"${c}__nonnull"),
        (if (cfg.exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__distinct"))
      val num = if (isNumeric(dt)) Seq(
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max")) else Nil
      val len = if (dt == StringType) Seq(
        min(length(col(c))).cast("long").as(s"${c}__minlen"),
        max(length(col(c))).cast("long").as(s"${c}__maxlen")) else Nil
      base ++ num ++ len
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)

    def get[T](name: String): Option[T] = {
      val i = stats.schema.fieldNames.indexOf(name)
      if (i < 0 || stats.isNullAt(i)) None else Some(stats.get(i).asInstanceOf[T])
    }

    // second bounded pass: literal values for proven-low-cardinality cols
    val enumCols = cols.filter { c =>
      get[Long](s"${c}__distinct").exists(d => d > 0 && d <= cfg.enumMaxDistinct)
    }
    val enums: Map[String, Seq[String]] =
      if (enumCols.isEmpty) Map.empty
      else {
        val eaggs = enumCols.map(c =>
          sort_array(collect_set(col(c).cast("string"))).as(c))
        val row = df.agg(eaggs.head, eaggs.tail: _*).collect()(0)
        enumCols.map(c => c -> row.getSeq[String](row.fieldIndex(c))).toMap
      }

    val out = cols.map { c =>
      val dt = schema(c).dataType
      val rows = get[Long](s"${c}__rows").getOrElse(0L)
      val nonnull = get[Long](s"${c}__nonnull").getOrElse(0L)
      val nulls = rows - nonnull
      val nullFrac =
        if (rows == 0) 0.0
        else math.round(nulls.toDouble / rows * 1e6) / 1e6
      Row(c, dt.simpleString, rows, nulls, nullFrac,
        get[Long](s"${c}__distinct").getOrElse(0L),
        get[Double](s"${c}__min").orNull,
        get[Double](s"${c}__max").orNull,
        get[Long](s"${c}__minlen").orNull,
        get[Long](s"${c}__maxlen").orNull,
        enums.get(c).orNull)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(out).asJava),
      StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("dtype", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_nulls", LongType, nullable = false),
        StructField("null_frac", DoubleType, nullable = false),
        StructField("n_distinct", LongType, nullable = false),
        StructField("min_num", DoubleType, nullable = true),
        StructField("max_num", DoubleType, nullable = true),
        StructField("min_len", LongType, nullable = true),
        StructField("max_len", LongType, nullable = true),
        StructField("enum_values", ArrayType(StringType), nullable = true))))
  }

  /** Assemble the draft-4 spec the profiled data satisfies: numeric
    * columns get type + observed [minimum, maximum]; string columns get
    * type + observed length bounds, or an `enum` when the column proved
    * low-cardinality; columns whose null fraction is ≤
    * `requiredMaxNullFrac` become `required`. The result is a compact
    * regression harness, not a semantic model — bounds are what the data
    * showed, nothing more. */
  def suggestSpec(df: DataFrame, cols: Seq[String],
                  cfg: Config = Config()): String = {
    val schema = df.schema
    val prof = profile(df, cols, cfg).collect()
      .map(r => r.getString(0) -> r).toMap
    val props = cols.flatMap { c =>
      val r = prof(c)
      val dt = schema(c).dataType
      val fields = scala.collection.mutable.ArrayBuffer.empty[(String, JValue)]
      if (isNumeric(dt)) {
        fields += ("type" -> JStr(if (isIntegral(dt)) "integer" else "number"))
        if (!r.isNullAt(6)) fields += ("minimum" -> JNum(BigDecimal(r.getDouble(6))))
        if (!r.isNullAt(7)) fields += ("maximum" -> JNum(BigDecimal(r.getDouble(7))))
      } else if (dt == StringType) {
        fields += ("type" -> JStr("string"))
        if (!r.isNullAt(10)) {
          fields += ("enum" -> JArr(r.getSeq[String](10).map(JStr(_)).toVector))
        } else {
          if (!r.isNullAt(8)) fields += ("minLength" -> JNum(BigDecimal(r.getLong(8))))
          if (!r.isNullAt(9)) fields += ("maxLength" -> JNum(BigDecimal(r.getLong(9))))
        }
      }
      if (fields.isEmpty) None
      else Some(c -> JObj(fields.toVector))
    }
    val required = cols.filter { c =>
      prof(c).getDouble(4) <= cfg.requiredMaxNullFrac
    }
    val top = Vector.newBuilder[(String, JValue)]
    if (required.nonEmpty)
      top += ("required" -> JArr(required.map(JStr(_)).toVector))
    top += ("properties" -> JObj(props.map {
      case (k, v) => k -> (v: JValue)
    }.toVector))
    Json.render(JObj(top.result()))
  }
}
