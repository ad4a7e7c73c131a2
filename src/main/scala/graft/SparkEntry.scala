package graft

import graft.checks._
import graft.compile.ValidatorOptions
import graft.entry.{CheckQueries, OpsQueries, Q, ValidationQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def registry: Seq[Q] = {
    val all = ValidationQueries.all ++ CheckQueries.all ++ OpsQueries.all
    val dupes = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dupes.isEmpty,
      s"duplicate gate-query registrations (toMap would silently shadow): " +
        dupes.mkString(", "))
    all
  }

  /** Flagship query on /root/testdata/sf0.001: the full check suite over
    * the documents table — row constraints + uniqueness + referential +
    * drift — emitting per-partition verdicts (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("part", pmod(col("doc_id"), lit(4)).cast("int"))
    val sourceDim = docs.select(col("source")).distinct()
      .where(col("source") =!= "src0")
    val checks: Seq[Check] = Seq(
      RowConstraintCheck(Validator(
        """{"required":["doc_id","text"],
            "properties":{"n_chars":{"type":"integer","minimum":50,"maximum":500},
                          "lang":{"enum":["en","de","fr","es","zh"]}}}""",
        ValidatorOptions(greedy = true))),
      UniquenessCheck("doc_id"),
      ReferentialCheck("source", sourceDim, "source", activeCol = None),
      StatsCheck(Seq(
        ColumnStatsSpec("n_chars", maxNullRate = Some(0.5), quantiles = Seq(0.5)),
        ColumnStatsSpec("doc_id", maxNullRate = Some(0.0)))),
      SketchDriftCheck("n_chars",
        SketchDriftCheck.buildProfile(docs.where(col("doc_id") % 2 === 0), "n_chars"),
        threshold = 0.2),
      FreqDriftCheck("lang",
        FreqDriftCheck.buildProfile(docs.where(col("doc_id") % 2 === 0), "lang"),
        threshold = 100.0))
    checks.map(_.run(docs).verdicts).reduce(_ unionAll _)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose hash-family internals
    * are not SQL-expressible (LSH/SimHash) → rows-only check. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin)).toMap
}
