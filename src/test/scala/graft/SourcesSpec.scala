package graft

import graft.compile.ValidatorOptions
import graft.sources.ValidatedSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Validated ingest: raw JSONL/CSV documents → parse + jsen-style
  * validation in one narrow pass; malformed records surface as root-type
  * violations carrying the raw line, never silently dropped. */
class SourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  private val validator = Validator(
    """{"required":["doc_id"],
        "properties":{"lang":{"enum":["en","de","fr"]},
                      "n_chars":{"maximum":500}}}""",
    ValidatorOptions(greedy = true))

  test("jsonl source: parse + validate in one pass, corrupt lines quarantined") {
    val dir = Files.createTempDirectory("graft-src-jsonl").toString
    Files.write(Paths.get(dir, "docs.jsonl"), Seq(
      """{"doc_id": 1, "lang": "en", "n_chars": 200}""",
      """{"doc_id": 2, "lang": "xx", "n_chars": 600}""",
      """{"doc_id": 3, "lang": "de"}""",
      """{"doc_id": 4, "lang": "fr", "n_chars": {garbage""").asJava)

    val out = ValidatedSource.jsonl(spark, dir, schema, validator).collect()
    assert(out.length == 4)
    def row(p: org.apache.spark.sql.Row => Boolean) = out.find(p).get
    val ok = row(r => r.getAs[Any]("doc_id") == 1L)
    assert(ok.getAs[Boolean]("valid"))
    val bad = row(r => r.getAs[Any]("doc_id") == 2L)
    assert(!bad.getAs[Boolean]("valid"))
    assert(bad.getSeq[org.apache.spark.sql.Row](bad.fieldIndex("errors"))
      .map(_.getString(1)).sorted == Seq("enum", "maximum"))
    // missing n_chars: sub-schema skipped (missing ≡ undefined)
    assert(row(r => r.getAs[Any]("doc_id") == 3L).getAs[Boolean]("valid"))
    // the unparseable line: root 'type' violation carrying the raw text
    val corrupt = row(r => r.getAs[Any]("doc_id") == null)
    assert(!corrupt.getAs[Boolean]("valid"))
    val err = corrupt.getSeq[org.apache.spark.sql.Row](corrupt.fieldIndex("errors"))
    assert(err.length == 1 && err.head.getString(0) == "" &&
      err.head.getString(1) == "type")
    assert(err.head.getString(3).contains("{garbage"))
  }

  test("csv source: positional schema, malformed rows quarantined") {
    val dir = Files.createTempDirectory("graft-src-csv").toString
    Files.write(Paths.get(dir, "docs.csv"), Seq(
      "1,en,200",
      "2,xx,600",
      "notanumber,fr,3").asJava)
    val out = ValidatedSource.csv(spark, dir, schema, validator).collect()
    assert(out.length == 3)
    assert(out.count(_.getAs[Boolean]("valid")) == 1)
    val corrupt = out.find(r => r.getAs[Any]("doc_id") == null).get
    val err = corrupt.getSeq[org.apache.spark.sql.Row](corrupt.fieldIndex("errors"))
    assert(err.head.getString(1) == "type" &&
      err.head.getString(3).contains("notanumber"))
  }

  test("source plan is a single narrow scan (no shuffle, no second pass)") {
    val dir = Files.createTempDirectory("graft-src-plan").toString
    Files.write(Paths.get(dir, "d.jsonl"),
      Seq("""{"doc_id": 1, "lang": "en", "n_chars": 1}""").asJava)
    val plan = ValidatedSource.jsonl(spark, dir, schema, validator)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"ingest+validate must not shuffle:\n$plan")
  }
}
