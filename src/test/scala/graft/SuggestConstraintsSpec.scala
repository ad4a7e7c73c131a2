package graft

import graft.checks.SuggestConstraints
import graft.compile.ValidatorOptions
import org.apache.spark.sql.functions._

class SuggestConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alpha", "en", 10, Some(1.5)),
    (2L, "beta-longer", "en", 20, Some(2.5)),
    (3L, "gamma", "de", 30, None),
    (4L, "d", "de", 40, Some(0.5)),
    (5L, "epsilon!", "fr", 50, Some(9.5))
  ).toDF("id", "text", "lang", "n", "score")

  test("profile: exact counts, bounds, null fractions, enum detection") {
    val p = SuggestConstraints.profile(df,
      Seq("id", "text", "lang", "n", "score"),
      SuggestConstraints.Config(enumMaxDistinct = 3))
      .collect().map(r => r.getString(0) -> r).toMap
    val lang = p("lang")
    assert(lang.getLong(5) == 3L)
    assert(lang.getSeq[String](10) == Seq("de", "en", "fr"))
    val text = p("text")
    assert(text.isNullAt(10), "5 distinct texts > cap must not enum")
    assert(text.getLong(8) == 1L && text.getLong(9) == 11L)
    val score = p("score")
    assert(score.getLong(3) == 1L && score.getDouble(4) == 0.2)
    assert(score.getDouble(6) == 0.5 && score.getDouble(7) == 9.5)
    val n = p("n")
    assert(n.getDouble(6) == 10.0 && n.getDouble(7) == 50.0)
    assert(n.getDouble(4) == 0.0)
  }

  test("suggested spec compiles and the profiled data passes it") {
    val spec = SuggestConstraints.suggestSpec(df,
      Seq("id", "text", "lang", "n", "score"),
      SuggestConstraints.Config(enumMaxDistinct = 3))
    assert(spec.contains("\"required\""))
    assert(spec.contains("\"enum\""))
    val v = Validator(spec, ValidatorOptions(greedy = true))
    val out = v.withValidation(df)
    assert(out.where(!col("valid")).count() == 0,
      s"profiled data must satisfy its own suggested spec: $spec")
    // required excludes the nullable score column at the 0.0 threshold
    assert(!spec.substring(spec.indexOf("required"))
      .takeWhile(_ != ']').contains("score"))
  }

  test("a violating batch is caught by yesterday's suggested spec") {
    val spec = SuggestConstraints.suggestSpec(df,
      Seq("lang", "n"), SuggestConstraints.Config(enumMaxDistinct = 3))
    val bad = Seq(("zz", 999), ("en", 25)).toDF("lang", "n")
    val v = Validator(spec, ValidatorOptions(greedy = true)).withValidation(bad)
    val valids = v.orderBy("n").select("valid").as[Boolean].collect().toSeq
    assert(valids == Seq(true, false))
  }
}
