package graft

import graft.json._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Table-driven sweep of a draft-4 golden corpus, the engine twin of the
  * reference's official-suite runner
  * (/root/reference/test/x-draft4-test-suite.js:120-135): each fixture
  * group is `{description, schema, tests: [{description, data, valid
  * [, violations]}]}` (FIXTURES.md §4), with `data` re-expressed as a
  * one-row DataFrame whose Spark type is inferred from the JSON value.
  * Inference/conversion machinery shared with [[Draft4OfficialSpec]] via
  * [[Draft4Harness]] (representation limits documented there).
  */
class Draft4CorpusSpec extends SparkSpec with Draft4Harness {

  private val categories = Seq(
    "type", "enum", "numeric", "string", "array",
    "object", "combinators", "ref", "format", "modes")

  private def loadCorpus(name: String): Vector[JObj] = loadFixture("draft4", name)

  categories.foreach { cat =>
    test(s"draft-4 corpus: $cat") {
      val groups = loadCorpus(cat)
      assert(groups.nonEmpty)
      var ran = 0
      groups.foreach { g =>
        val desc = g.str("description").getOrElse("?")
        val schema = g.obj("schema").getOrElse(fail(s"$cat/$desc: no schema"))
        val tests = g.arr("tests").getOrElse(fail(s"$cat/$desc: no tests"))
        tests.collect { case t: JObj => t }.foreach { t =>
          val tdesc = t.str("description").getOrElse("?")
          val data = t.get("data").getOrElse(JNull)
          val expectValid = t.bool("valid").getOrElse(fail(s"$cat/$desc/$tdesc: no valid"))
          // per-test mode override: `"greedy": false` exercises the
          // first-error-group contract (jsen.js:900-902)
          val greedy = t.bool("greedy").getOrElse(true)
          val dt = inferType(data)
          val df = valueDf(toValue(data, dt), dt)
          val v = Validator(Json.render(schema),
            compile.ValidatorOptions(greedy = greedy))
          val (validCol, errsCol) = v.forValue(df.col("x"), dt)
          val row = df.select(validCol.as("valid"), errsCol.as("errors")).head()
          val valid = row.getBoolean(0)
          val errs = row.getSeq[Row](1).map(r => (r.getString(0), r.getString(1)))
          assert(valid == expectValid,
            s"[$cat] $desc / $tdesc: got valid=$valid want $expectValid (errors=$errs)")
          assert(valid == errs.isEmpty,
            s"[$cat] $desc / $tdesc: valid flag and errors disagree")
          t.arr("violations").foreach { exp =>
            val expected = exp.collect { case o: JObj =>
              (o.str("path").getOrElse(""), o.str("keyword").getOrElse(""))
            }
            assert(errs.sorted == expected.sorted,
              s"[$cat] $desc / $tdesc: errors ${errs.sorted} want ${expected.sorted}")
          }
          ran += 1
        }
      }
      info(s"$cat: $ran cases")
    }
  }
}
