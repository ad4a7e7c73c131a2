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
  *
  * Two documented representation limits (SURVEY.md §7.4.1):
  *  - closed StructType objects conflate a missing property with a NULL
  *    one, so suite cases that distinguish `{}` from `{"a": null}` are
  *    encoded with the ENGINE's contract (and marked with a `note`);
  *  - Spark arrays are homogeneous, so heterogeneous-array cases
  *    (`[1, "foo"]`) are out of scope here (the per-keyword specs cover
  *    the per-type dispatch they exercise).
  */
class Draft4CorpusSpec extends SparkSpec {

  private val categories = Seq(
    "type", "enum", "numeric", "string", "array",
    "object", "combinators", "ref", "format", "modes")

  /** Spark type inference for a JSON instance (nulls are typed by their
    * surroundings; a bare null gets StringType, which every type predicate
    * treats correctly since NULL fails all non-null type tests). */
  private def inferType(v: JValue): DataType = v match {
    case JNull    => StringType
    case JBool(_) => BooleanType
    case JNum(n)  => if (n.isWhole) LongType else DoubleType
    case JStr(_)  => StringType
    case JArr(items) =>
      val ts = items.filterNot(_ == JNull).map(inferType)
      val et = ts.distinct match {
        case Seq()  => StringType
        case Seq(t) => t
        case many if many.toSet == Set(LongType, DoubleType) => DoubleType
        case many if many.forall(_.isInstanceOf[StructType]) =>
          many.map(_.asInstanceOf[StructType]).reduce(mergeStructs)
        case other =>
          throw new IllegalArgumentException(s"heterogeneous array: $other")
      }
      ArrayType(et, containsNull = items.contains(JNull))
    case o: JObj =>
      StructType(o.fields.map { case (k, fv) =>
        StructField(k, inferType(fv), nullable = true)
      })
  }

  private def mergeStructs(a: StructType, b: StructType): StructType = {
    val bOnly = b.fields.filterNot(f => a.fieldNames.contains(f.name))
    StructType(a.fields.map { f =>
      b.fields.find(_.name == f.name) match {
        case Some(bf) if bf.dataType != f.dataType =>
          throw new IllegalArgumentException(s"field ${f.name} type conflict")
        case _ => f
      }
    } ++ bOnly)
  }

  private def toValue(v: JValue, dt: DataType): Any = (v, dt) match {
    case (JNull, _)                    => null
    case (JBool(b), _)                 => b
    case (JNum(n), LongType)           => n.toLong
    case (JNum(n), DoubleType)         => n.toDouble
    case (JStr(s), _)                  => s
    case (JArr(items), ArrayType(et, _)) => items.map(toValue(_, et))
    case (o: JObj, st: StructType) =>
      Row(st.fields.toSeq.map(f => o.get(f.name).map(toValue(_, f.dataType)).orNull): _*)
    case other => throw new IllegalArgumentException(s"unrepresentable: $other")
  }

  private def loadFixture(name: String): Vector[JObj] = {
    val url = getClass.getResource(s"/draft4/$name.json")
    assert(url != null, s"missing fixture resource draft4/$name.json")
    Json.parse(scala.io.Source.fromURL(url, "UTF-8").mkString) match {
      case JArr(groups) => groups.collect { case o: JObj => o }
      case _ => fail(s"fixture $name must be a JSON array of groups")
    }
  }

  categories.foreach { cat =>
    test(s"draft-4 corpus: $cat") {
      val groups = loadFixture(cat)
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
