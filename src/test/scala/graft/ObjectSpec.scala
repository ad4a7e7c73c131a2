package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Object-keyword conformance (/root/reference/test/object.js, error
  * contract from test/error.js), over closed StructType and open MapType
  * instances. */
class ObjectSpec extends SparkSpec {

  val ab: StructType = StructType(Seq(
    StructField("a", IntegerType), StructField("b", StringType)))
  val mapSS: MapType = MapType(StringType, StringType)

  test("required: missing ≡ NULL for struct columns") {
    checkValue("""{"required":["a"]}""", Row(1, null), ab, true)
    checkValue("""{"required":["a"]}""", Row(null, "x"), ab,
      false, Seq(("a", "required")))
    checkValue("""{"required":["a","b"]}""", Row(null, null), ab,
      false, Seq(("a", "required"), ("b", "required")))
  }

  test("required: statically absent column always fails") {
    checkValue("""{"required":["zzz"]}""", Row(1, "x"), ab,
      false, Seq(("zzz", "required")))
  }

  test("properties: presence-guarded descent; required error in else branch") {
    val spec = """{"properties":{"a":{"minimum":5}},"required":["a"]}"""
    checkValue(spec, Row(7, null), ab, true)
    checkValue(spec, Row(3, null), ab, false, Seq(("a", "minimum")))
    checkValue(spec, Row(null, null), ab, false, Seq(("a", "required")))
  }

  test("properties: absent property without required is skipped") {
    val spec = """{"properties":{"a":{"minimum":5}}}"""
    checkValue(spec, Row(null, "x"), ab, true)
  }

  test("min/maxProperties count present keys") {
    checkValue("""{"minProperties":2}""", Row(1, "x"), ab, true)
    checkValue("""{"minProperties":2}""", Row(1, null), ab,
      false, Seq(("", "minProperties")))
    checkValue("""{"maxProperties":1}""", Row(1, "x"), ab,
      false, Seq(("", "maxProperties")))
  }

  test("additionalProperties=false on struct reports undeclared present fields") {
    val spec = """{"properties":{"a":{}},"additionalProperties":false}"""
    checkValue(spec, Row(1, null), ab, true)
    // b present and not declared → error carries the key in
    // additionalProperties (test/error.js 'adds additionalProperties')
    val v = Validator(spec, compile.ValidatorOptions(greedy = true))
    val df = valueDf(Row(1, "x"), ab)
    val (validCol, errsCol) = v.forValue(df.col("x"), ab)
    val r = df.select(validCol, errsCol).head()
    assert(!r.getBoolean(0))
    val errs = r.getSeq[Row](1)
    assert(errs.length == 1)
    assert(errs.head.getString(1) == "additionalProperties")
    assert(errs.head.getString(0) == "") // path is the object's path
    assert(errs.head.getString(3) == "b") // offending key
  }

  test("additionalProperties as schema validates undeclared fields") {
    val spec = """{"properties":{"a":{}},"additionalProperties":{"maxLength":1}}"""
    checkValue(spec, Row(1, "x"), ab, true)
    checkValue(spec, Row(1, "xy"), ab, false, Seq(("b", "maxLength")))
  }

  test("patternProperties on struct: compile-time key matching") {
    val spec = """{"patternProperties":{"^a":{"minimum":10}}}"""
    checkValue(spec, Row(20, "x"), ab, true)
    checkValue(spec, Row(5, "x"), ab, false, Seq(("a", "minimum")))
  }

  test("patternProperties marks keys as found for additionalProperties") {
    val spec =
      """{"patternProperties":{"^b":{"maxLength":5}},"additionalProperties":false}"""
    // a unmatched by pattern and undeclared → additionalProperties error
    checkValue(spec, Row(1, "ok"), ab, false)
    checkValue(spec, Row(null, "ok"), ab, true)
  }

  test("dependencies: property form") {
    val spec = """{"dependencies":{"a":["b"]}}"""
    checkValue(spec, Row(1, "x"), ab, true)
    checkValue(spec, Row(null, null), ab, true) // a absent → no dependency
    // dependency name appended to path (test/error.js:325-360)
    checkValue(spec, Row(1, null), ab, false, Seq(("b", "dependencies")))
  }

  test("dependencies: schema form descends on the same instance") {
    val spec = """{"dependencies":{"a":{"required":["b"]}}}"""
    checkValue(spec, Row(1, null), ab, false, Seq(("b", "required")))
    checkValue(spec, Row(1, "x"), ab, true)
  }

  test("nested struct paths are dot-delimited") {
    val nested = StructType(Seq(
      StructField("outer", StructType(Seq(StructField("inner", IntegerType))))))
    val spec = """{"properties":{"outer":{"properties":{"inner":{"minimum":5}}}}}"""
    checkValue(spec, Row(Row(3)), nested, false, Seq(("outer.inner", "minimum")))
    checkValue(spec, Row(Row(7)), nested, true)
  }

  test("array-of-struct paths use numeric indices (a.0.b shape)") {
    val dt = StructType(Seq(StructField("a",
      ArrayType(StructType(Seq(StructField("b", IntegerType)))))))
    val spec = """{"properties":{"a":{"items":{"properties":{"b":{"maximum":1}}}}}}"""
    checkValue(spec, Row(Seq(Row(0), Row(5))), dt,
      false, Seq(("a.1.b", "maximum")))
  }

  // ---- MapType: open objects preserve undefined ≠ null exactly ----

  test("map: required via key presence, null value is present") {
    checkValue("""{"required":["k"]}""", Map("k" -> null), mapSS, true)
    checkValue("""{"required":["k"]}""", Map("other" -> "v"), mapSS,
      false, Seq(("k", "required")))
  }

  test("map: properties descend; null value fails type but absent key skips") {
    val spec = """{"properties":{"k":{"type":"string"}}}"""
    checkValue(spec, Map("k" -> "v"), mapSS, true)
    checkValue(spec, Map[String, String](), mapSS, true) // absent → skipped
    checkValue(spec, Map("k" -> null), mapSS, false, Seq(("k", "type")))
  }

  test("map: patternProperties + additionalProperties runtime key loop") {
    val spec =
      """{"properties":{"id":{}},
          "patternProperties":{"^x_":{"maxLength":2}},
          "additionalProperties":false}"""
    checkValue(spec, Map("id" -> "1", "x_a" -> "ok"), mapSS, true)
    checkValue(spec, Map("x_a" -> "toolong"), mapSS,
      false, Seq(("x_a", "maxLength")))
    checkValue(spec, Map("rogue" -> "v"), mapSS,
      false, Seq(("", "additionalProperties")))
  }

  test("map: min/maxProperties count keys") {
    checkValue("""{"minProperties":1}""", Map[String, String](), mapSS,
      false, Seq(("", "minProperties")))
    checkValue("""{"maxProperties":1}""", Map("a" -> "1", "b" -> "2"), mapSS,
      false, Seq(("", "maxProperties")))
  }
}
