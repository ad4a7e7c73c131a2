package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Combinator + $ref + greedy/message conformance
  * (/root/reference/test/multi.js, test/greedy.js, test/error.js,
  * test/reference.js, test/missing.js). */
class CombinatorSpec extends SparkSpec {

  test("allOf: all sub-schemas must pass, sub-errors surface directly") {
    checkValue("""{"allOf":[{"minimum":3},{"maximum":5}]}""", 4, IntegerType, true)
    checkValue("""{"allOf":[{"minimum":3},{"maximum":5}]}""", 6, IntegerType,
      false, Seq(("", "maximum")))
    // allOf never assigns its own error (README.md:388)
    checkValue("""{"allOf":[{"minimum":3},{"multipleOf":2}]}""", 1, IntegerType,
      false, Seq(("", "minimum"), ("", "multipleOf")))
  }

  test("anyOf: success rolls back branch errors") {
    checkValue("""{"anyOf":[{"minimum":5},{"maximum":2}]}""", 1, IntegerType, true)
    checkValue("""{"anyOf":[{"minimum":5},{"maximum":2}]}""", 7, IntegerType, true)
  }

  test("anyOf: failure keeps all branch errors plus anyOf (README.md:259-276)") {
    checkValue("""{"anyOf":[{"minimum":5},{"maximum":2}]}""", 3, IntegerType,
      false, Seq(("", "minimum"), ("", "maximum"), ("", "anyOf")))
  }

  test("oneOf: exactly one branch must match (test/multi.js 'matches both')") {
    val spec = """{"oneOf":[{"maximum":5},{"minimum":3}]}"""
    checkValue(spec, 1, IntegerType, true)  // only maximum
    checkValue(spec, 7, IntegerType, true)  // only minimum
    checkValue(spec, 4, IntegerType, false, Seq(("", "oneOf"))) // both match
  }

  test("oneOf: zero matches keeps failing branch errors plus oneOf") {
    val spec = """{"oneOf":[{"multipleOf":2},{"multipleOf":3}]}"""
    checkValue(spec, 5, IntegerType,
      false, Seq(("", "multipleOf"), ("", "multipleOf"), ("", "oneOf")))
  }

  test("not: sub-errors always roll back; only {keyword:'not'} surfaces") {
    checkValue("""{"not":{"minimum":5}}""", 3, IntegerType, true)
    checkValue("""{"not":{"maximum":5}}""", 3, IntegerType, false, Seq(("", "not")))
  }

  // ---- greedy vs non-greedy (test/greedy.js) ----

  val abc: StructType = StructType(Seq(
    StructField("a", IntegerType), StructField("b", IntegerType),
    StructField("c", IntegerType)))

  test("non-greedy stops at the first error site") {
    val spec =
      """{"properties":{"a":{"minimum":5},"b":{"minimum":5},"c":{"minimum":5}}}"""
    checkValue(spec, Row(1, 1, 1), abc, false,
      Seq(("a", "minimum")), greedy = false)
    checkValue(spec, Row(9, 1, 1), abc, false,
      Seq(("b", "minimum")), greedy = false)
  }

  test("greedy collects every error") {
    val spec =
      """{"properties":{"a":{"minimum":5},"b":{"minimum":5},"c":{"minimum":5}}}"""
    checkValue(spec, Row(1, 1, 9), abc, false,
      Seq(("a", "minimum"), ("b", "minimum")), greedy = true)
  }

  test("non-greedy anyOf failure still reports all branch errors") {
    // combinators run greedily internally even in non-greedy mode; the
    // early return happens after the combinator's own error
    // (jsen.js:433-456 + 900-902; test/error.js multi-error counts)
    checkValue("""{"anyOf":[{"minimum":5},{"maximum":2}]}""", 3, IntegerType,
      false, Seq(("", "minimum"), ("", "maximum"), ("", "anyOf")), greedy = false)
  }

  test("non-greedy: first failing array element only") {
    val spec = """{"items":{"minimum":0}}"""
    checkValue(spec, Seq(1, -1, -2), ArrayType(IntegerType),
      false, Seq(("1", "minimum")), greedy = false)
  }

  // ---- $ref resolution (test/reference.js) ----

  test("$ref: internal pointer to definitions") {
    val spec =
      """{"definitions":{"positive":{"minimum":1}},
          "properties":{"a":{"$ref":"#/definitions/positive"}}}"""
    val ab = StructType(Seq(StructField("a", IntegerType)))
    checkValue(spec, Row(5), ab, true)
    checkValue(spec, Row(0), ab, false, Seq(("a", "minimum")))
  }

  test("$ref: id-scoped resolution") {
    val spec =
      """{"id":"http://x/root","definitions":{"p":{"id":"http://x/p","minimum":1}},
          "properties":{"a":{"$ref":"http://x/p"}}}"""
    val ab = StructType(Seq(StructField("a", IntegerType)))
    checkValue(spec, Row(0), ab, false, Seq(("a", "minimum")))
  }

  test("$ref: external schema registry (README.md:205-215)") {
    val opts = compile.ValidatorOptions(
      schemas = Some(graft.json.Json.parse(
        """{"ext":{"maximum":3}}""").asInstanceOf[graft.json.JObj]))
    checkValue("""{"$ref":"ext"}""", 9, IntegerType, false,
      Seq(("", "maximum")), options = opts)
  }

  test("$ref: recursive ref bottoms out against the finite row schema") {
    // {items: {$ref:'#'}} over array<array<int>>: the recursion consumes
    // structure each step and terminates at the leaf type
    val spec = """{"minItems":1,"items":{"$ref":"#"}}"""
    val dt = ArrayType(ArrayType(IntegerType))
    checkValue(spec, Seq(Seq(1), Seq(2)), dt, true)
    checkValue(spec, Seq(Seq[Int]()), dt, false, Seq(("0", "minItems")))
  }

  test("$ref: unbounded same-type recursion is rejected at compile time") {
    val ex = intercept[IllegalArgumentException] {
      Validator("""{"allOf":[{"$ref":"#"}]}""").valid(
        StructType(Seq(StructField("a", IntegerType))))
    }
    assert(ex.getMessage.contains("recursive"))
  }

  test("$ref: circular reference chain throws (resolver.js:225-253)") {
    val ex = intercept[IllegalArgumentException] {
      Validator("""{"definitions":{"a":{"$ref":"#/definitions/b"},
                    "b":{"$ref":"#/definitions/a"}},
                    "properties":{"x":{"$ref":"#/definitions/a"}}}""")
        .valid(StructType(Seq(StructField("x", IntegerType))))
    }
    assert(ex.getMessage.contains("circular"))
  }

  test("$ref: draft-4 metaschema URI resolves without registration (resolver.js:162-164)") {
    // a schema-shaped struct validated against the self-describing
    // metaschema: `type` must be one of the seven simpleTypes (or an
    // array of them) and `minimum` must be a number
    val dt = StructType(Seq(
      StructField("type", StringType),
      StructField("minimum", DoubleType)))
    val spec = """{"$ref":"http://json-schema.org/draft-04/schema#"}"""
    checkValue(spec, Row("integer", 3.0), dt, true)
    checkValue(spec, Row("bogus", null), dt, false)
    // URI without the empty fragment resolves too
    checkValue("""{"$ref":"http://json-schema.org/draft-04/schema"}""",
      Row("string", null), dt, true)
    // the metaschema's id/$schema properties carry format:"uri" like the
    // reference's lib/metaschema.json — a non-URI id must fail
    val dtId = StructType(Seq(StructField("id", StringType)))
    checkValue(spec, Row("http://example.com/s#"), dtId, true)
    checkValue(spec, Row("not a uri"), dtId, false,
      Seq(("id", "format")))
  }

  test("$ref: JSON-Pointer into the metaschema") {
    val spec = """{"$ref":"http://json-schema.org/draft-04/schema#/definitions/positiveInteger"}"""
    checkValue(spec, 3, IntegerType, true)
    checkValue(spec, -1, IntegerType, false, Seq(("", "minimum")))
  }

  test("$ref: a user schema declaring the metaschema id wins over the built-in") {
    val spec = """{"id":"http://json-schema.org/draft-04/schema#",
                   "properties":{"a":{"$ref":"http://json-schema.org/draft-04/schema#"}}}"""
    // the self-id makes the ref point at THIS schema, whose `properties.a`
    // only applies to objects — an int field passes
    checkValue(spec, Row(5),
      StructType(Seq(StructField("a", IntegerType))), true)
  }

  test("missing$Ref option substitutes always-pass (test/missing.js)") {
    val opts = compile.ValidatorOptions(missingRef = true)
    checkValue("""{"properties":{"a":{"$ref":"nowhere"}}}""",
      Row(5), StructType(Seq(StructField("a", IntegerType))), true, options = opts)
    intercept[IllegalArgumentException] {
      Validator("""{"properties":{"a":{"$ref":"nowhere"}}}""")
        .valid(StructType(Seq(StructField("a", IntegerType))))
    }
  }

  test("JSON pointer ~0/~1 unescaping (RFC 6901, test/reference.js:26-46)") {
    val spec =
      """{"definitions":{"a/b":{"minimum":9},"m~n":{"maximum":1}},
          "properties":{"x":{"$ref":"#/definitions/a~1b"},
                        "y":{"$ref":"#/definitions/m~0n"}}}"""
    val dt = StructType(Seq(StructField("x", IntegerType), StructField("y", IntegerType)))
    checkValue(spec, Row(10, 1), dt, true)
    checkValue(spec, Row(1, 5), dt, false,
      Seq(("x", "minimum"), ("y", "maximum")))
  }

  // ---- custom messages (test/error.js:433+) ----

  test("custom messages: invalidMessage, messages[keyword], requiredMessage") {
    val spec =
      """{"properties":{
           "a":{"minimum":5,"messages":{"minimum":"too small"}},
           "b":{"type":"integer","requiredMessage":"b is mandatory"}},
         "required":["b"]}"""
    val dt = StructType(Seq(StructField("a", IntegerType), StructField("b", IntegerType)))
    val v = Validator(spec, compile.ValidatorOptions(greedy = true))
    val df = valueDf(Row(1, null), dt)
    val (_, errsCol) = v.forValue(df.col("x"), dt)
    val errs = df.select(errsCol).head().getSeq[Row](0)
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(errs.contains(("a", "minimum", "too small")))
    assert(errs.contains(("b", "required", "b is mandatory")))
  }

  // ---- custom formats (test/format.js:210-265) ----

  test("custom format: regex string, runs for all types, runs last") {
    val opts = compile.ValidatorOptions(
      formats = Map("five-digits" -> Left("^\\d{5}$")))
    checkValue("""{"format":"five-digits"}""", "12345", StringType, true,
      options = opts)
    checkValue("""{"format":"five-digits"}""", "123", StringType, false,
      Seq(("", "format")), options = opts)
    // non-string value is stringified like JS coercion
    checkValue("""{"format":"five-digits"}""", 12345, IntegerType, true,
      options = opts)
  }

  test("custom format: Column predicate function") {
    import org.apache.spark.sql.functions._
    val opts = compile.ValidatorOptions(
      formats = Map("even-length" -> Right((c: org.apache.spark.sql.Column) =>
        length(c) % 2 === 0)))
    checkValue("""{"format":"even-length"}""", "abcd", StringType, true, options = opts)
    checkValue("""{"format":"even-length"}""", "abc", StringType, false,
      Seq(("", "format")), options = opts)
  }

  test("custom format overrides built-in with the same name") {
    val opts = compile.ValidatorOptions(formats = Map("email" -> Left("^x")))
    checkValue("""{"format":"email"}""", "xyz", StringType, true, options = opts)
    checkValue("""{"format":"email"}""", "a@b.co", StringType, false,
      Seq(("", "format")), options = opts)
  }
}
