package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Per-keyword conformance, mirroring the reference's per-type unit tests
  * (/root/reference/test/{number,integer,string,array,object}.js) over
  * typed single-value instances. */
class KeywordSpec extends SparkSpec {

  // ---- type (test/integer.js, test/any.js) ----

  test("type: integer accepts integral, rejects fractional double") {
    checkValue("""{"type":"integer"}""", 13.0, DoubleType, true)
    checkValue("""{"type":"integer"}""", 123.123, DoubleType, false, Seq(("", "type")))
    checkValue("""{"type":"integer"}""", 7, IntegerType, true)
  }

  test("type: string vs int column is a static mismatch") {
    checkValue("""{"type":"string"}""", 7, IntegerType, false, Seq(("", "type")))
    checkValue("""{"type":"string"}""", "abc", StringType, true)
  }

  test("type: union integer|null") {
    checkValue("""{"type":["integer","null"]}""", null, IntegerType, true)
    checkValue("""{"type":["integer","null"]}""", 5, IntegerType, true)
    checkValue("""{"type":["string","null"]}""", 5, IntegerType, false, Seq(("", "type")))
  }

  test("type: any and unknown types always pass") {
    checkValue("""{"type":"any"}""", null, StringType, true)
    checkValue("""{"type":"whatever"}""", 5, IntegerType, true)
  }

  test("type ladder: keyword of a non-matching type group never fires (greedy)") {
    // {type:'integer', minLength:2}: a string value gets ONLY the type
    // error — the else-if ladder skips keyword groups (test/greedy.js:65+)
    checkValue("""{"type":"integer","minLength":2}""", "a", StringType,
      false, Seq(("", "type")))
    // an integer value: minLength group predicate (string) is false → pass
    checkValue("""{"type":"integer","minLength":2}""", 5, IntegerType, true)
  }

  // ---- enum (test/enum via jsen.js:83-89) ----

  test("enum: scalar literals") {
    checkValue("""{"enum":[1,2,3]}""", 2, IntegerType, true)
    checkValue("""{"enum":[1,2,3]}""", 4, IntegerType, false, Seq(("", "enum")))
    checkValue("""{"enum":["a","b"]}""", "b", StringType, true)
    checkValue("""{"enum":["a","b"]}""", "c", StringType, false, Seq(("", "enum")))
  }

  test("enum: null literal and null value") {
    checkValue("""{"enum":[null,"x"]}""", null, StringType, true)
    checkValue("""{"enum":["x"]}""", null, StringType, false, Seq(("", "enum")))
  }

  test("enum short-circuits all other keywords") {
    // minimum would fail, but enum passes and stops processing
    // (jsen.js:966-970 'do not process the schema further')
    checkValue("""{"enum":[1],"minimum":5}""", 1, IntegerType, true)
  }

  test("enum: array literal deep equality") {
    checkValue("""{"enum":[[1,2],[3]]}""", Seq(1, 2), ArrayType(IntegerType), true)
    checkValue("""{"enum":[[1,2],[3]]}""", Seq(2, 1), ArrayType(IntegerType), false,
      Seq(("", "enum")))
  }

  test("enum: struct literal deep equality, key order insensitive") {
    val dt = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    checkValue("""{"enum":[{"b":"x","a":1}]}""", Row(1, "x"), dt, true)
    checkValue("""{"enum":[{"b":"x","a":2}]}""", Row(1, "x"), dt, false, Seq(("", "enum")))
  }

  // ---- numeric keywords (test/number.js) ----

  test("minimum / exclusiveMinimum") {
    checkValue("""{"minimum":3}""", 3, IntegerType, true)
    checkValue("""{"minimum":3}""", 2, IntegerType, false, Seq(("", "minimum")))
    checkValue("""{"minimum":3,"exclusiveMinimum":true}""", 3, IntegerType,
      false, Seq(("", "exclusiveMinimum")))
    checkValue("""{"minimum":3,"exclusiveMinimum":true}""", 4, IntegerType, true)
  }

  test("maximum / exclusiveMaximum") {
    checkValue("""{"maximum":3}""", 3, IntegerType, true)
    checkValue("""{"maximum":3}""", 4, IntegerType, false, Seq(("", "maximum")))
    checkValue("""{"maximum":3,"exclusiveMaximum":true}""", 3, IntegerType,
      false, Seq(("", "exclusiveMaximum")))
  }

  test("type: date (non-standard extension, test/date.js)") {
    // jsen.js:79-81: `x instanceof Date` → Timestamp/Date columns
    val ts = java.sql.Timestamp.valueOf("2026-01-02 03:04:05")
    checkValue("""{"type":"date"}""", ts, TimestampType, true)
    checkValue("""{"type":"date"}""", java.sql.Date.valueOf("2026-01-02"), DateType, true)
    checkValue("""{"type":"date"}""", "2026-01-02", StringType, false, Seq(("", "type")))
    checkValue("""{"type":"date"}""", null, TimestampType, false, Seq(("", "type")))
    checkValue("""{"type":["date","null"]}""", null, TimestampType, true)
  }

  test("keyword with malformed operand is ignored (schema never validated)") {
    // README.md:87-99: {minimum:'abc'} compiles to an always-true validator
    checkValue("""{"minimum":"abc"}""", -100, IntegerType, true)
    checkValue("""{"minLength":"abc"}""", "", StringType, true)
    checkValue("""{"exclusiveMinimum":true}""", -5, IntegerType, true)
  }

  test("multipleOf: integers") {
    checkValue("""{"multipleOf":3}""", 9, IntegerType, true)
    checkValue("""{"multipleOf":3}""", 10, IntegerType, false, Seq(("", "multipleOf")))
  }

  test("multipleOf: fractional divisor decimal fix (18.15 % 0.01)") {
    // test/number.js 'fix multipleOf #1' — naive float % would fail this
    checkValue("""{"multipleOf":0.01}""", 18.15, DoubleType, true)
    checkValue("""{"multipleOf":0.01}""", 18.155, DoubleType, false, Seq(("", "multipleOf")))
    checkValue("""{"multipleOf":0.5}""", 2.5, DoubleType, true)
    checkValue("""{"multipleOf":0.5}""", 2.75, DoubleType, false, Seq(("", "multipleOf")))
  }

  test("numeric keywords on NaN mirror JS comparison semantics") {
    // JS: NaN < min and NaN > max are both false → NaN passes min/max
    checkValue("""{"minimum":3}""", Double.NaN, DoubleType, true)
    checkValue("""{"maximum":3}""", Double.NaN, DoubleType, true)
  }

  // ---- string keywords (test/string.js) ----

  test("minLength / maxLength count code points") {
    checkValue("""{"minLength":2,"maxLength":3}""", "ab", StringType, true)
    checkValue("""{"minLength":2,"maxLength":3}""", "a", StringType,
      false, Seq(("", "minLength")))
    checkValue("""{"minLength":2,"maxLength":3}""", "abcd", StringType,
      false, Seq(("", "maxLength")))
    // surrogate pair counts as ONE character (lib/ucs2length.js,
    // test/ucs2length.js:48, changelog v0.6.4)
    checkValue("""{"minLength":2}""", "😀", StringType,
      false, Seq(("", "minLength")))
    checkValue("""{"maxLength":1}""", "😀", StringType, true)
  }

  test("pattern is find-anywhere like RegExp.test") {
    checkValue("""{"pattern":"\\d+"}""", "abc123def", StringType, true)
    checkValue("""{"pattern":"^\\d+$"}""", "abc123", StringType,
      false, Seq(("", "pattern")))
  }

  // ---- formats (test/format.js, lib/formats.js) ----

  test("built-in formats") {
    checkValue("""{"format":"email"}""", "a.b@example.com", StringType, true)
    checkValue("""{"format":"email"}""", "not an email", StringType,
      false, Seq(("", "format")))
    checkValue("""{"format":"ipv4"}""", "192.168.0.1", StringType, true)
    checkValue("""{"format":"ipv4"}""", "256.0.0.1", StringType, false)
    checkValue("""{"format":"ipv6"}""", "2001:db8::1", StringType, true)
    checkValue("""{"format":"hostname"}""", "example-host.local", StringType, true)
    checkValue("""{"format":"hostname"}""", "-bad-", StringType, false)
    checkValue("""{"format":"uri"}""", "https://example.com/x", StringType, true)
    checkValue("""{"format":"date-time"}""", "2026-01-02T03:04:05Z", StringType, true)
    checkValue("""{"format":"date-time"}""", "not a date", StringType, false)
  }

  test("format applies to strings only; non-strings pass (README.md:127-151)") {
    checkValue("""{"format":"email"}""", 42, IntegerType, true)
  }

  // ---- array keywords (test/array.js) ----

  val arrInt: ArrayType = ArrayType(IntegerType)

  test("minItems / maxItems") {
    checkValue("""{"minItems":2}""", Seq(1), arrInt, false, Seq(("", "minItems")))
    checkValue("""{"minItems":2,"maxItems":3}""", Seq(1, 2), arrInt, true)
    checkValue("""{"maxItems":1}""", Seq(1, 2), arrInt, false, Seq(("", "maxItems")))
  }

  test("uniqueItems by deep equality (test/array.js:190-206)") {
    checkValue("""{"uniqueItems":true}""", Seq(1, 2, 3), arrInt, true)
    checkValue("""{"uniqueItems":true}""", Seq(1, 2, 1), arrInt,
      false, Seq(("", "uniqueItems")))
    val nested = ArrayType(ArrayType(IntegerType))
    checkValue("""{"uniqueItems":true}""", Seq(Seq(1, 2), Seq(1, 2)), nested,
      false, Seq(("", "uniqueItems")))
  }

  test("items object form: per-element descent with indexed paths") {
    checkValue("""{"items":{"minimum":0,"maximum":9}}""", Seq(0, 5, 9), arrInt, true)
    checkValue("""{"items":{"minimum":0}}""", Seq(3, -1, 4, -2), arrInt,
      false, Seq(("1", "minimum"), ("3", "minimum")))
  }

  test("items tuple form + additionalItems (test/array.js:101-188)") {
    val spec = """{"items":[{"type":"integer"},{"minimum":5}],"additionalItems":false}"""
    checkValue(spec, Seq(1, 7), arrInt, true)
    checkValue(spec, Seq(1, 7, 9), arrInt, false, Seq(("", "additionalItems")))
    checkValue(spec, Seq(1, 2), arrInt, false, Seq(("1", "minimum")))
    // shorter arrays skip absent positions (guard arr.length-1 >= i)
    checkValue(spec, Seq(1), arrInt, true)
    // additionalItems as schema applies to the tail only
    val spec2 = """{"items":[{"minimum":100}],"additionalItems":{"maximum":3}}"""
    checkValue(spec2, Seq(100, 1, 2), arrInt, true)
    checkValue(spec2, Seq(100, 1, 9), arrInt, false, Seq(("2", "maximum")))
  }

  test("null array elements are present nulls, not missing") {
    val arrNullable = ArrayType(IntegerType, containsNull = true)
    checkValue("""{"items":{"type":"integer"}}""", Seq(1, null, 3), arrNullable,
      false, Seq(("1", "type")))
    checkValue("""{"items":{"type":["integer","null"]}}""", Seq(1, null), arrNullable, true)
  }
}
