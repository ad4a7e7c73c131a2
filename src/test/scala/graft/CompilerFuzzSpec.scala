package graft

import graft.compile.ValidatorOptions
import graft.json._
import org.apache.spark.sql.Row

/** Differential fuzzing of the two independent validator implementations:
  * the v1 Catalyst Column tree and the v2 fused JVM kernel
  * ([[graft.compile.KernelCompiler]]). The draft-4 suite pins published
  * cases; this spec generates RANDOM (schema, instance) pairs from a
  * grammar covering every keyword — including type-mismatched operands,
  * nested combinators, and tuple/object shapes the suite's fixed cases
  * can't exhaust — and asserts the engine's cross-implementation
  * invariants on each, in both greedy and first-error modes:
  *
  *  1. v1 and v2 produce byte-identical error arrays per mode;
  *  2. `valid` ≡ `errors.isEmpty` in greedy mode (the Compiled contract);
  *  3. greedy and first-error agree on the verdict;
  *  4. an invalid verdict carries at least one error in every mode.
  *
  * Seeded (reproducible); a failure prints the offending schema/data as
  * JSON so it can be folded into the suite as a pinned regression case.
  */
class CompilerFuzzSpec extends SparkSpec with Draft4Harness {

  private val fieldPool = Vector("a", "b", "c")

  private def jnum(d: Double): JNum = JNum(BigDecimal(d))
  private def jint(i: Long): JNum = JNum(BigDecimal(i))

  private final class Gen(seed: Long) {
    val rnd = new scala.util.Random(seed)
    def oneOf[T](xs: T*): T = xs(rnd.nextInt(xs.length))

    def scalar(): JValue = rnd.nextInt(6) match {
      case 0 => JNull
      case 1 => JBool(rnd.nextBoolean())
      case 2 => jint(rnd.nextInt(21) - 10)
      case 3 => jnum((rnd.nextInt(41) - 20) * 0.5)
      case 4 => JStr(oneOf("", "a", "ab", "abc", "b7", "aaab", "x y", "0"))
      case 5 => jint(rnd.nextInt(4))
    }

    /** Homogeneous scalar array (heterogeneous is unrepresentable). */
    def array(): JArr = {
      val n = rnd.nextInt(5)
      rnd.nextInt(3) match {
        case 0 => JArr(Vector.fill(n)(jint(rnd.nextInt(5) - 2)))
        case 1 => JArr(Vector.fill(n)(JStr(oneOf("a", "b", "ab", ""))))
        case 2 => JArr(Vector.fill(n)(jnum(rnd.nextInt(9) * 0.5)))
      }
    }

    def obj(depth: Int): JObj = JObj(
      fieldPool.filter(_ => rnd.nextBoolean()).map { f =>
        f -> (if (depth > 0 && rnd.nextInt(4) == 0) data(depth - 1)
              else scalar())
      })

    def data(depth: Int): JValue = rnd.nextInt(8) match {
      case 0 | 1 => scalar()
      case 2 | 3 => array()
      case 4 | 5 | 6 => obj(depth)
      case 7 => if (depth > 0) obj(depth) else scalar()
    }

    def schema(depth: Int): JObj = {
      val kws = Vector.newBuilder[(String, JValue)]
      val nKw = 1 + rnd.nextInt(3)
      (0 until nKw).foreach { _ =>
        rnd.nextInt(19) match {
          case 0 =>
            kws += "type" -> (if (rnd.nextBoolean())
              JStr(oneOf("string", "number", "integer", "boolean", "array",
                "object", "null", "any"))
            else JArr(Vector(JStr(oneOf("string", "integer")),
              JStr(oneOf("object", "null", "array")))))
          case 1 =>
            kws += oneOf("minimum", "maximum") -> jnum(rnd.nextInt(9) - 4)
            if (rnd.nextBoolean())
              kws += oneOf("exclusiveMinimum", "exclusiveMaximum") ->
                JBool(true)
          case 2 => kws += "multipleOf" -> oneOf(jnum(0.5), jint(2), jint(3),
            jnum(0.01))
          case 3 => kws += oneOf("minLength", "maxLength") -> jint(rnd.nextInt(4))
          case 4 => kws += "pattern" -> JStr(oneOf("^a", "b$", "[0-9]+", "a+b"))
          case 5 => kws += "enum" -> JArr(Vector.fill(1 + rnd.nextInt(3))(
            if (rnd.nextInt(4) == 0) array() else scalar()))
          case 6 => kws += "required" -> JArr(
            fieldPool.filter(_ => rnd.nextBoolean()).map(JStr(_)))
          case 7 if depth > 0 =>
            kws += "properties" -> JObj(
              fieldPool.filter(_ => rnd.nextBoolean())
                .map(f => f -> (schema(depth - 1): JValue)))
          case 8 if depth > 0 =>
            kws += "items" -> (if (rnd.nextBoolean()) schema(depth - 1)
              else JArr(Vector.fill(1 + rnd.nextInt(2))(schema(depth - 1))))
            if (rnd.nextBoolean())
              kws += "additionalItems" -> (if (rnd.nextBoolean()) JBool(false)
                else schema(depth - 1))
          case 9 => kws += oneOf("minItems", "maxItems") -> jint(rnd.nextInt(4))
          case 10 => kws += "uniqueItems" -> JBool(true)
          case 11 => kws += oneOf("minProperties", "maxProperties") ->
            jint(rnd.nextInt(3))
          case 12 =>
            kws += "dependencies" -> JObj(Vector(
              oneOf(fieldPool: _*) -> (if (depth > 0 && rnd.nextBoolean())
                schema(depth - 1)
              else JArr(Vector(JStr(oneOf(fieldPool: _*)))))))
          case 13 if depth > 0 =>
            kws += oneOf("allOf", "anyOf", "oneOf") ->
              JArr(Vector.fill(1 + rnd.nextInt(2))(schema(depth - 1)))
          case 14 if depth > 0 => kws += "not" -> schema(depth - 1)
          case 16 if depth > 0 =>
            kws += "patternProperties" -> JObj(
              Vector(oneOf("^a", "[bc]", "c$")).map(p =>
                p -> (schema(depth - 1): JValue)))
            if (rnd.nextBoolean())
              kws += "additionalProperties" -> (if (rnd.nextBoolean())
                JBool(false) else schema(depth - 1))
          case 17 if depth > 0 =>
            kws += "additionalProperties" -> (if (rnd.nextBoolean())
              JBool(false) else schema(depth - 1))
          case 18 if depth == 2 =>
            // definitions + an internal $ref — ROOT level only: JSON
            // Pointers resolve from the document root, so a nested
            // subschema carrying "#/definitions/d0" would (correctly)
            // fail resolution against the root document
            kws += "definitions" -> JObj(Vector(
              "d0" -> (schema(depth - 1): JValue)))
            kws += "$ref" -> JStr("#/definitions/d0")
          case _ => kws += "minimum" -> jint(rnd.nextInt(5) - 2)
        }
      }
      // de-dup keys (keyword repeats keep the FIRST occurrence, like a
      // parsed JSON object in this engine's VectorMap-backed JObj)
      JObj(kws.result().foldLeft(Vector.empty[(String, JValue)]) {
        case (acc, kv) if acc.exists(_._1 == kv._1) => acc
        case (acc, kv) => acc :+ kv
      })
    }
  }

  test("differential fuzz: 400 random (schema, instance) pairs, 4 configs each") {
    val gen = new Gen(0x5eed5eedL)
    var ran = 0
    var rerolls = 0
    while (ran < 400 && rerolls < 2000) {
      val schema = gen.schema(2)
      val data = gen.data(2)
      val dt =
        try inferType(data)
        catch { case _: Draft4Harness.Unrepresentable => rerolls += 1; null }
      if (dt != null) {
        val df = valueDf(toValue(data, dt), dt)
        val specJson = Json.render(schema)
        val cols = for {
          greedy <- Seq(true, false)
          fused <- Seq(false, true)
        } yield Validator(specJson,
          ValidatorOptions(greedy = greedy, useFusedErrors = fused))
          .forValue(df.col("x"), dt)
        val row = df.select(cols.zipWithIndex.flatMap { case ((v, e), i) =>
          Seq(v.as(s"v$i"), e.as(s"e$i")) }: _*).head()
        def errs(i: Int) = row.getSeq[Row](2 * i + 1)
          .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
        val ctx = s"schema=$specJson\ndata=${Json.render(data)}"
        // 1. v1/v2 parity per mode
        assert(errs(0) == errs(1),
          s"greedy v1/v2 diverge:\n  ${errs(0)}\n  ${errs(1)}\n$ctx")
        assert(errs(2) == errs(3),
          s"first v1/v2 diverge:\n  ${errs(2)}\n  ${errs(3)}\n$ctx")
        // 2. valid == errors.isEmpty (greedy); 3. modes agree on verdict
        assert(row.getBoolean(0) == errs(0).isEmpty,
          s"greedy valid/errors contradict: ${row.getBoolean(0)} ${errs(0)}\n$ctx")
        assert(Seq(2, 4, 6).forall(i => row.getBoolean(i) == row.getBoolean(0)),
          s"configs disagree on verdict\n$ctx")
        // 4. invalid => at least one error in every mode
        if (!row.getBoolean(0))
          (0 until 4).foreach(i => assert(errs(i).nonEmpty,
            s"invalid with empty errors in config $i\n$ctx"))
        ran += 1
      }
    }
    info(s"fuzzed $ran pairs x 4 configs ($rerolls unrepresentable rerolls)")
    assert(ran == 400, s"only $ran pairs ran")
  }
}
