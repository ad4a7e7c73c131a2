package graft

import graft.json._
import graft.schema.SchemaResolver

/** Slow interpreted oracle of the reference's validation semantics
  * (/root/reference/lib/jsen.js:932-1036), evaluated directly over JValue
  * instances — used by PropertySpec to cross-check the Catalyst compiler
  * on randomly generated specs and rows. Written from the reference's
  * generate()/keyword semantics, not from the compiler, so translation
  * bugs (null handling, decimal scaling, regex dialect) surface as
  * disagreements.
  *
  * Instance encoding: a *missing* property is an absent key (undefined);
  * JNull is a present null. Greedy mode only (the compiler's non-greedy
  * is derived from the same groups).
  */
object SpecOracle {

  final case class Err(path: String, keyword: String)

  def validate(spec: JValue, instance: JValue): (Boolean, Vector[Err]) = {
    val resolver = new SchemaResolver(spec)
    val errs = Vector.newBuilder[Err]
    gen(spec, instance, "", resolver, errs)
    val e = errs.result()
    (e.isEmpty, e)
  }

  private def typeOf(v: JValue): String = v match {
    case JNull => "null"
    case _: JBool => "boolean"
    case n: JNum => "number" // integer is a value test, not a type
    case _: JStr => "string"
    case _: JArr => "array"
    case _: JObj => "object"
  }

  private def typeMatches(t: String, v: JValue): Boolean = t match {
    case "null" => v == JNull
    case "boolean" => v.isInstanceOf[JBool]
    case "string" => v.isInstanceOf[JStr]
    case "number" => v.isInstanceOf[JNum]
    case "integer" => v match { case n: JNum => n.value.isWhole; case _ => false }
    case "array" => v.isInstanceOf[JArr]
    case "object" => v.isInstanceOf[JObj]
    case "date" => false
    case _ => true // unknown type names always match
  }

  private val numberKws = Vector("minimum", "exclusiveMinimum", "maximum",
    "exclusiveMaximum", "multipleOf")
  private val stringKws = Vector("minLength", "maxLength", "pattern", "format")
  private val arrayKws = Vector("minItems", "maxItems", "additionalItems",
    "uniqueItems", "items")
  private val objectKws = Vector("maxProperties", "minProperties", "required",
    "properties", "patternProperties", "additionalProperties", "dependencies")
  private val kwType: Map[String, String] =
    (numberKws.map(_ -> "number") ++ stringKws.map(_ -> "string") ++
     arrayKws.map(_ -> "array") ++ objectKws.map(_ -> "object")).toMap

  private def gen(schemaV: JValue, v: JValue, path: String,
                  resolver: SchemaResolver,
                  errs: scala.collection.mutable.Builder[Err, Vector[Err]]): Unit = {
    val schema0 = schemaV match { case o: JObj => o; case _ => return }
    val schema = resolver.resolve(schema0) match { case o: JObj => o; case _ => return }

    // enum short-circuit
    schema.arr("enum") match {
      case Some(lits) if lits.nonEmpty =>
        if (!lits.exists(deepEqual(_, v))) errs += Err(path, "enum")
        return
      case _ => ()
    }

    val declared: Option[List[String]] = schema.get("type") match {
      case Some(JStr(t)) => Some(List(t))
      case Some(JArr(is)) if is.nonEmpty => Some(is.collect { case JStr(t) => t }.toList)
      case _ => None
    }

    val perType = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    val hasPat = schema.obj("patternProperties").isDefined
    schema.keys.foreach { k =>
      if (k != "enum" && k != "type") kwType.get(k).foreach { t =>
        if (!(k == "additionalProperties" && hasPat))
          perType(t) = perType.getOrElse(t, Vector.empty) :+ k
      }
    }

    val typeOk = declared.forall(_.exists(typeMatches(_, v)))
    if (!typeOk) {
      errs += Err(path, "type")
    } else {
      // per-type groups gated on the value being that type
      perType.foreach { case (t, kws) =>
        if (typeMatches(t, v)) kws.foreach(kw => keyword(kw, schema, v, path, resolver, errs))
      }
    }

    // combinators always run (even after type error in greedy? no —
    // jsen's ladder: type error then else-if skips GROUPS, but allType
    // combinators are emitted after the ladder unconditionally)
    schema.keys.foreach {
      case "allOf" => schema.arr("allOf").foreach(_.foreach(gen(_, v, path, resolver, errs)))
      case "anyOf" => schema.arr("anyOf").foreach { subs =>
        val pre = errs.result().length
        var found = false
        subs.foreach { sub =>
          if (!found) {
            val cnt = errs.result().length
            gen(sub, v, path, resolver, errs)
            found = errs.result().length == cnt
          }
        }
        if (!found) errs += Err(path, "anyOf")
        else trimTo(errs, pre)
      }
      case "oneOf" => schema.arr("oneOf").foreach { subs =>
        val pre = errs.result().length
        var matching = 0
        subs.foreach { sub =>
          val cnt = errs.result().length
          gen(sub, v, path, resolver, errs)
          if (errs.result().length == cnt) matching += 1
        }
        if (matching != 1) errs += Err(path, "oneOf")
        else trimTo(errs, pre)
      }
      case "not" => schema.obj("not").foreach { sub =>
        val pre = errs.result().length
        gen(sub, v, path, resolver, errs)
        val failed = errs.result().length > pre
        trimTo(errs, pre)
        if (!failed) errs += Err(path, "not")
      }
      case _ => ()
    }
  }

  private def trimTo(errs: scala.collection.mutable.Builder[Err, Vector[Err]],
                     n: Int): Unit = {
    val kept = errs.result().take(n)
    errs.clear()
    errs ++= kept
  }

  private def join(path: String, seg: String): String =
    if (path.isEmpty) seg else s"$path.$seg"

  private def keyword(kw: String, schema: JObj, v: JValue, path: String,
                      resolver: SchemaResolver,
                      errs: scala.collection.mutable.Builder[Err, Vector[Err]]): Unit = {
    def num = v.asInstanceOf[JNum].value
    kw match {
      case "minimum" => schema.num("minimum").foreach { m =>
        if (num < m) errs += Err(path, "minimum")
      }
      case "exclusiveMinimum" =>
        (schema.bool("exclusiveMinimum"), schema.num("minimum")) match {
          case (Some(true), Some(m)) => if (num == m) errs += Err(path, "exclusiveMinimum")
          case _ => ()
        }
      case "maximum" => schema.num("maximum").foreach { m =>
        if (num > m) errs += Err(path, "maximum")
      }
      case "exclusiveMaximum" =>
        (schema.bool("exclusiveMaximum"), schema.num("maximum")) match {
          case (Some(true), Some(m)) => if (num == m) errs += Err(path, "exclusiveMaximum")
          case _ => ()
        }
      case "multipleOf" => schema.num("multipleOf").foreach { mul =>
        // BigDecimal remainder is exact — the semantics jsen's
        // round-trick approximates (jsen.js:123-139)
        if (num.remainder(mul) != 0) errs += Err(path, "multipleOf")
      }
      case "minLength" => schema.int("minLength").foreach { n =>
        if (codePoints(v) < n) errs += Err(path, "minLength")
      }
      case "maxLength" => schema.int("maxLength").foreach { n =>
        if (codePoints(v) > n) errs += Err(path, "maxLength")
      }
      case "pattern" => schema.str("pattern").foreach { p =>
        val s = v.asInstanceOf[JStr].value
        if (!java.util.regex.Pattern.compile(p).matcher(s).find())
          errs += Err(path, "pattern")
      }
      case "format" => schema.str("format").foreach { f =>
        graft.compile.Formats.builtin.get(f).foreach { re =>
          val s = v.asInstanceOf[JStr].value
          if (!java.util.regex.Pattern.compile(re).matcher(s).find())
            errs += Err(path, "format")
        }
      }
      case "minItems" => schema.int("minItems").foreach { n =>
        if (v.asInstanceOf[JArr].items.length < n) errs += Err(path, "minItems")
      }
      case "maxItems" => schema.int("maxItems").foreach { n =>
        if (v.asInstanceOf[JArr].items.length > n) errs += Err(path, "maxItems")
      }
      case "additionalItems" =>
        (schema.bool("additionalItems"), schema.arr("items")) match {
          case (Some(false), Some(tuple)) =>
            if (v.asInstanceOf[JArr].items.length > tuple.length)
              errs += Err(path, "additionalItems")
          case _ => ()
        }
      case "uniqueItems" => schema.bool("uniqueItems").foreach { u =>
        if (u) {
          val items = v.asInstanceOf[JArr].items
          val distinct = items.foldLeft(Vector.empty[JValue]) { (acc, x) =>
            if (acc.exists(deepEqual(_, x))) acc else acc :+ x
          }
          if (distinct.length != items.length) errs += Err(path, "uniqueItems")
        }
      }
      case "items" =>
        val items = v.asInstanceOf[JArr].items
        schema.get("items") match {
          case Some(sub: JObj) =>
            items.zipWithIndex.foreach { case (x, i) =>
              gen(sub, x, join(path, i.toString), resolver, errs)
            }
          case Some(JArr(tuple)) =>
            tuple.zipWithIndex.foreach { case (sub, i) =>
              if (items.length - 1 >= i) gen(sub, items(i), join(path, i.toString), resolver, errs)
            }
            schema.get("additionalItems") match {
              case Some(restSub: JObj) =>
                (tuple.length until items.length).foreach { i =>
                  gen(restSub, items(i), join(path, i.toString), resolver, errs)
                }
              case _ => ()
            }
          case _ => ()
        }
      case "maxProperties" => schema.int("maxProperties").foreach { n =>
        if (v.asInstanceOf[JObj].fields.length > n) errs += Err(path, "maxProperties")
      }
      case "minProperties" => schema.int("minProperties").foreach { n =>
        if (v.asInstanceOf[JObj].fields.length < n) errs += Err(path, "minProperties")
      }
      case "required" => schema.arr("required").foreach { req =>
        val obj = v.asInstanceOf[JObj]
        val props = schema.obj("properties")
        req.collect { case JStr(name) => name }.foreach { name =>
          val hasSub = props.flatMap(_.get(name)).exists(_.isInstanceOf[JObj])
          if (!hasSub && !obj.has(name)) errs += Err(join(path, name), "required")
        }
      }
      case "properties" => schema.obj("properties").foreach { props =>
        val obj = v.asInstanceOf[JObj]
        val required = schema.arr("required").getOrElse(Vector.empty)
          .collect { case JStr(s) => s }.toSet
        props.fields.foreach { case (name, sub) =>
          obj.get(name) match {
            case Some(x) => gen(sub, x, join(path, name), resolver, errs)
            case None => if (required.contains(name)) errs += Err(join(path, name), "required")
          }
        }
      }
      case "patternProperties" | "additionalProperties" =>
        val obj = v.asInstanceOf[JObj]
        val patterns = schema.obj("patternProperties").map(_.fields).getOrElse(Vector.empty)
        val addProps = schema.get("additionalProperties")
        val addCheck = addProps.exists {
          case JBool(false) => true
          case _: JObj => true
          case _ => false
        }
        if (patterns.nonEmpty || addCheck) {
          val declared = schema.obj("properties").map(_.keys.toSet).getOrElse(Set.empty)
          obj.fields.foreach { case (key, value) =>
            var found = false
            patterns.foreach { case (p, sub) =>
              if (java.util.regex.Pattern.compile(p).matcher(key).find()) {
                gen(sub, value, join(path, key), resolver, errs)
                found = true
              }
            }
            if (addCheck && !declared.contains(key) && !found) addProps match {
              case Some(JBool(false)) => errs += Err(path, "additionalProperties")
              case Some(sub: JObj) => gen(sub, value, join(path, key), resolver, errs)
              case _ => ()
            }
          }
        }
      case "dependencies" => schema.obj("dependencies").foreach { deps =>
        val obj = v.asInstanceOf[JObj]
        deps.fields.foreach {
          case (key, dep: JObj) =>
            if (obj.has(key)) gen(dep, v, path, resolver, errs)
          case (key, JArr(names)) =>
            if (obj.has(key)) names.collect { case JStr(d) => d }.foreach { d =>
              if (!obj.has(d)) errs += Err(join(path, d), "dependencies")
            }
          case _ => ()
        }
      }
      case _ => ()
    }
  }

  private def codePoints(v: JValue): Int =
    v.asInstanceOf[JStr].value.codePointCount(0, v.asInstanceOf[JStr].value.length)

  /** Deep structural equality (lib/equal.js:28-69): arrays ordered,
    * object key sets compared order-insensitively. */
  def deepEqual(a: JValue, b: JValue): Boolean = (a, b) match {
    case (JNull, JNull) => true
    case (JBool(x), JBool(y)) => x == y
    case (JNum(x), JNum(y)) => x == y
    case (JStr(x), JStr(y)) => x == y
    case (JArr(xs), JArr(ys)) =>
      xs.length == ys.length && xs.zip(ys).forall { case (x, y) => deepEqual(x, y) }
    case (x: JObj, y: JObj) =>
      x.keys.toSet == y.keys.toSet &&
        x.keys.forall(k => deepEqual(x(k), y(k)))
    case _ => false
  }
}
