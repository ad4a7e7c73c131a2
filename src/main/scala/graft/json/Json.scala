package graft.json

import scala.collection.immutable.VectorMap

/** Minimal JSON value model for constraint specs.
  *
  * Object key order is preserved (Vector of pairs) because keyword
  * emission order in the reference engine follows schema-object key
  * order (/root/reference/lib/jsen.js:561 `Object.keys(schema)`), and
  * violation ordering derives from it.
  *
  * Numbers are kept as BigDecimal so `multipleOf` fractional semantics
  * (/root/reference/lib/jsen.js:123-139) can be reproduced exactly.
  */
sealed trait JValue {
  def typeName: String = this match {
    case JNull       => "null"
    case _: JBool    => "boolean"
    case _: JNum     => "number"
    case _: JStr     => "string"
    case _: JArr     => "array"
    case _: JObj     => "object"
  }
}
case object JNull extends JValue
final case class JBool(value: Boolean) extends JValue
final case class JNum(value: BigDecimal) extends JValue {
  def isIntegral: Boolean = value.isWhole
}
final case class JStr(value: String) extends JValue
final case class JArr(items: Vector[JValue]) extends JValue
final case class JObj(fields: Vector[(String, JValue)]) extends JValue {
  private lazy val map: Map[String, JValue] = fields.to(VectorMap)
  def get(key: String): Option[JValue] = map.get(key)
  def apply(key: String): JValue = map(key)
  def keys: Vector[String] = fields.map(_._1)
  def has(key: String): Boolean = map.contains(key)
  /** Typed accessors mirroring the reference's per-keyword applicability
    * guards (each generator checks its own operand type and silently
    * no-ops on mismatch — /root/reference/lib/jsen.js:92, README.md:87-99).
    */
  def str(key: String): Option[String] = get(key).collect { case JStr(s) => s }
  def num(key: String): Option[BigDecimal] = get(key).collect { case JNum(n) => n }
  def int(key: String): Option[Long] =
    get(key).collect { case n: JNum if n.isIntegral => n.value.toLongExact }
  def bool(key: String): Option[Boolean] = get(key).collect { case JBool(b) => b }
  def arr(key: String): Option[Vector[JValue]] = get(key).collect { case JArr(a) => a }
  def obj(key: String): Option[JObj] = get(key).collect { case o: JObj => o }
}

object JObj {
  val empty: JObj = JObj(Vector.empty)
  def apply(fields: (String, JValue)*): JObj = JObj(fields.toVector)
}

object Json {

  /** Recursive-descent JSON parser (RFC 8259). */
  def parse(input: String): JValue = {
    val p = new Parser(input)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) p.fail("trailing content")
    v
  }

  private final class Parser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"json parse error at offset $i: $msg")

    def skipWs(): Unit = {
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
             s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    }

    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    private def peek: Char = { if (atEnd) fail("unexpected end"); s.charAt(i) }

    def parseValue(): JValue = {
      skipWs()
      peek match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => JStr(parseString())
        case 't' => parseLit("true", JBool(true))
        case 'f' => parseLit("false", JBool(false))
        case 'n' => parseLit("null", JNull)
        case c if c == '-' || (c >= '0' && c <= '9') => parseNumber()
        case c => fail(s"unexpected char '$c'")
      }
    }

    private def parseLit(lit: String, v: JValue): JValue = {
      if (!s.startsWith(lit, i)) fail(s"expected $lit")
      i += lit.length
      v
    }

    private def parseObject(): JObj = {
      expect('{'); skipWs()
      val buf = Vector.newBuilder[(String, JValue)]
      if (peek == '}') { i += 1; return JObj(buf.result()) }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        val v = parseValue()
        buf += ((k, v))
        skipWs()
        peek match {
          case ',' => i += 1
          case '}' => i += 1; done = true
          case _   => fail("expected ',' or '}'")
        }
      }
      JObj(buf.result())
    }

    private def parseArray(): JArr = {
      expect('['); skipWs()
      val buf = Vector.newBuilder[JValue]
      if (peek == ']') { i += 1; return JArr(buf.result()) }
      var done = false
      while (!done) {
        buf += parseValue()
        skipWs()
        peek match {
          case ',' => i += 1
          case ']' => i += 1; done = true
          case _   => fail("expected ',' or ']'")
        }
      }
      JArr(buf.result())
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (atEnd) fail("unterminated string")
        val c = s.charAt(i); i += 1
        c match {
          case '"'  => return sb.result()
          case '\\' =>
            if (atEnd) fail("bad escape")
            val e = s.charAt(i); i += 1
            e match {
              case '"'  => sb += '"'
              case '\\' => sb += '\\'
              case '/'  => sb += '/'
              case 'b'  => sb += '\b'
              case 'f'  => sb += '\f'
              case 'n'  => sb += '\n'
              case 'r'  => sb += '\r'
              case 't'  => sb += '\t'
              case 'u'  =>
                if (i + 4 > s.length) fail("bad unicode escape")
                sb += Integer.parseInt(s.substring(i, i + 4), 16).toChar
                i += 4
              case _ => fail(s"bad escape '\\$e'")
            }
          case _ => sb += c
        }
      }
      sb.result() // unreachable
    }

    private def parseNumber(): JNum = {
      val start = i
      if (peek == '-') i += 1
      while (!atEnd && { val c = s.charAt(i)
             (c >= '0' && c <= '9') || c == '.' || c == 'e' || c == 'E' ||
             c == '+' || c == '-' }) i += 1
      JNum(BigDecimal(s.substring(start, i)))
    }
  }

  /** Compact serializer (for diagnostics and golden files). */
  def render(v: JValue): String = v match {
    case JNull        => "null"
    case JBool(b)     => b.toString
    case JNum(n)      => if (n.isWhole && n.abs < BigDecimal(Long.MaxValue)) n.toLongExact.toString
                         else n.toString
    case JStr(str)    => renderString(str)
    case JArr(items)  => items.map(render).mkString("[", ",", "]")
    case JObj(fields) => fields.map { case (k, fv) => renderString(k) + ":" + render(fv) }
                               .mkString("{", ",", "}")
  }

  def renderString(str: String): String = {
    val sb = new StringBuilder("\"")
    str.foreach {
      case '"'  => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb += '"'
    sb.result()
  }
}
