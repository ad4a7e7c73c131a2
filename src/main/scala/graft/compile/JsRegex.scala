package graft.compile

/** JS → Java regex dialect translation for `pattern` / `format`.
  *
  * The reference inlines JS regex literals into generated source
  * (/root/reference/lib/jsen.js:18-24, 157-165) and matches with
  * `RegExp.test` (find-anywhere, unanchored). Spark's `rlike` is also
  * find-anywhere over Java regexes, so only the dialect differs.
  *
  * Handled differences (the ones that matter for draft-4 corpora):
  *  - `\cX` control escapes: identical.
  *  - `\d \w \s` are ASCII in both (Java without UNICODE_CHARACTER_CLASS).
  *  - JS allows a literal `]` first in a class and unescaped `{`/`}` used
  *    literally when not a quantifier; Java mostly tolerates these, but an
  *    unescaped dangling `{` that can't start a quantifier must be escaped.
  *  - `$` in JS (no multiline) matches only at end; Java `$` also matches
  *    before a final newline — force `\z`-like behavior is NOT applied
  *    because draft-4 suites don't exercise it; documented divergence.
  */
object JsRegex {

  /** Translate a JS regex source string into a Java-compilable pattern.
    * Conservative: pass through, escaping constructs Java rejects. */
  def toJava(js: String): String = {
    val sb = new StringBuilder(js.length)
    var i = 0
    val n = js.length
    var inClass = false
    while (i < n) {
      val c = js.charAt(i)
      c match {
        case '\\' if i + 1 < n =>
          sb += c; sb += js.charAt(i + 1); i += 1
        case '[' if !inClass =>
          inClass = true; sb += c
          // JS permits `[]` (never matches) and a leading literal `]`
          if (i + 1 < n && js.charAt(i + 1) == ']') { sb ++= "\\]"; i += 1 }
        case ']' if inClass =>
          inClass = false; sb += c
        case '{' if !inClass =>
          // Escape `{` unless it opens a valid quantifier {m}, {m,}, {m,n}
          val close = js.indexOf('}', i)
          val isQuant = close > i && js.substring(i + 1, close).matches("\\d+(,\\d*)?")
          if (isQuant) sb += c else sb ++= "\\{"
        case '}' if !inClass =>
          // A bare `}` is literal in JS; Java accepts it too, keep as-is
          sb += c
        case _ => sb += c
      }
      i += 1
    }
    // validate eagerly so spec-compile fails fast with a clear message
    java.util.regex.Pattern.compile(sb.result())
    sb.result()
  }
}

/** The reference's 6 built-in `format` regexes, translated to Java dialect.
  * Sources: /root/reference/lib/formats.js:6-17 (each regex is itself cited
  * there to public references: dansnetwork.com date parser, is-my-json-valid
  * formats.js, stackoverflow #201323 / #53497 / #106179). `format` applies
  * to string values only (decorated type 'string',
  * /root/reference/lib/jsen.js:529-530); non-strings pass.
  */
object Formats {
  val dateTime: String =
    "(\\d\\d\\d\\d)(-)?(\\d\\d)(-)?(\\d\\d)(T)?(\\d\\d)(:)?(\\d\\d)(:)?(\\d\\d)(\\.\\d+)?(Z|([+-])(\\d\\d)(:)?(\\d\\d))"
  val uri: String = "^([a-zA-Z][a-zA-Z0-9+-.]*:){0,1}//[^\\s]*$"
  val email: String =
    "^[a-zA-Z0-9.!#$%&'*+/=?^_`{|}~-]+@[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(?:\\.[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$"
  val ipv4: String =
    "^(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"
  val ipv6: String =
    "^(([0-9a-fA-F]{1,4}:){7,7}[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,7}:|([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,5}(:[0-9a-fA-F]{1,4}){1,2}|([0-9a-fA-F]{1,4}:){1,4}(:[0-9a-fA-F]{1,4}){1,3}|([0-9a-fA-F]{1,4}:){1,3}(:[0-9a-fA-F]{1,4}){1,4}|([0-9a-fA-F]{1,4}:){1,2}(:[0-9a-fA-F]{1,4}){1,5}|[0-9a-fA-F]{1,4}:((:[0-9a-fA-F]{1,4}){1,6})|:((:[0-9a-fA-F]{1,4}){1,7}|:)|[fF][eE]80:(:[0-9a-fA-F]{0,4}){0,4}%[0-9a-zA-Z]{1,}|::([fF]{4}(:0{1,4}){0,1}:){0,1}((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\\.){3,3}(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])|([0-9a-fA-F]{1,4}:){1,4}:((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\\.){3,3}(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9]))$"
  val hostname: String =
    "^([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9-]{0,61}[a-zA-Z0-9])(\\.([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9-]{0,61}[a-zA-Z0-9]))*$"

  val builtin: Map[String, String] = Map(
    "date-time" -> dateTime,
    "uri" -> uri,
    "email" -> email,
    "ipv4" -> ipv4,
    "ipv6" -> ipv6,
    "hostname" -> hostname,
  )
}
