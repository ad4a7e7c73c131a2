package graft.compile

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-kernel HTML markup strip — the fused form of the published
  * boilerplate-removal chain (script/style blocks with contents,
  * comments, remaining tags → space; six universal entities decoded;
  * whitespace collapsed and trimmed). The reference chain is eleven
  * sequential `regexp_replace` passes, each a full text traversal
  * through the regex engine with a fresh string materialization
  * (VERDICT r5 watch item: q_html_strip's cost is the chain, not the
  * semantics). This kernel does the same work in four byte-level scans
  * with no regex machinery and at most one intermediate buffer copy per
  * matched stage:
  *
  *   1. splice script blocks   — `(?is)<script[^>]*>.*?</script>` → " "
  *   2. splice style blocks    — `(?is)<style[^>]*>.*?</style>`  → " "
  *   3. splice comments        — `(?s)<!--.*?-->`                → " "
  *   4. fused final scan       — tags `(?s)<[^>]*>` → " ", entity
  *      decode (&lt; &gt; &quot; &#39; &nbsp; &amp; — amp last, so
  *      "&amp;lt;" single-decodes), `\s+` → " " collapse, trim
  *
  * Stages 1–3 stay SEPARATE scans deliberately: the regex chain's
  * passes interact on pathological interleavings (a style block whose
  * lazy `</style>` closer sits inside a script block is consumed by the
  * SCRIPT pass first, changing which styles the style pass sees), so a
  * one-scan priority automaton is not equivalent. Each scan replicates
  * the regex engine's left-to-right lazy matching exactly: at a failed
  * opener the scan emits one byte and retries at the next position, a
  * matched block becomes one space (spaces never merge adjacent text
  * into new openers, so a pass can never create matches for itself or
  * an earlier pass — the property that makes staged splicing exact).
  * Stage 4 fuses the remaining eight passes into one emission loop:
  * tag removal precedes entity decode (a decoded `&lt;` is literal
  * text, never a tag), decoded `&nbsp;` joins whitespace collapse (it
  * decodes to ' ' BEFORE the `\s+` pass in the chain), and the
  * collapse/trim is a pending-space flag — leading/trailing runs are
  * never emitted, interior runs emit a single ' '.
  *
  * Byte-level scanning is exact on UTF-8: every structural character
  * (`< > & ; ! -` letters, `\s` = the six ASCII [ \t\n\f\r]) is
  * ASCII, and UTF-8 continuation bytes have the high bit set so they
  * never alias ASCII. Case-insensitive tag names fold ASCII only —
  * the same fold Java regex applies under `(?i)` without UNICODE_CASE.
  * Intermediate buffers are ThreadLocal scratch (output length never
  * exceeds input length: every replacement shrinks); only the final
  * result is copied to an exact-size array, since the returned
  * UTF8String must own its bytes.
  *
  * Parity with the regex chain is pinned by StripMarkupSpec's
  * ScalaCheck sweep plus the handcrafted pathological corpus
  * (interleaved blocks, unclosed openers, `-->` debris, entity
  * boundary overlaps), and by the unchanged q_html_strip /
  * q_curate_web DuckDB oracles, which restate the CHAIN in SQL.
  */
final case class StripMarkup(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_strip_markup"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_strip_markup requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    UTF8String.fromBytes(StripMarkup.strip(s.getBytes))
  }

  override protected def withNewChildInternal(newChild: Expression): StripMarkup =
    copy(child = newChild)
}

object StripMarkup {

  private val Script = "script".getBytes("US-ASCII")
  private val Style = "style".getBytes("US-ASCII")

  // per-thread scratch for the staged splices; grown geometrically and
  // reused across rows (splice output is never longer than its input)
  private val scratch = ThreadLocal.withInitial[Array[Array[Byte]]](() =>
    Array(new Array[Byte](0), new Array[Byte](0), new Array[Byte](0),
      new Array[Byte](0)))

  private def buf(slot: Int, atLeast: Int): Array[Byte] = {
    val bs = scratch.get()
    if (bs(slot).length < atLeast)
      bs(slot) = new Array[Byte](Integer.highestOneBit(math.max(atLeast, 64)) * 2)
    bs(slot)
  }

  /** Full strip over raw UTF-8 bytes; returns an exact-size owned array. */
  def strip(in: Array[Byte]): Array[Byte] = {
    var cur = in
    var len = in.length
    // stages 1-3 copy only when the stage matches at least one block
    var slot = 0
    for (stage <- 0 until 3) {
      val n = spliceBlocks(cur, len, stage, slot)
      if (n >= 0) { cur = scratch.get()(slot); len = n; slot += 1 }
    }
    finalScan(cur, len)
  }

  private def asciiLower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** Case-insensitive ASCII match of `pat` at `in(at)`. */
  private def matchesCI(in: Array[Byte], len: Int, at: Int,
                        pat: Array[Byte]): Boolean = {
    if (at + pat.length > len) return false
    var i = 0
    while (i < pat.length) {
      if (asciiLower(in(at + i)) != pat(i)) return false
      i += 1
    }
    true
  }

  /** One splice stage (0 = script, 1 = style, 2 = comment) over
    * `in(0 until len)` into scratch `slot`. Returns the spliced length,
    * or -1 when the stage matched nothing (caller keeps `in` — the
    * common plain-text path allocates and copies nothing). */
  private def spliceBlocks(in: Array[Byte], len: Int, stage: Int,
                           slot: Int): Int = {
    val name = stage match { case 0 => Script; case 1 => Style; case _ => null }
    var out: Array[Byte] = null
    var o = 0
    var i = 0
    var from = 0 // start of the pending verbatim run
    while (i < len) {
      var end = -1 // index just past a matched block
      if (in(i) == '<') {
        if (stage < 2) {
          // opener: "<name" then [^>]* then '>' (regex: <script[^>]*>)
          if (matchesCI(in, len, i + 1, name)) {
            var j = i + 1 + name.length
            while (j < len && in(j) != '>') j += 1
            if (j < len) {
              // lazy closer: first "</name>" (case-insensitive) after j
              var k = j + 1
              while (end < 0 && k + name.length + 2 < len + 1) {
                if (in(k) == '<' && k + 1 < len && in(k + 1) == '/' &&
                    matchesCI(in, len, k + 2, name) &&
                    k + 2 + name.length < len &&
                    in(k + 2 + name.length) == '>')
                  end = k + name.length + 3
                k += 1
              }
            }
          }
        } else if (i + 3 < len && in(i + 1) == '!' && in(i + 2) == '-' &&
                   in(i + 3) == '-') {
          // comment: "<!--" then lazy "-->" (regex: <!--.*?-->)
          var k = i + 4
          while (end < 0 && k + 2 < len) {
            if (in(k) == '-' && in(k + 1) == '-' && in(k + 2) == '>')
              end = k + 3
            k += 1
          }
        }
      }
      if (end >= 0) {
        if (out == null) out = buf(slot, len)
        System.arraycopy(in, from, out, o, i - from)
        o += i - from
        out(o) = ' '
        o += 1
        i = end
        from = end
      } else i += 1
    }
    if (out == null) -1
    else {
      System.arraycopy(in, from, out, o, len - from)
      o + (len - from)
    }
  }

  private def isWs(b: Byte): Boolean = // Java regex \s (ASCII-only)
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Fused tag-removal + entity-decode + whitespace-collapse + trim. */
  private def finalScan(in: Array[Byte], len: Int): Array[Byte] = {
    val out = buf(3, len)
    var o = 0
    var pending = false // a whitespace run (or removed tag) awaits one ' '
    def emit(b: Byte): Unit = {
      if (pending && o > 0) { out(o) = ' '; o += 1 }
      pending = false
      out(o) = b
      o += 1
    }
    var i = 0
    while (i < len) {
      val c = in(i)
      if (c == '<') {
        // (?s)<[^>]*> — removed iff a '>' exists anywhere ahead
        var j = i + 1
        while (j < len && in(j) != '>') j += 1
        if (j < len) { pending = true; i = j + 1 }
        else { emit('<'); i += 1 }
      } else if (c == '&') {
        // the six entities are mutually exclusive at their second byte,
        // so first-match here equals the chain's fixed decode order;
        // decoded characters are literal text (never re-scanned), and
        // "&amp;…" decodes ONCE exactly as the amp-last ordering does
        val rem = len - i
        if (rem >= 4 && in(i + 1) == 'l' && in(i + 2) == 't' && in(i + 3) == ';') {
          emit('<'); i += 4
        } else if (rem >= 4 && in(i + 1) == 'g' && in(i + 2) == 't' &&
                   in(i + 3) == ';') {
          emit('>'); i += 4
        } else if (rem >= 6 && in(i + 1) == 'q' && in(i + 2) == 'u' &&
                   in(i + 3) == 'o' && in(i + 4) == 't' && in(i + 5) == ';') {
          emit('"'); i += 6
        } else if (rem >= 5 && in(i + 1) == '#' && in(i + 2) == '3' &&
                   in(i + 3) == '9' && in(i + 4) == ';') {
          emit('\''); i += 5
        } else if (rem >= 6 && in(i + 1) == 'n' && in(i + 2) == 'b' &&
                   in(i + 3) == 's' && in(i + 4) == 'p' && in(i + 5) == ';') {
          pending = true; i += 6 // decodes to ' ' BEFORE the \s+ collapse
        } else if (rem >= 5 && in(i + 1) == 'a' && in(i + 2) == 'm' &&
                   in(i + 3) == 'p' && in(i + 4) == ';') {
          emit('&'); i += 5
        } else { emit('&'); i += 1 }
      } else if (isWs(c)) { pending = true; i += 1 }
      else { emit(c); i += 1 }
    }
    java.util.Arrays.copyOf(out, o) // trailing `pending` = trim
  }
}
