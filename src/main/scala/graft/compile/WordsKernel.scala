package graft.compile

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The tokenizer EVERY text operator feeds on, as one JVM pass.
  *
  * Semantics are pinned to the original Column formulation (and to the
  * `duckWords` macro every SQL oracle restates):
  *
  * {{{ filter(split(lower(regexp_replace(text, "[^\p{L}\p{N}\s]", " ")),
  *            "\s+"), w => w =!= "") }}}
  *
  * which reduces to: replace every code point whose Unicode general
  * category is NOT letter (L*) / number (N*) / ASCII whitespace with one
  * space, lowercase the result, then emit the maximal runs of
  * non-ASCII-whitespace chars (the empty fragments between adjacent
  * separators are filtered). The lowercase step uses the SAME entry
  * point as Spark's `lower()` under the default UTF8_BINARY collation
  * (`CollationSupport.Lower.execBinary`), so outputs are bit-identical
  * to the Column chain (WordsKernelSpec fuzzes the equivalence).
  *
  * Why a kernel: the chain above is two regex automata plus a lambda HOF
  * per row, and Spark's lambda HOFs are CodegenFallback — ONE of them in
  * a projection ejects the whole stage from whole-stage codegen, so every
  * downstream text operator (langId, token counts, shingles → MinHash /
  * SimHash, quality signals) paid interpreted eval for its entire stage.
  * This kernel is a single pass over the lowered string with a
  * category-bitmask test per code point, and it rides
  * [[KernelCallCodegen]] so the stage stays fused.
  */
final case class WordsKernel(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_words"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_words requires a string input, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    // ORDER MATTERS and mirrors the chain exactly: categorize on the
    // ORIGINAL code points (replace each non-[L N \s] match with one
    // space), THEN lower the whole string (İ lowers to i + combining
    // U+0307, category Mn — the chain keeps it inside the token because
    // the replace already ran; final-sigma lowering is context-sensitive
    // across token boundaries, hence whole-string), then split on runs
    // of ASCII whitespace (Java "\\s+") and drop empties.
    val orig = input.asInstanceOf[UTF8String].toString
    val n = orig.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val cp = orig.codePointAt(i)
      val w = Character.charCount(cp)
      if (WordsKernel.isWordCp(cp)) sb.appendCodePoint(cp)
      else if (w == 1 && WordsKernel.isAsciiSpace(orig.charAt(i)))
        sb.append(orig.charAt(i))
      else sb.append(' ') // one space per MATCH, even for supplementary cps
      i += w
    }
    val s = org.apache.spark.sql.catalyst.util.CollationSupport.Lower
      .execBinary(UTF8String.fromString(sb.toString)).toString
    val m = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var j = 0
    var start = -1
    while (j < m) {
      if (WordsKernel.isAsciiSpace(s.charAt(j))) {
        if (start >= 0) {
          out += UTF8String.fromString(s.substring(start, j))
          start = -1
        }
      } else if (start < 0) start = j
      j += 1
    }
    if (start >= 0) out += UTF8String.fromString(s.substring(start, m))
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WordsKernel =
    copy(child = newChild)
}

object WordsKernel {
  /** General categories kept by `[\p{L}\p{N}]`: Lu Ll Lt Lm Lo Nd Nl No. */
  private val KeepMask: Int =
    (1 << Character.UPPERCASE_LETTER) | (1 << Character.LOWERCASE_LETTER) |
    (1 << Character.TITLECASE_LETTER) | (1 << Character.MODIFIER_LETTER) |
    (1 << Character.OTHER_LETTER) | (1 << Character.DECIMAL_DIGIT_NUMBER) |
    (1 << Character.LETTER_NUMBER) | (1 << Character.OTHER_NUMBER)

  @inline def isWordCp(cp: Int): Boolean =
    ((1 << Character.getType(cp)) & KeepMask) != 0

  /** Java regex "\s" (no UNICODE_CHARACTER_CLASS): [ \t\n\x0B\f\r]. */
  @inline def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
}
