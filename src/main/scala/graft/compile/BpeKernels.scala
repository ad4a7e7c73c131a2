package graft.compile

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenization kernel for [[graft.ops.Bpe]]: one JVM pass per row
  * producing the token array whose concatenation is EXACTLY the input
  * (the gate's round-trip invariant). Whitespace characters are always
  * single-character tokens; non-space runs start as code-point symbols
  * and the ranked merge table is applied SEQUENTIALLY in rank order
  * (one left-to-right pass per applicable merge — the same application
  * rule the trainer used on its census, so training words reproduce
  * their final training segmentation bit-for-bit). The merge table
  * rides as plan literals; encoding is a pure narrow projection. */
final case class BpeEncode(child: Expression, mergesFlat: Seq[String])
  extends UnaryExpression with KernelCallCodegen {

  require(mergesFlat.length % 2 == 0, "bpe: merges must be (left, right) pairs")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode requires string, got ${other.simpleString}")
  }

  @transient private lazy val merges: Array[(String, String, String)] =
    mergesFlat.grouped(2).map(p => (p.head, p(1), p.head + p(1))).toArray

  private def encodeWord(w: String, out: java.util.ArrayList[UTF8String]): Unit = {
    // code-point symbols
    var syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(w.substring(i, i + n))
      i += n
    }
    var mi = 0
    while (mi < merges.length && syms.size() > 1) {
      val (a, b, joined) = merges(mi)
      // cheap reject: a merged pair's characters are contiguous in the
      // original word, so absence of the joined substring ⇒ inapplicable
      if (w.contains(joined)) {
        var j = 0
        var next: java.util.ArrayList[String] = null
        while (j < syms.size()) {
          if (next == null && j < syms.size() - 1 &&
              syms.get(j) == a && syms.get(j + 1) == b) {
            next = new java.util.ArrayList[String](syms.size())
            var k = 0
            while (k < j) { next.add(syms.get(k)); k += 1 }
          }
          if (next != null) {
            if (j < syms.size() - 1 && syms.get(j) == a && syms.get(j + 1) == b) {
              next.add(joined); j += 2
            } else { next.add(syms.get(j)); j += 1 }
          } else j += 1
        }
        if (next != null) syms = next
      }
      mi += 1
    }
    var k = 0
    while (k < syms.size()) { out.add(UTF8String.fromString(syms.get(k))); k += 1 }
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < s.length) {
      val start = i
      val ws = Character.isWhitespace(s.charAt(i))
      while (i < s.length && Character.isWhitespace(s.charAt(i)) == ws) i += 1
      if (ws) {
        // whitespace runs: one token per character (never merged)
        var j = start
        while (j < i) { out.add(UTF8String.fromString(s.substring(j, j + 1))); j += 1 }
      } else encodeWord(s.substring(start, i), out)
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
