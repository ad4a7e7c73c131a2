package graft.compile

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a tokenized word array — one JVM pass
  * over the words. Replaces the Column formulation
  * `array_distinct(transform(sequence(0, size-n), i => concat_ws(" ",
  * slice(ws, i+1, n))))`, whose interpreted lambda re-evaluates the whole
  * `ws` subtree (the full tokenization chain) once per shingle POSITION —
  * ~length× the intended cost and the dominant term in every text-dedup
  * job. Here the words child evaluates once; the shingle loop is plain
  * JVM.
  *
  * Semantics are the Column formulation's exactly (first-occurrence
  * dedup order, `concat_ws` null-skipping, the `< n words → one shingle
  * of everything` fallback), pinned by the OpsSpec parity test so the
  * DuckDB gate oracles that restate shingling in SQL keep matching. */
final case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with KernelCallCodegen {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_shingles requires array<string>, got ${other.simpleString}")
  }

  private val space = UTF8String.fromString(" ")

  private def joinFrom(words: ArrayData, from: Int, len: Int): UTF8String = {
    // concat_ws semantics: null elements are skipped, not rendered
    val parts = new scala.collection.mutable.ArrayBuffer[UTF8String](len)
    var i = 0
    while (i < len) {
      if (!words.isNullAt(from + i)) parts += words.getUTF8String(from + i)
      i += 1
    }
    UTF8String.concatWs(space, parts.toSeq: _*)
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array[Any](joinFrom(words, 0, m)))
    val seen = new java.util.LinkedHashSet[UTF8String]((m - n + 1) * 2)
    var i = 0
    while (i <= m - n) {
      seen.add(joinFrom(words, i, n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Positional window-gram fingerprints of a tokenized word array: element
  * i is the 62-BIT portable hash of `concat_ws(" ", words[i..i+n-1])` —
  * `fp31(gram) + fp37(gram)·2^31`, the same two-polynomial combination
  * [[graft.ops.Dedup.portableShingleId62]] uses — computed WITHOUT
  * materializing the window string: both polynomials fold straight over
  * each word's code points with a space folded between non-null words
  * (concat_ws null-skipping). One JVM pass, O(len·n) code-point work,
  * zero per-window allocations.
  *
  * 62 bits, not 31: span dedup hashes EVERY window occurrence (not a
  * per-doc-distinct shingle set), so a corpus-scale run sees billions of
  * windows and a 31-bit id false-shares at birthday rates (measured:
  * ~3k false pairs at just 3.4M windows). At 62 bits the same corpus
  * expects ≪ 1 collision. Fewer than n words → empty array (a short doc
  * carries no window). Parity with the Column formulation is pinned in
  * OpsSpec so the DuckDB span oracles keep matching. */
final case class WordWindowIds(child: Expression, n: Int)
  extends UnaryExpression with KernelCallCodegen {

  require(n >= 1, "window size must be >= 1")

  private val M = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_word_window_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_window_ids requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      var a31 = 0L; var a37 = 0L
      var first = true
      var j = 0
      while (j < n) {
        if (!words.isNullAt(i + j)) {
          if (!first) {
            a31 = (a31 * 31L + 32L) % M
            a37 = (a37 * 37L + 32L) % M
          }
          val s = words.getUTF8String(i + j).toString
          var k = 0
          val len = s.length
          while (k < len) {
            val cp = s.codePointAt(k)
            a31 = (a31 * 31L + cp) % M
            a37 = (a37 * 37L + cp) % M
            k += Character.charCount(cp)
          }
          first = false
        }
        j += 1
      }
      out(i) = a31 + a37 * 2147483648L
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordWindowIds =
    copy(child = newChild)
}
