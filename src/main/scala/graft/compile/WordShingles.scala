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
  extends UnaryExpression with CodegenFallback {

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
