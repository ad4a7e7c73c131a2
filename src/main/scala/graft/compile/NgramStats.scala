package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram frequency statistics in one JVM pass: total n-gram
  * occurrences, distinct n-grams, and the occurrence count of the most
  * frequent n-gram — the inputs to the standard repetition quality
  * signals for web corpora (duplicate-n-gram fraction, top-n-gram
  * fraction, à la the published Gopher/C4 filtering rules).
  *
  * Why custom (same reasoning as [[WordShingles]]): the Column
  * formulation needs the NON-distinct gram list plus a per-distinct-gram
  * occurrence count — `transform(distinct, g -> size(filter(grams, ..)))`
  * re-evaluates the whole `grams` subtree once per distinct gram in the
  * interpreted HOF evaluator (O(doc²) subtree evals). Here: one
  * HashMap pass over the gram positions.
  *
  * Fewer than n words → (0, 0, 0): short docs carry no repetition
  * signal (callers map total=0 to 0.0 fractions, not to "repetitive").
  */
final case class NgramStats(child: Expression, n: Int)
  extends UnaryExpression with KernelCallCodegen {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = NgramStats.outType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ngram_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngram_stats requires array<string>, got ${other.simpleString}")
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
    if (m < n) return InternalRow(0, 0, 0)
    val total = m - n + 1
    val counts = new java.util.HashMap[UTF8String, Int](total * 2)
    var top = 0
    var i = 0
    while (i < total) {
      val g = joinFrom(words, i, n)
      val c = counts.merge(g, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    InternalRow(total, counts.size, top)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramStats =
    copy(child = newChild)
}

object NgramStats {
  val outType: StructType = StructType(Seq(
    StructField("total_ngrams", IntegerType, nullable = false),
    StructField("distinct_ngrams", IntegerType, nullable = false),
    StructField("top_ngram_count", IntegerType, nullable = false)))
}
