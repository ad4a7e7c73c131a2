package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character/word census of a text column in ONE pass — the integer
  * inputs of [[graft.ops.TextAnalysis.qualityScore]] and
  * [[graft.ops.TextAnalysis.tokenCountBpe]], which as Column chains cost
  * three separate regex automaton scans plus a lambda HOF per row (the
  * HOF also ejects the stage from whole-stage codegen —
  * [[KernelCallCodegen]]). Fields, each pinned to the regex it replaces:
  *
  *  - `n_cp`      — `length(text)` (code points);
  *  - `n_letter`  — `length(regexp_replace(text, "[^\p{L}]", ""))`:
  *    code points of general category L*;
  *  - `n_ws`      — ASCII-whitespace code points (Java regex `\s`), so
  *    `length(regexp_replace(text, "\s+", "")) = n_cp - n_ws`;
  *  - `n_words`   — `size(filter(split(text, "[^\p{L}\p{N}]+"), _ <> ""))`:
  *    maximal runs of letter/number code points (also the element count
  *    of [[WordsKernel]] — replacement and lowercasing never change run
  *    structure);
  *  - `n_punct`   — `length(regexp_replace(text, "[\p{L}\p{N}\s]", ""))`:
  *    code points that are neither letter/number nor ASCII whitespace
  *    (`tokenCountBpe = n_words + n_punct`).
  */
final case class TextCounts(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("n_cp", IntegerType, nullable = false),
    StructField("n_letter", IntegerType, nullable = false),
    StructField("n_ws", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false)))
  override def prettyName: String = "graft_text_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_text_counts requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var cp = 0; var letters = 0; var ws = 0; var words = 0; var punct = 0
    var inRun = false
    var i = 0
    while (i < n) {
      val c = s.codePointAt(i)
      val w = Character.charCount(c)
      cp += 1
      val t = Character.getType(c)
      val isLetter = t == Character.UPPERCASE_LETTER ||
        t == Character.LOWERCASE_LETTER || t == Character.TITLECASE_LETTER ||
        t == Character.MODIFIER_LETTER || t == Character.OTHER_LETTER
      val isWord = isLetter || t == Character.DECIMAL_DIGIT_NUMBER ||
        t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
      if (isLetter) letters += 1
      if (isWord) {
        if (!inRun) { words += 1; inRun = true }
      } else {
        inRun = false
        if (w == 1 && WordsKernel.isAsciiSpace(s.charAt(i))) ws += 1
        else punct += 1
      }
      i += w
    }
    InternalRow(cp, letters, ws, words, punct)
  }

  override protected def withNewChildInternal(newChild: Expression): TextCounts =
    copy(child = newChild)
}

/** Per-language stopword hit-rates over a word array in one pass — the
  * kernel twin of [[graft.ops.TextAnalysis.stopwordRatioFromWords]] run
  * for every language (each of which is a lambda `filter` + `isin` over
  * the array, interpreted per element). Returns
  * `struct<ratio_0:double, …>` in the order of `langs`; each ratio is
  * `count(words ∈ inventory) / size(words)` as one int→double division
  * (exactly the Column arithmetic), 0.0 for empty word lists. NULL
  * elements never match (isin three-valued semantics → filter drops). */
final case class StopwordScores(child: Expression,
                                langs: Seq[String],
                                inventories: Seq[Seq[String]])
  extends UnaryExpression with KernelCallCodegen {

  require(langs.nonEmpty && langs.length == inventories.length,
    "graft_stopword_scores: one inventory per language")

  override def dataType: DataType = StructType(
    langs.map(l => StructField(l, DoubleType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_stopword_scores"

  // NULL word list → all-zero ratios, like the Column chain
  // (`when(size(NULL) > 0, …).otherwise(0.0)` takes the otherwise branch)
  override def evalBoxed(v: Any): Any =
    if (v == null) InternalRow(langs.map(_ => 0.0): _*) else nullSafeEval(v)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_stopword_scores requires array<string>, got ${t.simpleString}")
  }

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    inventories.map { inv =>
      val s = new java.util.HashSet[UTF8String](inv.length * 2)
      inv.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val k = sets.length
    val hits = new Array[Int](k)
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        val w = ws.getUTF8String(i)
        var j = 0
        while (j < k) {
          if (sets(j).contains(w)) hits(j) += 1
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      out(j) = if (n > 0) hits(j).toDouble / n.toDouble else 0.0
      j += 1
    }
    InternalRow(out: _*)
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordScores =
    copy(child = newChild)
}
