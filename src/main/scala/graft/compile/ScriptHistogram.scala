package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document Unicode SCRIPT histogram in one code-point pass — the
  * multilingual curation signal (mixed-script spam detection, routing
  * by writing system, cross-checking the n-gram language ID): total
  * code points, letter code points (category L, the `\p{L}` class), and
  * the code-point count of each of the eleven major scripts (script
  * membership counts ALL code points of the script, letters or not —
  * Arabic-Indic digits and combining marks belong to their script —
  * matching the regex `\p{Script}` classes an oracle restates).
  *
  * Why custom (the [[CharEntropy]] reasoning): the Column form is
  * eleven+ regexp_replace passes over the text; here it is one walk
  * with a JDK `Character.UnicodeScript` lookup per code point.
  */
final case class ScriptHistogram(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = ScriptHistogram.outType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_script_histogram"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_script_histogram requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    import java.lang.Character.UnicodeScript
    val s = input.asInstanceOf[UTF8String].toString
    var nCp = 0L
    var nLetters = 0L
    val counts = new Array[Long](ScriptHistogram.scripts.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nCp += 1
      if (Character.isLetter(cp)) nLetters += 1
      val sc = UnicodeScript.of(cp)
      val idx = ScriptHistogram.scriptIndex.getOrElse(sc, -1)
      if (idx >= 0) counts(idx) += 1
      i += Character.charCount(cp)
    }
    InternalRow.fromSeq(nCp +: nLetters +: counts.toSeq)
  }

  override protected def withNewChildInternal(newChild: Expression): ScriptHistogram =
    copy(child = newChild)
}

object ScriptHistogram {
  /** (field name, JDK script, RE2/Java regex script name) — sorted by
    * field name so the dominant-script tie-break ("smallest name wins")
    * is positional. */
  val scripts: Seq[(String, java.lang.Character.UnicodeScript, String)] = {
    import java.lang.Character.UnicodeScript._
    Seq(
      ("arabic", ARABIC, "Arabic"),
      ("cyrillic", CYRILLIC, "Cyrillic"),
      ("devanagari", DEVANAGARI, "Devanagari"),
      ("greek", GREEK, "Greek"),
      ("han", HAN, "Han"),
      ("hangul", HANGUL, "Hangul"),
      ("hebrew", HEBREW, "Hebrew"),
      ("hiragana", HIRAGANA, "Hiragana"),
      ("katakana", KATAKANA, "Katakana"),
      ("latin", LATIN, "Latin"),
      ("thai", THAI, "Thai"))
  }

  private val scriptIndex: Map[java.lang.Character.UnicodeScript, Int] =
    scripts.zipWithIndex.map { case ((_, sc, _), i) => sc -> i }.toMap

  val outType: StructType = StructType(
    StructField("n_cp", LongType, nullable = false) +:
    StructField("n_letters", LongType, nullable = false) +:
    scripts.map { case (name, _, _) =>
      StructField(name, LongType, nullable = false) })
}
