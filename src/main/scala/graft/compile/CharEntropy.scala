package graft.compile

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits/char) of a string's code-point distribution in
  * one JVM pass — the standard cheap gibberish/boilerplate signal for
  * web corpora: natural text sits around 4-5 bits, single-char spam near
  * 0, uniform random bytes near 8.
  *
  * Determinism contract (what makes the DuckDB oracle restatable): terms
  * -(k/N)·log2(k/N) are accumulated in ASCENDING CODE POINT order, so
  * the double sum is the same op sequence in both engines; the caller
  * rounds (graft.ops.Rounding) to absorb last-ulp log2 differences
  * between libm implementations. Empty string → 0.0.
  *
  * Why custom (same reasoning as [[NgramStats]]): the Column form needs
  * a per-distinct-character count — `transform(distinct, c ->
  * size(filter(chars, ..)))` re-evaluates the char array per distinct
  * char (O(doc²) interpreted subtree evals) and still can't order the
  * final sum. Here: one int-histogram pass + one sorted fold.
  */
final case class CharEntropy(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_entropy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_entropy requires string, got ${other.simpleString}")
  }

  private val Ln2 = math.log(2.0)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    if (len == 0) return 0.0
    // code-point histogram: TreeMap keeps keys sorted for the ordered fold
    val counts = new java.util.TreeMap[Integer, Int]()
    var i = 0
    var n = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var sum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      sum += p * (math.log(p) / Ln2)
    }
    // single-distinct-char docs: sum is -0.0; normalize so the gate's
    // value compare can never see a sign-of-zero difference vs the oracle
    if (sum == 0.0) 0.0 else -sum
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}
