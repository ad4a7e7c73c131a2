package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of an array of 64-bit hashes: bit b of the result is set
  * iff more than half the inputs have bit b set.
  *
  * Why custom: the Catalyst HOF formulation (a fold with a 64-wide
  * `zip_with` per element) evaluates interpreted and allocates a fresh
  * 64-slot array per element — ~n×64 boxed operations per row. This is a
  * plain JVM loop with one local counter array per row and zero
  * allocations per element. Interpreted eval (CodegenFallback) is fine:
  * the expensive part IS the inner loop, which is ordinary JIT-compiled
  * Java here.
  */
final case class SimHash64(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val data = input.asInstanceOf[ArrayData]
    val n = data.numElements()
    val counts = new Array[Int](64)
    var i = 0
    var nonNull = 0
    while (i < n) {
      if (!data.isNullAt(i)) {
        nonNull += 1
        val h = data.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > nonNull) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
