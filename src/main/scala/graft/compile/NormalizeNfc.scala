package graft.compile

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column (java.text.Normalizer —
  * the JDK's implementation of the Unicode standard's canonical
  * composition). Spark has no built-in normalizer; the standard fixes
  * the output exactly, which is what lets a DuckDB oracle
  * (`nfc_normalize`) restate it byte for byte. Fast path: pure-ASCII
  * strings (the overwhelming majority of web text) are returned
  * untouched without materializing a java.lang.String. */
final case class NormalizeNfc(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    // zero-copy ASCII probe: getBytes would clone the backing bytes for
    // off-heap/UnsafeRow-backed strings on every row
    val n = s.numBytes()
    var ascii = true
    var i = 0
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      val norm =
        if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) str
        else java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      if (norm eq str) s else UTF8String.fromString(norm)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}
