package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper marked NON-DETERMINISTIC: an optimizer barrier for
  * expensive derived columns (the `asNondeterministic` discipline of the
  * optimization guide §4.4, for JVM expressions).
  *
  * Why it exists: the optimizer pushes filters below the projection that
  * defines the column they reference, duplicating the column's defining
  * expression into the pushed filter while the projection still computes
  * it for output — an expensive alias (a multi-regex redaction chain, a
  * text-census score) is then evaluated once per STACKED FILTER per row
  * instead of once per row. Marking the alias non-deterministic forbids
  * the optimizer from duplicating, inlining (CollapseProject), or
  * reordering across it, so the filter stays above the projection and
  * reads the materialized attribute.
  *
  * Runtime cost: none — eval and codegen delegate to the child
  * unchanged; only the `deterministic` flag differs. Use ONLY in
  * projections (the analyzer rejects non-deterministic expressions in
  * joins/aggregate functions), and only on columns whose evaluation is
  * expensive enough that blocking other pushdowns past them is the
  * right trade.
  */
final case class Opaque(child: Expression)
  extends UnaryExpression with Nondeterministic {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_opaque"

  override protected def initializeInternal(partitionIndex: Int): Unit = ()

  override protected def evalInternal(input: InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Opaque =
    copy(child = newChild)
}
