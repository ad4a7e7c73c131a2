package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused single-pass validator for the hottest constraint shape: integer
  * array elements against numeric bounds — the Catalyst-codegen analog of
  * the reference's generated per-element for-loop
  * (/root/reference/lib/jsen.js:213-219 `items` generator).
  *
  * Why custom: Spark's higher-order functions (`transform`/`filter`/
  * `forall`) are CodegenFallback — each element evaluation goes through an
  * interpreted lambda with boxing, which dominates the hot loop at 10^12
  * rows. `array_min`/`array_max` are codegen'd but ignore NULL elements,
  * so they cannot express "a NULL element fails type:integer", and they
  * traverse the array once per bound. This expression does one pass, no
  * allocation, inside whole-stage codegen.
  *
  * Semantics (mirrors the compiled general path exactly):
  *  - NULL array → true (presence/type handled by the enclosing guards);
  *  - NULL element → false when `failOnNull` (schema declares a type that
  *    excludes null), else skipped (keywords gate on the number type);
  *  - bounds compared per element, inclusive unless exclusive flags.
  *
  * `forallSemantics = true` switches to SQL `forall(arr, lambda)`
  * three-valued logic instead (used by the [[graft.ext.FuseArrayBounds]]
  * optimizer rule): NULL array → NULL, any out-of-bounds element → false,
  * else NULL if any element was NULL, else true.
  */
final case class ArrayBoundsCheck(
    child: Expression,
    lo: Option[Long],
    hi: Option[Long],
    loExclusive: Boolean,
    hiExclusive: Boolean,
    failOnNull: Boolean,
    forallSemantics: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = forallSemantics

  // lazy: the child is unresolved (NullType) at construction time; the
  // element type is only known after analysis
  private lazy val elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType | LongType | ShortType | ByteType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ArrayBoundsCheck requires array<integral>, got ${other.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) return if (forallSemantics) null else true
    val data = arr.asInstanceOf[ArrayData]
    val n = data.numElements()
    var sawNull = false
    var i = 0
    while (i < n) {
      if (data.isNullAt(i)) {
        if (failOnNull) return false
        if (forallSemantics) sawNull = true
      } else {
        val v: Long = elementType match {
          case IntegerType => data.getInt(i).toLong
          case LongType => data.getLong(i)
          case ShortType => data.getShort(i).toLong
          case ByteType => data.getByte(i).toLong
        }
        if (lo.exists(l => if (loExclusive) v <= l else v < l)) return false
        if (hi.exists(h => if (hiExclusive) v >= h else v > h)) return false
      }
      i += 1
    }
    if (forallSemantics && sawNull) null else true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val data = ctx.freshName("arr")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val v = ctx.freshName("v")
    val sawNull = ctx.freshName("sawNull")
    val getter = elementType match {
      case IntegerType => s"(long) $data.getInt($i)"
      case LongType => s"$data.getLong($i)"
      case ShortType => s"(long) $data.getShort($i)"
      case ByteType => s"(long) $data.getByte($i)"
    }
    val nullCheck =
      if (failOnNull) s"if ($data.isNullAt($i)) { ${ev.value} = false; break; }"
      else if (forallSemantics) s"if ($data.isNullAt($i)) { $sawNull = true; $i++; continue; }"
      else s"if ($data.isNullAt($i)) { $i++; continue; }"
    val loCheck = lo.map { l =>
      val op = if (loExclusive) "<=" else "<"
      s"if ($v $op ${l}L) { ${ev.value} = false; $sawNull = false; break; }"
    }.getOrElse("")
    val hiCheck = hi.map { h =>
      val op = if (hiExclusive) ">=" else ">"
      s"if ($v $op ${h}L) { ${ev.value} = false; $sawNull = false; break; }"
    }.getOrElse("")

    if (!forallSemantics) {
      ev.copy(
        code = code"""
          ${childGen.code}
          boolean ${ev.value} = true;
          boolean $sawNull = false;
          if (!${childGen.isNull}) {
            org.apache.spark.sql.catalyst.util.ArrayData $data = ${childGen.value};
            int $n = $data.numElements();
            int $i = 0;
            while ($i < $n) {
              $nullCheck
              long $v = $getter;
              $loCheck
              $hiCheck
              $i++;
            }
          }
        """,
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    } else {
      // three-valued forall: NULL array → NULL; out-of-bounds → false;
      // else NULL if a NULL element was seen, else true
      ev.copy(
        code = code"""
          ${childGen.code}
          boolean ${ev.value} = true;
          boolean $sawNull = false;
          boolean ${ev.isNull} = ${childGen.isNull};
          if (!${childGen.isNull}) {
            org.apache.spark.sql.catalyst.util.ArrayData $data = ${childGen.value};
            int $n = $data.numElements();
            int $i = 0;
            while ($i < $n) {
              $nullCheck
              long $v = $getter;
              $loCheck
              $hiCheck
              $i++;
            }
            if ($sawNull) { ${ev.isNull} = true; }
          }
        """)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayBoundsCheck =
    copy(child = newChild)
}
