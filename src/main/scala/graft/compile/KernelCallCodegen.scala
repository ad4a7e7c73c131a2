package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._

/** Codegen bridge for single-input JVM-kernel expressions.
  *
  * The kernels in this package run imperative JVM passes (regex automata,
  * entropy decoders, hash loops) that no expression tree restates, so they
  * can't emit inline Java. The naive marker for that is `CodegenFallback` —
  * but a CodegenFallback expression anywhere in a projection ejects the
  * ENTIRE stage from whole-stage codegen: every sibling expression, the
  * scan loop, and the downstream aggregate all drop to interpreted
  * `eval()` with per-row virtual dispatch and boxing. On the validation
  * headline that costs the greedy-errors stage its fused scan while the
  * fastpath (pure built-ins) keeps it.
  *
  * This trait keeps the stage fused: `doGenCode` emits ONE boxed call to
  * [[evalBoxed]] on a plan-reference object (`references[i]`), so the
  * generated stage code stays a tight compiled loop — parquet columnar
  * reads, sibling expressions, and the aggregate all codegen as usual,
  * and the kernel costs exactly one virtual call per row (what
  * CodegenFallback pays per NODE of the expression tree).
  *
  * Contract: [[evalBoxed]] receives the child's Catalyst value (boxed
  * primitives, `UTF8String`, `InternalRow`, `ArrayData`), must accept
  * NULL (kernels validate/flag null inputs themselves), and must be
  * thread-safe — the JVM-wide kernel caches already share compiled
  * kernels across concurrent tasks.
  */
trait KernelCallCodegen extends UnaryExpression {

  /** The kernel body, from the already-evaluated child value. Default
    * keeps the UnaryExpression null contract (NULL in → NULL out via
    * [[nullSafeEval]]) so most kernels convert by mixin swap alone;
    * kernels that evaluate NULL inputs themselves override this. */
  def evalBoxed(v: Any): Any =
    if (v == null) null else nullSafeEval(v)

  override def eval(input: InternalRow): Any = evalBoxed(child.eval(input))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftKernel", this,
      "graft.compile.KernelCallCodegen")
    val c = child.genCode(ctx)
    val raw = ctx.freshName("graftKernelRaw")
    KernelCallCodegen.emit(this, ctx, ev, raw,
      code"""
        ${c.code}
        Object $raw = $ref.evalBoxed(${c.isNull} ? null : (Object) ${c.value});
      """)
  }
}

object KernelCallCodegen {
  /** Shared tail: unbox `raw` (the kernel's boxed result) into the
    * expression's Java type, wiring isNull per the declared nullability. */
  private[compile] def emit(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      ctx: CodegenContext, ev: ExprCode, raw: String,
      callCode: org.apache.spark.sql.catalyst.expressions.codegen.Block): ExprCode = {
    val javaType = CodeGenerator.javaType(e.dataType)
    val boxedType = CodeGenerator.boxedType(e.dataType)
    if (e.nullable) {
      ev.copy(code =
        code"""
          $callCode
          boolean ${ev.isNull} = $raw == null;
          $javaType ${ev.value} = ${ev.isNull}
            ? ${CodeGenerator.defaultValue(e.dataType)} : (($boxedType) $raw);
        """)
    } else {
      ev.copy(code =
        code"""
          $callCode
          $javaType ${ev.value} = (($boxedType) $raw);
        """,
        isNull = FalseLiteral)
    }
  }
}

/** [[KernelCallCodegen]] for two-input kernels (vector distance, dot).
  * Same bridge, two evaluated children. */
trait BinaryKernelCallCodegen extends BinaryExpression {

  /** The kernel body from the evaluated child values; default keeps the
    * BinaryExpression null contract (either NULL → NULL). */
  def evalBoxed2(l: Any, r: Any): Any =
    if (l == null || r == null) null else nullSafeEval(l, r)

  override def eval(input: InternalRow): Any =
    evalBoxed2(left.eval(input), right.eval(input))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftKernel", this,
      "graft.compile.BinaryKernelCallCodegen")
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val raw = ctx.freshName("graftKernelRaw")
    KernelCallCodegen.emit(this, ctx, ev, raw,
      code"""
        ${l.code}
        ${r.code}
        Object $raw = $ref.evalBoxed2(
          ${l.isNull} ? null : (Object) ${l.value},
          ${r.isNull} ? null : (Object) ${r.value});
      """)
  }
}
