package graft.sketch

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `freq_sketch(col, capacity)` — aggregates a string column into a
  * serialized [[FreqSketch]] (BinaryType). Same partial/final shape as
  * [[KllSketchAgg]]: each task builds a local sketch, the shuffle carries
  * one bounded blob per group per task, reducers merge — the heavy-hitter
  * path when the exact term aggregation's key space is the problem. */
final case class FreqSketchAgg(
    child: Expression,
    capacity: Int = FreqSketch.DefaultCapacity,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch requires string input, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): FreqSketch = FreqSketch.empty(capacity)

  override def update(buffer: FreqSketch, input: InternalRow): FreqSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: FreqSketch, other: FreqSketch): FreqSketch =
    buffer.merge(other)

  override def eval(buffer: FreqSketch): Any = buffer.serialize()
  override def serialize(buffer: FreqSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): FreqSketch = FreqSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

/** `freq_topk(sketch, n)` — scalar over a sketch blob: the top-n entries
  * as array<struct<term, estimate, max_error>> in (estimate desc, term)
  * order. Runs on aggregated rows only (CodegenFallback is fine). */
final case class FreqTopK(child: Expression, n: Int)
  extends UnaryExpression with graft.compile.KernelCallCodegen {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("max_error", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "freq_topk"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_topk requires binary sketch, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val sk = FreqSketch.deserialize(input.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else new GenericArrayData(sk.topK(n).map { case (t, c, e) =>
      InternalRow(UTF8String.fromString(t), c, e)
    }.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): FreqTopK =
    copy(child = newChild)
}

/** `freq_chi2(observed, reference)` — scalar: the restricted chi² drift
  * statistic of an observed sketch blob against a reference profile blob
  * ([[graft.checks.FreqDriftCheck]]'s arithmetic), so windowed streaming
  * drift can run INSIDE the plan against a broadcast profile literal.
  * ORDER-SENSITIVE: the chi² cells are the REFERENCE's surviving terms —
  * swapped arguments silently yield a different statistic. Aggregated
  * rows only. */
final case class FreqChi2(
    left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with graft.compile.BinaryKernelCallCodegen {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "freq_chi2"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"freq_chi2 requires two binary sketches, got ${l.simpleString}, ${r.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    graft.checks.FreqDriftCheck.chiSquare(
      FreqSketch.deserialize(l.asInstanceOf[Array[Byte]]),
      FreqSketch.deserialize(r.asInstanceOf[Array[Byte]]))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqChi2 =
    copy(left = newLeft, right = newRight)
}

/** `freq_psi(observed, reference)` — scalar: the Population Stability
  * Index of an observed sketch blob against a reference profile blob
  * ([[graft.checks.PsiDriftCheck]]'s statistic over the reference's
  * categories + "other"). Same ORDER-SENSITIVE contract as
  * [[FreqChi2]]: cells come from the reference. Aggregated rows only. */
final case class FreqPsi(
    left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with graft.compile.BinaryKernelCallCodegen {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "freq_psi"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"freq_psi requires two binary sketches, got ${l.simpleString}, ${r.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    graft.checks.FreqDriftCheck.psi(
      FreqSketch.deserialize(l.asInstanceOf[Array[Byte]]),
      FreqSketch.deserialize(r.asInstanceOf[Array[Byte]]))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqPsi =
    copy(left = newLeft, right = newRight)
}

object FreqFunctions {
  /** Aggregate a string column into a serialized space-saving sketch. */
  def freq_sketch(c: Column, capacity: Int = FreqSketch.DefaultCapacity): Column =
    ColumnBridge.column(
      FreqSketchAgg(ColumnBridge.expression(c), capacity).toAggregateExpression())

  /** Top-n heavy hitters from a sketch blob. */
  def freq_topk(sketch: Column, n: Int): Column =
    ColumnBridge.column(FreqTopK(ColumnBridge.expression(sketch), n))

  /** Restricted chi² drift of `observed` against `reference` — the
    * argument order is SIGNIFICANT: the chi² cells are the reference
    * profile's surviving terms, the reference's totals set the expected
    * counts, and swapping the arguments yields a different statistic
    * (see [[graft.checks.FreqDriftCheck.chiSquare]]). Use
    * `lit(profileBytes)` for a persisted reference profile. */
  def freq_chi2(observed: Column, reference: Column): Column =
    ColumnBridge.column(FreqChi2(
      ColumnBridge.expression(observed), ColumnBridge.expression(reference)))

  /** PSI drift of `observed` against `reference` — same order-sensitive
    * contract as [[freq_chi2]] (cells come from the reference profile);
    * scale-free in both totals, so one threshold serves every window
    * size. Use `lit(profileBytes)` for a persisted reference profile. */
  def freq_psi(observed: Column, reference: Column): Column =
    ColumnBridge.column(FreqPsi(
      ColumnBridge.expression(observed), ColumnBridge.expression(reference)))
}
