package graft.sketch

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bloom_agg(col, expectedItems, fpp)` — aggregates a string key column
  * into a serialized [[BloomSketch]] (BinaryType). Same partial/final
  * shape as [[KllSketchAgg]]: each task fills a local filter, the
  * shuffle carries one bit-array blob per task, reducers OR — so a
  * hundred-million-key dimension becomes one compact broadcastable blob
  * without the dimension's rows ever concentrating anywhere (one filter
  * tops out at 2^31 bits ≈ 150M keys at 1% fpp — [[BloomSketch.sized]]
  * refuses beyond that; shard the key space for more). */
final case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double = 0.001,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires string input (cast first), got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomSketch =
    BloomSketch.sized(expectedItems, fpp)

  override def update(buffer: BloomSketch, input: InternalRow): BloomSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].getBytes)
    buffer
  }

  override def merge(buffer: BloomSketch, other: BloomSketch): BloomSketch =
    buffer.merge(other)

  override def eval(buffer: BloomSketch): Any = buffer.serialize()
  override def serialize(buffer: BloomSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): BloomSketch =
    BloomSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `bloom_contains(blob, key)` — per-row membership probe. Unlike the
  * other sketch scalars this DOES run in the per-row hot path, so the
  * filter is deserialized ONCE per (foldable) blob — the broadcast-
  * literal usage pattern — not per row; a non-foldable blob column
  * falls back to per-row deserialization (documented as the wrong way
  * to use it). NULL key → NULL (three-valued, like IN). */
final case class BloomContains(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with graft.compile.BinaryKernelCallCodegen {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains requires (binary, string), got ${l.simpleString}, ${r.simpleString}")
    }

  @transient private lazy val foldedFilter: BloomSketch =
    if (left.foldable) {
      val b = left.eval(null)
      if (b == null) null else BloomSketch.deserialize(b.asInstanceOf[Array[Byte]])
    } else null

  override def nullSafeEval(blob: Any, key: Any): Any = {
    val f =
      if (foldedFilter != null) foldedFilter
      else BloomSketch.deserialize(blob.asInstanceOf[Array[Byte]])
    f.contains(key.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomFunctions {
  /** Aggregate a string key column into a serialized Bloom filter. */
  def bloom_agg(c: Column, expectedItems: Long, fpp: Double = 0.001): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(c), expectedItems, fpp)
        .toAggregateExpression())

  /** Membership probe against a filter blob (pass `lit(blobBytes)` so
    * the filter deserializes once, not per row). */
  def bloom_contains(blob: Column, key: Column): Column =
    ColumnBridge.column(BloomContains(
      ColumnBridge.expression(blob), ColumnBridge.expression(key)))
}
