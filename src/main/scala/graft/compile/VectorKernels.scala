package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Vector kernels for the similarity operators: one JVM loop per row in
  * place of interpreted `aggregate`/`zip_with` folds (HOF lambdas are
  * CodegenFallback and allocate boxed pairs per element — for the LSH
  * bucketing that was 32 folds × 64 elements per row).
  *
  * Arithmetic is the EXACT left-fold the Column formulations perform
  * (`0.0 + x₀·w₀ + x₁·w₁ + …`, double precision), so results are
  * bit-identical and the DuckDB gate oracles (which restate the same
  * fold) keep matching.
  */
private[graft] object VectorKernels {
  def elemGetter(dt: DataType): Either[String, (ArrayData, Int) => Double] = dt match {
    case ArrayType(FloatType, _)  => Right((a, i) => a.getFloat(i).toDouble)
    case ArrayType(DoubleType, _) => Right((a, i) => a.getDouble(i))
    case other => Left(s"requires array<float|double>, got ${other.simpleString}")
  }
}

/** cosine(a, b) = (Σ aᵢbᵢ) / (√Σ aᵢ² · √Σ bᵢ²). NULL when either side is
  * NULL, lengths differ, any element is NULL, or either norm is zero —
  * the null algebra of the `zip_with`+`aggregate` formulation it replaces
  * for defined inputs; on a zero-norm vector the Column formulation's
  * Divide would THROW under ANSI mode (return NULL otherwise), so the
  * kernel picks the well-defined NULL ("similarity undefined") for both
  * session modes. */
final case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression with BinaryKernelCallCodegen {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (VectorKernels.elemGetter(left.dataType), VectorKernels.elemGetter(right.dataType)) match {
      case (Right(_), Right(_)) => TypeCheckResult.TypeCheckSuccess
      case (Left(m), _) => TypeCheckResult.TypeCheckFailure(s"graft_cosine left $m")
      case (_, Left(m)) => TypeCheckResult.TypeCheckFailure(s"graft_cosine right $m")
    }

  @transient private lazy val getL = VectorKernels.elemGetter(left.dataType).toOption.get
  @transient private lazy val getR = VectorKernels.elemGetter(right.dataType).toOption.get

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = getL(a, i); val y = getR(b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Multi-table hyperplane LSH buckets: element t of the result is the
  * sign-bit pattern of table t's `planes` projections. A projection whose
  * fold would be NULL in the Column formulation (length mismatch, null
  * element) contributes a 0 bit — same `when(proj >= 0, …).otherwise(0)`
  * algebra. `planesFlat` is row-major `[table][plane][dim]`. */
final case class HyperplaneBuckets(
    child: Expression,
    planesFlat: Seq[Double],
    tables: Int,
    planes: Int,
    dim: Int)
  extends UnaryExpression with KernelCallCodegen {

  require(planesFlat.length == tables * planes * dim, "plane matrix shape mismatch")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.elemGetter(child.dataType) match {
      case Right(_) => TypeCheckResult.TypeCheckSuccess
      case Left(m)  => TypeCheckResult.TypeCheckFailure(s"graft_lsh_buckets $m")
    }

  @transient private lazy val get = VectorKernels.elemGetter(child.dataType).toOption.get
  @transient private lazy val w: Array[Double] = planesFlat.toArray

  // a NULL vector buckets to all-zeros like the Column formulation
  // (`when(NULL >= 0, …).otherwise(0)` per bit), NOT to NULL — override
  // evalBoxed, no nullSafeEval
  override def evalBoxed(raw: Any): Any = {
    if (raw == null) return new GenericArrayData(new Array[Long](tables))
    val v = raw.asInstanceOf[ArrayData]
    val out = new Array[Long](tables)
    // a length-mismatched or null-carrying vector nulls every projection
    // in the Column formulation (zip_with pads with NULL) → all bits 0
    var degenerate = v.numElements() != dim
    val x = new Array[Double](dim)
    if (!degenerate) {
      // copy once into a local buffer: the projection loop reads each
      // element tables×planes times
      var i = 0
      while (i < dim && !degenerate) {
        if (v.isNullAt(i)) degenerate = true else x(i) = get(v, i)
        i += 1
      }
    }
    if (!degenerate) {
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var p = 0
        while (p < planes) {
          val base = (t * planes + p) * dim
          var proj = 0.0
          var j = 0
          while (j < dim) { proj += x(j) * w(base + j); j += 1 }
          if (proj >= 0) bucket |= (1L << p)
          p += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

/** Indices of the `nprobe` nearest centroids by squared L2 distance,
  * ascending, ties broken toward the LOWER index — the IVF coarse
  * quantizer. `centroidsFlat` is row-major `[k][dim]`. Distances are the
  * exact sequential fold `0.0 + (x₀-c₀)² + (x₁-c₁)² + …` in double, so a
  * SQL oracle restating the same fold (DuckDB `list_reduce`) computes
  * bit-identical distances and the same argmin. A degenerate vector
  * (NULL, length mismatch, null element) gets all-equal distances →
  * cells `[0, 1, …, nprobe-1]`. */
final case class NearestCells(
    child: Expression,
    centroidsFlat: Seq[Double],
    k: Int,
    dim: Int,
    nprobe: Int)
  extends UnaryExpression with KernelCallCodegen {

  require(centroidsFlat.length == k * dim, "centroid matrix shape mismatch")
  require(nprobe >= 1 && nprobe <= k, "nprobe out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_nearest_cells"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.elemGetter(child.dataType) match {
      case Right(_) => TypeCheckResult.TypeCheckSuccess
      case Left(m)  => TypeCheckResult.TypeCheckFailure(s"graft_nearest_cells $m")
    }

  @transient private lazy val get = VectorKernels.elemGetter(child.dataType).toOption.get
  @transient private lazy val c: Array[Double] = centroidsFlat.toArray

  override def evalBoxed(raw: Any): Any = {
    val dists = new Array[Double](k)
    var degenerate = raw == null
    if (!degenerate) {
      val v = raw.asInstanceOf[ArrayData]
      degenerate = v.numElements() != dim
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim && !degenerate) {
        if (v.isNullAt(i)) degenerate = true else x(i) = get(v, i)
        i += 1
      }
      if (!degenerate) {
        var j = 0
        while (j < k) {
          val base = j * dim
          var d = 0.0
          var i2 = 0
          while (i2 < dim) { val t = x(i2) - c(base + i2); d += t * t; i2 += 1 }
          dists(j) = d
          j += 1
        }
      }
    }
    // partial selection sort: nprobe smallest, strict < keeps the lowest
    // index on ties (and yields [0, 1, …] for all-equal degenerate dists)
    val out = new Array[Long](nprobe)
    val used = new Array[Boolean](k)
    var p = 0
    while (p < nprobe) {
      var best = -1
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        if (!used(j) && dists(j) < bestD) { bestD = dists(j); best = j }
        j += 1
      }
      // all remaining distances == Double.MaxValue: take the lowest index
      if (best < 0) { best = 0; while (used(best)) best += 1 }
      used(best) = true
      out(p) = best.toLong
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** Integer dot product of two int8-quantized vectors: Σ aᵢ·bᵢ as LONG.
  * Exact integer arithmetic (|qᵢ| ≤ 127, so any realistic dimension is
  * orders of magnitude inside LONG range) — the point of the quantized
  * ANN path: the candidate scan reads 1/4 the bytes of the float corpus
  * and ranks with exact integer math that both engines reproduce
  * bit-for-bit (no float summation order to disagree on). NULL on NULL
  * input, length mismatch, or NULL element — the `zip_with`+`aggregate`
  * null algebra of the Column formulation it replaces. */
final case class QuantizedDot(left: Expression, right: Expression)
  extends BinaryExpression with BinaryKernelCallCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_q"

  private def getter(dt: DataType): Either[String, (ArrayData, Int) => Long] = dt match {
    case ArrayType(ByteType, _)    => Right((a, i) => a.getByte(i).toLong)
    case ArrayType(ShortType, _)   => Right((a, i) => a.getShort(i).toLong)
    case ArrayType(IntegerType, _) => Right((a, i) => a.getInt(i).toLong)
    case ArrayType(LongType, _)    => Right((a, i) => a.getLong(i))
    case other => Left(s"requires array<byte|short|int|long>, got ${other.simpleString}")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (getter(left.dataType), getter(right.dataType)) match {
      case (Right(_), Right(_)) => TypeCheckResult.TypeCheckSuccess
      case (Left(m), _) => TypeCheckResult.TypeCheckFailure(s"graft_dot_q left $m")
      case (_, Left(m)) => TypeCheckResult.TypeCheckFailure(s"graft_dot_q right $m")
    }

  @transient private lazy val getL = getter(left.dataType).toOption.get
  @transient private lazy val getR = getter(right.dataType).toOption.get

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += getL(a, i) * getR(b, i)
      i += 1
    }
    dot
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

/** Dense matrix-vector product in one pass: the k raw dot products of a
  * dim-length vector against a k × dim literal matrix (row-major flat)
  * — the projection step of the seeded-hyperplane Johnson-Lindenstrauss
  * reduction ([[graft.ops.Similarity.randomProject]]). Each output j is
  * the EXACT sequential fold `0.0 + x₀·m_{j,0} + x₁·m_{j,1} + …`, so a
  * SQL oracle restating the same positional fold matches bit-for-bit.
  * NULL on NULL input, length mismatch, or NULL element. */
final case class MatVec(
    child: Expression,
    matrixFlat: Seq[Double],
    k: Int,
    dim: Int)
  extends UnaryExpression with KernelCallCodegen {

  require(matrixFlat.length == k * dim, "projection matrix shape mismatch")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_matvec"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.elemGetter(child.dataType) match {
      case Right(_) => TypeCheckResult.TypeCheckSuccess
      case Left(m)  => TypeCheckResult.TypeCheckFailure(s"graft_matvec $m")
    }

  @transient private lazy val get = VectorKernels.elemGetter(child.dataType).toOption.get
  @transient private lazy val m: Array[Double] = matrixFlat.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      x(i) = get(v, i)
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      val base = j * dim
      var s = 0.0
      var i2 = 0
      while (i2 < dim) { s += x(i2) * m(base + i2); i2 += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)
}

/** Nearest-centroid assignment PLUS cosine to the winning centroid in
  * one pass — the per-row signal behind prototypicality sampling
  * ([[graft.ops.Similarity.prototypeSample]]): struct(cell, cos) where
  * `cell` is the L2-argmin index (the [[NearestCells]] fold and
  * tie-break: strict <, lower index wins) and `cos` is the exact
  * [[CosineSim]] fold against that centroid (NULL when either norm is
  * zero). Degenerate input (NULL vector, wrong length, NULL element) →
  * NULL struct. */
final case class NearestCellSim(
    child: Expression,
    centroidsFlat: Seq[Double],
    k: Int,
    dim: Int)
  extends UnaryExpression with KernelCallCodegen {

  require(centroidsFlat.length == k * dim, "centroid matrix shape mismatch")

  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_cell_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.elemGetter(child.dataType) match {
      case Right(_) => TypeCheckResult.TypeCheckSuccess
      case Left(m)  => TypeCheckResult.TypeCheckFailure(s"graft_nearest_cell_sim $m")
    }

  @transient private lazy val get = VectorKernels.elemGetter(child.dataType).toOption.get
  @transient private lazy val c: Array[Double] = centroidsFlat.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      x(i) = get(v, i)
      i += 1
    }
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < k) {
      val base = j * dim
      var d = 0.0
      var i2 = 0
      while (i2 < dim) { val t = x(i2) - c(base + i2); d += t * t; i2 += 1 }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    val base = best * dim
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i3 = 0
    while (i3 < dim) {
      val a = x(i3); val b = c(base + i3)
      dot += a * b; na += a * a; nb += b * b
      i3 += 1
    }
    val cos: Any =
      if (na == 0.0 || nb == 0.0) null
      else dot / (math.sqrt(na) * math.sqrt(nb))
    InternalRow(best.toLong, cos)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellSim =
    copy(child = newChild)
}
