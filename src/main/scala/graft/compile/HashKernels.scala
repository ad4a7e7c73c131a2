package graft.compile

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of an array of shingle ids: slot k is
  * min over ids x of (a_k * x + b_k) mod (2^31 - 1), seeded with the prime
  * itself for the empty set.
  *
  * Why custom (same reasoning as [[SimHash64]]): the Catalyst HOF
  * formulation — an `aggregate` fold whose lambda is a k-wide `zip_with` —
  * evaluates interpreted and allocates a fresh k-slot boxed array per
  * element (~n×k boxed ops per row). This is one JIT-compiled JVM loop
  * with a single local long[k] per row.
  *
  * Inputs are 31-bit ids and a,b < 2^31, so a*x+b < 2^63 never overflows
  * a signed long and the plain `%` stays non-negative. The SMALL modulus
  * is load-bearing for minhash quality, not a space saving: a*x must
  * wrap mod p many times or the hash preserves the ids' magnitude order
  * and the k argmins degenerate to near-copies of one global argmin
  * (see [[graft.ops.Dedup.hashFamily]] for the measured failure).
  */
final case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long])
  extends UnaryExpression with KernelCallCodegen {

  require(a.length == b.length && a.nonEmpty, "coefficient arrays must match")
  private val P = 2147483647L // 2^31 - 1
  private val aArr = a.toArray
  private val bArr = b.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val data = input.asInstanceOf[ArrayData]
    val n = data.numElements()
    val k = aArr.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, P)
    var i = 0
    while (i < n) {
      if (!data.isNullAt(i)) {
        val x = data.getLong(i)
        var j = 0
        while (j < k) {
          val v = (x * aArr(j) + bArr(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Polynomial rolling-hash fingerprint over Unicode code points:
  * acc_{i+1} = (31 * acc_i + codepoint_i) mod (2^31 - 1).
  *
  * Why custom: the Column formulation (`split(text, "")` then an
  * interpreted `aggregate` fold) allocates a one-string-per-character
  * array per row — 2.95 s for 500 rows at sf0.1. This walks the string's
  * code points in one JVM loop with zero allocations.
  */
final case class Fingerprint32(child: Expression, mult: Long = 31L)
  extends UnaryExpression with KernelCallCodegen {

  private val M = 2147483647L // 2^31 - 1

  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint32"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fingerprint32 requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % M
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): Fingerprint32 =
    copy(child = newChild)
}
