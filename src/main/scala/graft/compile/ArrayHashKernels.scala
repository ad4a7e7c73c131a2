package graft.compile

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Element-wise shingle-id hashing of an `array<string>` in one JVM pass —
  * the kernel twin of `transform(shingles, s => shingleId(s))`, which as a
  * lambda HOF runs interpreted AND ejects its whole stage from whole-stage
  * codegen ([[KernelCallCodegen]]). Three published id families
  * ([[graft.ops.Dedup]]):
  *
  *  - `xx64`: `xxhash64(s) & 0x7FFFFFFF` when masked — computed by the
  *    SAME interpreter entry Spark's `xxhash64` uses
  *    ([[XxHash64Function]], seed 42), so ids are bit-identical; a NULL
  *    element hashes to the seed, like the expression;
  *  - `fp31`: the 31-bit portable polynomial ([[Fingerprint32]], mult 31);
  *    NULL elements stay NULL (the Column chain null-propagates);
  *  - `fp62`: `fp31 + fp37·2^31` — the portable 62-bit SimHash id.
  */
final case class HashElements(child: Expression, kind: String,
                              mask31: Boolean)
  extends UnaryExpression with KernelCallCodegen {

  require(HashElements.Kinds.contains(kind),
    s"graft_hash_elements: unknown kind '$kind'")

  override def dataType: DataType = ArrayType(LongType,
    containsNull = kind != "xx64" && childContainsNull)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_hash_elements"

  private def childContainsNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hash_elements requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) {
          if (kind == "xx64") {
            val h = 42L // xxhash64(NULL) = seed
            if (mask31) h & 0x7FFFFFFFL else h
          } else null // polynomial chains null-propagate
        } else {
          val s = arr.getUTF8String(i)
          val h = kind match {
            case "xx64" => XxHash64Function.hash(s, StringType, 42L)
            case "fp31" => HashElements.fp(s, 31L)
            case "fp62" => HashElements.fp(s, 31L) +
              HashElements.fp(s, 37L) * 2147483648L
          }
          if (mask31) h & 0x7FFFFFFFL else h
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HashElements =
    copy(child = newChild)
}

object HashElements {
  val Kinds: Set[String] = Set("xx64", "fp31", "fp62")

  /** [[Fingerprint32]]'s fold, shared: polynomial over code points mod
    * 2^31-1. */
  def fp(u: UTF8String, mult: Long): Long = {
    val s = u.toString
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Fused winnowing selection ([[graft.ops.Dedup.winnowFingerprints]]):
  * from a word array, compute the fp31 fingerprint of every positional
  * k-gram, slide the w-window rightmost-tie argmin over them, and return
  * the DISTINCT selections as `array<struct<h:long,p:int>>` — the exact
  * value of the Column chain
  * `array_distinct(transform(sequence(0, max(n-w,0)), j => aggregate(...)))`
  * it replaces (parity pinned in OpsSpec against
  * [[graft.ops.Dedup.winnowSelectColumns]]). Docs with no k-gram (n = 0)
  * return an empty array (the caller explodes, so they produce no rows).
  *
  * Why fused: the chain is O(n·k) interpreted lambda evaluations with a
  * sliced array + string concat PER GRAM plus an O(n·w) boxed fold — the
  * heaviest per-row cost in the dedup family (q_winnow / q_winnow_pairs).
  * Here each gram hash folds over code points with a space folded between
  * non-null words (concat_ws semantics), zero per-gram allocations, and
  * the argmin is a primitive loop.
  */
final case class WinnowSelect(child: Expression, k: Int, w: Int)
  extends UnaryExpression with KernelCallCodegen {

  require(k >= 1, "winnow: k must be >= 1")
  require(w >= 1, "winnow: w must be >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
                   StructField("p", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_winnow_select"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_select requires array<string>, got ${other.simpleString}")
  }

  // NULL words → empty selection, like the Column chain (size(NULL) is
  // NULL, greatest(NULL, 0) = 0 → the otherwise-empty branch)
  override def evalBoxed(v: Any): Any =
    if (v == null) WinnowSelect.Empty else nullSafeEval(v)

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val m = ws.numElements()
    val n = math.max(m - (k - 1), 0)
    if (n == 0) return new GenericArrayData(new Array[Any](0))

    // fp31 of concat_ws(" ", words[i..i+k-1]): fold each non-null word's
    // code points with ONE space folded between consecutive non-null
    // elements (concat_ws skips nulls entirely, keeps empties)
    val g = new Array[Long](n)
    var i = 0
    while (i < n) {
      var acc = 0L
      var first = true
      var j = 0
      while (j < k) {
        if (!ws.isNullAt(i + j)) {
          if (!first) acc = (acc * 31L + 32L) % 2147483647L // the ' '
          first = false
          val s = ws.getUTF8String(i + j).toString
          var c = 0
          val len = s.length
          while (c < len) {
            val cp = s.codePointAt(c)
            acc = (acc * 31L + cp) % 2147483647L
            c += Character.charCount(cp)
          }
        }
        j += 1
      }
      g(i) = acc
      i += 1
    }

    // rightmost-tie argmin per window j over grams [j, min(j+w, n)),
    // j in 0..max(n-w, 0); distinct selections in first-occurrence order
    val seen = new java.util.LinkedHashSet[Long]()
    val lastJ = math.max(n - w, 0)
    var jw = 0
    while (jw <= lastJ) {
      val end = math.min(jw + w, n)
      var bestH = Long.MaxValue
      var bestP = -1
      var p = jw
      while (p < end) {
        if (g(p) <= bestH) { bestH = g(p); bestP = p }
        p += 1
      }
      seen.add((bestH << 31) | bestP) // h < 2^31, p < 2^31: injective pack
      jw += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      val packed = it.next()
      out(o) = InternalRow(packed >>> 31, (packed & 0x7FFFFFFFL).toInt)
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {
  private val Empty = new GenericArrayData(new Array[Any](0))
}
