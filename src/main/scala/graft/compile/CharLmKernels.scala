package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kernels behind [[graft.ops.CharLm]] — the corpus-trained character
  * bigram language model (the CCNet-style "perplexity filter" shape:
  * train a cheap LM on the corpus, score each document's surprisal,
  * filter or bucket on the score).
  *
  * All three are one-JVM-pass code-point walks; the model rides as
  * constructor parameters (plan literals, the [[NearestCells]]
  * precedent), so scoring is a pure narrow projection — zero joins,
  * zero shuffle, scan speed at any corpus size.
  */
object CharLmKernels {
  /** Out-of-alphabet code points map to this sentinel symbol (one past
    * the Unicode range, still inside the 21-bit bigram-key field). */
  val Unk: Int = 0x110000

  /** Pack a mapped bigram into one long: 21 bits per symbol. */
  @inline def key(c1: Int, c2: Int): Long = (c1.toLong << 21) | c2.toLong

  /** Map a code point through a SORTED alphabet (binary search). */
  @inline def mapCp(alpha: Array[Int], cp: Int): Int =
    if (java.util.Arrays.binarySearch(alpha, cp) >= 0) cp else Unk

  val scoreType: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("logsum", DoubleType, nullable = false)))
}

/** Per-document code-point histogram as map<int,int> — the bounded
  * per-doc form of "count every character": exploding the map yields
  * DISTINCT code points per doc (≤ alphabet size), not one row per
  * character, before the corpus-level partial aggregation. */
final case class CodePointHistogram(child: Expression)
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType =
    MapType(IntegerType, IntegerType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_codepoint_histogram"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_codepoint_histogram requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.HashMap[Int, Int]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      i += Character.charCount(cp)
    }
    val n = counts.size()
    val ks = new Array[Any](n)
    val vs = new Array[Any](n)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      ks(j) = e.getKey
      vs(j) = e.getValue
      j += 1
    }
    ArrayBasedMapData(ks, vs)
  }

  override protected def withNewChildInternal(newChild: Expression): CodePointHistogram =
    copy(child = newChild)
}

/** Per-document ALPHABET-MAPPED bigram histogram as map<long,int>:
  * code points outside the (sorted) alphabet collapse to the UNK
  * symbol, adjacent mapped pairs pack into 21-bit-per-symbol long keys.
  * Fewer than two code points → empty map (no bigrams). */
final case class MappedBigrams(child: Expression, alphabet: Seq[Int])
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType =
    MapType(LongType, IntegerType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mapped_bigrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mapped_bigrams requires string, got ${other.simpleString}")
  }

  @transient private lazy val alpha: Array[Int] = {
    val a = alphabet.toArray
    java.util.Arrays.sort(a)
    a
  }

  override def nullSafeEval(input: Any): Any = {
    import CharLmKernels._
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.HashMap[Long, Int]()
    var i = 0
    var prev = -1
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cur = mapCp(alpha, cp)
      if (prev >= 0) counts.merge(key(prev, cur), 1, (a, b) => a + b)
      prev = cur
      i += Character.charCount(cp)
    }
    val n = counts.size()
    val ks = new Array[Any](n)
    val vs = new Array[Any](n)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      ks(j) = e.getKey
      vs(j) = e.getValue
      j += 1
    }
    ArrayBasedMapData(ks, vs)
  }

  override protected def withNewChildInternal(newChild: Expression): MappedBigrams =
    copy(child = newChild)
}

/** Document surprisal under a trained bigram model in one pass:
  * Σ log2 P(c_i | c_{i-1}) with add-one smoothing, terms accumulated in
  * POSITION order (the determinism contract that lets a SQL oracle
  * restate the identical double fold via `list(t ORDER BY i)`; same
  * technique as [[CharEntropy]]'s code-point-ordered fold). Unseen
  * bigram → count 0; unseen context → context count 0 — both still get
  * the smoothed P = (0+1)/(ctx+V). Returns (n_bigrams, logsum);
  * fewer than two code points → (0, 0.0). */
final case class CharLmScore(
    child: Expression,
    alphabet: Seq[Int],
    bigramKeys: Seq[Long],
    bigramCounts: Seq[Long],
    ctxKeys: Seq[Int],
    ctxCounts: Seq[Long])
  extends UnaryExpression with KernelCallCodegen {

  override def dataType: DataType = CharLmKernels.scoreType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_lm_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_lm_score requires string, got ${other.simpleString}")
  }

  @transient private lazy val alpha: Array[Int] = {
    val a = alphabet.toArray
    java.util.Arrays.sort(a)
    a
  }
  @transient private lazy val bk: Array[Long] = bigramKeys.toArray
  @transient private lazy val bc: Array[Long] = bigramCounts.toArray
  @transient private lazy val ck: Array[Int] = ctxKeys.toArray
  @transient private lazy val cc: Array[Long] = ctxCounts.toArray

  private val Ln2 = math.log(2.0)

  override def nullSafeEval(input: Any): Any = {
    import CharLmKernels._
    val s = input.asInstanceOf[UTF8String].toString
    val v = alpha.length + 1
    var sum = 0.0
    var n = 0L
    var i = 0
    var prev = -1
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cur = mapCp(alpha, cp)
      if (prev >= 0) {
        val k = key(prev, cur)
        val bi = java.util.Arrays.binarySearch(bk, k)
        val cnt = if (bi >= 0) bc(bi) else 0L
        val ci = java.util.Arrays.binarySearch(ck, prev)
        val ctx = if (ci >= 0) cc(ci) else 0L
        sum += math.log((cnt + 1).toDouble / (ctx + v).toDouble) / Ln2
        n += 1
      }
      prev = cur
      i += Character.charCount(cp)
    }
    InternalRow(n, sum)
  }

  override protected def withNewChildInternal(newChild: Expression): CharLmScore =
    copy(child = newChild)
}
