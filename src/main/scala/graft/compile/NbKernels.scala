package graft.compile

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kernels behind [[graft.ops.QualityClassifier]] — the hashed
  * Naive-Bayes document classifier (the published "quality classifier"
  * curation shape: train a cheap model to separate a reference corpus
  * from the raw crawl, score every document, filter or
  * importance-sample on the score; GPT-3/CCNet-style, with fastText's
  * unigram+bigram hashed feature space).
  *
  * Both kernels take the SHARED tokenization ([[graft.ops.TextAnalysis
  * .words]]) as an array<string> child, so the feature space stays
  * bit-identical to the SQL-oracle restatement; features are word
  * unigrams plus adjacent-word bigrams (joined with one space), hashed
  * by the [[Fingerprint32]] polynomial (code points, mod 2^31-1) into
  * `buckets` cells. The model rides as constructor Seqs (plan literals,
  * the [[CharLmScore]] precedent): scoring is a pure narrow projection —
  * zero joins, zero shuffle, scan speed at any corpus size.
  */
object NbKernels {
  /** The [[Fingerprint32]] polynomial over a String's code points. */
  @inline def fp(s: String, mult: Long): Long = {
    val M = 2147483647L
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % M
      i += Character.charCount(cp)
    }
    acc
  }

  /** Feature bucket of word i (unigram) in a words array. */
  @inline def unigramBucket(words: Array[String], i: Int,
                            buckets: Int, mult: Long): Int =
    (fp(words(i), mult) % buckets).toInt

  /** Feature bucket of the (i, i+1) adjacent-word bigram. */
  @inline def bigramBucket(words: Array[String], i: Int,
                           buckets: Int, mult: Long): Int =
    (fp(words(i) + " " + words(i + 1), mult) % buckets).toInt

  @inline def toWords(a: ArrayData): Array[String] = {
    val n = a.numElements()
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      val u = a.getUTF8String(i)
      out(i) = if (u == null) "" else u.toString
      i += 1
    }
    out
  }

  val scoreType: StructType = StructType(Seq(
    StructField("n_features", LongType, nullable = false),
    StructField("llrsum", DoubleType, nullable = false)))

  val scoreMicroType: StructType = StructType(Seq(
    StructField("n_features", LongType, nullable = false),
    StructField("zmicro", LongType, nullable = false)))
}

/** Per-document hashed-feature histogram as map<int,int> (bucket →
  * occurrence count over unigrams + adjacent bigrams) — the bounded
  * per-doc form for the training census: exploding the map yields
  * DISTINCT buckets per doc (≤ `buckets`), not one row per token,
  * before the corpus-level partial aggregation. */
final case class HashedFeatures(child: Expression, buckets: Int, mult: Long)
  extends UnaryExpression with KernelCallCodegen {

  require(buckets >= 2, "nb: buckets must be >= 2")

  override def dataType: DataType =
    MapType(IntegerType, IntegerType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hashed_features"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hashed_features requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    import NbKernels._
    val ws = toWords(input.asInstanceOf[ArrayData])
    val counts = new java.util.HashMap[Int, Int]()
    var i = 0
    while (i < ws.length) {
      counts.merge(unigramBucket(ws, i, buckets, mult), 1, (a, b) => a + b)
      i += 1
    }
    i = 0
    while (i < ws.length - 1) {
      counts.merge(bigramBucket(ws, i, buckets, mult), 1, (a, b) => a + b)
      i += 1
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

  override protected def withNewChildInternal(newChild: Expression): HashedFeatures =
    copy(child = newChild)
}

/** Document log-likelihood ratio under a trained two-class hashed-NB
  * model in one pass: Σ [log2 P(f|pos) − log2 P(f|neg)] with add-one
  * smoothing over the `buckets`-cell event space, terms accumulated in
  * a FIXED order — all unigrams in position order, then all bigrams in
  * position order (the determinism contract a SQL oracle restates via
  * `list(t ORDER BY kind, i)`; the [[CharLmScore]] technique). Buckets
  * absent from the sparse model arrays count 0 on both sides (their
  * term is the constant smoothing offset). Returns (n_features,
  * llrsum); an empty words array → (0, 0.0). */
final case class NbScore(
    child: Expression,
    buckets: Int,
    mult: Long,
    bucketKeys: Seq[Int],
    posCounts: Seq[Long],
    negCounts: Seq[Long],
    posTotal: Long,
    negTotal: Long)
  extends UnaryExpression with KernelCallCodegen {

  require(buckets >= 2, "nb: buckets must be >= 2")

  override def dataType: DataType = NbKernels.scoreType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nb_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nb_score requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val bk: Array[Int] = bucketKeys.toArray
  @transient private lazy val pc: Array[Long] = posCounts.toArray
  @transient private lazy val nc: Array[Long] = negCounts.toArray

  private val Ln2 = math.log(2.0)

  @inline private def term(bucket: Int): Double = {
    val bi = java.util.Arrays.binarySearch(bk, bucket)
    val (p, n) = if (bi >= 0) (pc(bi), nc(bi)) else (0L, 0L)
    math.log((p + 1).toDouble / (posTotal + buckets).toDouble) / Ln2 -
      math.log((n + 1).toDouble / (negTotal + buckets).toDouble) / Ln2
  }

  override def nullSafeEval(input: Any): Any = {
    import NbKernels._
    val ws = toWords(input.asInstanceOf[ArrayData])
    var sum = 0.0
    var n = 0L
    var i = 0
    while (i < ws.length) {
      sum += term(unigramBucket(ws, i, buckets, mult)); n += 1; i += 1
    }
    i = 0
    while (i < ws.length - 1) {
      sum += term(bigramBucket(ws, i, buckets, mult)); n += 1; i += 1
    }
    InternalRow(n, sum)
  }

  override protected def withNewChildInternal(newChild: Expression): NbScore =
    copy(child = newChild)
}

/** Per-document LINEAR score over the DISTINCT hashed-feature set in
  * exact micro-units — the scoring pass of the hashed
  * logistic-regression classifier ([[graft.ops.LrClassifier]]).
  * Binary-presence features (each distinct bucket counted once, the
  * fastText/CCNet filtering shape), dense weights in integer 1e-6
  * units so the score is an ORDER-FREE integer sum — bit-identical
  * in any engine via a plain SUM, with no ordered-fold contract at
  * all (stronger than the [[NbScore]]/[[CharLmScore]] list-ORDER-BY
  * discipline). Returns (n_features = distinct buckets, zmicro =
  * biasMicro + Σ weightsMicro(b)); empty words → (0, biasMicro).
  *
  * The weights ride as plan literals: during training each gradient
  * step recompiles the projection with the updated weights (the
  * refineCentroids pattern); at scoring time the final model is one
  * narrow pass — zero joins, zero shuffle. */
final case class LinearScoreMicro(
    child: Expression,
    buckets: Int,
    mult: Long,
    weightsMicro: Seq[Long],
    biasMicro: Long)
  extends UnaryExpression with KernelCallCodegen {

  require(buckets >= 2, "lr: buckets must be >= 2")
  require(weightsMicro.length == buckets,
    s"lr: need one weight per bucket (${weightsMicro.length} != $buckets)")

  override def dataType: DataType = NbKernels.scoreMicroType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_linear_score_micro"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_linear_score_micro requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val w: Array[Long] = weightsMicro.toArray

  override def nullSafeEval(input: Any): Any = {
    import NbKernels._
    val ws = toWords(input.asInstanceOf[ArrayData])
    val seen = new java.util.HashSet[Integer]()
    var z = biasMicro
    var i = 0
    while (i < ws.length) {
      val b = unigramBucket(ws, i, buckets, mult)
      if (seen.add(b)) z += w(b)
      i += 1
    }
    i = 0
    while (i < ws.length - 1) {
      val b = bigramBucket(ws, i, buckets, mult)
      if (seen.add(b)) z += w(b)
      i += 1
    }
    InternalRow(seen.size().toLong, z)
  }

  override protected def withNewChildInternal(newChild: Expression): LinearScoreMicro =
    copy(child = newChild)
}
