package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.compile.{HashedFeatures, NbScore}

/** Hashed Naive-Bayes document classifier — the published
  * model-based-quality-filter stage of web-corpus curation (GPT-3 /
  * CCNet shape: train a cheap classifier to separate a REFERENCE corpus
  * — wiki/books/high-quality pages — from the raw crawl, score every
  * crawled document's log-likelihood ratio, then keep by threshold or
  * importance-sample on the score). Features are fastText's: word
  * unigrams + adjacent-word bigrams over the shared
  * [[TextAnalysis.words]] tokenization, hashed into a fixed bucket
  * space by the portable [[TextAnalysis.fingerprint]] polynomial.
  *
  * Scale shape:
  *  - `train` is ONE bounded aggregation: the per-doc
  *    [[graft.compile.HashedFeatures]] histogram explodes to distinct
  *    buckets per doc (≤ `buckets`, not one row per token), partial
  *    combine compresses the shuffle to ≤ `buckets` rows per task, and
  *    the collect is model-sized (≤ `buckets` rows), never corpus-sized.
  *  - `score` is a pure narrow projection: the sparse model rides as
  *    plan literals inside the one-pass [[graft.compile.NbScore]]
  *    kernel (binary-searched sorted arrays), so scoring 100 TB is scan
  *    speed with zero joins and zero shuffle.
  *
  * Determinism contract: per-document LLR terms accumulate in a fixed
  * order (unigrams by position, then bigrams by position), each term
  * the identical `log2(smoothed pos) − log2(smoothed neg)` expression —
  * restatable exactly by a SQL oracle (the [[CharLm]] technique).
  */
object QualityClassifier {

  /** A trained two-class model: sorted sparse bucket keys with
    * co-sorted per-class occurrence counts, per-class totals, and
    * per-class document counts (for the prior). Smoothed likelihood:
    * P(b|c) = (cnt_c[b]+1)/(total_c+buckets). */
  final case class Model(
      buckets: Int,
      mult: Long,
      posDocs: Long,
      negDocs: Long,
      posTotal: Long,
      negTotal: Long,
      bucketKeys: Array[Int],
      posCounts: Array[Long],
      negCounts: Array[Long]) {
    require(buckets >= 2, "nb model: buckets must be >= 2")
    require(bucketKeys.length == posCounts.length &&
      bucketKeys.length == negCounts.length, "nb model arrays must pair up")

    /** Class-prior log-odds, log2((posDocs+1)/(negDocs+1)) — add to a
      * document's `llrsum` for a full posterior log-odds; kept out of
      * the per-document score so thresholds stay prior-free. */
    def priorLogOdds: Double =
      math.log((posDocs + 1).toDouble / (negDocs + 1).toDouble) / math.log(2.0)

    /** Versioned blob (magic+version first — the FreqSketch lesson):
      * persist beside a corpus, score tomorrow's ingest against today's
      * reference model without retraining. */
    def serialize: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(Model.Magic)
      out.writeByte(Model.Version)
      out.writeInt(buckets); out.writeLong(mult)
      out.writeLong(posDocs); out.writeLong(negDocs)
      out.writeLong(posTotal); out.writeLong(negTotal)
      out.writeInt(bucketKeys.length)
      bucketKeys.foreach(out.writeInt)
      posCounts.foreach(out.writeLong)
      negCounts.foreach(out.writeLong)
      out.flush()
      bos.toByteArray
    }
  }

  object Model {
    private[ops] val Magic = 0x474e4231 // "GNB1"
    private[ops] val Version = 1

    def deserialize(blob: Array[Byte]): Model = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(blob))
      try {
        require(in.readInt() == Magic, "nb blob: bad magic")
        require(in.readByte() == Version, "nb blob: unsupported version")
        val buckets = in.readInt(); val mult = in.readLong()
        val pd = in.readLong(); val nd = in.readLong()
        val pt = in.readLong(); val nt = in.readLong()
        val n = in.readInt()
        require(n >= 0 && n.toLong * 4 <= blob.length,
          s"nb blob: implausible key length $n for ${blob.length} bytes")
        val bk = Array.fill(n)(in.readInt())
        val pc = Array.fill(n)(in.readLong())
        val nc = Array.fill(n)(in.readLong())
        Model(buckets, mult, pd, nd, pt, nt, bk, pc, nc)
      } catch {
        case e: java.io.EOFException =>
          throw new IllegalArgumentException("nb blob: truncated", e)
      }
    }
  }

  private def hashedFeatures(text: Column, buckets: Int, mult: Long): Column =
    ColumnBridge.column(HashedFeatures(
      ColumnBridge.expression(TextAnalysis.words(text)), buckets, mult))

  /** The one-pass scoring kernel as a raw (n_features, llrsum) struct
    * Column — building block for [[score]] and custom thresholds. */
  def nbScoreRaw(text: Column, model: Model): Column =
    ColumnBridge.column(NbScore(
      ColumnBridge.expression(TextAnalysis.words(text)),
      model.buckets, model.mult, model.bucketKeys.toSeq,
      model.posCounts.toSeq, model.negCounts.toSeq,
      model.posTotal, model.negTotal))

  /** Train on a labeled corpus: `labelCol` TRUE rows are the positive
    * (reference) class. Occurrence counts are exact longs; NULL texts
    * contribute no features but still count toward the document prior
    * of their class; NULL labels are dropped. */
  def train(df: DataFrame, textCol: String, labelCol: Column,
            buckets: Int = 4096, mult: Long = 31L): Model = {
    require(buckets >= 2, "nb train: buckets must be >= 2")
    val labeled = df.where(labelCol.isNotNull)
      .select(labelCol.cast("boolean").as("_y"), col(textCol).as("_t"))
    val docs = labeled.groupBy("_y").count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val cells = labeled
      .select(col("_y"), explode(hashedFeatures(col("_t"), buckets, mult))
        .as(Seq("b", "k")))
      .groupBy("b").agg(
        sum(when(col("_y"), col("k")).otherwise(lit(0))).as("pos"),
        sum(when(!col("_y"), col("k")).otherwise(lit(0))).as("neg"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    Model(buckets, mult,
      posDocs = docs.getOrElse(true, 0L), negDocs = docs.getOrElse(false, 0L),
      posTotal = cells.map(_._2).sum, negTotal = cells.map(_._3).sum,
      bucketKeys = cells.map(_._1), posCounts = cells.map(_._2),
      negCounts = cells.map(_._3))
  }

  /** Score every document: adds `n_features` (long) and `nb_score`
    * (mean log-likelihood ratio per feature in bits, rounded to 6;
    * positive = reference-like). Documents with no words (or NULL
    * text) score (0, 0.0). */
  def score(df: DataFrame, textCol: String, model: Model): DataFrame =
    df.withColumn("_nb", nbScoreRaw(col(textCol), model))
      .withColumn("n_features", coalesce(col("_nb.n_features"), lit(0L)))
      .withColumn("nb_score",
        when(col("n_features") > 0,
          Rounding.roundAt(col("_nb.llrsum") / col("n_features"), 6))
          .otherwise(lit(0.0)))
      .drop("_nb")
}
