package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.compile.{CharLmKernels, CharLmScore, CodePointHistogram, MappedBigrams}

/** Corpus-trained character bigram language model — the cheap,
  * dependency-free stand-in for the published perplexity-filter stage of
  * web-corpus curation (CCNet-style: train a small LM on the corpus,
  * score every document's surprisal under it, filter or bucket on the
  * score; documents far above the corpus's own entropy are gibberish /
  * binary junk, documents far below are boilerplate).
  *
  * Scale shape:
  *  - `train` is two bounded aggregations: a code-point census whose
  *    shuffle carries DISTINCT code points per partition, then a
  *    bigram census over the top-`maxAlphabet` alphabet (everything
  *    else collapses to UNK) whose cardinality is ≤ (maxAlphabet+1)² —
  *    the collect is model-sized (≤ ~66k rows at the default 256), not
  *    corpus-sized.
  *  - `score` is a pure narrow projection: the model rides as plan
  *    literals inside the one-pass [[graft.compile.CharLmScore]] kernel
  *    (binary-searched sorted arrays), so scoring 100 TB is scan speed
  *    with zero joins and zero shuffle.
  *
  * Determinism contract: alphabet selection ties break to the smaller
  * code point; the per-document log2 fold runs in position order — both
  * restatable exactly by a SQL oracle (the q_lexical technique).
  */
object CharLm {

  /** A trained model: sorted alphabet, co-sorted (bigramKey → count)
    * arrays, co-sorted (context symbol → count) arrays. Smoothed
    * conditional: P(c2|c1) = (cnt+1)/(ctx+V) with V = |alphabet|+1
    * (the UNK symbol is part of the event space). */
  final case class Model(
      alphabet: Array[Int],
      bigramKeys: Array[Long],
      bigramCounts: Array[Long],
      ctxKeys: Array[Int],
      ctxCounts: Array[Long]) {
    require(alphabet.nonEmpty, "charlm model needs a non-empty alphabet")
    require(bigramKeys.length == bigramCounts.length &&
      ctxKeys.length == ctxCounts.length, "charlm model arrays must pair up")

    def v: Int = alphabet.length + 1

    /** Versioned blob (magic+version first — the FreqSketch lesson):
      * persist beside a corpus, reload to score tomorrow's ingest
      * against today's model without retraining. */
    def serialize: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(Model.Magic)
      out.writeByte(Model.Version)
      out.writeInt(alphabet.length); alphabet.foreach(out.writeInt)
      out.writeInt(bigramKeys.length)
      bigramKeys.foreach(out.writeLong); bigramCounts.foreach(out.writeLong)
      out.writeInt(ctxKeys.length)
      ctxKeys.foreach(out.writeInt); ctxCounts.foreach(out.writeLong)
      out.flush()
      bos.toByteArray
    }
  }

  object Model {
    private[ops] val Magic = 0x474c4d31 // "GLM1"
    private[ops] val Version = 1

    def deserialize(blob: Array[Byte]): Model = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(blob))
      def bounded(n: Int, what: String): Int = {
        require(n >= 0 && n.toLong * 4 <= blob.length,
          s"charlm blob: implausible $what length $n for ${blob.length} bytes")
        n
      }
      try {
        require(in.readInt() == Magic, "charlm blob: bad magic")
        require(in.readByte() == Version, "charlm blob: unsupported version")
        val na = bounded(in.readInt(), "alphabet")
        val alpha = Array.fill(na)(in.readInt())
        val nb = bounded(in.readInt(), "bigram")
        val bk = Array.fill(nb)(in.readLong())
        val bc = Array.fill(nb)(in.readLong())
        val nc = bounded(in.readInt(), "context")
        val ck = Array.fill(nc)(in.readInt())
        val cc = Array.fill(nc)(in.readLong())
        Model(alpha, bk, bc, ck, cc)
      } catch {
        case e: java.io.EOFException =>
          throw new IllegalArgumentException("charlm blob: truncated", e)
      }
    }
  }

  private def codePointHistogram(text: Column): Column =
    ColumnBridge.column(CodePointHistogram(ColumnBridge.expression(text)))

  private def mappedBigrams(text: Column, alphabet: Array[Int]): Column =
    ColumnBridge.column(
      MappedBigrams(ColumnBridge.expression(text), alphabet.toSeq))

  /** The one-pass scoring kernel as a raw (n_bigrams, logsum) struct
    * Column — building block for [[score]] and custom thresholds. */
  def lmScoreRaw(text: Column, model: Model): Column =
    ColumnBridge.column(CharLmScore(ColumnBridge.expression(text),
      model.alphabet.toSeq, model.bigramKeys.toSeq, model.bigramCounts.toSeq,
      model.ctxKeys.toSeq, model.ctxCounts.toSeq))

  /** Train on a corpus: top-`maxAlphabet` code points by frequency
    * (ties → smaller code point) become the alphabet, the rest collapse
    * to UNK; bigram and context counts are exact longs. NULL texts are
    * skipped. */
  def train(df: DataFrame, textCol: String, maxAlphabet: Int = 256): Model = {
    require(maxAlphabet >= 1, "maxAlphabet must be >= 1")
    val alphabet = df
      .select(explode(codePointHistogram(col(textCol))).as(Seq("cp", "k")))
      .groupBy("cp").agg(sum("k").as("k"))
      .orderBy(col("k").desc, col("cp").asc)
      .limit(maxAlphabet)
      .select("cp").collect().map(_.getInt(0)).sorted
    require(alphabet.nonEmpty, "charlm train: corpus has no characters")
    val bigrams = df
      .select(explode(mappedBigrams(col(textCol), alphabet)).as(Seq("bg", "k")))
      .groupBy("bg").agg(sum("k").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val ctx = bigrams.groupBy(_._1 >>> 21)
      .map { case (c, xs) => (c.toInt, xs.map(_._2).sum) }
      .toArray.sortBy(_._1)
    Model(alphabet, bigrams.map(_._1), bigrams.map(_._2),
      ctx.map(_._1), ctx.map(_._2))
  }

  /** Score every document: adds `n_bigrams` (long) and
    * `lm_bits_per_char` (mean surprisal in bits, rounded to 6; the
    * log-domain perplexity — perplexity = 2^bits). Documents with fewer
    * than two code points (or NULL text) score (0, 0.0). */
  def score(df: DataFrame, textCol: String, model: Model): DataFrame =
    df.withColumn("_lm", lmScoreRaw(col(textCol), model))
      .withColumn("n_bigrams", coalesce(col("_lm.n_bigrams"), lit(0L)))
      .withColumn("lm_bits_per_char",
        when(col("n_bigrams") > 0,
          Rounding.roundAt(-col("_lm.logsum") / col("n_bigrams"), 6))
          .otherwise(lit(0.0)))
      .drop("_lm")
}
