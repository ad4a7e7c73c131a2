package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated bigram language-model scoring — the relational analog of
  * the CCNet/KenLM perplexity filter for web corpora: train compact
  * n-gram counts on a reference corpus once, then score every candidate
  * document's per-bigram cross-entropy against them and drop the tail.
  * (A 5-gram KenLM is a C++ trie; this is the same signal re-expressed
  * as two count tables and a broadcast join — weaker as a *model*,
  * identical as a *pipeline shape*, and exactly verifiable.)
  *
  * Model: top-V unigrams by frequency (the vocabulary) and the bigram
  * counts over that vocabulary, both exact hash aggregations with
  * map-side partial combine; `maxBigrams` caps the conditional table by
  * frequency so the model stays broadcastable at any corpus size.
  *
  * Scoring (Lidstone-smoothed interpolation, all counts exact):
  *
  *   p_uni(w)      = (n_uni(w) + 1) / (T + V + 1)        n_uni absent = 0
  *   logp(w1, w2)  = ln( (n_bi(w1,w2) + α·p_uni(w2)) / (n_uni(w1) + α) )
  *   cross_entropy = −mean over the doc's bigrams of logp
  *
  * Scale shape: the corpus tokenizes once and explodes to (doc, w1, w2)
  * pairs; the model joins BROADCAST; the per-doc aggregation sums each
  * bigram's logp ROUNDED TO 6 DECIMALS AS DECIMAL(18,6) — exact and
  * order-independent, so the result is reproducible under any shuffle
  * order and restateable verbatim in the gate oracle (the same
  * discipline as [[Sessions.sessionStats]]'s decimal sum). Only (id,
  * partial sums) cross the final exchange. */
object LmScore {

  /** (term, n) unigram counts over the top-V vocabulary; (w1, w2, n)
    * bigram counts; T = total corpus tokens (incl. OOV); V = vocabulary
    * size actually kept. */
  final case class LmModel(uni: DataFrame, bi: DataFrame,
                           totalTokens: Long, vocabSize: Long)

  /** Train on a reference corpus. Vocabulary = top `topV` terms by
    * (count desc, term asc) — a deterministic total order; bigrams keep
    * the top `maxBigrams` pairs over the vocabulary by the same rule. */
  def train(corpus: DataFrame, textCol: String,
            topV: Int = 65536, maxBigrams: Int = 1 << 20): LmModel =
    trainFromWords(
      corpus.select(TextAnalysis.words(col(textCol)).as("ws")), "ws",
      topV, maxBigrams)

  /** [[train]] over a PRE-TOKENIZED corpus (`wsCol`: the
    * [[TextAnalysis.words]] array). Value-identical to [[train]] —
    * words() is deterministic — but lets a caller that feeds several
    * models and a scoring pass from ONE corpus (the DSIR dual-model
    * shape) tokenize once, materialize the words frame, and share it:
    * the unigram census, the bigram census and the scoring join all
    * read the cached arrays instead of re-running tokenize+explode per
    * consumer (guide §1.2: don't compute things twice). */
  def trainFromWords(corpus: DataFrame, wsCol: String,
                     topV: Int = 65536, maxBigrams: Int = 1 << 20): LmModel = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val words = corpus.select(col(wsCol).as("ws"))
      .where(size(col("ws")) > 0)
    val tokens = words.select(explode(col("ws")).as("term"))
    // ONE tokenize+explode+aggregate pass feeds both the corpus total
    // (sum of the per-term counts) and the top-V vocabulary — the r7
    // shape ran a separate full count() pass over the exploded tokens
    // first. The aggregated frame (distinct terms) is persisted for the
    // two bounded follow-up actions, then released.
    val grouped = tokens.groupBy("term").agg(count(lit(1)).as("n")).persist()
    // the vocabulary is bounded by topV (≤ 65k rows by default), so it
    // COLLECTS to a local frame instead of persisting the distributed
    // aggregation: no executor-cache lifetime to manage, and the two
    // vocab joins below plus every scoring broadcast read driver-local
    // data (the bigram table stays a lazy distributed frame — persist
    // model.bi yourself if scoring many batches against one model).
    // The corpus total rides the SAME collect as a tagged union row —
    // one action over the persisted census instead of two (an agg job
    // plus a top-V job; guide §1.2: fewer passes).
    val topRows = grouped.orderBy(col("n").desc, col("term").asc).limit(topV)
      .select(lit(0).as("_tag"), col("term"), col("n"))
    val totalRow = grouped.agg(coalesce(sum("n"), lit(0L)).as("n"))
      .select(lit(1).as("_tag"), lit(null).cast("string").as("term"), col("n"))
    val rows = topRows.unionByName(totalRow).collect()
    grouped.unpersist(false)
    val uniRows = rows.filter(_.getInt(0) == 0)
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    val total = rows.find(_.getInt(0) == 1).map(_.getLong(2)).getOrElse(0L)
    val uni = uniRows.toDF("term", "n")
    val vocabSize = uniRows.length.toLong
    val pairs = words.select(posexplode(slice(col("ws"), lit(1),
        greatest(size(col("ws")) - 1, lit(0)))).as(Seq("i", "w1")),
        col("ws"))
      .select(col("w1"), element_at(col("ws"), col("i") + 2).as("w2"))
    val vocab1 = broadcast(uni.select(col("term").as("w1")))
    val vocab2 = broadcast(uni.select(col("term").as("w2")))
    val bi = pairs.join(vocab1, Seq("w1")).join(vocab2, Seq("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1").asc, col("w2").asc).limit(maxBigrams)
    LmModel(uni, bi, total, vocabSize)
  }

  /** Train the TARGET and RAW models of the DSIR dual-model shape in
    * ONE shared census over a pre-tokenized corpus: the target model
    * trains on the rows where boolean `flagCol` is true, the raw model
    * on every row — value-identical to two [[trainFromWords]] calls on
    * the filtered / full frames (per-term target counts are the
    * conditional counts of the same aggregation; ordering and limits
    * unchanged), but the whole training costs TWO jobs instead of six:
    * one unigram census job whose tagged-union collect carries both
    * top-V vocabularies and both corpus totals, and one bigram census
    * job whose tagged-union collect carries both capped bigram tables.
    * The bigram tables come back DRIVER-LOCAL (bounded by `maxBigrams`
    * — the broadcastability contract; a broadcast join was collecting
    * them to the driver anyway), so the scoring pass's six broadcast
    * builds run without cluster jobs. */
  def trainDual(corpus: DataFrame, wsCol: String, flagCol: String,
                topV: Int = 65536,
                maxBigrams: Int = 1 << 20): (LmModel, LmModel) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val words = corpus
      .select(col(wsCol).as("ws"), col(flagCol).cast("boolean").as("_t"))
      .where(size(col("ws")) > 0)
    val tokens = words.select(explode(col("ws")).as("term"), col("_t"))
    // one census: raw count + conditional target count per term
    val grouped = tokens.groupBy("term")
      .agg(count(lit(1)).as("n_r"),
        count(when(col("_t"), lit(1))).as("n_t")).persist()
    val rawTop = grouped.orderBy(col("n_r").desc, col("term").asc).limit(topV)
      .select(lit(0).as("_tag"), col("term"), col("n_r").as("n"))
    // terms absent from the target slice never enter its census in the
    // two-train formulation — the n_t > 0 screen reproduces that
    val tgtTop = grouped.where(col("n_t") > 0)
      .orderBy(col("n_t").desc, col("term").asc).limit(topV)
      .select(lit(1).as("_tag"), col("term"), col("n_t").as("n"))
    val totals = grouped
      .agg(coalesce(sum("n_r"), lit(0L)).as("r"),
        coalesce(sum("n_t"), lit(0L)).as("t"))
    val totalRows =
      totals.select(lit(2).as("_tag"), lit(null).cast("string").as("term"),
          col("r").as("n"))
        .unionByName(totals.select(lit(3).as("_tag"),
          lit(null).cast("string").as("term"), col("t").as("n")))
    val rows = rawTop.unionByName(tgtTop).unionByName(totalRows).collect()
    grouped.unpersist(false)
    def side(tag: Int) = rows.filter(_.getInt(0) == tag)
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    val (rawUniRows, tgtUniRows) = (side(0), side(1))
    val totalR = rows.find(_.getInt(0) == 2).map(_.getLong(2)).getOrElse(0L)
    val totalT = rows.find(_.getInt(0) == 3).map(_.getLong(2)).getOrElse(0L)
    val rawUni = rawUniRows.toDF("term", "n")
    val tgtUni = tgtUniRows.toDF("term", "n")

    val pairs = words.select(posexplode(slice(col("ws"), lit(1),
        greatest(size(col("ws")) - 1, lit(0)))).as(Seq("i", "w1")),
        col("ws"), col("_t"))
      .select(col("w1"), element_at(col("ws"), col("i") + 2).as("w2"), col("_t"))
    def biOf(uni: DataFrame, onlyTarget: Boolean, tag: Int) = {
      val base = if (onlyTarget) pairs.where(col("_t")) else pairs
      base
        .join(broadcast(uni.select(col("term").as("w1"))), Seq("w1"))
        .join(broadcast(uni.select(col("term").as("w2"))), Seq("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w1").asc, col("w2").asc).limit(maxBigrams)
        .select(lit(tag).as("_tag"), col("w1"), col("w2"), col("n"))
    }
    val biRows = biOf(rawUni, onlyTarget = false, tag = 0)
      .unionByName(biOf(tgtUni, onlyTarget = true, tag = 1)).collect()
    def biSide(tag: Int) = biRows.filter(_.getInt(0) == tag)
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .toDF("w1", "w2", "n")
    (LmModel(tgtUni, biSide(1), totalT, tgtUniRows.length.toLong),
     LmModel(rawUni, biSide(0), totalR, rawUniRows.length.toLong))
  }

  /** Per-document cross-entropy against the model:
    * (idCol, n_bigrams, cross_entropy) — documents with fewer than two
    * words score NULL (no bigrams to judge). Lower is more fluent. */
  def crossEntropy(df: DataFrame, idCol: String, textCol: String,
                   model: LmModel, alpha: Double = 1.0): DataFrame =
    crossEntropyFromWords(
      df.select(col(idCol), TextAnalysis.words(col(textCol)).as("_graft_ws")),
      idCol, "_graft_ws", model, alpha)

  /** [[crossEntropy]] over a PRE-TOKENIZED frame (`wsCol`: the
    * [[TextAnalysis.words]] array) — the words-reuse surface (see
    * [[trainFromWords]]). Row set and values identical to
    * [[crossEntropy]] on the text the words came from. */
  def crossEntropyFromWords(idWords: DataFrame, idCol: String, wsCol: String,
                            model: LmModel, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val words = idWords.select(col(idCol).as("_id"), col(wsCol).as("ws"))
    val pairs = words
      .select(col("_id"), posexplode(slice(col("ws"), lit(1),
        greatest(size(col("ws")) - 1, lit(0)))).as(Seq("i", "w1")), col("ws"))
      .select(col("_id"), col("w1"), element_at(col("ws"), col("i") + 2).as("w2"))
    val uni1 = broadcast(model.uni.select(col("term").as("w1"), col("n").as("n1")))
    val uni2 = broadcast(model.uni.select(col("term").as("w2"), col("n").as("n2")))
    val bi = broadcast(model.bi.select(col("w1"), col("w2"), col("n").as("nb")))
    val pUni = (coalesce(col("n2"), lit(0L)).cast("double") + 1.0) /
      lit(model.totalTokens + model.vocabSize + 1.0)
    val logp = log(
      (coalesce(col("nb"), lit(0L)).cast("double") + lit(alpha) * pUni) /
      (coalesce(col("n1"), lit(0L)).cast("double") + lit(alpha)))
    val scored = pairs
      .join(uni1, Seq("w1"), "left")
      .join(uni2, Seq("w2"), "left")
      .join(bi, Seq("w1", "w2"), "left")
      // order-independent exact accumulation: round6 -> decimal sum
      .select(col("_id"),
        Rounding.roundAt(logp, 6).cast("decimal(18,6)").as("_lp"))
    val perDoc = scored.groupBy("_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("_lp").as("_sum"))
      .select(col("_id"), col("n_bigrams"),
        Rounding.roundAt(-col("_sum").cast("double") / col("n_bigrams"), 6)
          .as("cross_entropy"))
    // keep zero-bigram docs (NULL score) — a filter should see them
    idWords.select(col(idCol)).join(perDoc.withColumnRenamed("_id", idCol),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("cross_entropy"))
  }

  /** The filter form: keep documents whose cross-entropy is at most
    * `maxCrossEntropy` (drops the disfluent tail AND zero-bigram docs,
    * which carry no evidence of fluency). */
  def fluencyFilter(df: DataFrame, idCol: String, textCol: String,
                    model: LmModel, maxCrossEntropy: Double,
                    alpha: Double = 1.0): DataFrame = {
    val ce = crossEntropy(df, idCol, textCol, model, alpha)
      .where(col("cross_entropy") <= maxCrossEntropy)
      .select(col(idCol))
    df.join(ce, Seq(idCol))
  }
}
