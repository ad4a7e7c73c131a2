package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.LmScore.LmModel

/** Data Selection via Importance Resampling (DSIR) — the published
  * target-distribution data-selection method for LLM pretraining: train
  * one cheap n-gram LM on a small TARGET corpus (the distribution you
  * want more of) and one on the RAW pool, score every raw document's
  * log importance weight log p_target(x) − log p_raw(x), and sample k
  * documents without replacement with probability ∝ exp(weight) via the
  * Gumbel-top-k trick. Both models are [[LmScore]] bigram tables, so the
  * whole stage inherits that operator's exact-decimal determinism and
  * stays verifiable bit-for-bit against a relational oracle.
  *
  * Scale shape:
  *  - the raw corpus tokenizes and explodes to bigram pairs ONCE;
  *    both models join that single pairs frame BROADCAST (six bounded
  *    count tables), so dual-model scoring costs one corpus pass —
  *    not two — plus one (id)-keyed aggregation exchange.
  *  - per-bigram log probabilities are rounded to 6 decimals and summed
  *    as DECIMAL(18,6): exact, order-independent under any shuffle, and
  *    the weight is a decimal SUBTRACTION of the two sums (no mean
  *    re-rounding), so incremental batches scored on different days
  *    agree to the last digit.
  *  - resampling is top-k by perturbed weight: Gumbel noise derives
  *    from the deterministic [[TextAnalysis.fingerprint]] of (id, seed)
  *    — no RNG state, reproducible on any cluster — and the selection
  *    runs as TakeOrderedAndProject (per-task heaps, no global sort);
  *    only the k winners ever reach one task.
  */
object Dsir {

  /** Per-document importance weights: (idCol, n_bigrams, log_weight)
    * where log_weight = log p_target(doc) − log p_raw(doc) as
    * DECIMAL(18,6) (natural-log bits, higher = more target-like).
    * Documents with fewer than two words carry NULL weight — they have
    * no evidence under either model and are excluded by [[resample]].
    *
    * Both models MUST come from [[LmScore.train]] over the same
    * tokenization ([[TextAnalysis.words]]); `alpha` is the Lidstone
    * interpolation weight applied to both sides. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        target: LmModel, raw: LmModel,
                        alpha: Double = 1.0): DataFrame =
    importanceWeightsFromWords(
      df.select(col(idCol), TextAnalysis.words(col(textCol)).as("_graft_ws")),
      idCol, "_graft_ws", target, raw, alpha)

  /** [[importanceWeights]] over a PRE-TOKENIZED frame (`wsCol`: the
    * [[TextAnalysis.words]] array) — the words-reuse surface: the DSIR
    * composition tokenizes its corpus up to five times (two model
    * unigram censuses, two bigram censuses, one scoring pass) when each
    * consumer starts from text; callers that materialize the words
    * frame once (e.g. `localCheckpoint`) and train both models via
    * [[LmScore.trainFromWords]] on it pay ONE tokenization pass total.
    * Value-identical to [[importanceWeights]]. */
  def importanceWeightsFromWords(idWords: DataFrame, idCol: String,
                                 wsCol: String,
                                 target: LmModel, raw: LmModel,
                                 alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val words = idWords.select(col(idCol).as("_id"), col(wsCol).as("ws"))
    val pairs = words
      .select(col("_id"), posexplode(slice(col("ws"), lit(1),
        greatest(size(col("ws")) - 1, lit(0)))).as(Seq("i", "w1")), col("ws"))
      .select(col("_id"), col("w1"), element_at(col("ws"), col("i") + 2).as("w2"))

    def modelCols(m: LmModel, tag: String) = (
      broadcast(m.uni.select(col("term").as("w1"), col("n").as(s"n1$tag"))),
      broadcast(m.uni.select(col("term").as("w2"), col("n").as(s"n2$tag"))),
      broadcast(m.bi.select(col("w1"), col("w2"), col("n").as(s"nb$tag"))))
    def logp(m: LmModel, tag: String) = {
      val pUni = (coalesce(col(s"n2$tag"), lit(0L)).cast("double") + 1.0) /
        lit(m.totalTokens + m.vocabSize + 1.0)
      log((coalesce(col(s"nb$tag"), lit(0L)).cast("double") + lit(alpha) * pUni) /
        (coalesce(col(s"n1$tag"), lit(0L)).cast("double") + lit(alpha)))
    }

    val (tU1, tU2, tBi) = modelCols(target, "_t")
    val (rU1, rU2, rBi) = modelCols(raw, "_r")
    // ONE pairs frame, six broadcast joins: dual-model scoring in a
    // single corpus pass (vs two crossEntropy passes)
    val scored = pairs
      .join(tU1, Seq("w1"), "left").join(tU2, Seq("w2"), "left")
      .join(tBi, Seq("w1", "w2"), "left")
      .join(rU1, Seq("w1"), "left").join(rU2, Seq("w2"), "left")
      .join(rBi, Seq("w1", "w2"), "left")
      .select(col("_id"),
        Rounding.roundAt(logp(target, "_t"), 6).cast("decimal(18,6)").as("_lt"),
        Rounding.roundAt(logp(raw, "_r"), 6).cast("decimal(18,6)").as("_lr"))
    val perDoc = scored.groupBy("_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("_lt").as("_st"), sum("_lr").as("_sr"))
      .select(col("_id"), col("n_bigrams"),
        (col("_st") - col("_sr")).cast("decimal(18,6)").as("log_weight"))
    idWords.select(col(idCol)).join(perDoc.withColumnRenamed("_id", idCol),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("log_weight"))
  }

  /** Gumbel-top-k importance resampling: sample `k` documents without
    * replacement with probability ∝ exp(log_weight). Each document's
    * perturbed key is
    *
    *   gumbel_key = round(log_weight − ln(−ln(u)), 6)
    *   u = (fingerprint32(id || ':' || seed) + 1) / 2^31   ∈ (0, 1)
    *
    * — the standard Gumbel-max argument gives exact weighted sampling
    * without replacement when taking the top k keys, and the
    * fingerprint-derived uniform makes the draw deterministic per
    * (id, seed) with no RNG state to coordinate across executors.
    * Zero-bigram documents (NULL weight) are excluded.
    *
    * Returns (idCol, n_bigrams, log_weight, gumbel_key, rank) with
    * rank 1..k by (key desc, id asc). The selection is
    * TakeOrderedAndProject — per-task heaps of size k, no global sort —
    * and the rank window runs over the k survivors only. */
  def resample(df: DataFrame, idCol: String, textCol: String,
               target: LmModel, raw: LmModel, k: Int, seed: Long,
               alpha: Double = 1.0): DataFrame =
    resampleFromWords(
      df.select(col(idCol), TextAnalysis.words(col(textCol)).as("_graft_ws")),
      idCol, "_graft_ws", target, raw, k, seed, alpha)

  /** [[resample]] over a PRE-TOKENIZED frame — the words-reuse surface
    * (see [[importanceWeightsFromWords]]). Value-identical. */
  def resampleFromWords(idWords: DataFrame, idCol: String, wsCol: String,
                        target: LmModel, raw: LmModel, k: Int, seed: Long,
                        alpha: Double = 1.0): DataFrame = {
    require(k >= 1, "resample: k must be >= 1")
    val u = (TextAnalysis.fingerprint(
        concat(col(idCol).cast("string"), lit(":"), lit(seed.toString)))
        .cast("double") + 1.0) / lit(2147483648.0)
    val keyed = importanceWeightsFromWords(idWords, idCol, wsCol, target, raw, alpha)
      .where(col("log_weight").isNotNull)
      .withColumn("gumbel_key",
        Rounding.roundAt(col("log_weight").cast("double") - log(-log(u)), 6))
      .orderBy(col("gumbel_key").desc, col(idCol).asc)
      .limit(k)
    keyed.withColumn("rank", row_number().over(
        Window.orderBy(col("gumbel_key").desc, col(idCol).asc)))
  }
}
