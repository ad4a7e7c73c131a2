package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus composition reporting — the "what is in this corpus, per
  * source" dashboard a curation run starts and ends with. One row per
  * source: document count, total/mean text length, language spread, and
  * the dominant language with its share.
  *
  * Scale shape: ONE partial-agg shuffle keyed by (source, lang) for the
  * language histogram, one more keyed by source for the rollup, and a
  * window over ≤ |sources|·|langs| rows for the dominant language —
  * nothing scans twice, nothing collects. Every reported number is
  * exact integer arithmetic or a single IEEE division of two exact
  * longs (rounded to 6), so SQL oracles restate it bit-for-bit.
  */
object Report {

  /** Per-source report: (source, n_docs, total_chars, avg_chars,
    * n_langs, top_lang, top_lang_docs). NULL langs count as a language
    * of their own (they signal an upstream language-ID gap — hiding
    * them would hide the gap); NULL sources group together the same
    * way. `avg_chars` = total/docs rounded to 6; NULL text counts 0
    * chars. Dominant-language ties break to the lexically smallest
    * lang, NULLs last, so the report is deterministic. */
  def sourceReport(df: DataFrame, sourceCol: String, textCol: String,
                   langCol: String): DataFrame = {
    val perLang = df
      .groupBy(col(sourceCol).as("source"), col(langCol).as("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(coalesce(length(col(textCol)), lit(0)).cast("long")).as("chars"))
    val w = Window.partitionBy("source")
      .orderBy(col("docs").desc, col("lang").asc_nulls_last)
    perLang
      .withColumn("_rk", row_number().over(w))
      .groupBy("source")
      .agg(
        sum("docs").as("n_docs"),
        sum("chars").as("total_chars"),
        count(lit(1)).as("n_langs"),
        max(when(col("_rk") === 1, col("lang"))).as("top_lang"),
        max(when(col("_rk") === 1, col("docs"))).as("top_lang_docs"))
      .withColumn("avg_chars",
        Rounding.roundAt(col("total_chars").cast("double") / col("n_docs"), 6))
      .select("source", "n_docs", "total_chars", "avg_chars",
        "n_langs", "top_lang", "top_lang_docs")
  }
}
