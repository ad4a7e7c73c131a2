package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.TextAnalysis

/** Parity pins for the one-pass text census ([[graft.compile.TextCounts]])
  * and stopword-scores ([[graft.compile.StopwordScores]]) kernels: each
  * consumer must equal the regex/HOF Column chain it replaced — the SQL
  * gate oracles keep restating those chains. */
class TextCountsSpec extends SparkSpec {

  private def df(strings: Seq[String]) = {
    val rows = strings.map(s => Row(s))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("t", StringType, nullable = true))))
  }

  private val structured = Seq(
    null, "", " ", "\t\n\f\r", "hello world", "Hello, World 42!",
    "  a-b_c.d  ", "ALL CAPS", "§±!@#$%", "one", "1 2 3", "a",
    "café naïve Über", "İstanbul SΣ",
    "中文 ١٢٣ Ⅳ①",
    "😀 emoji 𝒜𝟎 math",
    "nbsp middle", "zero​width", "trail punct...",
    "the and of to a in is it that for",
    "der la les el und y", "x" * 300)

  private def fuzz(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(424242)
    (0 until n).map { _ =>
      val len = rnd.nextInt(60)
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        rnd.nextInt(7) match {
          case 0 => sb.append((' ' + rnd.nextInt(95)).toChar)
          case 1 => sb.append(" \t\n\r\f".charAt(rnd.nextInt(5)))
          case 2 => sb.append((0x80 + rnd.nextInt(0x500)).toChar)
          case 3 => sb.append((0x4e00 + rnd.nextInt(0x100)).toChar)
          case 4 => sb.appendAll(Character.toChars(0x1d400 + rnd.nextInt(0x800)))
          case 5 => sb.append((0x2000 + rnd.nextInt(0x200)).toChar)
          case 6 => sb.append("the and der und la les el y of ".charAt(rnd.nextInt(31)))
        }
      }
      sb.toString
    }
  }

  test("textCounts fields equal the regex chains (structured + 1500 fuzz)") {
    val c = TextAnalysis.textCounts(col("t"))
    val got = df(structured ++ fuzz(1500)).select(
      c.getField("n_cp").as("k_cp"), length(col("t")).as("c_cp"),
      c.getField("n_letter").as("k_l"),
      length(regexp_replace(col("t"), "[^\\p{L}]", "")).as("c_l"),
      (c.getField("n_cp") - c.getField("n_ws")).as("k_nw"),
      length(regexp_replace(col("t"), "\\s+", "")).as("c_nw"),
      c.getField("n_words").as("k_w"),
      TextAnalysis.tokenCountWsColumns(col("t")).as("c_w"),
      (c.getField("n_words") + c.getField("n_punct")).as("k_bpe"),
      TextAnalysis.tokenCountBpeColumns(col("t")).as("c_bpe")).collect()
    got.foreach { r =>
      (0 until 10 by 2).foreach { i =>
        val k = if (r.isNullAt(i)) null else r.get(i)
        val cc = if (r.isNullAt(i + 1)) null else r.get(i + 1)
        assert(k == cc, s"textCounts divergence at field $i: kernel=$k chain=$cc row=$r")
      }
    }
  }

  test("qualityScore and langId unchanged vs the pre-kernel formulations") {
    // original formulations, reconstructed verbatim
    def qualityColumns(text: org.apache.spark.sql.Column) = {
      val n = length(text)
      val alphaRatio = (length(regexp_replace(text, "[^\\p{L}]", "")).cast("double") /
        greatest(n, lit(1)))
      val wordCount = TextAnalysis.tokenCountWsColumns(text)
      val meanWordLen = when(wordCount > 0,
        length(regexp_replace(text, "\\s+", "")).cast("double") / wordCount)
        .otherwise(lit(0.0))
      val lengthOk = when(n >= 100 && n <= 20000, lit(1.0))
        .when(n >= 20 && n < 100, lit(0.5)).otherwise(lit(0.0))
      val wordLenOk = when(meanWordLen >= 3 && meanWordLen <= 12, lit(1.0)).otherwise(lit(0.3))
      graft.ops.Rounding.roundAt(lengthOk * 0.4 + alphaRatio * 0.3 + wordLenOk * 0.3, 4)
    }
    def langIdColumns(text: org.apache.spark.sql.Column) = {
      val ws = TextAnalysis.words(text)
      val langs = TextAnalysis.stopwords.keys.toSeq.sorted
      val scored = langs.map(l => struct(
        TextAnalysis.stopwordRatioColumns(ws, l).as("score"), lit(l).as("lang")))
      val best = greatest(scored: _*)
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
    }
    val got = df(structured ++ fuzz(800)).select(
      TextAnalysis.qualityScore(col("t")).as("kq"),
      qualityColumns(col("t")).as("cq"),
      TextAnalysis.langId(col("t")).as("kl"),
      langIdColumns(col("t")).as("cl")).collect()
    got.foreach { r =>
      val kq = if (r.isNullAt(0)) null else r.get(0)
      val cq = if (r.isNullAt(1)) null else r.get(1)
      assert(kq == cq, s"qualityScore divergence: $kq vs $cq")
      assert(r.getString(2) == r.getString(3),
        s"langId divergence: ${r.getString(2)} vs ${r.getString(3)}")
    }
  }

  test("stopword scores: NULL and empty word lists score 0.0 like the chain") {
    val r = df(Seq(null, "", "zzz qqq", "the of")).select(
      TextAnalysis.stopwordRatioFromWords(TextAnalysis.words(col("t")), "en").as("k"),
      TextAnalysis.stopwordRatioColumns(TextAnalysis.words(col("t")), "en").as("c"))
      .collect()
    r.foreach(row => assert(row.get(0) == row.get(1), s"ratio divergence: $row"))
  }
}
