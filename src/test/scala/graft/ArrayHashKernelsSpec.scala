package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Parity pins for the r7 element-hash and winnow-select kernels: each
  * must produce the EXACT value of the Column chain it replaces (the SQL
  * gate oracles restate those chains). */
class ArrayHashKernelsSpec extends SparkSpec {

  private def textsDf = {
    val texts = Seq(
      null, "", "one", "one two", "one two three four five six seven",
      "the the the the the", "a b c d e f g h i j k l m n o p",
      "Unicode wörds çafé 中文 здесь", "x " * 200 + "tail words here",
      "shared run alpha beta gamma delta epsilon zeta eta theta",
      "prefix shared run alpha beta gamma delta epsilon zeta eta theta suffix")
    val rows = texts.map(t => Row(t))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("text", StringType, nullable = true))))
  }

  test("HashElements matches the transform chains for all three id kinds") {
    val sh = Dedup.shingles(col("text"), 3)
    def kernel(kind: String, mask: Boolean) =
      ColumnBridge.column(graft.compile.HashElements(
        ColumnBridge.expression(sh), kind, mask))
    val got = textsDf.select(
      transform(sh, s => Dedup.xxhashShingleId(s)).as("xx_chain"),
      kernel("xx64", mask = true).as("xx_kernel"),
      transform(sh, s => xxhash64(s)).as("xx64_chain"),
      kernel("xx64", mask = false).as("xx64_kernel"),
      transform(sh, s => Dedup.portableShingleId(s)).as("fp31_chain"),
      kernel("fp31", mask = false).as("fp31_kernel"),
      transform(sh, s => Dedup.portableShingleId62(s)).as("fp62_chain"),
      kernel("fp62", mask = false).as("fp62_kernel")).collect()
    got.foreach { r =>
      Seq(0, 2, 4, 6).foreach { i =>
        val chain = if (r.isNullAt(i)) null else r.getSeq[Long](i)
        val kern = if (r.isNullAt(i + 1)) null else r.getSeq[Long](i + 1)
        assert(chain == kern, s"id-kind divergence at field $i: $chain vs $kern")
      }
    }
  }

  test("WinnowSelect matches the Column winnow selection (k=5,w=4 and k=2,w=1)") {
    for ((k, w) <- Seq((5, 4), (2, 1), (3, 8))) {
      val ws = TextAnalysis.words(col("text"))
      val kernel = ColumnBridge.column(graft.compile.WinnowSelect(
        ColumnBridge.expression(ws), k, w))
      val got = textsDf.select(
        Dedup.winnowSelectColumns(ws, k, w).as("chain"),
        kernel.as("kern")).collect()
      got.foreach { r =>
        val chain = if (r.isNullAt(0)) null
          else r.getSeq[Row](0).map(x => (x.getLong(0), x.getInt(1)))
        val kern = if (r.isNullAt(1)) null
          else r.getSeq[Row](1).map(x => (x.getLong(0), x.getInt(1)))
        assert(chain == kern, s"winnow divergence k=$k w=$w: $chain vs $kern")
      }
    }
  }

  test("winnowFingerprints end-to-end equals the r6 Column-flow output") {
    // the pre-kernel DataFrame flow, reconstructed verbatim
    def columnFlow(df: org.apache.spark.sql.DataFrame, k: Int, w: Int) = {
      val staged = df
        .select(col("id"), TextAnalysis.words(col("text")).as("_ws"))
        .withColumn("_n", greatest(size(col("_ws")) - (k - 1), lit(0)))
      staged.where(col("_n") >= 1)
        .select(col("id"),
          explode(Dedup.winnowSelectColumns(col("_ws"), k, w)).as("_s"))
        .select(col("id"), col("_s.p").as("pos"), col("_s.h").as("fp"))
    }
    val df = textsDf.withColumn("id", monotonically_increasing_id())
    val a = columnFlow(df, 5, 4).collect().map(_.toString).sorted.toSeq
    val b = Dedup.winnowFingerprints(df, "id", "text", 5, 4)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
