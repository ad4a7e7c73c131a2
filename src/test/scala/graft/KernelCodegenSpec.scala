package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Dedup, Multimodal, TextAnalysis, WebText}

/** The r7 kernel-codegen bridge ([[graft.compile.KernelCallCodegen]]):
  * every JVM kernel moved off CodegenFallback onto a generated boxed
  * call, so stages containing kernels stay whole-stage-codegen'd. This
  * suite pins the two things that change: (1) codegen and interpreted
  * evaluation agree exactly for representative kernels of every output
  * shape (struct, array, map, primitive, nullable and not), and (2) a
  * kernel projection actually LANDS inside a WholeStageCodegen span
  * (the `*(n)` markers) instead of ejecting its stage. */
class KernelCodegenSpec extends SparkSpec {

  /** Local relations get folded by ConvertToLocalRelation (the Project
    * evaluates at OPTIMIZATION time and codegen never runs) — round-trip
    * through parquet so every test drives a real scan→project stage. */
  private def viaParquet(df: DataFrame, tag: String): DataFrame = {
    val dir = s"/tmp/graft_kcg_spec/$tag"
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def docsDf: DataFrame = {
    val rows = java.util.Arrays.asList(
      Row("d1", "The quick brown fox jumps over the lazy dog near the bank"),
      Row("d2", "the the the the repetition test test test of of text"),
      Row("d3", null),
      Row("d4", ""),
      Row("d5", "el perro corre por la calle y come pan con queso"))
    viaParquet(spark.createDataFrame(rows, StructType(Seq(
      StructField("id", StringType), StructField("text", StringType)))), "docs")
  }

  /** Evaluate `df` twice — codegen paths enabled (default) and fully
    * interpreted — and require identical collected results. */
  private def codegenParity(df: => DataFrame): Unit = {
    val on = df.collect().map(_.toString).sorted
    val conf = spark.conf
    val ws = conf.get("spark.sql.codegen.wholeStage")
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val off = df.collect().map(_.toString).sorted
      assert(on.toSeq == off.toSeq,
        s"codegen vs interpreted divergence:\n on=${on.take(3).mkString("|")}\noff=${off.take(3).mkString("|")}")
    } finally {
      conf.set("spark.sql.codegen.wholeStage", ws)
      conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("kernel stages stay inside WholeStageCodegen (no fallback ejection)") {
    // pure-kernel projection (no higher-order-function Columns — Spark's
    // lambda HOFs are CodegenFallback themselves and eject any stage)
    val df = docsDf.select(
      TextAnalysis.fingerprint(col("text")).as("fp"),
      WebText.stripMarkup(col("text")).as("stripped"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    // the scan→project stage must carry the `*(n)` codegen marker on its
    // Project node — under CodegenFallback the Project prints unstarred
    val projLine = plan.linesIterator.find(_.contains("Project")).get
    assert(projLine.contains("*("),
      s"kernel Project not whole-stage-codegen'd:\n$plan")
  }

  test("codegen parity: string/struct/long kernels (text analysis)") {
    codegenParity(docsDf.select(
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.tokenCountBpe(col("text")).as("n_bpe"),
      WebText.stripMarkup(concat(lit("<p>Hi &amp; bye</p>"),
        coalesce(col("text"), lit("")))).as("stripped"),
      Dedup.simhash(col("text")).as("sh")))
  }

  test("codegen parity: binary-payload kernels (image/audio decode)") {
    // genuine 2x2 BMP built byte-by-byte + a FLAC verbatim frame + junk
    val bmp = {
      val w = 2; val h = 2; val stride = ((w * 3 + 3) / 4) * 4
      val size = 54 + stride * h
      val b = java.nio.ByteBuffer.allocate(size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      b.putInt(0).putInt(stride * h).putInt(0).putInt(0).putInt(0).putInt(0)
      (0 until h).foreach { y =>
        (0 until w).foreach { x => b.put((x * 10).toByte).put((y * 10).toByte).put(100.toByte) }
        (w * 3 until stride).foreach(_ => b.put(0.toByte))
      }
      b.array()
    }
    val rows = java.util.Arrays.asList(
      Row("ok", bmp), Row("junk", Array[Byte](1, 2, 3)), Row("nul", null))
    val df = viaParquet(spark.createDataFrame(rows, StructType(Seq(
      StructField("id", StringType),
      StructField("payload", BinaryType, nullable = true)))), "payloads")
    codegenParity(df.select(col("id"),
      Multimodal.imageDims(col("payload")).as("dims"),
      Multimodal.rgbStats(col("payload")).as("rgb"),
      Multimodal.flacPcm(col("payload")).as("flac")))
  }

  test("codegen parity: fused greedy-errors kernel (nullable inputs validated)") {
    val spec = """{"type":"object","required":["a"],"properties":{
      "a":{"type":"string","minLength":2},
      "n":{"type":"integer","minimum":0}}}"""
    val rows = java.util.Arrays.asList(
      Row("ok", 5), Row("x", -1), Row(null, 3), Row(null, null))
    val df = viaParquet(spark.createDataFrame(rows, StructType(Seq(
      StructField("a", StringType), StructField("n", IntegerType)))), "specrows")
    val compiled = graft.compile.ConstraintCompiler.compile(
      graft.json.Json.parse(spec), df.schema,
      graft.compile.ValidatorOptions(greedy = true))
    codegenParity(df.select(compiled.valid.as("ok"), compiled.errors.as("errs")))
  }
}
