package graft

import graft.ext.{GraftExtensions, GraftFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import scala.jdk.CollectionConverters._

/** SQL surface: custom expressions registered via SparkSessionExtensions /
  * a live-session FunctionRegistry. */
class ExtensionsSpec extends SparkSpec {

  test("live-session registration: kll functions usable from spark.sql") {
    GraftFunctions.register(spark)
    spark.range(10000)
      .selectExpr("cast(id % 100 as double) as v")
      .createOrReplaceTempView("ext_v")
    val qs = spark.sql(
      "SELECT kll_quantiles(kll_sketch(v), array(0.25D, 0.5D, 0.75D)) AS q FROM ext_v")
      .head().getSeq[Double](0)
    assert(qs.length == 3)
    assert(math.abs(qs(1) - 50.0) < 10, qs.mkString(","))
    assert(qs(0) <= qs(1) && qs(1) <= qs(2))

    val cdf = spark.sql(
      "SELECT kll_cdf(kll_sketch(v, 400), array(49.5D)) AS c FROM ext_v")
      .head().getSeq[Double](0)
    assert(math.abs(cdf.head - 0.5) < 0.05, cdf.mkString(","))

    spark.range(10000).createOrReplaceTempView("ext_v_ids")
    val n = spark.sql(
      "SELECT count(*) AS n FROM (SELECT array_bounds(array(id, id + 5), 0, 9999) AS ok FROM ext_v_ids) WHERE ok")
      .head().getLong(0)
    // rows with id+5 > 9999 fail: ids 9995..9999 → 5 rows fail
    assert(n == 9995, s"n=$n")
  }

  test("live-session registration: freq functions usable from spark.sql") {
    GraftFunctions.register(spark)
    spark.range(1000)
      .selectExpr("concat('t', cast(id % 7 as string)) as term")
      .createOrReplaceTempView("ext_terms")
    // exact regime (7 distinct << 64): counts exact, errors zero
    val tk = spark.sql(
      "SELECT freq_topk(freq_sketch(term, 64), 3) AS tk FROM ext_terms")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(tk.length == 3)
    assert(tk.forall(_.getLong(2) == 0L), tk.mkString(","))
    assert(tk.head.getLong(1) == 143L, tk.head.toString) // 1000/7 rounded up
    // chi2 of a sketch against itself is 0
    val chi = spark.sql(
      """SELECT freq_chi2(s, s) FROM
         (SELECT freq_sketch(term, 64) AS s FROM ext_terms)""")
      .head().getDouble(0)
    assert(chi == 0.0, chi.toString)
    // PSI of a sketch against itself is exactly 0 (all terms (p-p)·ln 1)
    val psi = spark.sql(
      """SELECT freq_psi(s, s) FROM
         (SELECT freq_sketch(term, 64) AS s FROM ext_terms)""")
      .head().getDouble(0)
    assert(psi == 0.0, psi.toString)
    // NFC composition from SQL
    val nfc = spark.sql("SELECT graft_nfc('cafe\u0301')").head().getString(0)
    assert(nfc == "caf\u00e9", nfc)
  }

  test("live-session registration: text kernels usable from spark.sql") {
    GraftFunctions.register(spark)
    spark.createDataFrame(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, ""),
      (4L, "one two"))).toDF("id", "text")
      .createOrReplaceTempView("ext_texts")
    // SQL results must equal the Column-surface kernels exactly
    val viaSql = spark.sql(
      """SELECT id, graft_fingerprint(text) AS fp,
                graft_simhash(text) AS sh, graft_simhash(text, 2) AS sh2,
                graft_minhash(text) AS mh,
                graft_minhash(text, 2, 8, 7) AS mh2
         FROM ext_texts""").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[Long](4), r.getSeq[Long](5)))).toMap
    val viaCols = spark.table("ext_texts").select(col("id"),
      graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"),
      graft.ops.Dedup.simhash(col("text")).as("sh"),
      graft.ops.Dedup.simhash(col("text"), 2).as("sh2"),
      graft.ops.Dedup.minhashSignature(col("text")).as("mh"),
      graft.ops.Dedup.minhashSignature(col("text"), 2, 8, 7L).as("mh2"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[Long](4), r.getSeq[Long](5)))).toMap
    assert(viaSql == viaCols)
    assert(viaSql(1L)._4.length == 64 && viaSql(1L)._5.length == 8)
    // custom multiplier arg reaches the kernel
    val m37 = spark.sql("SELECT graft_fingerprint('ab', 37)").head().getLong(0)
    assert(m37 == 97L * 37 + 98, m37.toString)
  }

  test("graft_char_entropy and graft_deflate_ratio match their Column twins") {
    val ent = spark.sql(
      "SELECT round(graft_char_entropy('aabb') * 1e6) / 1e6 AS e, " +
        "graft_char_entropy('aaaa') AS z, graft_char_entropy('') AS emp").head()
    assert(ent.getDouble(0) == 1.0 && ent.getDouble(1) == 0.0 && ent.getDouble(2) == 0.0)
    val viaSql = spark.sql(
      """SELECT id, round(graft_char_entropy(text) * 1e6) / 1e6 AS e,
                round(graft_deflate_ratio(text) * 1e6) / 1e6 AS r
         FROM ext_texts""").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    spark.table("ext_texts").select(col("id"),
      graft.ops.TextAnalysis.charEntropy(col("text")).as("e"),
      graft.ops.TextAnalysis.compressionRatio(col("text")).as("r"))
      .collect().foreach { r =>
        assert(viaSql(r.getLong(0)) == ((r.getDouble(1), r.getDouble(2))))
      }
  }

  test("FuseArrayBounds rule: forall(arr, bounds) → fused codegen, same 3-valued results") {
    import graft.ext.FuseArrayBounds
    // materialize through parquet so ConvertToLocalRelation can't fold the
    // whole query into a LocalTableScan before the rule is observable
    val dir = java.nio.file.Files.createTempDirectory("fuse_t").toString
    spark.sql("""
      SELECT id, CASE CAST(id AS INT)
        WHEN 0 THEN array(1, 2, 3)
        WHEN 1 THEN array(0, 5, 9)
        WHEN 2 THEN array(-1, 2, 3)
        WHEN 3 THEN array(1, CAST(NULL AS INT), 3)
        WHEN 4 THEN array(-1, CAST(NULL AS INT))
        WHEN 5 THEN array(10, 11)
        WHEN 6 THEN CAST(NULL AS ARRAY<INT>)
        ELSE array() END AS arr
      FROM range(8)""").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).orderBy("id").createOrReplaceTempView("fuse_t")
    val q = "SELECT forall(arr, x -> x >= 0 AND x <= 9) AS ok FROM fuse_t"

    val unfused = spark.sql(q).collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    spark.experimental.extraOptimizations ++= Seq(FuseArrayBounds)
    try {
      val fusedDf = spark.sql(q)
      val plan = fusedDf.queryExecution.executedPlan.toString
      assert(plan.contains("arrayboundscheck"), plan.take(1500))
      val fused = fusedDf.collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
      assert(fused.toSeq == unfused.toSeq,
        s"fused=${fused.mkString(",")} unfused=${unfused.mkString(",")}")
      // expected: true, true, false, null, false, false, null, true
      assert(fused.toSeq == Seq(true, true, false, null, false, false, null, true))

      // exclusive + one-sided + literal-on-left shapes also fuse
      for (expr <- Seq("x -> x > 0", "x -> x < 10", "x -> 0 <= x", "x -> x > 0 AND x < 10")) {
        val p = spark.sql(s"SELECT forall(arr, $expr) FROM fuse_t")
          .queryExecution.executedPlan.toString
        assert(p.contains("arrayboundscheck"), s"$expr not fused:\n${p.take(800)}")
      }
      // non-bounds lambdas must NOT fuse
      val notFused = spark.sql("SELECT forall(arr, x -> x % 2 = 0) FROM fuse_t")
        .queryExecution.executedPlan.toString
      assert(!notFused.contains("arrayboundscheck"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FuseArrayBounds)
    }
  }

  test("ArrayBoundsCheck: interpreted eval ≡ codegen, both modes") {
    import graft.compile.ArrayBoundsCheck
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types._

    val arrays: Seq[Any] = Seq(
      Seq(1, 2, 3), Seq(0, 9), Seq(-1), Seq(10), Seq(1, null, 3),
      Seq(-1, null), Seq(null, null), Seq.empty[Integer], null)
    val schema = StructType(Seq(StructField("arr", ArrayType(IntegerType, true))))
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        arrays.map(a => org.apache.spark.sql.Row(a)).asJava), schema)

    for (forallMode <- Seq(false, true); failOnNull <- Seq(false, true)) {
      if (!(forallMode && failOnNull)) { // forall mode never fails on null
        val expr = ColumnBridge.column(ArrayBoundsCheck(
          ColumnBridge.expression(col("arr")),
          Some(0L), Some(9L), loExclusive = false, hiExclusive = false,
          failOnNull = failOnNull, forallSemantics = forallMode))
        def results(codegen: Boolean): Seq[Any] = {
          spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
          spark.conf.set("spark.sql.codegen.factoryMode",
            if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")
          try df.select(expr.as("ok")).collect()
            .map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq
          finally {
            spark.conf.unset("spark.sql.codegen.wholeStage")
            spark.conf.unset("spark.sql.codegen.factoryMode")
          }
        }
        val gen = results(codegen = true)
        val interp = results(codegen = false)
        assert(gen == interp,
          s"forall=$forallMode failOnNull=$failOnNull gen=$gen interp=$interp")
      }
    }
  }

  test("spark.sql.extensions path: fresh session with GraftExtensions") {
    val orig = spark // keep the shared session's context
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions()(_))
      .getOrCreate()
    try {
      s2.range(1000).selectExpr("cast(id as double) as v")
        .createOrReplaceTempView("ext2_v")
      val med = s2.sql(
        "SELECT kll_quantiles(kll_sketch(v), array(0.5D))[0] AS m FROM ext2_v")
        .head().getDouble(0)
      assert(math.abs(med - 500.0) < 60, s"med=$med")
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }
}
