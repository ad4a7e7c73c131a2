package graft

import org.apache.spark.sql.functions._

/** Stage-isolating diagnosis for the persisted-vs-inline PQ gap seen in
  * AnnScaleBench (inline pq_adc ~16 s, persisted ~80 s at 1M vectors):
  * times the ADC candidate stage and the full pqTopK separately on both
  * code sources and prints partition counts + physical-plan skeletons,
  * so the slow stage (scan? BNLJ expansion? ranking window? rerank) is
  * identified by measurement, not guess. */
object PqDiag {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_ANN_ROWS", "1000000").toLong
    val dim = 64; val nQ = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = BenchCore.session(cpus)
    val dir = s"/tmp/graft_ann_scale/rows_$n"
    val pqDir = s"/tmp/graft_ann_scale/pq_$n"
    require(new java.io.File(s"$dir/_SUCCESS").exists(), "run AnnScaleBench first")
    val corpus = spark.read.parquet(dir)
    val queries = corpus.where(col("vec_id") < nQ)

    val pivRows = corpus.where(pmod(col("vec_id"), lit(n / 64)) === 5)
      .orderBy("vec_id").limit(32).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val seeds = (0 until 8).map(s => pivRows.map(_.slice(s * 8, s * 8 + 8)))
    val cb = graft.ops.Similarity.trainPqCodebooks(corpus, "embedding", dim, seeds, 1)

    def t(name: String)(f: => Unit): Unit = {
      val (_, s) = BenchCore.time(f)
      println(f"[pq-diag] $name%-28s $s%8.2f s")
    }
    val persisted = spark.read.parquet(pqDir)
    val inline = corpus.select(col("vec_id"),
      graft.ops.Similarity.pqEncodeCol(col("embedding"), dim, cb).as("pcode"))
    println(s"[pq-diag] persisted partitions=${persisted.rdd.getNumPartitions} " +
      s"inline partitions=${inline.rdd.getNumPartitions}")

    // stage 1: pure code scan (count forces full deserialization)
    t("scan_persisted")(persisted.agg(count(lit(1))).head())
    t("scan_inline")(inline.agg(count(lit(1))).head())
    // stage 2: ADC expansion only — no window, no rerank
    def adcOnly(codes: org.apache.spark.sql.DataFrame): Unit = {
      val m = 8; val subDim = 8
      val lut = array((0 until m).map { s =>
        array(cb(s).map(c =>
          aggregate(zip_with(slice(col("qv"), s * subDim + 1, subDim),
            typedlit(c), (x, w) => (x.cast("double") - w) * (x.cast("double") - w)),
            lit(0.0), (acc, v) => acc + v)): _*)
      }: _*)
      val q = broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv")).withColumn("lut", lut))
      val dist = (0 until m).map(s =>
        element_at(element_at(col("lut"), s + 1),
          (element_at(col("pcode"), s + 1) + 1).cast("int"))).reduce(_ + _)
      codes.select(col("vec_id").as("neighbor_id"), col("pcode"))
        .join(q, col("neighbor_id") =!= col("query_id"))
        .select(sum(dist)).head()
    }
    t("adc_expand_persisted")(adcOnly(persisted))
    t("adc_expand_inline")(adcOnly(inline))
    // stage 2b: expansion + ranking window + top-r filter (no rerank)
    def adcWindow(codes: org.apache.spark.sql.DataFrame): Unit = {
      val m = 8; val subDim = 8
      val lut = array((0 until m).map { s =>
        array(cb(s).map(c =>
          aggregate(zip_with(slice(col("qv"), s * subDim + 1, subDim),
            typedlit(c), (x, w) => (x.cast("double") - w) * (x.cast("double") - w)),
            lit(0.0), (acc, v) => acc + v)): _*)
      }: _*)
      val q = broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv")).withColumn("lut", lut))
      val dist = (0 until m).map(s =>
        element_at(element_at(col("lut"), s + 1),
          (element_at(col("pcode"), s + 1) + 1).cast("int"))).reduce(_ + _)
      val wa = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
      codes.select(col("vec_id").as("neighbor_id"), col("pcode"))
        .join(q, col("neighbor_id") =!= col("query_id"))
        .withColumn("adc_dist", graft.ops.Rounding.roundAt(dist, 6))
        .where(col("adc_dist").isNotNull)
        .withColumn("arank", row_number().over(wa))
        .where(col("arank") <= 64)
        .agg(count(lit(1))).head()
    }
    // stage 2c: same, but with an EXPLICIT narrow projection before the
    // window — if the persisted plan's exchange was carrying the fat
    // broadcast columns (lut ~2KB/row), this collapses the gap
    def adcWindowNarrow(codes: org.apache.spark.sql.DataFrame): Unit = {
      val m = 8; val subDim = 8
      val lut = array((0 until m).map { s =>
        array(cb(s).map(c =>
          aggregate(zip_with(slice(col("qv"), s * subDim + 1, subDim),
            typedlit(c), (x, w) => (x.cast("double") - w) * (x.cast("double") - w)),
            lit(0.0), (acc, v) => acc + v)): _*)
      }: _*)
      val q = broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv")).withColumn("lut", lut))
      val dist = (0 until m).map(s =>
        element_at(element_at(col("lut"), s + 1),
          (element_at(col("pcode"), s + 1) + 1).cast("int"))).reduce(_ + _)
      val wa = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
      codes.select(col("vec_id").as("neighbor_id"), col("pcode"))
        .join(q, col("neighbor_id") =!= col("query_id"))
        .withColumn("adc_dist", graft.ops.Rounding.roundAt(dist, 6))
        .where(col("adc_dist").isNotNull)
        .select("query_id", "neighbor_id", "adc_dist")
        .withColumn("arank", row_number().over(wa))
        .where(col("arank") <= 64)
        .agg(count(lit(1))).head()
    }
    def fullPlan(mk: org.apache.spark.sql.DataFrame => Unit): Unit = ()
    // full executed plans of the window stage (skeleton hid Projects)
    def planOf(codes: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val m = 8; val subDim = 8
      val lut = array((0 until m).map { s =>
        array(cb(s).map(c =>
          aggregate(zip_with(slice(col("qv"), s * subDim + 1, subDim),
            typedlit(c), (x, w) => (x.cast("double") - w) * (x.cast("double") - w)),
            lit(0.0), (acc, v) => acc + v)): _*)
      }: _*)
      val q = broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv")).withColumn("lut", lut))
      val dist = (0 until m).map(s =>
        element_at(element_at(col("lut"), s + 1),
          (element_at(col("pcode"), s + 1) + 1).cast("int"))).reduce(_ + _)
      val wa = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
      val df = codes.select(col("vec_id").as("neighbor_id"), col("pcode"))
        .join(q, col("neighbor_id") =!= col("query_id"))
        .withColumn("adc_dist", graft.ops.Rounding.roundAt(dist, 6))
        .where(col("adc_dist").isNotNull)
        .withColumn("arank", row_number().over(wa))
        .where(col("arank") <= 64)
        .agg(count(lit(1)))
      println(s"[pq-diag] FULL PLAN $tag:")
      df.queryExecution.executedPlan.toString.linesIterator
        .foreach(l => println("  " + l.take(220)))
    }
    planOf(persisted, "window_persisted")
    planOf(inline, "window_inline")
    t("adc_window_narrow_persisted")(adcWindowNarrow(persisted))
    t("adc_window_narrow_inline")(adcWindowNarrow(inline))
    t("adc_window_persisted")(adcWindow(persisted))
    // plan skeletons: does WindowGroupLimit survive in both shapes?
    def skel(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val p = df.queryExecution.executedPlan.toString
      println(s"[pq-diag] plan $tag:")
      p.linesIterator.filter(l => l.contains("WindowGroupLimit") ||
        l.contains("Window") || l.contains("Exchange") ||
        l.contains("Join") || l.contains("Scan") || l.contains("Sort"))
        .take(40).foreach(l => println("  " + l.take(150)))
    }
    if (sys.env.contains("SPARK_GRAFT_PQ_PLANS")) {
      skel(graft.ops.Similarity.pqTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 1, dim = dim, codebooks = cb,
        rerank = 64, preCodes = Some(persisted)), "persisted")
      skel(graft.ops.Similarity.pqTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 1, dim = dim, codebooks = cb,
        rerank = 64), "inline")
    }
    // stage 3: full operator
    t("pqTopK_persisted") {
      graft.ops.Similarity.pqTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 1, dim = dim, codebooks = cb,
        rerank = 64, preCodes = Some(persisted)).collect()
    }
    t("pqTopK_inline") {
      graft.ops.Similarity.pqTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 1, dim = dim, codebooks = cb,
        rerank = 64).collect()
    }
    spark.stop()
  }
}
