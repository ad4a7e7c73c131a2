package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Exact-substring span dedup at scale: a deterministic corpus (default
  * 1M docs) with planted repeated passages whose span outputs are known
  * in closed form — the [[DedupScaleBench]] pattern applied to
  * [[Dedup.duplicateSpans]] / [[Dedup.removeSharedSpans]]:
  *
  *  - every doc gets 30 per-doc-unique words (hash-derived from a 50M
  *    word space — cross-doc window collisions essentially impossible);
  *  - 10% of docs get an 8-word passage inserted at word offset 10 →
  *    exactly ONE fully-inside 8-gram window per doc (pos = 10);
  *  - a disjoint 5% get a 12-word passage at offset 5 → exactly FIVE
  *    fully-inside windows per doc (pos = 5..9), covering 12 words.
  *
  * Asserts the planted expectations exactly (span row counts, positions,
  * per-class word-removal arithmetic), then prints one JSON line with
  * phase timings + the embedded host probes.
  * Usage: SPARK_GRAFT_SPAN_ROWS=N runMain graft.SpanScaleBench */
object SpanScaleBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SPAN_ROWS", "1000000").toLong
    require(n % 20 == 0 && n >= 20000, s"row count $n must be ≥ 20000 and divisible by 20")
    val nPlain = n * 17 / 20 // 85%
    val nP8 = n * 2 / 20     // 10%: the 8-word passage
    val nP12 = n / 20        // 5%: the 12-word passage
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = BenchCore.session(cpus)

    println(s"{${BenchCore.probeJson("cpu_probe_start", cpus)}}")

    // ~2^62 word space (pmod keeps the rendering sign-free — a negative
    // hash would tokenize as TWO words): at 1M docs × 30 words even
    // single-word cross-doc collisions (which would create REAL shared
    // windows and off-by-a-few the closed form) have expectation ≪ 1
    def uniqueWords(baseId: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(29)), j =>
        concat(lit("w"), pmod(xxhash64(baseId, j, lit("span")),
          lit(4611686018427387904L))))
    val p8 = (0 until 8).map(i => s"passageeight$i")
    val p12 = (0 until 12).map(i => s"passagetwelve$i")
    def insert(ws: org.apache.spark.sql.Column, passage: Seq[String], at: Int) =
      concat_ws(" ", concat(
        slice(ws, 1, at), array(passage.map(lit): _*),
        slice(ws, at + 1, 30 - at)))

    val corpus =
      spark.range(nPlain).select(col("id").as("doc_id"),
          concat_ws(" ", uniqueWords(col("id"))).as("text"))
        .union(spark.range(nP8).select((col("id") + nPlain).as("doc_id"),
          insert(uniqueWords(col("id") + nPlain), p8, 10).as("text")))
        .union(spark.range(nP12).select((col("id") + nPlain + nP8).as("doc_id"),
          insert(uniqueWords(col("id") + nPlain + nP8), p12, 5).as("text")))
    val dir = s"/tmp/graft_span_scale/rows_$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists())
      corpus.repartition(64).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[A](name: String)(f: => A): A = {
      val (a, t) = BenchCore.time(f)
      times(name) = t
      System.err.println(f"[span-scale] $name%-24s $t%8.2f s")
      a
    }

    // 1. span detection: every planted window found, nothing else.
    //    8-passage docs contribute exactly one window each at pos 10;
    //    12-passage docs contribute 5 windows each at pos 5..9.
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", windowWords = 8,
      minDocs = 2)
    val byPos = timed("duplicateSpans")(
      spans.groupBy("pos").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap)
    val expected = Map(10 -> nP8) ++ (5 to 9).map(_ -> nP12).toMap
    require(byPos == expected,
      s"span positions diverged: got $byPos, expected $expected")

    // 2. removal arithmetic: plain docs keep 30 words; 8-passage docs
    //    drop their 8 planted words (38 → 30); 12-passage docs drop 12
    //    (42 → 30). Every surviving word count is exactly 30.
    val cleaned = Dedup.removeSharedSpans(docs, "doc_id", "text",
      windowWords = 8, minDocs = 2)
    val wcounts = timed("removeSharedSpans")(
      cleaned.select(size(split(col("text"), " ")).as("wc"))
        .groupBy("wc").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap)
    require(wcounts == Map(30 -> n),
      s"word-removal arithmetic diverged: $wcounts")

    println(s"{${BenchCore.probeJson("cpu_probe_end", cpus)}}")
    val phases = times.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"metric":"span_scale","rows":$n,"phases":{$phases},""" +
      s""""spans_found":${nP8 + 5 * nP12}}""")
  }
}
