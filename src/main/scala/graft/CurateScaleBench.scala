package graft

import org.apache.spark.sql.functions._

/** Large-scale exercise of the END-TO-END curation composition
  * (`Curation.curate` — the operator a production pipeline actually
  * calls), with planted structure whose survivors are known in closed
  * form (VERDICT r5 next #6; the [[DedupScaleBench]] pattern applied to
  * the full composition instead of the dedup family alone).
  *
  * Deterministic corpus of SPARK_GRAFT_CURATE_ROWS docs (default 1M,
  * divisible by 40):
  *
  *  - 80%  base docs — 30 unique hash-vocabulary words (cross-doc
  *    jaccard ≈ 0) + the shared boilerplate banner line;
  *  - 10%  EXACT clones of the first bases (same text, higher id) —
  *    removed by the exact-dedup stage, base survives (canonical min);
  *  - 5%   NEAR clones (one word perturbed, trigram jaccard ≈ 0.806)
  *    — removed by the near-dedup stage (16×4 banding detects a 0.806
  *    pair with p ≈ 0.9998, so ≥99% recall is asserted, not exact);
  *  - 2.5% PII docs — unique words + a unique email address — redacted,
  *    then SURVIVE (unique vocabulary);
  *  - 2.5% junk docs — short all-punctuation text, quality 0.3 < 0.5
  *    floor — dropped by the quality stage;
  *  - +1   degenerate hot doc with 120k unique lines — the skew-guard
  *    target: `SkewGuard.Raise` must THROW on it (asserted first), and
  *    the main run under `SkewGuard.Drop` must route it out.
  *
  * Closed-form expectations asserted after the one `curate` call:
  * survivor count ∈ [nBase+nPii, nBase+nPii+1%·nNear]; every base and
  * PII id present; zero exact-clone/junk/degenerate ids; banner line
  * stripped corpus-wide (line-dedup stage); zero '@' and exactly nPii
  * `[EMAIL]` redactions; quality ≥ floor everywhere; splits exhaustive,
  * all three nonempty, train fraction ≈ 0.98. Wall times bracketed by
  * the host-weather probe; recorded in BENCH.md §curate-at-scale.
  */
object CurateScaleBench {
  private val Banner = "Subscribe to our newsletter for updates"

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_CURATE_ROWS", "1000000").toLong
    require(n % 40 == 0 && n >= 4000, s"row count $n must be divisible by 40 and >= 4000")
    val nBase = n * 16 / 20  // 80%
    val nExact = n * 2 / 20  // 10%
    val nNear = n / 20       // 5%
    val nPii = n / 40        // 2.5%
    val nJunk = n / 40       // 2.5%
    val degenerateId = n     // one hot doc beyond every range
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = BenchCore.session(cpus)
    import spark.implicits._

    println(s"{${BenchCore.probeJson("cpu_probe_start", cpus)}}")

    def wordsOf(baseId: org.apache.spark.sql.Column, count: Int, perturb: Boolean) = {
      val w = transform(sequence(lit(0), lit(count - 1)), j =>
        concat(lit("w"), pmod(xxhash64(baseId, j), lit(50000000L))))
      if (perturb) concat_ws(" ", transform(w, (x, j) =>
        when(j === 17, lit("zzz")).otherwise(x)))
      else concat_ws(" ", w)
    }
    def withBanner(line1: org.apache.spark.sql.Column) =
      concat(line1, lit("\n" + Banner))

    val corpus =
      spark.range(nBase).select(col("id").as("doc_id"),
          withBanner(wordsOf(col("id"), 30, perturb = false)).as("text"))
        .union(spark.range(nExact).select((col("id") + nBase).as("doc_id"),
          withBanner(wordsOf(col("id"), 30, perturb = false)).as("text")))
        .union(spark.range(nNear).select((col("id") + nBase + nExact).as("doc_id"),
          withBanner(wordsOf(col("id"), 30, perturb = true)).as("text")))
        .union(spark.range(nPii).select((col("id") + nBase + nExact + nNear).as("doc_id"),
          withBanner(concat(wordsOf(col("id") + 77777777L, 20, perturb = false),
            lit(" contact user"), col("id").cast("string"),
            lit("@example.com now"))).as("text")))
        .union(spark.range(nJunk).select(
          (col("id") + nBase + nExact + nNear + nPii).as("doc_id"),
          concat(lit("### !? "), col("id").cast("string")).as("text")))
        .union(spark.range(1).select(lit(degenerateId).as("doc_id"),
          concat_ws("\n", transform(sequence(lit(0), lit(119999)), j =>
            concat(lit("u"), j, lit("h"),
              pmod(xxhash64(j, lit(degenerateId)), lit(1000000L))))).as("text")))
    val dir = s"/tmp/graft_curate_scale/rows_$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists())
      corpus.repartition(64).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val lineCap = 50000L // normal docs have 2 lines; the degenerate has 120k

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[A](name: String)(f: => A): A = {
      val (a, t) = BenchCore.time(f)
      times(name) = t
      System.err.println(f"[curate-scale] $name%-24s $t%8.2f s")
      a
    }

    // 1. fail-fast mode: Raise must throw on the degenerate doc (the
    //    guard's count job runs at CALL time — the curate call itself)
    timed("skew_guard_raise") {
      val thrown =
        try {
          graft.ops.Curation.curate(docs, "doc_id", "text",
            graft.ops.Curation.CurationConfig(
              skewGuard = graft.ops.HotKeys.SkewGuard.Raise(lineCap)))
          false
        } catch { case e: IllegalStateException =>
          require(e.getMessage.contains("dedupLines"),
            s"Raise threw from the wrong site: ${e.getMessage.take(120)}")
          true
        }
      require(thrown, "SkewGuard.Raise did not fire on the 120k-line doc")
    }

    // 2. the production run: Drop routes the degenerate out; everything
    //    else follows the planted closed form
    val out = timed("curate_drop_guard") {
      graft.ops.Curation.curate(docs, "doc_id", "text",
        graft.ops.Curation.CurationConfig(
          skewGuard = graft.ops.HotKeys.SkewGuard.Drop(lineCap),
          nearDedup = true, nearDedupThreshold = 0.7))
        .persist()
    }

    val survivors = timed("survivor_count")(out.count())
    val lo = nBase + nPii
    val hi = lo + nNear / 100 // ≥99% near-dup recall (LSH is probabilistic)
    require(survivors >= lo && survivors <= hi,
      s"expected survivors in [$lo, $hi], got $survivors")

    val agg = timed("closed_form_asserts") {
      out.agg(
        sum(when(col("doc_id") < nBase, 1L).otherwise(0L)),                       // bases
        sum(when(col("doc_id") >= nBase && col("doc_id") < nBase + nExact, 1L)
          .otherwise(0L)),                                                        // exact clones
        sum(when(col("doc_id") >= nBase + nExact + nNear &&
          col("doc_id") < nBase + nExact + nNear + nPii, 1L).otherwise(0L)),      // pii
        sum(when(col("doc_id") >= nBase + nExact + nNear + nPii &&
          col("doc_id") < n, 1L).otherwise(0L)),                                  // junk
        sum(when(col("doc_id") === degenerateId, 1L).otherwise(0L)),              // degenerate
        sum(when(col("text").contains(Banner), 1L).otherwise(0L)),                // banner débris
        sum(when(col("text").contains("@"), 1L).otherwise(0L)),                   // unredacted pii
        sum(when(col("text").contains("[EMAIL]"), 1L).otherwise(0L)),             // redactions
        min("quality")).head()
    }
    require(agg.getLong(0) == nBase, s"expected all $nBase bases, got ${agg.getLong(0)}")
    require(agg.getLong(1) == 0, s"${agg.getLong(1)} exact clones leaked")
    require(agg.getLong(2) == nPii, s"expected $nPii pii survivors, got ${agg.getLong(2)}")
    require(agg.getLong(3) == 0, s"${agg.getLong(3)} junk docs leaked past the quality floor")
    require(agg.getLong(4) == 0, "the degenerate hot doc leaked past SkewGuard.Drop")
    require(agg.getLong(5) == 0, s"${agg.getLong(5)} docs kept the boilerplate banner")
    require(agg.getLong(6) == 0, s"${agg.getLong(6)} docs kept an unredacted email")
    require(agg.getLong(7) == nPii, s"expected $nPii [EMAIL] redactions, got ${agg.getLong(7)}")
    require(agg.getDouble(8) >= 0.5, s"quality floor violated: ${agg.getDouble(8)}")

    val splits = out.groupBy("split").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(splits.keySet == Set("train", "val", "test"),
      s"splits not exhaustive/nonempty: $splits")
    require(splits.values.sum == survivors, s"split counts ${splits.values.sum} != $survivors")
    val trainFrac = splits("train").toDouble / survivors
    require(trainFrac > 0.96 && trainFrac < 0.99,
      f"train fraction $trainFrac%.4f outside [0.96, 0.99] for weight 0.98")
    out.unpersist(false)

    val timesJson = times.map { case (k, v) => f""""$k":$v%.2f""" }.mkString(",")
    println(s"""{"bench":"curate_scale","rows":$n,"survivors":$survivors,""" +
      s""""expected_lo":$lo,"expected_hi":$hi,"times":{$timesJson},""" +
      s"""${BenchCore.probeJson("cpu_probe_end", cpus)}}""")
    spark.stop()
  }
}
