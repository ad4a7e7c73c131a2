package graft

import org.apache.spark.sql.functions._

/** Large-scale dedup-family exercise with REAL hot-bucket populations —
  * the shapes the sub-second gate inputs cannot stress (VERDICT r3 next
  * #8): a deterministic synthetic corpus of SPARK_GRAFT_DEDUP_ROWS docs
  * (default 1M) with planted structure whose expected outputs are known
  * in closed form:
  *
  *  - 80% base docs with disjoint hash-generated vocabularies
  *    (cross-doc jaccard ≈ 0);
  *  - 10% EXACT clones of the first bases;
  *  - 5% NEAR clones (one word perturbed, trigram jaccard ≈ 0.8);
  *  - 5% identical boilerplate — one degenerate 50k-member group whose
  *    every band bucket exceeds the cap, exercising the hot-bucket drop
  *    + star-edge routing for real (a naive pair join here is 1.25
  *    BILLION pairs in one task; the guard reduces it to 50k star
  *    edges and one survivor).
  *
  * Asserts the planted expectations (exact groups, pair counts, survivor
  * count, hot-bucket detection, cross-corpus recall) and prints one JSON
  * line of per-op wall times bracketed by the host-weather probe —
  * recorded in BENCH.md §dedup-at-scale.
  */
object DedupScaleBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_DEDUP_ROWS", "1000000").toLong
    require(n % 20 == 0, "row count must be divisible by 20")
    // the planted hot-bucket structure needs cap (= nBoiler/5, floored at
    // 100) to sit BELOW the boilerplate population
    require(n >= 20000, s"row count $n too small: the boilerplate group " +
      "(5% of rows) must exceed the hot-bucket cap")
    val nBase = n * 16 / 20   // 80%
    val nExact = n * 2 / 20   // 10%
    val nNear = n / 20        // 5%
    val nBoiler = n / 20      // 5%
    require(nExact + nNear <= nBase, "clones must reference existing bases")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = BenchCore.session(cpus)
    import spark.implicits._

    println(s"{${BenchCore.probeJson("cpu_probe_start", cpus)}}")

    // deterministic doc text: 30 words drawn from a per-(doc, slot) hash
    // over a 50M-word space — distinct docs share essentially no shingles
    def wordsOf(baseId: org.apache.spark.sql.Column, perturb: Boolean) = {
      val w = transform(sequence(lit(0), lit(29)), j =>
        concat(lit("w"), pmod(xxhash64(baseId, j), lit(50000000L))))
      if (perturb) concat_ws(" ", transform(w, (x, j) =>
        when(j === 17, lit("zzz")).otherwise(x)))
      else concat_ws(" ", w)
    }
    val boilerText = (0 until 30).map(i => s"cookieword$i").mkString(" ")
    val corpus =
      spark.range(nBase).select(col("id").as("doc_id"),
          wordsOf(col("id"), perturb = false).as("text"))
        .union(spark.range(nExact).select((col("id") + nBase).as("doc_id"),
          wordsOf(col("id"), perturb = false).as("text")))
        .union(spark.range(nNear).select((col("id") + nBase + nExact).as("doc_id"),
          wordsOf(col("id"), perturb = true).as("text")))
        .union(spark.range(nBoiler).select(
          (col("id") + nBase + nExact + nNear).as("doc_id"),
          lit(boilerText).as("text")))
    val dir = s"/tmp/graft_dedup_scale/rows_$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists())
      corpus.repartition(64).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    // nBoiler/5 < nBoiler (and ≥ 200 given the n ≥ 20000 floor), so the
    // degenerate group is always hot
    val cap = math.max(100L, nBoiler / 5).toInt

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[A](name: String)(f: => A): A = {
      val (a, t) = BenchCore.time(f)
      times(name) = t
      System.err.println(f"[dedup-scale] $name%-28s $t%8.2f s")
      a
    }

    // 1. exact dedup: nExact pair-groups + the one boilerplate group
    val exactGroups = timed("exact_duplicates") {
      graft.ops.Dedup.exactDuplicates(docs, col("text")).count()
    }
    require(exactGroups == nExact + 1,
      s"expected ${nExact + 1} exact groups, got $exactGroups")

    // 2. hot-bucket detection: exactly the boilerplate members
    val hotIds = timed("hot_band_buckets") {
      graft.ops.Dedup.hotBandBuckets(docs, "doc_id", "text",
        shingleN = 2, maxBucket = cap).select("id").distinct().count()
    }
    require(hotIds == nBoiler, s"expected $nBoiler hot-bucket ids, got $hotIds")

    // 3. pair generation with the guard: boilerplate contributes ZERO
    //    pairs (vs ~nBoiler²/2 unguarded); planted pairs survive.
    //    Expected (perfect recall): nExact exact + nNear near (base,near)
    //    + nNear (exact-clone, near-clone) pairs.
    val boilerLo = nBase + nExact + nNear
    // the timed block covers the FULL op including the exact-jaccard
    // verification join (minhashDuplicates materializes banding + pairs
    // eagerly, but the verify stage is lazy until the agg runs)
    val stats = timed("minhash_lsh_pairs") {
      graft.ops.Dedup.minhashDuplicates(docs, "doc_id", "text",
        threshold = 0.5, shingleN = 2, maxBucket = cap)
        .agg(count(lit(1)),
          sum(when(col("id_a") >= boilerLo || col("id_b") >= boilerLo, 1L)
            .otherwise(0L))).head()
    }
    val nPairs = stats.getLong(0); val boilerPairs = stats.getLong(1)
    val expectedPairs = nExact + 2L * nNear
    require(boilerPairs == 0, s"guard leaked $boilerPairs boilerplate pairs")
    require(nPairs <= expectedPairs && nPairs >= (expectedPairs * 99) / 100,
      s"expected ~$expectedPairs pairs (>=99% recall), got $nPairs")

    // 4. one-call corpus dedup: survivors = bases + 1 boilerplate
    //    survivor (star edges collapse the hot group despite the drop)
    val survivors = timed("dedup_corpus") {
      graft.ops.Dedup.dedupCorpus(docs, "doc_id", "text",
        threshold = 0.5, shingleN = 2, maxBucket = cap).count()
    }
    val expectedSurvivors = nBase - nNear + nNear + 1 // bases + boiler rep
    val slack = (2L * nNear) / 100 // missed near pairs leave extra survivors
    require(survivors >= expectedSurvivors && survivors <= expectedSurvivors + slack,
      s"expected ~$expectedSurvivors survivors, got $survivors")

    // 5. incremental shape: clones vs the base corpus as reference
    val crossPairs = timed("cross_corpus") {
      graft.ops.Dedup.crossCorpusDuplicates(
        docs.where(col("doc_id") >= nBase && col("doc_id") < boilerLo),
        docs.where(col("doc_id") < nBase),
        "doc_id", "text", threshold = 0.5, shingleN = 2, maxBucket = cap).count()
    }
    val expectedCross = nExact + nNear
    require(crossPairs <= expectedCross &&
      crossPairs >= (expectedCross * 99) / 100,
      s"expected ~$expectedCross cross pairs, got $crossPairs")

    println(s"{${BenchCore.probeJson("cpu_probe_end", cpus)}}")
    val ts = times.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    println(s"""{"dedup_scale_rows":$n,"pairs":$nPairs,"survivors":$survivors,""" +
      s""""cross_pairs":$crossPairs,"hot_ids":$hotIds,"times":$ts}""")
    spark.stop()
  }
}
