package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data curation.
  *
  * `rand()`-based sampling is a different sample every run, every retry,
  * and every partitioning — useless for curation pipelines that must be
  * re-runnable and joinable (the same doc must be in or out everywhere).
  * Hash-mod sampling makes membership a pure function of a key: stable
  * across runs, engines, cluster sizes, and resumed partitions, and
  * oracle-checkable. It is also a narrow projection — no shuffle, no
  * state, no sampling pass.
  */
object Sampling {

  private val Denom = 1000000L

  /** Keep a row iff `pmod(hash(key), 1e6) < fraction * 1e6`. The default
    * hash is xxhash64 (codegen, well-mixed); pass
    * [[Dedup.portableShingleId]]-style hashes when a SQL oracle must
    * restate membership exactly. */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
                 hash: Column => Column = xxhash64(_)): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.where(pmod(hash(key), lit(Denom)) < lit((fraction * Denom).toLong))
  }

  /** Per-stratum hash sampling: each stratum keeps its own fraction
    * (e.g. downsample boilerplate-heavy sources, keep all rare-language
    * docs). Strata missing from `fractions` default to `defaultFraction`.
    * Membership stays a pure function of (key, stratum). */
  def hashSampleByStrata(df: DataFrame, key: Column, strata: Column,
                         fractions: Map[String, Double],
                         defaultFraction: Double = 1.0,
                         hash: Column => Column = xxhash64(_)): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0,1]")
    val cut = fractions.foldLeft(lit((defaultFraction * Denom).toLong)) {
      case (acc, (s, f)) => when(strata === s, lit((f * Denom).toLong)).otherwise(acc)
    }
    df.where(pmod(hash(key), lit(Denom)) < cut)
  }

  /** Training-data mixing: sample the corpus so source proportions match
    * `weights` (need not sum to 1 — they are normalized), at the LARGEST
    * total the data can support: T = min over sources of count_s/share_s,
    * so exactly one source is fully kept and the rest downsample to it.
    * Sources absent from `weights` are dropped (weight 0).
    *
    * Per-source counts are one small driver-side aggregation (rows =
    * source cardinality); membership is then the same pure hash function
    * as [[hashSampleByStrata]] — reproducible across runs, partitionings,
    * and engines. Returns (sampled df, fractions used). Hash-mod sampling
    * hits the target share within the hash's uniformity (±O(1/√n) per
    * source), which is what a mixture needs — exact row quotas would
    * require a global per-source ordering (a sort) for no curation
    * benefit. */
  def mixSources(df: DataFrame, key: Column, sourceCol: String,
                 weights: Map[String, Double],
                 hash: Column => Column = xxhash64(_)): (DataFrame, Map[String, Double]) = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val counts = df.where(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(sourceCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(weights.keySet.subsetOf(counts.keySet),
      s"sources with zero rows: ${weights.keySet -- counts.keySet}")
    val fractions = mixFractions(counts, weights)
    (hashSampleByStrata(df, key, col(sourceCol), fractions,
      defaultFraction = 0.0, hash), fractions)
  }

  /** The mixing fraction math shared by [[mixSources]] and
    * [[temperatureMix]]: per-source keep fractions so proportions match
    * `weights` at the largest feasible total. */
  private def mixFractions(counts: Map[String, Long],
                           weights: Map[String, Double]): Map[String, Double] = {
    // sum in sorted-source order: double addition is order-dependent,
    // and a SQL oracle restates this as an ORDER BY source fold
    val wsum = weights.toSeq.sortBy(_._1).map(_._2).sum
    // the binding source (smallest feasible total, ties by name) is
    // pinned to fraction 1.0 EXACTLY — the divide-then-multiply float
    // round-trip can land a hair below 1.0 and silently drop rows from
    // the source the contract says is fully kept
    val binding = weights.keys.minBy(s => (counts(s) / (weights(s) / wsum), s))
    val total = counts(binding) / (weights(binding) / wsum)
    weights.map { case (s, w) =>
      s -> (if (s == binding) 1.0
            else math.min(1.0, (w / wsum) * total / counts(s))) }
  }

  /** Temperature-scaled source mixing — the published multilingual /
    * multi-source pretraining mix (mC4/mT5, XLM-R, PaLM): sample
    * probability p_s ∝ n_s^τ with τ < 1, so head sources downsample
    * and tail sources keep more of their share (τ = 1 reproduces the
    * natural mix, τ → 0 the uniform one). Weights derive from the
    * per-source census and feed the same largest-feasible-total,
    * pure-hash-membership machinery as [[mixSources]]; returns
    * (sampled df, fractions used).
    *
    * Determinism contract: n^τ is computed as a binary-expansion
    * sqrt-chain (each step an IEEE-exact `sqrt` or multiply, so any
    * engine reproduces it bit-for-bit — the Rounding.roundAt/IEEE-sqrt
    * discipline); τ must therefore be a dyadic rational with at most
    * `MaxTauBits` binary digits (0.5, 0.25, 0.75, 0.625, ... — covers
    * every published setting to well within corpus noise). */
  def temperatureMix(df: DataFrame, key: Column, sourceCol: String,
                     tau: Double,
                     hash: Column => Column = xxhash64(_)): (DataFrame, Map[String, Double]) = {
    require(tau > 0.0 && tau <= 1.0, s"tau ($tau) must be in (0, 1]")
    val counts = df.where(col(sourceCol).isNotNull)
      .groupBy(sourceCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureMix: no non-null sources")
    val weights = counts.map { case (s, n) => s -> dyadicPow(n.toDouble, tau) }
    val fractions = mixFractions(counts, weights)
    (hashSampleByStrata(df, key, col(sourceCol), fractions,
      defaultFraction = 0.0, hash), fractions)
  }

  private val MaxTauBits = 20

  /** x^τ for dyadic τ via the binary-expansion sqrt-chain: walk τ's
    * binary digits, taking one IEEE sqrt per position and multiplying
    * in the positions that are set (most-significant first). Every step
    * is correctly rounded, so the value — unlike libm `pow` — is
    * bit-identical across JVMs, C runtimes, and SQL engines. */
  private[graft] def dyadicPow(x: Double, tau: Double): Double = {
    if (tau == 1.0) return x
    var rem = tau
    var cur = x
    var acc = 1.0
    var i = 0
    while (rem > 0.0 && i < MaxTauBits) {
      cur = math.sqrt(cur)
      rem *= 2.0
      if (rem >= 1.0) { acc *= cur; rem -= 1.0 }
      i += 1
    }
    require(rem == 0.0,
      s"tau must be a dyadic rational with <= $MaxTauBits binary digits " +
        s"(0.5, 0.25, 0.75, ...) for engine-exact sqrt-chain pow")
    acc
  }

  /** Deterministic EXACT-k uniform sample: the k corpus rows with the
    * smallest `(pmod(hash(key), 1e6), key-as-string)` rank — "give me
    * exactly k documents, the same k on every run, engine, and
    * partitioning" ([[hashSample]] gives a fraction with binomial
    * count noise; this gives a count). Keys should be unique INCLUDING
    * at most one NULL (the string tie-break keeps the selection total
    * for distinct keys; duplicate NULL keys tie on both rank columns).
    * NULL keys get cell -1 via an explicit guard — the
    * [[sampleToBudget]] discipline, since xxhash64(NULL) returns the
    * seed, not NULL — so they genuinely sort first; drop them upstream
    * if unwanted.
    *
    * Scale shape: TakeOrderedAndProject — per-task k-heaps, no global
    * sort; only k rows ever reach one task. k must fit driver/task
    * memory (it is the SAMPLE size — thousands, not billions); for
    * budget-shaped cuts at corpus scale use [[sampleToBudget]]. */
  def sampleExactK(df: DataFrame, key: Column, k: Int,
                   hash: Column => Column = xxhash64(_)): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val cols = df.columns
    df.withColumn("_h", when(key.isNull, lit(-1L))
        .otherwise(pmod(hash(key), lit(Denom))))
      .withColumn("_k", key.cast("string"))
      .orderBy(col("_h").asc, col("_k").asc)
      .limit(k)
      .select(cols.map(col): _*)
  }

  /** Reproducible train/val/test assignment: each row gets the split
    * whose DISJOINT hash range its key falls in (ranges partition
    * [0, 1e6) in the given order, remainders to the last split), so the
    * splits are exhaustive, non-overlapping, stable across runs and
    * engines, and joinable — the same doc lands in the same split
    * everywhere. Adds a `split` column; weights are normalized. Rows
    * whose key hashes to NULL (null key with a null-propagating hash)
    * are assigned the FIRST split — exhaustiveness holds, and broken
    * upstream keys contaminate train, never the eval splits. */
  def assignSplits(df: DataFrame, key: Column, splits: Seq[(String, Double)],
                   hash: Column => Column = xxhash64(_)): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "weights must be positive")
    val wsum = splits.map(_._2).sum
    // cumulative upper bounds; the last is pinned to the full range so
    // truncation never leaves an unassigned remainder
    val uppers = splits.map(_._2 / wsum).scanLeft(0.0)(_ + _).tail
      .map(c => (c * Denom).toLong).dropRight(1) :+ Denom
    require(uppers == uppers.distinct.sorted,
      s"split ranges must be strictly increasing at 1e-6 granularity " +
        s"(got cut points $uppers) — a weight truncated to zero width")
    // bind the hash ONCE in its own projection: the fold references it
    // per branch, and kernel hashes (CodegenFallback) get no CSE
    val expr = splits.map(_._1).zip(uppers).reverse
      .foldLeft(lit(null).cast("string")) { case (acc, (name, up)) =>
        when(col("_h") < up, lit(name)).otherwise(acc)
      }
    df.withColumn("_h", pmod(hash(key), lit(Denom)))
      .withColumn("split", coalesce(expr, lit(splits.head._1)))
      .drop("_h")
  }

  /** Deterministic per-group top-k selection — "keep the k best docs per
    * source/domain/language", the quality-budgeted curation step. Rows
    * rank within each group by `order` (descending by default), ties
    * broken by `tiebreak` ascending so the selection is total and
    * re-runnable; rows with rank ≤ k survive, with the rank appended.
    *
    * Scale shape: ONE shuffle on the group key + a per-key sort — the
    * same window-sort family as [[Sessions.sessionize]], with the same
    * degenerate-key hazard (one domain with 10^9 docs serializes into a
    * single task's sort). Pass a [[HotKeys.SkewGuard]] to raise or to
    * drop-and-route hot groups; k itself does NOT bound the sort input —
    * the guard is the protection. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Column,
                   tiebreak: Column, k: Int, descending: Boolean = true,
                   guard: HotKeys.SkewGuard = HotKeys.SkewGuard.Off): DataFrame = {
    require(groupCols.nonEmpty, "topKPerGroup needs at least one group column")
    require(k >= 1, s"k ($k) must be >= 1")
    val guarded = HotKeys.applyGuard(df, groupCols, guard, "topKPerGroup")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(if (descending) order.desc else order.asc, tiebreak.asc)
    guarded.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic token-budget sampling — "give me (at least) N tokens
    * from this corpus": keep the prefix of the corpus, ordered by
    * `(pmod(hash(key), 1e6), key)`, whose EXCLUSIVE cumulative `weight`
    * stays below `budget`. The prefix first reaches the budget with at
    * most one document of overshoot; membership is a pure function of
    * the key, so the sample is stable across runs, partitionings, and
    * engines, and a larger budget's sample always CONTAINS a smaller
    * budget's (nested samples — grow the training set without churning
    * it).
    *
    * Scale shape — the corpus itself never shuffles:
    *  1. one partial-agg shuffle onto the 1e6-value hash grid
    *     (≤ 1e6 rows out),
    *  2. a global cumulative window over that BOUNDED frame (single
    *     task, ≤ 1e6 rows by construction),
    *  3. the per-grid-cell cut table broadcast back onto the corpus —
    *     cells strictly below the budget keep everything, cells past it
    *     drop everything, and the ONE straddling cell (monotone
    *     cumulative ⇒ unique) resolves its few hash-collision docs with
    *     a window over just those rows.
    * Total cost = three corpus scans and zero corpus shuffles; the
    * exact-global-sort alternative is one full shuffle + sort of the
    * whole corpus, strictly worse at scale.
    *
    * NULL weights count 0; NULL keys hash to grid cell -1 and sort
    * first (they join the sample before anything else — drop them
    * upstream if that is not wanted). Zero-weight docs sitting exactly
    * at the budget boundary are excluded (strict `<`). Keys must be
    * UNIQUE (including at most ONE NULL): duplicate keys inside the
    * straddling cell have no total order, so their cut would not be
    * deterministic. */
  def sampleToBudget(df: DataFrame, key: Column, weight: Column, budget: Long,
                     hash: Column => Column = xxhash64(_)): DataFrame = {
    require(budget >= 0, s"budget ($budget) must be >= 0")
    val cols = df.columns
    // explicit NULL guard (assignShards discipline): xxhash64(NULL)
    // returns the seed — NOT NULL — so relying on the hash to propagate
    // NULL would scatter NULL keys into cell pmod(seed, Denom)
    val withH = df
      .withColumn("_h", when(key.isNull, lit(-1L))
        .otherwise(pmod(hash(key), lit(Denom))))
      .withColumn("_w", coalesce(weight.cast("long"), lit(0L)))
      .withColumn("_k", key)
    val w = org.apache.spark.sql.expressions.Window
    val cut = withH.groupBy("_h").agg(sum("_w").as("_cw"))
      .withColumn("_cb", coalesce(
        sum("_cw").over(w.orderBy("_h")
          .rowsBetween(Long.MinValue, -1)), lit(0L)))
    val joined = withH.join(broadcast(cut), "_h")
    val full = joined.where(col("_cb") + col("_cw") < budget)
    val straddle = joined
      .where(col("_cb") < budget && col("_cb") + col("_cw") >= budget)
      .withColumn("_p", coalesce(
        sum("_w").over(w.partitionBy("_h").orderBy("_k")
          .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .where(col("_cb") + col("_p") < budget)
      .drop("_p")
    full.unionByName(straddle).select(cols.map(col): _*)
  }

  /** Deterministic training-shard layout — the write-side twin of
    * [[assignSplits]]: every row gets a `shard` in [0, numShards) and a
    * 0-based within-shard `pos`, both pure functions of (key, seed).
    * Together they form a seeded global permutation of the corpus cut
    * into hash-balanced shards: the reproducible shuffle a pretraining
    * writer needs so that any re-run, on any cluster, lays out byte-
    * identical shards (and a different `seed` reshuffles the curriculum
    * without touching the data).
    *
    * Scale shape: ONE shuffle (the per-shard ranking window). Shards
    * are hash-uniform, so each task sorts ~rows/numShards — size
    * numShards to keep that in task memory (a 100-TB corpus typically
    * writes 10^4–10^5 shards, far past uniform). Materialize with
    * `.repartition(col("shard")).sortWithinPartitions("pos")` before
    * the write so files land in layout order. Rows ranked by (hash,
    * key-as-string) so duplicate hash values still order totally; NULL
    * keys land in shard 0 at the front (drop them upstream if unwanted).
    */
  /** CCNet-style RANK buckets: label each row 'head'/'middle'/'tail'
    * (any bucket list) by its GLOBAL ascending rank on `score` — the
    * published perplexity-bucket selector (score the corpus with
    * [[CharLm.score]], keep/downsample per bucket) — WITHOUT a global
    * sort. Row r's bucket is k iff rank(r) ≤ floor(N · cumFrac_k),
    * rank = position under (score asc NULLS FIRST, tieBreak asc);
    * `tieBreak` must be total (include the id) or assignment at bucket
    * boundaries is tie-arbitrary.
    *
    * Scale shape (the [[sampleToBudget]] discipline): scores coarsen
    * onto a BOUNDED monotone cell grid (`floor(score·cellsPerUnit)` —
    * size cellsPerUnit to the score's range, e.g. 1000 cells/unit for
    * bits-per-char in [0, 30]); the census + cumulative-start window
    * runs over that bounded frame, starts broadcast back, and the only
    * corpus-wide work is ONE per-cell ranking window (cells bound the
    * sort; screen degenerate score spikes with [[HotKeys]] if needed).
    * Global rank = cell start + within-cell rank — identical to the
    * single global sort a SQL oracle restates, because the cell grid is
    * monotone in the score.
    *
    * Determinism contract: thresholds are `floor(N · (Σw₁..k / Σw))` —
    * one correctly-rounded divide and multiply, so an oracle restating
    * the cumulative fractions as literals must pick weights whose
    * ratios are exactly representable (3:3:4 → 0.3/0.6, the
    * [[temperatureMix]] discipline). Adds `bucket`; NULL scores rank
    * first (broken upstream scores contaminate head, never the tail a
    * curation step would keep); NaN scores rank LAST, matching Spark's
    * ordering (and a true global sort) where NaN is greater than every
    * double.
    *
    * Skew guard (built in, always on): a degenerate score distribution
    * — a broken upstream LM emitting one constant, or NULL-heavy scores
    * — collapses the corpus into ONE cell, which would serialize into a
    * single task's sort. Cells whose census count exceeds
    * `hotCellRows` are therefore SUB-SPLIT before ranking: a bounded
    * deterministic sample ([[sampleExactK]]) of the hot cell yields
    * `subSplits` quantile boundaries on (score, tieBreak) as plan
    * literals; each row's sub-index is the count of boundaries below
    * its own (score, tieBreak), which is MONOTONE in the ranking key,
    * so `global rank = (cell, sub) start + within-(cell, sub) rank`
    * still equals the single global sort. Cold inputs pay nothing
    * beyond the census they already run. Reserved scratch/output names
    * `_sc _cell _sub _rank _start _n bucket` must not appear in the
    * input (guarded — withColumn would silently clobber them). */
  def rankBuckets(df: DataFrame, score: Column,
                  buckets: Seq[(String, Double)], tieBreak: Column,
                  cellsPerUnit: Long = 1000L,
                  hotCellRows: Long = 4000000L,
                  subSplits: Int = 64): DataFrame = {
    require(buckets.nonEmpty && buckets.forall(_._2 > 0),
      "rankBuckets: bucket weights must be positive")
    require(buckets.map(_._1).distinct.length == buckets.length,
      "rankBuckets: bucket names must be unique")
    require(hotCellRows >= 1 && subSplits >= 2,
      "rankBuckets: hotCellRows must be >= 1 and subSplits >= 2")
    val reserved = Seq("_sc", "_cell", "_sub", "_rank", "_start", "_n", "bucket")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"rankBuckets: input column(s) ${clash.mkString(", ")} collide with " +
        "reserved scratch/output names — rename them upstream")
    val w = org.apache.spark.sql.expressions.Window
    val wsum = buckets.map(_._2).sum
    val cols = df.columns
    val cell = when(score.isNull, lit(Long.MinValue))
      .when(isnan(score.cast("double")), lit(Long.MaxValue))
      .otherwise(floor(score * cellsPerUnit).cast("long"))
    val withCell = df.withColumn("_sc", score).withColumn("_cell", cell)
    val census0 = withCell.groupBy("_cell").agg(count(lit(1)).as("_n"))
      .persist() // bounded frame: read for n, hot set, starts; then released
    // one tagged-union collect carries the row total AND the hot-cell
    // set (the census cache fills in the same job) — the r7 shape ran
    // a dedicated agg job for each
    val info = census0
      .agg(coalesce(sum("_n"), lit(0L)).as("_v"))
      .select(lit(0).as("_tag"), lit(0L).as("_cell"), col("_v"))
      .unionByName(census0.where(col("_n") > hotCellRows)
        .select(lit(1).as("_tag"), col("_cell"), lit(0L).as("_v")))
      .collect()
    val n = info.find(_.getInt(0) == 0).map(_.getLong(2)).getOrElse(0L)
    val hotCells = info.filter(_.getInt(0) == 1).map(_.getLong(1))
    require(hotCells.length <= 64,
      s"rankBuckets: ${hotCells.length} cells exceed $hotCellRows rows — " +
        "the grid is too coarse for this score; raise cellsPerUnit")
    // hot cells: sample-quantile boundaries on (score, tieBreak) become a
    // monotone sub-index; cold cells ride sub 0
    val subCol: Column =
      if (hotCells.isEmpty) lit(0)
      else hotSubColumn(withCell, tieBreak, hotCells, subSplits)
    val withSub = withCell.withColumn("_sub", subCol)
    val census =
      if (hotCells.isEmpty) census0.withColumn("_sub", lit(0))
      else withSub.groupBy("_cell", "_sub").agg(count(lit(1)).as("_n"))
    val starts = census
      .withColumn("_start", sum("_n").over(
        w.orderBy("_cell", "_sub").rowsBetween(Long.MinValue, 0L))
        - col("_n"))
      .select("_cell", "_sub", "_start")
    val uppers = buckets.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(cw => math.floor(n * (cw / wsum)).toLong)
      .dropRight(1) :+ n
    require((0L +: uppers) == (0L +: uppers).distinct.sorted,
      s"rankBuckets: thresholds $uppers not strictly increasing from 0 " +
        s"for n=$n (a bucket's share truncated to zero rows)")
    val rank = col("_start") + row_number().over(
      w.partitionBy("_cell", "_sub")
        .orderBy(col("_sc").asc_nulls_first, tieBreak.asc))
    val bucketExpr = buckets.map(_._1).zip(uppers).reverse
      .foldLeft(lit(null).cast("string")) { case (acc, (name, up)) =>
        when(col("_rank") <= up, lit(name)).otherwise(acc)
      }
    val out = withSub.join(broadcast(starts), Seq("_cell", "_sub"))
      .withColumn("_rank", rank)
      .withColumn("bucket", bucketExpr)
      .select((cols.map(col) :+ col("bucket")): _*)
    census0.unpersist(false)
    out
  }

  /** [[rankBuckets]]'s hot-cell sub-splitter: for each hot cell, a
    * bounded deterministic sample ([[sampleExactK]], TakeOrdered shape)
    * yields `subSplits` quantile boundaries on (score, tieBreak) as
    * plan literals; the returned column is the count of boundaries
    * strictly below the row's own (score, tieBreak) — monotone in the
    * ranking key, 0 for cold cells. Package-private so the spec can
    * assert sub-cell balance directly. `withCell` must carry `_sc` and
    * `_cell`. */
  private[graft] def hotSubColumn(withCell: DataFrame, tieBreak: Column,
                                hotCells: Array[Long],
                                subSplits: Int): Column = {
    val w = org.apache.spark.sql.expressions.Window
    val key = struct(col("_sc").as("s"), tieBreak.as("t"))
    hotCells.map { c =>
      val samp = withCell.where(col("_cell") === lit(c))
        .select(col("_sc").as("s"), tieBreak.as("t"))
      val sample = sampleExactK(samp,
        concat_ws(":", col("s").cast("string"), col("t").cast("string")),
        4096)
      val sTyp = sample.schema("s").dataType
      val tTyp = sample.schema("t").dataType
      // tiny frame: ntile window over <= 4096 rows is one small task
      val bounds = sample
        .withColumn("_q", ntile(subSplits).over(
          w.orderBy(col("s").asc_nulls_first, col("t").asc)))
        .groupBy("_q").agg(max(struct(col("s"), col("t"))).as("_b"))
        .orderBy("_q").select("_b").collect()
        .map(_.getStruct(0)).dropRight(1) // top ntile's max bounds nothing
      val subExpr =
        if (bounds.isEmpty) lit(0)
        else bounds.map { b =>
          val bl = struct(lit(b.get(0)).cast(sTyp).as("s"),
            lit(b.get(1)).cast(tTyp).as("t"))
          when(key > bl, 1).otherwise(0)
        }.reduce(_ + _)
      (c, subExpr)
    }.foldLeft(lit(0)) { case (acc, (c, e)) =>
      when(col("_cell") === lit(c), e).otherwise(acc)
    }
  }

  def assignShards(df: DataFrame, key: Column, numShards: Int,
                   seed: Long = 42L,
                   hash: Column => Column = xxhash64(_)): DataFrame = {
    require(numShards >= 1, s"numShards ($numShards) must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
    // NULL keys get a NULL hash under ANY hash function (xxhash64 maps
    // NULL to its seed, which would scatter them) -> shard 0, front
    val h = when(key.isNull, lit(null).cast("long"))
      .otherwise(hash(concat(key.cast("string"), lit(":"), lit(seed.toString))))
    df.withColumn("_h", h)
      .withColumn("shard", when(col("_h").isNull, lit(0))
        .otherwise(pmod(col("_h"), lit(numShards.toLong)).cast("int")))
      .withColumn("pos", row_number().over(
        w.partitionBy("shard")
          .orderBy(col("_h").asc_nulls_first, key.cast("string").asc))
        .cast("long") - 1L)
      .drop("_h")
  }
}
