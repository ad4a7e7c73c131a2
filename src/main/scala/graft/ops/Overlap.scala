package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-overlap measurement — the contamination / source-provenance
  * question ("how much of corpus B is already in corpus A?") asked at
  * corpus granularity rather than per-document ([[Dedup.decontaminate]]
  * answers the per-document form).
  *
  * Two paths, same discipline as the dedup family:
  *  - [[shingleOverlap]] — EXACT distinct-shingle Jaccard/containment.
  *    One shuffle keyed by 64-bit shingle id (map-side combine dedups
  *    within partitions first), then a single-row total — no shingle
  *    STRING ever crosses the wire.
  *  - [[corpusSignature]]/[[estimateJaccard]] — the 100-TB estimate: a
  *    k-slot corpus-level MinHash signature (component i = min over the
  *    corpus's shingle ids of hᵢ). Mergeable (min is associative), a few
  *    hundred bytes per corpus, so cross-corpus overlap matrices cost
  *    k·sides longs instead of a shingle-space shuffle; E[matching
  *    fraction] = Jaccard with σ = √(J(1-J)/k).
  */
object Overlap {

  /** Exact overlap of two corpora's distinct word-shingle sets: ONE row
    * (shingles_a, shingles_b, overlap, union_size, jaccard,
    * containment_a, containment_b). Containment_x = |A∩B| / |X| — the
    * asymmetric "fraction of X already covered" reading (0.0 for an
    * empty side). Shingle construction is [[Dedup.shingles]] (kernel,
    * per-doc distinct); ids come from `shingleId` (default xxhash64/31-
    * bit; pass [[Dedup.portableShingleId]] for SQL-oracle parity). */
  def shingleOverlap(a: DataFrame, b: DataFrame, textCol: String,
                     shingleN: Int = 3,
                     shingleId: Column => Column = Dedup.xxhashShingleId): DataFrame = {
    def ids(df: DataFrame) =
      df.select(explode(Dedup.shingles(col(textCol), shingleN)).as("sh"))
        .select(shingleId(col("sh")).as("id"))
    val tagged =
      ids(a).select(col("id"), lit(1).as("in_a"), lit(0).as("in_b"))
        .union(ids(b).select(col("id"), lit(0).as("in_a"), lit(1).as("in_b")))
    // one shuffle: membership flags OR-combine under max, partials first
    val marks = tagged.groupBy("id")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    marks.agg(
      sum("in_a").as("shingles_a"),
      sum("in_b").as("shingles_b"),
      sum(col("in_a") * col("in_b")).as("overlap"),
      count(lit(1)).as("union_size"))
      .select(col("shingles_a"), col("shingles_b"), col("overlap"), col("union_size"),
        when(col("union_size") > 0,
          Rounding.roundAt(col("overlap").cast("double") / col("union_size"), 6))
          .otherwise(lit(0.0)).as("jaccard"),
        when(col("shingles_a") > 0,
          Rounding.roundAt(col("overlap").cast("double") / col("shingles_a"), 6))
          .otherwise(lit(0.0)).as("containment_a"),
        when(col("shingles_b") > 0,
          Rounding.roundAt(col("overlap").cast("double") / col("shingles_b"), 6))
          .otherwise(lit(0.0)).as("containment_b"))
  }

  private val Mod = 2147483647L

  /** Corpus-level MinHash signature: ONE row `sig array<bigint>` where
    * sig[i] = min over every distinct shingle id x in the corpus of
    * (x·aᵢ + bᵢ) mod (2³¹−1) — the same affine family as the per-doc
    * [[Dedup.minhashSignature]], so signatures built anywhere in the
    * library compose. Computed as k min-aggregates in one partial-agg
    * pass: the shuffle carries k longs per partition. An empty corpus
    * yields NULL slots ([[estimateJaccard]] maps that to 0.0). */
  def corpusSignature(df: DataFrame, textCol: String, shingleN: Int = 3,
                      k: Int = 64, seed: Long = 42L,
                      shingleId: Column => Column = Dedup.xxhashShingleId): DataFrame = {
    val fam = Dedup.hashFamily(k, seed)
    val ids = df.select(explode(Dedup.shingles(col(textCol), shingleN)).as("sh"))
      .select(shingleId(col("sh")).as("id"))
    val slots = fam.zipWithIndex.map { case ((ha, hb), i) =>
      min(pmod(col("id") * ha + hb, lit(Mod))).as(s"_h$i")
    }
    ids.agg(slots.head, slots.tail: _*)
      .select(array((0 until k).map(i => col(s"_h$i")): _*).as("sig"))
  }

  /** Unigram-distribution divergence between two corpora: ONE row
    * (vocab_union, kl_ab, kl_ba, js_divergence) over the word unigram
    * distributions p (corpus a) and q (corpus b) — the corpus-mix drift
    * diagnostic ("did this snapshot's token distribution move?") where
    * [[shingleOverlap]] answers the set-overlap question. KL terms clamp
    * the OTHER side at `epsilon` (the finite-KL convention, as in
    * [[graft.checks.PsiDriftCheck]]); JS needs no clamp (the mixture is
    * positive wherever either side is) and is bounded by ln 2, so one
    * threshold works across corpus sizes. All three rounded to 4.
    *
    * Scale shape: ONE shuffle — both corpora's (term, side) counts
    * union into a single hash aggregation with map-side partial combine,
    * so only (term, two longs) rows cross the wire; the totals row rides
    * back as a lazy 1-row broadcast (the exchange is reused, not
    * rescanned). Tokenization is [[TextAnalysis.words]], matching every
    * other text operator (and the SQL oracle restatement). */
  def unigramDivergence(a: DataFrame, b: DataFrame, textCol: String,
                        epsilon: Double = 1e-9): DataFrame = {
    require(epsilon > 0.0, "epsilon must be positive (keeps KL finite)")
    def sided(df: DataFrame, ca: Int, cb: Int) =
      df.select(explode(TextAnalysis.words(col(textCol))).as("term"))
        .select(col("term"), lit(ca.toLong).as("ca"), lit(cb.toLong).as("cb"))
    val cnts = sided(a, 1, 0).union(sided(b, 0, 1))
      .groupBy("term").agg(sum("ca").as("ca"), sum("cb").as("cb"))
    val tot = cnts.agg(
      greatest(sum("ca"), lit(1L)).cast("double").as("na"),
      greatest(sum("cb"), lit(1L)).cast("double").as("nb"))
    val p = col("ca").cast("double") / col("na")
    val q = col("cb").cast("double") / col("nb")
    val m = (p + q) / 2.0
    val eps = lit(epsilon)
    cnts.crossJoin(broadcast(tot))
      .select(
        when(p > 0, p * log(p / greatest(q, eps))).otherwise(lit(0.0)).as("_ab"),
        when(q > 0, q * log(q / greatest(p, eps))).otherwise(lit(0.0)).as("_ba"),
        (when(p > 0, p * log(p / m)).otherwise(lit(0.0)) * 0.5 +
          when(q > 0, q * log(q / m)).otherwise(lit(0.0)) * 0.5).as("_js"))
      .agg(count(lit(1)).as("vocab_union"),
        coalesce(Rounding.roundAt(sum("_ab"), 4), lit(0.0)).as("kl_ab"),
        coalesce(Rounding.roundAt(sum("_ba"), 4), lit(0.0)).as("kl_ba"),
        coalesce(Rounding.roundAt(sum("_js"), 4), lit(0.0)).as("js_divergence"))
  }

  /** Jaccard estimate from two [[corpusSignature]] rows: the fraction of
    * equal components, rounded to 6. Returns ONE row (n_equal,
    * est_jaccard). Both inputs are single rows, so the join is a lazy
    * 1-row broadcast cross — nothing scans twice. */
  def estimateJaccard(sigA: DataFrame, sigB: DataFrame): DataFrame = {
    val joined = sigA.select(col("sig").as("sig_a"))
      .crossJoin(broadcast(sigB.select(col("sig").as("sig_b"))))
    joined.select(
      coalesce(size(filter(zip_with(col("sig_a"), col("sig_b"),
        (x, y) => x.isNotNull && y.isNotNull && x === y), b => b)), lit(0))
        .as("n_equal"),
      when(size(col("sig_a")) > 0,
        Rounding.roundAt(
          size(filter(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => x.isNotNull && y.isNotNull && x === y), b => b))
            .cast("double") / size(col("sig_a")), 6))
        .otherwise(lit(0.0)).as("est_jaccard"))
  }
}
