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
