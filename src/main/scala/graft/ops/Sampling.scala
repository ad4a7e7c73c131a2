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
}
