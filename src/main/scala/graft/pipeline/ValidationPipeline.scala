package graft.pipeline

import graft.checks.{Check, CheckResult}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end validation run: filter uncommitted partitions → evaluate all
  * checks → write violations + verdicts partitioned by `part` → commit each
  * partition to the checkpoint (SURVEY.md §7.1 steps 3-5).
  *
  * Resume contract: partitions present in the checkpoint are excluded from
  * the scan with a literal NOT-IN filter on the partition column, which the
  * datasource prunes at planning time (no data read for committed parts).
  * Output writes use dynamic partition overwrite so a crash between write
  * and commit re-runs idempotently: the re-run overwrites exactly the
  * partitions it recomputes, never duplicating rows.
  *
  * The `tokens` column is never projected through a transformation — checks
  * only read it — so the per-row byte-identity invariant of BASELINE.json
  * input_hint holds by construction (asserted in PipelineSpec).
  */
final case class PipelineConfig(
    checkpointDir: String,
    outputDir: String,
    partCol: String = Check.PartCol,
    lineage: String = "")

final case class PipelineResult(
    violations: DataFrame,
    verdicts: DataFrame,
    processedParts: Seq[Int],
    skippedParts: Seq[Int],
    rowsValidated: Long)

final class ValidationPipeline(checks: Seq[Check], cfg: PipelineConfig) {

  def run(input: DataFrame): PipelineResult = {
    val spark = input.sparkSession
    val checkpoint = new Checkpoint(cfg.checkpointDir)
    val committed = checkpoint.committedParts()

    val pending =
      if (committed.isEmpty) input
      else input.where(!col(cfg.partCol).isin(committed.toSeq: _*))

    val partCounts = pending.groupBy(col(cfg.partCol)).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (partCounts.isEmpty) {
      return PipelineResult(
        Check.emptyViolations(spark),
        spark.emptyDataFrame,
        Seq.empty, committed.toSeq.sorted, 0L)
    }

    val pendingParts = partCounts.keys.toSeq.sorted

    val t0 = System.nanoTime()
    // global checks see the full input (cross-partition semantics) but
    // report only for pending partitions; local checks scan pending only.
    // The partition universe is injected so no check repeats the
    // discovery scan this pipeline already did (withKnownParts).
    val results: Seq[CheckResult] = checks.map(_.withKnownParts(pendingParts)).map { c =>
      if (c.isGlobal && committed.nonEmpty) {
        val r = c.run(input)
        CheckResult(
          r.violations.where(col("part").isin(pendingParts: _*)),
          r.verdicts.where(col("part").isin(pendingParts: _*)))
      } else c.run(pending)
    }
    val violations = results.map(_.violations).reduce(_ unionAll _)
    val verdicts = results.map(_.verdicts).reduce(_ unionAll _)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    violations.write.mode("overwrite").partitionBy("part")
      .parquet(s"${cfg.outputDir}/violations")
    verdicts.write.mode("overwrite").partitionBy("part")
      .parquet(s"${cfg.outputDir}/verdicts")

    val elapsed = (System.nanoTime() - t0) / 1e9
    val totalRows = partCounts.values.sum
    val rate = if (elapsed > 0) totalRows / elapsed else 0.0

    pendingParts.foreach { p =>
      checkpoint.commit(PartCommit(p, partCounts(p), rate, cfg.lineage))
    }

    PipelineResult(violations, verdicts,
      pendingParts, committed.toSeq.sorted, totalRows)
  }
}
