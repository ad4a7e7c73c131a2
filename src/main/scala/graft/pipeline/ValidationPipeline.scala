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
    lineage: String = "",
    /** Schema contract pre-flight: when set, [[ValidationPipeline.run]]
      * diffs the input's ACTUAL schema against this reference
      * ([[graft.checks.SchemaDrift]]) BEFORE planning any job and throws
      * on drift — zero scans, so a silently-retyped or dropped column
      * aborts the run before a 100-TB pass is paid for (the value-level
      * checks can stay green while every downstream consumer breaks). */
    referenceSchema: Option[org.apache.spark.sql.types.StructType] = None,
    /** Violation-output cap: when set, at most this many violation ROWS
      * are written per (part, check) — the deterministic first K by the
      * full violation row ordering (doc_id, path, keyword, message,
      * additional_properties). At 10^12 rows a poisoned source (a schema
      * break every value-check flags, an upstream rewrite that corrupts
      * every doc_id) makes the violations table INPUT-sized: the error
      * path of the run writes petabytes and dominates its cost exactly
      * when the run should be failing fast. Verdicts keep the EXACT
      * `violation_count` either way (they aggregate the check output,
      * not the written sample). The selection is the two-phase salted
      * top-K (see [[ValidationPipeline.capViolations]]) so an
      * all-rows-red partition never serializes into one task. */
    maxViolationsPerPart: Option[Int] = None)

final case class PipelineResult(
    violations: DataFrame,
    verdicts: DataFrame,
    processedParts: Seq[Int],
    skippedParts: Seq[Int],
    rowsValidated: Long)

final class ValidationPipeline(checks: Seq[Check], cfg: PipelineConfig) {
  import org.apache.spark.sql.types.DoubleType

  def run(input0: DataFrame): PipelineResult = {
    // schema-contract pre-flight: driver-side metadata only, fail fast
    cfg.referenceSchema.foreach(ref =>
      graft.checks.SchemaDrift.check(input0, ref, failOnDrift = true))
    val spark = input0.sparkSession
    val checkpoint = new Checkpoint(cfg.checkpointDir)
    val committed = checkpoint.committedParts()

    // Fail fast on NULL / non-castable partition values: the guard rides
    // the scan of EVERY job over the input (checks, violation/verdict
    // writes, row counts), so the first job touching a poisoned row
    // aborts with a clear message before any output partition for it can
    // commit. Silently dropping such rows would skip validation for
    // them, and letting a null group through used to NPE during
    // commit-metadata collection AFTER the output writes. The dynamic
    // partition overwrite keeps an aborted run idempotent on re-run.
    val partInt = col(cfg.partCol).cast("int")
    val input = input0.where(
      when(col(cfg.partCol).isNull || partInt.isNull,
        raise_error(concat(
          lit(s"graft: NULL or non-castable '${cfg.partCol}' partition value: "),
          coalesce(col(cfg.partCol).cast("string"), lit("NULL")))).cast("boolean"))
        .otherwise(lit(true)))

    val pending =
      if (committed.isEmpty) input
      else input.where(!col(cfg.partCol).isin(committed.toSeq: _*))

    // Resume fast path: when everything is already committed, learn it
    // from a first-row probe (stops at the first pending row) instead of
    // scanning anything further. Fresh runs skip even the probe.
    if (committed.nonEmpty && pending.isEmpty) {
      return PipelineResult(
        Check.emptyViolations(spark),
        spark.emptyDataFrame,
        Seq.empty, committed.toSeq.sorted, 0L)
    }

    // Per-partition row counts, LAZY and cached: the aggregation runs
    // inside the verdict write job (one shared subtree, cached for the
    // other consumers below) instead of a dedicated eager full-input
    // pre-count job — at 10^12 rows that job was a whole extra pass made
    // solely for commit metadata. The same frame doubles as (a) the
    // `row_count` verdict rows, (b) the partition universe injected into
    // every check, and (c) the commit metadata collected from cache after
    // the writes.
    val rowCounts = pending
      .groupBy(col(cfg.partCol).cast("int").as("part"))
      .agg(count(lit(1)).as("n_rows"))
      .persist()
    val universe = rowCounts.select(col("part"))
    val rowCountVerdicts = rowCounts.select(
      col("part"),
      lit("row_count").as("check"),
      lit(true).as("passed"),
      lit(0L).as("violation_count"),
      col("n_rows").cast(DoubleType).as("metric_value"))

    val t0 = System.nanoTime()
    // global checks see the full input (cross-partition semantics) but
    // report only for uncommitted partitions; local checks scan pending
    // only. The universe frame is injected so no check repeats discovery.
    val results: Seq[CheckResult] = checks.map(_.withPartsUniverse(universe)).map { c =>
      if (c.isGlobal && committed.nonEmpty) {
        val r = c.run(input)
        CheckResult(
          r.violations.where(!col("part").isin(committed.toSeq: _*)),
          r.verdicts.where(!col("part").isin(committed.toSeq: _*)))
      } else c.run(pending)
    }
    val violationsAll = results.map(_.violations).reduce(_ unionAll _)
    val violations = cfg.maxViolationsPerPart match {
      case Some(k) => ValidationPipeline.capViolations(violationsAll, k)
      case None    => violationsAll
    }
    val verdicts = (results.map(_.verdicts) :+ rowCountVerdicts).reduce(_ unionAll _)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // The two output tables are INDEPENDENT jobs writing disjoint paths —
    // submit them from two driver threads so the verdict job's tasks
    // back-fill executors freed by the violation job's straggler tail
    // (guide §2.6 overlap-independent-jobs; actions were only sequential
    // because this code called them sequentially). Output bytes, paths
    // and commit semantics are unchanged; a failure in either write
    // fails the run before any partition commits, exactly as before.
    val vioErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val vioThread = new Thread(() =>
      try violations.write.mode("overwrite").partitionBy("part")
        .parquet(s"${cfg.outputDir}/violations")
      catch { case t: Throwable => vioErr.set(t) })
    vioThread.start()
    try verdicts.write.mode("overwrite").partitionBy("part")
      .parquet(s"${cfg.outputDir}/verdicts")
    finally vioThread.join()
    if (vioErr.get() != null) throw vioErr.get()

    val elapsed = (System.nanoTime() - t0) / 1e9
    // commit metadata comes from the cache the verdict write populated —
    // a KB-sized read, not another input scan
    val partCounts = rowCounts.collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rowCounts.unpersist(false)
    val pendingParts = partCounts.keys.toSeq.sorted
    val totalRows = partCounts.values.sum
    val rate = if (elapsed > 0) totalRows / elapsed else 0.0

    pendingParts.foreach { p =>
      checkpoint.commit(PartCommit(p, partCounts(p), rate, cfg.lineage))
    }

    PipelineResult(violations, verdicts,
      pendingParts, committed.toSeq.sorted, totalRows)
  }
}

object ValidationPipeline {
  /** Deterministic first-K violation rows per (part, check), ordered by
    * the full violation row (doc_id, path, keyword, message,
    * additional_properties — NULLs first, a total order up to fully
    * identical rows, which are interchangeable).
    *
    * Two-phase because one window over (part, check) is a skew cliff:
    * the group cardinality is tiny and an all-rows-red partition would
    * funnel 10^9 rows into ONE reducer's sort — the same degenerate
    * input this cap exists for. Phase 1 ranks within (part, check,
    * salt-of-row) across `Salts` reducers and keeps ≤ K per salt; phase
    * 2 ranks the ≤ Salts·K survivors per (part, check). Every global
    * top-K row ranks ≤ K within its own salt bucket, so phase 1 never
    * drops a final selection. */
  private[pipeline] val Salts = 64

  def capViolations(v: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"maxViolationsPerPart ($k) must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val ord = Seq("doc_id", "path", "keyword", "message",
      "additional_properties").map(c => col(c).asc_nulls_first)
    val salt = pmod(xxhash64(col("doc_id"), col("path"), col("keyword"),
      col("message"), col("additional_properties")), lit(Salts))
    val phase1 = v
      .withColumn("_vr", org.apache.spark.sql.functions.row_number()
        .over(Window.partitionBy(col("part"), col("check"), salt)
          .orderBy(ord: _*)))
      .where(col("_vr") <= k).drop("_vr")
    phase1
      .withColumn("_vr", org.apache.spark.sql.functions.row_number()
        .over(Window.partitionBy(col("part"), col("check"))
          .orderBy(ord: _*)))
      .where(col("_vr") <= k).drop("_vr")
  }
}
