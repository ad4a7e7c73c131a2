package graft.streaming

import graft.Validator
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous validation over Structured Streaming sources: the same
  * compiled constraint Columns applied to a stream (`readStream` →
  * validate → `writeStream`), with watermarked windowed verdicts.
  *
  * The row-level validator is a stateless narrow projection, so it adds
  * no state store; only the verdict aggregation keeps (window × part)
  * state, bounded by the watermark. At production scale the violations
  * stream appends straight to the violations table while verdicts upsert
  * per (window, part) — the streaming twin of the batch pipeline's
  * outputs (FIXTURES.md §5).
  */
object StreamingValidation {

  /** Stream + `valid`/`errors` columns (stateless). */
  def withValidation(stream: DataFrame, validator: Validator): DataFrame =
    validator.withValidation(stream)

  /** One violation row per error, with the event time carried through. */
  def violations(stream: DataFrame, validator: Validator,
                 idCol: String, tsCol: String): DataFrame =
    withValidation(stream, validator)
      .where(!col("valid"))
      .select(col(idCol), col(tsCol), explode(col("errors")).as("error"))
      .select(
        col(idCol), col(tsCol),
        col("error.path").as("path"),
        col("error.keyword").as("keyword"),
        col("error.message").as("message"),
        col("error.additionalProperties").as("additional_properties"))

  /** Streaming twin of [[graft.checks.ReferentialBloomCheck]]: flag
    * events whose FK is DEFINITELY absent from a (persisted) dimension
    * filter blob. Stateless — the blob rides as a literal, the probe is
    * a per-row hash with no joins and no state store — so it composes
    * with any output mode and never grows with the key universe; refresh
    * the filter by restarting the query with a newer blob (the
    * [[graft.pipeline.IndexStore]] "bloom" profile). */
  def streamingReferentialBloom(stream: DataFrame, filterBlob: Array[Byte],
                                fkCol: String): DataFrame = {
    graft.sketch.BloomSketch.deserialize(filterBlob) // validate up front
    stream.where(!graft.sketch.BloomFunctions.bloom_contains(
      lit(filterBlob), col(fkCol).cast("string")))
  }

  /** Cross-batch exact dedup for streams with per-batch drop metrics:
    * the stateless Bloom probe ([[graft.ops.Dedup.dropSeenExact]]
    * semantics — NULL keys never drop) plus a named `observe`
    * observation counting each micro-batch's input and dropped rows
    * BEFORE the filter. The observation is Spark's native per-batch
    * accumulator surface: it costs one map-side count, adds no state
    * store and no second sink, and lands in every
    * `StreamingQueryProgress.observedMetrics` — feed those through
    * [[observationMetrics]] into [[graft.checks.MetricsAnomaly]] so a
    * batch whose drop rate jumps (a re-crawl looping over yesterday's
    * corpus, or an upstream id bug hashing everything identical) flags
    * as dedup drift instead of silently shrinking the corpus. */
  def streamingDedupExact(stream: DataFrame, keyCol: String,
                          index: Array[Byte],
                          observation: String = "graft_dedup"): DataFrame = {
    graft.sketch.BloomSketch.deserialize(index) // validate geometry early
    val key = col(keyCol)
    // three-valued-safe: NULL key → isNotNull false → seen FALSE (never
    // NULL), so the observe sum and the keep filter agree on every row
    val seen = key.isNotNull &&
      graft.sketch.BloomFunctions.bloom_contains(lit(index), key)
    stream
      .observe(observation,
        count(lit(1)).as("rows_in"),
        sum(when(seen, 1L).otherwise(0L)).as("rows_dropped"))
      .where(!seen)
  }

  /** Flatten a query's progress observations into the (run, metric,
    * value) metrics-history shape [[graft.checks.MetricsAnomaly]]
    * consumes: one row per (batchId, observed column), e.g.
    * (7, "rows_dropped", 123.0). Pass `query.recentProgress` (or the
    * accumulation from a `StreamingQueryListener`); batches that carried
    * no data emit no observation and are skipped. Driver-side by
    * construction — progress objects are already driver-local and one
    * per micro-batch, so this never touches executor data. */
  def observationMetrics(spark: org.apache.spark.sql.SparkSession,
                         progresses: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress],
                         observation: String): DataFrame = {
    val rows = for {
      p <- progresses
      row <- Option(p.observedMetrics.get(observation)).toSeq
      f <- row.schema.fields
    } yield (p.batchId, f.name,
      row.getAs[Any](f.name) match {
        case null      => Option.empty[Double]
        case n: Number => Some(n.doubleValue())
        case other     => throw new IllegalArgumentException(
          s"observed metric ${f.name} is non-numeric: $other")
      })
    import spark.implicits._
    rows.toDF("batch_id", "metric", "value")
  }

  /** A duplicate-key sighting emitted by [[streamingDuplicates]]. */
  final case class DupEvent(key: String, occurrence: Long)

  /** Stateful streaming uniqueness: the streaming twin of
    * [[graft.checks.UniquenessCheck]] via `flatMapGroupsWithState` —
    * per-key custom state (occurrence count) with an event-time timeout so
    * state is bounded by the watermark, not by the key universe. Emits one
    * [[DupEvent]] per re-occurrence of a key inside the retention window
    * (occurrence = 2, 3, …; first sightings are silent).
    *
    * At 10^12-sequence scale the state store only ever holds keys seen
    * within the watermark horizon; the shuffle is the standard
    * groupByKey hash exchange on the key.
    */
  def streamingDuplicates(stream: DataFrame, keyCol: String, tsCol: String,
                          watermarkDelay: String = "10 minutes"): Dataset[DupEvent] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withWatermark(tsCol, watermarkDelay)
      // the watermarked event-time column must reach the stateful operator
      // for EventTimeTimeout to be legal
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).as("ts"))
      // drop null keys AND null event times: a NULL ts reaching the
      // stateful operator would NPE on ts.getTime and kill the whole
      // streaming query on one malformed record
      .where(col("key").isNotNull && col("ts").isNotNull)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), DupEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp)],
         state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (prior, priorMaxTs) = state.getOption.getOrElse((0L, 0L))
            var batch = 0L
            var maxTs = priorMaxTs
            rows.foreach { case (_, ts) =>
              batch += 1
              if (ts.getTime > maxTs) maxTs = ts.getTime
            }
            val total = prior + batch
            state.update((total, maxTs))
            // evict when the watermark passes this key's LAST sighting plus
            // the retention delay — anchored to the key's own event time,
            // not the current watermark, so duplicates anywhere inside the
            // retention window are caught and first-batch keys (watermark
            // still 0) get a timeout too
            try state.setTimeoutTimestamp(maxTs, watermarkDelay)
            catch { case _: IllegalArgumentException =>
              // key's horizon already behind the watermark → evict ASAP
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
            }
            // occurrences prior+2 .. total are duplicates (the first
            // sighting of the key is occurrence 1 and stays silent)
            val firstDup = math.max(prior + 1, 2L)
            (firstDup to total).iterator.map(DupEvent(key, _))
          }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        Encoders.product[DupEvent])
  }

  /** Watermarked per-window KS drift against a PERSISTED profile sketch:
    * the streaming twin of [[graft.checks.SketchDriftCheck]]. Each window
    * aggregates one KLL sketch per (window × part) — the only state, and
    * it is bounded by the watermark — and the KS distance against the
    * profile blob is computed INSIDE the plan by `kll_ks`, so nothing is
    * collected to the driver. Emits (window, part, check, passed,
    * violation_count, metric_value), the batch verdict shape plus the
    * window. */
  def windowedSketchDrift(stream: DataFrame, column: String,
                          referenceSketch: Array[Byte],
                          tsCol: String, partCol: String,
                          threshold: Double = 0.05,
                          windowDuration: String = "1 minute",
                          watermarkDelay: String = "2 minutes"): DataFrame = {
    import graft.sketch.{functions => gf}
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(partCol).as("part"))
      .agg(gf.kll_sketch(col(column).cast("double")).as("sketch"))
      // project the KS distance ONCE: kll_ks deserializes both sketches,
      // and a multiply-referenced non-cheap alias is kept un-inlined by
      // CollapseProject, so `passed` and `metric_value` share one eval
      .withColumn("_ks", gf.kll_ks(col("sketch"), lit(referenceSketch)))
      .select(
        col("window"), col("part"),
        lit(s"drift_kll_ks:$column").as("check"),
        (col("_ks") <= threshold).as("passed"),
        lit(0L).as("violation_count"),
        col("_ks").as("metric_value"))
  }

  /** Watermarked per-window categorical drift against a persisted
    * frequency profile: the streaming twin of
    * [[graft.checks.FreqDriftCheck]], same shape as
    * [[windowedSketchDrift]] — bounded per-(window × part) sketch state,
    * chi² computed in-plan via `freq_chi2`. */
  def windowedFreqDrift(stream: DataFrame, column: String,
                        referenceSketch: Array[Byte],
                        tsCol: String, partCol: String,
                        threshold: Double,
                        capacity: Int = graft.sketch.FreqSketch.DefaultCapacity,
                        windowDuration: String = "1 minute",
                        watermarkDelay: String = "2 minutes"): DataFrame = {
    import graft.sketch.FreqFunctions
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(partCol).as("part"))
      .agg(FreqFunctions.freq_sketch(col(column).cast("string"), capacity)
        .as("sketch"))
      .withColumn("_chi2", FreqFunctions.freq_chi2(col("sketch"), lit(referenceSketch)))
      .select(
        col("window"), col("part"),
        lit(s"drift_freq_chi2:$column").as("check"),
        (col("_chi2") <= threshold).as("passed"),
        lit(0L).as("violation_count"),
        col("_chi2").as("metric_value"))
  }

  /** Watermarked per-window PSI drift against a persisted frequency
    * profile — [[graft.checks.PsiDriftCheck]]'s streaming twin, riding
    * the same mergeable sketch aggregate as [[windowedFreqDrift]]; PSI's
    * scale-freeness matters most here, where window populations vary
    * with traffic but the threshold must not. */
  def windowedPsiDrift(stream: DataFrame, column: String,
                       referenceSketch: Array[Byte],
                       tsCol: String, partCol: String,
                       threshold: Double = 0.25,
                       capacity: Int = graft.sketch.FreqSketch.DefaultCapacity,
                       windowDuration: String = "1 minute",
                       watermarkDelay: String = "2 minutes"): DataFrame = {
    import graft.sketch.FreqFunctions
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(partCol).as("part"))
      .agg(FreqFunctions.freq_sketch(col(column).cast("string"), capacity)
        .as("sketch"))
      .withColumn("_psi", FreqFunctions.freq_psi(col("sketch"), lit(referenceSketch)))
      .select(
        col("window"), col("part"),
        lit(s"drift_freq_psi:$column").as("check"),
        (col("_psi") <= threshold).as("passed"),
        lit(0L).as("violation_count"),
        col("_psi").as("metric_value"))
  }

  /** Watermarked per-window verdicts: (window, part, passed,
    * violation_count, rows). */
  def windowedVerdicts(stream: DataFrame, validator: Validator,
                       tsCol: String, partCol: String,
                       windowDuration: String = "1 minute",
                       watermarkDelay: String = "2 minutes"): DataFrame =
    withValidation(stream, validator)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(partCol))
      .agg(
        bool_and(col("valid")).as("passed"),
        sum(when(col("valid"), 0L).otherwise(size(col("errors")).cast("long")))
          .as("violation_count"),
        count(lit(1)).as("rows_validated"))
}
