package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — the two non-equi join shapes a feature /
  * training-data pipeline needs constantly (attach the latest reference
  * state to each event; attach interval attributes to points) and that
  * Spark has no native operator for. Both are re-expressed as EQUI joins
  * so Catalyst plans hash exchanges instead of the O(n·m)
  * BroadcastNestedLoopJoin a naive non-equi condition degenerates to.
  */
object TemporalJoins {

  /** As-of join: for every left row, the single right row of the same
    * key with the greatest `tsCol` <= the left row's `tsCol` (NULL-filled
    * columns when no right row precedes it — a LEFT as-of join).
    *
    * Implementation: tag and union the two sides, then one window pass
    * per key ordered by (ts, side) — right rows sort BEFORE left rows at
    * equal timestamps, so an exactly-simultaneous right row matches — and
    * carry the last non-null right payload forward
    * (`last(_, ignoreNulls)` over rows unbounded-preceding..current).
    *
    * Scale shape: ONE shuffle, on the key, of (narrow left ∪ narrow
    * right); the sort is per-key, never global. This beats the classic
    * per-left-row range join at 100 TB because each left row is touched
    * once — there is no candidate multiplication at all. Skew: a
    * degenerate key serializes into one task's sort — pass a
    * [[HotKeys.SkewGuard]] to detect and raise or drop-and-route it
    * (the window-sort mirror of the LSH hot-bucket guard).
    *
    * Right rows must be unique per (key, ts) — with duplicates the carry
    * picks the last in an unspecified tie order; pre-aggregate (e.g.
    * `keepCanonical`) if the source can produce ties.
    *
    * `guard` caps the COMBINED (left ∪ right) per-key row count ahead of
    * the window sort (see [[HotKeys]]); default Off. Under
    * [[HotKeys.SkewGuard.Drop]] a hot key's LEFT rows are absent from
    * the output too (not NULL-filled) — recover them via
    * [[HotKeys.hotKeys]] on the union and route separately. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rightCols: Seq[String],
               prefix: String = "asof_",
               guard: HotKeys.SkewGuard = HotKeys.SkewGuard.Off): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin needs at least one right column")
    val payload = struct(rightCols.map(col): _*)
    val leftCols = left.columns.toSeq
    val l = left.withColumn("_pay", lit(null).cast(
      right.select(payload).schema.head.dataType)).withColumn("_side", lit(1))
    // a NULL-ts right row would sort FIRST (ascending nulls-first) and be
    // carried into every left row preceding the first real mark — it can
    // match nothing under "greatest ts <= left.ts", so drop it up front
    val r = right.where(col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol), payload.as("_pay"))
      .withColumn("_side", lit(0))
    // align columns for the union: left's extra columns are NULL on the
    // right side and dropped again after the window
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (c == keyCol || c == tsCol) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) :+ col("_pay") :+ col("_side")): _*)
    val unioned = HotKeys.applyGuard(
      l.select((leftCols.map(col) :+ col("_pay") :+ col("_side")): _*)
        .unionByName(rAligned),
      Seq(keyCol), guard, "asofJoin")

    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_match", last(col("_pay"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    rightCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"$prefix$c", col(s"_match.$c"))
    }.drop("_pay", "_side", "_match")
  }

  /** Range join: points `pCol` matched to intervals `[loCol, hiCol)` by
    * bucketizing — intervals explode into the fixed-width buckets they
    * overlap, points compute their single bucket, and Catalyst plans a
    * plain hash equi-join on the bucket before the exact bounds filter.
    *
    * Scale shape: interval fan-out = ceil(span / bucketWidth) + 1 rows
    * per interval — pick `bucketWidth` near the typical interval span so
    * the fan-out is small; the alternative (a raw `p >= lo && p < hi`
    * join condition) plans as BroadcastNestedLoopJoin, which is O(n·m)
    * and the thing this operator exists to avoid. Returns the inner
    * join of all point columns with all interval columns. */
  def rangeJoin(points: DataFrame, pCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("_bucket", floor(col(pCol) / bucketWidth))
    val ib = intervals.withColumn("_bucket",
      explode(sequence(floor(col(loCol) / bucketWidth),
        floor(col(hiCol) / bucketWidth))))
    pb.join(ib, Seq("_bucket"))
      .where(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("_bucket")
  }
}
