package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents end to end (in id order within a
  * group) and cut fixed-capacity training sequences — GPT-style
  * concat-and-chunk, where documents may straddle pack boundaries. Each
  * document gets its pack coordinates; the trainer reassembles packs by
  * (group, pack_id, pack_offset).
  *
  * This is the streaming-fill formulation deliberately: it is exact,
  * loss-free (no padding waste beyond the final pack per group) and
  * expressible as ONE window cumulative sum — a single shuffle on the
  * group key. The alternative no-straddle greedy bin-fill is inherently
  * sequential per group (each placement depends on the previous bin
  * remainder) and cannot be partial-aggregated; pipelines that need
  * document-atomic packs should chunk long docs first
  * ([[TextAnalysis.chunkWords]]) and treat chunk = pack.
  *
  * Group by a real shard key (e.g. lang, source, or hash(doc_id) % S) so
  * the per-group window sort is bounded; the group is also the unit a
  * trainer shard reads, so co-locating it is what you want anyway. A
  * [[HotKeys.SkewGuard]] enforces that bound when the grouping is not
  * under the caller's control.
  */
object Packing {

  /** df + (tok_start, pack_id, pack_offset): the document's first token's
    * global position within its group's stream, the pack (sequence) index
    * that position falls in, and the offset inside that pack. Documents
    * longer than the remaining pack space continue into the next
    * pack(s) — `n_packs_spanned` reports how many packs the doc touches. */
  def packStream(df0: DataFrame, groupCol: String, idCol: String,
                 lenCol: String, capacity: Long,
                 guard: HotKeys.SkewGuard = HotKeys.SkewGuard.Off): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    // guard caps per-GROUP document counts ahead of the window sort (one
    // giant pack group is the skew hazard here — see HotKeys); default Off
    val df = HotKeys.applyGuard(df0, Seq(groupCol), guard, "packStream")
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("tok_start", (sum(col(lenCol)).over(w) - col(lenCol)).cast("long"))
      .withColumn("pack_id", floor(col("tok_start") / capacity).cast("long"))
      .withColumn("pack_offset", pmod(col("tok_start"), lit(capacity)).cast("long"))
      .withColumn("n_packs_spanned",
        (floor((col("tok_start") + greatest(col(lenCol), lit(1)) - 1) / capacity) -
          col("pack_id") + 1).cast("long"))
  }
}
