package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Shared surface for the [[graft.compile.Opaque]] optimizer barrier:
  * wrap a derived column that a downstream filter references so
  * predicate pushdown cannot duplicate its (expensive) defining
  * expression below the projection — the `withColumn(x, costly)
  * .where(x >= t)` pattern otherwise evaluates `costly` once in the
  * pushed filter AND once in the projection, per row. Zero runtime
  * cost; projection-only (the analyzer rejects non-deterministic
  * expressions in joins and aggregate functions). */
object Barrier {
  def opaque(c: Column): Column =
    ColumnBridge.column(graft.compile.Opaque(ColumnBridge.expression(c)))
}
