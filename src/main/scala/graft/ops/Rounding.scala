package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.round

/** Oracle-compatible double rounding: `round(x·10ⁿ)/10ⁿ`.
  *
  * Spark's native `round(x, n)` on doubles rounds the EXACT binary
  * expansion (BigDecimal), while C-family engines (DuckDB among them,
  * fuzz-verified) round the scaled double. The two disagree precisely at
  * representation boundaries — e.g. x = 0.9452499999999999 (the closest
  * double to several rationals): x·10⁴ rounds UP to exactly 9452.5, so
  * the scaled form gives 0.9453 while the exact expansion gives 0.9452.
  * Every rounded metric the driver gate hash-compares goes through this
  * helper so both engines make the identical decision on the identical
  * double. (Half-up vs half-away-from-zero also agree here: both round
  * .5 away from zero for either sign.)
  */
object Rounding {
  def roundAt(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    round(c * p) / p
  }
}
