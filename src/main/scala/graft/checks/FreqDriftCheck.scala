package graft.checks

import graft.sketch.{FreqFunctions, FreqSketch}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Categorical drift against a PERSISTED frequency profile — the
  * [[SketchDriftCheck]] twin for string columns: the reference side is a
  * serialized [[FreqSketch]] (built once from a clean sample, stored in
  * the profile/checkpoint table), the observed side aggregates one
  * bounded sketch per partition (partial+final hash agg; the shuffle
  * carries blobs, never the category key space), and a chi²-style
  * statistic over the PROFILE's categories is computed driver-side on
  * the collected blobs.
  *
  * The statistic is restricted to the profile's surviving categories
  * (both distributions renormalized over them) — that is what a bounded
  * sketch can support honestly, and for drift purposes the profile
  * defines the contract: a category the clean profile never surfaced is
  * drift the moment it carries mass, which the restricted statistic
  * reflects through the shrunken observed share of profiled categories.
  * Arithmetic is rational (no transcendentals), so a SQL oracle can
  * restate it exactly.
  */
final case class FreqDriftCheck(
    column: String,
    referenceSketch: Array[Byte],
    threshold: Double,
    capacity: Int = FreqSketch.DefaultCapacity,
    partCol: String = Check.PartCol) extends Check {

  val name = s"drift_freq_chi2:$column"

  def run(df: DataFrame): CheckResult = {
    val spark = df.sparkSession
    val ref = FreqSketch.deserialize(referenceSketch)

    val perPart = df
      .where(col(partCol).isNotNull)
      .groupBy(col(partCol).cast(IntegerType).as("part"))
      .agg(FreqFunctions.freq_sketch(col(column), capacity).as("sketch"))
      .collect()

    val rows = perPart.toSeq.filterNot(_.isNullAt(0)).map { r =>
      val obs = FreqSketch.deserialize(r.getAs[Array[Byte]]("sketch"))
      val chi2 = FreqDriftCheck.chiSquare(obs, ref)
      Row(r.getInt(0), name, chi2 <= threshold, 0L, chi2)
    }

    val schema = StructType(Seq(
      StructField("part", IntegerType),
      StructField("check", StringType),
      StructField("passed", BooleanType),
      StructField("violation_count", LongType),
      StructField("metric_value", DoubleType)))
    import scala.jdk.CollectionConverters._
    CheckResult(Check.emptyViolations(spark),
      spark.createDataFrame(rows.asJava, schema))
  }
}

object FreqDriftCheck {
  /** Build a reference profile sketch from a clean sample (run once,
    * persist the bytes in the profile/checkpoint table). */
  def buildProfile(df: DataFrame, column: String,
                   capacity: Int = FreqSketch.DefaultCapacity): Array[Byte] =
    df.agg(FreqFunctions.freq_sketch(col(column), capacity))
      .head().getAs[Array[Byte]](0)

  /** Chi²-style statistic over the reference's categories: expected cell
    * mass = ref share × observed total over those categories, with the
    * standard 0.5 expected-count floor ([[Chi2DriftCheck]] uses the
    * same). Deterministic: cells are summed in sorted category order. */
  def chiSquare(obs: FreqSketch, ref: FreqSketch): Double = {
    val cats = ref.topK(ref.size).sortBy(_._1)
    val refTotal = cats.map(_._2).sum.toDouble
    if (refTotal == 0) return 0.0
    val o = cats.map { case (t, _, _) => obs.countIfPresent(t).getOrElse(0L).toDouble }
    val n = o.sum
    cats.zip(o).map { case ((_, r, _), oi) =>
      val e = (r / refTotal) * n
      math.pow(oi - e, 2) / math.max(e, 0.5)
    }.sum
  }
}
