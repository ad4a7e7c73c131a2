package graft.ext

import graft.compile.ArrayBoundsCheck
import graft.sketch.{KllCdf, KllKsDistance, KllQuantiles, KllSketch, KllSketchAgg}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** SQL surface for the engine's custom Catalyst expressions, registered
  * the idiomatic way: `spark.sql.extensions=graft.ext.GraftExtensions` at
  * session build (spark-submit `--conf`), or [[GraftFunctions.register]]
  * on a live session.
  *
  * Registered functions:
  *  - `kll_sketch(col[, k])`            → binary (serialized KLL sketch)
  *  - `kll_quantiles(sketch, probs)`    → array<double>, probs a foldable
  *    array literal, e.g. `kll_quantiles(kll_sketch(v), array(0.5, 0.9))`
  *  - `kll_cdf(sketch, points)`         → array<double>
  *  - `kll_ks(a, b)`                    → double, two-sample KS distance
  *  - `freq_sketch(col[, capacity])`    → binary (space-saving heavy hitters)
  *  - `freq_topk(sketch, n)`            → array<struct<term,estimate,max_error>>
  *  - `freq_chi2(observed, reference)`  → double, restricted chi² drift
  *    (ORDER-SENSITIVE: cells come from the reference profile)
  *  - `graft_nfc(str)`                  → string, Unicode NFC composition
  *  - `array_bounds(arr, lo, hi)`       → boolean, the fused single-pass
  *    bounds check (inclusive; NULL elements skipped)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    // rewrite forall(arr, x -> bounds) into the fused codegen expression
    ext.injectOptimizerRule(_ => FuseArrayBounds)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  /** Evaluate a foldable array-of-numeric argument at analysis time. */
  private def foldDoubles(e: Expression, arg: String, fn: String): Seq[Double] = {
    require(e.foldable, s"$fn: $arg must be a foldable array literal")
    val dt = e.dataType match {
      case ArrayType(et, _) => et
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be array<double>, got ${other.simpleString}")
    }
    val arr = e.eval().asInstanceOf[ArrayData]
    arr.toObjectArray(dt).map {
      case d: java.lang.Double => d.doubleValue()
      case f: java.lang.Float => f.doubleValue()
      case i: java.lang.Integer => i.doubleValue()
      case l: java.lang.Long => l.doubleValue()
      case d: Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: non-numeric element $other in $arg")
    }.toSeq
  }
  private type Decimal = org.apache.spark.sql.types.Decimal

  private def foldLong(e: Expression, arg: String, fn: String): Long = {
    require(e.foldable, s"$fn: $arg must be a literal")
    e.eval() match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integral literal, got $other")
    }
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("kll_sketch"),
      info("kll_sketch", "kll_sketch(col[, k]) - mergeable KLL quantile sketch (binary)"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => KllSketchAgg(Cast(c, DoubleType))
        case Seq(c, k) =>
          KllSketchAgg(Cast(c, DoubleType), foldLong(k, "k", "kll_sketch").toInt)
        case _ => throw new IllegalArgumentException(
          "kll_sketch expects (col[, k])")
      }),

    (FunctionIdentifier("kll_quantiles"),
      info("kll_quantiles", "kll_quantiles(sketch, probs) - quantile estimates from a KLL sketch"),
      (args: Seq[Expression]) => args match {
        case Seq(s, probs) =>
          KllQuantiles(s, foldDoubles(probs, "probs", "kll_quantiles"))
        case _ => throw new IllegalArgumentException(
          "kll_quantiles expects (sketch, array<double>)")
      }),

    (FunctionIdentifier("kll_cdf"),
      info("kll_cdf", "kll_cdf(sketch, points) - CDF estimates from a KLL sketch"),
      (args: Seq[Expression]) => args match {
        case Seq(s, points) =>
          KllCdf(s, foldDoubles(points, "points", "kll_cdf"))
        case _ => throw new IllegalArgumentException(
          "kll_cdf expects (sketch, array<double>)")
      }),

    (FunctionIdentifier("kll_ks"),
      info("kll_ks", "kll_ks(sketch_a, sketch_b) - two-sample KS distance between KLL sketches"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => KllKsDistance(a, b)
        case _ => throw new IllegalArgumentException(
          "kll_ks expects (sketch_a, sketch_b)")
      }),

    (FunctionIdentifier("freq_sketch"),
      info("freq_sketch", "freq_sketch(col[, capacity]) - mergeable space-saving heavy-hitters sketch (binary)"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => graft.sketch.FreqSketchAgg(c)
        case Seq(c, k) => graft.sketch.FreqSketchAgg(c,
          foldLong(k, "capacity", "freq_sketch").toInt)
        case _ => throw new IllegalArgumentException(
          "freq_sketch expects (col[, capacity])")
      }),

    (FunctionIdentifier("freq_topk"),
      info("freq_topk", "freq_topk(sketch, n) - top-n heavy hitters with error bounds"),
      (args: Seq[Expression]) => args match {
        case Seq(s, n) => graft.sketch.FreqTopK(s, foldLong(n, "n", "freq_topk").toInt)
        case _ => throw new IllegalArgumentException(
          "freq_topk expects (sketch, n)")
      }),

    (FunctionIdentifier("freq_chi2"),
      info("freq_chi2", "freq_chi2(observed, reference) - restricted chi2 drift of an observed frequency sketch against a reference profile (cells come from the reference; order matters)"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => graft.sketch.FreqChi2(a, b)
        case _ => throw new IllegalArgumentException(
          "freq_chi2 expects (sketch_a, sketch_b)")
      }),

    (FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "graft_nfc(str) - Unicode NFC canonical composition (ASCII fast path)"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => graft.compile.NormalizeNfc(c)
        case _ => throw new IllegalArgumentException("graft_nfc expects (str)")
      }),

    (FunctionIdentifier("array_bounds"),
      info("array_bounds", "array_bounds(arr, lo, hi) - single-pass fused bounds check over an integral array"),
      (args: Seq[Expression]) => args match {
        case Seq(arr, lo, hi) => ArrayBoundsCheck(arr,
          Some(foldLong(lo, "lo", "array_bounds")),
          Some(foldLong(hi, "hi", "array_bounds")),
          loExclusive = false, hiExclusive = false, failOnNull = false)
        case _ => throw new IllegalArgumentException(
          "array_bounds expects (arr, lo, hi)")
      }))

  /** Register on a live session (alternative to spark.sql.extensions). */
  def register(spark: SparkSession): Unit = all.foreach {
    case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
  }
}
