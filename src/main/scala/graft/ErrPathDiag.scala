package graft

import org.apache.spark.sql.functions._

/** Diagnostic for the greedy-error-path cost (PLANS.md §9): times the
  * boolean fast path against the fused error projection and two
  * isolating variants over the bench token table, and prints the error
  * projection's executed plan so WholeStageCodegen span breaks are
  * visible. The r2/r3 contract is errors ≈ 1.0× fastpath (error
  * construction gated behind the codegen `valid`, so happy rows never
  * pay it); the r4 closing record drifted to 1.23× — this main answers
  * whether that is the kernel's new branches, a codegen-span change, or
  * host weather.
  *
  * Variants:
  *  - fastpath: count rows failing the codegen valid conjunction
  *  - errors: sum(size(CASE WHEN valid THEN [] ELSE kernel END)) — shipped
  *  - gate_only: same CaseWhen with a LITERAL empty array in the ELSE —
  *    the CaseWhen + size cost without any kernel in the plan
  *  - where_valid: count rows passing valid (control: fastpath symmetric)
  */
object ErrPathDiag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt
    val spark = BenchCore.session(cpus)
    BenchCore.ensureData(spark)
    val df = spark.read.parquet(BenchCore.benchDataDir)
    val v = BenchCore.validator
    val compiled = graft.compile.ConstraintCompiler
      .compile(v.spec, df.schema, v.options)

    val errCol = compiled.errors
    val errType = df.select(errCol.as("e")).schema.head.dataType
    val emptyErrs = lit(null).cast(errType) // size(NULL) = -1: constant-time ELSE
    val gateOnly = when(compiled.valid,
      array().cast(errType)).otherwise(emptyErrs)

    // warm-up: JIT + codegen + footers
    df.select(compiled.valid.as("v")).where(!col("v")).count()
    df.select(size(errCol).as("n")).agg(sum("n")).head()

    // INTERLEAVED draws (the ScalingBench alternating discipline): on a
    // steal-prone host only the within-round ratio is trustworthy —
    // consecutive jobs share the same weather. Report per-round ratios
    // and the ratio at the fastest round.
    println(BenchCore.probeJson("probe_start", cpus))
    val rounds = (0 until iters).map { i =>
      val (_, tf) = BenchCore.time(
        df.select(compiled.valid.as("v")).where(!col("v")).count())
      val (_, te) = BenchCore.time(
        df.select(size(errCol).as("n")).agg(sum("n")).head())
      val (_, tg) = BenchCore.time(
        df.select(size(gateOnly).as("n")).agg(sum("n")).head())
      println(f"[errdiag] round=$i fastpath=$tf%.3f errors=$te%.3f gate_only=$tg%.3f err/fast=${te / tf}%.2f gate/fast=${tg / tf}%.2f")
      (tf, te, tg)
    }
    val bestRound = rounds.minBy(r => r._1 + r._2)
    println(f"[errdiag] BEST round: fastpath=${bestRound._1}%.3f errors=${bestRound._2}%.3f ratio=${bestRound._2 / bestRound._1}%.2f")
    println(f"[errdiag] min fastpath=${rounds.map(_._1).min}%.3f min errors=${rounds.map(_._2).min}%.3f best-of ratio=${rounds.map(_._2).min / rounds.map(_._1).min}%.2f")
    println(BenchCore.probeJson("probe_end", cpus))

    def spans(tag: String, d: org.apache.spark.sql.DataFrame): Unit = {
      val p = d.queryExecution.executedPlan.toString
      println(s"=== $tag: operator/codegen spans ===")
      p.linesIterator.map(_.take(110)).take(25).foreach(println)
    }
    spans("fastpath", df.select(compiled.valid.as("v")).where(!col("v"))
      .groupBy().count())
    spans("errors", df.select(size(errCol).as("n")).agg(sum("n")))
    spans("gate_only", df.select(size(gateOnly).as("n")).agg(sum("n")))
    spark.stop()
  }
}
