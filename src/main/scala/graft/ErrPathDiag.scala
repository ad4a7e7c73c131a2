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

    def draws(tag: String)(f: => Unit): Unit = {
      val ts = (0 until iters).map(_ => BenchCore.time(f)._2)
      println(f"[errdiag] $tag%-12s best=${ts.min}%.3f s median=${ts.sorted.apply(ts.size / 2)}%.3f s all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    println(BenchCore.probeJson("probe_start", cpus))
    draws("fastpath") {
      df.select(compiled.valid.as("v")).where(!col("v")).count()
    }
    draws("errors") {
      df.select(size(errCol).as("n")).agg(sum("n")).head()
    }
    draws("gate_only") {
      df.select(size(gateOnly).as("n")).agg(sum("n")).head()
    }
    draws("where_valid") {
      df.select(compiled.valid.as("v")).where(col("v")).count()
    }
    println(BenchCore.probeJson("probe_end", cpus))

    println("=== errors projection, executed plan ===")
    println(df.select(size(errCol).as("n")).agg(sum("n"))
      .queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
