package graft

import org.apache.spark.sql.functions._

/** One-off: measure the greedy-errors headline job and report whether its
  * stage kept whole-stage codegen (a CodegenFallback expression anywhere
  * in the projection ejects the WHOLE stage to interpreted eval — the
  * r7 target). Prints best-of-N plus the formatted plan's codegen spans. */
object KernelCodegenDiag {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(8)
    val reps = sys.env.getOrElse("SPARK_GRAFT_DIAG_REPS", "5").toInt
    val spark = BenchCore.session(cpus)
    BenchCore.ensureData(spark)
    locally {
      val c = spark.sessionState.conf
      println(s"[diag] wholeStage=${c.wholeStageEnabled} " +
        s"maxFields=${c.wholeStageMaxNumFields} " +
        s"hugeMethodLimit=${c.hugeMethodLimit} " +
        s"useIdInClassName=${c.wholeStageUseIdInClassName}")
    }
    val df = spark.read.parquet(BenchCore.benchDataDir)
    val compiled = graft.compile.ConstraintCompiler
      .compile(BenchCore.validator.spec, df.schema, BenchCore.validator.options)

    val job = df.select(size(compiled.errors).as("n")).agg(sum("n"))
    val plan = job.queryExecution.executedPlan.toString()
    val wscg = plan.linesIterator.count(_.contains("WholeStageCodegen"))
    println(s"[diag] WholeStageCodegen spans in greedy-errors plan: $wscg")
    job.queryExecution.executedPlan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback =>
          println(s"[diag] CodegenFallback blocker: ${e.getClass.getName} in ${node.nodeName}")
        case _ =>
      })
    }

    job.collect() // warm: codegen + JIT + footers (collect executes THIS
                  // queryExecution; head() would build a limit-wrapped one)
    val planAfter = job.queryExecution.executedPlan.toString()
    println(s"[diag] WSCG spans after execution: " +
      planAfter.linesIterator.count(_.contains("WholeStageCodegen")))
    planAfter.linesIterator.foreach(l => println("[plan] " + l.take(120)))
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); job.collect(); (System.nanoTime() - t0) / 1e9
    }
    println(f"[diag] greedy_errors best=${times.min}%.3f s " +
      f"median=${times.sorted.apply(times.length / 2)}%.3f s " +
      s"all=${times.map(t => f"$t%.3f").mkString(",")}")

    val fast = df.select(compiled.valid.as("v")).where(!col("v"))
    fast.count() // warm
    val tf = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); fast.count(); (System.nanoTime() - t0) / 1e9
    }
    println(f"[diag] fastpath best=${tf.min}%.3f s " +
      s"all=${tf.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
