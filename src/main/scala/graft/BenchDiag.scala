package graft

import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Diagnostic: per-iteration timings + GC time for the headline job at one
  * parallelism level, to separate real scaling behavior from JVM noise. */
object BenchDiag {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val iters = if (args.length > 1) args(1).toInt else 5
    val spark = BenchCore.session(cores)
    BenchCore.ensureData(spark)
    val df = spark.read.parquet(BenchCore.benchDataDir)
    val compiled = graft.compile.ConstraintCompiler
      .compile(BenchCore.validator.spec, df.schema, BenchCore.validator.options)

    def gcMillis: Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum

    println(s"[diag] cores=$cores parts=${df.rdd.getNumPartitions}")
    (1 to iters).foreach { i =>
      val g0 = gcMillis
      val t0 = System.nanoTime()
      val n = df.select(compiled.valid.as("v")).where(!col("v")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[diag] iter=$i fastpath=$dt%.3f s gc=${gcMillis - g0} ms invalid=$n")
    }
    spark.stop()
  }
}
