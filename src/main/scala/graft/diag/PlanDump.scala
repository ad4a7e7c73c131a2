package graft.diag

import graft.{BenchCore, SparkEntry}

/** Dump `explain("formatted")` for named gate queries to files — the
  * plans/r08 evidence harness (guide §1: capture the plan shape before
  * and after each optimization).
  *
  * Usage: runMain graft.diag.PlanDump <outDir> <suffix> [query ...]
  * With no query names, dumps every query in [[SparkEntry.queries]].
  * Each query's plan lands at <outDir>/<name>_<suffix>.txt.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = BenchCore.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      // queryExecution.explainString is exactly what explain("formatted")
      // prints, captured to a file instead of stdout
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"), txt)
      System.err.println(s"[plandump] $name -> ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
