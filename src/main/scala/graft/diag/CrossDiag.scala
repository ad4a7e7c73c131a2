package graft.diag

/** Isolated best-of-N timing for one gate query (r6 triage:
  * q_curate_cross read 7.5/10.4 s in two mid-suite bench draws vs the
  * r5 verdict's 2.3-2.8 s quiet-window figure). */
object CrossDiag {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_curate_cross")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = graft.BenchCore.session(32)
    println(s"{${graft.BenchCore.probeJson("cpu_probe_start", 32)}}")
    val fn = graft.SparkEntry.queries(name)
    (0 until reps).foreach { i =>
      val (n, t) = graft.BenchCore.time(fn(spark, dir).count())
      println(f"[cross-diag] $name rep=$i rows=$n t=$t%.2f s")
    }
    println(s"{${graft.BenchCore.probeJson("cpu_probe_end", 32)}}")
    spark.stop()
  }
}
