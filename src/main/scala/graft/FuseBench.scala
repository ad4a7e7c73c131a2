package graft

import graft.ext.FuseArrayBounds
import org.apache.spark.sql.functions._

/** One-off: measure forall(bounds) interpreted-HOF vs FuseArrayBounds. */
object FuseBench {
  def main(args: Array[String]): Unit = {
    val spark = BenchCore.session(8)
    BenchCore.ensureData(spark)
    spark.read.parquet(BenchCore.benchDataDir).createOrReplaceTempView("t")
    val q = "SELECT count(*) FROM t WHERE forall(tokens, x -> x >= 0 AND x <= 49151) = false"
    def best3(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); spark.sql(q).head(); (System.nanoTime() - t0) / 1e9
    }.min
    spark.sql(q).head() // warm
    val unfused = best3()
    spark.experimental.extraOptimizations ++= Seq(FuseArrayBounds)
    spark.sql(q).head() // warm
    val fused = best3()
    println(f"[fuse] unfused=$unfused%.3f s fused=$fused%.3f s speedup=${unfused / fused}%.2fx")
    spark.stop()
  }
}
