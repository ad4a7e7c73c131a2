package graft.diag

import org.apache.spark.sql.functions._

/** Timing probe for the LR classifier's train/score stages (r6 bench
  * triage: q_lr_quality read 24 s at sf0.1). */
object LrDiag {
  def main(args: Array[String]): Unit = {
    val spark = graft.BenchCore.session(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"docs=${docs.count()}")
    def timed[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime; val a = f
      println(f"[lr-diag] $n%-12s ${(System.nanoTime - t0) / 1e9}%.2f s"); a
    }
    val m = timed("train x2")(graft.ops.LrClassifier.train(
      docs, "text", col("lang") === "en", buckets = 512, iters = 2))
    timed("score")(graft.ops.LrClassifier.score(docs, "text", m)
      .agg(sum("lr_zmicro")).head())
    val m1 = timed("train x1")(graft.ops.LrClassifier.train(
      docs, "text", col("lang") === "en", buckets = 512, iters = 1))
    val m2 = timed("train x2 warm")(graft.ops.LrClassifier.train(
      docs, "text", col("lang") === "en", buckets = 512, iters = 2))
    println(s"bias=${m.biasMicro} nonzero=${m.weightsMicro.count(_ != 0)} " +
      s"bias1=${m1.biasMicro} same=${m2.weightsMicro.sameElements(m.weightsMicro)}")
    spark.stop()
  }
}
