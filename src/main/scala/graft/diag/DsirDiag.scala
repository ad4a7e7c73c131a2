package graft.diag

import graft.BenchCore
import graft.ops.{Dsir, LmScore, TextAnalysis}
import org.apache.spark.sql.functions._

/** Stage isolation for the DSIR dual-model composition (guide §1):
  * which phase of q_dsir_weights carries the cost — words
  * materialization, the unigram census, the bigram census, or the
  * scoring pass. Usage: runMain graft.diag.DsirDiag [sfDir] [reps] */
object DsirDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = BenchCore.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until reps).foreach { rep =>
      val (w, tWords) = BenchCore.time {
        docs.select(col("doc_id"), (col("lang") === "en").as("is_t"),
          TextAnalysis.words(col("text")).as("ws")).localCheckpoint(true)
      }
      val (models, tTrain) = BenchCore.time {
        LmScore.trainDual(w, "ws", "is_t", topV = 500, maxBigrams = 2000)
      }
      val (_, tScore) = BenchCore.time {
        Dsir.importanceWeightsFromWords(w, "doc_id", "ws",
            models._1, models._2)
          .withColumn("log_weight", round(col("log_weight").cast("double"), 6))
          .write.mode("overwrite").format("noop").save()
      }
      System.err.println(
        f"[dsirdiag] rep=$rep words=$tWords%.3f train=$tTrain%.3f score=$tScore%.3f")
    }
    spark.stop()
  }
}
