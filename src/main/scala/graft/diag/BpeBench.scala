package graft.diag

import org.apache.spark.sql.functions._

/** BPE encode throughput at scale: train a 500-merge model on sf0.01
  * documents, then tokenize the 2M-doc StripBench HTML table (~0.5 KB
  * text each) and count tokens — the corpus-sized pass a pretraining
  * pipeline actually pays for. Median of 3 after warm-up, probes
  * bracketing. Recorded in BENCH.md §bpe. */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.BenchCore.session(cpus)
    val sf = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val model = graft.ops.Bpe.train(sf, "text", numMerges = 500, sampleRows = 5000)
    val n = sys.env.getOrElse("SPARK_GRAFT_STRIP_ROWS", "2000000").toLong
    val dir = s"/tmp/graft_strip_bench/rows_$n"
    require(new java.io.File(s"$dir/_SUCCESS").exists(),
      s"run graft.StripBench first to materialize $dir")
    val docs = spark.read.parquet(dir)
    println(s"{${graft.BenchCore.probeJson("cpu_probe_start", cpus)}}")
    val draws = (0 until 4).map { _ =>
      graft.BenchCore.time {
        docs.select(sum(size(graft.ops.Bpe.encode(col("text"), model))))
          .head().getLong(0)
      }
    }
    val toks = draws.head._1
    val med = graft.BenchCore.median(draws.drop(1).map(_._2))
    println(f"""{"bench":"bpe_encode","rows":$n,"tokens":$toks,""" +
      f""""median_sec":$med%.3f,"docs_per_sec":${n / med}%.0f,""" +
      f""""tokens_per_sec":${toks / med}%.0f,""" +
      s"""${graft.BenchCore.probeJson("cpu_probe_end", cpus)}}""")
    spark.stop()
  }
}
