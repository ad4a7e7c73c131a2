package graft

import org.apache.spark.sql.functions._

/** Adjudication bench for VERDICT r5 watch item #3 (q_html_strip cost):
  * the fused [[graft.compile.StripMarkup]] kernel vs the original
  * eleven-pass regex chain on the q_html_strip document shape, scaled up
  * (SPARK_GRAFT_STRIP_ROWS docs, default 2M, ~0.5 KB of HTML each).
  * Prints one JSON line with both wall times (median of 5 after 1
  * warm-up), the speedup, and the host-weather probes bracketing the
  * measurement. Recorded in BENCH.md §strip-kernel.
  */
object StripBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STRIP_ROWS", "2000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = BenchCore.session(cpus)

    val dir = s"/tmp/graft_strip_bench/rows_$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      // deterministic HTML-ish docs: the q_html_strip wrapper around a
      // hash-generated body with entities, comments, and nested tags
      val body = transform(sequence(lit(0), lit(29)), j =>
        concat(lit("w"), pmod(xxhash64(col("id"), j), lit(100000L))))
      spark.range(n).select(col("id").as("doc_id"),
          concat(
            lit("<html><head><title>T</title><style>body{color:red}</style>" +
              "</head><body class=\"c\"><h1>Doc "),
            col("id").cast("string"),
            lit("</h1>\n<p>"), concat_ws(" ", body),
            lit(" &amp; more &lt;tags&gt; B&amp;lt;C</p><!-- hidden " +
              "<b>bold</b> --><script type=\"text/javascript\">var x=1; " +
              "</script></body></html>")).as("text"))
        .repartition(64).write.mode("overwrite").parquet(dir)
    }
    val docs = spark.read.parquet(dir)

    def run(strip: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Double = {
      val times = (0 until 6).map { _ =>
        BenchCore.time {
          docs.select(sum(length(strip(col("text"))))).head()
        }._2
      }
      BenchCore.median(times.drop(1))
    }

    val probeStart = BenchCore.probeJson("cpu_probe_start", cpus)
    val chain = run(graft.ops.WebText.stripMarkupChain)
    val kernel = run(graft.ops.WebText.stripMarkup)
    val probeEnd = BenchCore.probeJson("cpu_probe_end", cpus)
    println(f"""{"bench":"strip_markup","rows":$n,"chain_sec":$chain%.3f,""" +
      f""""kernel_sec":$kernel%.3f,"speedup":${chain / kernel}%.2f,""" +
      s"""$probeStart,$probeEnd}""")
    spark.stop()
  }
}
