package graft.diag

import org.apache.spark.sql.functions._

/** Stage isolation for q_curate_cross: time the cleaned-chain
  * materialization, each cross-dedup phase (banding per side, band
  * join, shingle verify), and the final anti-join + split projection
  * separately. Run: runMain graft.diag.CurateCrossDiag [sfDir] [reps]. */
object CurateCrossDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.BenchCore.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.ops.{Curation, Dedup, TextAnalysis}
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      System.err.println(f"[ccdiag] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      a
    }
    (0 until reps).foreach { r =>
      System.err.println(s"[ccdiag] --- rep $r ---")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val id = col("doc_id")
      val suffix = when(pmod(id, lit(3)) === 0,
          concat(lit(" reach u"), id, lit("@ex"), pmod(id, lit(7)),
            lit(".com from 10."), pmod(id, lit(256)), lit(".0."), pmod(id, lit(100))))
        .when(pmod(id, lit(3)) === 1,
          concat(lit(" call 555-01"), pmod(id, lit(10)), lit("-"),
            lpad(pmod(id, lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit(""))
      val t2 = concat(substring(col("text"), 1, 40),
        lit("\nSHARED COOKIE BANNER\n"), substring(col("text"), 41, 1000000),
        suffix,
        when(pmod(id, lit(2)) === 0, lit("\nEVEN FOOTER")).otherwise(lit("")))
      val input = docs.select(id, t2.as("text"))
      val ref = docs.where(col("doc_id") < 50).select(col("doc_id"), col("text"))

      // replicate curate()'s chain up to exact dedup
      val canonical = input.select(col("doc_id"),
        TextAnalysis.normalizeNfc(col("text")).as("text"))
      val deboiled = t("dedupLines plan+noop") {
        val d = Dedup.dedupLines(canonical, "doc_id", "text", 3)
        d.write.mode("overwrite").format("noop").save(); d
      }
      val redacted = deboiled.withColumn("text",
        TextAnalysis.piiRedact(col("text")))
      val scored = redacted
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .where(col("quality") >= 0.5)
      val exactDeduped = Dedup.keepCanonical(scored, col("text"), Seq(col("doc_id")))
      val cached = t("chain checkpoint")(exactDeduped.localCheckpoint(true))
      val bn = t("band new") {
        val b = Dedup.bandedBuckets(cached, "doc_id", "text", 2, 16, 2, 42L,
          Dedup.portableShingleId).persist()
        b.count(); b
      }
      val br = t("band ref") {
        val b = Dedup.bandedBuckets(ref, "doc_id", "text", 2, 16, 2, 42L,
          Dedup.portableShingleId).persist()
        b.count(); b
      }
      val pairs = t("band join")(
        Dedup.crossBandPairs(bn, br, 100000).localCheckpoint(true))
      System.err.println(s"[ccdiag]   pairs=${pairs.count()}")
      val shN = cached.select(col("doc_id").as("id_a"),
        Dedup.shingles(col("text"), 2).as("sh_a"))
      val shR = ref.select(col("doc_id").as("id_b"),
        Dedup.shingles(col("text"), 2).as("sh_b"))
      val verified = t("verify") {
        val v = pairs.join(shN, Seq("id_a")).join(shR, Seq("id_b"))
          .withColumn("jaccard",
            graft.ops.Rounding.roundAt(
              size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
                (size(col("sh_a")) + size(col("sh_b")) -
                  size(array_intersect(col("sh_a"), col("sh_b")))), 6))
          .where(col("jaccard") >= 0.10)
          .select(col("id_a").as("doc_id")).distinct().localCheckpoint(true)
        System.err.println(s"[ccdiag]   drops=${v.count()}"); v
      }
      t("anti+splits noop") {
        val out = graft.ops.Sampling.assignSplits(
          cached.join(broadcast(verified), Seq("doc_id"), "left_anti"),
          col("doc_id").cast("string"),
          Seq("train" -> 98.0, "val" -> 1.0, "test" -> 1.0),
          c => TextAnalysis.fingerprint(concat(c, lit("#salt"))))
        out.write.mode("overwrite").format("noop").save()
      }
      bn.unpersist(false); br.unpersist(false)
    }
    spark.stop()
  }
}
