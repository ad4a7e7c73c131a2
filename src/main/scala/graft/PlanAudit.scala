package graft

import graft.ops._
import org.apache.spark.sql.functions._

/** Plan-shape audit harness (PLANS.md §8e): prints exchange / broadcast /
  * nested-loop counts for the executed plans of the operator family, so
  * a regression in join strategy or an accidental shuffle shows up as a
  * number diff. `-v` dumps the full plans.
  * Usage: runMain graft.PlanAudit [-v] [sfDir] */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = BenchCore.session(8)
    import spark.implicits._
    val d = args.find(a => !a.startsWith("-")).getOrElse("/root/testdata/sf0.01")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      val ex = p.split("\n").count(_.contains("Exchange"))
      val bc = p.split("\n").count(_.contains("BroadcastExchange"))
      val nlj = p.split("\n").count(_.contains("NestedLoop"))
      println(s"== $name: exchanges=$ex (broadcast=$bc) nestedLoop=$nlj")
      if (args.contains("-v")) println(p)
    }
    audit("quantizedTopK", Similarity.quantizedTopK(emb, "vec_id", "embedding",
      emb.where(col("vec_id") < 8), "vec_id", "embedding", k = 5, rerank = 20))
    audit("duplicateSpans", Dedup.duplicateSpans(docs, "doc_id", "text"))
    audit("removeSharedSpans", Dedup.removeSharedSpans(docs, "doc_id", "text"))
    audit("domainFilter", WebText.filterByDomainBlocklist(docs, "doc_id", "text",
      Seq("bad.test").toDF("domain"), "domain"))
    audit("urlSignals", WebText.urlSignals(docs, "doc_id", "text"))
    audit("stripMarkup", docs.select(WebText.stripMarkup(col("text"))))
    audit("topKPerGroup", Sampling.topKPerGroup(docs, Seq("source"),
      col("n_chars"), col("doc_id"), 3))
    audit("psiDrift", graft.checks.PsiDriftCheck("n_chars",
      docs.where(col("doc_id") % 2 === 0),
      bin = c => floor(c / lit(50)).cast("long"))
      .run(docs.withColumn("part", lit(0))).verdicts)
    audit("chi2Drift", graft.checks.Chi2DriftCheck("n_chars", col("n_chars"),
      docs.where(col("doc_id") % 2 === 0), col("n_chars"), threshold = 100.0)
      .run(docs.withColumn("part", lit(0))).verdicts)
    audit("ksDrift", graft.checks.KsDriftCheck("n_chars",
      docs.where(col("doc_id") % 2 === 0))
      .run(docs.withColumn("part", lit(0))).verdicts)
    audit("suggestProfile", graft.checks.SuggestConstraints.profile(docs,
      Seq("doc_id", "lang", "n_chars")))
    val pivots = emb.where(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    audit("semanticPairs", Similarity.semanticDuplicatePairs(emb, "vec_id",
      "embedding", 64, pivots, 0.35))
    audit("crossSemantic", Similarity.crossSemanticDuplicates(
      emb.where(col("vec_id") >= 100), emb.where(col("vec_id") < 100),
      "vec_id", "embedding", 64, pivots, 0.35))
    audit("shingleOverlap", Overlap.shingleOverlap(
      docs.where(col("lang") === "en"), docs.where(col("lang") =!= "en"), "text", 2))
    audit("corpusSignature", Overlap.corpusSignature(docs, "text", 2))
    audit("gopherFilter", TextAnalysis.gopherFilter(docs, "text"))
    audit("lexicalSignals", TextAnalysis.lexicalSignals(docs, "text"))
    audit("compressionRatio", docs.select(
      TextAnalysis.compressionRatio(col("text"))))
    val lm = CharLm.train(docs, "text", maxAlphabet = 64)
    audit("charLmScore", CharLm.score(docs, "text", lm))
    audit("sampleToBudget", Sampling.sampleToBudget(docs,
      col("doc_id").cast("string"), length(col("text")), 30000L))
    audit("sourceReport", Report.sourceReport(docs, "source", "text", "lang"))
    audit("dedupLinesWithinDoc", docs.select(
      Dedup.dedupLinesWithinDoc(col("text"))))
    // r6 ops
    val pqCb = (0 until 4).map(s => pivots.map(_.slice(s * 16, s * 16 + 16)))
    audit("pqEncode", Similarity.pqEncode(emb, "vec_id", "embedding", 64, pqCb))
    audit("pqTopK", Similarity.pqTopK(emb, "vec_id", "embedding",
      emb.where(col("vec_id") < 8), "vec_id", "embedding",
      k = 5, dim = 64, codebooks = pqCb, rerank = 20))
    val lrm = LrClassifier.train(docs, "text", col("lang") === "en",
      buckets = 512, iters = 1)
    audit("lrScore", LrClassifier.score(docs, "text", lrm))
    audit("stripMarkupKernel", docs.select(WebText.stripMarkup(
      concat(lit("<div>"), col("text"), lit("</div><script>x</script>")))))
    audit("rankBuckets", Sampling.rankBuckets(
      docs.select(col("doc_id"), col("n_chars").cast("double").as("sc")),
      col("sc"), Seq("head" -> 3.0, "middle" -> 3.0, "tail" -> 4.0),
      col("doc_id"), cellsPerUnit = 1L))
  }
}
