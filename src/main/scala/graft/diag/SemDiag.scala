package graft.diag

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage isolation for q_dedup_semantic (the PqDiag discipline): time
  * each phase of Similarity.semanticDedup separately — assignment
  * materialization, census, pair generation + exact verify, CC rounds,
  * final anti-join — so optimization targets the measured phase, not a
  * guess. Run: runMain graft.diag.SemDiag [sfDir] [reps]. */
object SemDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.BenchCore.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.ops.Similarity
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      System.err.println(f"[semdiag] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      a
    }
    (0 until reps).foreach { r =>
      System.err.println(s"[semdiag] --- rep $r ---")
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val pivots = Seq(7L, 68L, 129L, 190L, 251L, 312L, 373L, 434L)
      val centroids = e.where(col("vec_id").isin(pivots: _*))
        .orderBy("vec_id").select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
      val assigned = t("assign+persist") {
        val a = e.select(col("vec_id").as("id"), col("embedding").as("v"),
          element_at(Similarity.nearestCells(col("embedding"), centroids, 1), 1)
            .as("cell")).persist()
        a.count(); a
      }
      t("census")(assigned.where(col("cell").isNotNull)
        .groupBy("cell").agg(count(lit(1))).collect().foreach(r =>
          System.err.println(s"[semdiag]   cell ${r.get(0)} n=${r.get(1)}")))
      val base = assigned.where(col("cell").isNotNull)
      val a1 = base.select(col("cell"), col("id").as("id_a"))
      val b1 = base.select(col("cell"), col("id").as("id_b"))
      val pairIds = a1.join(b1, Seq("cell")).where(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      val nPairs = t("pairIds count")(pairIds.count())
      System.err.println(s"[semdiag]   pairs=$nPairs")
      val vecs = assigned.select(col("id"), col("v"))
      val verified = pairIds
        .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
        .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
        .withColumn("sim", graft.ops.Rounding.roundAt(
          Similarity.cosine(col("v_a"), col("v_b")), 6))
        .where(col("sim") >= 0.35)
        .select("id_a", "id_b")
      val pairs = t("verify+checkpoint")(verified.localCheckpoint(true))
      System.err.println(s"[semdiag]   verified=${pairs.count()}")
      val losers = t("cc")(graft.ops.Dedup.duplicateGroups(pairs)
        .where(col("id") =!= col("group_id")).localCheckpoint(true))
      t("anti-join")(e.join(losers.select(col("id").as("vec_id")),
        Seq("vec_id"), "left_anti").select("vec_id")
        .write.mode("overwrite").format("noop").save())
      assigned.unpersist(false)
    }
    spark.stop()
  }
}
