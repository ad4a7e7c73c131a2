package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — exact, O(|Q|·|C|); the corpus
  * stays partitioned and the (small) query set is broadcast, so the
  * cross product never shuffles the corpus.
  *
  * Scale path: random-hyperplane LSH — embeddings are bucketed by the
  * sign pattern of `planes` seeded random projections; neighbor search
  * probes only the query's bucket. Recall is tunable via (planes,
  * tables); candidates are re-ranked with exact cosine so precision is 1.
  */
object Similarity {

  /** Exact cosine similarity of two float-array columns (computed in
    * double precision) via the [[graft.compile.CosineSim]] kernel — one
    * JVM loop per row; the interpreted-HOF formulation below is kept as
    * the parity reference. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The original Column formulation of [[cosine]] (parity oracle). */
  private[graft] def cosineColumns(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v))
    dot / (na * nb)
  }

  /** Brute-force top-k: for each query row, the k nearest corpus rows by
    * cosine. Queries are broadcast (must be small); ranking is made
    * deterministic by (rounded sim desc, corpus id asc). */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qv")))
    val scored = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", Rounding.roundAt(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Deterministic random hyperplanes: `planes` vectors of `dim`
    * components in {-1, +1}, from a seeded driver-side RNG.
    * Package-visible so oracle harnesses can restate the exact planes. */
  private[graft] def hyperplanes(planes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** All `tables` LSH bucket ids of a vector in one kernel pass
    * ([[graft.compile.HyperplaneBuckets]]): element t is the sign-bit
    * pattern of table t's seeded projections. */
  def lshBuckets(vec: Column, dim: Int, planes: Int, tables: Int,
                 seed: Long): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val flat = (0 until tables).flatMap(t =>
      hyperplanes(planes, dim, seed + 7919L * t).flatten)
    ColumnBridge.column(graft.compile.HyperplaneBuckets(
      ColumnBridge.expression(vec), flat, tables, planes, dim))
  }

  /** Single-table LSH bucket id (sign bits of the projections). */
  def lshBucket(vec: Column, dim: Int, planes: Int = 16, seed: Long = 42L): Column =
    element_at(lshBuckets(vec, dim, planes, tables = 1, seed), 1)

  /** The original per-plane Column formulation of [[lshBucket]]
    * (parity oracle). */
  private[graft] def lshBucketColumns(vec: Column, dim: Int, planes: Int = 16,
                                      seed: Long = 42L): Column = {
    val hp = hyperplanes(planes, dim, seed)
    hp.zipWithIndex.map { case (plane, i) =>
      val proj = aggregate(
        zip_with(vec, typedlit(plane), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Multi-table LSH ANN: `tables` independent hyperplane sets; a corpus
    * row is a candidate if it shares ANY table's bucket with the query
    * (recall ≈ 1-(1-p^planes)^tables, p = 1-θ/π). Candidates are exactly
    * re-ranked with cosine, so precision is 1; recall < 1 by design.
    * Returns the same shape as bruteForceTopK. */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, dim: Int, planes: Int = 8, tables: Int = 4,
              seed: Long = 42L): DataFrame = {
    def buckets(vec: Column): Column = lshBuckets(vec, dim, planes, tables, seed)
    // The bucket join carries (neighbor_id, table, bucket) ONLY — corpus
    // vectors do not ride the ×tables explode or any shuffle (the same
    // de-payloading Dedup.minhashDuplicates applies to shingles). The
    // query side is broadcast, so candidate generation is shuffle-free on
    // the corpus; candidate ids are deduped while still narrow, then the
    // vectors are re-joined by id for the exact re-rank — candidates are
    // LSH-collision-bounded and broadcast back under AQE, so the corpus
    // never shuffles its vectors at all.
    val bucketed = corpus.select(col(corpusId).as("neighbor_id"),
      posexplode(buckets(col(corpusVec))).as(Seq("table", "bucket")))
    val q = broadcast(queries.select(col(queryId).as("query_id"),
      posexplode(buckets(col(queryVec))).as(Seq("table", "bucket"))))
    val cand = bucketed.join(q, Seq("table", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    val qv = broadcast(queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qv")))
    val cv = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).as("cv"))
    val scored = cand
      .join(cv, Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .withColumn("sim", Rounding.roundAt(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  // ---- IVF (inverted-file) ANN: the coarse-quantizer scale path ----

  /** Driver-side Lloyd's k-means over a deterministic sample (ordered by
    * id — every run trains the same centroids): the production centroid
    * trainer for [[ivfTopK]]. The sample is driver-bounded
    * (`sampleSize` rows × dim doubles); training cost never touches the
    * cluster. Empty clusters keep their previous centroid; ties assign to
    * the lower index (same rule as the [[graft.compile.NearestCells]]
    * kernel). */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                     k: Int, iters: Int = 5, seed: Long = 42L,
                     sampleSize: Int = 4096): Seq[Seq[Double]] = {
    val sample: Array[Array[Double]] = df
      .select(col(idCol), col(vecCol))
      // degenerate vectors (NULL, wrong length, null elements) are
      // excluded from training — the NearestCells kernel tolerates them
      // at assignment time, but a null element would NPE the driver fold
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dim &&
        !exists(col(vecCol), e => e.isNull))
      // order by a hash of the id, not the id: id order correlates with
      // ingestion order/source, so a first-N-by-id sample would train
      // centroids on a biased corner of the corpus. The hash order is
      // equally deterministic but uniformly spread; the id tie-breaks.
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(sampleSize)
      .collect()
      .map(_.getSeq[Number](1).map(_.doubleValue()).toArray)
    require(sample.length >= k, s"k-means needs >= $k sample vectors")
    val rnd = new scala.util.Random(seed)
    val centroids = rnd.shuffle(sample.indices.toVector).take(k)
      .map(i => sample(i).clone()).toArray
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { x =>
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < k) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = x(i) - centroids(j)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += x(i); i += 1 }
      }
      (0 until k).foreach { j =>
        if (counts(j) > 0)
          (0 until dim).foreach(i => centroids(j)(i) = sums(j)(i) / counts(j))
      }
    }
    centroids.map(_.toSeq).toSeq
  }

  /** The `nprobe` nearest centroid indices of a vector (ascending
    * distance, ties to the lower index), via the
    * [[graft.compile.NearestCells]] kernel. */
  def nearestCells(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val dim = centroids.head.length
    ColumnBridge.column(graft.compile.NearestCells(
      ColumnBridge.expression(vec), centroids.flatten, centroids.length, dim, nprobe))
  }

  /** The original Column-fold formulation of the single nearest cell
    * (parity oracle for the kernel). */
  private[graft] def nearestCellColumns(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val dists = centroids.map { c =>
      aggregate(zip_with(vec, typedlit(c),
        (x, w) => (x.cast("double") - w) * (x.cast("double") - w)),
        lit(0.0), (acc, v) => acc + v)
    }
    dists.zipWithIndex.foldLeft((lit(Double.MaxValue), lit(0L))) {
      case ((bd, bj), (d, j)) =>
        (when(d < bd, d).otherwise(bd), when(d < bd, lit(j.toLong)).otherwise(bj))
    }._2
  }

  /** IVF ANN top-k: the corpus is partitioned into centroid cells by ONE
    * narrow projection (no shuffle); each query probes its `nprobe`
    * nearest cells; candidates are re-ranked with exact cosine, so
    * precision is 1 and recall ≈ the probed cells' coverage. Same output
    * shape as [[bruteForceTopK]]/[[lshTopK]].
    *
    * Scale shape (same discipline as lshTopK): the cell join carries
    * (neighbor_id, cell) only — vectors are re-joined by id for the
    * re-rank; the query side broadcasts; each corpus row lives in exactly
    * one cell and probe cells are distinct, so the candidate list needs
    * no dedup. Centroids ride into the kernel as literals (k × dim
    * doubles — KBs), not through a join. */
  def ivfTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, dim: Int, centroids: Seq[Seq[Double]],
              nprobe: Int = 2): DataFrame = {
    require(centroids.nonEmpty && centroids.forall(_.length == dim),
      "centroid matrix must be k x dim")
    val corpusCells = corpus.select(col(corpusId).as("neighbor_id"),
      element_at(nearestCells(col(corpusVec), centroids, 1), 1).as("cell"))
    val q = broadcast(queries.select(col(queryId).as("query_id"),
      explode(nearestCells(col(queryVec), centroids, nprobe)).as("cell")))
    val cand = corpusCells.join(q, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
    val qv = broadcast(queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qv")))
    val cv = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).as("cv"))
    val scored = cand
      .join(cv, Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .withColumn("sim", Rounding.roundAt(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, LSH-blocked
    * then exactly verified. The bucket self-join carries (id, bucket)
    * only; vectors are re-joined by id for the exact cosine (pairs are
    * collision-bounded → broadcast under AQE, so the vector table never
    * shuffles). Buckets above `maxBucket` are dropped — all-identical /
    * zero vectors collapse into one degenerate bucket whose O(m²) pairs
    * would OOM a task at web scale (see [[graft.ops.Dedup.DefaultMaxBucket]]). */
  def cosineDuplicates(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double, dim: Int,
                       planes: Int = 8, seed: Long = 42L,
                       maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val t = df.select(col(idCol).as("id"),
      lshBucket(col(vecCol), dim, planes, seed).as("bucket"))
    // same cap as the Dedup band/chunk joins; this API is fully lazy, so
    // (like minhashDuplicates with materializePairs = false) there is no
    // eager dropped-bucket metric — route via Dedup.oversizedBuckets
    val guarded = Dedup.capBuckets(t, Seq("bucket"), maxBucket)
    val a = guarded.select(col("bucket"), col("id").as("id_a"))
    val b = guarded.select(col("bucket"), col("id").as("id_b"))
    // single-table blocking: each pair arises from exactly one bucket, so
    // the candidate list needs no dedup
    val pairs = a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    pairs
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("sim", Rounding.roundAt(cosine(col("v_a"), col("v_b")), 6))
      .where(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}
