package graft

import graft.ops._
import graft.pipeline.IndexStore
import org.apache.spark.sql.functions._

/** Persistable index artifacts: round-trips, manifest guards, and the
  * probe-vs-direct equivalence the gate query also pins via its oracle. */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-index-spec").toString

  // same planted-near-dup corpus shape as OpsSpec
  lazy val docs = {
    val base = (0 until 100).map { i =>
      (i.toLong, (0 until 30).map(j => s"d${i}w$j").mkString(" "))
    }
    val dups = (0 until 20).map { i =>
      val words = (0 until 30).map(j => s"d${i}w$j").updated(17, "zzz")
      ((i + 100).toLong, words.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("dedup index: persisted probe equals the direct two-corpus dedup") {
    val ref = docs.where(col("doc_id") < 100)
    val newBatch = docs.where(col("doc_id") >= 100)
    val dir = tmp()
    IndexStore.saveDedupIndex(ref, "doc_id", "text", dir,
      shingleN = 2, bands = 16, rowsPerBand = 4)
    val idx = IndexStore.loadDedupIndex(spark, dir)
    assert(idx.params.shingleN == 2 && idx.params.bands == 16 &&
      idx.params.rowsPerBand == 4 && idx.params.hashKind == "xxhash")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = key(Dedup.crossCorpusDuplicates(newBatch, ref,
      "doc_id", "text", threshold = 0.4, shingleN = 2,
      bands = 16, rowsPerBand = 4))
    val probed = key(IndexStore.crossCorpusAgainst(newBatch, idx,
      "doc_id", "text", threshold = 0.4))
    assert(direct.nonEmpty && probed == direct,
      s"direct-only=${direct -- probed} probe-only=${probed -- direct}")
  }

  test("bloom exact-dedup shards: OR-merge probes both sides, no false negatives") {
    // two ingestion-batch shards over disjoint key ranges, SAME geometry
    val shardA = Dedup.buildExactIndex(
      spark.range(0, 500).select(concat(lit("k"), col("id")).as("k")),
      col("k"), expectedItems = 2000L, fpp = 1e-8)
    val shardB = Dedup.buildExactIndex(
      spark.range(500, 1000).select(concat(lit("k"), col("id")).as("k")),
      col("k"), expectedItems = 2000L, fpp = 1e-8)
    // persist/restore each shard through the profile store (the
    // documented versioning path), then merge the RESTORED blobs
    val (dirA, dirB) = (tmp(), tmp())
    IndexStore.saveProfile(shardA, "bloom", "k", dirA)
    IndexStore.saveProfile(shardB, "bloom", "k", dirB)
    val merged = Dedup.mergeExactIndexes(Seq(
      IndexStore.loadProfile(dirA)._1, IndexStore.loadProfile(dirB)._1))
    // probe batch straddles the shard boundary plus 200 novel keys
    val batch = spark.range(400, 1200).select(col("id"),
      concat(lit("k"), col("id")).as("k"))
    val kept = Dedup.dropSeenExact(batch, col("k"), merged)
      .collect().map(_.getLong(0)).toSet
    // no false negatives ACROSS the boundary: every indexed key (either
    // shard) drops; at fpp=1e-8 all 200 novel keys survive
    assert(kept == (1000L until 1200L).toSet,
      s"missed-drops=${kept.filter(_ < 1000)} false-drops=${(1000L until 1200L).toSet -- kept}")
    // mismatched geometry is refused, not silently corrupted
    val other = Dedup.buildExactIndex(
      spark.range(5).select(concat(lit("k"), col("id")).as("k")),
      col("k"), expectedItems = 50L, fpp = 1e-4)
    val e = intercept[IllegalArgumentException](
      Dedup.mergeExactIndexes(Seq(shardA, other)))
    assert(e.getMessage.contains("geometry"), e.getMessage)
  }

  test("manifest guards: kind, version, and hash-kind are all enforced") {
    val dir = tmp()
    IndexStore.saveCentroids(spark, Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)), dir)
    // loading the wrong kind fails with the kind name in the message
    val e = intercept[IllegalArgumentException](
      IndexStore.loadDedupIndex(spark, dir))
    assert(e.getMessage.contains("ivf_centroids"), e.getMessage)
    intercept[IllegalArgumentException](
      IndexStore.loadCentroids(spark, tmp())) // no manifest at all
    intercept[IllegalArgumentException](IndexStore.hashFn("md5"))
    // a future-versioned manifest is refused, not misparsed
    val vdir = tmp()
    IndexStore.saveCentroids(spark, Seq(Seq(0.0)), vdir)
    val p = java.nio.file.Paths.get(vdir, "manifest.json")
    java.nio.file.Files.writeString(p, java.nio.file.Files.readString(p)
      .replace("\"format_version\":1", "\"format_version\":99"))
    val ev = intercept[IllegalArgumentException](
      IndexStore.loadCentroids(spark, vdir))
    assert(ev.getMessage.contains("99"), ev.getMessage)
  }

  test("IVF centroids round-trip bit-exactly and feed ivfTopK unchanged") {
    val centroids = Seq(
      Seq(0.1, -2.5e-17, 3.3333333333333335),
      Seq(Double.MinPositiveValue, 1.0 / 3.0, -0.0))
    val dir = tmp()
    IndexStore.saveCentroids(spark, centroids, dir)
    val back = IndexStore.loadCentroids(spark, dir)
    assert(back.flatten.map(java.lang.Double.doubleToRawLongBits) ==
      centroids.flatten.map(java.lang.Double.doubleToRawLongBits))
  }

  test("drift profiles round-trip and re-validate through the sketch magic") {
    val fs = graft.sketch.FreqSketch.empty(16)
    Seq("a", "b", "a", "c").foreach(fs.update)
    val dir = tmp()
    IndexStore.saveProfile(fs.serialize(), "freq", "lang", dir)
    val (blob, kind, column) = IndexStore.loadProfile(dir)
    assert(kind == "freq" && column == "lang")
    val back = graft.sketch.FreqSketch.deserialize(blob)
    assert(back.totalSeen == 4 && back.estimate("a") == 2)
    val ks = graft.sketch.KllSketch.empty()
    (1 to 100).foreach(i => ks.update(i.toDouble))
    val kdir = tmp()
    IndexStore.saveProfile(ks.serialize(), "kll", "n_tok", kdir)
    val (kblob, kkind, _) = IndexStore.loadProfile(kdir)
    assert(kkind == "kll")
    assert(graft.sketch.KllSketch.deserialize(kblob).count == 100L)
    intercept[IllegalArgumentException](
      IndexStore.saveProfile(Array[Byte](1), "hll", "x", tmp()))
  }

  test("PQ codebooks round-trip bit-exactly and feed pqTopK unchanged") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val seeds = (0 until 4).map(s =>
      (0 until 4).map(c => Seq.fill(4)(rnd.nextGaussian())).toSeq)
    val trained = Similarity.trainPqCodebooks(vecs, "embedding", 16, seeds, iters = 1)
    val dir = tmp()
    IndexStore.savePqCodebooks(spark, trained, dir)
    val loaded = IndexStore.loadPqCodebooks(spark, dir)
    assert(loaded == trained) // exact doubles, not approximate
    val direct = Similarity.pqTopK(vecs, "vec_id", "embedding",
      vecs.where(col("vec_id") < 3), "vec_id", "embedding",
      k = 3, dim = 16, codebooks = trained).collect().toSeq
    val viaStore = Similarity.pqTopK(vecs, "vec_id", "embedding",
      vecs.where(col("vec_id") < 3), "vec_id", "embedding",
      k = 3, dim = 16, codebooks = loaded).collect().toSeq
    assert(direct.toSet == viaStore.toSet && direct.size == 9)
    // ragged codebooks refuse to persist
    intercept[IllegalArgumentException](IndexStore.savePqCodebooks(spark,
      Seq(Seq(Seq(1.0, 2.0)), Seq(Seq(1.0))), tmp()))
    // wrong-kind manifest refuses to load
    intercept[IllegalArgumentException](IndexStore.loadCentroids(spark, dir))
  }
}
