package graft

import graft.ops.Packing
import graft.sketch.{FreqFunctions, FreqSketch}
import org.apache.spark.sql.functions._

/** Space-saving sketch guarantees + sequence packing semantics. */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  test("freq sketch is exact when capacity exceeds the vocabulary, any partitioning") {
    val terms = (0 until 5000).map(i => s"t${i % 40}")
    val df = terms.toDF("term").repartition(7)
    val got = df.agg(FreqFunctions.freq_topk(
        FreqFunctions.freq_sketch(col("term"), capacity = 64), 40).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select("e.term", "e.estimate", "e.max_error")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = terms.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    assert(got.forall(_._3 == 0L), "exact regime must report zero error")
    assert(got.map(e => e._1 -> e._2).toMap == exact)
  }

  test("lossy regime: est bounds hold and guaranteed hitters survive, across merges") {
    // zipf-ish skew: term j appears ~5000/(j+1) times, plus a long tail
    // of singletons to force constant eviction
    val rnd = new scala.util.Random(3)
    val heavy = (0 until 30).flatMap(j => Seq.fill(3000 / (j + 1))(s"h$j"))
    val tail = (0 until 4000).map(i => s"tail$i")
    val stream = rnd.shuffle((heavy ++ tail).toVector)
    val n = stream.size.toLong
    val k = 64
    // multi-partition aggregation exercises update AND merge paths
    val blob = stream.toDF("term").repartition(9)
      .agg(FreqFunctions.freq_sketch(col("term"), capacity = k))
      .head().getAs[Array[Byte]](0)
    val sk = FreqSketch.deserialize(blob)
    assert(sk.size <= k)
    assert(sk.totalSeen == n)
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    // est >= true >= est - err for every surviving entry
    sk.topK(k).foreach { case (t, est, err) =>
      val truth = exact(t)
      assert(est >= truth && truth >= est - err, s"$t est=$est err=$err true=$truth")
    }
    // presence guarantee: true > N/(k+1) => present
    val present = sk.topK(k).map(_._1).toSet
    exact.filter(_._2 > n / (k + 1)).keys.foreach { t =>
      assert(present.contains(t), s"guaranteed hitter $t evicted (N=$n, k=$k)")
    }
    // absent-term bound: true <= offset for everything evicted
    (exact.keySet -- present).foreach { t =>
      assert(exact(t) <= sk.offset, s"absent $t true=${exact(t)} > offset=${sk.offset}")
    }
  }

  test("property: sketch bounds hold over random streams and random merge trees") {
    val rnd = new scala.util.Random(99)
    (0 until 25).foreach { trial =>
      val k = 4 + rnd.nextInt(60)
      val vocab = 1 + rnd.nextInt(200)
      val n = 200 + rnd.nextInt(3000)
      // zipf-ish draw so some terms are heavy
      val stream = Vector.fill(n)(s"w${(math.pow(rnd.nextDouble(), 2.5) * vocab).toInt}")
      // random merge tree: split into 1..8 chunks, build sketches,
      // fold-merge in random order (serialize round-trip on some)
      val chunks = rnd.shuffle(stream).grouped(n / (1 + rnd.nextInt(8)) + 1).toVector
      val sketches = chunks.map { c =>
        val sk = FreqSketch.empty(k); c.foreach(sk.update)
        if (rnd.nextBoolean()) FreqSketch.deserialize(sk.serialize()) else sk
      }
      val merged = rnd.shuffle(sketches).reduce(_ merge _)
      val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      assert(merged.totalSeen == n, s"trial $trial: total")
      assert(merged.size <= k, s"trial $trial: size")
      val present = merged.topK(k).map(_._1).toSet
      merged.topK(k).foreach { case (t, est, err) =>
        val truth = exact(t)
        assert(est >= truth && truth >= est - err,
          s"trial $trial k=$k: $t est=$est err=$err true=$truth")
      }
      // presence guarantee + absent-term bound
      exact.foreach { case (t, truth) =>
        if (truth > n / (k + 1))
          assert(present.contains(t), s"trial $trial k=$k: hitter $t evicted")
        if (!present.contains(t))
          assert(truth <= merged.offset,
            s"trial $trial k=$k: absent $t true=$truth > offset=${merged.offset}")
      }
    }
  }

  test("sketch serialize/deserialize round-trips and keeps accepting updates") {
    val sk = FreqSketch.empty(4)
    Seq("a", "a", "b", "c", "d", "e").foreach(sk.update)
    val back = FreqSketch.deserialize(sk.serialize())
    assert(back.totalSeen == 6 && back.size <= 4)
    back.update("a")
    assert(back.estimate("a") >= 3) // a had 2, +1, possibly inflated by eviction err
    assert(back.topK(1).head._1 == "a")
  }

  test("deserialize rejects foreign and corrupt blobs with a descriptive error") {
    def expectBad(bytes: Array[Byte], clue: String): Unit = {
      val e = intercept[IllegalArgumentException](FreqSketch.deserialize(bytes))
      assert(e.getMessage.contains("FreqSketch"), s"$clue: ${e.getMessage}")
    }
    expectBad(Array[Byte](1, 2, 3), "truncated header")
    expectBad(new Array[Byte](64), "zeroed blob (wrong magic)")
    expectBad(graft.sketch.KllSketch.empty().serialize(), "KLL blob (foreign magic)")
    // valid prefix, then lie about an entry length: must reject, not allocate
    val sk = FreqSketch.empty(4)
    Seq("alpha", "beta", "alpha").foreach(sk.update)
    val blob = sk.serialize()
    val evil = blob.clone()
    evil(28) = 0x7f.toByte // first entry's term length -> ~2^31
    expectBad(evil, "oversized term length")
    // and an entry count beyond capacity
    val evil2 = blob.clone()
    evil2(27) = 99.toByte
    expectBad(evil2, "entry count beyond capacity")
    FreqSketch.deserialize(blob) // the untouched blob still parses
  }

  test("legacy (pre-magic) blobs still deserialize with full validation") {
    // hand-build the legacy layout: capacity, total, offset, n, entries
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(8); out.writeLong(5L); out.writeLong(0L); out.writeInt(2)
    for ((t, c, e) <- Seq(("alpha", 3L, 0L), ("beta", 2L, 0L))) {
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    val legacy = FreqSketch.deserialize(bos.toByteArray)
    assert(legacy.capacity == 8 && legacy.totalSeen == 5 &&
      legacy.estimate("alpha") == 3 && legacy.estimate("beta") == 2)
    // corrupt legacy (entry count beyond capacity) still rejected
    val evil = bos.toByteArray.clone(); evil(23) = 99.toByte
    intercept[IllegalArgumentException](FreqSketch.deserialize(evil))
  }

  test("freq drift: shifted categorical distribution fails, matching one passes") {
    import graft.checks.FreqDriftCheck
    val clean = (0 until 2000).map(i => (i.toLong, s"c${i % 5}"))
      .toDF("id", "cat").withColumn("part", lit(0))
    val profile = FreqDriftCheck.buildProfile(clean, "cat", capacity = 32)
    // same distribution -> tiny chi2
    val same = FreqDriftCheck("cat", profile, threshold = 10.0, capacity = 32)
      .run(clean).verdicts.head()
    assert(same.getBoolean(2), s"identical distribution flagged: $same")
    // collapse to one category -> massive chi2
    val shifted = clean.withColumn("cat", lit("c0"))
    val bad = FreqDriftCheck("cat", profile, threshold = 10.0, capacity = 32)
      .run(shifted).verdicts.head()
    assert(!bad.getBoolean(2) && bad.getDouble(4) > 1000.0, bad.toString)
    // profile round-trips through bytes (persistability)
    assert(graft.sketch.FreqSketch.deserialize(profile).size == 5)
    // novel-category drift: mass moves to a category the profile never
    // saw while the conditional distribution over profiled cats stays
    // uniform — the "other" cell must catch it
    val novel = (0 until 2000).map { i =>
      // i%50 in 45..49 -> c0..c4 exactly uniform: the conditional
      // distribution over profiled categories is UNCHANGED
      (i.toLong, if (i % 50 < 45) "novel" else s"c${i % 5}")
    }.toDF("id", "cat").withColumn("part", lit(0))
    val nv = FreqDriftCheck("cat", profile, threshold = 10.0, capacity = 32)
      .run(novel).verdicts.head()
    assert(!nv.getBoolean(2) && nv.getDouble(4) > 1000.0,
      s"novel-category drift missed: $nv")
    // integer-coded categorical columns are coerced, not rejected
    val intCat = (0 until 100).map(i => (i.toLong, i % 5)).toDF("id", "cat")
      .withColumn("part", lit(0))
    val ip = FreqDriftCheck.buildProfile(intCat, "cat", 32)
    assert(FreqDriftCheck("cat", ip, threshold = 10.0, capacity = 32)
      .run(intCat).verdicts.head().getBoolean(2))
  }

  test("packStream: straddling docs, per-group streams, hand-checked coordinates") {
    val df = Seq(
      (1L, "en", 100L), (2L, "en", 80L), (3L, "en", 150L), // en stream: 0,100,180
      (4L, "de", 300L), (5L, "de", 10L))                   // de stream: 0,300
      .toDF("doc_id", "lang", "n")
    val got = Packing.packStream(df, "lang", "doc_id", "n", capacity = 128)
      .select("doc_id", "tok_start", "pack_id", "pack_offset", "n_packs_spanned")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((0L, 0L, 0L, 1L)))       // fills pack 0 exactly to 100
    assert(got(2L) == ((100L, 0L, 100L, 2L)))   // straddles packs 0->1 (ends at 179)
    assert(got(3L) == ((180L, 1L, 52L, 2L)))    // packs 1->2 (ends at 329)
    assert(got(4L) == ((0L, 0L, 0L, 3L)))       // 300 tokens span packs 0,1,2
    assert(got(5L) == ((300L, 2L, 44L, 1L)))
  }

  test("packStream conservation: every token position maps to exactly one doc") {
    val rnd = new scala.util.Random(13)
    val docs = (0 until 200).map(i => (i.toLong, s"g${i % 3}", 1L + rnd.nextInt(90)))
      .toDF("doc_id", "g", "n")
    val rows = Packing.packStream(docs, "g", "doc_id", "n", capacity = 64)
      .select("g", "doc_id", "tok_start", "n").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, grp) =>
      val sorted = grp.sortBy(_._2)
      // starts are the exclusive prefix sums: contiguous, gap-free
      sorted.foldLeft(0L) { case (expect, (_, id, start, len)) =>
        assert(start == expect, s"doc $id starts at $start, expected $expect")
        expect + len
      }
    }
  }
}
