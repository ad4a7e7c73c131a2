package graft

import graft.ops.TemporalJoins
import org.apache.spark.sql.functions._

/** As-of and range joins: hand cases, naive-join parity on random data,
  * and the plan shapes that justify their existence. */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest-at-or-before semantics, equal-ts match, no-match nulls") {
    val left = Seq((1L, 7L, 100L), (2L, 7L, 200L), (3L, 7L, 50L), (4L, 9L, 100L))
      .toDF("event_id", "key", "ts")
    val right = Seq((7L, 100L, "a"), (7L, 150L, "b"), (8L, 10L, "z"))
      .toDF("key", "ts", "tag")
    val got = TemporalJoins.asofJoin(left, right, "key", "ts", Seq("tag"))
      .select("event_id", "asof_tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      1L -> Some("a"),   // equal ts matches (<= semantics)
      2L -> Some("b"),   // latest preceding, not first
      3L -> None,        // nothing at-or-before
      4L -> None), got.toString) // key with no right rows at all
  }

  test("asofJoin equals a naive non-equi join on random data") {
    val rnd = new scala.util.Random(11)
    val left = (0 until 300).map(i =>
      (i.toLong, (i % 7).toLong, rnd.nextInt(1000).toLong))
      .toDF("event_id", "key", "ts")
    // unique (key, ts) on the right, as the operator requires
    val right = (0 until 200).map(i =>
      ((i % 9).toLong, (i / 9).toLong * 13 + (i % 9), i.toLong))
      .toDF("key", "ts", "ref")
    val got = TemporalJoins.asofJoin(left, right, "key", "ts", Seq("ref"))
      .select("event_id", "asof_ref").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // naive oracle: max-ts right row per left row via join + aggregation
    val naive = left.as("l")
      .join(right.as("r"), col("l.key") === col("r.key") &&
        col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("l.event_id"))
      .agg(max_by(col("r.ref"), col("r.ts")).as("ref"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == naive,
      s"diff=${got.toSet -- naive.toSet} / ${naive.toSet -- got.toSet}")
  }

  test("asofJoin: NULL-timestamp right rows match nothing") {
    val left = Seq((1L, 7L, 50L)).toDF("event_id", "key", "ts")
    val right = Seq((7L, Option.empty[Long], "ghost"), (7L, Some(100L), "late"))
      .toDF("key", "ts", "tag")
    val got = TemporalJoins.asofJoin(left, right, "key", "ts", Seq("tag"))
      .select("asof_tag").head()
    assert(got.isNullAt(0), s"NULL-ts mark leaked into the carry: $got")
  }

  test("asofJoin plan: one hash exchange on the key, no nested-loop join") {
    val left = Seq((1L, 7L, 100L)).toDF("event_id", "key", "ts")
    val right = Seq((7L, 100L, "a")).toDF("key", "ts", "tag")
    val plan = TemporalJoins.asofJoin(left, right, "key", "ts", Seq("tag"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop in asof plan:\n$plan")
    assert(!plan.contains("Join"), s"asof needs no join operator at all:\n$plan")
  }

  test("rangeJoin equals the naive non-equi join; [lo, hi) boundaries exact") {
    val rnd = new scala.util.Random(5)
    val points = (0 until 400).map(i => (i.toLong, rnd.nextInt(500).toLong))
      .toDF("pid", "p")
    val intervals = (0 until 60).map { i =>
      val lo = rnd.nextInt(450).toLong
      (i.toLong, lo, lo + 1 + rnd.nextInt(80).toLong)
    }.toDF("iid", "lo", "hi")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = key(TemporalJoins.rangeJoin(points, "p", intervals, "lo", "hi", 32))
    val naive = key(points.join(intervals,
      col("p") >= col("lo") && col("p") < col("hi")))
    assert(got == naive, s"missing=${naive -- got} extra=${got -- naive}")
    // boundary pin: point exactly at lo matches, exactly at hi does not
    val b = TemporalJoins.rangeJoin(
      Seq((1L, 10L), (2L, 20L)).toDF("pid", "p"), "p",
      Seq((1L, 10L, 20L)).toDF("iid", "lo", "hi"), "lo", "hi", 7)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(b == Set(1L), b.toString)
  }

  test("rangeJoin handles negative values (floor-division bucketing)") {
    val points = Seq((1L, -15L), (2L, -8L), (3L, 0L), (4L, -20L)).toDF("pid", "p")
    val intervals = Seq((1L, -20L, -10L), (2L, -10L, 5L), (3L, -3L, -1L))
      .toDF("iid", "lo", "hi")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = key(TemporalJoins.rangeJoin(points, "p", intervals, "lo", "hi", 8))
    val naive = key(points.join(intervals,
      col("p") >= col("lo") && col("p") < col("hi")))
    assert(got == naive, s"missing=${naive -- got} extra=${got -- naive}")
    assert(naive == Set((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("rangeJoin plan: hash equi-join on the bucket, not BroadcastNestedLoopJoin") {
    val points = Seq((1L, 10L)).toDF("pid", "p")
    val intervals = Seq((1L, 5L, 15L)).toDF("iid", "lo", "hi")
    val plan = TemporalJoins.rangeJoin(points, "p", intervals, "lo", "hi", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
    assert(plan.contains("HashJoin"), s"expected a hash join on _bucket:\n$plan")
  }
}
