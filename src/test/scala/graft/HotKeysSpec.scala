package graft

import graft.ops._
import graft.ops.HotKeys.SkewGuard
import org.apache.spark.sql.functions._

/** The window-sort skew guard: a synthetic bot-grade entity (10^6
  * events against 50 normal entities) must be detected, droppable, and
  * raisable across sessionize / asofJoin / packStream, with the cool
  * keys' results unchanged and the guarded frame's per-key population
  * bounded by the cap. */
class HotKeysSpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 10000L

  // 10^6-event bot + 50 entities with 100 events each, 90s apart (every
  // event breaks a 60s-gap session, so labels are fully predictable)
  lazy val events = {
    val bot = spark.range(1000000L).select(
      lit("bot").as("user_id"),
      col("id").as("event_id"),
      timestamp_micros(col("id") * 1000000L).as("ts"))
    val cool = spark.range(5000L).select(
      concat(lit("u"), col("id") % 50).as("user_id"),
      (col("id") + 2000000L).as("event_id"),
      timestamp_micros(floor(col("id") / 50).cast("long") * 90000000L).as("ts"))
    bot.unionByName(cool)
  }

  test("hotKeys detects exactly the bot entity, linear and sort-free") {
    val hot = HotKeys.hotKeys(events, Seq("user_id"), Cap).collect()
    assert(hot.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("bot", 1000000L)))
    // the detector must be a hash aggregate, not a window sort
    val plan = HotKeys.hotKeys(events, Seq("user_id"), Cap)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("sessionize Drop: bot excluded, per-key input bounded, cool labels unchanged") {
    val guarded = Sessions.sessionize(events, "user_id", "ts", "event_id", 60,
      guard = SkewGuard.Drop(Cap))
    val counts = guarded.groupBy("user_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("bot") && counts.size == 50)
    assert(counts.values.max <= Cap, s"unbounded task input: $counts")
    // every cool event 90s apart with gap 60s -> one session per event
    val seqs = guarded.groupBy("user_id")
      .agg(max("session_seq").as("m"), countDistinct("session_seq").as("d"))
      .collect()
    assert(seqs.forall(r => r.getLong(1) == 99L && r.getLong(2) == 100L))
    // identical to the unguarded run on the cool subset
    val unguarded = Sessions.sessionize(
      events.where(col("user_id") =!= "bot"), "user_id", "ts", "event_id", 60)
      .select("event_id", "session_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded.select("event_id", "session_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == unguarded)
  }

  test("sessionize Raise: fails fast at call time naming the operator") {
    val e = intercept[IllegalStateException](
      Sessions.sessionize(events, "user_id", "ts", "event_id", 60,
        guard = SkewGuard.Raise(Cap)))
    assert(e.getMessage.contains("sessionize") && e.getMessage.contains("bot"),
      e.getMessage)
  }

  test("asofJoin Drop: hot key absent, cool keys match the unguarded join") {
    val left = Seq(("a", 10L, 1L), ("a", 25L, 2L), ("b", 10L, 3L))
      .toDF("k", "t", "lid")
      .union(spark.range(30000L).select(lit("bot"), col("id"), col("id") + 100L))
    val right = Seq(("a", 5L, "m1"), ("a", 20L, "m2"), ("b", 99L, "m3"))
      .toDF("k", "t", "mark")
    def run(g: SkewGuard) =
      TemporalJoins.asofJoin(left, right, "k", "t", Seq("mark"), guard = g)
        .select("lid", "asof_mark").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val got = run(SkewGuard.Drop(1000))
    assert(got == Map(1L -> Some("m1"), 2L -> Some("m2"), 3L -> None), got.toString)
    intercept[IllegalStateException](
      TemporalJoins.asofJoin(left, right, "k", "t", Seq("mark"),
        guard = SkewGuard.Raise(1000)))
  }

  test("packStream Drop: giant pack group excluded, cool group coordinates intact") {
    val docs = Seq(("g1", 1L, 300L), ("g1", 2L, 300L), ("g1", 3L, 600L))
      .toDF("grp", "doc_id", "n_tok")
      .union(spark.range(50000L).select(lit("gBot"), col("id") + 10L, lit(100L)))
    val packed = Packing.packStream(docs, "grp", "doc_id", "n_tok", 512,
      guard = SkewGuard.Drop(1000))
    val got = packed.select("doc_id", "tok_start", "pack_id", "pack_offset")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(1L -> ((0L, 0L, 0L)), 2L -> ((300L, 0L, 300L)),
      3L -> ((600L, 1L, 88L))), got.toString)
  }

  test("Drop guard catches a NULL hot key (null-safe membership join)") {
    // unattributed events: the degenerate key IS null
    val ev = spark.range(20000L).select(
      when(col("id") < 19000L, lit(null).cast("string"))
        .otherwise(concat(lit("u"), col("id") % 10)).as("user_id"),
      col("id").as("event_id"),
      timestamp_micros(col("id") * 1000000L).as("ts"))
    val hot = HotKeys.hotKeys(ev, Seq("user_id"), 1000).collect()
    assert(hot.map(r => Option(r.getString(0))).toSeq == Seq(None),
      hot.mkString(","))
    val guarded = Sessions.sessionize(ev, "user_id", "ts", "event_id", 60,
      guard = SkewGuard.Drop(1000))
    assert(guarded.where(col("user_id").isNull).count() == 0,
      "NULL hot key leaked past the Drop guard")
    assert(guarded.count() == 1000)
    intercept[IllegalStateException](
      Sessions.sessionize(ev, "user_id", "ts", "event_id", 60,
        guard = SkewGuard.Raise(1000)))
  }

  test("Off guard leaves the plan byte-identical to the unguarded formulation") {
    def norm(s: String) = s.replaceAll("#\\d+", "#") // strip expr ids
    val a = norm(Sessions.sessionize(events, "user_id", "ts", "event_id", 60)
      .queryExecution.optimizedPlan.toString)
    val b = norm(Sessions.sessionize(events, "user_id", "ts", "event_id", 60,
      guard = SkewGuard.Off).queryExecution.optimizedPlan.toString)
    assert(a == b)
  }
}
