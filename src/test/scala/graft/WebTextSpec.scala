package graft

import graft.ops.WebText
import org.apache.spark.sql.functions._

class WebTextSpec extends SparkSpec {
  import spark.implicits._

  test("urls / domains / urlSignals extract and dedupe in order") {
    val df = Seq(
      (1L, "go to http://A.Example.com/x and https://b.test/y?q=1 then http://a.example.com/z"),
      (2L, "no links here"),
      (3L, null: String)).toDF("id", "text")
    val out = WebText.urlSignals(df, "id", "text").orderBy("id").collect()
    assert(out(0).getLong(1) == 3L) // three URLs, two distinct domains
    assert(out(0).getSeq[String](2) == Seq("a.example.com", "b.test"))
    assert(out(0).getString(3) == "a.example.com")
    assert(out(1).getLong(1) == 0L && out(1).getSeq[String](2).isEmpty
      && out(1).getString(3) == "")
    assert(out(2).getLong(1) == 0L)
  }

  test("canonicalizeUrl: every rule plus non-URL passthrough") {
    val cases = Seq(
      // case folding + www + default port + fragment
      (1L, " HTTP://WWW.Example.COM:80/A/b#frag ", "http://example.com/A/b"),
      (2L, "https://Host.test:443/x", "https://host.test/x"),
      // non-default ports kept; http default on https kept
      (3L, "http://h.test:8080/x", "http://h.test:8080/x"),
      (4L, "https://h.test:80/x", "https://h.test:80/x"),
      // tracking params dropped, remainder sorted; bare utm name dropped
      (5L, "http://h.test/p?utm_source=a&b=2&a=1&gclid=x&utm_x", "http://h.test/p?a=1&b=2"),
      // all params dropped -> no '?'
      (6L, "http://h.test/p?utm_campaign=c&fbclid=z", "http://h.test/p"),
      // empty path -> /, trailing slashes collapse
      (7L, "http://h.test", "http://h.test/"),
      (8L, "http://h.test/a/b///", "http://h.test/a/b"),
      (9L, "http://h.test/?b=2&a=1", "http://h.test/?a=1&b=2"),
      // non-URL passthrough (trimmed only)
      (10L, "  not a url  ", "not a url"),
      (11L, "ftp//missing.scheme/x", "ftp//missing.scheme/x"),
      (12L, null.asInstanceOf[String], ""))
    val df = cases.map { case (id, u, _) => (id, u) }.toDF("id", "url")
    val out = df.withColumn("c", WebText.canonicalizeUrl(col("url")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    cases.foreach { case (id, _, want) =>
      assert(out(id) == want, s"id=$id got=${out(id)} want=$want") }
    // pure narrow projection
    val plan = df.select(WebText.canonicalizeUrl(col("url")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("domain blocklist matches exact hosts and parent suffixes") {
    val docs = Seq(
      (1L, "see http://ads.bad.test/x"),     // subdomain of blocked suffix
      (2L, "see http://bad.test/x"),         // exact blocked suffix
      (3L, "see http://goodbad.test/x"),     // NOT a suffix match (no dot)
      (4L, "see http://exact.host.test/x"),  // exact blocked host
      (5L, "see http://fine.test/x"),        // unblocked
      (6L, "no urls at all")).toDF("id", "text")
    val blocked = Seq("bad.test", "exact.host.test").toDF("domain")
    val kept = WebText.filterByDomainBlocklist(docs, "id", "text", blocked, "domain")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 5L, 6L))
  }

  test("stripMarkup removes blocks, tags, comments; decodes entities once") {
    val df = Seq(
      (1L, "<p>Hello <b>world</b></p><script>var x = '<b>not text</b>';</script>"),
      (2L, "<STYLE a=b>h1 {}</style>A &amp;lt; B &lt;ok&gt; &nbsp;&#39;q&#39;"),
      (3L, "line1\n\n  <br/>line2 <!-- note with <i>tag</i> --> end"),
      (4L, null: String)).toDF("id", "text")
    val out = df.select(col("id"), WebText.stripMarkup(col("text")).as("c"))
      .orderBy("id").as[(Long, String)].collect().map(_._2)
    assert(out(0) == "Hello world")
    assert(out(1) == "A &lt; B <ok> 'q'") // &amp;lt; single-decodes
    assert(out(2) == "line1 line2 end")
    assert(out(3) == "")
  }

  test("domainSuffixes yields the parent chain") {
    val s = spark.range(1).select(
      WebText.domainSuffixes(lit("a.b.co.uk")).as("s"))
      .collect()(0).getSeq[String](0)
    assert(s == Seq("a.b.co.uk", "b.co.uk", "co.uk", "uk"))
  }
}
