package graft

import graft.ops.WebText
import org.apache.spark.sql.functions._

/** Parity proof for the fused [[graft.compile.StripMarkup]] kernel
  * against the original eleven-pass regex chain
  * ([[WebText.stripMarkupChain]]) — the chain IS the specification (the
  * q_html_strip / q_curate_web DuckDB oracles restate it in SQL), so
  * the kernel must be byte-exact on every input, including the
  * pathological interleavings that force the staged-splice design. */
class StripMarkupSpec extends SparkSpec {
  import spark.implicits._

  private def assertParity(inputs: Seq[String]): Unit = {
    val rows = inputs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), col("text"),
        WebText.stripMarkup(col("text")).as("kernel"),
        WebText.stripMarkupChain(col("text")).as("chain"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(2) == r.getString(3),
        s"kernel/chain mismatch on input ${Option(r.getString(1)).map(s =>
          s"<<${s.take(200)}>>").getOrElse("NULL")}: " +
          s"kernel=<<${r.getString(2)}>> chain=<<${r.getString(3)}>>")
    }
  }

  test("pathological corpus: interleavings, unclosed blocks, entity edges") {
    assertParity(Seq(
      null,
      "",
      "   ",
      "plain text, no markup at all",
      // pass-order interleaving: the script pass consumes the first
      // </style> closer, so the style pass sees a different text —
      // the case where a one-scan priority automaton diverges
      "<style>a<script>b</style>c</script>d</style>",
      "<script>a<style>b</script>c</style>d</script>",
      // lazy closer inside a comment: script removal eats through it,
      // leaving "-->" debris that no later pass touches
      "<script>a<!-- </script> -->b</script>",
      // unclosed opener: the [^>]* run swallows the closer's '<', no
      // second closer -> no block; the generic tag pass cleans the shell
      "<script a> x",
      "<script foo </script>x",
      "<scripts>alert</scripts>",
      "<scriptx y>body</script>done",
      "<SCRIPT TYPE=\"text/js\">var x=1;</ScRiPt>after",
      "<STYLE media=all>body{}</sTyLe>kept",
      // comment minimality
      "<!---->", "<!--->", "<!-->", "a<!-- x --><!-- y -->b",
      "<!-- unterminated", "-->loose<!--",
      // tags vs entity-encoded angle brackets (decode runs AFTER tags)
      "a < b &gt; c",
      "a <b &gt; c> d",
      "<>", "<<<", ">>>", "< >< >",
      "x<no-close",
      // entity boundary overlaps; &amp; decodes last / once
      "&amp;lt;", "&amp;nbsp;", "&amp;amp;", "&ampamp;", "&lt;&gt;&quot;&#39;",
      "&nbsp;&nbsp;x&nbsp;", " &lt;x", "x&nbsp;", "&bogus; &", "&#3;", "&#390;",
      // whitespace classes: \s collapses, U+00A0 and U+2028 are content
      "a\t\n\f\r b", " ", "x ", " x  y  z",
      // multibyte UTF-8 around structure
      "日<b>本</b>語", "é&amp;é", "<p>héllo &quot;wörld&#39;</p>",
      "<div class=\"c\">text &amp; more</div><script>track()</script>",
      // nested same-name openers: lazy closer ends at the FIRST </script>
      "<script><script>x</script>y</script>",
      "<style><style>x</style>y</style>"))
  }

  test("randomized parity sweep over HTML-ish fragment concatenations") {
    val frags = Array(
      "<script>", "</script>", "<ScRiPt x=1>", "</SCRIPT>", "<script",
      "<style>", "</style>", "<style media=x>", "</STYLE>", "style",
      "<!--", "-->", "<!", "--", "<", ">", "</", "/>", "<b>", "</b>",
      "<div class=\"c\">", "</div>", "script", "ipt>", "<scr",
      "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;", "&amp;", "&amp;lt;",
      "&", ";", "&x;", "text", "a b", "xyz", "1", " ", "  ", "\n", "\t",
      "\r\n", "é", "日本", " ", "-", "!", "=\"q\"")
    val rnd = new scala.util.Random(0x5712bea7L) // deterministic sweep
    val inputs = (0 until 600).map { _ =>
      val n = rnd.nextInt(24)
      (0 until n).map(_ => frags(rnd.nextInt(frags.length))).mkString
    }
    assertParity(inputs)
  }

  test("kernel output values: the documented examples hold") {
    val got = Seq(
      ("<html><body><h1>T</h1><p>a &amp; b</p>" +
        "<!-- c --><script>var x</script></body></html>", "T a & b"),
      ("no markup", "no markup"),
      ("  padded\n\ntext  ", "padded text"))
      .toDF("text", "want")
      .select(WebText.stripMarkup(col("text")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
  }
}
