package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.compile.WordsKernel
import org.apache.spark.sql.graftbridge.ColumnBridge

/** [[graft.compile.WordsKernel]] must be BIT-IDENTICAL to the Column
  * chain it replaces — every SQL oracle restates that chain, so any
  * divergence breaks the driver gate. Fuzz the equivalence over adversarial
  * unicode plus structured cases. */
class WordsKernelSpec extends SparkSpec {

  /** The original formulation, verbatim (the contract). */
  private def columnWords(text: org.apache.spark.sql.Column) =
    filter(split(lower(regexp_replace(text, "[^\\p{L}\\p{N}\\s]", " ")), "\\s+"),
      w => w =!= "")

  private def kernelWords(text: org.apache.spark.sql.Column) =
    ColumnBridge.column(WordsKernel(ColumnBridge.expression(text)))

  private def check(strings: Seq[String]): Unit = {
    val rows = strings.map(s => Row(s))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("t", StringType, nullable = true))))
    val got = df.select(
        columnWords(col("t")).as("a"), kernelWords(col("t")).as("b"))
      .collect()
    got.zip(strings).foreach { case (r, s) =>
      val a = if (r.isNullAt(0)) null else r.getSeq[String](0)
      val b = if (r.isNullAt(1)) null else r.getSeq[String](1)
      assert(a == b, s"words divergence on ${if (s == null) "NULL"
        else s.map(c => f"\\u${c.toInt}%04x").mkString}:\n column=$a\n kernel=$b")
    }
  }

  test("structured cases: ascii, punctuation, whitespace variants, empties") {
    check(Seq(
      null, "", " ", "\t\n\u000b\f\r", "hello world", "Hello, World!",
      "  leading and trailing  ", "a-b_c.d", "123 abc x9y",
      "ALL CAPS AND MiXeD", "tabs\tand\nnewlines", "!!!", "a", "§±!@#$%",
      "word", "word ", " word", "double  space", "e\u0301 combining",
      "caf\u00e9 na\u00efve", "\u00dcber Stra\u00dfe", "\u0130stanbul",
      "\u03a3\u03af\u03c3\u03c5\u03c6\u03bf\u03c2 \u03a3",
      "\u4e2d\u6587\u5206\u8bcd test", "\u0661\u0662\u0663 digits",
      "\u2163 roman \u2460 circled", "\ud83d\ude00 emoji \ud83c\udf89",
      "\ud835\udc9c math \ud835\udfce", "zero\u200bwidth",
      "nbsp\u00a0sep", "ideographic\u3000space"))
  }

  test("fuzz: 2000 random unicode strings match the Column chain exactly") {
    val rnd = new scala.util.Random(20260818)
    def randString(): String = {
      val len = rnd.nextInt(40)
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        rnd.nextInt(8) match {
          case 0 => sb.append((' ' + rnd.nextInt(95)).toChar) // ascii
          case 1 => sb.append(" \t\n\r\f\u000b".charAt(rnd.nextInt(6)))
          case 2 => sb.append((0x80 + rnd.nextInt(0x500)).toChar) // latin ext/greek/cyrillic
          case 3 => sb.append((0x4e00 + rnd.nextInt(0x100)).toChar) // cjk
          case 4 => // supplementary (emoji / math alnum)
            sb.appendAll(Character.toChars(0x1d400 + rnd.nextInt(0x800)))
          case 5 => sb.append((0x0600 + rnd.nextInt(0x100)).toChar) // arabic
          case 6 => sb.append((0x2000 + rnd.nextInt(0x200)).toChar) // punct/space block
          case 7 => sb.append((0x0300 + rnd.nextInt(0x70)).toChar) // combining
        }
      }
      sb.toString
    }
    check((0 until 2000).map(_ => randString()))
  }
}
