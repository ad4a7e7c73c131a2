package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Character-level BPE tokenizer — the published Sennrich et al. (2016)
  * subword algorithm, the actual tokenize step of a pretraining
  * pipeline (the repo's tokenCount* columns COUNT tokens; this one
  * PRODUCES them, with a trainable merge table).
  *
  * Train: merges are learned driver-side from a DETERMINISTIC bounded
  * sample ([[Sampling.sampleExactK]] — same sample every run, engine,
  * partitioning), the published practice (tokenizers train on a corpus
  * sample; the corpus-sized work is encoding, not training). Word-level
  * frequency census; each merge joins the most frequent adjacent symbol
  * pair, ties broken lexicographically — fully deterministic.
  *
  * Encode: one narrow [[graft.compile.BpeEncode]] kernel pass with the
  * ranked merge table as plan literals — zero joins, zero shuffle, scan
  * speed at 100 TB. Tokens are STRINGS whose concatenation is exactly
  * the input (whitespace runs are their own tokens; merges never cross
  * whitespace), so the gate holds the round-trip invariant
  * `array_join(tokens, '') == text` on every document — an exact,
  * engine-independent oracle with no reference tokenizer needed. OOV
  * characters (unseen at train time) pass through as single-char
  * tokens; [[tokenIds]] maps them to [[UnkId]].
  */
object Bpe {

  val UnkId: Int = 0

  /** A trained tokenizer: `merges` in application order (rank = index),
    * `vocab` = id-ordered symbol list (UNK at [[UnkId]], then the
    * training alphabet sorted, then one symbol per merge). */
  final case class Model(merges: Vector[(String, String)],
                         vocab: Vector[String]) {
    require(vocab.nonEmpty && vocab.head == "<unk>", "vocab(0) must be <unk>")
    @transient lazy val ids: Map[String, Int] = vocab.zipWithIndex.toMap

    def serialize: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(Model.Magic); out.writeByte(Model.Version)
      out.writeInt(merges.length)
      merges.foreach { case (a, b) => out.writeUTF(a); out.writeUTF(b) }
      out.writeInt(vocab.length)
      vocab.foreach(out.writeUTF)
      out.flush(); bos.toByteArray
    }
  }

  object Model {
    private[ops] val Magic = 0x47425031 // "GBP1"
    private[ops] val Version = 1

    def deserialize(blob: Array[Byte]): Model = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(blob))
      try {
        require(in.readInt() == Magic, "bpe blob: bad magic")
        require(in.readByte() == Version, "bpe blob: unsupported version")
        val nm = in.readInt()
        require(nm >= 0 && nm <= blob.length, "bpe blob: implausible merge count")
        val merges = Vector.fill(nm)((in.readUTF(), in.readUTF()))
        val nv = in.readInt()
        require(nv >= 1 && nv <= blob.length, "bpe blob: implausible vocab size")
        // distinct: normalize blobs written before vocab dedup existed
        Model(merges, Vector.fill(nv)(in.readUTF()).distinct)
      } catch {
        case e: java.io.EOFException =>
          throw new IllegalArgumentException("bpe blob: truncated", e)
      }
    }
  }

  /** Split a string into alternating non-space / whitespace runs (both
    * kept — concatenation reproduces the input exactly). */
  private[ops] def pretokens(s: String): Iterator[String] = new Iterator[String] {
    private var i = 0
    def hasNext: Boolean = i < s.length
    def next(): String = {
      val start = i
      val ws = Character.isWhitespace(s.charAt(i))
      while (i < s.length && Character.isWhitespace(s.charAt(i)) == ws) i += 1
      s.substring(start, i)
    }
  }

  /** Train on a deterministic `sampleRows`-row sample of the corpus.
    * `numMerges` bounds the merge table (vocab = alphabet + merges + 1).
    * Driver cost: O(sample words × merges) — bounded by construction,
    * never corpus-sized; the collect is the exact-k sample. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            sampleRows: Int = 50000): Model = {
    require(numMerges >= 0, "bpe train: numMerges must be >= 0")
    val sample = Sampling.sampleExactK(
      df.select(coalesce(col(textCol), lit("")).as("_t")),
      col("_t"), sampleRows)
      .collect().map(_.getString(0))
    // word census over non-space runs (whitespace runs never merge —
    // they stay single-symbol tokens by construction)
    val wordFreq = new java.util.HashMap[String, Long]()
    sample.foreach(t => pretokens(t).foreach { p =>
      if (!Character.isWhitespace(p.charAt(0)))
        wordFreq.merge(p, 1L, (a, b) => a + b)
    })
    import scala.jdk.CollectionConverters._
    // mutable (symbol-vector → freq) census across rounds: each round
    // rebuilds ONLY the words containing the merged pair (unchanged
    // words keep their Vector by reference) — the r7 trainer re-allocated
    // and re-grouped the ENTIRE map every round, O(rounds × corpus-words)
    // driver allocation for a usually-tiny affected set. Same counts,
    // same tie-breaks, identical merge table.
    var words = new java.util.HashMap[Vector[String], Long]()
    wordFreq.asScala.foreach { case (w, f) =>
      val syms =
        w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
      words.merge(syms, f, (a, b) => a + b)
    }
    val alphabet = words.keySet().asScala.flatten.toSet ++
      sample.flatMap(t => pretokens(t).filter(p =>
        Character.isWhitespace(p.charAt(0))).flatMap(p =>
        p.codePoints().toArray.map(cp => new String(Character.toChars(cp)))))
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var m = 0
    while (m < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.forEach { (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), f, (a, b) => a + b)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // deterministic: max count, ties to the lexicographically
        // smallest (left, right)
        val best = counts.asScala.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        val next = new java.util.HashMap[Vector[String], Long](words.size() * 2)
        words.forEach { (syms, f) =>
          var has = false
          var i = 0
          while (!has && i < syms.length - 1) {
            has = syms(i) == best._1 && syms(i + 1) == best._2
            i += 1
          }
          val key = if (!has) syms else {
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += joined; j += 2
              } else { out += syms(j); j += 1 }
            }
            out.result()
          }
          next.merge(key, f, (a, b) => a + b)
        }
        words = next
        m += 1
      }
    }
    val ms = merges.result()
    // distinct: two merge chains can assemble the same joined string
    // (or literally "<unk>"); duplicate vocab symbols would make the
    // tokenIds map() literal throw under mapKeyDedupPolicy=EXCEPTION
    // and would disagree with Model.ids (toMap keeps last). First
    // occurrence wins, matching merge-rank order.
    val vocab = (Vector("<unk>") ++ alphabet.toVector.sorted ++
      ms.map(p => p._1 + p._2)).distinct
    Model(ms, vocab)
  }

  /** Tokenize a text column: array<string> whose concatenation equals
    * the input exactly (the gate's round-trip invariant). One narrow
    * kernel pass; NULL text → empty array. */
  def encode(text: Column, model: Model): Column =
    ColumnBridge.column(graft.compile.BpeEncode(
      ColumnBridge.expression(coalesce(text, lit(""))),
      model.merges.flatMap(p => Seq(p._1, p._2))))

  /** Map string tokens to vocab ids (OOV → [[UnkId]]) — the persisted
    * training shape. Narrow `transform` over a map literal. */
  def tokenIds(tokens: Column, model: Model): Column = {
    val m = map(model.vocab.zipWithIndex.flatMap { case (s, i) =>
      Seq(lit(s), lit(i)) }: _*)
    transform(tokens, t => coalesce(element_at(m, t), lit(UnkId)))
  }

  /** Encode a corpus: adds `tokens` (strings) and `token_ids`. */
  def tokenize(df: DataFrame, textCol: String, model: Model): DataFrame = {
    val toks = encode(col(textCol), model)
    df.withColumn("tokens", toks)
      .withColumn("token_ids", tokenIds(col("tokens"), model))
  }
}
