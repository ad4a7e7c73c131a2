package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword-overlap heuristic), quality scoring, token counting, and
  * document fingerprinting. All pure Catalyst expressions — narrow, no
  * UDFs, no shuffle; at 100 TB these run at scan speed.
  */
object TextAnalysis {

  /** Whitespace word list (lowercased, punctuation stripped) — the
    * [[graft.compile.WordsKernel]] single JVM pass, bit-identical to the
    * reference chain
    * `filter(split(lower(regexp_replace(text, "[^\p{L}\p{N}\s]", " ")),
    * "\s+"), _ =!= "")` (WordsKernelSpec fuzzes the equivalence; the SQL
    * oracles keep restating that chain). The kernel replaces two regex
    * automata + a lambda HOF per row, and — because Spark's lambda HOFs
    * are CodegenFallback — lets stages tokenizing text stay inside
    * whole-stage codegen. */
  def words(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.WordsKernel(
      ColumnBridge.expression(text)))
  }

  // Small function-word inventories per language (public knowledge).
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "que", "para"),
  )

  /** The one-pass character/word census kernel
    * ([[graft.compile.TextCounts]]) — integer inputs for
    * [[qualityScore]] / [[tokenCountBpe]] / [[tokenCountWs]], replacing
    * three regex scans + a lambda HOF per row with one JVM pass. */
  def textCounts(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.TextCounts(
      ColumnBridge.expression(text)))
  }

  /** All four languages' stopword hit-rates over a precomputed word list
    * in ONE array pass (`struct<de,en,es,fr>` —
    * [[graft.compile.StopwordScores]]); the per-language Column chain is
    * a lambda filter per language per row. */
  def stopwordScoresFromWords(ws: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val langs = stopwords.keys.toSeq.sorted
    ColumnBridge.column(graft.compile.StopwordScores(
      ColumnBridge.expression(ws), langs, langs.map(stopwords)))
  }

  /** Per-language stopword hit-rate over a precomputed word list. */
  def stopwordRatioFromWords(ws: Column, lang: String): Column =
    stopwordScoresFromWords(ws).getField(lang)

  /** The original Column formulation of [[stopwordRatioFromWords]]
    * (parity oracle for [[graft.compile.StopwordScores]]). */
  private[graft] def stopwordRatioColumns(ws: Column, lang: String): Column = {
    val sw = stopwords(lang)
    when(size(ws) > 0,
      size(filter(ws, w => w.isin(sw: _*))).cast("double") / size(ws))
      .otherwise(lit(0.0))
  }

  /** Per-language stopword hit-rate. */
  def stopwordRatio(text: Column, lang: String): Column =
    stopwordRatioFromWords(words(text), lang)

  /** Language ID over a precomputed word list: argmax of stopword
    * hit-rate, 'und' (undetermined) when every rate is 0. Deterministic
    * tie-break by language code order. Prefer binding `words(text)` in its
    * own projection and calling this — the tokenization HOF is the
    * dominant cost and interpreted HOFs get no codegen CSE, so the inlined
    * [[langId]] recomputes it once per language. */
  def langIdFromWords(ws: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val sc = stopwordScoresFromWords(ws)
    // the kernel subtree appears once per language struct; whole-stage
    // codegen subexpression elimination evaluates it once per row (no
    // lambda anywhere in this tree anymore, so both WSCG and CSE apply)
    val scored = langs.map(l => struct(sc.getField(l).as("score"),
      lit(l).as("lang")))
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** n-gram-free language ID (single-expression convenience form). */
  def langId(text: Column): Column = langIdFromWords(words(text))

  /** Whitespace token count (= [[textCounts]] `n_words`: replacement and
    * lowercasing never change the L/N run structure `words` splits on). */
  def tokenCountWs(text: Column): Column = textCounts(text).getField("n_words")

  /** BPE-ish token count: alphanumeric runs + individual non-space
    * punctuation characters, the unit count a byte-pair pre-tokenizer's
    * regex pass produces (defined arithmetically — no lookarounds — so
    * RE2-based engines can restate it). One [[textCounts]] pass:
    * `n_words + n_punct` ≡ the split-runs + stripped-length chain
    * (parity pinned in TextCountsSpec). */
  def tokenCountBpe(text: Column): Column = {
    val c = textCounts(text)
    c.getField("n_words") + c.getField("n_punct")
  }

  /** The original Column formulations of the [[textCounts]] consumers
    * (parity oracles for [[graft.compile.TextCounts]]). */
  private[graft] def tokenCountWsColumns(text: Column): Column =
    size(filter(split(lower(regexp_replace(text, "[^\\p{L}\\p{N}\\s]", " ")),
      "\\s+"), w => w =!= ""))
  private[graft] def tokenCountBpeColumns(text: Column): Column =
    size(filter(split(text, "[^\\p{L}\\p{N}]+"), t => t =!= "")) +
      length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", ""))

  /** Heuristic document quality in [0,1]: length band, alpha ratio, mean
    * word length band, whitespace sanity. The standard cheap pre-filter
    * stack for web-scale corpora. */
  def qualityScore(text: Column): Column = {
    // one textCounts pass replaces length(text) + two regex strips +
    // the tokenizer; every downstream double op keeps the exact Column
    // arithmetic (n_letter ≡ strip-non-L length, n_cp - n_ws ≡
    // strip-\s+ length — TextCountsSpec pins the integer equalities)
    val c = textCounts(text)
    val n = c.getField("n_cp")
    val alphaRatio = (c.getField("n_letter").cast("double") /
      greatest(n, lit(1)))
    val wordCount = c.getField("n_words")
    val meanWordLen = when(wordCount > 0,
      (n - c.getField("n_ws")).cast("double") / wordCount)
      .otherwise(lit(0.0))
    val lengthOk = when(n >= 100 && n <= 20000, lit(1.0))
      .when(n >= 20 && n < 100, lit(0.5)).otherwise(lit(0.0))
    val wordLenOk = when(meanWordLen >= 3 && meanWordLen <= 12, lit(1.0)).otherwise(lit(0.3))
    Rounding.roundAt(lengthOk * 0.4 + alphaRatio * 0.3 + wordLenOk * 0.3, 4)
  }

  /** Raw n-gram frequency stats (total, distinct, most-frequent count)
    * over a word list, one JVM pass ([[graft.compile.NgramStats]]). */
  def ngramStats(ws: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.NgramStats(ColumnBridge.expression(ws), n))
  }

  /** Fractions from a PRECOMPUTED [[ngramStats]] struct — bind the stats
    * in their own projection and feed the attribute here (see
    * [[repetitionSignals]] for why). Rounded to 6 places so SQL oracles
    * can restate the arithmetic exactly. */
  def repetitionFromStats(st: Column): Column = {
    val total = st.getField("total_ngrams").cast("double")
    val dup = when(total > 0,
      Rounding.roundAt(lit(1.0) - st.getField("distinct_ngrams") / total, 6)).otherwise(lit(0.0))
    val top = when(total > 0,
      Rounding.roundAt(st.getField("top_ngram_count") / total, 6)).otherwise(lit(0.0))
    struct(dup.as("dup_ngram_frac"), top.as("top_ngram_frac"))
  }

  /** Gopher/C4-style repetition quality signals over word n-grams:
    *  - `dup_ngram_frac`: fraction of n-gram occurrences that repeat an
    *    earlier occurrence (1 - distinct/total),
    *  - `top_ngram_frac`: occurrences of the most frequent n-gram / total.
    * Docs with fewer than n words score 0.0 on both (no signal ≠
    * repetitive).
    *
    * The stats struct is referenced six times by the fraction arithmetic,
    * and Spark's subexpression elimination skips any tree containing a
    * lambda variable (`words`' filter), so this DataFrame form binds the
    * O(doc) kernel in its OWN projection — CollapseProject keeps a
    * non-cheap multiply-referenced alias un-inlined, so tokenization +
    * the kernel run once per row, not six times. Adds
    * `dup_ngram_frac` / `top_ngram_frac` columns. */
  def repetitionSignals(df: org.apache.spark.sql.DataFrame, textCol: String,
                        n: Int): org.apache.spark.sql.DataFrame =
    df.withColumn("_ngst", ngramStats(words(col(textCol)), n))
      .withColumn("_rep", repetitionFromStats(col("_ngst")))
      .withColumn("dup_ngram_frac", col("_rep.dup_ngram_frac"))
      .withColumn("top_ngram_frac", col("_rep.top_ngram_frac"))
      .drop("_ngst", "_rep")

  /** PII detector patterns — deliberately lookaround-free so RE2-based
    * engines (and SQL oracles) can restate them verbatim. Order matters
    * for redaction: emails first (they contain dots that the ipv4 pattern
    * could otherwise bite into). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\b\\d{3}-\\d{3}-\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  /** Per-type PII match counts: struct(email, phone, ipv4). */
  def piiCounts(text: Column): Column =
    struct(piiPatterns.map { case (name, pat) =>
      regexp_count(text, lit(pat)).as(name)
    }: _*)

  /** Typed PII span extraction — the audit companion to [[piiRedact]]:
    * one (idCol, kind, match_idx, span) row per PII match, `kind` from
    * [[piiPatterns]], `match_idx` the 0-based occurrence index within
    * (doc, kind) in left-to-right scan order, `span` the matched text.
    * Redaction pipelines log these rows (or their counts) as the
    * removal manifest; reviews sample them. Pure narrow explode — per
    * kind one regexp_extract_all pass, union stacked column-wise (no
    * shuffle); docs with no matches produce no rows. */
  def piiSpans(df: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String): org.apache.spark.sql.DataFrame = {
    val perKind = piiPatterns.map { case (name, pat) =>
      df.select(col(idCol),
          regexp_extract_all(col(textCol), lit(pat), lit(0)).as("_m"))
        .where(size(col("_m")) > 0)
        .select(col(idCol), lit(name).as("kind"),
          posexplode(col("_m")).as(Seq("match_idx", "span")))
    }
    perKind.reduce(_.unionByName(_))
  }

  /** Redact PII in place: each match replaced by an upper-case type tag
    * (`[EMAIL]`…). Tags contain no digits or dots, so later patterns
    * cannot re-match inside an earlier redaction. */
  def piiRedact(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (name, pat)) =>
      regexp_replace(acc, pat, s"[${name.toUpperCase}]")
    }

  /** Fixed-size token chunking with stride: explode each doc into
    * (chunk_idx, chunk, n_tokens) windows of `chunkSize` words stepping by
    * `stride` (stride < chunkSize ⇒ overlapping windows, the standard
    * shape for training-sequence preparation). The last chunk may be
    * short; docs with zero words produce zero chunks. Narrow explode —
    * no shuffle; output size is input size × ~(words/stride). */
  def chunkWords(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                 chunkSize: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunkSize >= 1 && stride >= 1, "chunkSize and stride must be >= 1")
    require(stride <= chunkSize,
      s"stride ($stride) > chunkSize ($chunkSize) silently drops the words " +
        "between consecutive windows; use a gap-free configuration")
    // bind the word list once — the explode lambda must slice an
    // attribute, not re-run the tokenization chain per chunk
    val ws = df.select(col(idCol), words(col(textCol)).as("_ws"))
    val nChunks = floor((greatest(size(col("_ws")) - chunkSize, lit(0)) +
      lit(stride - 1)) / stride) + lit(1)
    ws.where(size(col("_ws")) > 0)
      .select(col(idCol), col("_ws"),
        explode(sequence(lit(0), (nChunks - 1).cast("int"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("_ws"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .as("chunk"),
        least(lit(chunkSize), size(col("_ws")) - col("chunk_idx") * stride)
          .cast("long").as("n_tokens"))
  }

  /** Unicode NFC canonical composition ([[graft.compile.NormalizeNfc]]):
    * decomposed sequences (e + combining acute) become their composed
    * forms, so visually-identical strings hash/dedupe identically —
    * run it BEFORE fingerprints, shingles, or exact dedup on corpora
    * with mixed encoders. ASCII rows pass through untouched. */
  def normalizeNfc(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.NormalizeNfc(ColumnBridge.expression(text)))
  }

  /** Full text normalization: NFC + whitespace runs collapsed to single
    * spaces + trimmed — the canonical pre-tokenization cleanup. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(normalizeNfc(text), "\\s+", " "))

  /** Global top-k vocabulary: (term, occurrences), the k most frequent
    * words, ties broken by term so the cut is total and reproducible.
    * Scale shape: partial (map-side) count aggregation, then Spark plans
    * the ordered limit as TakeOrderedAndProject — each task keeps only
    * its local top-k heap and the driver merges k·tasks rows; no global
    * sort, no full-result shuffle. */
  def topTerms(df: org.apache.spark.sql.DataFrame, textCol: String,
               k: Int): org.apache.spark.sql.DataFrame =
    df.select(explode(words(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("term").asc)
      .limit(k)

  /** Polynomial rolling-hash fingerprint over code points, mod 2^31-1 —
    * deterministic across engines and platforms (no float, no JVM hash).
    * Computed by the custom [[graft.compile.Fingerprint32]] expression:
    * one JVM loop over code points instead of the interpreted HOF fold
    * over a one-string-per-character `split` array. */
  def fingerprint(text: Column, mult: Long = 31L): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.compile.Fingerprint32(ColumnBridge.expression(text), mult))
  }

  /** Shannon entropy (bits/char) of the code-point distribution via the
    * one-pass [[graft.compile.CharEntropy]] kernel, rounded to 6 places
    * (terms summed in ascending code-point order in BOTH engines — see
    * the kernel's determinism contract). The cheap gibberish signal:
    * natural prose ≈ 4-5, single-char spam ≈ 0. */
  def charEntropy(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    Rounding.roundAt(ColumnBridge.column(
      graft.compile.CharEntropy(ColumnBridge.expression(text))), 6)
  }

  /** Lexical-diversity signals: `char_entropy` (above) and `ttr` (type-
    * token ratio — distinct words / words, the Gopher "fraction of
    * unique words" signal; 0.0 for empty docs). The unigram stats struct
    * is bound in its own projection (the [[repetitionSignals]] lambda-CSE
    * discipline), so tokenization runs once per row. Narrow, no shuffle. */
  def lexicalSignals(df: org.apache.spark.sql.DataFrame,
                     textCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("_u", ngramStats(words(col(textCol)), 1))
      // coalesce: CharEntropy is nullSafeEval (NULL text -> NULL) but
      // ttr coalesces to 0.0 — keep the two signals' NULL conventions
      // (and the q_lexical oracle's coalesce) in agreement
      .withColumn("char_entropy", coalesce(charEntropy(col(textCol)), lit(0.0)))
      .withColumn("ttr", when(col("_u.total_ngrams") > 0,
        Rounding.roundAt(col("_u.distinct_ngrams").cast("double") /
          col("_u.total_ngrams"), 6)).otherwise(lit(0.0)))
      .drop("_u")

  /** Unicode script signals via the one-pass
    * [[graft.compile.ScriptHistogram]] kernel — the multilingual
    * curation complement to [[langId]]: per-script code-point fractions
    * (rounded 6), letter fraction, and the dominant script. Adds
    * `n_cp`, `n_letters`, `letter_frac`, one `<script>_frac` per major
    * script (arabic, cyrillic, devanagari, greek, han, hangul, hebrew,
    * hiragana, katakana, latin, thai), `dominant_script` and
    * `dominant_frac`. Dominance ties break to the alphabetically
    * smallest script name; a document with no code points in any of
    * the eleven scripts (or no text at all) is `"other"` with fraction
    * 0. Pure narrow projection — scan speed at any corpus size. */
  def scriptSignals(df: org.apache.spark.sql.DataFrame,
                    textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.compile.ScriptHistogram
    val names = ScriptHistogram.scripts.map(_._1)
    val hist = ColumnBridge.column(
      ScriptHistogram(ColumnBridge.expression(col(textCol))))
    val withH = df.withColumn("_sh", hist)
      .withColumn("n_cp", coalesce(col("_sh.n_cp"), lit(0L)))
      .withColumn("n_letters", coalesce(col("_sh.n_letters"), lit(0L)))
    def frac(c: Column) = when(col("n_cp") > 0,
      Rounding.roundAt(c.cast("double") / col("n_cp"), 6)).otherwise(lit(0.0))
    val withFracs = names.foldLeft(
      withH.withColumn("letter_frac", frac(col("n_letters")))) {
      (acc, n) => acc.withColumn(s"${n}_frac",
        frac(coalesce(col(s"_sh.$n"), lit(0L))))
    }
    // positional fold over the name-sorted scripts: strict > keeps the
    // earlier (alphabetically smaller) name on ties
    val cnt = (n: String) => coalesce(col(s"_sh.$n"), lit(0L))
    val (domName, domCnt) = names.tail.foldLeft(
      (lit(names.head), cnt(names.head))) { case ((n0, c0), n) =>
      (when(cnt(n) > c0, lit(n)).otherwise(n0), greatest(cnt(n), c0))
    }
    withFracs
      .withColumn("dominant_script",
        when(domCnt > 0, domName).otherwise(lit("other")))
      .withColumn("dominant_frac", frac(when(domCnt > 0, domCnt).otherwise(lit(0L))))
      .drop("_sh")
  }

  /** Deflate compression ratio (compressed/raw UTF-8 bytes, level 6) via
    * the one-pass [[graft.compile.DeflateRatio]] kernel, rounded to 6.
    * Catches LONG-RANGE repetition (template/boilerplate spam) that the
    * per-character [[charEntropy]] distribution misses; the two together
    * are the standard cheap pair. Narrow, thread-local native deflater —
    * no allocation in the hot loop. Not SQL-oracle-expressible (rows-only
    * gate check); pinned by the unit corpus instead. */
  def compressionRatio(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    Rounding.roundAt(ColumnBridge.column(
      graft.compile.DeflateRatio(ColumnBridge.expression(text))), 6)
  }

  /** Gopher-style document quality filter (the published rule set for
    * web-corpus pre-filtering), as per-rule verdicts: adds `reasons`
    * (array of failed-rule tags, fixed order) and `keep` (reasons
    * empty). Rules, with their published thresholds:
    *  - word count ∈ [minWords, maxWords] ("too_few_words"/"too_many_words")
    *  - mean word length ∈ [3, 10] ("word_length")
    *  - ≥ 80% of words contain a letter ("alpha_words")
    *  - ≥ 2 stopwords ("stopwords")
    *  - ≤ 90% of lines start with a bullet ("bullets")
    *  - ≤ 30% of lines end with an ellipsis ("ellipsis")
    *  - symbol (# / "..." / …) to word ratio ≤ 0.1 ("symbol_ratio")
    *  - most frequent bigram ≤ 20% of bigram occurrences ("top_bigram")
    *
    * Every threshold compares INTEGERS (e.g. mean-word-length ∈ [3,10]
    * is `3·n ≤ Σlen ≤ 10·n`), so a SQL oracle restates the decisions
    * with zero float drift. The word list and bigram stats are bound in
    * their own projection (lambda-CSE discipline — tokenization runs
    * once per row); everything is narrow, no shuffle, scan speed. */
  def gopherFilter(df: org.apache.spark.sql.DataFrame, textCol: String,
                   minWords: Int = 50, maxWords: Int = 100000,
                   stopLang: String = "en"): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val staged = df
      .withColumn("_w", words(t))
      .withColumn("_bg", ngramStats(col("_w"), 2))
      .withColumn("_lines", filter(split(t, "\n"), l => trim(l) =!= ""))
    val n = size(col("_w"))
    val sumLen = aggregate(transform(col("_w"), w => length(w)),
      lit(0), (acc, x) => acc + x)
    val alphaW = size(filter(col("_w"), w => w.rlike("\\p{L}")))
    val stops = stopwords(stopLang).map(_.toLowerCase)
    val stopN = size(filter(col("_w"), w => w.isin(stops: _*)))
    val nLines = size(col("_lines"))
    val bulletL = size(filter(col("_lines"),
      l => trim(l).rlike("^[-*•]")))
    val ellipsisL = size(filter(col("_lines"),
      l => trim(l).rlike("(\\.\\.\\.|…)$")))
    // published rule counts '#' and the ELLIPSIS — both the one-char
    // U+2026 form and the ASCII "..." form (which dominates web text);
    // non-overlapping left-to-right "..." matching in both engines
    val symbols = (length(t) - length(replace(t, lit("#"), lit("")))) +
      regexp_count(t, lit("\\.\\.\\.|…"))
    val rules: Seq[(String, Column)] = Seq(
      "too_few_words" -> (n < minWords),
      "too_many_words" -> (n > maxWords),
      "word_length" -> (n > 0 && (sumLen < lit(3) * n || sumLen > lit(10) * n)),
      "alpha_words" -> (n > 0 && lit(5) * alphaW < lit(4) * n),
      "stopwords" -> (stopN < 2),
      "bullets" -> (nLines > 0 && lit(10) * bulletL > lit(9) * nLines),
      "ellipsis" -> (nLines > 0 && lit(10) * ellipsisL > lit(3) * nLines),
      "symbol_ratio" -> (n > 0 && lit(10) * symbols > n),
      "top_bigram" -> (col("_bg.total_ngrams") > 0 &&
        lit(5) * col("_bg.top_ngram_count") > col("_bg.total_ngrams")))
    val reasons = concat(rules.map { case (tag, cond) =>
      when(cond, array(lit(tag))).otherwise(array().cast("array<string>"))
    }: _*)
    staged
      .withColumn("word_count", n)
      .withColumn("reasons", reasons)
      .withColumn("keep", size(col("reasons")) === 0)
      .drop("_w", "_bg", "_lines")
  }

  /** C4 line-level cleanup (the published C4 cleaning heuristics —
    * Raffel et al. 2020 §2.2 — the line-rule complement to the
    * page-level [[c4Filter]]): keep only lines that, after trimming,
    *  - end in a terminal punctuation mark (`.` `!` `?` `"`),
    *  - contain at least `minLineWords` (published: 5) words, and
    *  - do not contain the word "javascript" (case-insensitive).
    * Returns the kept lines re-joined. Pure narrow Column — zero
    * shuffle, scan speed at any corpus size. NULL text stays NULL. */
  def c4CleanLines(text: Column, minLineWords: Int = 5,
                   sep: String = "\n"): Column = {
    val lines = split(text, java.util.regex.Pattern.quote(sep))
    array_join(filter(lines, l =>
      trim(l).rlike("[.!?\"]$") &&
        size(words(l)) >= minLineWords &&
        !lower(l).rlike("\\bjavascript\\b")), sep)
  }

  /** C4 page-level filter (Raffel et al. 2020 §2.2), as per-rule
    * verdicts in the [[gopherFilter]] shape: adds `clean_text` (the
    * [[c4CleanLines]] rewrite), `n_sentences`, `reasons` (failed-rule
    * tags, fixed order) and `keep`. Rules:
    *  - "lorem_ipsum": page contains "lorem ipsum" (case-insensitive)
    *  - "curly_brace": page contains `{` (code, not prose)
    *  - "bad_words": any word is in `badWords` (published: the public
    *    "List of Dirty, Naughty, Obscene..." blocklist; supply your
    *    own — the empty default disables the rule)
    *  - "too_few_sentences": the CLEANED page has fewer than
    *    `minSentences` (published: 3) sentences, counted as
    *    terminal-punctuation runs (`[.!?]+` — a "..." is one boundary)
    * Every rule is a deterministic string predicate, so a SQL oracle
    * restates the verdicts exactly. The word list is bound in its own
    * projection (lambda-CSE discipline); everything is narrow, no
    * shuffle, scan speed. */
  def c4Filter(df: org.apache.spark.sql.DataFrame, textCol: String,
               minSentences: Int = 3, minLineWords: Int = 5,
               badWords: Seq[String] = Nil,
               sep: String = "\n"): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val staged = df
      .withColumn("clean_text", c4CleanLines(t, minLineWords, sep))
      .withColumn("_w", words(t))
    val badRule =
      if (badWords.isEmpty) lit(false)
      else size(filter(col("_w"),
        w => w.isin(badWords.map(_.toLowerCase): _*))) > 0
    val rules: Seq[(String, Column)] = Seq(
      "lorem_ipsum" -> contains(lower(t), lit("lorem ipsum")),
      "curly_brace" -> contains(t, lit("{")),
      "bad_words" -> badRule,
      "too_few_sentences" -> (col("n_sentences") < minSentences))
    val reasons = concat(rules.map { case (tag, cond) =>
      when(cond, array(lit(tag))).otherwise(array().cast("array<string>"))
    }: _*)
    staged
      .withColumn("n_sentences",
        coalesce(regexp_count(col("clean_text"), lit("[.!?]+")), lit(0))
          .cast("long"))
      .withColumn("reasons", reasons)
      .withColumn("keep", size(col("reasons")) === 0)
      .drop("_w")
  }

  /** Per-document out-of-vocabulary signals against a Bloom-encoded
    * vocabulary ([[graft.sketch.BloomSketch]]): (idCol, n_words, n_oov,
    * oov_rate). A word reported OOV is DEFINITELY absent (Bloom has no
    * false negatives); false positives under-count OOV at the filter's
    * configured fpp — build the vocab at fpp ≤ 1e-8 when exactness
    * matters (the gate oracle does).
    *
    * Scale shape: ZERO joins, zero shuffle — the vocabulary rides the
    * plan as a blob literal (deserialized once per executor, not per
    * row) and membership is one filter() pass over the word array; this
    * is the per-doc twin of [[graft.checks.ReferentialBloomCheck]]'s
    * row screen. The words array is bound in its own projection
    * (lambda-CSE). */
  def oovSignals(df: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, vocabBlob: Array[Byte]): org.apache.spark.sql.DataFrame = {
    import graft.sketch.BloomFunctions
    graft.sketch.BloomSketch.deserialize(vocabBlob) // validate geometry early
    df.select(col(idCol), words(col(textCol)).as("_w"))
      .select(col(idCol), size(col("_w")).as("_n"),
        size(filter(col("_w"),
          w => !BloomFunctions.bloom_contains(lit(vocabBlob), w))).as("_o"))
      .select(col(idCol),
        col("_n").cast("long").as("n_words"),
        col("_o").cast("long").as("n_oov"),
        when(col("_n") > 0,
          Rounding.roundAt(col("_o").cast("double") / col("_n"), 6))
          .otherwise(lit(0.0)).as("oov_rate"))
  }
}
