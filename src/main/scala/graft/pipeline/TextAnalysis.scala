package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All pure Catalyst column expressions — codegen'd, no UDFs, scan-parallel
  * (no shuffle at all for the per-document measures).
  */
object TextAnalysis {

  /** Whitespace tokenization (the baseline used across the pipeline ops). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: words + punctuation clusters +
    * digit runs counted separately (regex-only, deterministic). */
  def subwordCount(text: Column): Column =
    size(split(trim(text), "(?=[^A-Za-z0-9])|\\s+"))

  /** Quality score in [0,1]:
    * 0.4·min(1, tokens/100) + 0.3·(distinct/total) + 0.3·min(1, avgLen/8).
    * Length, diversity and word-size signals — the shape of the
    * length/punct/stopword-ratio heuristics used in open-data pipelines. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val distinctRatio = size(array_distinct(toks)).cast("double") / n
    val avgLen = (length(regexp_replace(trim(text), "\\s+", "")).cast("double")) / n
    val raw = lit(0.4) * least(lit(1.0), n / 100.0) +
      lit(0.3) * distinctRatio +
      lit(0.3) * least(lit(1.0), avgLen / 8.0)
    // floor-based half-up rounding: identical across engines regardless of
    // their round() tie-break mode (the formula lands on exact .5
    // boundaries often since its terms are terminating decimals)
    floor(raw * 1e6 + 0.5) / 1e6
  }

  /** Language-marker stopword sets (tiny, deterministic n-gram heuristic).
    * Kept SQL-expressible so the duckdb oracle can replicate scoring. */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** Marker-count per language; argmax wins, 'und' (undetermined) if no
    * marker hits. Ties break by language-code order (deterministic). */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = Markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      (lang, ms.map(m => when(array_contains(toks, m), 1).otherwise(0))
        .reduce(_ + _))
    }
    // argmax via fold over (bestLang, bestScore)
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    } match {
      case (bestLang, bestScore) =>
        when(bestScore > 0, bestLang).otherwise(lit("und"))
    }
  }

  /** Document fingerprint: md5 of case/whitespace-normalized text.
    * (The SQL-oracle-comparable half of fingerprinting; see
    * Dedup.simhash for the rolling/bitwise variant.) */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Token-set key: md5 over the sorted distinct token list — a
    * normalization key for near-dup grouping that survives token
    * reordering and repetition. */
  def tokenSetKey(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(lower(text)))), " "))

  /** Non-distinct word bigrams ("w1 w2") of the lowercased text; empty
    * array for single-token docs.
    *
    * Shape note: `zip_with` over two slices, NOT `transform(sequence, i =>
    * element_at(toks, i)…)`. A lambda that captures `toks` re-evaluates the
    * whole tokenize subtree once per element (HOF bodies don't get
    * subexpression elimination), turning tokenization O(tokens²) per doc —
    * 4.9 s vs 0.8 s on the sf0.1 top-bigrams query. zip_with evaluates its
    * array arguments once per row. */
  def bigrams(text: Column): Column = {
    val toks = tokens(lower(text))
    val n = size(toks)
    when(n < 2, array().cast("array<string>"))
      .otherwise(zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
        (a, b) => concat_ws(" ", a, b)))
  }

  /** Deflate compression ratio (compressed/raw UTF-8 bytes) — the
    * model-free repetition proxy: looping or templated text compresses
    * far below prose. Codegen'd native expression, zero shuffle;
    * composes with [[gopherFilter]] as an extra gate column. */
  def compressionRatio(text: Column): Column =
    org.apache.spark.sql.graft.sketch.compression_ratio(text)

  /** Top-k token pairs by document-level pointwise mutual information:
    * `pmi(a,b) = ln(n_ab·N / (n_a·n_b))` over DOCUMENT frequencies
    * (each token/pair counted once per doc — the collocation measure of
    * Church & Hanks 1990), restricted to pairs co-occurring in at least
    * `minPairCount` docs (PMI is noise at tiny counts: a pair seen once
    * between two hapaxes scores ln N). Returns (`tok_a` < `tok_b`,
    * `n_ab`, `pmi` 6dp), pmi desc with (tok_a, tok_b) tiebreak.
    *
    * Plan shape: per-doc sorted-distinct token arrays stay map-side; the
    * O(len²) per-doc pair generation explodes into a compact
    * (tok_a, tok_b) count aggregate (two-phase — partials collapse
    * before the shuffle, which carries token pairs and counts, never
    * text); the min-count filter prunes BEFORE the two unigram joins;
    * the doc total N rides a 1-row broadcast. Everything downstream of
    * the explode is vocabulary-sized, not corpus-sized. Per-doc pair
    * fanout is quadratic in the doc's DISTINCT token count — chunk or
    * truncate pathological documents upstream (Gopher gates already
    * bound doc length in this pipeline). */
  def topPmi(df: DataFrame, textCol: String, minPairCount: Long,
      k: Int): DataFrame = {
    require(minPairCount >= 1, "minPairCount must be >= 1")
    require(k > 0, "k must be positive")
    // Scans.spread before the tokenize/pair kernels (no-op at scale):
    // three consumers (doc count, unigram counts, pair explode) all
    // re-derive from __ts — a single-split scan would run each serially
    val toks = Scans.spread(
        df.select(col(textCol).alias("__pt")), col("__pt"))
      .select(
        array_sort(array_distinct(tokens(lower(col("__pt")))))
          .alias("__ts"))
    val nDocs = toks.agg(count(lit(1)).alias("__n"))
    // outer explode + null-filter on both postings passes: the
    // non-outer form's inferred guard re-tokenizes at the scan
    val uni = toks.select(explode_outer(col("__ts")).alias("t"))
      .filter(col("t").isNotNull)
      .groupBy("t").agg(count(lit(1)).alias("n"))
    val pairs = toks.select(explode_outer(flatten(transform(col("__ts"),
        (x, i) => transform(
          slice(col("__ts"), i + lit(2), size(col("__ts"))),
          y => struct(x.alias("a"), y.alias("b")))))).alias("p"))
      .filter(col("p").isNotNull)
      .groupBy(col("p.a").alias("tok_a"), col("p.b").alias("tok_b"))
      .agg(count(lit(1)).alias("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(uni.withColumnRenamed("t", "tok_a")
        .withColumnRenamed("n", "__na"), "tok_a")
      .join(uni.withColumnRenamed("t", "tok_b")
        .withColumnRenamed("n", "__nb"), "tok_b")
      .crossJoin(broadcast(nDocs))
      .select(col("tok_a"), col("tok_b"), col("n_ab"),
        Rounding.halfUp(
          log(col("n_ab").cast("double") * col("__n") /
            (col("__na").cast("double") * col("__nb"))), 6).alias("pmi"))
      .orderBy(col("pmi").desc, col("tok_a"), col("tok_b"))
      .limit(k)
  }

  /** Fraction of word occurrences that repeat an earlier word — the
    * word-level duplicate-content signal from Gopher-style quality rules.
    * Pure array expression: zero shuffle, scan-parallel. */
  def duplicateWordFraction(text: Column): Column = {
    val toks = tokens(lower(text))
    Rounding.halfUp(
      lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks), 6)
  }

  /** Fraction of all bigram occurrences taken by the single most frequent
    * bigram (Gopher "top n-gram fraction"). Computed as an array fold per
    * document — O(distinct·total) per row, fine for document-sized text;
    * for book-length inputs prefer an explode+count aggregation. */
  def topBigramFraction(text: Column): Column = {
    val bg = bigrams(text)
    val top = array_max(transform(array_distinct(bg),
      b => size(filter(bg, x => x === b))))
    when(size(bg) === 0, lit(0.0))
      .otherwise(Rounding.halfUp(top.cast("double") / size(bg), 6))
  }

  /** Fraction of tokens that are (English-marker) stopwords — a zero-hit
    * doc is likely non-linguistic content. */
  def stopwordFraction(text: Column): Column = {
    val toks = tokens(lower(text))
    val stops = array(Markers("en").map(lit): _*)
    Rounding.halfUp(
      size(filter(toks, t => array_contains(stops, t))).cast("double") /
        size(toks), 6)
  }

  /** Line-level repetition/boilerplate signals (Gopher §A1.1): one
    * struct column (n_lines, dup_line_frac, dup_line_char_frac,
    * bullet_line_frac, ellipsis_line_frac) from a single codegen'd pass
    * over the doc's non-empty trimmed lines — the
    * explode-lines/groupBy(doc,line) formulation shuffles the corpus at
    * line granularity twice; this never shuffles at all. */
  def lineRepStats(text: Column): Column =
    org.apache.spark.sql.graft.sketch.line_rep_stats(text)

  /** Shannon entropy (bits) of the character distribution — the
    * low-entropy tail flags degenerate repetition and single-token spam,
    * the high tail flags binary/base64 payloads masquerading as text.
    * One codegen'd pass per row, zero shuffle. */
  def charEntropy(text: Column): Column =
    Rounding.halfUp(org.apache.spark.sql.graft.sketch.char_entropy(text), 6)

  /** The Gopher document-quality rule set (Rae et al. 2021, Table A1)
    * as one struct column — per-rule evidence plus the conjunction:
    *   1. 50 ≤ word count ≤ 100 000
    *   2. mean word length in [3, 10] characters
    *   3. symbol-to-word ratio ('#' or '...' hits per word) ≤ 0.1
    *   4. ≤ 90% of lines start with a bullet
    *   5. ≤ 30% of lines end with an ellipsis
    *   6. ≥ 80% of words contain at least one alphabetic character
    *   7. ≥ 2 distinct required stop words present
    *      (the/be/to/of/and/that/have/with)
    * All fractions are half-up-rounded to 6 digits BEFORE comparison, so
    * the verdict is engine-portable (no boundary-ulp flips vs the
    * oracle). Pure per-row column expressions over the certified
    * primitives — zero shuffle; `passes` gates the filter. */
  def gopherReport(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val nd = n.cast("double")
    val mwl = Rounding.halfUp(
      length(regexp_replace(trim(text), "\\s+", "")).cast("double") / nd, 6)
    val symbols =
      (length(text) - length(regexp_replace(text, "#", ""))) +
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val symRatio = Rounding.halfUp(symbols.cast("double") / nd, 6)
    val ls = lineRepStats(text)
    val bulletFrac = Rounding.halfUp(ls.getField("bullet_line_frac"), 6)
    val ellipsisFrac = Rounding.halfUp(ls.getField("ellipsis_line_frac"), 6)
    val alphaFrac = Rounding.halfUp(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nd, 6)
    val stops = array(Seq("the", "be", "to", "of", "and", "that", "have",
      "with").map(lit): _*)
    val nStops = size(array_intersect(tokens(lower(text)), stops))
    val passes = n.geq(50) && n.leq(100000) &&
      mwl.geq(3.0) && mwl.leq(10.0) &&
      symRatio.leq(0.1) &&
      bulletFrac.leq(0.9) &&
      ellipsisFrac.leq(0.3) &&
      alphaFrac.geq(0.8) &&
      nStops.geq(2)
    struct(
      n.cast("long").as("n_words"),
      mwl.as("mean_word_len"),
      symRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"),
      alphaFrac.as("alpha_word_frac"),
      nStops.cast("long").as("n_req_stops"),
      passes.as("passes"))
  }

  /** Rows passing every Gopher rule — the composed quality gate. */
  def gopherFilter(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.filter(gopherReport(col(textCol)).getField("passes"))

  /** Mean characters per word. */
  def meanWordLength(text: Column): Column =
    Rounding.halfUp(
      length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
        size(tokens(text)), 6)

  /** Split documents into fixed-size token chunks with overlap — the
    * window shape embedding models consume (pair with
    * [[Embeddings.meanPool]] for chunk→doc pooling). Output: input id +
    * (`chunk_id` 0-based, `chunk_text`, `n_chunk_tokens`); empty docs
    * yield one empty chunk.
    *
    * Shape: the token array materializes ONCE per input row in the
    * Generate child (generators evaluate their input row once and copy
    * it per emitted element); chunk indices explode from a cheap int
    * sequence and each output row slices the carried array — linear in
    * emitted tokens, not chunks × tokenize (the HOF-capture trap this
    * codebase documents). Narrow plan: no shuffle. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need chunkTokens > 0 and 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = tokens(col(textCol))
    val n = size(col("__tk"))
    // ceil((n - overlap) / stride), min 1: the last chunk may be short
    val nChunks = greatest(lit(1L),
      ceil((n - lit(overlap)).cast("double") / stride).cast("long"))
    df.select(col(idCol), toks.as("__tk"))
      .select(col(idCol), col("__tk"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("__tk"),
          col("chunk_id").cast("int") * stride + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(lit(chunkTokens).cast("long"),
          n - col("chunk_id") * stride).as("n_chunk_tokens"))
  }

  // ---- Text normalization ----

  /** Explicit negated class, not `\S+`: Java counts \x0B (vertical tab)
    * as whitespace, RE2 does not, so `\S` would strip different spans in
    * the two engines. [^\s\x0B] is identical in both (Java's \s already
    * contains \x0B; RE2 gains it from the explicit term). */
  val UrlRe = "https?://[^\\s\\x0B]+"
  /** C0 controls except \t \n, plus DEL — RE2-portable explicit class. */
  val ControlRe = "[\\x00-\\x08\\x0B-\\x1F\\x7F]"

  /** Canonical cleanup before any hashing/dedup pass: Unicode NFC (native
    * codegen'd expression — Spark has no built-in; DuckDB's nfc_normalize
    * replays it), URL removal, control-character removal, whitespace
    * collapse, trim. Composed vs decomposed accents hash identically
    * after this — skipping it silently halves near-dup recall on
    * mixed-source corpora. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          org.apache.spark.sql.graft.sketch.nfc(text),
          UrlRe, ""),
        ControlRe, ""),
      "\\s+", " "))

  // ---- PII scrubbing ----
  // RE2-compatible patterns (no lookaround, no backreferences) so SQL
  // oracles and other engines can replicate matches exactly.

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"

  /** Replace emails, IPv4 addresses and +CC-XXX-XXX-XXXX phone numbers
    * with typed placeholder tokens. Email runs first: its character class
    * includes dots and digits, so scrubbing it cannot create new IP/phone
    * matches, while the reverse order could split an address. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-document PII match counts (email, ipv4, phone). */
  def piiCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_email", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("n_ip", regexp_count(col(textCol), lit(Ipv4Re)))
      .withColumn("n_phone", regexp_count(col(textCol), lit(PhoneRe)))

  /** Unicode-script composition of a document: fractions of non-space
    * characters that are Latin letters, digits, CJK ideographs,
    * Cyrillic, and everything else — the cheap multilingual-corpus
    * router (script disagreement with the claimed language, mixed-script
    * spam, binary-in-text payloads) that runs BEFORE any model-based
    * language ID. Struct of five fractions (half-up 6; all 0 for
    * whitespace-only text). Pure regexp-count column expressions —
    * codegen'd, zero shuffle, and replayable in any engine with RE2
    * character-class counts. */
  def scriptProfile(text: Column): Column = {
    val s = regexp_replace(text, "\\s+", "")
    val n = length(s).cast("double")
    def frac(cls: String): Column = {
      val cnt = (length(s) - length(regexp_replace(s, cls, ""))).cast("double")
      when(n > 0, Rounding.halfUp(cnt / n, 6)).otherwise(lit(0.0))
    }
    val latin = frac("[A-Za-z]")
    val digit = frac("[0-9]")
    val cjk = frac("[\\x{4e00}-\\x{9fff}]")
    val cyr = frac("[\\x{0400}-\\x{04ff}]")
    struct(
      latin.alias("latin_frac"),
      digit.alias("digit_frac"),
      cjk.alias("cjk_frac"),
      cyr.alias("cyrillic_frac"),
      when(n > 0, Rounding.halfUp(
        lit(1.0) - (latin + digit + cjk + cyr), 6)).otherwise(lit(0.0))
        .alias("other_frac"))
  }

  /** Zipf-law fit of the corpus term-frequency distribution: OLS slope
    * of ln(freq) on ln(rank) over the full vocabulary — natural prose
    * sits near −1; a flat slope flags templated/generated text, a cliff
    * flags boilerplate domination. One row: (`n_terms`, `slope`, `r2`),
    * half-up 6 (r2 null for degenerate single-term vocabularies).
    *
    * The frequency table is ONE explode + hash aggregate
    * (vocabulary-bounded, map-side combine); the rank comes from
    * [[Ranks.withGlobalRank]] over (freq desc, term) — the vocabulary
    * is corpus-scale-bounded but NOT small, so no single-partition
    * window; the fit itself is one moment aggregate. */
  def zipfFit(df: DataFrame, textCol: String): DataFrame = {
    // (A Scans.spread here was measured in r16 and REVERTED: the vocab
    // subtree feeds the two-pass global rank TWICE, and the added text
    // exchange + 32-task scheduling doubled the 0.41 s query instead of
    // helping the ~150 ms serial tokenize.)
    val vocab = df.select(explode_outer(tokens(lower(col(textCol)))).as("t"))
      .filter(col("t").isNotNull)
      .groupBy(col("t")).agg(count(lit(1)).as("f"))
    val ranked = Ranks.withGlobalRank(vocab, "rank",
      col("f").desc, col("t").asc)
    val x = log(col("rank").cast("double"))
    val y = log(col("f").cast("double"))
    val m = ranked.agg(count(lit(1)).as("n_terms"),
      covar_pop(x, y).as("__cov"), var_pop(x).as("__vx"),
      var_pop(y).as("__vy"))
    m.select(col("n_terms"),
      Rounding.halfUp(when(col("__vx") > 0, col("__cov") / col("__vx")), 6)
        .as("slope"),
      Rounding.halfUp(when(col("__vx") > 0 && col("__vy") > 0,
        col("__cov") * col("__cov") / (col("__vx") * col("__vy"))), 6)
        .as("r2"))
  }

  /** Vocabulary coverage curve: for each candidate vocabulary size k,
    * the fraction of ALL token occurrences covered by the k most
    * frequent terms — the empirical input to tokenizer vocab sizing
    * ("32k covers 99.2%, 8k covers 96%: the last 24k buy 3 points").
    * Output per k: (`vocab_k`, `covered_share`, half-up 6). One vocab
    * aggregate + the distributed rank + ONE conditional-sum pass over
    * the vocabulary — never a second corpus scan. */
  def vocabCoverage(df: DataFrame, textCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), "ks must be positive")
    // no spread, same measured reasoning as zipfFit (r16)
    val vocab = df.select(explode_outer(tokens(lower(col(textCol)))).as("t"))
      .filter(col("t").isNotNull)
      .groupBy(col("t")).agg(count(lit(1)).as("f"))
    val ranked = Ranks.withGlobalRank(vocab, "rank",
      col("f").desc, col("t").asc)
    val aggCols = sum(col("f")).as("__tot") +:
      ks.map(k => sum(when(col("rank") <= k, col("f"))).as(s"__c$k"))
    val row = ranked.agg(aggCols.head, aggCols.tail: _*)
    row.select(explode(array(ks.map(k => struct(
        lit(k).as("vocab_k"),
        Rounding.halfUp(
          coalesce(col(s"__c$k"), lit(0L)).cast("double") / col("__tot"), 6)
          .as("covered_share"))): _*)).as("__r"))
      .select(col("__r.vocab_k"), col("__r.covered_share"))
  }

  /** Convenience: annotate a document DataFrame with all measures. */
  def annotate(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("fp", fingerprint(col(textCol)))
}
