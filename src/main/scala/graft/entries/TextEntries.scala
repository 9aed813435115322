package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import EntryHelpers._

/** Text analysis, LM scoring and retrieval contract queries + their DuckDB oracles, kept ADJACENT per
  * family (split from the former 5k-line SparkEntry maps — round-9
  * verdict #7: a mis-paired oracle edit was a 5k-line scroll).
  * [[SparkEntry]] aggregates every family and asserts name uniqueness. */
private[graft] object TextEntries {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // compression-ratio gate: the deflate repetition proxy must rank a
    // degenerate (looping) rewrite of each doc below the natural text —
    // distribution-level contract, booleans pinned by the oracle
    // (DuckDB cannot deflate; the per-value check lives in QualitySpec)
    "q_compress_gate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val nat = pipeline.TextAnalysis.compressionRatio(col("text"))
      val rep = pipeline.TextAnalysis.compressionRatio(
        concat_ws(" ", array_repeat(substring(col("text"), 1, 12), 40)))
      val r = d.select(nat.alias("rn"), rep.alias("rr"))
        .agg(avg(col("rn")).alias("mn"),
          avg(when(col("rr") < col("rn"), 1.0).otherwise(0.0)).alias("frac"))
        .head()
      import s.implicits._
      Seq(("mean_in_band", r.getDouble(0) > 0.2 && r.getDouble(0) < 1.2),
        ("repetitive_compresses_more", r.getDouble(1) >= 0.95))
        .toDF("check", "ok").orderBy("check")
    }),
    // top token collocations by document-level PMI: per-doc distinct
    // pair explode → compact pair-count aggregate → min-count prune
    // BEFORE the unigram joins; N on a 1-row broadcast
    "q_pmi" -> ((s, dir) =>
      pipeline.TextAnalysis.topPmi(t(s, dir, "documents"), "text",
        minPairCount = 5L, k = 20)),
    // text analysis: token count, quality score, language id, fingerprint
    "q_text_stats" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        pipeline.TextAnalysis.tokenCount(col("text")).alias("n_tokens"),
        pipeline.TextAnalysis.qualityScore(col("text")).alias("quality"),
        pipeline.TextAnalysis.langId(col("text")).alias("lang_pred"),
        pipeline.TextAnalysis.fingerprint(col("text")).alias("fp"))
        .orderBy("doc_id")),
    // Gopher line-level repetition/boilerplate signals over planted
    // multi-line text (the synthetic corpus is single-line): one
    // codegen'd struct pass, zero shuffle
    "q_line_stats" -> ((s, dir) => {
      val aug = t(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n",
          col("text"),
          substring(col("text"), 1, 40),
          when(col("doc_id") % 3 === 0, substring(col("text"), 1, 40))
            .otherwise(concat(lit("unique tail "), col("doc_id").cast("string"))),
          lit("- bullet item"),
          when(col("doc_id") % 4 === 0, lit("to be continued..."))
            .otherwise(concat(lit("closing line "), col("doc_id").cast("string"))))
          .alias("txt"))
      aug.select(col("doc_id"),
        pipeline.TextAnalysis.lineRepStats(col("txt")).alias("ls"))
        .select(col("doc_id"),
          col("ls.n_lines").cast("long").alias("n_lines"),
          pipeline.Rounding.halfUp(col("ls.dup_line_frac"), 6)
            .alias("dup_line_frac"),
          pipeline.Rounding.halfUp(col("ls.dup_line_char_frac"), 6)
            .alias("dup_line_char_frac"),
          pipeline.Rounding.halfUp(col("ls.bullet_line_frac"), 6)
            .alias("bullet_line_frac"),
          pipeline.Rounding.halfUp(col("ls.ellipsis_line_frac"), 6)
            .alias("ellipsis_line_frac"))
        .orderBy("doc_id")
    }),
    // Gopher-style repetition/quality signals (pure array expressions,
    // zero shuffle)
    "q_quality_rep" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        pipeline.TextAnalysis.duplicateWordFraction(col("text")).alias("dup_word_frac"),
        pipeline.TextAnalysis.topBigramFraction(col("text")).alias("top_bigram_frac"),
        pipeline.TextAnalysis.stopwordFraction(col("text")).alias("stopword_frac"),
        pipeline.TextAnalysis.meanWordLength(col("text")).alias("mean_word_len"))
        .orderBy("doc_id")),
    // document chunking: 20-token windows, 5-token overlap (the window
    // shape embedding models consume); narrow plan, token array
    // materialized once per doc
    "q_chunks" -> ((s, dir) =>
      pipeline.TextAnalysis.chunkDocs(t(s, dir, "documents"), "doc_id",
        "text", chunkTokens = 20, overlap = 5)
        .orderBy("doc_id", "chunk_id")),
    // text normalization over planted mess: decomposed accents (NFC via
    // the native graft_nfc expression), a URL, a control char — the
    // canonical pre-dedup cleanup, fingerprint-compared
    "q_norm" -> ((s, dir) => {
      val aug = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"),
            lit(" cafe\u0301 see https://ex.ample/x?q=1\u0007 fin")))
          .otherwise(col("text")).alias("txt"))
      aug.select(col("doc_id"),
        md5(pipeline.TextAnalysis.normalizeText(col("txt"))).alias("norm_fp"),
        length(pipeline.TextAnalysis.normalizeText(col("txt")))
          .cast("long").alias("n_chars_norm"))
        .orderBy("doc_id")
    }),
    // PII scrubbing over deterministically injected PII (the synthetic
    // corpus carries none): counts + fingerprint of the scrubbed text
    "q_pii_scrub" -> ((s, dir) => {
      val aug = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact doc"), col("doc_id").cast("string"),
          lit("@example.com from 10.1."), (col("doc_id") % 250).cast("string"),
          lit(".7 or call +1-555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).alias("txt"))
      pipeline.TextAnalysis.piiCounts(aug, "txt")
        .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_phone"),
          md5(pipeline.TextAnalysis.scrubPii(col("txt"))).alias("scrub_fp"))
        .orderBy("doc_id")
    }),
    // corpus-level vocabulary: top-20 bigrams by frequency (map-side
    // partial agg + TakeOrdered; deterministic (cnt desc, ngram) tiebreak)
    // spread (no-op at scale) + outer-explode per the
    // InferFiltersFromGenerate discipline: the non-outer explode's
    // inferred size guard re-ran the bigram kernel at the single-split
    // scan (r16)
    "q_top_ngrams" -> ((s, dir) =>
      pipeline.Scans.spread(
          t(s, dir, "documents").select(col("text")), col("text"))
        .select(explode_outer(pipeline.TextAnalysis.bigrams(col("text")))
          .alias("ngram"))
        .filter(col("ngram").isNotNull)
        .groupBy("ngram").agg(count(lit(1)).alias("cnt"))
        .orderBy(col("cnt").desc, col("ngram").asc)
        .limit(20)),
    // BM25 relevance search: corpus stats (N, avgdl, df) from one
    // broadcast 1-row aggregate, per-term tf map-side, top-k TakeOrdered
    "q_bm25" -> ((s, dir) =>
      pipeline.Search.bm25TopK(t(s, dir, "documents"), "text", "doc_id",
        Seq("spark", "hash", "merge"), k = 50)),
    // rank-biased overlap of the lexical vs quality-prior top-50 lists
    // at depth 20: how similar are the two retrievers' heads
    "q_rbo" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val wB = Window.orderBy(col("score").desc, col("doc_id").asc)
      val bm = pipeline.Search.bm25TopK(docs, "text", "doc_id",
        Seq("spark", "hash", "merge"), k = 50)
        .withColumn("rn", row_number().over(wB))
      val wQ = Window.orderBy(col("lm_score").desc, col("doc_id").asc)
      val qual = pipeline.LangModel.scoreDocs(docs, "text", "doc_id")
        .orderBy(col("lm_score").desc, col("doc_id").asc).limit(50)
        .withColumn("rn", row_number().over(wQ))
      pipeline.Search.rankBiasedOverlap(bm, qual, "doc_id", p = 0.9, k = 20)
    }),
    // persisted inverted index lifecycle: build the bucket-partitioned
    // postings store, then serve the q_bm25 query from it — results
    // must be BIT-IDENTICAL to scoring raw text (same oracle)
    "q_search_idx" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = java.nio.file.Files
        .createTempDirectory("graft_tidx").toString
      pipeline.Search.buildTextIndex(docs, "text", "doc_id", path,
        buckets = 16)
      pipeline.Search.probeTextIndex(s, path,
        Seq("spark", "hash", "merge"), k = 50)
    }),
    // hybrid ranking: RRF-fuse the BM25 top-50 with the quality-prior
    // (lm_score) top-50 — rank-only combination of incomparable scores;
    // everything after retrieval runs on bounded top-k lists
    "q_rrf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val wB = Window.orderBy(col("score").desc, col("doc_id").asc)
      val bm = pipeline.Search.bm25TopK(docs, "text", "doc_id",
        Seq("spark", "hash", "merge"), k = 50)
        .withColumn("rn", row_number().over(wB))
      val wQ = Window.orderBy(col("lm_score").desc, col("doc_id").asc)
      val qual = pipeline.LangModel.scoreDocs(docs, "text", "doc_id")
        .orderBy(col("lm_score").desc, col("doc_id").asc).limit(50)
        .withColumn("rn", row_number().over(wQ))
      pipeline.Search.rrfFuse(Seq(bm, qual), "doc_id", c = 60, k = 20)
    }),
    // per-document top-3 tf-idf keywords, ranked on the ROUNDED weight
    // with term tie-break (engine-portable rank)
    "q_keywords" -> ((s, dir) =>
      pipeline.Search.topTfidfTerms(t(s, dir, "documents"), "text",
        "doc_id", k = 3)
        .orderBy("doc_id", "rk")),
    // Zipf fit of the term-frequency distribution: corpus-health check
    // (natural prose slope near -1); rank via the distributed rank
    "q_zipf" -> ((s, dir) =>
      pipeline.TextAnalysis.zipfFit(t(s, dir, "documents"), "text")),
    // vocabulary coverage curve: token share covered by the top-k
    // terms at candidate vocab sizes (tokenizer sizing input)
    "q_vocab_cov" -> ((s, dir) =>
      pipeline.TextAnalysis.vocabCoverage(t(s, dir, "documents"), "text",
        Seq(100, 1000, 8000))
        .orderBy("vocab_k")),
    // unicode-script composition per doc: the multilingual router —
    // pure regexp-count expressions, zero shuffle
    "q_script" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        pipeline.TextAnalysis.scriptProfile(col("text")).alias("sp"))
        .select(col("doc_id"),
          col("sp.latin_frac").alias("latin_frac"),
          col("sp.digit_frac").alias("digit_frac"),
          col("sp.cjk_frac").alias("cjk_frac"),
          col("sp.cyrillic_frac").alias("cyrillic_frac"),
          col("sp.other_frac").alias("other_frac"))
        .orderBy("doc_id")),
    // trigram stupid-backoff scoring against the %7!=0 reference split:
    // held-out docs exercise the real backoff path
    "q_trigram" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      pipeline.LangModel.scoreDocsBackoff(docs,
        docs.filter(col("doc_id") % 7 =!= 0), "text", "doc_id")
        .orderBy("doc_id")
    }),
    // corpus bigram-LM quality scoring (CCNet-shape): add-α-smoothed mean
    // bigram log-probability per document
    "q_lm_score" -> ((s, dir) =>
      pipeline.LangModel.scoreDocs(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),
    // CCNet head/middle/tail: equal-count perplexity tertiles per
    // language (ntile over the bounded per-lang rank)
    "q_ppl_buckets" -> ((s, dir) =>
      pipeline.LangModel.perplexityBuckets(t(s, dir, "documents"), "text",
        "doc_id", "lang", buckets = 3)
        .orderBy("doc_id")),
    // corpus-trained BPE (Sennrich 2016): merges learned from the
    // word-frequency table (driver state bounded like a model fit),
    // applied by a codegen'd expression. Certified by the lossless-
    // partition invariant — joining a doc's subwords reproduces its
    // lowercased whitespace-stripped text — plus token-count bounds
    // tokenizer fertility per language under the corpus-trained BPE:
    // the bounds gate replays in SQL (the mean itself is spec-certified
    // — the merge table is not SQL-expressible)
    "q_fertility" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = pipeline.Bpe.learn(docs, "text", numMerges = 200)
      pipeline.Bpe.fertilityByGroup(docs, "text", "lang", model)
        .select(col("lang"), col("n_docs"), col("fertility_ok"))
        .orderBy("lang")
    }),
    // (n_words ≤ n_subwords ≤ n_nonspace_chars)
    "q_bpe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = pipeline.Bpe.learn(docs, "text", numMerges = 200)
      val nSub = pipeline.Bpe.tokenCount(col("text"), model)
      val nonspace = length(regexp_replace(lower(trim(col("text"))), "\\s+", ""))
      val nWords = size(pipeline.TextAnalysis.tokens(lower(col("text"))))
      docs.select(col("doc_id"),
        concat_ws("", pipeline.Bpe.segment(col("text"), model)).alias("joined"),
        (nSub.leq(nonspace) && nSub.geq(nWords)).cast("int")
          .alias("within_bounds"))
        .orderBy("doc_id")
    }),
    // the composed Gopher quality gate (Rae 2021 Table A1): per-rule
    // evidence + verdict, pure per-row expressions, zero shuffle
    "q_gopher" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        pipeline.TextAnalysis.gopherReport(col("text")).alias("g"))
        .select(col("doc_id"),
          col("g.n_words").alias("n_words"),
          col("g.mean_word_len").alias("mean_word_len"),
          col("g.symbol_ratio").alias("symbol_ratio"),
          col("g.bullet_frac").alias("bullet_frac"),
          col("g.ellipsis_frac").alias("ellipsis_frac"),
          col("g.alpha_word_frac").alias("alpha_word_frac"),
          col("g.n_req_stops").alias("n_req_stops"),
          col("g.passes").cast("int").alias("passes"))
        .orderBy("doc_id")),
    // character-distribution entropy (bits): degenerate-repetition /
    // binary-payload quality signal, one codegen'd pass, zero shuffle
    "q_char_entropy" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        pipeline.TextAnalysis.charEntropy(col("text")).alias("char_entropy"))
        .orderBy("doc_id")),
  )

  val oracles: Seq[(String, String)] = Seq(
    "q_compress_gate" ->
      """SELECT c AS "check", CAST(true AS BOOLEAN) AS ok
         FROM (SELECT unnest(['mean_in_band',
                              'repetitive_compresses_more']) AS c)
         ORDER BY "check"""",
    "q_pmi" ->
      """WITH d AS (SELECT doc_id,
             list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS ts
           FROM documents),
         u AS (SELECT doc_id, unnest(ts) AS t FROM d),
         uf AS (SELECT t, count(*) AS n FROM u GROUP BY t),
         pf AS (SELECT a.t AS tok_a, b.t AS tok_b, count(*) AS nab
                FROM u a JOIN u b ON a.doc_id = b.doc_id AND a.t < b.t
                GROUP BY 1, 2 HAVING count(*) >= 5),
         nn AS (SELECT count(*)::DOUBLE AS nd FROM d)
         SELECT pf.tok_a, pf.tok_b, pf.nab::BIGINT AS n_ab,
           floor(ln(pf.nab::DOUBLE * nn.nd /
                    (ua.n::DOUBLE * ub.n::DOUBLE)) * 1e6 + 0.5) / 1e6 AS pmi
         FROM pf
         JOIN uf ua ON ua.t = pf.tok_a
         JOIN uf ub ON ub.t = pf.tok_b
         CROSS JOIN nn
         ORDER BY pmi DESC, tok_a, tok_b LIMIT 20""",
    "q_text_stats" ->
      """WITH b AS (
           SELECT doc_id, trim(text) AS tx,
             string_split_regex(trim(text), '\s+') AS toks,
             string_split_regex(trim(lower(text)), '\s+') AS ltoks
           FROM documents),
         m AS (
           SELECT doc_id, tx, toks,
             len(toks)::DOUBLE AS n,
             len(list_distinct(toks))::DOUBLE AS nd,
             length(regexp_replace(tx, '\s+', '', 'g'))::DOUBLE AS nc,
             (CASE WHEN list_contains(ltoks,'der') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'die') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'und') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'das') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'ist') THEN 1 ELSE 0 END) AS s_de,
             (CASE WHEN list_contains(ltoks,'the') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'a') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'of') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'and') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'is') THEN 1 ELSE 0 END) AS s_en,
             (CASE WHEN list_contains(ltoks,'el') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'la') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'de') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'los') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'que') THEN 1 ELSE 0 END) AS s_es,
             (CASE WHEN list_contains(ltoks,'le') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'la') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'et') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'les') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(ltoks,'des') THEN 1 ELSE 0 END) AS s_fr
           FROM b)
         SELECT doc_id, n::BIGINT AS n_tokens,
           floor((0.4 * least(1.0, n/100.0) + 0.3 * (nd/n)
                 + 0.3 * least(1.0, (nc/n)/8.0)) * 1e6 + 0.5) / 1e6 AS quality,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred,
           md5(regexp_replace(lower(tx), '\s+', ' ', 'g')) AS fp
         FROM m ORDER BY doc_id""",
    "q_line_stats" ->
      """WITH aug AS (SELECT doc_id,
             text || chr(10) || substr(text, 1, 40) || chr(10) ||
             CASE WHEN doc_id % 3 = 0 THEN substr(text, 1, 40)
                  ELSE 'unique tail ' || doc_id END || chr(10) ||
             '- bullet item' || chr(10) ||
             CASE WHEN doc_id % 4 = 0 THEN 'to be continued...'
                  ELSE 'closing line ' || doc_id END AS txt
           FROM documents),
         l AS (SELECT doc_id,
             list_filter(list_transform(string_split(txt, chr(10)),
               x -> trim(x)), x -> x <> '') AS ls
           FROM aug),
         c AS (SELECT doc_id, len(ls) AS n,
             list_sum(list_transform(ls, x -> length(x))) AS tot,
             len(ls) - len(list_distinct(ls)) AS dl,
             list_sum(list_transform(list_distinct(ls),
               d -> (len(list_filter(ls, y -> y = d)) - 1) * length(d))) AS dc,
             len(list_filter(ls,
               x -> substr(x, 1, 1) IN ('-', '*', '•'))) AS bl,
             len(list_filter(ls,
               x -> (length(x) >= 3 AND substr(x, length(x) - 2) = '...')
                 OR substr(x, length(x)) = '…')) AS el
           FROM l)
         SELECT doc_id, n::BIGINT AS n_lines,
           floor(dl::DOUBLE / n * 1e6 + 0.5) / 1e6 AS dup_line_frac,
           floor(dc::DOUBLE / tot * 1e6 + 0.5) / 1e6 AS dup_line_char_frac,
           floor(bl::DOUBLE / n * 1e6 + 0.5) / 1e6 AS bullet_line_frac,
           floor(el::DOUBLE / n * 1e6 + 0.5) / 1e6 AS ellipsis_line_frac
         FROM c ORDER BY doc_id""",
    "q_quality_rep" ->
      """WITH d AS (SELECT doc_id, text,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         b AS (SELECT doc_id, text, tk,
             CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                  ELSE list_transform(generate_series(1, len(tk)-1),
                         i -> tk[i] || ' ' || tk[i+1]) END AS bg
           FROM d)
         SELECT doc_id,
           floor((1 - len(list_distinct(tk))::DOUBLE/len(tk)) * 1e6 + 0.5)/1e6
             AS dup_word_frac,
           CASE WHEN len(bg) = 0 THEN 0.0
                ELSE floor((list_max(list_transform(list_distinct(bg),
                       x -> len(list_filter(bg, y -> y = x))))::DOUBLE
                     / len(bg)) * 1e6 + 0.5)/1e6 END AS top_bigram_frac,
           floor((len(list_filter(tk,
               t -> list_contains(['the','a','of','and','is'], t)))::DOUBLE
             / len(tk)) * 1e6 + 0.5)/1e6 AS stopword_frac,
           floor((length(regexp_replace(trim(text), '\s+', '', 'g'))::DOUBLE
             / len(tk)) * 1e6 + 0.5)/1e6 AS mean_word_len
         FROM b ORDER BY doc_id""",
    "q_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS tk
           FROM documents),
         c AS (SELECT doc_id, tk, len(tk)::BIGINT AS n,
             greatest(1, ceil((len(tk) - 5) / 15.0))::BIGINT AS nc FROM d),
         e AS (SELECT doc_id, tk, n,
             unnest(generate_series(0, nc - 1))::BIGINT AS chunk_id FROM c)
         SELECT doc_id, chunk_id,
           array_to_string(
             tk[(chunk_id * 15 + 1)::INT:(chunk_id * 15 + 20)::INT], ' ')
             AS chunk_text,
           least(20, n - chunk_id * 15)::BIGINT AS n_chunk_tokens
         FROM e ORDER BY doc_id, chunk_id""",
    "q_norm" ->
      """WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0
             THEN text || ' cafe' || chr(769) ||
                  ' see https://ex.ample/x?q=1' || chr(7) || ' fin'
             ELSE text END AS txt FROM documents),
         n AS (SELECT doc_id, trim(regexp_replace(
             regexp_replace(
               regexp_replace(nfc_normalize(txt), 'https?://[^\s\x0B]+', '', 'g'),
               '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
             '\s+', ' ', 'g')) AS nt FROM aug)
         SELECT doc_id, md5(nt) AS norm_fp,
                length(nt)::BIGINT AS n_chars_norm
         FROM n ORDER BY doc_id""",
    "q_pii_scrub" ->
      """WITH aug AS (SELECT doc_id,
           text || ' contact doc' || doc_id || '@example.com from 10.1.' ||
             (doc_id % 250) || '.7 or call +1-555-' ||
             lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-' ||
             lpad((doc_id % 10000)::VARCHAR, 4, '0') AS txt
           FROM documents)
         SELECT doc_id,
           len(regexp_extract_all(txt,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(txt,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
           len(regexp_extract_all(txt,
             '\+\d{1,2}-\d{3}-\d{3}-\d{4}')) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(txt,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+\d{1,2}-\d{3}-\d{3}-\d{4}', '<PHONE>', 'g')) AS scrub_fp
         FROM aug ORDER BY doc_id""",
    "q_top_ngrams" ->
      """WITH d AS (SELECT string_split(lower(trim(text)), ' ') AS tk
             FROM documents),
         b AS (SELECT CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                  ELSE list_transform(generate_series(1, len(tk)-1),
                         i -> tk[i] || ' ' || tk[i+1]) END AS bg FROM d),
         u AS (SELECT unnest(bg) AS ngram FROM b)
         SELECT ngram, count(*) AS cnt FROM u GROUP BY ngram
         ORDER BY cnt DESC, ngram LIMIT 20""",
    // the q_rrf ranking CTEs + the truncated RBO prefix sum
    "q_rbo" ->
      """WITH d AS (SELECT doc_id,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         base AS (SELECT doc_id, tk, len(tk)::BIGINT AS dl FROM d),
         st AS (SELECT count(*)::DOUBLE AS n,
             sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl,
             sum(CASE WHEN list_contains(tk, 'spark') THEN 1 ELSE 0 END)::DOUBLE AS df0,
             sum(CASE WHEN list_contains(tk, 'hash') THEN 1 ELSE 0 END)::DOUBLE AS df1,
             sum(CASE WHEN list_contains(tk, 'merge') THEN 1 ELSE 0 END)::DOUBLE AS df2
           FROM base),
         sc AS (SELECT doc_id,
             ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
               * len(list_filter(tk, x -> x = 'spark'))::DOUBLE * 2.2
               / (len(list_filter(tk, x -> x = 'spark'))::DOUBLE
                  + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl))
             + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5))
               * len(list_filter(tk, x -> x = 'hash'))::DOUBLE * 2.2
               / (len(list_filter(tk, x -> x = 'hash'))::DOUBLE
                  + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl))
             + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5))
               * len(list_filter(tk, x -> x = 'merge'))::DOUBLE * 2.2
               / (len(list_filter(tk, x -> x = 'merge'))::DOUBLE
                  + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl)) AS raw
           FROM base, st),
         bml AS (SELECT doc_id, floor(raw * 1e6 + 0.5) / 1e6 AS score
                 FROM sc WHERE floor(raw * 1e6 + 0.5) / 1e6 > 0
                 ORDER BY score DESC, doc_id LIMIT 50),
         bmr AS (SELECT doc_id, row_number() OVER
                   (ORDER BY score DESC, doc_id) AS rn FROM bml),
         b AS (SELECT doc_id, CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                 ELSE list_transform(generate_series(1, len(tk)-1),
                        i -> tk[i] || ' ' || tk[i+1]) END AS bg FROM d),
         e AS (SELECT doc_id, unnest(bg) AS ngram FROM b),
         cn AS (SELECT ngram, count(*)::BIGINT AS cnt,
                  string_split(ngram, ' ')[1] AS w1
                FROM e GROUP BY ngram),
         cx AS (SELECT w1, sum(cnt)::BIGINT AS ctx FROM cn GROUP BY w1),
         v AS (SELECT count(DISTINCT t)::BIGINT AS v FROM
                 (SELECT unnest(tk) AS t FROM d)),
         lp AS (SELECT e.doc_id,
                  ln((cn.cnt::DOUBLE + 0.5) / (cx.ctx::DOUBLE + 0.5 * v.v::DOUBLE)) AS lp
                FROM e JOIN cn ON e.ngram = cn.ngram
                       JOIN cx ON cn.w1 = cx.w1, v),
         lsc AS (SELECT doc_id,
                   floor(avg(lp) * 1e6 + 0.5) / 1e6 AS lm_score
                 FROM lp GROUP BY doc_id),
         lfull AS (SELECT d.doc_id, coalesce(lsc.lm_score, 0.0) AS lm_score
                   FROM d LEFT JOIN lsc ON d.doc_id = lsc.doc_id),
         lml AS (SELECT doc_id, lm_score FROM lfull
                 ORDER BY lm_score DESC, doc_id LIMIT 50),
         lmr AS (SELECT doc_id, row_number() OVER
                   (ORDER BY lm_score DESC, doc_id) AS rn FROM lml),
         sh AS (SELECT greatest(bmr.rn, lmr.rn) AS depth
               FROM bmr JOIN lmr USING (doc_id)),
         dd AS (SELECT unnest(generate_series(1, 20))::BIGINT AS d2),
         tt AS (SELECT dd.d2, count(sh.depth)::BIGINT AS ov
                FROM dd LEFT JOIN sh ON sh.depth <= dd.d2 GROUP BY dd.d2),
         sm AS (SELECT sum((1.0 - 0.9) * pow(0.9, d2 - 1) * ov::DOUBLE / d2)
                  AS rbo FROM tt)
         SELECT floor(rbo * 1e6 + 0.5) / 1e6 AS rbo FROM sm""",
    // both constituent rankings replayed verbatim (bm25 + lm oracles),
    // then the rank-only fusion
    "q_rrf" ->
      """WITH d AS (SELECT doc_id,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         base AS (SELECT doc_id, tk, len(tk)::BIGINT AS dl FROM d),
         st AS (SELECT count(*)::DOUBLE AS n,
             sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl,
             sum(CASE WHEN list_contains(tk, 'spark') THEN 1 ELSE 0 END)::DOUBLE AS df0,
             sum(CASE WHEN list_contains(tk, 'hash') THEN 1 ELSE 0 END)::DOUBLE AS df1,
             sum(CASE WHEN list_contains(tk, 'merge') THEN 1 ELSE 0 END)::DOUBLE AS df2
           FROM base),
         sc AS (SELECT doc_id,
             ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
               * len(list_filter(tk, x -> x = 'spark'))::DOUBLE * 2.2
               / (len(list_filter(tk, x -> x = 'spark'))::DOUBLE
                  + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl))
             + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5))
               * len(list_filter(tk, x -> x = 'hash'))::DOUBLE * 2.2
               / (len(list_filter(tk, x -> x = 'hash'))::DOUBLE
                  + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl))
             + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5))
               * len(list_filter(tk, x -> x = 'merge'))::DOUBLE * 2.2
               / (len(list_filter(tk, x -> x = 'merge'))::DOUBLE
                  + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl)) AS raw
           FROM base, st),
         bml AS (SELECT doc_id, floor(raw * 1e6 + 0.5) / 1e6 AS score
                 FROM sc WHERE floor(raw * 1e6 + 0.5) / 1e6 > 0
                 ORDER BY score DESC, doc_id LIMIT 50),
         bmr AS (SELECT doc_id, row_number() OVER
                   (ORDER BY score DESC, doc_id) AS rn FROM bml),
         b AS (SELECT doc_id, CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                 ELSE list_transform(generate_series(1, len(tk)-1),
                        i -> tk[i] || ' ' || tk[i+1]) END AS bg FROM d),
         e AS (SELECT doc_id, unnest(bg) AS ngram FROM b),
         cn AS (SELECT ngram, count(*)::BIGINT AS cnt,
                  string_split(ngram, ' ')[1] AS w1
                FROM e GROUP BY ngram),
         cx AS (SELECT w1, sum(cnt)::BIGINT AS ctx FROM cn GROUP BY w1),
         v AS (SELECT count(DISTINCT t)::BIGINT AS v FROM
                 (SELECT unnest(tk) AS t FROM d)),
         lp AS (SELECT e.doc_id,
                  ln((cn.cnt::DOUBLE + 0.5) / (cx.ctx::DOUBLE + 0.5 * v.v::DOUBLE)) AS lp
                FROM e JOIN cn ON e.ngram = cn.ngram
                       JOIN cx ON cn.w1 = cx.w1, v),
         lsc AS (SELECT doc_id,
                   floor(avg(lp) * 1e6 + 0.5) / 1e6 AS lm_score
                 FROM lp GROUP BY doc_id),
         lfull AS (SELECT d.doc_id, coalesce(lsc.lm_score, 0.0) AS lm_score
                   FROM d LEFT JOIN lsc ON d.doc_id = lsc.doc_id),
         lml AS (SELECT doc_id, lm_score FROM lfull
                 ORDER BY lm_score DESC, doc_id LIMIT 50),
         lmr AS (SELECT doc_id, row_number() OVER
                   (ORDER BY lm_score DESC, doc_id) AS rn FROM lml),
         u AS (SELECT doc_id, rn FROM bmr
               UNION ALL SELECT doc_id, rn FROM lmr),
         f AS (SELECT doc_id,
                 floor(sum(1.0 / (60 + rn)) * 1e6 + 0.5) / 1e6 AS rrf,
                 count(*)::BIGINT AS n_lists
               FROM u GROUP BY doc_id)
         SELECT doc_id, rrf, n_lists FROM f
         ORDER BY rrf DESC, doc_id LIMIT 20""",
    "q_keywords" ->
      """WITH d AS (SELECT doc_id,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         tf AS (SELECT doc_id, t AS term, count(*)::DOUBLE AS tf
                FROM (SELECT doc_id, unnest(tk) AS t FROM d)
                GROUP BY doc_id, t),
         dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
         n AS (SELECT count(*)::DOUBLE AS n FROM d),
         w AS (SELECT tf.doc_id, tf.term,
                 floor(tf.tf * ln(n.n / dfq.df::DOUBLE) * 1e6 + 0.5) / 1e6
                   AS weight
               FROM tf JOIN dfq USING (term), n),
         r AS (SELECT doc_id, term, weight,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY weight DESC, term) AS rk FROM w)
         SELECT doc_id, term, weight, rk FROM r WHERE rk <= 3
         ORDER BY doc_id, rk""",
    // identical scoring contract as q_bm25 - same replay
    "q_search_idx" ->
      """WITH d AS (SELECT doc_id,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         base AS (SELECT doc_id, tk, len(tk)::BIGINT AS dl FROM d),
         st AS (SELECT count(*)::DOUBLE AS n,
             sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl,
             sum(CASE WHEN list_contains(tk, 'spark') THEN 1 ELSE 0 END)::DOUBLE AS df0,
             sum(CASE WHEN list_contains(tk, 'hash') THEN 1 ELSE 0 END)::DOUBLE AS df1,
             sum(CASE WHEN list_contains(tk, 'merge') THEN 1 ELSE 0 END)::DOUBLE AS df2
           FROM base),
         sc AS (SELECT doc_id,
             ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
               * len(list_filter(tk, x -> x = 'spark'))::DOUBLE * 2.2
               / (len(list_filter(tk, x -> x = 'spark'))::DOUBLE
                  + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl))
             + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5))
               * len(list_filter(tk, x -> x = 'hash'))::DOUBLE * 2.2
               / (len(list_filter(tk, x -> x = 'hash'))::DOUBLE
                  + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl))
             + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5))
               * len(list_filter(tk, x -> x = 'merge'))::DOUBLE * 2.2
               / (len(list_filter(tk, x -> x = 'merge'))::DOUBLE
                  + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl)) AS raw
           FROM base, st)
         SELECT doc_id, floor(raw * 1e6 + 0.5) / 1e6 AS score FROM sc
         WHERE floor(raw * 1e6 + 0.5) / 1e6 > 0
         ORDER BY score DESC, doc_id LIMIT 50""",
    "q_bm25" ->
      """WITH d AS (SELECT doc_id,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         base AS (SELECT doc_id, tk, len(tk)::BIGINT AS dl FROM d),
         st AS (SELECT count(*)::DOUBLE AS n,
             sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl,
             sum(CASE WHEN list_contains(tk, 'spark') THEN 1 ELSE 0 END)::DOUBLE AS df0,
             sum(CASE WHEN list_contains(tk, 'hash') THEN 1 ELSE 0 END)::DOUBLE AS df1,
             sum(CASE WHEN list_contains(tk, 'merge') THEN 1 ELSE 0 END)::DOUBLE AS df2
           FROM base),
         sc AS (SELECT doc_id,
             ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
               * len(list_filter(tk, x -> x = 'spark'))::DOUBLE * 2.2
               / (len(list_filter(tk, x -> x = 'spark'))::DOUBLE
                  + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl))
             + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5))
               * len(list_filter(tk, x -> x = 'hash'))::DOUBLE * 2.2
               / (len(list_filter(tk, x -> x = 'hash'))::DOUBLE
                  + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl))
             + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5))
               * len(list_filter(tk, x -> x = 'merge'))::DOUBLE * 2.2
               / (len(list_filter(tk, x -> x = 'merge'))::DOUBLE
                  + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl)) AS raw
           FROM base, st)
         SELECT doc_id, floor(raw * 1e6 + 0.5) / 1e6 AS score FROM sc
         WHERE floor(raw * 1e6 + 0.5) / 1e6 > 0
         ORDER BY score DESC, doc_id LIMIT 50""",
    "q_zipf" ->
      """WITH v AS (SELECT t, count(*)::BIGINT AS f FROM
             (SELECT unnest(string_split(lower(trim(text)), ' ')) AS t
              FROM documents) GROUP BY t),
         r AS (SELECT f, row_number() OVER (ORDER BY f DESC, t) AS rank
               FROM v),
         m AS (SELECT count(*)::BIGINT AS n_terms,
                 covar_pop(ln(rank::DOUBLE), ln(f::DOUBLE)) AS cov,
                 var_pop(ln(rank::DOUBLE)) AS vx,
                 var_pop(ln(f::DOUBLE)) AS vy
               FROM r)
         SELECT n_terms,
           CASE WHEN vx > 0
             THEN floor(cov / vx * 1e6 + 0.5) / 1e6 END AS slope,
           CASE WHEN vx > 0 AND vy > 0
             THEN floor(cov * cov / (vx * vy) * 1e6 + 0.5) / 1e6 END AS r2
         FROM m""",
    "q_vocab_cov" ->
      """WITH v AS (SELECT t, count(*)::BIGINT AS f FROM
             (SELECT unnest(string_split(lower(trim(text)), ' ')) AS t
              FROM documents) GROUP BY t),
         r AS (SELECT f, row_number() OVER (ORDER BY f DESC, t) AS rank
               FROM v),
         a AS (SELECT sum(f)::DOUBLE AS tot,
                 sum(CASE WHEN rank <= 100 THEN f ELSE 0 END)::DOUBLE AS c100,
                 sum(CASE WHEN rank <= 1000 THEN f ELSE 0 END)::DOUBLE AS c1000,
                 sum(CASE WHEN rank <= 8000 THEN f ELSE 0 END)::DOUBLE AS c8000
               FROM r)
         SELECT 100 AS vocab_k,
           floor(c100 / tot * 1e6 + 0.5) / 1e6 AS covered_share FROM a
         UNION ALL SELECT 1000, floor(c1000 / tot * 1e6 + 0.5) / 1e6 FROM a
         UNION ALL SELECT 8000, floor(c8000 / tot * 1e6 + 0.5) / 1e6 FROM a
         ORDER BY vocab_k""",
    "q_script" ->
      """WITH s AS (SELECT doc_id,
             regexp_replace(text, '\s+', '', 'g') AS s FROM documents),
         c AS (SELECT doc_id, length(s)::DOUBLE AS n,
             (length(s) - length(regexp_replace(s, '[A-Za-z]', '', 'g')))::DOUBLE AS la,
             (length(s) - length(regexp_replace(s, '[0-9]', '', 'g')))::DOUBLE AS di,
             (length(s) - length(regexp_replace(s, '[\x{4e00}-\x{9fff}]', '', 'g')))::DOUBLE AS cj,
             (length(s) - length(regexp_replace(s, '[\x{0400}-\x{04ff}]', '', 'g')))::DOUBLE AS cy
           FROM s),
         f AS (SELECT doc_id, n,
             CASE WHEN n > 0 THEN floor(la / n * 1e6 + 0.5) / 1e6 ELSE 0.0 END AS latin_frac,
             CASE WHEN n > 0 THEN floor(di / n * 1e6 + 0.5) / 1e6 ELSE 0.0 END AS digit_frac,
             CASE WHEN n > 0 THEN floor(cj / n * 1e6 + 0.5) / 1e6 ELSE 0.0 END AS cjk_frac,
             CASE WHEN n > 0 THEN floor(cy / n * 1e6 + 0.5) / 1e6 ELSE 0.0 END AS cyrillic_frac
           FROM c)
         SELECT doc_id, latin_frac, digit_frac, cjk_frac, cyrillic_frac,
           CASE WHEN n > 0 THEN floor((1.0 - (latin_frac + digit_frac
             + cjk_frac + cyrillic_frac)) * 1e6 + 0.5) / 1e6
           ELSE 0.0 END AS other_frac
         FROM f ORDER BY doc_id""",
    "q_trigram" ->
      """WITH d AS (SELECT doc_id,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         r AS (SELECT * FROM d WHERE doc_id % 7 <> 0),
         rt AS (SELECT unnest(CASE WHEN len(tk) < 3 THEN []::VARCHAR[]
                 ELSE list_transform(generate_series(1, len(tk)-2),
                        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END)
                 AS g3 FROM r),
         tric AS (SELECT g3, count(*)::BIGINT AS c3 FROM rt GROUP BY g3),
         rb AS (SELECT unnest(CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                 ELSE list_transform(generate_series(1, len(tk)-1),
                        i -> tk[i] || ' ' || tk[i+1]) END) AS g2 FROM r),
         bic AS (SELECT g2, count(*)::BIGINT AS c2 FROM rb GROUP BY g2),
         ru AS (SELECT unnest(tk) AS g1 FROM r),
         unic AS (SELECT g1, count(*)::BIGINT AS c1 FROM ru GROUP BY g1),
         sca AS (SELECT count(*)::BIGINT AS n,
                   count(DISTINCT g1)::BIGINT AS v FROM ru),
         pos AS (SELECT doc_id, unnest(CASE WHEN len(tk) < 3 THEN []::VARCHAR[]
                 ELSE list_transform(generate_series(1, len(tk)-2),
                        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END)
                 AS g3 FROM d),
         px AS (SELECT doc_id, g3,
                  string_split(g3, ' ')[1] || ' ' || string_split(g3, ' ')[2] AS w12,
                  string_split(g3, ' ')[2] || ' ' || string_split(g3, ' ')[3] AS w23,
                  string_split(g3, ' ')[2] AS w2,
                  string_split(g3, ' ')[3] AS w3
                FROM pos),
         j AS (SELECT px.doc_id,
                 CASE WHEN tric.c3 IS NOT NULL
                      THEN ln(tric.c3::DOUBLE / b12.c2::DOUBLE)
                      WHEN b23.c2 IS NOT NULL
                      THEN ln(0.4 * b23.c2::DOUBLE / u2.c1::DOUBLE)
                      ELSE ln(0.4 * 0.4 * (coalesce(u3.c1, 0)::DOUBLE + 0.5)
                              / (sca.n::DOUBLE + 0.5 * sca.v::DOUBLE))
                 END AS lp
               FROM px LEFT JOIN tric ON px.g3 = tric.g3
                       LEFT JOIN bic b12 ON px.w12 = b12.g2
                       LEFT JOIN bic b23 ON px.w23 = b23.g2
                       LEFT JOIN unic u2 ON px.w2 = u2.g1
                       LEFT JOIN unic u3 ON px.w3 = u3.g1, sca),
         sc AS (SELECT doc_id, count(*)::BIGINT AS n_trigrams,
                  floor(avg(lp) * 1e6 + 0.5) / 1e6 AS bo_score
                FROM j GROUP BY doc_id)
         SELECT d.doc_id, coalesce(sc.n_trigrams, 0)::BIGINT AS n_trigrams,
                coalesce(sc.bo_score, 0.0) AS bo_score
         FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id ORDER BY d.doc_id""",
    "q_lm_score" ->
      """WITH d AS (SELECT doc_id,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         b AS (SELECT doc_id, CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                 ELSE list_transform(generate_series(1, len(tk)-1),
                        i -> tk[i] || ' ' || tk[i+1]) END AS bg FROM d),
         e AS (SELECT doc_id, unnest(bg) AS ngram FROM b),
         cn AS (SELECT ngram, count(*)::BIGINT AS cnt,
                  string_split(ngram, ' ')[1] AS w1
                FROM e GROUP BY ngram),
         cx AS (SELECT w1, sum(cnt)::BIGINT AS ctx FROM cn GROUP BY w1),
         v AS (SELECT count(DISTINCT t)::BIGINT AS v FROM
                 (SELECT unnest(tk) AS t FROM d)),
         lp AS (SELECT e.doc_id,
                  ln((cn.cnt::DOUBLE + 0.5) / (cx.ctx::DOUBLE + 0.5 * v.v::DOUBLE)) AS lp
                FROM e JOIN cn ON e.ngram = cn.ngram
                       JOIN cx ON cn.w1 = cx.w1, v),
         sc AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                  floor(avg(lp) * 1e6 + 0.5) / 1e6 AS lm_score
                FROM lp GROUP BY doc_id)
         SELECT d.doc_id, coalesce(sc.n_bigrams, 0)::BIGINT AS n_bigrams,
                coalesce(sc.lm_score, 0.0) AS lm_score
         FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id ORDER BY d.doc_id""",
    // lm_score replay + per-language equal-count tertiles (integer-rank
    // ntile — no float-boundary comparison to drift across engines)
    "q_ppl_buckets" ->
      """WITH d AS (SELECT doc_id,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         b AS (SELECT doc_id, CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                 ELSE list_transform(generate_series(1, len(tk)-1),
                        i -> tk[i] || ' ' || tk[i+1]) END AS bg FROM d),
         e AS (SELECT doc_id, unnest(bg) AS ngram FROM b),
         cn AS (SELECT ngram, count(*)::BIGINT AS cnt,
                  string_split(ngram, ' ')[1] AS w1
                FROM e GROUP BY ngram),
         cx AS (SELECT w1, sum(cnt)::BIGINT AS ctx FROM cn GROUP BY w1),
         v AS (SELECT count(DISTINCT t)::BIGINT AS v FROM
                 (SELECT unnest(tk) AS t FROM d)),
         lp AS (SELECT e.doc_id,
                  ln((cn.cnt::DOUBLE + 0.5) / (cx.ctx::DOUBLE + 0.5 * v.v::DOUBLE)) AS lp
                FROM e JOIN cn ON e.ngram = cn.ngram
                       JOIN cx ON cn.w1 = cx.w1, v),
         sc AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                  floor(avg(lp) * 1e6 + 0.5) / 1e6 AS lm_score
                FROM lp GROUP BY doc_id),
         f AS (SELECT d.doc_id,
                 coalesce(sc.n_bigrams, 0)::BIGINT AS n_bigrams,
                 coalesce(sc.lm_score, 0.0) AS lm_score
               FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id)
         SELECT f.doc_id, doc.lang, f.n_bigrams, f.lm_score,
           ntile(3) OVER (PARTITION BY doc.lang
                          ORDER BY f.lm_score DESC, f.doc_id) AS ppl_bucket
         FROM f JOIN documents doc ON f.doc_id = doc.doc_id
         ORDER BY f.doc_id""",
    "q_fertility" ->
      """SELECT lang, count(*)::BIGINT AS n_docs, 1 AS fertility_ok
         FROM documents GROUP BY lang ORDER BY lang""",
    // the segmentation is a lossless partition of each word, so the
    // exact joined text is oracle-computable even though the merge
    // table is not; within_bounds replays as the gates' all-true column
    "q_bpe" ->
      """SELECT doc_id,
           regexp_replace(lower(trim(text)), '\s+', '', 'g') AS joined,
           1 AS within_bounds
         FROM documents ORDER BY doc_id""",
    "q_gopher" ->
      """WITH d AS (SELECT doc_id, text,
             string_split(trim(text), ' ') AS tk FROM documents),
         l AS (SELECT doc_id, list_filter(list_transform(
                 string_split(text, chr(10)), x -> trim(x)),
                 x -> x <> '') AS ls
               FROM d),
         lb AS (SELECT doc_id, len(ls) AS nl,
                  len(list_filter(ls,
                    x -> substr(x, 1, 1) IN ('-', '*', '•'))) AS bl,
                  len(list_filter(ls,
                    x -> (length(x) >= 3
                          AND substr(x, length(x) - 2) = '...')
                      OR substr(x, length(x)) = '…')) AS el
                FROM l),
         m AS (SELECT d.doc_id, len(tk) AS n,
                 length(regexp_replace(trim(text), '\s+', '', 'g'))::DOUBLE
                   / len(tk) AS mwl0,
                 ((length(text) - length(replace(text, '#', '')))
                  + (length(text) - length(replace(text, '...', ''))) / 3)
                   ::DOUBLE / len(tk) AS sym0,
                 len(list_filter(tk,
                   x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                   / len(tk) AS alpha0,
                 len(list_intersect(string_split(lower(trim(text)), ' '),
                   ['the','be','to','of','and','that','have','with']))
                   AS nstops,
                 lb.nl, lb.bl, lb.el
               FROM d JOIN lb ON d.doc_id = lb.doc_id),
         r AS (SELECT doc_id, n,
                 floor(mwl0 * 1e6 + 0.5) / 1e6 AS mwl,
                 floor(sym0 * 1e6 + 0.5) / 1e6 AS sym,
                 floor(bl::DOUBLE / nl * 1e6 + 0.5) / 1e6 AS bf,
                 floor(el::DOUBLE / nl * 1e6 + 0.5) / 1e6 AS ef,
                 floor(alpha0 * 1e6 + 0.5) / 1e6 AS af,
                 nstops
               FROM m)
         SELECT doc_id, n::BIGINT AS n_words, mwl AS mean_word_len,
           sym AS symbol_ratio, bf AS bullet_frac, ef AS ellipsis_frac,
           af AS alpha_word_frac, nstops::BIGINT AS n_req_stops,
           (n >= 50 AND n <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
            AND sym <= 0.1 AND bf <= 0.9 AND ef <= 0.3 AND af >= 0.8
            AND nstops >= 2)::INT AS passes
         FROM r ORDER BY doc_id""",
    "q_char_entropy" ->
      """WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
               FROM documents),
         cnt AS (SELECT doc_id, ch, count(*)::DOUBLE AS c
                 FROM c GROUP BY doc_id, ch),
         n AS (SELECT doc_id, sum(c) AS n, sum(c * log2(c)) AS s
               FROM cnt GROUP BY doc_id)
         SELECT doc_id,
           floor((log2(n) - s / n) * 1e6 + 0.5) / 1e6 AS char_entropy
         FROM n ORDER BY doc_id""",
  )
}
