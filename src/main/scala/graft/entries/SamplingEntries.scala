package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import EntryHelpers._

/** Sampling, splits, mixing and classifier-filter contract queries + their DuckDB oracles, kept ADJACENT per
  * family (split from the former 5k-line SparkEntry maps — round-9
  * verdict #7: a mis-paired oracle edit was a 5k-line scroll).
  * [[SparkEntry]] aggregates every family and asserts name uniqueness. */
private[graft] object SamplingEntries {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // data-constrained mixing with repetition: undersized sources run
    // full epochs (capped) + one md5-sampled partial epoch
    "q_repeat" -> ((s, dir) =>
      pipeline.Mixing.repeatToBudget(
        t(s, dir, "documents"), "text", "doc_id", "source",
        weights = Map("src0" -> 0.5, "src1" -> 0.5),
        tokenBudget = 10000L, maxEpochs = 4)
        .groupBy(col("source"), col("epoch"))
        .agg(count(lit(1)).alias("cnt"))
        .orderBy("source", "epoch")),
    // multimodal binary plumbing end-to-end: synthetic payload, REAL
    // partition-wise resize (mapPartitions, the plan shape a codec needs),
    // checked against an independent arithmetic oracle
    "q_multimodal" -> ((s, dir) => {
      val media = pipeline.Multimodal.attachFakeMedia(
        t(s, dir, "documents").select("doc_id", "text"), "text")
      pipeline.Multimodal.resizeMedia(media, 16, 16)
        .select(col("doc_id"),
          col("media_meta.format").alias("format"),
          col("media_meta.width").cast("long").alias("width"),
          col("media_meta.height").cast("long").alias("height"),
          col("media_meta.n_bytes").alias("n_bytes"),
          length(col("media")).cast("long").alias("media_len"))
        .orderBy("doc_id")
    }),
    // real video decode end-to-end: per-doc MJPEG-AVI payloads (real
    // RIFF container, real JPEG frames) through the real parser — the
    // structural outputs (frame count, dims, fps, duration) only come
    // out right if the RIFF walk + per-frame imageio decode both
    // succeed, and the oracle replays the generator arithmetic
    "q_video" -> ((s, dir) => {
      // Scans.spread (no-op at scale): the AVI encode+decode kernel is
      // the whole query cost and would otherwise run on the scan's
      // single local split
      val media = pipeline.Multimodal.attachFakeVideo(
        pipeline.Scans.spread(
          t(s, dir, "documents").select("doc_id", "text"), col("doc_id")),
        "text")
      pipeline.Multimodal.extractFeatures(media)
        .select(col("doc_id"),
          col("media_feat")(0).cast("long").alias("n_frames"),
          col("media_feat")(1).cast("long").alias("width"),
          col("media_feat")(2).cast("long").alias("height"),
          col("media_feat")(3).cast("long").alias("fps"),
          round(col("media_feat")(4).cast("double"), 2).alias("duration_s"))
        .orderBy("doc_id")
    }),
    // deterministic stratified sampling: downsample the dominant
    // language, keep the tail — md5-threshold filter, no RNG, no shuffle
    "q_sample" -> ((s, dir) => pipeline.Sampling.stratifiedSample(
      t(s, dir, "documents"), "doc_id", "lang",
      rates = Map("en" -> 0.25, "zh" -> 0.5), defaultRate = 0.75)
      .groupBy("lang").agg(count(lit(1)).alias("kept"))
      .orderBy("lang")),
    // weighted sample without replacement (Efraimidis–Spirakis A-Res):
    // md5-derived uniform raised to 1/weight, top-k — deterministic,
    // engine-portable, TakeOrdered plan; oracle replays the arithmetic
    "q_weighted_sample" -> ((s, dir) =>
      pipeline.Sampling.weightedSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
        "doc_id", length(col("text")), k = 25)
        .select(col("doc_id"), col("lang"), col("sample_score"))
        .orderBy(col("sample_score").desc, col("doc_id"))),
    // per-group weighted sample: k rows per language by the same A-Res
    // score — one window exchange on the group key, no global sort
    "q_weighted_by" -> ((s, dir) =>
      pipeline.Sampling.weightedSampleByGroup(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
        Seq("lang"), "doc_id", length(col("text")), kPerGroup = 5)
        .select(col("lang"), col("doc_id"), col("sample_score"))
        .orderBy(col("lang"), col("sample_score").desc, col("doc_id"))),
    // per-source quota cap: at most 10 docs per source by md5 priority —
    // the RefinedWeb-style per-domain cap; rank filter compiles to
    // WindowGroupLimit so the shuffle carries <= n rows/group/task
    "q_cap_source" -> ((s, dir) =>
      pipeline.Sampling.capPerGroup(
        t(s, dir, "documents").select(col("source"), col("doc_id")),
        "source", "doc_id", n = 10)
        .orderBy("source", "doc_id")),
    // deterministic shuffle + round-robin sharding: md5-rank order
    // dealt into 8 balanced shards (the training-shard write prep)
    "q_shuffle" -> ((s, dir) =>
      pipeline.Sampling.shuffleShards(
        t(s, dir, "documents").select(col("doc_id")), "doc_id", shards = 8)
        .orderBy("doc_id")),
    // leakage-safe split: near-dup connected components are the split
    // unit — a doc and all its near-duplicates land on one side
    "q_safe_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = pipeline.Dedup.jaccardPairsMemo(docs, "text", "doc_id",
        k = 2, threshold = 0.8)
      pipeline.Sampling.clusterSafeSplit(
        docs.select(col("doc_id")), "doc_id", pairs, "id_a", "id_b",
        Seq("train" -> 0.8, "eval" -> 0.2))
        .orderBy("doc_id")
    }),
    // exact stratified 80/10/10 split: every language lands its
    // proportional count in each slice (rank cuts, not hash binomials)
    "q_split_exact" -> ((s, dir) =>
      pipeline.Sampling.exactStratifiedSplit(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id")),
    // class-balanced downsample: every language keeps exactly the
    // rarest language's count, md5-ranked within class
    "q_balance" -> ((s, dir) =>
      pipeline.Sampling.classBalance(
        t(s, dir, "documents").select(col("lang"), col("doc_id")),
        "lang", "doc_id")
        .orderBy("doc_id")),
    // deterministic uniform negatives: 4 md5-indexed corpus draws per
    // anchor via the distributed dense rank (easy-negative counterpart
    // of q_hardneg)
    "q_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      pipeline.Sampling.uniformNegatives(emb,
        emb.filter(col("vec_id") < 5)
          .select(col("vec_id").alias("q_id")),
        "vec_id", "q_id", k = 4)
        .orderBy("q_id", "j")
    }),
    // leakage-safe train/val/test split: md5(salt ++ doc_id) cuts the
    // 32-bit prefix space at 80/10/10 — a pure map-side projection (no
    // exchange, no RNG state); the same row lands in the same slice on
    // any engine, run, or partitioning
    "q_split" -> ((s, dir) =>
      pipeline.Sampling.splitByHash(
        t(s, dir, "documents").select("doc_id"),
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        salt = "graft-r9")
        .orderBy("doc_id")),
    // sequence packing: per-doc coordinates in the sharded concatenated
    // token stream (seqLen=512, 8 shards)
    "q_pack" -> ((s, dir) =>
      pipeline.Packing.packDocs(t(s, dir, "documents"), "doc_id", "text",
        seqLen = 512, shards = 8)
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          col("start_off"), col("seq_id"), col("seq_off"))
        .orderBy("doc_id")),
    // packed-stream assembly: the actual (shard, seq) token slices,
    // fingerprinted (seqLen=512, 8 shards)
    "q_pack_asm" -> ((s, dir) =>
      pipeline.Packing.assembleSequences(t(s, dir, "documents"), "doc_id",
        "text", seqLen = 512, shards = 8)
        .select(col("shard"), col("seq_id"),
          size(col("tokens")).cast("long").alias("n_tokens"),
          md5(array_join(col("tokens"), " ")).alias("fp"))
        .orderBy("shard", "seq_id")),
    // DSIR importance weights (Xie 2023): hashed-ngram log-likelihood
    // ratio of every document against a target-domain sample (lang='de');
    // count tables bounded at `buckets` cells, ratio table broadcast
    "q_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      pipeline.Dsir.importanceWeights(docs, docs.filter(col("lang") === "de"),
        "text", "doc_id", buckets = 8192, alpha = 0.5)
        .orderBy("doc_id")
    }),
    // DSIR Gumbel-top-k resample on those weights: deterministic md5
    // Gumbel noise, map-side key + TakeOrderedAndProject
    "q_dsir_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val w = pipeline.Dsir.importanceWeights(docs,
        docs.filter(col("lang") === "de"), "text", "doc_id",
        buckets = 8192, alpha = 0.5)
      pipeline.Dsir.resample(w, "doc_id", "iw", k = 40)
        .select(col("doc_id"), col("iw"), col("sample_key"))
        .orderBy(col("sample_key").desc, col("doc_id"))
    }),
    // model-based quality/language filter (fastText-shape, Joulin 2017 /
    // GPT-3 data recipe): hashed-ngram Naive Bayes fit on a labeled set
    // (here: lang='en' as the positive class), applied to the corpus by
    // the shuffle-free per-row scoring kernel
    "q_nb_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val labeled = docs.withColumn("y", (col("lang") === "en").cast("int"))
      val model = pipeline.Classify.fitNaiveBayes(labeled, "text", "doc_id",
        "y", buckets = 8192, alpha = 0.5)
      pipeline.Classify.score(docs, "text", "doc_id", model)
        .orderBy("doc_id")
    }),
    // ROC-AUC of the NB quality score against the lang='en' labels:
    // Mann-Whitney with average-rank tie correction, distributed rank
    "q_auc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val labeled = docs.withColumn("y", (col("lang") === "en").cast("int"))
      val model = pipeline.Classify.fitNaiveBayes(labeled, "text", "doc_id",
        "y", buckets = 8192, alpha = 0.5)
      // withScore appends to the LABELED frame — score and label ride one
      // corpus scan instead of a corpus self-join on doc_id (r14: the
      // join was the report family's residual cost after the fit memo).
      // Scans.spread (no-op at scale) parallelizes the scoring kernel
      // feeding the rank exchange on single-split local inputs.
      val scored = pipeline.Classify.withScore(
        pipeline.Scans.spread(labeled, col("doc_id")), "text", model)
      pipeline.Classify.aucScore(scored, "score", "y", "doc_id")
    }),
    // confusion matrix + precision/recall/F1 at the zero threshold
    "q_confusion" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val labeled = docs.withColumn("y", (col("lang") === "en").cast("int"))
      val model = pipeline.Classify.fitNaiveBayes(labeled, "text", "doc_id",
        "y", buckets = 8192, alpha = 0.5)
      val scored = pipeline.Classify.withScore(labeled, "text", model)
      pipeline.Classify.confusionReport(scored, "score", "y", threshold = 0.0)
    }),
    // reliability diagram: decile bins of σ(score) vs empirical
    // positive rate (probabilities rounded before binning — engine-
    // portable bin edges)
    "q_calibration" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val labeled = docs.withColumn("y", (col("lang") === "en").cast("int"))
      val model = pipeline.Classify.fitNaiveBayes(labeled, "text", "doc_id",
        "y", buckets = 8192, alpha = 0.5)
      // Scans.spread (no-op at scale): the dsir_score kernel otherwise
      // runs on the scan's single local split — the whole residual cost
      // of this entry after the fit memo (r15 verdict item 6)
      val scored = pipeline.Classify.withScore(
        pipeline.Scans.spread(labeled, col("doc_id")), "text", model)
      pipeline.Classify.calibrationReport(scored, "score", "y", bins = 10)
        .orderBy("bin")
    }),
    // one deterministic logistic-regression GD step from zero init (the
    // σ(0)=½ closed form the oracle replays); multi-step convergence is
    // certified by ClassifySpec
    "q_lr_step" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val labeled = docs.withColumn("y", (col("lang") === "en").cast("int"))
      val model = pipeline.Classify.fitLogReg(labeled, "text", "doc_id",
        "y", buckets = 8192, lr = 0.5, iters = 1)
      pipeline.Classify.score(docs, "text", "doc_id", model)
        .orderBy("doc_id")
    }),
    // temperature-scaled mixture plan (q ∝ p^alpha, Conneau 2020): the
    // per-source keep-rates that flatten the natural mix at alpha=0.5
    // under a 20k-token budget
    "q_mix_temp" -> ((s, dir) => {
      val stats = pipeline.Mixing.sourceStats(
        t(s, dir, "documents"), "text", "source")
      pipeline.Mixing.temperaturePlan(stats, "source", alpha = 0.5,
        tokenBudget = 20000L)
        .orderBy("source")
    }),
    // corpus mixing: per-source token statistics (hash-agg on the source
    // key; share via 1-row broadcast, no corpus window)
    "q_mix" -> ((s, dir) =>
      pipeline.Mixing.sourceStats(t(s, dir, "documents"), "text", "source")
        .orderBy("source")),
  )

  val oracles: Seq[(String, String)] = Seq(
    "q_sample" ->
      """SELECT lang, count(*) AS kept
         FROM documents
         WHERE substr(md5(doc_id::VARCHAR), 1, 8) <
               CASE WHEN lang = 'en' THEN '40000000'
                    WHEN lang = 'zh' THEN '80000000'
                    ELSE 'c0000000' END
         GROUP BY lang ORDER BY lang""",
    "q_weighted_sample" ->
      """WITH s AS (
           SELECT doc_id, lang,
             pow((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 0.5)
                   / 4294967296.0,
                 1.0 / length(text)) AS score
           FROM documents WHERE length(text) > 0),
         t AS (SELECT doc_id, lang, score FROM s
               ORDER BY score DESC, doc_id LIMIT 25)
         SELECT doc_id, lang,
           floor(score * 1e6 + 0.5) / 1e6 AS sample_score
         FROM t ORDER BY sample_score DESC, doc_id""",
    "q_weighted_by" ->
      """WITH s AS (
           SELECT lang, doc_id,
             pow((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 0.5)
                   / 4294967296.0,
                 1.0 / length(text)) AS score
           FROM documents WHERE length(text) > 0),
         t AS (SELECT lang, doc_id, score,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY score DESC, doc_id) AS rn
               FROM s)
         SELECT lang, doc_id,
           floor(score * 1e6 + 0.5) / 1e6 AS sample_score
         FROM t WHERE rn <= 5
         ORDER BY lang, sample_score DESC, doc_id""",
    "q_cap_source" ->
      """WITH r AS (
           SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY substr(md5(doc_id::VARCHAR), 1, 8), doc_id) AS rn
           FROM documents)
         SELECT source, doc_id FROM r WHERE rn <= 10
         ORDER BY source, doc_id""",
    "q_shuffle" ->
      """WITH r AS (SELECT doc_id, row_number() OVER
             (ORDER BY substr(md5(doc_id::VARCHAR), 1, 8), doc_id) AS rank
           FROM documents)
         SELECT doc_id, ((rank - 1) % 8)::INT AS shard,
           ((rank - 1) // 8)::BIGINT AS pos
         FROM r ORDER BY doc_id""",
    // components replayed with the recursive CTE, then the same md5 cut
    // on the component key (hexThreshold(0.8) = 0xcccccccd)
    "q_safe_split" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, string_split(lower(trim(text)), ' ') AS tk
           FROM documents),
         sh AS (
           SELECT doc_id, list_distinct(CASE WHEN len(tk) < 2
             THEN [array_to_string(tk, ' ')]
             ELSE list_transform(generate_series(1, len(tk)-1),
                    i -> array_to_string(tk[i:i+1], ' ')) END) AS s
           FROM toks),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.s, b.s))::DOUBLE /
             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
         cc AS (
           SELECT DISTINCT src AS id, src AS comp FROM edges
           UNION
           SELECT e.dst AS id, cc.comp FROM cc JOIN edges e ON cc.id = e.src),
         comp AS (SELECT id AS doc_id, min(comp) AS comp FROM cc GROUP BY id),
         g AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster_key
               FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
         SELECT doc_id, cluster_key,
           CASE WHEN substr(md5(cluster_key::VARCHAR), 1, 8) < 'cccccccd'
                THEN 'train' ELSE 'eval' END AS split
         FROM g ORDER BY doc_id""",
    "q_split_exact" ->
      """WITH r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY substr(md5(doc_id::VARCHAR), 1, 8), doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
           FROM documents)
         SELECT doc_id, lang,
           CASE WHEN rn <= ceil(0.8 * n) THEN 'train'
                WHEN rn <= ceil(0.9 * n) THEN 'val'
                ELSE 'test' END AS split
         FROM r ORDER BY doc_id""",
    "q_balance" ->
      """WITH c AS (SELECT lang, count(*)::BIGINT AS cnt FROM documents
                    GROUP BY lang),
         t AS (SELECT min(cnt)::BIGINT AS target FROM c),
         r AS (SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY substr(md5(doc_id::VARCHAR), 1, 8), doc_id) AS rn
               FROM documents)
         SELECT r.lang, r.doc_id FROM r, t WHERE r.rn <= t.target
         ORDER BY r.doc_id""",
    "q_negatives" ->
      """WITH r AS (SELECT vec_id,
             row_number() OVER (ORDER BY vec_id) AS rank FROM embeddings),
         n AS (SELECT count(*)::BIGINT AS n FROM embeddings),
         a AS (SELECT vec_id AS q_id FROM embeddings WHERE vec_id < 5),
         j AS (SELECT unnest(generate_series(1, 4)) AS j),
         p AS (SELECT a.q_id, j.j,
                 ('0x' || substr(md5(a.q_id::VARCHAR || '#' || j.j::VARCHAR),
                    1, 15))::BIGINT % n.n + 1 AS rank
               FROM a, j, n)
         SELECT p.q_id, p.j, r.vec_id AS neg_id
         FROM p JOIN r USING (rank) WHERE r.vec_id <> p.q_id
         ORDER BY q_id, j""",
    "q_multimodal" ->
      """SELECT doc_id, 'fake/raw' AS format, 16::BIGINT AS width,
                16::BIGINT AS height,
                greatest(1, (length(text)::BIGINT * 256) //
                  (((length(text) % 64) + 1) * ((length(text) % 48) + 1))
                )::BIGINT AS n_bytes,
                greatest(1, (length(text)::BIGINT * 256) //
                  (((length(text) % 64) + 1) * ((length(text) % 48) + 1))
                )::BIGINT AS media_len
         FROM documents ORDER BY doc_id""",
    "q_video" ->
      """SELECT doc_id,
                (length(text) % 5 + 2)::BIGINT AS n_frames,
                (16 * (length(text) % 3 + 1))::BIGINT AS width,
                16::BIGINT AS height,
                10::BIGINT AS fps,
                round((length(text) % 5 + 2) / 10.0, 2) AS duration_s
         FROM documents ORDER BY doc_id""",
    "q_repeat" ->
      """WITH per AS (
           SELECT source, count(*)::BIGINT AS n_docs,
             sum(len(string_split(trim(text), ' ')))::BIGINT AS n_tokens
           FROM documents WHERE source IN ('src0', 'src1')
           GROUP BY source),
         plan AS (
           SELECT source, n_docs,
             least(4.0, floor(5000.0 / n_tokens))::BIGINT AS f,
             CASE WHEN floor(5000.0 / n_tokens) >= 4 THEN 0.0
                  ELSE least(1.0, 5000.0 / n_tokens
                         - floor(5000.0 / n_tokens)) END AS frac
           FROM per),
         fulls AS (
           SELECT p.source, s.e AS epoch, p.n_docs AS cnt
           FROM plan p, generate_series(0, 3) s(e) WHERE s.e < p.f),
         parts AS (
           SELECT p.source, p.f AS epoch, count(*)::BIGINT AS cnt
           FROM plan p JOIN documents d ON d.source = p.source
           WHERE p.frac > 0
             AND substr(md5(d.doc_id::VARCHAR), 1, 8) <
                 printf('%08x',
                   CAST(round(p.frac * 4294967296.0) AS BIGINT))
           GROUP BY p.source, p.f)
         SELECT source, epoch::INT AS epoch, cnt FROM fulls
         UNION ALL SELECT source, epoch::INT, cnt FROM parts
         ORDER BY source, epoch""",
    "q_split" ->
      """SELECT doc_id, CASE WHEN h < 3435973837 THEN 'train'
                             WHEN h < 3865470566 THEN 'val'
                             ELSE 'test' END AS split
         FROM (SELECT doc_id,
             ('0x' || substr(md5('graft-r9' || doc_id), 1, 8))::BIGINT AS h
           FROM documents)
         ORDER BY doc_id""",
    "q_pack" ->
      """WITH d AS (SELECT doc_id, doc_id % 8 AS shard,
             len(string_split(trim(text), ' ')) AS n_tokens FROM documents),
         c AS (SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
               - n_tokens AS BIGINT) AS start_off
           FROM d)
         SELECT doc_id, shard, n_tokens, start_off,
           CAST(floor(start_off / 512.0) AS BIGINT) AS seq_id,
           CAST(start_off % 512 AS BIGINT) AS seq_off
         FROM c ORDER BY doc_id""",
    "q_pack_asm" ->
      """WITH d AS (SELECT doc_id, doc_id % 8 AS shard,
             string_split(trim(text), ' ') AS tk FROM documents),
         c AS (SELECT doc_id, shard, tk,
             CAST(sum(len(tk)) OVER (PARTITION BY shard ORDER BY doc_id)
               - len(tk) AS BIGINT) AS start_off
           FROM d),
         w AS (SELECT shard, tk, start_off,
             unnest(generate_series(1, len(tk)))::BIGINT AS i FROM c),
         t AS (SELECT shard, start_off + i - 1 AS off, tk[i] AS tok FROM w),
         s AS (SELECT shard, off // 512 AS seq_id, off % 512 AS o, tok
               FROM t)
         SELECT shard, seq_id, count(*)::BIGINT AS n_tokens,
           md5(string_agg(tok, ' ' ORDER BY o)) AS fp
         FROM s GROUP BY shard, seq_id ORDER BY shard, seq_id""",
    "q_dsir_weights" ->
      """WITH d AS (SELECT doc_id, lang,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         g AS (SELECT doc_id, lang, unnest(list_concat(tk,
                 CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                   ELSE list_transform(generate_series(1, len(tk)-1),
                          i -> tk[i] || ' ' || tk[i+1]) END)) AS ng
               FROM d),
         fb AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(ng), 1, 8))::BIGINT % 8192 AS f
                FROM g),
         rb AS (SELECT f, count(*)::BIGINT AS cnt_r FROM fb GROUP BY f),
         tb AS (SELECT f, count(*)::BIGINT AS cnt_t FROM fb
                WHERE lang = 'de' GROUP BY f),
         nr AS (SELECT coalesce(sum(cnt_r), 0)::BIGINT AS n_r FROM rb),
         nt AS (SELECT coalesce(sum(cnt_t), 0)::BIGINT AS n_t FROM tb),
         lr AS (SELECT rb.f,
                  ln((coalesce(tb.cnt_t, 0)::DOUBLE + 0.5)
                      / (nt.n_t::DOUBLE + 0.5 * 8192))
                  - ln((rb.cnt_r::DOUBLE + 0.5)
                      / (nr.n_r::DOUBLE + 0.5 * 8192)) AS lr
                FROM rb LEFT JOIN tb ON rb.f = tb.f, nr, nt),
         sc AS (SELECT fb.doc_id, count(*)::BIGINT AS n_feats,
                  floor(sum(lr.lr) * 1e6 + 0.5) / 1e6 AS iw
                FROM fb JOIN lr ON fb.f = lr.f GROUP BY fb.doc_id)
         SELECT d.doc_id, coalesce(sc.n_feats, 0)::BIGINT AS n_feats,
                coalesce(sc.iw, 0.0) AS iw
         FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id ORDER BY d.doc_id""",
    "q_dsir_sample" ->
      """WITH d AS (SELECT doc_id, lang,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         g AS (SELECT doc_id, lang, unnest(list_concat(tk,
                 CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                   ELSE list_transform(generate_series(1, len(tk)-1),
                          i -> tk[i] || ' ' || tk[i+1]) END)) AS ng
               FROM d),
         fb AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(ng), 1, 8))::BIGINT % 8192 AS f
                FROM g),
         rb AS (SELECT f, count(*)::BIGINT AS cnt_r FROM fb GROUP BY f),
         tb AS (SELECT f, count(*)::BIGINT AS cnt_t FROM fb
                WHERE lang = 'de' GROUP BY f),
         nr AS (SELECT coalesce(sum(cnt_r), 0)::BIGINT AS n_r FROM rb),
         nt AS (SELECT coalesce(sum(cnt_t), 0)::BIGINT AS n_t FROM tb),
         lr AS (SELECT rb.f,
                  ln((coalesce(tb.cnt_t, 0)::DOUBLE + 0.5)
                      / (nt.n_t::DOUBLE + 0.5 * 8192))
                  - ln((rb.cnt_r::DOUBLE + 0.5)
                      / (nr.n_r::DOUBLE + 0.5 * 8192)) AS lr
                FROM rb LEFT JOIN tb ON rb.f = tb.f, nr, nt),
         sc AS (SELECT fb.doc_id, count(*)::BIGINT AS n_feats,
                  floor(sum(lr.lr) * 1e6 + 0.5) / 1e6 AS iw
                FROM fb JOIN lr ON fb.f = lr.f GROUP BY fb.doc_id),
         w AS (SELECT d.doc_id, coalesce(sc.iw, 0.0) AS iw
               FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id),
         keyed AS (SELECT doc_id, iw,
                 iw - ln(-ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                               + 0.5) / 4294967296.0)) AS key
               FROM w),
         t AS (SELECT doc_id, iw, key FROM keyed
               ORDER BY key DESC, doc_id LIMIT 40)
         SELECT doc_id, iw, floor(key * 1e6 + 0.5) / 1e6 AS sample_key
         FROM t ORDER BY sample_key DESC, doc_id""",
    // hashed-ngram Naive Bayes replay: per-class bucket histograms +
    // add-α log-odds + doc-count prior, scored per occurrence
    "q_nb_quality" ->
      """WITH d AS (SELECT doc_id, (lang = 'en')::INT AS y,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         g AS (SELECT doc_id, y, unnest(list_concat(tk,
                 CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                   ELSE list_transform(generate_series(1, len(tk)-1),
                          i -> tk[i] || ' ' || tk[i+1]) END)) AS ng
               FROM d),
         fb AS (SELECT doc_id, y,
                  ('0x' || substr(md5(ng), 1, 8))::BIGINT % 8192 AS f
                FROM g),
         cp AS (SELECT f, count(*)::BIGINT AS c FROM fb WHERE y = 1 GROUP BY f),
         cn AS (SELECT f, count(*)::BIGINT AS c FROM fb WHERE y = 0 GROUP BY f),
         np AS (SELECT coalesce(sum(c), 0)::BIGINT AS n FROM cp),
         nn AS (SELECT coalesce(sum(c), 0)::BIGINT AS n FROM cn),
         allf AS (SELECT DISTINCT f FROM fb),
         w AS (SELECT allf.f,
                 ln((coalesce(cp.c, 0)::DOUBLE + 0.5)
                     / (np.n::DOUBLE + 0.5 * 8192))
               - ln((coalesce(cn.c, 0)::DOUBLE + 0.5)
                     / (nn.n::DOUBLE + 0.5 * 8192)) AS w
               FROM allf LEFT JOIN cp ON allf.f = cp.f
                         LEFT JOIN cn ON allf.f = cn.f, np, nn),
         prior AS (SELECT ln(sum((y = 1)::INT)::DOUBLE
                           / sum((y = 0)::INT)::DOUBLE) AS b FROM d),
         sc AS (SELECT fb.doc_id, count(*)::BIGINT AS n_feats,
                  sum(w.w) AS s
                FROM fb JOIN w ON fb.f = w.f GROUP BY fb.doc_id)
         SELECT d.doc_id, coalesce(sc.n_feats, 0)::BIGINT AS n_feats,
           floor((coalesce(sc.s, 0.0) + prior.b) * 1e6 + 0.5) / 1e6 AS score,
           (floor((coalesce(sc.s, 0.0) + prior.b) * 1e6 + 0.5) / 1e6
             > 0)::INT AS pred
         FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id, prior
         ORDER BY d.doc_id""",
    // NB score replay + Mann-Whitney average-rank AUC
    "q_auc" ->
      """WITH d AS (SELECT doc_id, (lang = 'en')::INT AS y,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         g AS (SELECT doc_id, y, unnest(list_concat(tk,
                 CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                   ELSE list_transform(generate_series(1, len(tk)-1),
                          i -> tk[i] || ' ' || tk[i+1]) END)) AS ng
               FROM d),
         fb AS (SELECT doc_id, y,
                  ('0x' || substr(md5(ng), 1, 8))::BIGINT % 8192 AS f
                FROM g),
         cp AS (SELECT f, count(*)::BIGINT AS c FROM fb WHERE y = 1 GROUP BY f),
         cn AS (SELECT f, count(*)::BIGINT AS c FROM fb WHERE y = 0 GROUP BY f),
         np AS (SELECT coalesce(sum(c), 0)::BIGINT AS n FROM cp),
         nn AS (SELECT coalesce(sum(c), 0)::BIGINT AS n FROM cn),
         allf AS (SELECT DISTINCT f FROM fb),
         w AS (SELECT allf.f,
                 ln((coalesce(cp.c, 0)::DOUBLE + 0.5)
                     / (np.n::DOUBLE + 0.5 * 8192))
               - ln((coalesce(cn.c, 0)::DOUBLE + 0.5)
                     / (nn.n::DOUBLE + 0.5 * 8192)) AS w
               FROM allf LEFT JOIN cp ON allf.f = cp.f
                         LEFT JOIN cn ON allf.f = cn.f, np, nn),
         prior AS (SELECT ln(sum((y = 1)::INT)::DOUBLE
                           / sum((y = 0)::INT)::DOUBLE) AS b FROM d),
         sc AS (SELECT fb.doc_id, sum(w.w) AS s
                FROM fb JOIN w ON fb.f = w.f GROUP BY fb.doc_id),
         fl AS (SELECT d.doc_id, d.y,
                    floor((coalesce(sc.s, 0.0) + prior.b) * 1e6 + 0.5) / 1e6
                      AS score
                  FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id, prior),
         rk AS (SELECT doc_id, y, score,
                  row_number() OVER (ORDER BY score, doc_id) AS r FROM fl),
         ar AS (SELECT score, avg(r) AS ar FROM rk GROUP BY score),
         j AS (SELECT rk.y, ar.ar FROM rk JOIN ar ON rk.score = ar.score),
         agg AS (SELECT sum(y)::BIGINT AS n_pos, sum(1 - y)::BIGINT AS n_neg,
                   sum(CASE WHEN y = 1 THEN ar END) AS srp FROM j)
         SELECT n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             floor((srp - n_pos::DOUBLE * (n_pos + 1) / 2)
               / (n_pos::DOUBLE * n_neg) * 1e6 + 0.5) / 1e6
           END AS auc
         FROM agg""",
    // NB score replay + threshold confusion counts and rates
    "q_confusion" ->
      """WITH d AS (SELECT doc_id, (lang = 'en')::INT AS y,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         g AS (SELECT doc_id, y, unnest(list_concat(tk,
                 CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                   ELSE list_transform(generate_series(1, len(tk)-1),
                          i -> tk[i] || ' ' || tk[i+1]) END)) AS ng
               FROM d),
         fb AS (SELECT doc_id, y,
                  ('0x' || substr(md5(ng), 1, 8))::BIGINT % 8192 AS f
                FROM g),
         cp AS (SELECT f, count(*)::BIGINT AS c FROM fb WHERE y = 1 GROUP BY f),
         cn AS (SELECT f, count(*)::BIGINT AS c FROM fb WHERE y = 0 GROUP BY f),
         np AS (SELECT coalesce(sum(c), 0)::BIGINT AS n FROM cp),
         nn AS (SELECT coalesce(sum(c), 0)::BIGINT AS n FROM cn),
         allf AS (SELECT DISTINCT f FROM fb),
         w AS (SELECT allf.f,
                 ln((coalesce(cp.c, 0)::DOUBLE + 0.5)
                     / (np.n::DOUBLE + 0.5 * 8192))
               - ln((coalesce(cn.c, 0)::DOUBLE + 0.5)
                     / (nn.n::DOUBLE + 0.5 * 8192)) AS w
               FROM allf LEFT JOIN cp ON allf.f = cp.f
                         LEFT JOIN cn ON allf.f = cn.f, np, nn),
         prior AS (SELECT ln(sum((y = 1)::INT)::DOUBLE
                           / sum((y = 0)::INT)::DOUBLE) AS b FROM d),
         sc AS (SELECT fb.doc_id, sum(w.w) AS s
                FROM fb JOIN w ON fb.f = w.f GROUP BY fb.doc_id),
         fl AS (SELECT d.doc_id, d.y,
                    floor((coalesce(sc.s, 0.0) + prior.b) * 1e6 + 0.5) / 1e6
                      AS score
                  FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id, prior),
         cm AS (SELECT
             count(CASE WHEN score > 0 AND y = 1 THEN 1 END)::BIGINT AS tp,
             count(CASE WHEN score > 0 AND y = 0 THEN 1 END)::BIGINT AS fp,
             count(CASE WHEN score <= 0 AND y = 1 THEN 1 END)::BIGINT AS fn,
             count(CASE WHEN score <= 0 AND y = 0 THEN 1 END)::BIGINT AS tn
           FROM fl),
         r AS (SELECT tp, fp, fn, tn,
             CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp) END AS prec,
             CASE WHEN tp + fn > 0 THEN tp::DOUBLE / (tp + fn) END AS rec
           FROM cm)
         SELECT tp, fp, fn, tn,
           floor((tp + tn)::DOUBLE / (tp + fp + fn + tn) * 1e6 + 0.5) / 1e6
             AS accuracy,
           floor(prec * 1e6 + 0.5) / 1e6 AS precision,
           floor(rec * 1e6 + 0.5) / 1e6 AS recall,
           CASE WHEN prec + rec > 0 THEN
             floor(2.0 * prec * rec / (prec + rec) * 1e6 + 0.5) / 1e6
           END AS f1
         FROM r""",
    // NB score replay + rounded-probability decile bins
    "q_calibration" ->
      """WITH d AS (SELECT doc_id, (lang = 'en')::INT AS y,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         g AS (SELECT doc_id, y, unnest(list_concat(tk,
                 CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                   ELSE list_transform(generate_series(1, len(tk)-1),
                          i -> tk[i] || ' ' || tk[i+1]) END)) AS ng
               FROM d),
         fb AS (SELECT doc_id, y,
                  ('0x' || substr(md5(ng), 1, 8))::BIGINT % 8192 AS f
                FROM g),
         cp AS (SELECT f, count(*)::BIGINT AS c FROM fb WHERE y = 1 GROUP BY f),
         cn AS (SELECT f, count(*)::BIGINT AS c FROM fb WHERE y = 0 GROUP BY f),
         np AS (SELECT coalesce(sum(c), 0)::BIGINT AS n FROM cp),
         nn AS (SELECT coalesce(sum(c), 0)::BIGINT AS n FROM cn),
         allf AS (SELECT DISTINCT f FROM fb),
         w AS (SELECT allf.f,
                 ln((coalesce(cp.c, 0)::DOUBLE + 0.5)
                     / (np.n::DOUBLE + 0.5 * 8192))
               - ln((coalesce(cn.c, 0)::DOUBLE + 0.5)
                     / (nn.n::DOUBLE + 0.5 * 8192)) AS w
               FROM allf LEFT JOIN cp ON allf.f = cp.f
                         LEFT JOIN cn ON allf.f = cn.f, np, nn),
         prior AS (SELECT ln(sum((y = 1)::INT)::DOUBLE
                           / sum((y = 0)::INT)::DOUBLE) AS b FROM d),
         sc AS (SELECT fb.doc_id, sum(w.w) AS s
                FROM fb JOIN w ON fb.f = w.f GROUP BY fb.doc_id),
         fl AS (SELECT d.doc_id, d.y,
                    floor((coalesce(sc.s, 0.0) + prior.b) * 1e6 + 0.5) / 1e6
                      AS score
                  FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id, prior),
         pb AS (SELECT y,
                  floor((1.0 / (1.0 + exp(-score))) * 1e6 + 0.5) / 1e6 AS p
                FROM fl),
         bb AS (SELECT least(floor(p * 10), 9)::INT AS bin, p, y FROM pb)
         SELECT bin, count(*)::BIGINT AS n,
           floor(avg(p) * 1e6 + 0.5) / 1e6 AS mean_prob,
           floor(avg(y::DOUBLE) * 1e6 + 0.5) / 1e6 AS frac_pos
         FROM bb GROUP BY bin ORDER BY bin""",
    // one logistic GD step from zero init: σ(0)=½ makes the step closed
    // form — w_j = lr/n·Σ_d (y_d−½)·c_d(j), bias = lr/n·Σ_d (y_d−½)
    "q_lr_step" ->
      """WITH d AS (SELECT doc_id, (lang = 'en')::INT AS y,
             string_split(lower(trim(text)), ' ') AS tk FROM documents),
         g AS (SELECT doc_id, y, unnest(list_concat(tk,
                 CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                   ELSE list_transform(generate_series(1, len(tk)-1),
                          i -> tk[i] || ' ' || tk[i+1]) END)) AS ng
               FROM d),
         fb AS (SELECT doc_id, y,
                  ('0x' || substr(md5(ng), 1, 8))::BIGINT % 8192 AS f
                FROM g),
         n AS (SELECT count(*)::DOUBLE AS n FROM d),
         w AS (SELECT f, sum(y::DOUBLE - 0.5) * 0.5 / any_value(n.n) AS w
               FROM fb, n GROUP BY f),
         b AS (SELECT sum(y::DOUBLE - 0.5) * 0.5 / any_value(n.n) AS b
               FROM d, n),
         sc AS (SELECT fb.doc_id, count(*)::BIGINT AS n_feats,
                  sum(w.w) AS s
                FROM fb JOIN w ON fb.f = w.f GROUP BY fb.doc_id)
         SELECT d.doc_id, coalesce(sc.n_feats, 0)::BIGINT AS n_feats,
           floor((coalesce(sc.s, 0.0) + b.b) * 1e6 + 0.5) / 1e6 AS score,
           (floor((coalesce(sc.s, 0.0) + b.b) * 1e6 + 0.5) / 1e6
             > 0)::INT AS pred
         FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id, b
         ORDER BY d.doc_id""",
    "q_mix_temp" ->
      """WITH per AS (SELECT source,
             sum(len(string_split(trim(text), ' ')))::BIGINT AS n_tokens
           FROM documents GROUP BY source),
         tot AS (SELECT sum(n_tokens)::BIGINT AS t FROM per),
         pa AS (SELECT source, n_tokens,
                  pow(n_tokens::DOUBLE / t::DOUBLE, 0.5) AS pa
                FROM per, tot),
         qs AS (SELECT sum(pa) AS qsum FROM pa)
         SELECT source, n_tokens,
           floor(pa / qsum * 1e6 + 0.5) / 1e6 AS q_weight,
           floor(least(1.0, 20000.0 * (pa / qsum) / n_tokens::DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS keep_rate
         FROM pa, qs ORDER BY source""",
    "q_mix" ->
      """WITH per AS (SELECT source, count(*)::BIGINT AS n_docs,
             sum(len(string_split(trim(text), ' ')))::BIGINT AS n_tokens
           FROM documents GROUP BY source),
         tot AS (SELECT sum(n_tokens)::BIGINT AS total FROM per)
         SELECT source, n_docs, n_tokens,
           floor((n_tokens::DOUBLE / total::DOUBLE) * 1e6 + 0.5) / 1e6
             AS token_share
         FROM per, tot ORDER BY source""",
  )
}
