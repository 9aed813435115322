package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import EntryHelpers._

/** Profiling, drift and data-quality contract queries + their DuckDB oracles, kept ADJACENT per
  * family (split from the former 5k-line SparkEntry maps — round-9
  * verdict #7: a mis-paired oracle edit was a 5k-line scroll).
  * [[SparkEntry]] aggregates every family and asserts name uniqueness. */
private[graft] object ProfilingEntries {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // Welch's t between click and view event values: one corpus pass,
    // statistic + Welch-Satterthwaite df as column arithmetic
    "q_welch" -> ((s, dir) => pipeline.Profiling.welchT(
      t(s, dir, "events"), "value", "event_type", "click", "view")),
    // per-group top-k without a global sort (row_number window)
    // 2-D skyline of lineitem: cheapest-yet-largest frontier under
    // (min l_extendedprice, max l_quantity); exact sort-based distributed
    // shape, oracle via the independent window formulation
    "q_skyline" -> ((s, dir) =>
      pipeline.Skyline.skyline2D(t(s, dir, "lineitem"),
        "l_extendedprice", "l_quantity")
        .orderBy("l_extendedprice")),
    // 3-D skyline of part: (min retailprice, max size, max name length);
    // per-partition SFS + bounded merge, brute-force dominance oracle
    "q_skyline3" -> ((s, dir) =>
      pipeline.Skyline.skylineND(
        t(s, dir, "part").withColumn("name_len", length(col("p_name"))),
        minimizeCols = Seq("p_retailprice"),
        maximizeCols = Seq("p_size", "name_len"))
        .orderBy("p_retailprice", "p_size", "name_len")),
    // one-pass column profiling (count/nulls/min/max/mean/exact-median
    // for every column in a single aggregate). describe also emits an
    // HLL approx_distinct — dropped here because a sketch estimate is
    // not SQL-replayable; q_cardinality_gate certifies it instead
    "q_profile" -> ((s, dir) =>
      pipeline.Profiling.describe(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .select("column", "n", "n_null", "min", "max", "mean", "median")
        .orderBy("column")),
    // exact canary/blocklist scan: one broadcast Aho-Corasick automaton,
    // O(text) per doc regardless of pattern count, zero shuffle
    "q_canary" -> ((s, dir) =>
      pipeline.Dedup.canaryScan(t(s, dir, "documents"), "text", "doc_id",
        Seq("table table", "merge batch", "slow fast",
          "canary-guid-8f2a"))
        .orderBy("doc_id", "pattern")),
    // snapshot diff: added/removed/changed/unchanged between two keyed
    // corpus versions; the join carries (key, 8-byte digest), never text
    // CDC merge: apply a keyed upsert/delete batch to the snapshot —
    // deletes on doc_id%10==0; doc_id%10==5 gets a delete at seq 1
    // superseded by an upsert at seq 2 (latest-wins proof)
    "q_cdc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val dels = docs
        .filter(col("doc_id") % 10 === 0 || col("doc_id") % 10 === 5)
        .withColumn("seq", lit(1L)).withColumn("op", lit("d"))
      val ups = docs.filter(col("doc_id") % 10 === 5)
        .withColumn("text", concat(lit("updated "), col("text")))
        .withColumn("seq", lit(2L)).withColumn("op", lit("u"))
      pipeline.Cdc.applyChanges(docs, dels.unionByName(ups),
        "doc_id", "seq", "op")
        .orderBy("doc_id")
    }),
    "q_snapshot_diff" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val a = d.filter(col("doc_id") < 400).select("doc_id", "text")
      val b = d.filter(col("doc_id") >= 100)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, upper(col("text")))
            .otherwise(col("text")).alias("text"))
      pipeline.Dedup.snapshotDiffSummary(a, b, "doc_id", Seq("text"))
        .orderBy("status")
    }),
    // drift screen: every source's PSI against the rest of the corpus,
    // one scan (the "which source moved" report)
    "q_psi_by" -> ((s, dir) =>
      pipeline.Profiling.psiBySlice(t(s, dir, "documents"),
        "n_chars", "source", lo = 0.0, hi = 600.0, bins = 8)
        .orderBy("slice")),
    // per-slice exact KS screen (bounded value domain): each source's
    // sup-CDF-gap vs the rest, on the slice x distinct-value grid
    "q_ks_by" -> ((s, dir) =>
      pipeline.Profiling.ksBySlice(t(s, dir, "documents"),
        "n_chars", "source")
        .orderBy("slice")),
    // exact two-sample KS statistic (binning-free drift): distributed
    // CDFs via range partitions + broadcast prefix offsets, no global
    // window
    "q_ks" -> ((s, dir) =>
      pipeline.Profiling.ksStatistic(t(s, dir, "documents"),
        "n_chars", "source", "src0", "src1")),
    // categorical drift: language-mix PSI between two corpus slices
    "q_cat_drift" -> ((s, dir) =>
      pipeline.Profiling.categoricalDrift(t(s, dir, "documents"),
        "lang", "source", "src0", "src1")
        .orderBy("category")),
    // wide reshaping: doc counts per source pivoted across the language
    // set (explicit value list keeps the schema deterministic)
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "documents").groupBy(col("source"))
        .pivot("lang", Seq("de", "en", "es", "fr", "zh")).count()
        .na.fill(0L)
        .orderBy("source")),
    // mutual information lang↔source: the dependence/leakage screen —
    // one contingency aggregate, all reductions on the bounded table
    "q_mi" -> ((s, dir) =>
      pipeline.Profiling.mutualInformation(t(s, dir, "documents"),
        "lang", "source")),
    // pairwise Pearson correlation, all 6 pairs in ONE aggregate pass
    // (constant per-pair state; no per-pair job, no collect)
    "q_corr" -> ((s, dir) =>
      pipeline.Profiling.correlationMatrix(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_x", "col_y")),
    // PSI drift between two corpus slices: one scan, per-(bin,side)
    // counts collapse map-side, totals broadcast — nothing data-sized
    "q_psi" -> ((s, dir) =>
      pipeline.Profiling.psiReport(t(s, dir, "documents"),
        "n_chars", "source", "src0", "src1",
        lo = 0.0, hi = 600.0, bins = 8)
        .orderBy("bin")),
    // cardinality gate: describe's HLL approx_distinct (rsd 1%) must
    // land within 2% of the exact distinct count per column — spans
    // three decades of true cardinality (l_discount 11, l_quantity 50,
    // l_partkey ~2k at sf0.01). Booleans pinned by the oracle.
    "q_cardinality_gate" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val cols = Seq("l_quantity", "l_discount", "l_partkey")
      val approx = pipeline.Profiling.describe(li, cols)
        .select(col("column"), col("approx_distinct"))
      // exact side: one aggregate, unpivoted in-plan like describe
      val exAggs = cols.map(c =>
        countDistinct(col(c)).alias(s"__ex_$c"))
      val exact = li.agg(exAggs.head, exAggs.tail: _*)
        .select(explode(array(cols.map(c => struct(lit(c).alias("column"),
          col(s"__ex_$c").alias("ex"))): _*)).alias("s"))
        .select(col("s.*"))
      approx.join(exact, "column")
        .select(col("column"),
          (abs(col("approx_distinct") - col("ex")) <= col("ex") * 0.02)
            .alias("within_tol"))
        .orderBy("column")
    }),
    // exact top-k frequent values: the skew probe (which hot keys need
    // salting/isolation) — deterministic count-desc value-asc order, so
    // the oracle replays it exactly
    "q_top_values" -> ((s, dir) =>
      pipeline.Profiling.topValues(t(s, dir, "lineitem"), "l_quantity", 5)
        .select(col("value").cast("double").alias("value"), col("cnt"))),
    // approximate top-k frequent values — the bounded-state scale path
    // (native approx_top_k sketch, no value-keyed shuffle). On a
    // ≤maxItemsTracked-cardinality column the sketch never evicts, so
    // counts are EXACT and the oracle replays the exact SQL
    "q_top_values_approx" -> ((s, dir) =>
      pipeline.Profiling.approxTopValues(t(s, dir, "lineitem"),
        "l_quantity", 5)
        .limit(5)
        .select(col("value").cast("double").alias("value"),
          col("cnt").cast("long").alias("cnt"))),
    // grouped top-k frequent values: the per-join-key hot-value probe
    // (which values of each key need salting) — exact, deterministic
    // (count desc, value asc), replayed by the oracle's window
    "q_top_values_by" -> ((s, dir) =>
      pipeline.Profiling.topValuesBy(t(s, dir, "lineitem"),
        Seq("l_returnflag"), "l_quantity", k = 3)
        .select(col("l_returnflag"), col("value").cast("double").alias("value"),
          col("cnt"), col("rn"))
        .orderBy("l_returnflag", "rn")),
    // grouped approximate top-k — one bounded sketch per group instead
    // of a (group, value)-keyed aggregate; exact below sketch capacity,
    // so the oracle is the same exact window as q_top_values_by
    "q_top_values_by_approx" -> ((s, dir) =>
      pipeline.Profiling.approxTopValuesBy(t(s, dir, "lineitem"),
        Seq("l_returnflag"), "l_quantity", k = 3)
        .select(col("l_returnflag"), col("value").cast("double").alias("value"),
          col("cnt").cast("long").alias("cnt"), col("rn"))
        .orderBy("l_returnflag", "rn")),
    // equi-width histogram: exact per-bucket counts over the price
    // column (two bounded aggregate passes; empty buckets emitted)
    "q_histogram" -> ((s, dir) =>
      pipeline.Profiling.histogram(t(s, dir, "lineitem"),
        "l_extendedprice", bins = 16)
        .orderBy("bucket")),
    // exact quantiles, long form, one aggregate pass (Spark percentile
    // interpolates like DuckDB quantile_cont — oracle-exact). Bounded-
    // cardinality columns BY CONTRACT: the exact aggregate's buffer is a
    // value→count map, so unbounded columns (prices at corpus scale)
    // belong to approxQuantiles — q_quantiles_gate checks that path
    "q_quantiles" -> ((s, dir) =>
      pipeline.Profiling.exactQuantiles(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_discount"), Seq(0.25, 0.5, 0.75, 0.99))
        .orderBy("column", "p")),
    // grouped exact quantiles: per-group distribution probe (the
    // mixing-decision input), one hash aggregate on the group key
    "q_quantiles_by" -> ((s, dir) =>
      pipeline.Profiling.exactQuantilesBy(t(s, dir, "lineitem"),
        Seq("l_returnflag"), Seq("l_quantity"), Seq(0.5, 0.9))
        .orderBy("l_returnflag", "column", "p")),
    // robust per-language length outliers: median/MAD z — resistant to
    // the outliers it hunts; two bounded aggregates broadcast back
    "q_mad" -> ((s, dir) =>
      pipeline.Profiling.madOutliersBy(t(s, dir, "documents"), "n_chars",
        "lang", z = 3.5)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("med"),
          col("mad"), col("robust_z"), col("is_outlier"))
        .orderBy("doc_id")),
    // per-language winsorization of document length: clip to the
    // group's exact p05/p95 — bounded cut table broadcast back, the
    // corpus never shuffles
    "q_winsor" -> ((s, dir) =>
      pipeline.Profiling.winsorizeBy(t(s, dir, "documents"), "n_chars",
        "lang", lo = 0.05, hi = 0.95)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("lo"), col("hi"), col("clipped"))
        .orderBy("doc_id")),
    // approx-quantile gate: the bounded-state sketch path must honor its
    // ACTUAL contract — approx_percentile guarantees a RANK error
    // ≤ 1/accuracy, not a value error. For each probe point the returned
    // value's empirical rank interval [count(<v), count(≤v)]/n must
    // cover p within eps; a value-relative tolerance would flake on
    // near-zero quantiles and certify the wrong thing. Booleans pinned
    // by the oracle, recall-gate style — approx results are not
    // SQL-replayable, their error bound is.
    "q_quantiles_gate" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val cols = Seq("l_quantity", "l_discount")
      val ps = Seq(0.25, 0.5, 0.75, 0.99)
      val ap = pipeline.Profiling.approxQuantiles(li, cols, ps)
        .withColumnRenamed("q", "q_ap")
      // long form (column, x): ONE scan serves every probe point
      val long = li.select(explode(array(cols.map(c =>
          struct(lit(c).alias("column"),
            col(c).cast("double").alias("x"))): _*)).alias("s"))
        .select(col("s.*"))
      val eps = 1.0 / 10000 + 1e-9 // the sketch's own accuracy bound
      long.join(broadcast(ap), Seq("column"))
        .groupBy(col("column"), col("p"))
        .agg(
          (sum(when(col("x") < col("q_ap"), 1L).otherwise(0L)) /
            count(lit(1))).alias("r_lo"),
          (sum(when(col("x") <= col("q_ap"), 1L).otherwise(0L)) /
            count(lit(1))).alias("r_hi"))
        .select(col("column"), col("p"),
          (col("r_lo") - eps <= col("p") &&
            col("p") <= col("r_hi") + eps).alias("within_tol"))
        .orderBy("column", "p")
    }),
    // grouped approx-quantile gate: same rank-interval contract but per
    // (l_returnflag, column, p) — certifies approxQuantilesBy, the
    // unbounded-domain path for per-source mixing decisions
    "q_quantiles_by_gate" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ps = Seq(0.25, 0.5, 0.9)
      val ap = pipeline.Profiling.approxQuantilesBy(li, Seq("l_returnflag"),
        Seq("l_quantity"), ps).withColumnRenamed("q", "q_ap")
      val eps = 1.0 / 10000 + 1e-9
      li.select(col("l_returnflag"), col("l_quantity").cast("double").alias("x"))
        .join(broadcast(ap), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"), col("column"), col("p"))
        .agg(
          (sum(when(col("x") < col("q_ap"), 1L).otherwise(0L)) /
            count(lit(1))).alias("r_lo"),
          (sum(when(col("x") <= col("q_ap"), 1L).otherwise(0L)) /
            count(lit(1))).alias("r_hi"))
        .select(col("l_returnflag"), col("column"), col("p"),
          (col("r_lo") - eps <= col("p") &&
            col("p") <= col("r_hi") + eps).alias("within_tol"))
        .orderBy("l_returnflag", "column", "p")
    }),
    // schema-drift audit (pure metadata, no scan): a refresh with one
    // column dropped, one narrowed, one added
    "q_schema_diff" -> ((s, dir) => {
      val a = t(s, dir, "documents")
      val b = a.drop("lang")
        .withColumn("n_chars", col("n_chars").cast("int"))
        .withColumn("extra", lit(1L))
      pipeline.Profiling.schemaDiff(a, b)
        .select("column", "status").orderBy("column")
    }),
    // Benford first-digit audit over order totals (integral magnitude)
    "q_benford" -> ((s, dir) =>
      pipeline.Profiling.benford(t(s, dir, "orders"), "o_totalprice")
        .orderBy("digit")),
    // referential-integrity audit: orphans of lineitem→orders under a
    // deliberately truncated parent (every third order dropped)
    "q_orphans" -> ((s, dir) =>
      pipeline.Profiling.orphans(
        t(s, dir, "lineitem"),
        t(s, dir, "orders").filter(col("o_orderkey") % 3 =!= 0),
        "l_orderkey", "o_orderkey")),
    // event-order audit: violations of ts monotonicity per user against
    // a deterministic md5-permuted arrival order (the raw feed is
    // perfectly ordered — the permutation exercises the check)
    "q_order_viol" -> ((s, dir) => pipeline.Profiling.orderViolations(
      t(s, dir, "events").withColumn("arr",
        md5(col("event_id").cast("string"))),
      "user_id", "ts", "arr")
      .filter(col("user_id") < 30)
      .orderBy("user_id")),
    // Freedman-Diaconis auto-binned histogram of document lengths
    "q_autohist" -> ((s, dir) =>
      pipeline.Profiling.autoHistogram(t(s, dir, "documents"), "n_chars")
        .orderBy("bucket")),
    // mergeable HLL distinct sketches: per-lang sketches of doc_id,
    // unioned WITHOUT rescanning the corpus, land within 5% of the exact
    // count (the union answers with the composite estimator — the HIP
    // estimator doesn't survive a merge — so it's gated against the
    // exact count, not against the direct sketch); the direct
    // single-pass sketch at lgK 14 is gated at its 3σ bound
    // 3·1.04/√2¹⁴ ≈ 2.5% (a 1% gate on lgK 12, RSE 1.6%, is a coin
    // flip once the cardinality leaves sparse mode — it failed at
    // sf0.1's 5000 ids with a 1.12% error while sf0.01's 500 ids were
    // sparse-exact). The incremental profiling shape: per-partition
    // sketches persist as a few KB of binary each
    "q_hll_gate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merged = pipeline.Profiling.unionSketchEstimate(
          pipeline.Profiling.distinctSketches(docs, Seq("lang"), "doc_id"))
        .select(col("estimate").alias("__m"))
      val direct = docs.agg(hll_sketch_estimate(
        hll_sketch_agg(col("doc_id"), lit(14))).alias("__d"))
      docs.agg(countDistinct(col("doc_id")).alias("n_exact"))
        .crossJoin(merged).crossJoin(direct)
        .select(col("n_exact"),
          (abs(col("__d") - col("n_exact")) <= col("n_exact") * lit(0.025))
            .alias("direct_within_3sigma"),
          (abs(col("__m") - col("n_exact")) <= col("n_exact") * lit(0.05))
            .alias("merged_within_5pct"))
    }),
    // mergeable count-min frequency sketches: per-lang CMS over the
    // source column; merged point estimates must EQUAL the single-pass
    // sketch (CMS merge is lossless — cells add) and bound the exact
    // count from above within eps*N. One sketch per group crosses the
    // driver, never the data
    "q_cms_gate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exact = docs.groupBy(col("source").alias("value"))
        .agg(count(lit(1)).alias("n_true"))
      val probes = exact.select("value").collect()
        .map(_.getString(0)).toSeq.sorted
      val m = pipeline.Profiling.cmsEstimates(
        pipeline.Profiling.freqSketches(docs, Seq("lang"), "source"), probes)
      val d = pipeline.Profiling.cmsEstimates(
        pipeline.Profiling.freqSketches(
          docs.withColumn("__g", lit(1)), Seq("__g"), "source"), probes)
      val slack = math.ceil(0.01 * docs.count()).toLong
      import s.implicits._
      probes.map(p => (p, m(p), d(p))).toDF("value", "__m", "__d")
        .join(exact, "value")
        .select(col("value"), col("n_true"),
          (col("__m") === col("__d")).alias("merge_eq"),
          (col("__m") >= col("n_true") &&
            col("__m") <= col("n_true") + slack).alias("bounds_ok"))
        .orderBy("value")
    }),
    // robust vs raw location per language: trimmed (winsorized) mean
    // against the plain mean — the outlier-sensitivity gap
    "q_trimmed" -> ((s, dir) =>
      pipeline.Profiling.winsorizeBy(t(s, dir, "documents"), "n_chars",
        "lang", lo = 0.05, hi = 0.95)
        .groupBy(col("lang"))
        .agg(count(lit(1)).alias("n"),
          pipeline.Rounding.halfUp(avg(col("n_chars").cast("double")), 6)
            .alias("raw_mean"),
          pipeline.Rounding.halfUp(avg(col("clipped")), 6)
            .alias("trimmed_mean"))
        .orderBy("lang")),
    // semi-structured props: JSON field extraction + per-type stats
    // (get_json_object is a per-row expression — scan-parallel)
    "q_props" -> ((s, dir) =>
      t(s, dir, "events").select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").alias("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).alias("n"),
          pipeline.Rounding.halfUp(avg(col("k")), 6).alias("avg_k"),
          min(col("k")).alias("min_k"), max(col("k")).alias("max_k"))
        .orderBy("event_type")),
    // multi-granularity rollup: doc counts at (lang, source), per-lang
    // subtotals, and the grand total in ONE pass (grouping-sets
    // partial-aggregate expansion)
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "documents").rollup(col("lang"), col("source"))
        .agg(count(lit(1)).alias("n_docs"),
          grouping_id(col("lang"), col("source")).alias("gid"))
        .orderBy(col("gid"), col("lang").asc_nulls_last,
          col("source").asc_nulls_last)),
    // Pareto coverage: sources ranked by token volume, cumulative
    // share, and the minimal-80%-head flag (bounded source table)
    "q_pareto" -> ((s, dir) =>
      pipeline.Mixing.paretoReport(t(s, dir, "documents"), "text", "source")
        .orderBy("rank")),
    // mixture concentration: HHI over token shares + effective source
    // count + top source — the "is this mix diverse" one-liner
    "q_hhi" -> ((s, dir) =>
      pipeline.Mixing.concentrationReport(t(s, dir, "documents"),
        "text", "source")),
    // candidate-key audit: is (doc_id) actually unique, and is the
    // (user_id, ts, event_id) event key intact after ingest
    "q_keyuniq" -> ((s, dir) =>
      pipeline.Profiling.keyUniqueness(t(s, dir, "documents"),
        Seq("doc_id"))
        .unionByName(pipeline.Profiling.keyUniqueness(
          t(s, dir, "events"), Seq("event_id")))
        .orderBy("n_rows")),
    // within-language length percentile per document (percent_rank,
    // ties share) — the filter-by-relative-position annotation
    "q_pctrank" -> ((s, dir) =>
      pipeline.Profiling.percentileRankBy(
        t(s, dir, "documents").select(col("doc_id"), col("lang"),
          col("n_chars")), "n_chars", "lang")
        .orderBy("doc_id")),
    // k-anonymity audit on (lang, source) quasi-identifiers: population
    // per combination + re-identification risk flag at k=5
    "q_kanon" -> ((s, dir) =>
      pipeline.Profiling.kAnonymity(t(s, dir, "documents"),
        Seq("lang", "source"), k = 5)
        .orderBy("lang", "source")),
  )

  val oracles: Seq[(String, String)] = Seq(
    "q_autohist" ->
      """WITH st AS (SELECT count(*)::BIGINT AS n,
             min(n_chars::DOUBLE) AS mn, max(n_chars::DOUBLE) AS mx,
             quantile_cont(n_chars::DOUBLE, 0.75)
               - quantile_cont(n_chars::DOUBLE, 0.25) AS iqr
           FROM documents),
         p AS (SELECT 2.0 * iqr / pow(n::DOUBLE, 1.0 / 3) AS w, mn, mx,
                 CASE WHEN iqr > 0 AND mx > mn
                   THEN ceil((mx - mn) / (2.0 * iqr / pow(n::DOUBLE, 1.0 / 3)))
                   ELSE 1 END AS nb
               FROM st),
         b AS (SELECT CASE WHEN p.nb > 1 THEN
                 least(floor((d.n_chars::DOUBLE - p.mn) / p.w), p.nb - 1)
                 ELSE 0 END::BIGINT AS bucket, p.mn, p.nb, p.w
               FROM documents d, p),
         g AS (SELECT bucket, mn, nb, w, count(*)::BIGINT AS cnt
               FROM b GROUP BY bucket, mn, nb, w)
         SELECT bucket,
           floor((CASE WHEN nb > 1 THEN mn + bucket * w ELSE mn END)
             * 1e6 + 0.5) / 1e6 AS lo,
           floor((CASE WHEN nb > 1 THEN mn + (bucket + 1) * w ELSE mn END)
             * 1e6 + 0.5) / 1e6 AS hi,
           cnt
         FROM g ORDER BY bucket""",
    "q_welch" ->
      """WITH s AS (SELECT
             count(CASE WHEN event_type = 'click' THEN 1 END)::BIGINT AS n_a,
             count(CASE WHEN event_type = 'view' THEN 1 END)::BIGINT AS n_b,
             avg(CASE WHEN event_type = 'click' THEN value END) AS m_a,
             avg(CASE WHEN event_type = 'view' THEN value END) AS m_b,
             var_samp(CASE WHEN event_type = 'click' THEN value END) AS v_a,
             var_samp(CASE WHEN event_type = 'view' THEN value END) AS v_b
           FROM events WHERE event_type IN ('click', 'view'))
         SELECT n_a, n_b,
           floor(m_a * 1e6 + 0.5) / 1e6 AS mean_a,
           floor(m_b * 1e6 + 0.5) / 1e6 AS mean_b,
           floor((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b) * 1e6 + 0.5)
             / 1e6 AS t,
           floor((v_a / n_a + v_b / n_b) * (v_a / n_a + v_b / n_b)
             / ((v_a / n_a) * (v_a / n_a) / (n_a - 1)
                + (v_b / n_b) * (v_b / n_b) / (n_b - 1)) * 1e6 + 0.5)
             / 1e6 AS df
         FROM s""",
    "q_skyline" ->
      """WITH g AS (SELECT l_extendedprice::DOUBLE AS x,
             max(l_quantity::DOUBLE) AS y
           FROM lineitem GROUP BY 1),
         w AS (SELECT x, y, max(y) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS my
           FROM g)
         SELECT x AS l_extendedprice, y AS l_quantity FROM w
         WHERE my IS NULL OR y > my ORDER BY l_extendedprice""",
    "q_skyline3" ->
      """WITH p AS (SELECT DISTINCT p_retailprice::DOUBLE AS d1,
             p_size::DOUBLE AS d2, length(p_name)::DOUBLE AS d3 FROM part)
         SELECT d1 AS p_retailprice, d2 AS p_size, d3 AS name_len
         FROM p a
         WHERE NOT EXISTS (SELECT 1 FROM p q
           WHERE q.d1 <= a.d1 AND q.d2 >= a.d2 AND q.d3 >= a.d3
             AND (q.d1 < a.d1 OR q.d2 > a.d2 OR q.d3 > a.d3))
         ORDER BY p_retailprice, p_size, name_len""",
    "q_quantiles" ->
      """SELECT 'l_quantity' AS "column", 0.25::DOUBLE AS p,
           floor(quantile_cont(l_quantity::DOUBLE, 0.25) * 1e6 + 0.5) / 1e6 AS q
         FROM lineitem
         UNION ALL SELECT 'l_quantity', 0.5::DOUBLE,
           floor(quantile_cont(l_quantity::DOUBLE, 0.5) * 1e6 + 0.5) / 1e6
         FROM lineitem
         UNION ALL SELECT 'l_quantity', 0.75::DOUBLE,
           floor(quantile_cont(l_quantity::DOUBLE, 0.75) * 1e6 + 0.5) / 1e6
         FROM lineitem
         UNION ALL SELECT 'l_quantity', 0.99::DOUBLE,
           floor(quantile_cont(l_quantity::DOUBLE, 0.99) * 1e6 + 0.5) / 1e6
         FROM lineitem
         UNION ALL SELECT 'l_discount', 0.25::DOUBLE,
           floor(quantile_cont(l_discount::DOUBLE, 0.25) * 1e6 + 0.5) / 1e6
         FROM lineitem
         UNION ALL SELECT 'l_discount', 0.5::DOUBLE,
           floor(quantile_cont(l_discount::DOUBLE, 0.5) * 1e6 + 0.5) / 1e6
         FROM lineitem
         UNION ALL SELECT 'l_discount', 0.75::DOUBLE,
           floor(quantile_cont(l_discount::DOUBLE, 0.75) * 1e6 + 0.5) / 1e6
         FROM lineitem
         UNION ALL SELECT 'l_discount', 0.99::DOUBLE,
           floor(quantile_cont(l_discount::DOUBLE, 0.99) * 1e6 + 0.5) / 1e6
         FROM lineitem
         ORDER BY "column", p""",
    "q_quantiles_by" ->
      """SELECT l_returnflag, 'l_quantity' AS "column", 0.5::DOUBLE AS p,
           floor(quantile_cont(l_quantity::DOUBLE, 0.5) * 1e6 + 0.5) / 1e6 AS q
         FROM lineitem GROUP BY l_returnflag
         UNION ALL
         SELECT l_returnflag, 'l_quantity', 0.9::DOUBLE,
           floor(quantile_cont(l_quantity::DOUBLE, 0.9) * 1e6 + 0.5) / 1e6
         FROM lineitem GROUP BY l_returnflag
         ORDER BY l_returnflag, "column", p""",
    // MAD replay: grouped medians via quantile_cont; the outlier flag
    // compares the ROUNDED robust_z (as the engine does)
    "q_mad" ->
      """WITH med AS (SELECT lang,
             quantile_cont(n_chars::DOUBLE, 0.5) AS med
           FROM documents GROUP BY lang),
         dev AS (SELECT d.doc_id, d.lang, d.n_chars, med.med,
                   abs(d.n_chars::DOUBLE - med.med) AS ad
                 FROM documents d JOIN med USING (lang)),
         mad AS (SELECT lang, quantile_cont(ad, 0.5) AS mad
                 FROM dev GROUP BY lang)
         SELECT dev.doc_id, dev.lang, dev.n_chars,
           floor(dev.med * 1e6 + 0.5) / 1e6 AS med,
           floor(mad.mad * 1e6 + 0.5) / 1e6 AS mad,
           CASE WHEN mad.mad > 0 THEN
             floor(dev.ad / (1.4826 * mad.mad) * 1e6 + 0.5) / 1e6
           END AS robust_z,
           coalesce(CASE WHEN mad.mad > 0 THEN
             floor(dev.ad / (1.4826 * mad.mad) * 1e6 + 0.5) / 1e6 > 3.5
           END, false) AS is_outlier
         FROM dev JOIN mad USING (lang) ORDER BY dev.doc_id""",
    "q_winsor" ->
      """WITH cuts AS (SELECT lang,
             quantile_cont(n_chars::DOUBLE, 0.05) AS qlo,
             quantile_cont(n_chars::DOUBLE, 0.95) AS qhi
           FROM documents GROUP BY lang)
         SELECT d.doc_id, d.lang, d.n_chars,
           floor(c.qlo * 1e6 + 0.5) / 1e6 AS lo,
           floor(c.qhi * 1e6 + 0.5) / 1e6 AS hi,
           floor(least(greatest(d.n_chars::DOUBLE, c.qlo), c.qhi)
                 * 1e6 + 0.5) / 1e6 AS clipped
         FROM documents d JOIN cuts c USING (lang)
         ORDER BY d.doc_id""",
    "q_quantiles_gate" ->
      """SELECT c AS "column", p::DOUBLE AS p, CAST(true AS BOOLEAN) AS within_tol
         FROM (SELECT unnest(['l_discount', 'l_quantity']) AS c),
              (SELECT unnest([0.25, 0.5, 0.75, 0.99]) AS p)
         ORDER BY "column", p""",
    "q_quantiles_by_gate" ->
      """SELECT l_returnflag, 'l_quantity' AS "column", p::DOUBLE AS p,
           CAST(true AS BOOLEAN) AS within_tol
         FROM (SELECT DISTINCT l_returnflag FROM lineitem),
              (SELECT unnest([0.25, 0.5, 0.9]) AS p)
         ORDER BY l_returnflag, "column", p""",
    "q_cardinality_gate" ->
      """SELECT c AS "column", CAST(true AS BOOLEAN) AS within_tol
         FROM (SELECT unnest(['l_discount', 'l_partkey', 'l_quantity']) AS c)
         ORDER BY "column"""",
    "q_top_values" ->
      """SELECT l_quantity::DOUBLE AS value, count(*)::BIGINT AS cnt
         FROM lineitem GROUP BY 1
         ORDER BY cnt DESC, value ASC LIMIT 5""",
    "q_top_values_approx" ->
      """SELECT l_quantity::DOUBLE AS value, count(*)::BIGINT AS cnt
         FROM lineitem GROUP BY 1
         ORDER BY cnt DESC, value ASC LIMIT 5""",
    "q_top_values_by" ->
      """SELECT l_returnflag, value, cnt, rn FROM (
           SELECT l_returnflag, l_quantity::DOUBLE AS value,
                  count(*)::BIGINT AS cnt,
                  row_number() OVER (PARTITION BY l_returnflag
                    ORDER BY count(*) DESC, l_quantity::DOUBLE ASC)::INT AS rn
           FROM lineitem GROUP BY l_returnflag, l_quantity) t
         WHERE rn <= 3 ORDER BY l_returnflag, rn""",
    "q_top_values_by_approx" ->
      """SELECT l_returnflag, value, cnt, rn FROM (
           SELECT l_returnflag, l_quantity::DOUBLE AS value,
                  count(*)::BIGINT AS cnt,
                  row_number() OVER (PARTITION BY l_returnflag
                    ORDER BY count(*) DESC, l_quantity::DOUBLE ASC)::INT AS rn
           FROM lineitem GROUP BY l_returnflag, l_quantity) t
         WHERE rn <= 3 ORDER BY l_returnflag, rn""",
    "q_histogram" ->
      """WITH b AS (SELECT min(l_extendedprice::DOUBLE) AS mn,
                           max(l_extendedprice::DOUBLE) AS mx FROM lineitem),
         w AS (SELECT mn,
                 CASE WHEN mx > mn THEN (mx - mn) / 16 ELSE 1.0 END AS width
               FROM b),
         g AS (SELECT g::INT AS bucket FROM generate_series(0, 15) t(g)),
         c AS (SELECT least(floor((l_extendedprice::DOUBLE - w.mn) / w.width),
                 15)::INT AS bucket, count(*)::BIGINT AS cnt
               FROM lineitem, w GROUP BY 1)
         SELECT g.bucket,
           floor((w.mn + g.bucket * w.width) * 1e6 + 0.5) / 1e6 AS lo,
           floor((w.mn + (g.bucket + 1) * w.width) * 1e6 + 0.5) / 1e6 AS hi,
           coalesce(c.cnt, 0)::BIGINT AS cnt
         FROM g CROSS JOIN w LEFT JOIN c ON c.bucket = g.bucket
         ORDER BY g.bucket""",
    "q_profile" ->
      """SELECT 'l_discount' AS "column", count(l_discount)::BIGINT AS n,
           sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
           min(l_discount::DOUBLE) AS min, max(l_discount::DOUBLE) AS max,
           floor(avg(l_discount::DOUBLE) * 1e6 + 0.5) / 1e6 AS mean,
           floor(median(l_discount::DOUBLE) * 1e6 + 0.5) / 1e6 AS median
         FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice', count(l_extendedprice)::BIGINT,
           sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)::BIGINT,
           min(l_extendedprice::DOUBLE), max(l_extendedprice::DOUBLE),
           floor(avg(l_extendedprice::DOUBLE) * 1e6 + 0.5) / 1e6,
           floor(median(l_extendedprice::DOUBLE) * 1e6 + 0.5) / 1e6
         FROM lineitem
         UNION ALL
         SELECT 'l_quantity', count(l_quantity)::BIGINT,
           sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT,
           min(l_quantity::DOUBLE), max(l_quantity::DOUBLE),
           floor(avg(l_quantity::DOUBLE) * 1e6 + 0.5) / 1e6,
           floor(median(l_quantity::DOUBLE) * 1e6 + 0.5) / 1e6
         FROM lineitem
         UNION ALL
         SELECT 'l_tax', count(l_tax)::BIGINT,
           sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END)::BIGINT,
           min(l_tax::DOUBLE), max(l_tax::DOUBLE),
           floor(avg(l_tax::DOUBLE) * 1e6 + 0.5) / 1e6,
           floor(median(l_tax::DOUBLE) * 1e6 + 0.5) / 1e6
         FROM lineitem
         ORDER BY "column"""",
    "q_canary" ->
      """SELECT doc_id, p.pattern
         FROM documents,
              (SELECT unnest(['table table', 'merge batch', 'slow fast',
                              'canary-guid-8f2a']) AS pattern) p
         WHERE contains(text, p.pattern)
         ORDER BY doc_id, pattern""",
    "q_cdc" ->
      """WITH ch AS (
           SELECT doc_id, text, lang, source, n_chars, 1 AS seq, 'd' AS op
           FROM documents WHERE doc_id % 10 = 0 OR doc_id % 10 = 5
           UNION ALL
           SELECT doc_id, 'updated ' || text, lang, source, n_chars, 2, 'u'
           FROM documents WHERE doc_id % 10 = 5),
         latest AS (SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY seq DESC, op) AS rn FROM ch) WHERE rn = 1),
         untouched AS (SELECT d.* FROM documents d
           LEFT JOIN latest l ON d.doc_id = l.doc_id WHERE l.doc_id IS NULL)
         SELECT doc_id, text, lang, source, n_chars FROM untouched
         UNION ALL
         SELECT doc_id, text, lang, source, n_chars FROM latest
         WHERE op = 'u'
         ORDER BY doc_id""",
    "q_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
         b AS (SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS text
               FROM documents WHERE doc_id >= 100),
         d AS (SELECT CASE WHEN a.doc_id IS NULL THEN 'added'
                           WHEN b.doc_id IS NULL THEN 'removed'
                           WHEN a.text <> b.text THEN 'changed'
                           ELSE 'unchanged' END AS status
               FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
         SELECT status, count(*)::BIGINT AS n FROM d
         GROUP BY status ORDER BY status""",
    "q_psi_by" ->
      """WITH c AS (
           SELECT source AS slice,
                  least(7, greatest(0,
                    floor(n_chars::DOUBLE / 75.0)))::BIGINT AS bin,
                  count(*) AS n
           FROM documents
           WHERE source IS NOT NULL AND n_chars IS NOT NULL
           GROUP BY 1, 2),
         g AS (SELECT bin, sum(n) AS gg FROM c GROUP BY bin),
         t AS (SELECT slice, sum(n) AS tn FROM c GROUP BY slice),
         gr AS (SELECT sum(n) AS tg FROM c),
         grid AS (
           SELECT t.slice, t.tn, g.bin, g.gg, coalesce(c.n, 0) AS n
           FROM t CROSS JOIN g
           LEFT JOIN c ON c.slice = t.slice AND c.bin = g.bin)
         SELECT slice, max(tn)::BIGINT AS n,
           floor(sum(
             (greatest(n / tn, 1e-6)
               - greatest((gg - n) / (tg - tn), 1e-6))
             * ln(greatest(n / tn, 1e-6)
               / greatest((gg - n) / (tg - tn), 1e-6))) * 1e6 + 0.5) / 1e6
             AS psi
         FROM grid, gr GROUP BY slice ORDER BY slice""",
    "q_ks_by" ->
      """WITH ps AS (
           SELECT source AS slice, n_chars::DOUBLE AS v, count(*) AS n
           FROM documents
           WHERE source IS NOT NULL AND n_chars IS NOT NULL
           GROUP BY 1, 2),
         g AS (
           SELECT v, sum(n) AS gn,
                  sum(sum(n)) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS gcum
           FROM ps GROUP BY v),
         t AS (SELECT slice, sum(n) AS tn FROM ps GROUP BY slice),
         gr AS (SELECT sum(n) AS tg FROM ps),
         grid AS (
           SELECT t.slice, t.tn, g.v, g.gcum, coalesce(ps.n, 0) AS n
           FROM t CROSS JOIN g
           LEFT JOIN ps ON ps.slice = t.slice AND ps.v = g.v),
         c AS (
           SELECT slice, tn, gcum,
             sum(n) OVER (PARTITION BY slice ORDER BY v
               ROWS UNBOUNDED PRECEDING) AS scum
           FROM grid)
         SELECT slice, max(tn)::BIGINT AS n,
           floor(max(abs(scum / tn - (gcum - scum) / (tg - tn)))
             * 1e6 + 0.5) / 1e6 AS d
         FROM c, gr GROUP BY slice ORDER BY slice""",
    "q_ks" ->
      """WITH t AS (SELECT n_chars::DOUBLE AS v, source = 'src0' AS ia
                    FROM documents
                    WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL),
         c AS (SELECT v,
                 sum(CASE WHEN ia THEN 1 ELSE 0 END) AS na,
                 sum(CASE WHEN NOT ia THEN 1 ELSE 0 END) AS nb
               FROM t GROUP BY v),
         cum AS (SELECT v,
                 sum(na) OVER (ORDER BY v) AS ca,
                 sum(nb) OVER (ORDER BY v) AS cb FROM c),
         tot AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM c)
         SELECT floor(max(abs(ca / ta - cb / tb)) * 1e6 + 0.5) / 1e6 AS d,
                ta::BIGINT AS n_a, tb::BIGINT AS n_b
         FROM cum, tot GROUP BY ta, tb""",
    "q_cat_drift" ->
      """WITH counts AS (
           SELECT lang AS category,
                  sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS na,
                  sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS nb
           FROM documents
           WHERE source IN ('src0', 'src1') AND lang IS NOT NULL
           GROUP BY lang),
         tot AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM counts)
         SELECT category,
           floor(na / ta * 1e6 + 0.5) / 1e6 AS p_a,
           floor(nb / tb * 1e6 + 0.5) / 1e6 AS p_b,
           floor((greatest(na / ta, 1e-6) - greatest(nb / tb, 1e-6))
             * ln(greatest(na / ta, 1e-6) / greatest(nb / tb, 1e-6))
             * 1e6 + 0.5) / 1e6 AS psi_term
         FROM counts, tot ORDER BY category""",
    "q_pivot" ->
      """SELECT source,
           sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT AS de,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS en,
           sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END)::BIGINT AS es,
           sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END)::BIGINT AS fr,
           sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END)::BIGINT AS zh
         FROM documents GROUP BY source ORDER BY source""",
    "q_mi" ->
      """WITH j AS (SELECT lang AS a, source AS b, count(*)::DOUBLE AS c
           FROM documents GROUP BY 1, 2),
         n AS (SELECT sum(c) AS n FROM j),
         ma AS (SELECT a, sum(c) AS ca FROM j GROUP BY a),
         mb AS (SELECT b, sum(c) AS cb FROM j GROUP BY b),
         t AS (SELECT j.c / n.n * ln(j.c * n.n / (ma.ca * mb.cb)) AS mi_t,
                 j.c / n.n AS p, ma.ca / n.n AS pa, mb.cb / n.n AS pb
               FROM j JOIN ma USING (a) JOIN mb USING (b), n),
         agg AS (SELECT sum(mi_t) AS mi, -sum(p * ln(pa)) AS h_a,
                   -sum(p * ln(pb)) AS h_b FROM t)
         SELECT floor(mi * 1e6 + 0.5) / 1e6 AS mi,
           floor(h_a * 1e6 + 0.5) / 1e6 AS h_a,
           floor(h_b * 1e6 + 0.5) / 1e6 AS h_b,
           floor((CASE WHEN h_a > 0 AND h_b > 0
                  THEN mi / sqrt(h_a * h_b) ELSE 0 END) * 1e6 + 0.5) / 1e6
             AS nmi
         FROM agg""",
    "q_corr" ->
      """WITH c AS (SELECT
           corr(l_quantity::DOUBLE, l_extendedprice::DOUBLE) AS c1,
           corr(l_quantity::DOUBLE, l_discount::DOUBLE) AS c2,
           corr(l_quantity::DOUBLE, l_tax::DOUBLE) AS c3,
           corr(l_extendedprice::DOUBLE, l_discount::DOUBLE) AS c4,
           corr(l_extendedprice::DOUBLE, l_tax::DOUBLE) AS c5,
           corr(l_discount::DOUBLE, l_tax::DOUBLE) AS c6
           FROM lineitem)
         SELECT col_x, col_y, floor(v * 1e6 + 0.5) / 1e6 AS "corr"
         FROM (
           SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y, c1 AS v FROM c
           UNION ALL SELECT 'l_quantity', 'l_discount', c2 FROM c
           UNION ALL SELECT 'l_quantity', 'l_tax', c3 FROM c
           UNION ALL SELECT 'l_extendedprice', 'l_discount', c4 FROM c
           UNION ALL SELECT 'l_extendedprice', 'l_tax', c5 FROM c
           UNION ALL SELECT 'l_discount', 'l_tax', c6 FROM c)
         ORDER BY col_x, col_y""",
    "q_psi" ->
      """WITH tagged AS (
           SELECT least(7, greatest(0,
                    floor(n_chars::DOUBLE / 75.0)))::BIGINT AS bin,
                  source = 'src0' AS is_a
           FROM documents
           WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL),
         counts AS (
           SELECT bin,
                  sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS na,
                  sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS nb
           FROM tagged GROUP BY bin),
         tot AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM counts)
         SELECT bin,
           floor(na / ta * 1e6 + 0.5) / 1e6 AS p_a,
           floor(nb / tb * 1e6 + 0.5) / 1e6 AS p_b,
           floor((greatest(na / ta, 1e-6) - greatest(nb / tb, 1e-6))
             * ln(greatest(na / ta, 1e-6) / greatest(nb / tb, 1e-6))
             * 1e6 + 0.5) / 1e6 AS psi_term
         FROM counts, tot ORDER BY bin""",
    "q_schema_diff" ->
      """SELECT * FROM (VALUES
           ('doc_id', 'unchanged'), ('extra', 'added'),
           ('lang', 'removed'), ('n_chars', 'type_changed'),
           ('source', 'unchanged'), ('text', 'unchanged'))
         AS t("column", status) ORDER BY "column"""",
    "q_benford" ->
      """WITH counts AS (
           SELECT substr(CAST(CAST(trunc(abs(o_totalprice::DOUBLE)) AS BIGINT)
                    AS VARCHAR), 1, 1) AS digit,
                  count(*) AS n
           FROM orders
           WHERE o_totalprice IS NOT NULL
             AND CAST(trunc(abs(o_totalprice::DOUBLE)) AS BIGINT) > 0
           GROUP BY 1),
         tot AS (SELECT sum(n) AS t FROM counts),
         ds AS (SELECT d::VARCHAR AS digit,
                       log10(1.0 + 1.0 / d) AS bs
                FROM generate_series(1, 9) s(d))
         SELECT ds.digit,
           floor(coalesce(c.n, 0) / tot.t * 1e6 + 0.5) / 1e6 AS observed,
           floor(ds.bs * 1e6 + 0.5) / 1e6 AS benford,
           floor((greatest(coalesce(c.n, 0) / tot.t, 1e-6) - ds.bs)
             * ln(greatest(coalesce(c.n, 0) / tot.t, 1e-6) / ds.bs)
             * 1e6 + 0.5) / 1e6 AS term
         FROM ds LEFT JOIN counts c ON c.digit = ds.digit
         CROSS JOIN tot ORDER BY ds.digit""",
    "q_orphans" ->
      """WITH c AS (SELECT l_orderkey AS fk FROM lineitem
                    WHERE l_orderkey IS NOT NULL),
         p AS (SELECT DISTINCT o_orderkey AS pk FROM orders
               WHERE o_orderkey % 3 <> 0),
         o AS (SELECT count(*) AS n_orphans FROM c
               WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.pk = c.fk)),
         n AS (SELECT count(*) AS n_child FROM c)
         SELECT n.n_child::BIGINT AS n_child,
                o.n_orphans::BIGINT AS n_orphans,
                floor(o.n_orphans::DOUBLE /
                  greatest(n.n_child, 1) * 1e6 + 0.5) / 1e6 AS orphan_rate
         FROM n, o""",
    "q_order_viol" ->
      """WITH x AS (
           SELECT user_id, epoch_ns(ts) AS ns,
                  lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                    ORDER BY md5(event_id::VARCHAR)) AS prev
           FROM events)
         SELECT user_id, count(*)::BIGINT AS n_violations
         FROM x WHERE prev IS NOT NULL AND ns < prev AND user_id < 30
         GROUP BY user_id ORDER BY user_id""",
    "q_hll_gate" ->
      """SELECT count(DISTINCT doc_id)::BIGINT AS n_exact,
           true AS direct_within_3sigma, true AS merged_within_5pct
         FROM documents""",
    "q_cms_gate" ->
      """SELECT source AS value, count(*)::BIGINT AS n_true,
           true AS merge_eq, true AS bounds_ok
         FROM documents GROUP BY source ORDER BY value""",
    "q_trimmed" ->
      """WITH cuts AS (SELECT lang,
             quantile_cont(n_chars::DOUBLE, 0.05) AS qlo,
             quantile_cont(n_chars::DOUBLE, 0.95) AS qhi
           FROM documents GROUP BY lang),
         c AS (SELECT d.lang, d.n_chars,
                 floor(least(greatest(d.n_chars::DOUBLE, qlo), qhi)
                   * 1e6 + 0.5) / 1e6 AS clipped
               FROM documents d JOIN cuts USING (lang))
         SELECT lang, count(*)::BIGINT AS n,
           floor(avg(n_chars::DOUBLE) * 1e6 + 0.5) / 1e6 AS raw_mean,
           floor(avg(clipped) * 1e6 + 0.5) / 1e6 AS trimmed_mean
         FROM c GROUP BY lang ORDER BY lang""",
    "q_props" ->
      """SELECT event_type, count(*)::BIGINT AS n,
           floor(avg(json_extract(props, '$.k')::BIGINT) * 1e6 + 0.5) / 1e6
             AS avg_k,
           min(json_extract(props, '$.k')::BIGINT) AS min_k,
           max(json_extract(props, '$.k')::BIGINT) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_rollup" ->
      """SELECT lang, source, count(*)::BIGINT AS n_docs,
           GROUPING(lang, source)::INT AS gid
         FROM documents GROUP BY ROLLUP(lang, source)
         ORDER BY gid, lang NULLS LAST, source NULLS LAST""",
    "q_pareto" ->
      """WITH per AS (SELECT source,
             sum(len(string_split(trim(text), ' ')))::BIGINT AS n_tokens
           FROM documents GROUP BY source),
         tot AS (SELECT sum(n_tokens)::DOUBLE AS t FROM per),
         r AS (SELECT source, n_tokens, n_tokens::DOUBLE / tot.t AS share,
                 row_number() OVER (ORDER BY n_tokens DESC, source) AS rank,
                 sum(n_tokens::DOUBLE / tot.t) OVER
                   (ORDER BY n_tokens DESC, source
                    ROWS UNBOUNDED PRECEDING) AS cum
               FROM per, tot)
         SELECT source, n_tokens, rank,
           floor(cum * 1e6 + 0.5) / 1e6 AS cum_share,
           (cum - share < 0.8) AS in_head_80
         FROM r ORDER BY rank""",
    "q_hhi" ->
      """WITH per AS (SELECT source,
             sum(len(string_split(trim(text), ' ')))::BIGINT AS n_tokens
           FROM documents GROUP BY source),
         tot AS (SELECT sum(n_tokens)::DOUBLE AS t FROM per),
         sh AS (SELECT source, n_tokens::DOUBLE / tot.t AS s FROM per, tot),
         h AS (SELECT count(*)::BIGINT AS n_sources, sum(s * s) AS hhi
               FROM sh),
         mx AS (SELECT max(s) AS mx FROM sh),
         top AS (SELECT min(source) AS top_source, max(s) AS ts
                 FROM sh, mx WHERE sh.s = mx.mx)
         SELECT h.n_sources, floor(h.hhi * 1e6 + 0.5) / 1e6 AS hhi,
           floor(1.0 / h.hhi * 1e6 + 0.5) / 1e6 AS effective_sources,
           top.top_source, floor(top.ts * 1e6 + 0.5) / 1e6 AS top_share
         FROM h, top""",
    "q_keyuniq" ->
      """SELECT * FROM (
           SELECT count(*)::BIGINT AS n_rows,
             count(DISTINCT doc_id)::BIGINT AS n_distinct,
             (count(*) - count(DISTINCT doc_id))::BIGINT AS n_dup_rows,
             (count(*) = count(DISTINCT doc_id)) AS is_unique
           FROM documents
           UNION ALL
           SELECT count(*)::BIGINT, count(DISTINCT event_id)::BIGINT,
             (count(*) - count(DISTINCT event_id))::BIGINT,
             (count(*) = count(DISTINCT event_id))
           FROM events)
         ORDER BY n_rows""",
    "q_pctrank" ->
      """SELECT doc_id, lang, n_chars,
           floor(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)
             * 1e6 + 0.5) / 1e6 AS pct_rank
         FROM documents ORDER BY doc_id""",
    "q_kanon" ->
      """SELECT lang, source, count(*)::BIGINT AS cnt,
           (count(*) < 5) AS at_risk
         FROM documents GROUP BY lang, source ORDER BY lang, source""",
  )
}
