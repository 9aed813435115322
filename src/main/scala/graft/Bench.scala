package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with total + per-query secs.
  * One shared session; a warmup action absorbs JVM/codegen startup so
  * per-query numbers measure the queries, not the first-job tax.
  *
  * Each query runs GRAFT_BENCH_REPS times (default 3) and reports the
  * per-query MEDIAN — a single-sample bench cannot tell a real regression
  * from scheduler noise (round-3 verdict: a +33% single-sample delta was
  * unreadable). `value` is the sum of medians. */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    // true median for even counts too — with reps=2, s(n/2) silently
    // reported the WORSE of the two samples as the "median"
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
  }

  /** Locale-pinned fixed-point formatting for JSON emission: the f""
    * interpolator formats in the JVM default locale, which writes
    * "0,5" under comma-decimal locales and corrupts the artifact
    * (stderr log lines may stay locale-default; artifacts must not). */
  private def jd(x: Double, digits: Int): String =
    String.format(java.util.Locale.ROOT, "%." + digits + "f", Double.box(x))

  /** Median of timed reps, or the -1 error marker when ANY rep failed —
    * timing a query's time-to-fail is not a valid sample (round-6 advice:
    * a failed ×10 rep silently recorded a bogus median). */
  private def timedReps(reps: Int, run: () => Unit): Seq[Double] =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val ok = try { run(); true } catch { case _: Throwable => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }

  private def medianOrErr(times: Seq[Double]): Double =
    if (times.exists(_ < 0)) -1.0 else median(times)

  /** Guard-band direction of a load-normalized ratio: -1 = faster than
    * the band, 0 = inside it, 1 = slower. The band matches the flag
    * condition (>2× or <0.5×). */
  private[graft] def dirOf(r: Double): Int =
    if (r > 2.0) 1 else if (r < 0.5) -1 else 0

  /** Verdict on a flagged query's FIRST isolated re-run (pure — the
    * decision table is spec-pinned). iso < 0 = the re-run itself errored
    * (timedReps' -1 marker) — distinct from a missing baseline; a failed
    * adjudication must not masquerade as either verdict. The
    * "no_baseline" branch is DEFENSIVE: the only current call site
    * builds its flag set from positive baselines, so isoRatio is never
    * -1 there — the branch exists so the spec-pinned table covers the
    * full input domain, not just today's reachable states. A flag and its
    * isolated re-run must agree in DIRECTION before a "confirmed"/
    * "reproduced" word applies; disagreement is "inconsistent" and
    * triggers exactly one more isolated round. */
  private[graft] def firstVerdict(suiteRatio: Double, iso: Double,
      isoRatio: Double): String =
    if (iso < 0) "isolated_run_error"
    else if (isoRatio < 0) "no_baseline"
    else if (dirOf(isoRatio) == 0) "suite_context_noise"
    else if (dirOf(isoRatio) == dirOf(suiteRatio))
      (if (dirOf(isoRatio) > 0) "slowdown_reproduced"
       else "speedup_confirmed")
    else "inconsistent"

  /** Verdict after the SECOND isolated run (only reached when the first
    * was "inconsistent"). Two isolated runs agreeing (same out-of-band
    * direction) settle it — but they CONTRADICT the suite flag's
    * direction (that is what made round one "inconsistent"), so the
    * verdict words must not claim the flag "reproduced":
    * *_isolated_consensus = "the two isolated runs agree with each
    * other, against the suite sample". Anything else stays
    * "inconsistent" with all three samples in the record. */
  private[graft] def secondVerdict(isoRatio: Double, iso2: Double,
      iso2Ratio: Double): String =
    if (iso2 < 0) "isolated_run_error"
    else if (iso2Ratio >= 0 && dirOf(iso2Ratio) != 0 &&
      dirOf(iso2Ratio) == dirOf(isoRatio))
      (if (dirOf(iso2Ratio) > 0) "slowdown_isolated_consensus"
       else "speedup_isolated_consensus")
    else "inconsistent"

  /** Accumulates shuffle traffic across all tasks (local mode: one
    * process, so a plain listener + atomics see every task). Snapshots
    * around each query attribute its shuffle volume — the field the
    * adjudicator needs to tell "this query moved 2× because it shuffled
    * 30 GB while the suite's disk was full" from bare noise. */
  private final class ShuffleListener
      extends org.apache.spark.scheduler.SparkListener {
    val read = new java.util.concurrent.atomic.AtomicLong
    val write = new java.util.concurrent.atomic.AtomicLong
    val spilled = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spilled.addAndGet(m.diskBytesSpilled)
      }
    }
  }

  /** Daemon poller tracking the MINIMUM free space of the scratch
    * filesystem (= peak usage) since the last reset — the r10/r11 ×100
    * failures were /tmp exhaustion that `du` after the fact could not
    * see (deleted-but-open spill files). 100 ms polling bounds the blind
    * spot; a query's peak-tmp attribution is startFree − minFree. */
  private final class TmpPeakPoller(dir: java.nio.file.Path)
      extends Thread("graft-tmp-peak") {
    setDaemon(true)
    @volatile private var minFree = Long.MaxValue
    @volatile private var stopped = false
    // generation guard: a sample read BEFORE reset() must not be
    // committed AFTER it (it would carry the previous query's low-water
    // mark into the new window)
    @volatile private var gen = 0L
    def free(): Long =
      try java.nio.file.Files.getFileStore(dir).getUsableSpace
      catch { case _: Throwable => -1L }
    def reset(): Long = { gen += 1; val f = free(); minFree = f; f }
    def minFreeSinceReset(): Long = minFree
    def shutdown(): Unit = stopped = true
    override def run(): Unit =
      while (!stopped) {
        val g = gen
        val f = free()
        if (g == gen && f >= 0 && f < minFree) minFree = f
        Thread.sleep(100)
      }
  }

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  private def cachedStorage(spark: SparkSession): (Int, Long) =
    try {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(_.numCachedPartitions).sum,
        infos.map(i => i.memSize + i.diskSize).sum)
    } catch { case _: Throwable => (-1, -1L) }

  /** Attribution snapshot taken around a query's measured window.
    * `memoHits`/`memoMisses` count the report-family pair-kernel memo's
    * behavior inside the window — the field that turns "q_dedup_report
    * ran 10× its baseline" from archaeology into a one-line read (r12:
    * the memo missed in the driver run, hit in the quiet run, and
    * nothing recorded which). */
  private final case class Attribution(gcMs: Long, shufReadMb: Double,
      shufWriteMb: Double, spillMb: Double, tmpPeakMb: Double,
      storageParts: Int, storageMb: Double,
      memoHits: Long, memoMisses: Long,
      fitMemoHits: Long, fitMemoMisses: Long) {
    def json: String =
      s"""{"gc_ms":$gcMs,"shuf_rd_mb":${jd(shufReadMb, 1)},""" +
        s""""shuf_wr_mb":${jd(shufWriteMb, 1)},"spill_mb":${jd(spillMb, 1)},""" +
        s""""tmp_peak_mb":${jd(tmpPeakMb, 1)},"cached_parts":$storageParts,""" +
        s""""cached_mb":${jd(storageMb, 1)},"memo_hits":$memoHits,""" +
        s""""memo_misses":$memoMisses,"fit_memo_hits":$fitMemoHits,""" +
        s""""fit_memo_misses":$fitMemoMisses}"""
  }

  private def attributed[A](spark: SparkSession, sl: ShuffleListener,
      poller: TmpPeakPoller)(body: => A): (A, Attribution) = {
    // drain the listener bus at BOTH window edges: task-end events are
    // delivered asynchronously, and a previous query's queued tail
    // would otherwise land in this window's counters (and this
    // window's tail in the next one's)
    org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
    val gc0 = gcMillis()
    val rd0 = sl.read.get(); val wr0 = sl.write.get()
    val sp0 = sl.spilled.get()
    val mh0 = pipeline.Dedup.reportPairsCacheHits.get()
    val mm0 = pipeline.Dedup.reportPairsCacheMisses.get()
    val fh0 = pipeline.FitMemo.hits.get()
    val fm0 = pipeline.FitMemo.misses.get()
    val free0 = poller.reset()
    val out = body
    org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
    val (parts, bytes) = cachedStorage(spark)
    val mb = 1.0 / (1024 * 1024)
    val peak =
      if (free0 < 0) -1.0
      else math.max(0L, free0 - poller.minFreeSinceReset()) * mb
    (out, Attribution(gcMillis() - gc0,
      (sl.read.get() - rd0) * mb, (sl.write.get() - wr0) * mb,
      (sl.spilled.get() - sp0) * mb, peak, parts, bytes * mb,
      pipeline.Dedup.reportPairsCacheHits.get() - mh0,
      pipeline.Dedup.reportPairsCacheMisses.get() - mm0,
      pipeline.FitMemo.hits.get() - fh0,
      pipeline.FitMemo.misses.get() - fm0))
  }

  /** Deterministic clustered synthetic embedding corpus — the geometry
    * real embedding corpora have, which the isotropic testdata lacks.
    * Hash-derived cluster centers (uniform[-1,1] components) + 0.3-scale
    * per-component hash noise; within-cluster cosine ≈ 0.92,
    * cross-cluster ≈ N(0, d^-1/2). Shared by the ann_frontier /
    * ann_clustered / ann_clustered_2m evidence blocks (held-out queries
    * = ids beyond the corpus range, fresh noise, same recipe). */
  private def genClustered(ids: org.apache.spark.sql.DataFrame,
      nClusters: Int, dim: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, expr, pmod, xxhash64}
    ids
      .withColumn("cl", pmod(xxhash64(col("vec_id"), lit(7)), lit(nClusters)))
      .withColumn("embedding", expr(
        s"transform(sequence(0, ${dim - 1}), j -> cast(" +
          "(pmod(xxhash64(cl, j, 11), 2001) - 1000) / 1000.0 + " +
          "0.3 * (pmod(xxhash64(vec_id, j, 13), 2001) - 1000) / 1000.0" +
          " as float))"))
      .select("vec_id", "embedding")
  }

  /** Print the artifact line and also persist it whole to the file named
    * by `envVar` (default `defaultFile`): stdout capture can truncate
    * (BENCH_r06 lost its tail) — the committed artifact must be
    * self-contained. */
  private def emitArtifact(envVar: String, defaultFile: String,
      line: String): Unit = {
    println(line)
    val outFile = sys.env.getOrElse(envVar, defaultFile)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(root)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    finally walk.close()
  }

  /** Per-query medians of the regression BASELINE artifact, read from
    * its top-level `"queries"` object with a REAL JSON parser (Jackson,
    * shipped with Spark) — whitespace, key order and separator style
    * must not matter. The r12 guard death was exactly this: a
    * hand-refreshed baseline serialized with `": "` separators defeated
    * the old string-tag match and the >2× guard ran baseline-less for
    * half a round (r12 verdict item 1, the r9 failure class recurring).
    * The baseline is the builder-committed quiet-machine file
    * (BENCH_BASELINE_MEDIANS.json), NOT the output file: the driver
    * re-runs this bench on a possibly contended machine and overwrites
    * BENCH_LAST.json — diffing against that would seed the guard with
    * inflated numbers. Empty when absent/unparseable — and the run
    * artifact now RECORDS the loaded-median count (`baseline_medians`),
    * so a silently disarmed guard confesses in its own output. */
  private[graft] def previousMedians(path: java.nio.file.Path): Map[String, Double] =
    baselineRoot(path).map { root =>
      val qs = root.path("queries")
      if (!qs.isObject) Map.empty[String, Double]
      else {
        import scala.jdk.CollectionConverters._
        qs.properties().asScala.iterator
          .filter(_.getValue.isNumber)
          .map(e => e.getKey -> e.getValue.asDouble())
          .toMap
      }
    }.getOrElse(Map.empty)

  /** Per-query medians of the baseline artifact's `scale10x.queries`
    * object — the ×10 block's own guard reference (r14 verdict item 1:
    * the driver's 64×/65× q_spans / q_minhash_pairs excursion rode into
    * BENCH_r14.json unflagged because the 10× stage had no baseline to
    * diff against). Empty when the baseline predates the block. */
  private[graft] def previousScale10xMedians(path: java.nio.file.Path)
      : Map[String, Double] =
    baselineRoot(path).map { root =>
      val qs = root.path("scale10x").path("queries")
      if (!qs.isObject) Map.empty[String, Double]
      else {
        import scala.jdk.CollectionConverters._
        qs.properties().asScala.iterator
          .filter(_.getValue.isNumber)
          .map(e => e.getKey -> e.getValue.asDouble())
          .toMap
      }
    }.getOrElse(Map.empty)

  /** Structural baseline-refresh gate (r14 verdict item 2: "refresh only
    * from a flag-clean or all-speedup run" was practice, not a check).
    * Pure and spec-pinned: returns the refusal reason, or None when the
    * refresh may proceed. `force` overrides only after an explicit
    * human adjudication — the verdict map is still consulted first so
    * the refusal reason names the offending queries either way. */
  private[graft] def refreshRefusal(mode: String,
      flagVerdicts: Map[String, String]): Option[String] = {
    val bad = flagVerdicts.filter(_._2 != "speedup_confirmed")
    if (bad.isEmpty) None
    else if (mode == "force") None
    else Some(s"${bad.size} non-speedup flags unresolved: " +
      bad.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
        .mkString(", ") + " (use force to override)")
  }

  /** The baseline's `load_ref` median (machine-speed fingerprint), or
    * -1 when the file/field is absent or unparseable. */
  private[graft] def previousLoadRef(path: java.nio.file.Path): Double =
    baselineRoot(path).map { root =>
      val lr = root.path("load_ref")
      if (lr.path("before").isNumber && lr.path("after").isNumber)
        (lr.path("before").asDouble() + lr.path("after").asDouble()) / 2
      else -1.0
    }.getOrElse(-1.0)

  private def baselineRoot(path: java.nio.file.Path)
      : Option[com.fasterxml.jackson.databind.JsonNode] =
    if (!java.nio.file.Files.exists(path)) None
    else
      try Some(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readAllBytes(path)))
      catch { case _: Exception => None }

  /** The >2× guard's flag set, pure and spec-pinned: queries whose
    * load-normalized median moved out of the [0.5×, 2×] band vs the
    * baseline. Both directions flag — a >2× "win" is equally likely to
    * mean the BASELINE run was the loaded one. Queries without a
    * positive baseline or with an errored median (-1) never flag. */
  private[graft] def flaggedMoves(medians: Seq[(String, Double)],
      prev: Map[String, Double], loadFactor: Double)
      : Seq[(String, Double, Double)] =
    medians.flatMap { case (k, v) =>
      prev.get(k).collect { case p if p > 0 && v > 0 && {
        val r = v / p / loadFactor; r > 2.0 || r < 0.5
      } => (k, v, v / p / loadFactor) }
    }

  /** Cross-query median of raw ratios v/p over queries with positive
    * medians on both sides — the robust estimator of this machine's true
    * suite inflation. A handful of genuine regressions cannot move the
    * median of ~190 unchanged queries, while a uniformly loaded machine
    * moves all of them together. -1 when no query has a baseline. */
  private[graft] def crossQueryMedianRatio(medians: Seq[(String, Double)],
      prev: Map[String, Double]): Double = {
    val rs = medians.flatMap { case (k, v) =>
      prev.get(k).collect { case p if p > 0 && v > 0 => v / p } }
    if (rs.isEmpty) -1.0 else median(rs)
  }

  /** The guard's divisor (r13 driver failure: an asymmetric probe pair —
    * 0.656 before / 0.098 after, loaded start then quiet — yielded probe
    * factor 2.75 while the true median query inflation was 1.13×,
    * producing 162 spurious flags AND a mask for any real ≤2.75×
    * regression on a loaded-start machine). The probe is only trusted up
    * to what the queries themselves show: capped at the cross-query
    * median ratio, floored at 1 so a fast machine never loosens the
    * guard. With no baselined queries the probe factor stands alone. */
  private[graft] def effectiveLoadFactor(probeFactor: Double,
      medianRatio: Double): Double =
    if (medianRatio > 0) math.min(probeFactor.max(1.0), medianRatio.max(1.0))
    else probeFactor.max(1.0)

  /** Driver-facing summary line, printed LAST: the driver extracts its
    * per-round bench record from the final ~2000 chars of stdout, and
    * the full artifact line outgrew that window at round 6 (42 KB by
    * r12) — every BENCH_r{06..12}.json carries `parsed: null`. The
    * summary keeps the contract fields (metric/value/unit/sf/queries)
    * but bounds the queries object: the BASELINE.md headline queries
    * first, then the slowest remaining queries until the length budget
    * is spent. The FULL per-query map lives in BENCH_LAST.json (`full`
    * points there). */
  /** Every query the r15 driver summary printed, headline first (the
    * BASELINE.md set), then the r15 slowest-remaining set. The r15 PERF
    * near-false-regression: 21 flag verdicts rode the line and squeezed
    * the printed query map from 76 to 54 names, and the driver recorded
    * the 23 omissions as `dropped_from_bench`. The driver diffs each
    * round's summary against the previous round's PRINTED set, so the
    * printed set must be monotone: these names never leave the line
    * while they exist in the bench. */
  private[graft] val summaryPinned: Seq[String] = Seq(
    "q_select_where", "q_like", "q_top", "q_update",
    "q_agg_group", "q_agg_global", "q_distinct", "q_distinct_count",
    "q_join_inner", "q_join_left", "q_strict_left", "q_nr", "q_except",
    "q_median_var", "q_array_agg", "q_any_value", "q_unnest", "q_pipe",
    "q_sum_int", "q_scalar_case",
    "q_basket", "q_compact_gate", "q_bm25", "q_zorder_gate",
    "q_hilbert_gate", "q_ngram_pairs", "q_ann_recall", "q_benford",
    "q_search_idx", "q_tfidf_pairs", "q_rrf", "q_simhash_recall",
    "q_quantiles_gate", "q_semdedup_recall", "q_spans", "q_skyline",
    "q_auc", "q_minhash_pairs", "q_quantiles_by_gate", "q_calibration",
    "q_keywords", "q_triangles", "q_embed_dups", "q_ivf_recall",
    "q_dsir_sample", "q_pmi", "q_incr", "q_entities", "q_dau_sketch",
    "q_contain_bloom", "q_top_ngrams", "q_ivf_prune", "q_cc_best",
    "q_decon")

  private[graft] def compactSummary(total: Double, sfDir: String,
      reps: Int, medians: Seq[(String, Double)], nErrors: Int, nFlags: Int,
      baselineMedians: Int, maxLen: Int = 1700,
      flagVerdicts: Map[String, String] = Map.empty,
      x10Flags: Int = -1): String = {
    val byName = medians.toMap
    val pinnedPresent = summaryPinned.filter(byName.contains)
    val pinnedSet = pinnedPresent.toSet
    val rest = medians.filter { case (k, _) => !pinnedSet.contains(k) }
      .sortBy(-_._2).map(_._1)
    // flagged-query verdicts ride the summary so the driver artifact is
    // self-adjudicating (r13 verdict item 7); non-speedup verdicts (the
    // informative ones) survive truncation first, and the truncated
    // count is confessed
    def flagsJson(cap: Int): String = {
      // severity order: unexplained verdicts (slowdown_reproduced,
      // inconsistent, errors) > self-cleared noise > confirmed speedups
      def rank(v: String): Int = v match {
        case "speedup_confirmed"   => 2
        case "suite_context_noise" => 1
        case _                     => 0
      }
      val kept = flagVerdicts.toSeq
        .sortBy { case (k, v) => (rank(v), k) }
        .take(cap)
      val obj = kept.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
        .mkString("{", ",", "}")
      val trunc =
        if (flagVerdicts.size > kept.size)
          s""","flags_truncated":${flagVerdicts.size - kept.size}"""
        else ""
      s""""flags":$obj$trunc,"""
    }
    def render(qs: Seq[String], flagCap: Int): String = {
      val obj = qs.map(k => "\"" + k + "\":" + jd(byName(k), 3))
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${jd(total, 3)},"unit":"sec",""" +
        s""""sf":"$sfDir","reps":$reps,"n_queries":${medians.size},""" +
        s""""errors":$nErrors,"flags_gt_2x":$nFlags,""" +
        (if (x10Flags >= 0) s""""x10_flags_gt_2x":$x10Flags,""" else "") +
        flagsJson(flagCap) +
        s""""baseline_medians":$baselineMedians,""" +
        s""""full":"BENCH_LAST.json","queries":$obj}"""
    }
    // budget priority (r15 verdict item 2): pinned queries > flag
    // verdicts > slowest-remaining queries. Extras are dropped first,
    // then the flag object shrinks, and only a degenerate maxLen may
    // touch the pinned set itself.
    var keep = pinnedPresent ++ rest
    var flagCap = 12
    var out = render(keep, flagCap)
    while (out.length > maxLen && keep.size > pinnedPresent.size) {
      keep = keep.dropRight(1)
      out = render(keep, flagCap)
    }
    while (out.length > maxLen && flagCap > 0) {
      flagCap -= 1
      out = render(keep, flagCap)
    }
    while (out.length > maxLen && keep.nonEmpty) {
      keep = keep.dropRight(1)
      out = render(keep, flagCap)
    }
    out
  }

  /** One-off two-decade scaling evidence (GRAFT_BENCH_X100_ONLY=q_a,q_b —
    * opt-in, never part of the default/driver run): each named query is
    * timed at 1× and against ×100 replica tables, and the block emits a
    * self-contained JSON line (`metric: "scale100x"`) with both medians,
    * the ratio, and both output row counts. Together with the standing
    * ×10 block this measures two decades of the scaling curve the brief
    * asks about ("would this survive 100×?") instead of extrapolating
    * from one.
    *
    * Replica text uses a cipher COMPOSED from two disjoint 10-letter
    * rotation alphabets (rotations i%10 and i/10) so all 100 replicas
    * carry distinct text — reusing the ×10 block's single alphabet would
    * make replicas i and i+10 identical, planting 10 exact copies of
    * every document and measuring a replica² pair-volume explosion
    * instead of the operators (the round-8 q_minhash_pairs artifact
    * flaw, one decade up). */
  private def runScale100(spark: SparkSession, sfDir: String, reps: Int,
      names: Set[String]): Unit = {
    import org.apache.spark.sql.functions.{col, lit, max, translate}
    val factor = 100
    def rot(s: String, r: Int): String = s.drop(r) + s.take(r)
    // both alphabets drawn from the synthetic vocabulary's letter set —
    // a rotation over absent letters would be a no-op cipher
    val a1 = "aeiounstrl"
    val a2 = "mcgwhdbpyk"
    // fail fast on typos BEFORE spending minutes replicating 60M-row
    // tables: every requested name must be a SparkEntry query or a
    // pseudo-entry (ann_frontier / ann_clustered / ngram_pairs_bundled)
    val unknown = names -- SparkEntry.queries.keySet -
      "ann_frontier" - "ann_clustered" - "ann_clustered_2m" -
      "ngram_pairs_bundled"
    require(unknown.isEmpty,
      s"GRAFT_BENCH_X100_ONLY: unknown entries ${unknown.mkString(", ")}")
    val out = java.nio.file.Files.createTempDirectory("graft_x100")
    // all five tables replicate regardless of the selection (accepted
    // trade: mapping arbitrary query names to the tables they read is
    // not worth the bookkeeping for an opt-in one-off mode; the
    // replication is ~1-2 min of the run). Deliberately NOT unified
    // with the x10 block's replicate10: that twin is driver-contract
    // path and the two differ in the cipher composition.
    def replicate(table: String, idCols: Seq[String],
        textCol: Option[String] = None): Long = {
      val base = spark.read.parquet(s"$sfDir/$table.parquet")
      val strides = idCols.map(c =>
        c -> (base.agg(max(col(c))).head().getLong(0) + 1))
      (0 until factor).map { i =>
        val idShifted = strides.foldLeft(base) { case (d, (c, st)) =>
          d.withColumn(c, col(c) + lit(i.toLong * st))
        }
        textCol match {
          case Some(tc) if i > 0 =>
            idShifted.withColumn(tc, translate(col(tc),
              a1 + a2, rot(a1, i % 10) + rot(a2, i / 10)))
          case _ => idShifted
        }
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      base.count() * factor
    }
    try {
      val rows = Seq(
        "documents" -> replicate("documents", Seq("doc_id"),
          textCol = Some("text")),
        "events" -> replicate("events", Seq("event_id", "user_id")),
        "embeddings" -> replicate("embeddings", Seq("vec_id")),
        "lineitem" -> replicate("lineitem", Seq("l_orderkey")),
        "part" -> replicate("part", Seq("p_partkey")))
      val picked = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => names.contains(n) }
      // pseudo-entry: the q_ngram_pairs contract query with the
      // 1-Bucket bundled verify FORCED — next to a plain (auto-mode)
      // q_ngram_pairs entry in the same artifact the pair shows both
      // that the bundled kernel holds its ratio and that auto agrees
      // with the forced choice on the degenerate corpus (identical
      // rows_out, verify_paths records each side's decision). The conf
      // is read at plan-construction time, so set → construct → unset
      // keeps the flag from leaking into the other measured queries.
      val bundledEntry: Seq[(String, (SparkSession, String) =>
          org.apache.spark.sql.DataFrame)] =
        if (!names.contains("ngram_pairs_bundled")) Seq.empty
        else Seq("ngram_pairs_bundled" -> { (s: SparkSession, dir: String) =>
          s.conf.set("spark.graft.dedup.bundledVerify", "true")
          try SparkEntry.queries("q_ngram_pairs")(s, dir)
          finally s.conf.unset("spark.graft.dedup.bundledVerify")
        })
      // per-side attribution (r14 verdict item 5: the mem-pressure
      // evidence for the pair kernels needs spill_mb + gc next to the
      // wall time — a halved-heap run that spills gracefully and one
      // that thrashes look identical on wall time alone)
      val sl100 = new ShuffleListener
      spark.sparkContext.addSparkListener(sl100)
      val poller100 = new TmpPeakPoller(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")))
      poller100.start()
      val attrs100 =
        scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
      val measured = (picked ++ bundledEntry).map { case (name, fn) =>
        // capture the AllPairs verify-path decision the kernel takes on
        // each side (auto mode picks from the df-histogram estimate —
        // the artifact must show WHICH path ran at each scale). The
        // sentinel reset keeps a previous query's decision from leaking
        // into queries that never plan a jaccard kernel.
        def side(dir: String): (Double, Long, String, Attribution) = {
          pipeline.Dedup.lastVerifyDecision =
            pipeline.Dedup.VerifyDecision("", forced = false, -1.0)
          val ((t, r), attr) = attributed(spark, sl100, poller100) {
            try { fn(spark, dir).count() } catch { case _: Throwable => () }
            var r0 = -1L
            val t0 = medianOrErr(
              timedReps(reps, () => { r0 = fn(spark, dir).count(); () }))
            (t0, r0)
          }
          val d = pipeline.Dedup.lastVerifyDecision
          val ds = if (d.path.isEmpty) ""
            else if (d.forced) s"${d.path}(forced)"
            else f"${d.path}(auto,est=${d.estCandPerDoc}%.1f)"
          (t, r, ds, attr)
        }
        // GC between sides: shuffle files of dead reps are reclaimed only
        // by the ContextCleaner's GC-driven pass, and two back-to-back
        // ×100 pair-kernel queries (~15 GB of shuffle/spill per run) can
        // otherwise exhaust /tmp before the cleaner happens to run
        val (t1, r1, d1, a1x) = side(sfDir)
        System.gc()
        val (t100, r100, d100, a100) = side(out.toString)
        System.gc()
        attrs100 += ((name, a1x.json, a100.json))
        System.err.println(f"[bench] scale100x $name 1x=$t1%.3fs " +
          f"100x=$t100%.3fs ratio=${if (t1 > 0) t100 / t1 else -1.0}%.2f " +
          s"rows_out=$r1->$r100" +
          (if (d1.nonEmpty || d100.nonEmpty)
            s" verify=$d1->$d100" else "") +
          f" spill_100x=${a100.spillMb}%.1fMB gc_100x=${a100.gcMs}ms")
        (name, t1, t100, r1, r100, d1, d100)
      }
      // "ann_frontier" (not a SparkEntry query): the recall/latency dial
      // measured at ×100 corpus size — 200k vectors, k=64 coarse
      // centroids (vs 16 at 1×: cells should grow with the corpus so the
      // per-probe scan stays ~n/k), recall@10 averaged over 5 query
      // vectors against the brute-force truth, latency = median of the
      // per-query search actions. Fit/build/truth sit outside the timers
      // (index construction amortizes across queries in production).
      val annJson = if (!names.contains("ann_frontier")) "" else {
        import org.apache.spark.sql.functions.expr
        // id-strided replicas are EXACT vector copies, which makes ×100
        // recall trivial (a query's top-10 is its own self-family,
        // always in one cell — measured 1.00 at every nProbe). Two
        // corrections make the number meaningful: (1) deterministic
        // per-component jitter (±0.02) gives every replica distinct
        // geometry while families stay tightly clustered; (2) the
        // query's own family (same base id) is excluded from truth AND
        // results, so recall measures whether the probes reach the
        // NEIGHBORING families' cells — the actual IVF question.
        val strideV = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .agg(max(col("vec_id"))).head().getLong(0) + 1
        val emb = spark.read.parquet(s"$out/embeddings.parquet")
          .withColumn("embedding", expr(
            "transform(embedding, (x, i) -> cast(x + 0.02 * " +
              "(pmod(xxhash64(vec_id, i), 2001) - 1000) / 1000.0 as float))"))
        val model = pipeline.Clustering.fitKMeans(
          emb, "embedding", "vec_id", k = 64, maxIter = 4)
        pipeline.Clustering.buildIvf(emb, "embedding", model)
          .write.mode("overwrite").parquet(s"$out/ivf100.parquet")
        val qids = Seq(0L, 1L, 2L, 3L, 4L)
        val qvs = emb.filter(col("vec_id").isin(qids: _*))
          .select("vec_id", "embedding").collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
        def exclFamily(df: org.apache.spark.sql.DataFrame, id: Long) =
          df.filter(org.apache.spark.sql.functions
            .pmod(col("vec_id"), lit(strideV)) =!= id)
        val ivf = spark.read.parquet(s"$out/ivf100.parquet")
        val nVec = emb.count()
        // two curves: "selfdup" keeps the query's family in scope — the
        // near-dup-retrieval use case (find my copies), which saturates
        // immediately because a family shares a cell; "cross" excludes
        // it — on THIS corpus (isotropic random vectors, checked: top
        // non-family cosines ~0.3-0.4, no label structure) that is
        // ANN's worst case, and recall ≈ 3× the probed corpus fraction
        // is the honest expectation to beat, not 0.9.
        def sweep(tag: String, excl: Boolean): String = {
          def scope(df: org.apache.spark.sql.DataFrame, id: Long) =
            if (excl) exclFamily(df, id) else df
          val truth = qids.map(id => id -> pipeline.Similarity
            .bruteForceTopK(scope(emb, id), "embedding", "vec_id",
              qvs(id), 10)
            .select("vec_id").collect().map(_.getLong(0)).toSet).toMap
          val pts = Seq(1, 2, 4, 8).map { p =>
            def got(id: Long): Set[Long] = pipeline.Clustering.ivfTopK(
              scope(ivf, id), "embedding", "vec_id", qvs(id), model,
              k = 10, nProbe = p)
              .select("vec_id").collect().map(_.getLong(0)).toSet
            got(qids.head) // unmeasured warmup
            val timed = qids.map { id =>
              val t0 = System.nanoTime()
              val g = got(id)
              ((System.nanoTime() - t0) / 1e9,
                truth(id).intersect(g).size.toDouble / truth(id).size)
            }
            val lat = median(timed.map(_._1))
            val rec = timed.map(_._2).sum / timed.size
            System.err.println(f"[bench] scale100x ann_frontier($tag) " +
              f"nprobe=$p lat=$lat%.3fs recall=$rec%.2f")
            s""""nprobe_$p":{"sec":${jd(lat, 3)},"recall":${jd(rec, 2)}}"""
          }
          s""""$tag":{${pts.mkString(",")}}"""
        }
        s""","ann_frontier_100x":{"n_vectors":$nVec,"k_centroids":64,""" +
          s"${sweep("selfdup", excl = false)},${sweep("cross", excl = true)}}"
      }
      // "ann_clustered" (pseudo-entry): the IVF dial measured at 200k
      // vectors on CLUSTERED geometry — the structure real embedding
      // corpora have, and the positive evidence the isotropic testdata
      // cannot provide (its honest cross-query recall ceiling is ≈ 3×
      // the probed corpus fraction: isotropic noise has no cluster
      // structure for IVF to exploit). Deterministic synthetic corpus:
      // 2 000 cluster centers with uniform[-1,1] hash-derived
      // components; each vector = its cluster's center + 0.3-scale
      // per-component hash noise (within-cluster cosine ≈ 0.92,
      // cross-cluster ≈ N(0, d^-1/2) — well separated at d=64).
      // Queries are HELD-OUT draws from the same clusters (ids beyond
      // the corpus range, fresh noise) — no self-family shortcut, the
      // cross-query question only. Two coarse models measure the
      // centroid-scaling rule itself: k = ⌈√n⌉ (the production rule —
      // per-probe scan stays ~n/√n = √n) vs k = 64 (the r10 frontier
      // choice, ~n/64-sized cells).
      val annClusteredJson = if (!names.contains("ann_clustered")) "" else {
        val nVec = 200000L
        val nClusters = 2000
        val dim = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(org.apache.spark.sql.functions.size(col("embedding")))
          .head().getInt(0)
        def gen(ids: org.apache.spark.sql.DataFrame) =
          genClustered(ids, nClusters, dim)
        gen(spark.range(nVec).select(col("id").alias("vec_id")))
          .write.mode("overwrite").parquet(s"$out/annc.parquet")
        val corpus = spark.read.parquet(s"$out/annc.parquet")
        val nq = 8
        val qRows = gen(spark.range(nVec, nVec + nq)
          .select(col("id").alias("vec_id"))).collect()
        val qvs = qRows.map(r =>
          r.getLong(0) -> r.getSeq[Float](1)).toMap
        val qids = qvs.keys.toSeq.sorted
        val truth = qids.map(id => id -> pipeline.Similarity
          .bruteForceTopK(corpus, "embedding", "vec_id", qvs(id), 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet).toMap
        def modelCurve(k: Int): String = {
          val model = pipeline.Clustering.fitKMeans(
            corpus, "embedding", "vec_id", k = k, maxIter = 6)
          pipeline.Clustering.buildIvf(corpus, "embedding", model)
            .write.mode("overwrite").parquet(s"$out/annc_ivf_$k.parquet")
          val ivf = spark.read.parquet(s"$out/annc_ivf_$k.parquet")
          val pts = Seq(1, 2, 4, 8).map { p =>
            def got(id: Long): Set[Long] = pipeline.Clustering.ivfTopK(
              ivf, "embedding", "vec_id", qvs(id), model, k = 10,
              nProbe = p)
              .select("vec_id").collect().map(_.getLong(0)).toSet
            got(qids.head) // unmeasured warmup
            val timed = qids.map { id =>
              val t0 = System.nanoTime()
              val g = got(id)
              ((System.nanoTime() - t0) / 1e9,
                truth(id).intersect(g).size.toDouble / truth(id).size)
            }
            val lat = median(timed.map(_._1))
            val rec = timed.map(_._2).sum / timed.size
            System.err.println(f"[bench] scale100x ann_clustered(k=$k) " +
              f"nprobe=$p lat=$lat%.3fs recall=$rec%.2f")
            s""""nprobe_$p":{"sec":${jd(lat, 3)},"recall":${jd(rec, 2)}}"""
          }
          s""""k_$k":{"iters":${model.iterations},${pts.mkString(",")}}"""
        }
        val kRoot = math.ceil(math.sqrt(nVec.toDouble)).toInt
        s""","ann_clustered_200k":{"n_vectors":$nVec,""" +
          s""""n_clusters":$nClusters,"dim":$dim,"noise":0.3,""" +
          s""""queries":$nq,${modelCurve(kRoot)},${modelCurve(64)}}"""
      }
      // "ann_clustered_2m" (pseudo-entry): the SECOND decade of the
      // clustered-geometry evidence — 2M vectors (×10 over the 200k
      // block), same cluster/noise recipe at n/100 clusters. Validates
      // the √n centroid rule one decade up (k = ⌈√2M⌉ = 1415: per-probe
      // scan ~n/k ≈ 1.4k rows) and composes it with PQ — the
      // billion-vector production layout (coarse cell prunes the scan,
      // 8×256 codes replace floats for ADC scoring, shortlist re-ranks
      // exactly). Build costs are first-class outputs here: at this
      // size the fit is the investment the probe curve amortizes.
      val annClustered2mJson =
        if (!names.contains("ann_clustered_2m")) "" else {
        val nVec = 2000000L
        val nClusters = 20000
        val dim = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(org.apache.spark.sql.functions.size(col("embedding")))
          .head().getInt(0)
        def gen(ids: org.apache.spark.sql.DataFrame) =
          genClustered(ids, nClusters, dim)
        gen(spark.range(nVec).select(col("id").alias("vec_id")))
          .write.mode("overwrite").parquet(s"$out/annc2m.parquet")
        val corpus = spark.read.parquet(s"$out/annc2m.parquet")
        def timed[A](body: => A): (A, Double) = {
          val t0 = System.nanoTime()
          val r = body
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val kRoot = math.ceil(math.sqrt(nVec.toDouble)).toInt
        val (coarse, coarseSec) = timed(pipeline.Clustering.fitKMeans(
          corpus, "embedding", "vec_id", k = kRoot, maxIter = 4))
        val (pq, pqSec) = timed(pipeline.Clustering.fitPQ(
          corpus, "embedding", "vec_id", m = 8, k = 256, maxIter = 4))
        val (_, buildSec) = timed(
          pipeline.Clustering.buildIvfPq(corpus, "embedding", coarse, pq)
            .write.mode("overwrite").parquet(s"$out/annc2m_ivfpq.parquet"))
        System.err.println(f"[bench] ann_clustered_2m built: coarse(k=$kRoot)=" +
          f"$coarseSec%.1fs pq=$pqSec%.1fs assign+write=$buildSec%.1fs")
        val indexed = spark.read.parquet(s"$out/annc2m_ivfpq.parquet")
        val nq = 8
        val qRows = gen(spark.range(nVec, nVec + nq)
          .select(col("id").alias("vec_id"))).collect()
        val qvs = qRows.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
        val qids = qvs.keys.toSeq.sorted
        val truth = qids.map(id => id -> pipeline.Similarity
          .bruteForceTopK(corpus, "embedding", "vec_id", qvs(id), 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet).toMap
        def curve(tag: String,
            got: (Long, Int) => Set[Long]): String = {
          val pts = Seq(1, 2, 4, 8).map { p =>
            got(qids.head, p) // unmeasured warmup
            val timedPts = qids.map { id =>
              val t0 = System.nanoTime()
              val g = got(id, p)
              ((System.nanoTime() - t0) / 1e9,
                truth(id).intersect(g).size.toDouble / truth(id).size)
            }
            val lat = median(timedPts.map(_._1))
            val rec = timedPts.map(_._2).sum / timedPts.size
            System.err.println(f"[bench] ann_clustered_2m($tag) " +
              f"nprobe=$p lat=$lat%.3fs recall=$rec%.2f")
            s""""nprobe_$p":{"sec":${jd(lat, 3)},"recall":${jd(rec, 2)}}"""
          }
          s""""$tag":{${pts.mkString(",")}}"""
        }
        val ivfCurve = curve("ivf", (id, p) =>
          pipeline.Clustering.ivfTopK(indexed, "embedding", "vec_id",
            qvs(id), coarse, k = 10, nProbe = p)
            .select("vec_id").collect().map(_.getLong(0)).toSet)
        val ivfpqCurve = curve("ivfpq", (id, p) =>
          pipeline.Clustering.ivfPqTopK(indexed, "embedding", "vec_id",
            coarse, pq, qvs(id), k = 10, nProbe = p, shortlist = 100)
            .select("vec_id").collect().map(_.getLong(0)).toSet)
        s""","ann_clustered_2m":{"n_vectors":$nVec,""" +
          s""""n_clusters":$nClusters,"dim":$dim,"noise":0.3,""" +
          s""""k_coarse":$kRoot,"pq_m":8,"pq_k":256,"queries":$nq,""" +
          s""""build_sec":{"coarse":${jd(coarseSec, 1)},"pq":${jd(pqSec, 1)},""" +
          s""""assign_write":${jd(buildSec, 1)}},$ivfCurve,$ivfpqCurve}"""
      }
      def obj(f: ((String, Double, Double, Long, Long, String, String))
          => String) =
        measured.map(m => "\"" + m._1 + "\":" + f(m)).mkString("{", ",", "}")
      val verifyPaths = measured
        .filter(m => m._6.nonEmpty || m._7.nonEmpty)
        .map(m => "\"" + m._1 + "\":{\"at_1x\":\"" + m._6 +
          "\",\"at_100x\":\"" + m._7 + "\"}")
        .mkString("{", ",", "}")
      val line = s"""{"metric":"scale100x","factor":$factor,"reps":$reps""" +
        s""","rows":${rows.map { case (k, v) => "\"" + k + "\":" + v }
          .mkString("{", ",", "}")}""" +
        s""","queries":${obj(_._3.toString)}""" +
        s""","sec_1x":${obj(_._2.toString)}""" +
        s""","ratio_vs_1x":${obj(m =>
          (if (m._2 > 0 && m._3 > 0) m._3 / m._2 else -1.0).toString)}""" +
        s""","rows_out":${obj(_._5.toString)}""" +
        s""","rows_out_1x":${obj(_._4.toString)}""" +
        s""","heap_mx_mb":${Runtime.getRuntime.maxMemory() / (1024 * 1024)}""" +
        s""","suite_attr_1x":${attrs100
          .map { case (k, a, _) => "\"" + k + "\":" + a }
          .mkString("{", ",", "}")}""" +
        s""","suite_attr_100x":${attrs100
          .map { case (k, _, a) => "\"" + k + "\":" + a }
          .mkString("{", ",", "}")}""" +
        s""","verify_paths":$verifyPaths$annJson$annClusteredJson$annClustered2mJson}"""
      poller100.shutdown()
      emitArtifact("GRAFT_BENCH_OUT_X100", "SCALE100X.json", line)
    } finally deleteRecursively(out)
  }

  /** Streaming throughput evidence (GRAFT_BENCH_STREAM=1 — opt-in, never
    * part of the default/driver run): replays the events table — ×10
    * user/id-strided replicas, fed in EVENT-TIME order across 20
    * micro-batches so watermarks advance and state evicts the way a live
    * source drives them — through the stateful streaming operators, and
    * records per-operator throughput, output size, and FINAL STATE ROWS.
    * The suite's streaming specs certify semantics on small batches;
    * this measures the other half of the claim: sustained rows/s and
    * state bounded by watermark/keys, not by stream length. */
  private def runStreamBench(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.EventStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the testdata's ts is TIMESTAMP_NTZ — cast to TIMESTAMP (UTC session)
    // so the collected rows carry java.sql.Timestamp for the MemoryStream
    val baseRows = spark.read.parquet(s"$sfDir/events.parquet")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts").cast("timestamp").as("ts"),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"))
      .orderBy("ts", "event_id").collect()
    val base = baseRows.map(r => (r.getLong(0), r.getTimestamp(1),
      r.getLong(2), r.getString(3), r.getDouble(4)))
    val strideE = base.map(_._1).max + 1
    val strideU = base.map(_._3).max + 1
    // replica count sets the micro-batch size (batch = time-slice ×
    // replicas): 10 → 50k-row batches (the r10 artifact), 100 → 500k-row
    // production-sized batches — the r10 numbers were micro-batch-
    // planning-bound at 50k rows, so throughput must be read at the
    // batch size a real ingest would run
    val replicas = sys.env.getOrElse("GRAFT_BENCH_STREAM_REPLICAS", "10").toInt
    require(replicas > 0, s"GRAFT_BENCH_STREAM_REPLICAS must be > 0, got $replicas")
    val nBatches = 20
    val chunk = (base.length + nBatches - 1) / nBatches
    // each micro-batch = one time-slice of the base table × `replicas`
    // disjoint user universes — ts stays globally non-decreasing across
    // batches, so watermarks move forward and closed windows/sessions
    // flush. Slices are kept un-expanded and replicated LAZILY per batch
    // feed: at 100 replicas an eager Seq of expanded batches is ~10M
    // tuples of driver heap held for the whole 5-operator run, on top of
    // the copy each op's MemoryStream already retains for its lifetime.
    val slices = base.grouped(chunk).toSeq
    def expand(slice: Array[(Long, java.sql.Timestamp, Long, String, Double)])
        : Seq[(Long, java.sql.Timestamp, Long, String, Double)] =
      (0 until replicas).flatMap(i => slice.map(e =>
        (e._1 + i * strideE, e._2, e._3 + i * strideU, e._4, e._5)))
    val rowsIn = base.length.toLong * replicas
    def report(name: String, sec: Double, out: Long, state: Long): String = {
      val rps = (rowsIn / sec).toLong
      System.err.println(f"[bench] stream $name%-16s $sec%6.2f s  " +
        f"$rps%9d rows/s  out=$out state_rows=$state")
      s""""$name":{"sec":${jd(sec, 3)},"rows_per_sec":$rps""" +
        s""","rows_out":$out,"state_rows":$state}"""
    }
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
        .map(_.numRowsTotal).sum
    // shared feed-and-measure tail: expand each slice lazily, push it
    // through the op's MemoryStream, then read output/state and release
    // the memory sink (sb_dedup alone pins 1M output rows in driver
    // memory for the rest of the run otherwise)
    def drain(name: String, q: org.apache.spark.sql.streaming.StreamingQuery,
        feed: Seq[(Long, java.sql.Timestamp, Long, String, Double)] => Unit)
        : String =
      // stop + drop in finally: a failing op must not leak its running
      // query and memory sink into the remaining ops' measurements
      try {
        val t0 = System.nanoTime()
        slices.foreach { s => feed(expand(s)); q.processAllAvailable() }
        val sec = (System.nanoTime() - t0) / 1e9
        val out = spark.table(s"sb_$name").count()
        val st = stateRows(q)
        report(name, sec, out, st)
      } finally {
        try q.stop() finally {
          try spark.catalog.dropTempView(s"sb_$name")
          catch { case _: Throwable => () }
        }
      }
    def runDf(name: String, mode: OutputMode)(
        mk: DataFrame => DataFrame): String = {
      val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      val q = EventStream.startToMemory(mk(df), s"sb_$name", mode)
      drain(name, q, b => mem.addData(b: _*))
    }
    def runTyped(name: String, mode: String)(
        mk: org.apache.spark.sql.Dataset[EventStream.Event] =>
          DataFrame): String = {
      val mem = MemoryStream[EventStream.Event]
      val q = mk(mem.toDS()).writeStream.format("memory")
        .queryName(s"sb_$name").outputMode(mode).start()
      drain(name, q, b => mem.addData(
        b.map(e => EventStream.Event(e._1, e._2, e._3, e._4, e._5)): _*))
    }
    val ops = Seq(
      // tumbling watermark aggregate: state = open windows × event types
      runDf("windowed_counts", OutputMode.Update())(df =>
        EventStream.windowedCounts(df, "1 minute", "5 minutes")),
      // exact first-arrival dedup: state bounded by the watermark horizon
      runDf("dedup", OutputMode.Append())(df =>
        EventStream.dedupStream(df, Seq("event_id"), "10 minutes")),
      // native session windows: state = ACTIVE sessions only
      runDf("session_windows", OutputMode.Append())(df =>
        EventStream.sessionWindows(df, gap = "30 minutes",
          watermark = "30 minutes")),
      // mapGroupsWithState running sessions: state = one row per user
      runTyped("sessionize", "update")(ds => EventStream.sessionize(ds,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
        .toDF()),
      // flatMapGroupsWithState prequential anomaly: 3 doubles per user
      // flatMapGroupsWithState is declared Append inside the operator
      runTyped("anomaly", "append")(ds =>
        EventStream.anomalyStream(ds, minN = 5, zThresh = 3.0).toDF()))
    val line = s"""{"metric":"stream_bench","rows_in":$rowsIn""" +
      s""","batches":${slices.size}""" +
      s""","rows_per_batch":${rowsIn / slices.size.max(1)}""" +
      s""","ops":{${ops.mkString(",")}}}"""
    // mode-specific artifact variable: sharing GRAFT_BENCH_OUT with the
    // contract bench would let a wrapper that exports it clobber
    // BENCH_LAST.json with a different-schema line
    emitArtifact("GRAFT_BENCH_OUT_STREAM", "STREAMBENCH.json", line)
  }

  /** CSV text-path throughput probe (GRAFT_BENCH_CSV=1 — opt-in, never
    * part of the default/driver run): 2M-row / 5-col / ~10%-quoted file
    * generated deterministically in tmp, measured against Spark's
    * univocity reader as the baseline. The graft split path pays for
    * exact reference parity (ragged width model, empty-vs-missing); the
    * probe records exactly what that costs and what the two levers give
    * back: the automatic query-derived width hint
    * ([[graft.engine.QueryWidth]] — skips the width-inference scan on
    * star/NF-free positional queries) and the explicit
    * `spark.graft.csv.declaredWidth`. */
  private def runCsvBench(spark: SparkSession, reps: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_csvbench")
    try {
      val f = s"$dir/big.csv"
      val sb = new java.lang.StringBuilder(120 << 20)
      val rnd = new java.util.Random(42)
      var i = 0
      while (i < 2000000) {
        sb.append(i).append(',')
        sb.append(rnd.nextInt(200) / 10.0).append(',')
        val w = "word" + rnd.nextInt(1000)
        if (rnd.nextInt(10) == 0) sb.append('"').append(w).append(",x\"")
        else sb.append(w)
        sb.append(',').append(rnd.nextInt(99)).append(',')
        sb.append("tag").append(rnd.nextInt(50)).append('\n')
        i += 1
      }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(f), sb.toString)
      val bytes = java.nio.file.Files.size(java.nio.file.Paths.get(f))
      var rows = -1L
      def t(body: => Long): Double = {
        val m = medianOrErr(timedReps(reps, () => { rows = body; () }))
        m
      }
      def entry(name: String, sec: Double): String = {
        System.err.println(f"[bench] csv $name%-24s $sec%6.3f s rows=$rows")
        s""""$name":{"sec":${jd(sec, 3)},"rows":$rows}"""
      }
      val q = "select a1, a3 where cast(a4 as int) > 50"
      val entries = Seq(
        entry("univocity_full", t {
          spark.read.option("header", "false").csv(f).count() }),
        entry("univocity_filtered", t {
          spark.read.option("header", "false").csv(f)
            .select(col("_c0"), col("_c2")).filter(col("_c3") > 50).count() }),
        entry("graft_full_star", t {
          // the CLI-shaped path (queryCsvImpl): headerless positional-only
          // queries read via the single-scan ragged model — no
          // width-inference pass (the library wrapper keeps the projected
          // shape, so it is not the surface this probe measures)
          Graft.queryCsvImpl(spark, "select * where cast(a4 as int) > 50", f,
            ",", "quoted", hasHeader = false).count() }),
        entry("graft_filtered_hinted", t {
          Graft.queryCsv(spark, q, f, ",", "quoted", hasHeader = false)
            .count() }),
        entry("graft_filtered_cli", t {
          // CLI surface: positional-only headerless queries route through
          // the single-scan ragged model (no __pos/header machinery at all)
          Graft.queryCsvImpl(spark, q, f, ",", "quoted", hasHeader = false)
            .count() }),
        entry("graft_filtered_declared", {
          spark.conf.set(s"spark.graft.csv.declaredWidth.$f", "5")
          try t {
            Graft.queryCsv(spark, q, f, ",", "quoted", hasHeader = false)
              .count() }
          finally spark.conf.unset(s"spark.graft.csv.declaredWidth.$f")
        }))
      emitArtifact("GRAFT_BENCH_OUT_CSV", "CSVBENCH.json",
        s"""{"metric":"csv_bench","rows_in":2000000,"bytes":$bytes""" +
          s""","reps":$reps,"probes":{${entries.mkString(",")}}}""")
    } finally deleteRecursively(dir)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core: the contract's bench environment is local[32];
    // a hardcoded small default silently ran the round-4 bench at local[4]
    // and doubled the reported time of every parallel-heavy query
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "3").toInt.max(1)
    // shuffle partitions default to the core count (the contract setting);
    // GRAFT_BENCH_SHUFFLE overrides for scale experiments — a ×100 corpus
    // on 32 fixed partitions measures per-partition hash/sort pressure a
    // real cluster (whose partition count scales with the data) never sees
    val shufflePartitions = sys.env.getOrElse("GRAFT_BENCH_SHUFFLE", cpus)
    // AQE's coalescing floor (default 1 MB) assumes stage cost is
    // byte-proportional; the pair-verify / candidate-dedup stages here
    // are CPU-dense over FEW compressed bytes (8-byte hash pairs, array
    // intersects), and a 1 MB floor coalesced them to 1-2 tasks on a
    // 32-core session (measured: q_ngram_pairs' verify stage ran 2 tasks
    // over 2 MB of shuffle for seconds of CPU). 64 KB keeps those stages
    // at cluster parallelism while leaving real-volume runs untouched —
    // at the ×10/×100 decades the size-derived target (total/parallelism,
    // hundreds of MB) dominates and the floor never binds. Env-overridable
    // so scale experiments can restore the default.
    val aqeMinPartition = sys.env.getOrElse(
      "GRAFT_BENCH_AQE_MIN_PARTITION", "64k")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        aqeMinPartition)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: codegen + shuffle machinery, not counted
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    // machine-speed fingerprint: a fixed CPU-bound microbenchmark run
    // before AND after the suite, emitted as `load_ref` — lets a reader
    // (and the >2× guard below) separate "this machine is N× slower
    // today" from "this query regressed" mechanically instead of by
    // archaeology (round-8 verdict: that distinction consumed most of
    // the bench analysis)
    def loadProbe(): Double = median((1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(100000000L).selectExpr("sum(id % 7)").collect()
      (System.nanoTime() - t0) / 1e9
    })
    // GRAFT_BENCH_X100_ONLY: one-off ×100 evidence mode — runs ONLY the
    // named queries (1× and ×100), writes its own artifact, and exits.
    // Dispatched BEFORE the load probe: the probe's result feeds the
    // suite-vs-baseline guard, which the opt-in modes don't use.
    sys.env.get("GRAFT_BENCH_X100_ONLY").map(_.split(",").toSet) match {
      case Some(names) =>
        runScale100(spark, sfDir, reps, names)
        spark.stop()
        return
      case None => ()
    }
    // GRAFT_BENCH_STREAM=1: one-off streaming-throughput evidence mode
    if (sys.env.get("GRAFT_BENCH_STREAM").contains("1")) {
      runStreamBench(spark, sfDir)
      spark.stop()
      return
    }
    // GRAFT_BENCH_CSV=1: one-off CSV text-path throughput probe
    if (sys.env.get("GRAFT_BENCH_CSV").contains("1")) {
      runCsvBench(spark, reps)
      spark.stop()
      return
    }
    val loadBefore = loadProbe()
    // GRAFT_BENCH_ONLY=q_a,q_b restricts the run (local iteration);
    // GRAFT_BENCH_VERBOSE=1 prints every rep to stderr (regression triage)
    val only = sys.env.get("GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val verbose = sys.env.get("GRAFT_BENCH_VERBOSE").contains("1")
    // GRAFT_BENCH_X10_ONLY=q_a,q_b: iteration path for the ×10 block —
    // skips the 1× suite and runs only the named scale10x entries
    val x10only = sys.env.get("GRAFT_BENCH_X10_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .filter(_ => x10only.isEmpty)
    // per-query attribution plumbing (r11 verdict: a 25× in-suite
    // excursion adjudicated to "noise" with no attribution fields is
    // not an explanation — every flag must carry gc/shuffle/disk/storage
    // evidence for OR against suite-context pressure)
    val shuffleListener = new ShuffleListener
    spark.sparkContext.addSparkListener(shuffleListener)
    val tmpPoller = new TmpPeakPoller(java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp")))
    tmpPoller.start()
    val results = selected.map { case (name, fn) =>
      val ((med, rows), attr) =
        attributed(spark, shuffleListener, tmpPoller) {
          // one unmeasured warmup per query (JIT + page cache), then
          // timed reps
          try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
          // result row count rides along from the last rep: output
          // volume is the denominator every per-query ratio needs (a
          // pair op whose time doubled because its OUTPUT doubled is
          // not a regression)
          var rows = -1L
          val times =
            timedReps(reps, () => { rows = fn(spark, sfDir).count(); () })
          if (verbose) System.err.println(
            s"[bench] $name reps=${times.map(t => f"$t%.3f").mkString(",")}")
          (medianOrErr(times), rows)
        }
      (name, med, rows, attr)
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rowsOut = results.map { case (k, _, r, _) => "\"" + k + "\":" + r }
      .mkString("{", ",", "}")
    // errored queries (-1 marker) are excluded from the total and listed
    // explicitly — a time-to-fail must not masquerade as throughput
    val errored = results.collect { case (k, v, _, _) if v < 0 => k }
    val total = results.map(_._2).filter(_ >= 0).sum
    // Standing 10×-volume block (full runs only): the text operators
    // re-run against a materialized ×10 documents table so sublinearity
    // regressions are caught automatically, not just in one-off smokes.
    // Ratios are ×10-median / 1×-median: ≈1 means parallelism-absorbed,
    // <10 sublinear. Replica text is cipher-perturbed (see replicate10)
    // so pair volume scales ~linearly with the corpus — the ratio
    // measures sketch+join cost, not a planted-duplicate explosion.
    val scale10x = if (only.isEmpty) {
      import org.apache.spark.sql.functions.{col, lit, max, translate, upper, when}
      // queries re-run verbatim against the ×10 replicas (their 1×
      // medians are already in `results`)
      val scaleQs = Seq("q_top_ngrams", "q_bm25", "q_lm_score", "q_spans",
        "q_minhash_pairs", "q_line_stats",
        "q_cap_source", "q_dsir_weights", "q_char_entropy",
        "q_mix_temp", "q_gopher", "q_boilerplate", "q_split",
        "q_hll_gate", "q_pmi", "q_template_dedup",
        "q_cat_drift", "q_psi", "q_ks", "q_canary",
        // round-9 widening (cipher-perturbed replicas keep per-term df
        // flat, so tfidf postings scale linearly, not df²)
        "q_nb_quality", "q_tfidf_pairs", "q_keywords", "q_trigram",
        "q_script",
        // round-10 widening: the suite's top cost centers — iterative /
        // rank / graph shapes where a 100× scale-up dies first (r9
        // verdict: these carried no scaling evidence at all). Replica
        // text is cipher-perturbed, so the similarity graph's pair/edge
        // volume stays ~linear and the ratios measure the operators.
        "q_triangles", "q_cc_best", "q_cc_dedup", "q_safe_split",
        "q_auc", "q_lr_step", "q_search_idx", // documents replica
        // round-12: NR over a shuffle-fed pipe stage — measures whether
        // the two-pass persist of the stage input dominates at volume
        "q_pipe_nr", // lineitem replica
        "q_interval", "q_overlap", "q_rolling", "q_session_window",
        "q_merge_intervals", "q_paths", "q_anomaly",
        "q_changepoint",
        "q_markov", "q_ewma", "q_dau", "q_trend", // events replica
        "q_knn_join", "q_sq8_topk", "q_hardneg", // embeddings replica
        "q_skyline", // lineitem replica
        "q_skyline3") // part replica
        .filter(n => x10only.forall(_.contains(n)))
      /** ×10 a table by disjoint-id replication: each replica offsets the
        * id columns by max(id)+1 — NOT the row count; ids are only
        * disjoint across replicas if the stride clears the real max.
        *
        * `textCol`: replica i>0 additionally rewrites the text through a
        * per-replica letter-rotation cipher (translate over a 10-letter
        * alphabet, rotation i — all 10 rotations distinct). Without it,
        * replicas carry IDENTICAL text, every document gains 9 planted
        * near-dups, and pair-producing queries measure a ~replica²
        * OUTPUT explosion instead of sketch+join scaling (round-8
        * verdict: q_minhash_pairs hit 63× on the driver for exactly
        * this artifact-design reason — same flaw the round-8
        * contain_bloom fix removed). The cipher keeps length, token
        * boundaries and within-replica duplicate structure intact, so
        * ×10 means "10× the corpus", not "every doc duplicated 10×". */
      def replicate10(table: String, out: java.nio.file.Path,
          idCols: Seq[String], textCol: Option[String] = None): Long = {
        val base = spark.read.parquet(s"$sfDir/$table.parquet")
        val strides = idCols.map(c =>
          c -> (base.agg(max(col(c))).head().getLong(0) + 1))
        val alpha = "aeiounstrl"
        (0 until 10).map { i =>
          val idShifted = strides.foldLeft(base) { case (d, (c, st)) =>
            d.withColumn(c, col(c) + lit(i * st))
          }
          textCol match {
            case Some(tc) if i > 0 =>
              idShifted.withColumn(tc,
                translate(col(tc), alpha, alpha.drop(i) + alpha.take(i)))
            case _ => idShifted
          }
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$out/$table.parquet")
        base.count() * 10
      }
      def timed(name: String, run: () => Unit): Double = {
        try run() catch { case _: Throwable => () } // unmeasured warmup
        val times = timedReps(reps, run)
        if (verbose) System.err.println(
          s"[bench] scale10x $name reps=${times.map(t => f"$t%.3f").mkString(",")}")
        medianOrErr(times)
      }
      // attributed twin — the measured window (warmup + reps) carries the
      // same gc/shuffle/spill/tmp evidence as the 1× suite (r14 verdict
      // item 1a: two 40× excursions rode through this block with zero
      // attribution fields, so nothing in the artifact could distinguish
      // a candidate-volume explosion from a plan flip from memory
      // pressure)
      def timedA(name: String, run: () => Unit): (Double, Attribution) =
        attributed(spark, shuffleListener, tmpPoller)(timed(name, run))
      val x10path = java.nio.file.Files.createTempDirectory("graft_x10")
      val (n, rows, guard10Json, verdicts10) = try {
        val n = replicate10("documents", x10path, Seq("doc_id"),
          textCol = Some("text"))
        // events: stride user_id too, so per-user spans multiply instead
        // of widening — q_overlap's input row count really grows ×10
        replicate10("events", x10path, Seq("event_id", "user_id"))
        replicate10("embeddings", x10path, Seq("vec_id"))
        replicate10("lineitem", x10path, Seq("l_orderkey"))
        replicate10("part", x10path, Seq("p_partkey"))
        // 1× output rows come from the main suite's results map — the
        // ×10 entries re-run the same fns verbatim, so the pair is the
        // self-explaining denominator the ×100 artifacts already carry
        val rows1x = results.map { case (k, _, r, _) => k -> r }.toMap
        val qRows = scaleQs.map { name =>
          val fn = SparkEntry.queries(name)
          // output row count rides along from the final rep — for the
          // pair/edge-producing entries a ×10 time ratio is only
          // readable next to the ×10 output ratio (r9 verdict: the 8.36×
          // q_minhash_pairs number needed exactly this denominator)
          var rows10 = -1L
          val (t, attr) = timedA(name,
            () => { rows10 = fn(spark, x10path.toString).count(); () })
          (name, t, rows10, rows1x.getOrElse(name, -1L), attr)
        }
        // ops whose contract-query shape doesn't scale meaningfully (or
        // that have no 1×-bench twin in `results`): time BOTH sides here.
        // full-corpus snapshot diff: q_snapshot_diff's contract query
        // pins a < 400-id slice (correctness fixture, doesn't grow with
        // the replica), so its scaling twin diffs the WHOLE ×10 corpus
        // against a perturbed copy of itself — the real nightly shape
        def snapdiff(dir: String): Long = {
          val d = spark.read.parquet(s"$dir/documents.parquet")
          val a = d.select("doc_id", "text")
          val b = d.select(col("doc_id"),
            when(col("doc_id") % 7 === 0, upper(col("text")))
              .otherwise(col("text")).alias("text"))
          pipeline.Dedup.snapshotDiffSummary(a, b, "doc_id", Seq("text"))
            .count()
        }
        // z-order write: the one-range-exchange layout claim, measured on
        // the replicated events table (curve = user_id × time)
        def zwrite(dir: String): Unit = {
          val d = spark.read.parquet(s"$dir/events.parquet")
            .select("event_id", "ts", "user_id", "value")
          val out = java.nio.file.Files.createTempDirectory("graft_zw")
          try pipeline.Layout.writeZOrdered(d, Seq("user_id", "ts"),
            s"$out/z", numFiles = 16)
          finally deleteRecursively(out)
        }
        // IVF-PQ: models fit ONCE on the 1× corpus (fixture-scale driver
        // state), both corpora pre-encoded OUTSIDE the timer — the timed
        // op is the search itself (probe filter + ADC scan + re-rank),
        // the per-query cost that must stay sublinear at 100 TB
        // lazy: fit + encode only run if the ivfpq_search entry is
        // actually selected (GRAFT_BENCH_X10_ONLY iteration runs skip it)
        lazy val ivfModels = {
          val emb1x = spark.read.parquet(s"$sfDir/embeddings.parquet")
          val coarse = pipeline.Clustering.fitKMeans(
            emb1x, "embedding", "vec_id", k = 8, maxIter = 4)
          val pqm = pipeline.Clustering.fitPQ(
            emb1x, "embedding", "vec_id", m = 16, k = 16, maxIter = 4)
          val qv = emb1x.filter(col("vec_id") === 0)
            .select("embedding").head().getSeq[Float](0)
          pipeline.Clustering.buildIvfPq(emb1x, "embedding", coarse, pqm)
            .write.mode("overwrite").parquet(s"$x10path/codes_1x.parquet")
          pipeline.Clustering.buildIvfPq(
              spark.read.parquet(s"$x10path/embeddings.parquet"),
              "embedding", coarse, pqm)
            .write.mode("overwrite").parquet(s"$x10path/codes_10x.parquet")
          (coarse, pqm, qv)
        }
        def search(codes: String): Unit = {
          val (coarse, pqm, qv) = ivfModels
          pipeline.Clustering.ivfPqTopK(
            spark.read.parquet(s"$x10path/$codes"), "embedding", "vec_id",
            coarse, pqm, qv, k = 10, nProbe = 4, shortlist = 100).count()
          ()
        }
        // decontamination at scale: the bench set is FIXED (benchmarks
        // don't grow with the corpus) — only the train side rides the
        // ×10 replica. Re-running q_contain_bloom verbatim against the
        // replicas would multiply the bench side too, and since replicas
        // carry identical text every true pair appears replica² times —
        // a 100× OUTPUT blowup that swamps the ratio (measured 20×)
        // without saying anything about the operator's scan cost.
        def containBloom(trainDir: String): Long = {
          val tr = spark.read.parquet(s"$trainDir/documents.parquet")
            .filter(col("doc_id") % 7 =!= 0)
          val be = spark.read.parquet(s"$sfDir/documents.parquet")
            .filter(col("doc_id") % 7 === 0)
          pipeline.Dedup.crossContainmentBloom(tr, be, "text", "doc_id",
            k = 2, threshold = 0.8).count()
        }
        val ownRows = Seq[(String, () => Long, () => Long)](
          ("snapshot_diff_full",
            () => snapdiff(sfDir), () => snapdiff(x10path.toString)),
          ("zorder_write_events",
            () => { zwrite(sfDir); -1L },
            () => { zwrite(x10path.toString); -1L }),
          ("ivfpq_search",
            () => { search("codes_1x.parquet"); -1L },
            () => { search("codes_10x.parquet"); -1L }),
          ("contain_bloom_fixed_bench",
            () => containBloom(sfDir), () => containBloom(x10path.toString))
        ).filter { case (name, _, _) => x10only.forall(_.contains(name)) }
          .map { case (name, run1, run10) =>
          var r1 = -1L
          var r10 = -1L
          val t1 = timed(s"$name(1x)", () => { r1 = run1(); () })
          val (t10, attr) = timedA(name, () => { r10 = run10(); () })
          (name, t10, if (t1 > 0 && t10 > 0) t10 / t1 else -1.0, r10, r1,
            attr, () => { run10(); () })
        }
        val all = qRows.map { case (k, v, r, r1, a) =>
          val fn = SparkEntry.queries(k)
          (k, v, -2.0, r, r1, a,
            () => { fn(spark, x10path.toString).count(); () })
        } ++ ownRows
        // ---- ×10 guard + self-adjudication (r14 verdict item 1a) ----
        // Same discipline as the 1× suite: diff each ×10 median against
        // the committed quiet-machine baseline's scale10x.queries,
        // normalize by the block's OWN cross-query median ratio (the ~50
        // ×10 entries are their own robust load estimator — a uniformly
        // contended machine moves all of them together, a real excursion
        // moves one), flag outside [0.5×, 2×], and adjudicate every flag
        // with an isolated re-run INSIDE this block while the replica
        // tables still exist. The r14 driver artifact is exactly the
        // input this closes: q_spans 64×, q_minhash_pairs 65× with no
        // flag, no attribution, and no isolated sample to adjudicate.
        val basePath10 = java.nio.file.Paths.get(sys.env.getOrElse(
          "GRAFT_BENCH_BASELINE", "BENCH_BASELINE_MEDIANS.json"))
        val prev10 = previousScale10xMedians(basePath10)
        val med10 = all.map { case (k, v, _, _, _, _, _) => (k, v) }
        val medianRatio10 = crossQueryMedianRatio(med10, prev10)
        val lf10 =
          if (medianRatio10 > 0) medianRatio10.max(1.0) else 1.0
        val moved10 = flaggedMoves(med10, prev10, lf10)
        if (moved10.nonEmpty) System.err.println(
          s"[bench] WARNING: ${moved10.size} scale10x entries moved >2x " +
          s"vs baseline at load_factor $lf10: " +
          moved10.map { case (k, _, r) => f"$k x$r%.2f" }.mkString(", "))
        val rerun = all.map { case (k, _, _, _, _, _, f) => k -> f }.toMap
        val (adjJson10, verdicts10) =
          if (moved10.isEmpty) ("", Map.empty[String, String]) else {
            spark.sharedState.cacheManager.clearCache()
            System.gc()
            val entries10 = moved10.map { case (k, suiteSec, suiteRatio) =>
              val (iso, isoAttr) = timedA(s"$k(iso)", rerun(k))
              val isoRatio = prev10.get(k).filter(_ > 0)
                .map(p => iso / p / lf10).getOrElse(-1.0)
              val v0 = firstVerdict(suiteRatio, iso, isoRatio)
              val (secondJson, verdict) =
                if (v0 != "inconsistent") ("", v0) else {
                  System.gc()
                  val (iso2, _) = timedA(s"$k(iso2)", rerun(k))
                  val iso2Ratio = prev10.get(k).filter(_ > 0)
                    .map(p => iso2 / p / lf10).getOrElse(-1.0)
                  (s""","isolated2_sec":${jd(iso2, 3)},"isolated2_ratio":${jd(iso2Ratio, 2)}""",
                    secondVerdict(isoRatio, iso2, iso2Ratio))
                }
              System.err.println(
                f"[bench] adjudicate scale10x $k: suite=$suiteSec%.3fs " +
                f"(x$suiteRatio%.2f) isolated=$iso%.3fs (x$isoRatio%.2f) " +
                s"-> $verdict")
              ("\"" + k + "\":" +
                s"""{"suite_sec":${jd(suiteSec, 3)},"suite_ratio":${jd(suiteRatio, 2)},""" +
                s""""isolated_sec":${jd(iso, 3)},"isolated_ratio":${jd(isoRatio, 2)}$secondJson,""" +
                s""""verdict":"$verdict","isolated_attr":${isoAttr.json}}""",
                k -> verdict)
            }
            (entries10.map(_._1).mkString(""","adjudication":{""", ",", "}"),
              entries10.map(_._2).toMap)
          }
        val movedJson10 = moved10
          .map { case (k, _, r) => "\"" + k + "\":" + jd(r, 2) }
          .mkString(""","deltas_gt_2x":{""", ",", "}")
        val guard10 =
          s""","load_factor":${jd(lf10, 2)},"median_ratio":${jd(medianRatio10, 2)}""" +
          s""","baseline_medians":${prev10.size},"flags_gt_2x":${moved10.size}""" +
          movedJson10 + adjJson10
        (n, all.map { case (k, v, own, r, r1, a, _) => (k, v, own, r, r1, a) },
          guard10, verdicts10)
      } finally deleteRecursively(x10path)
      val base1x = results.map { case (k, v, _, _) => k -> v }.toMap
      val sq = rows.map { case (k, v, _, _, _, _) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val srows = rows.map { case (k, _, _, r, _, _) => "\"" + k + "\":" + r }
        .mkString("{", ",", "}")
      val srows1 = rows.map { case (k, _, _, _, r1, _) => "\"" + k + "\":" + r1 }
        .mkString("{", ",", "}")
      val sattr = rows.map { case (k, _, _, _, _, a) => "\"" + k + "\":" + a.json }
        .mkString("{", ",", "}")
      // ratio is an error marker unless BOTH sides timed cleanly; -2.0
      // sentinel = "1× median lives in the main results map"
      val ratios = rows.map { case (k, v, own, _, _, _) =>
        "\"" + k + "\":" + (if (v < 0) -1.0
          else if (own != -2.0) own
          else base1x.get(k).filter(_ > 0).map(b => v / b).getOrElse(-1.0))
      }.mkString("{", ",", "}")
      (s""","scale10x":{"rows":$n,"queries":$sq,"rows_out":$srows,"rows_out_1x":$srows1,"ratio_vs_1x":$ratios,"suite_attr":$sattr$guard10Json}""",
        verdicts10)
    } else ("", Map.empty[String, String])
    // ANN probe/recall frontier (full runs only): recall@10 and median
    // latency of the DEFAULT-dial IVF search (Similarity.buildIvf —
    // k-means centroids, k = ⌈√n⌉) as nProbe sweeps 1→8. Model fit,
    // index build and the brute-force ground truth sit OUTSIDE the
    // timers: index construction amortizes across queries in production;
    // the timed op is the per-query search. TWO geometries: the real
    // testdata corpus (isotropic random vectors — recall there is
    // fraction-bound, the honest ceiling that geometry allows, recorded
    // as such) and a same-size CLUSTERED synthetic corpus (the structure
    // real embedding corpora have), where the √n dial must deliver
    // high recall at nProbe=1 — the positive evidence the isotropic
    // corpus cannot provide. Cluster/noise recipe matches the x100
    // ann_clustered block.
    val annFrontier = if (only.isEmpty && x10only.isEmpty) {
      import org.apache.spark.sql.functions.{col, lit, expr}
      val ivfPath = java.nio.file.Files.createTempDirectory("graft_ivf")
      def sweep(tag: String, corpus: org.apache.spark.sql.DataFrame)
          : String = {
        val index = pipeline.Similarity.buildIvf(corpus, "embedding", "vec_id")
        index.cells
          .write.mode("overwrite").parquet(s"$ivfPath/ivf_$tag.parquet")
        val ivf = spark.read.parquet(s"$ivfPath/ivf_$tag.parquet")
        val k = index.model.centroids.size
        val qv = corpus.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        val truth = pipeline.Similarity
          .bruteForceTopK(corpus, "embedding", "vec_id", qv, 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val pts = Seq(1, 2, 4, 8).map { p =>
          def run(): Unit = {
            pipeline.Clustering.ivfTopK(
              ivf, "embedding", "vec_id", qv, index.model, k = 10, nProbe = p)
              .count()
            ()
          }
          run() // unmeasured warmup
          val t = medianOrErr(timedReps(reps, () => run()))
          val got = pipeline.Clustering.ivfTopK(
            ivf, "embedding", "vec_id", qv, index.model, k = 10, nProbe = p)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          val rec = truth.intersect(got).size.toDouble / truth.size
          if (verbose) System.err.println(
            f"[bench] ann_frontier($tag) k=$k nprobe=$p sec=$t%.3f recall=$rec%.2f")
          s""""nprobe_$p":{"sec":$t,"recall":$rec}"""
        }
        s""""$tag":{"k_centroids":$k,${pts.mkString(",")}}"""
      }
      try {
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val nVec = emb.count()
        val dim = emb.select(org.apache.spark.sql.functions
          .size(col("embedding"))).head().getInt(0)
        val nClusters = math.max(2, (nVec / 100).toInt)
        // clustered synthetic twin: same recipe as the ×100
        // ann_clustered evidence blocks
        val clustered = genClustered(
          spark.range(nVec).select(col("id").alias("vec_id")),
          nClusters, dim)
        s""","ann_frontier":{"note":"isotropic = real testdata (no cluster structure; recall is probed-fraction-bound there), clustered = same-size synthetic with real-corpus structure",""" +
          s"${sweep("isotropic", emb)},${sweep("clustered", clustered)}}"
      } finally deleteRecursively(ivfPath)
    } else ""
    val errJson = if (errored.nonEmpty)
      errored.map("\"" + _ + "\"").mkString(""","errors":[""", ",", "]") else ""
    // Self-defense against loaded-machine artifacts (round-7 verdict: the
    // committed final run showed 4–13× phantom regressions on untouched
    // queries and nothing caught it): diff this run's medians against the
    // builder-committed quiet-machine baseline and surface every >2× move
    // — in the JSON (so the artifact itself confesses) and on stderr (so
    // it's visible at commit time). Ratio > 1 = slower than the baseline,
    // < 1 = faster; both directions flag, because a >2× "win" is equally
    // likely to mean the BASELINE run was the loaded one. Ratios are
    // first divided by `load_factor` (this machine's load_ref over the
    // baseline's — floored at 1, so a fast machine never loosens the
    // guard): a uniformly 3×-slower box stops flagging every query while
    // a genuinely regressed one still trips.
    val loadAfter = loadProbe()
    val basePath = java.nio.file.Paths.get(sys.env.getOrElse(
      "GRAFT_BENCH_BASELINE", "BENCH_BASELINE_MEDIANS.json"))
    val prev = previousMedians(basePath)
    val prevLoad = previousLoadRef(basePath)
    val probeFactor =
      if (prevLoad > 0) (((loadBefore + loadAfter) / 2) / prevLoad).max(1.0)
      else 1.0
    // per-suite normalization derived from the queries themselves, with
    // the probe pair only as an upper bound (see effectiveLoadFactor —
    // the r13 driver run's asymmetric probes over-corrected 2.4× and
    // flagged 162 unchanged queries)
    val medianRatio = crossQueryMedianRatio(
      results.map { case (k, v, _, _) => (k, v) }, prev)
    val loadFactor = effectiveLoadFactor(probeFactor, medianRatio)
    // guard-armed confession (r12 verdict item 1): a committed baseline
    // that loads suspiciously few medians means the guard is effectively
    // disarmed — say so loudly at run time, and record the count in the
    // artifact below so the "zero flags" claim is auditable from the
    // artifact alone.
    if (java.nio.file.Files.exists(basePath) && prev.size < 180)
      System.err.println(s"[bench] WARNING: baseline $basePath parsed to " +
        s"only ${prev.size} medians — the >2x guard is " +
        (if (prev.isEmpty) "DISARMED" else "weakened"))
    val moved = flaggedMoves(
      results.map { case (k, v, _, _) => (k, v) }, prev, loadFactor)
    if (moved.nonEmpty) System.err.println(
      s"[bench] WARNING: ${moved.size} queries moved >2x vs baseline " +
      s"$basePath at load_factor $loadFactor " +
      "(loaded machine? real regression?): " +
      moved.map { case (k, _, r) => f"$k x$r%.2f" }.mkString(", "))
    val movedJson = moved.map { case (k, _, r) => "\"" + k + "\":" + jd(r, 2) }
      .mkString(""","deltas_gt_2x":{""", ",", "}")
    // Self-ADJUDICATION of every flag (round-9 verdict: a >2× number
    // alone cannot tell a real plan regression from suite-context decay
    // — GC / block-manager state accumulated over ~190 queries — and
    // settling that took driver-side archaeology). Each flagged query
    // re-runs HERE, post-suite, after dropping cached plan state: if its
    // isolated median is back inside the guard band the artifact itself
    // proves the flag was suite-context noise; if it reproduces, it is a
    // real regression and says so. Speed-up flags (<0.5×) adjudicate the
    // same way — "reproduced" there means the committed baseline is
    // stale, not that the code regressed.
    val (adjudication, flagVerdicts) =
      if (moved.isEmpty) ("", Map.empty[String, String]) else {
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      // normalization for the ISOLATED runs is probed HERE, temporally
      // local to them (r13 driver run: isolated re-runs on the by-then
      // quiet machine were divided by the suite's stale 2.75 factor,
      // minting 154 false speedup_confirmed verdicts for unchanged code)
      val isoProbe = loadProbe()
      val isoLoadFactor =
        if (prevLoad > 0) (isoProbe / prevLoad).max(1.0) else 1.0
      // DIRECTION-AWARE verdicts (round-10 verdict: the old vocabulary
      // collapsed direction — q_orphans flagged ×0.5 in-suite, re-ran
      // ×3.05 isolated, and "reproduced" stamped a self-contradicting
      // record). A flag and its isolated re-run must agree in DIRECTION
      // before either verdict word applies; a disagreement is
      // "inconsistent", which triggers exactly one more isolated round
      // with both samples recorded — the artifact then carries the full
      // evidence either way.
      def isolated(k: String,
          fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
          : (Double, Double, Attribution) = {
        val (iso, attr) = attributed(spark, shuffleListener, tmpPoller) {
          try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
          medianOrErr(
            timedReps(reps, () => { fn(spark, sfDir).count(); () }))
        }
        val isoRatio = prev.get(k).filter(_ > 0)
          .map(p => iso / p / isoLoadFactor).getOrElse(-1.0)
        (iso, isoRatio, attr)
      }
      val suiteAttr = results.map { case (k, _, _, a) => k -> a }.toMap
      val entries = moved.map { case (k, suiteSec, suiteRatio) =>
        val fn = SparkEntry.queries(k)
        val (iso, isoRatio, isoAttr) = isolated(k, fn)
        val v0 = firstVerdict(suiteRatio, iso, isoRatio)
        val (secondJson, verdict) = if (v0 != "inconsistent") ("", v0) else {
          System.gc()
          val (iso2, iso2Ratio, _) = isolated(k, fn)
          val v1 = secondVerdict(isoRatio, iso2, iso2Ratio)
          (s""","isolated2_sec":${jd(iso2, 3)},"isolated2_ratio":${jd(iso2Ratio, 2)}""",
            v1)
        }
        System.err.println(f"[bench] adjudicate $k: suite=$suiteSec%.3fs " +
          f"(x$suiteRatio%.2f) isolated=$iso%.3fs (x$isoRatio%.2f) -> $verdict")
        // every verdict — suite_context_noise especially — carries the
        // suite-window vs isolated-window attribution so a flag is
        // explainable from the artifact alone (gc pressure? a 30 GB
        // shuffle? /tmp at peak? leaked cached partitions?)
        val json =
          "\"" + k + "\":" + s"""{"suite_sec":${jd(suiteSec, 3)},"suite_ratio":${jd(suiteRatio, 2)},""" +
          s""""isolated_sec":${jd(iso, 3)},"isolated_ratio":${jd(isoRatio, 2)}$secondJson,"verdict":"$verdict",""" +
          s""""suite_attr":${suiteAttr.get(k).map(_.json).getOrElse("null")},""" +
          s""""isolated_attr":${isoAttr.json}}"""
        (k, json, verdict)
      }
      (entries.map(_._2).mkString(
        s""","iso_load_factor":${jd(isoLoadFactor, 2)},"adjudication":{""",
        ",", "}"),
        entries.map(e => e._1 -> e._3).toMap)
    }
    val loadJson = s""","load_ref":{"before":${jd(loadBefore, 3)},"after":${jd(loadAfter, 3)}},"load_factor":${jd(loadFactor, 2)}""" +
      s""","probe_factor":${jd(probeFactor, 2)},"median_ratio":${jd(medianRatio, 2)}""" +
      s""","baseline_medians":${prev.size},"baseline_load_ref":${jd(prevLoad, 3)}"""
    // full per-query attribution (suite window = warmup + reps): the
    // adjudicator's raw material, and the record that lets a LATER
    // reader attribute a flag that only shows up against next round's
    // baseline. ~191 compact objects, a few tens of KB.
    val attrJson = results
      .map { case (k, _, _, a) => "\"" + k + "\":" + a.json }
      .mkString(""","suite_attr":{""", ",", "}")
    tmpPoller.shutdown()
    val (scale10xJson, x10Verdicts) = scale10x
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows_out":$rowsOut,"sf":"$sfDir","reps":$reps$loadJson$errJson$movedJson$adjudication$attrJson$scale10xJson$annFrontier}"""
    emitArtifact("GRAFT_BENCH_OUT", "BENCH_LAST.json", line)
    // Opt-in baseline refresh emitted by Bench ITSELF through the same
    // serializer as the artifact (r12 verdict item 1: a hand-refresh in
    // a foreign serialization killed the guard for half a round).
    // STRUCTURAL gate (r14 verdict item 2): a run may only become the
    // new normal when every live flag — 1× suite AND ×10 block —
    // adjudicated to speedup_confirmed; anything else (regression,
    // noise, inconsistent, error) refuses, and "force" must name what
    // it overrode. The written line carries this run's load probes
    // (`load_ref`), so the baseline records the machine state it was
    // taken under.
    sys.env.get("GRAFT_BENCH_REFRESH_BASELINE") match {
      case Some(v) if v == "1" || v == "force" =>
        val allVerdicts = flagVerdicts ++
          x10Verdicts.map { case (k, r) => s"x10:$k" -> r }
        refreshRefusal(v, allVerdicts) match {
          case Some(reason) =>
            System.err.println(s"[bench] baseline refresh REFUSED: $reason")
          case None =>
            java.nio.file.Files.write(basePath, (line + "\n").getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
            System.err.println(
              s"[bench] baseline refreshed at $basePath (${results.size} medians)")
        }
      case _ => ()
    }
    // the compact driver-facing summary MUST be the final stdout line —
    // anything printed after it eats the driver's tail window
    println(compactSummary(total, sfDir, reps,
      results.map { case (k, v, _, _) => (k, v) },
      errored.size, moved.size, prev.size,
      flagVerdicts = flagVerdicts ++
        x10Verdicts.map { case (k, r) => s"x10:$k" -> r },
      x10Flags = if (only.isEmpty) x10Verdicts.size else -1))
    spark.stop()
  }
}
