package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the >2× bench-regression guard's LIFE SUPPORT — the machinery
  * that died silently twice (r9 and r12 verdicts: both times the
  * committed baseline stopped parsing and `deltas_gt_2x` went
  * structurally empty while real >2× movers sailed through). Three
  * contracts:
  *
  *  1. the COMMITTED baseline file must load ≥180 medians and a
  *     positive load_ref through the exact production parser — this
  *     test fails the moment any future refresh lands a serialization
  *     the parser cannot read (the r12 death mode);
  *  2. the parser must tolerate whitespace / key order / separator
  *     style (real JSON semantics, not a string-tag match);
  *  3. the flag computation must fire on a doctored 3× median and stay
  *     quiet inside the band (pure function, spec-pinned).
  *
  * Plus the driver-tail contract: the compact summary line must fit the
  * driver's ~2000-char stdout window (BENCH_r06..r12 all carry
  * `parsed: null` because the full artifact line outgrew it). */
class BenchGuardSpec extends AnyFunSuite {

  private val committed = java.nio.file.Paths.get("BENCH_BASELINE_MEDIANS.json")

  test("committed baseline loads >=180 medians through the production parser") {
    assert(java.nio.file.Files.exists(committed),
      s"baseline file missing at ${committed.toAbsolutePath}")
    val medians = Bench.previousMedians(committed)
    assert(medians.size >= 180,
      s"guard effectively disarmed: only ${medians.size} medians parsed " +
        "from the committed baseline (expected >=180)")
    assert(medians.values.forall(_ > 0),
      "baseline contains non-positive medians")
  }

  test("committed baseline loads a positive load_ref") {
    val lr = Bench.previousLoadRef(committed)
    assert(lr > 0, s"load_ref parsed to $lr — load normalization disarmed")
  }

  private def tmpJson(content: String): java.nio.file.Path = {
    val f = java.nio.file.Files.createTempFile("graft_baseline", ".json")
    f.toFile.deleteOnExit()
    java.nio.file.Files.write(f,
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f
  }

  test("parser tolerates whitespace, key order and separator style") {
    // the r12 killer: `": "` separators + queries key moved last
    val spaced = tmpJson(
      """{ "metric": "total", "load_ref": { "before": 0.2, "after": 0.1 },
        |  "queries": { "q_a": 1.5, "q_b": 0.25 } }""".stripMargin)
    val compact = tmpJson(
      """{"queries":{"q_a":1.5,"q_b":0.25},"load_ref":{"before":0.2,"after":0.1}}""")
    for (p <- Seq(spaced, compact)) {
      assert(Bench.previousMedians(p) == Map("q_a" -> 1.5, "q_b" -> 0.25))
      assert(math.abs(Bench.previousLoadRef(p) - 0.15) < 1e-12)
    }
  }

  test("absent / unparseable / field-less baselines degrade to disarmed, not crash") {
    val gone = java.nio.file.Paths.get("/nonexistent/graft_baseline.json")
    assert(Bench.previousMedians(gone).isEmpty)
    assert(Bench.previousLoadRef(gone) == -1.0)
    val garbage = tmpJson("not json at all {")
    assert(Bench.previousMedians(garbage).isEmpty)
    assert(Bench.previousLoadRef(garbage) == -1.0)
    val empty = tmpJson("""{"metric":"total"}""")
    assert(Bench.previousMedians(empty).isEmpty)
    assert(Bench.previousLoadRef(empty) == -1.0)
  }

  test("a doctored 3x median flags; in-band medians stay quiet") {
    val prev = Map("q_a" -> 1.0, "q_b" -> 1.0, "q_c" -> 1.0)
    val run = Seq("q_a" -> 3.0, "q_b" -> 1.5, "q_c" -> 0.4,
      "q_new" -> 9.0, "q_err" -> -1.0)
    val flags = Bench.flaggedMoves(run, prev, loadFactor = 1.0)
    assert(flags.map(f => (f._1, f._3)) ==
      Seq(("q_a", 3.0), ("q_c", 0.4))) // >2x and <0.5x flag; 1.5x doesn't;
    // un-baselined and errored queries never flag
  }

  test("load normalization absorbs a uniformly slow machine but not a regression") {
    val prev = Map("q_a" -> 1.0, "q_b" -> 1.0)
    // machine 3x slower across the board: load factor 3 → no flags
    assert(Bench.flaggedMoves(Seq("q_a" -> 3.0, "q_b" -> 3.0), prev, 3.0).isEmpty)
    // same load factor, one genuine 9x mover still trips
    val f = Bench.flaggedMoves(Seq("q_a" -> 9.0, "q_b" -> 3.0), prev, 3.0)
    assert(f.map(_._1) == Seq("q_a"))
  }

  test("compact summary fits the driver tail window and parses as JSON") {
    // 192 queries with realistic names/values — the shape of a real run
    val medians = (1 to 192).map(i => (f"q_synthetic_name_$i%03d", i * 0.037))
    val line = Bench.compactSummary(total = 108.4, sfDir = "/root/testdata/sf0.1",
      reps = 3, medians = medians, nErrors = 0, nFlags = 2,
      baselineMedians = 192)
    assert(line.length <= 1700, s"summary too long: ${line.length}")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(root.path("metric").asText() == "total")
    assert(math.abs(root.path("value").asDouble() - 108.4) < 1e-9)
    assert(root.path("n_queries").asInt() == 192)
    assert(root.path("flags_gt_2x").asInt() == 2)
    assert(root.path("baseline_medians").asInt() == 192)
    assert(root.path("queries").isObject)
    assert(root.path("queries").size() > 20,
      "summary should carry a meaningful query subset")
    // the slowest non-headline query must survive the length cut —
    // the summary's job is to surface where the time went
    assert(root.path("queries").has("q_synthetic_name_192"))
  }

  test("compact summary prioritizes the BASELINE.md headline queries") {
    val medians = Seq("q_select_where" -> 0.1, "q_like" -> 0.14,
      "q_agg_group" -> 0.4) ++
      (1 to 250).map(i => (f"q_slow_$i%03d", 5.0))
    val line = Bench.compactSummary(50.0, "sf", 3, medians, 0, 0, 192)
    val qs = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(line).path("queries")
    assert(qs.has("q_select_where") && qs.has("q_like") && qs.has("q_agg_group"))
  }

  test("r13 driver-shape replay: asymmetric probes + uniform 1.13x medians " +
      "+ one planted 3x regression -> exactly the planted flag") {
    // the r13 driver run: load probes 0.656 before / 0.098 after over a
    // baseline load_ref 0.137 gave probe factor 2.75, while the actual
    // median query inflation was ~1.13x. The old suite-global divisor
    // flagged 162 unchanged queries (154 wrongly speedup_confirmed); the
    // fixed guard caps the divisor at the cross-query median ratio.
    val prev = (1 to 191).map(i => f"q_u$i%03d" -> 1.0).toMap + ("q_bad" -> 1.0)
    val run = (1 to 191).map(i => f"q_u$i%03d" -> 1.13) :+ ("q_bad" -> 3.0)
    val probeFactor = ((0.656 + 0.098) / 2) / 0.137 // = 2.75
    val medianRatio = Bench.crossQueryMedianRatio(run, prev)
    assert(math.abs(medianRatio - 1.13) < 1e-9)
    val lf = Bench.effectiveLoadFactor(probeFactor, medianRatio)
    assert(math.abs(lf - 1.13) < 1e-9,
      s"divisor must be capped at the median ratio, got $lf")
    val flags = Bench.flaggedMoves(run, prev, lf)
    assert(flags.map(_._1) == Seq("q_bad"), flags)
    // and the same shape flags NOTHING as a speedup: every unchanged
    // query's normalized ratio is 1.0, inside the band
    assert(flags.forall(_._3 > 2.0))
  }

  test("capped divisor cannot mask a real regression on a loaded-START machine") {
    // symmetric failure the r13 verdict called out: machine loaded at
    // probe time but quiet during the queries — the raw probe factor
    // (2.75) would divide a genuine 2.6x regression below the flag line
    val prev = (1 to 50).map(i => f"q_u$i%03d" -> 1.0).toMap + ("q_bad" -> 1.0)
    val run = (1 to 50).map(i => f"q_u$i%03d" -> 1.0) :+ ("q_bad" -> 2.6)
    val lf = Bench.effectiveLoadFactor(2.75, Bench.crossQueryMedianRatio(run, prev))
    assert(math.abs(lf - 1.0) < 1e-9)
    assert(Bench.flaggedMoves(run, prev, lf).map(_._1) == Seq("q_bad"))
  }

  test("genuinely loaded machine: median ratio tracks the load, no spurious flags") {
    val prev = (1 to 50).map(i => f"q_u$i%03d" -> 1.0).toMap
    val run = (1 to 50).map(i => f"q_u$i%03d" -> 2.7)
    val lf = Bench.effectiveLoadFactor(2.75, Bench.crossQueryMedianRatio(run, prev))
    assert(math.abs(lf - 2.7) < 1e-9)
    assert(Bench.flaggedMoves(run, prev, lf).isEmpty)
    // fast machine (ratios < 1): floor at 1, never loosen the guard
    assert(Bench.effectiveLoadFactor(0.5, 0.8) == 1.0)
    // no baselined queries: probe factor stands alone
    assert(Bench.effectiveLoadFactor(2.0, -1.0) == 2.0)
    assert(Bench.crossQueryMedianRatio(Seq("q_x" -> 1.0), Map.empty) == -1.0)
  }

  test("committed baseline loads >=50 scale10x medians (x10 guard armed)") {
    // r14 verdict item 1: the driver's 64x/65x q_spans / q_minhash_pairs
    // 10x excursion rode through unflagged because the scale10x block had
    // no baseline diff. The committed baseline must arm it.
    val m10 = Bench.previousScale10xMedians(committed)
    assert(m10.size >= 50,
      s"x10 guard disarmed: only ${m10.size} scale10x medians parsed")
    assert(m10.contains("q_spans") && m10.contains("q_minhash_pairs"),
      "the two r14-weak queries must be baselined")
    assert(m10.values.forall(_ > 0))
    // absent block degrades to disarmed, not crash
    assert(Bench.previousScale10xMedians(
      tmpJson("""{"queries":{"q_a":1.0}}""")).isEmpty)
  }

  test("r14 driver-shape replay: the 64x/65x scale10x excursion now flags") {
    // exact r14 artifact numbers: baseline q_spans 2.28 / q_minhash_pairs
    // 3.40; driver 10x block measured 55.99 / 137.39 while the other ~50
    // entries sat within ~1.2-3.7x. The block's own cross-query median
    // ratio is the divisor, so the two excursions flag and the rest stay
    // quiet.
    val prev = Map("q_spans" -> 2.28, "q_minhash_pairs" -> 3.40) ++
      (1 to 50).map(i => f"q_u$i%03d" -> 1.0)
    val run = Seq("q_spans" -> 55.99, "q_minhash_pairs" -> 137.39) ++
      (1 to 50).map(i => f"q_u$i%03d" -> 1.3)
    // the block's divisor: the cross-query median ratio floored at 1
    // (no probe pair exists inside the block — the ~50 entries ARE the
    // load estimator)
    val mr = Bench.crossQueryMedianRatio(run, prev)
    val lf = if (mr > 0) mr.max(1.0) else 1.0
    assert(math.abs(lf - 1.3) < 1e-9)
    val flags = Bench.flaggedMoves(run, prev, lf)
    assert(flags.map(_._1).toSet == Set("q_spans", "q_minhash_pairs"), flags)
  }

  test("baseline refresh is refused while any flag is not speedup_confirmed") {
    // r14 verdict item 2: "refresh only from a flag-clean or all-speedup
    // run" must be structural. A run with one unadjudicated regression
    // flag cannot emit a baseline.
    assert(Bench.refreshRefusal("1", Map.empty).isEmpty) // flag-clean: ok
    assert(Bench.refreshRefusal("1",
      Map("q_a" -> "speedup_confirmed", "q_b" -> "speedup_confirmed")).isEmpty)
    for (bad <- Seq("slowdown_reproduced", "suite_context_noise",
        "inconsistent", "isolated_run_error", "no_baseline",
        "slowdown_isolated_consensus")) {
      val r = Bench.refreshRefusal("1", Map("q_x" -> bad))
      assert(r.isDefined, s"verdict $bad must refuse")
      assert(r.get.contains("q_x") && r.get.contains(bad),
        "refusal must name the offending query and verdict")
    }
    // x10-block flags gate the refresh exactly like 1x flags
    assert(Bench.refreshRefusal("1",
      Map("x10:q_spans" -> "slowdown_reproduced")).isDefined)
    // force overrides — after an explicit human adjudication
    assert(Bench.refreshRefusal("force",
      Map("q_x" -> "slowdown_reproduced")).isEmpty)
  }

  test("compact summary carries the x10 flag count and x10 verdicts") {
    val medians = (1 to 192).map(i => (f"q_synthetic_name_$i%03d", i * 0.037))
    val line = Bench.compactSummary(100.0, "/root/testdata/sf0.1", 3, medians,
      nErrors = 0, nFlags = 0, baselineMedians = 192,
      flagVerdicts = Map("x10:q_spans" -> "suite_context_noise"),
      x10Flags = 1)
    assert(line.length <= 1700)
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(root.path("x10_flags_gt_2x").asInt() == 1)
    assert(root.path("flags").path("x10:q_spans").asText() ==
      "suite_context_noise")
    // default (-1) = block absent: field omitted, old shape preserved
    val line2 = Bench.compactSummary(100.0, "sf", 3, medians, 0, 0, 192)
    assert(!new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(line2).has("x10_flags_gt_2x"))
  }

  test("compact summary carries per-flag verdicts (self-adjudicating driver artifact)") {
    val medians = (1 to 192).map(i => (f"q_synthetic_name_$i%03d", i * 0.037))
    val line = Bench.compactSummary(100.0, "/root/testdata/sf0.1", 3, medians,
      nErrors = 0, nFlags = 2, baselineMedians = 192,
      flagVerdicts = Map("q_synthetic_name_007" -> "suite_context_noise",
        "q_synthetic_name_101" -> "slowdown_reproduced"))
    assert(line.length <= 1700, s"summary too long: ${line.length}")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(root.path("flags").path("q_synthetic_name_007").asText() ==
      "suite_context_noise")
    assert(root.path("flags").path("q_synthetic_name_101").asText() ==
      "slowdown_reproduced")
    assert(!root.has("flags_truncated"))
    // pathological flag count: truncate to 12, confess the rest
    val many = (1 to 30).map(i => f"q_f$i%03d" -> "suite_context_noise").toMap
    val line2 = Bench.compactSummary(100.0, "sf", 3, medians, 0, 30, 192,
      flagVerdicts = many)
    assert(line2.length <= 1700)
    val r2 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line2)
    assert(r2.path("flags").size() == 12)
    assert(r2.path("flags_truncated").asInt() == 18)
  }

  test("r15 squeeze replay: every previously-printed query outranks flag verdicts") {
    // r15: 21 flag verdicts rode the line and squeezed the printed query
    // map from 76 to 54 names; the driver's PERF diff recorded the 23
    // omissions as dropped_from_bench. The pinned set (everything the
    // r15 summary printed) must now survive ANY flag load — the flag
    // object shrinks instead.
    val medians = Bench.summaryPinned.map(k => k -> 0.5) ++
      (1 to 139).map(i => (f"q_other_$i%03d", 2.0 + i * 0.01))
    val many = (1 to 25).map(i => f"q_f$i%03d" -> "suite_context_noise").toMap +
      ("q_real" -> "slowdown_reproduced")
    val line = Bench.compactSummary(100.0, "/root/testdata/sf0.1", 3, medians,
      nErrors = 0, nFlags = 26, baselineMedians = 193, flagVerdicts = many,
      x10Flags = 0)
    assert(line.length <= 1700, s"summary too long: ${line.length}")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    val qs = root.path("queries")
    for (k <- Bench.summaryPinned)
      assert(qs.has(k), s"pinned query $k missing from the summary line")
    // the informative verdict survives flag truncation ahead of noise
    assert(root.path("flags").path("q_real").asText() == "slowdown_reproduced")
  }
}
