package graft

import org.apache.spark.sql.DataFrame

/** Locks the scale-critical physical-plan shapes of the REAL SparkEntry
  * queries (sf0.001 parquet) as assertions, so a regression that silently
  * de-optimizes a plan (lost pushdown, broadcast that became a
  * sort-merge, an extra exchange) fails CI instead of only showing up as
  * a bench delta. These are the invariants the round-2/3 manual explain
  * audits verified; this spec makes them permanent. */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  private def exchanges(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).length

  test("q_select_where pushes the quantity filter into the parquet scan") {
    val p = plan("q_select_where")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quantity"),
      s"filter not pushed:\n$p")
    // column pruning: the scan must not read all 16 lineitem columns
    assert(p.contains("ReadSchema") && !p.contains("l_comment"), "scan not pruned")
  }

  test("q_top plans as TakeOrderedAndProject (no global sort)") {
    assert(plan("q_top").contains("TakeOrderedAndProject"))
  }

  test("q_join_inner broadcasts the nation dimension") {
    assert(plan("q_join_inner").contains("BroadcastHashJoin"))
  }

  test("q_agg_group is two-phase HashAggregate with one shuffle") {
    val p = plan("q_agg_group")
    assert(p.contains("HashAggregate"))
    assert(!p.contains("SortAggregate"), s"fell back to SortAggregate:\n$p")
  }

  test("q_ngram_pairs reuses the shingle exchange at runtime (AQE)") {
    // Reuse happens at the adaptive layer: AQE materializes each shuffle
    // stage once and serves identical stages via ReusedExchange (it also
    // converts small materialized stages to broadcast WITHOUT recomputing
    // them, so the static-plan broadcast-rebuild shape is never executed
    // under the benched configuration). Execute and assert the FINAL
    // adaptive plan.
    val aqe = spark.newSession()
    aqe.conf.set("spark.sql.adaptive.enabled", "true")
    val df = graft.pipeline.Dedup.ngramJaccardPairs(
      aqe.read.parquet(s"$sfDir/documents.parquet"), "text", "doc_id",
      k = 2, threshold = 0.8)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"), s"no runtime exchange reuse:\n$p")
  }

  test("q_sessions runs on a single hash exchange") {
    val p = plan("q_sessions")
    assert(exchanges(p) == 1, s"expected 1 exchange:\n$p")
  }

  test("q_asof runs on a single hash exchange") {
    val p = plan("q_asof")
    assert(exchanges(p) == 1, s"expected 1 exchange:\n$p")
  }

  test("q_multimodal stays a narrow plan (no exchange before the sort)") {
    val p = plan("q_multimodal")
    assert(exchanges(p) == 0, s"expected no hash exchange:\n$p")
  }

  test("q_interval joins on the bucket equi-key, never a nested loop") {
    val p = plan("q_interval")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"interval join degenerated to a range probe:\n$p")
  }

  test("q_zvalue interleave stays inside whole-stage codegen") {
    val p = plan("q_zvalue")
    // "*(n) Project" is the whole-stage-codegen marker in toString plans
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).isDefined,
      s"interleave projection not codegen'd:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"zvalue must be a pure map-side projection before the top-k:\n$p")
  }

  test("ivf build is map-side only (no exchange, no window)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // the assignment PASS must stay a pure map-side projection over the
    // corpus (the fit runs its own bounded jobs before it)
    val p = graft.pipeline.Similarity
      .buildIvf(emb, "embedding", "vec_id", nCentroids = 8)
      .cells.queryExecution.executedPlan.toString
    assert(exchanges(p) == 0 && !p.contains("Window"), s"ivf not map-side:\n$p")
  }

  test("q_gopher and q_char_entropy stay exchange-free narrow plans") {
    // per-row quality signals: any exchange before the output sort means
    // a scalar expression grew a shuffle
    for (q <- Seq("q_gopher", "q_char_entropy", "q_line_stats")) {
      val p = plan(q)
      assert(exchanges(p) == 0, s"$q grew a hash exchange:\n$p")
      assert(!p.contains("CodegenFallback"), s"$q fell out of codegen:\n$p")
    }
  }

  test("q_bpe segments without exchanges; the fit is not in the query plan") {
    val p = plan("q_bpe")
    assert(exchanges(p) == 0, s"segmentation grew a hash exchange:\n$p")
    assert(!p.contains("CodegenFallback"), s"bpe fell out of codegen:\n$p")
  }

  test("q_decon runs the removal as a broadcast anti-join (AQE final plan)") {
    // the contaminated-id set is bounded by the contamination rate, so
    // AQE converts the static sort-merge anti to broadcast at runtime —
    // execute and assert the FINAL adaptive plan (q_ngram_pairs pattern)
    val df = SparkEntry.queries("q_decon")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"no anti-join:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")),
      s"anti-join not broadcast at runtime:\n$p")
  }

  test("q_mix_temp never windows the summary; normalizers ride broadcasts") {
    val p = plan("q_mix_temp")
    assert(!p.contains("Window"), s"plan grew a window:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"normalizers not broadcast:\n$p")
    // the per-source summary is tiny; what must NOT appear is a shuffle
    // keyed on anything but the source hash-agg — i.e. no join-keyed or
    // window-keyed exchange. Static plan re-counts the stats subtree per
    // reference (AQE reuses at runtime), so bound loosely.
    assert(exchanges(p) <= 4, s"unexpected exchange shape:\n$p")
  }

  test("q_tfidf_pairs: equi-joins only, never a cartesian/nested-loop pair join") {
    val p = plan("q_tfidf_pairs")
    assert(!p.contains("CartesianProduct"), s"cartesian pair join:\n$p")
    // nested loops carry ONLY the broadcast 1-row doc count — the
    // static plan re-counts it once per shared-lineage branch (4 between
    // both join sides' weight subtrees; AQE reuses at runtime)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 4, p)
  }

  test("q_hardneg: corpus side joins the broadcast probes without an exchange") {
    val p = plan("q_hardneg").split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"), s"probes not broadcast:\n$p")
    // the only hash exchange keys candidates by q_id for the rank window
    assert(p.contains("hashpartitioning(q_id"), p)
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for the join:\n$p")
  }

  test("q_nb_quality scoring scan is shuffle- and join-free after the fit") {
    // the fit runs driver-side before the plan exists; the returned
    // SCORING plan must be a bare projection over the parquet scan
    val p = plan("q_nb_quality")
    assert(!p.contains("Join"), s"scoring joins:\n$p")
    assert(exchanges(p) == 0, s"scoring shuffles:\n$p")
  }

  test("q_winsor and q_mad broadcast their cut tables (no corpus sort)") {
    Seq("q_winsor", "q_mad").foreach { q =>
      val p = plan(q).split("== Initial Plan ==").head
      assert(p.contains("BroadcastHashJoin"), s"$q cuts not broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q corpus shuffled:\n$p")
    }
  }

  test("q_markov and q_ewma run on a single key exchange") {
    Seq("q_markov" -> 3, "q_ewma" -> 1).foreach { case (q, bound) =>
      val p = plan(q)
      // markov: ONE event-stream exchange (the lag window); the other
      // two key the bounded states² table (transition agg + normalizer
      // window). ewma: the key window only.
      assert(exchanges(p) <= bound, s"$q exchange shape:\n$p")
    }
  }

  test("the A-side ragged-join guard keeps the join broadcastable and " +
      "stays an equi-join (r14: in-job assert, no extra scan)") {
    // a CSV-marked A table under JOIN carries the per-record key guard
    // (safe_join_get parity) — the guard is a Filter on the pre-join A
    // side, so the join must still plan as a broadcast equi-join with no
    // extra scan of the input and no cartesian product
    val dir = java.nio.file.Files.createTempDirectory("graftpa").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.csv"),
      (1 to 50).map(i => s"k$i,$i").mkString("", "\n", "\n")
        .getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.csv"),
      (1 to 5).map(i => s"$i,v$i").mkString("", "\n", "\n")
        .getBytes("UTF-8"))
    val df = Graft.queryCsv(spark,
      s"select a1, b2 inner join $dir/b.csv on a2 == b1", s"$dir/a.csv")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"guard broke the equi-join:\n$p")
    assert(p.contains("raise_error") || p.contains("assert_true"),
      s"guard missing from the plan:\n$p")
    assert(df.collect().length == 5)
  }
}
