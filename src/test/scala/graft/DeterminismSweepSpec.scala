package graft

/** Partitioning-invariance sweep: the contract queries whose
  * formulations lean on order- or placement-sensitive machinery
  * (first-seen pins, NR assignment, global ranks, window frames,
  * hash-keyed sampling, iterative CC, k-means init, skyline passes,
  * BPE merge order) must return IDENTICAL results when every input
  * table is round-robin-repartitioned to a different partition count —
  * the property that makes answers stable across cluster sizes and
  * stage retries, and the determinism the DuckDB hash-compare gate
  * silently assumes. Rows are compared as sorted multisets (the
  * driver's own compare is order-insensitive). */
class DeterminismSweepSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // state-sensitive families whose semantics do NOT depend on input
  // order: results must survive an arbitrary row redistribution.
  // Write-side index queries are exercised by their own reload specs.
  private val placementFree = Seq(
    "q_distinct", "q_top", "q_topk_group",
    "q_sample", "q_split", "q_split_exact", "q_shuffle",
    "q_weighted_sample", "q_weighted_by", "q_cap_source",
    "q_dsir_sample", "q_safe_split", "q_cc_best", "q_cc_dedup",
    "q_skyline", "q_skyline3", "q_quantiles", "q_median_var",
    "q_auc", "q_pctrank", "q_sessions", "q_paths", "q_markov",
    "q_ewma", "q_rolling", "q_trend", "q_minhash_pairs",
    "q_ngram_pairs", "q_snm", "q_editdist", "q_bpe", "q_kmeans")

  // NR-dependent queries: RBQL's NR is DEFINED by source read order, so
  // scrambling rows legitimately changes answers. Their invariance
  // contract is the scan SPLIT layout — the same files carved into many
  // more input partitions must yield byte-identical results (the
  // cluster-size knob that actually varies in production).
  private val nrDependent = Seq(
    "q_nr", "q_any_value", "q_any_value_multi",
    "q_array_agg", "q_array_agg_cb")

  private def rows(name: String): Seq[String] = {
    SparkEntry.queries(name)(spark, sfDir).collect()
      .map(_.toString).sorted.toSeq
  }

  private def diffReport(name: String, base: Seq[String],
      perturbed: Seq[String]): Option[String] =
    if (base == perturbed) None
    else Some(s"$name: ${base.size} vs ${perturbed.size} rows; " +
      s"first diff: ${base.diff(perturbed).headOption
        .orElse(perturbed.diff(base).headOption).getOrElse("-")}")

  test("placement-free queries are invariant to row redistribution") {
    val diffs = placementFree.flatMap { name =>
      val base = rows(name)
      EntryHelpers.perturbPartitions = Some(7)
      val perturbed =
        try rows(name)
        finally EntryHelpers.perturbPartitions = None
      diffReport(name, base, perturbed)
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  test("NR-dependent queries are invariant to the scan split layout") {
    val key = "spark.sql.files.maxPartitionBytes"
    val orig = spark.conf.get(key)
    val diffs = nrDependent.flatMap { name =>
      val base = rows(name)
      spark.conf.set(key, "65536") // force many tiny input splits
      val perturbed =
        try rows(name)
        finally spark.conf.set(key, orig)
      diffReport(name, base, perturbed)
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }
}
