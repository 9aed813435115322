package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry routes through the graft engine (RBQL clause grammar with
  * Spark SQL expressions) against the driver-generated parquet tables;
  * `oracleSql` holds the DuckDB-equivalent ANSI SQL for the hash compare.
  * All queries are deterministically ordered on both sides, and
  * order-sensitive float aggregates are rounded identically on both sides.
  *
  * The 191 entries live in seven per-family objects
  * ([[RbqlEntries]], [[TemporalEntries]], [[ProfilingEntries]],
  * [[DedupEntries]], [[TextEntries]], [[SamplingEntries]],
  * [[EmbeddingEntries]]) with each query's lambda and its DuckDB oracle
  * ADJACENT in the same file; this object only aggregates and asserts
  * global name uniqueness + query↔oracle pairing. */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Graft.query(spark,
      "SELECT a.l_returnflag, a.l_linestatus, COUNT(*) AS cnt, " +
        "SUM(a.l_quantity) AS sum_qty GROUP BY a.l_returnflag, a.l_linestatus",
      EntryHelpers.t(spark, "/root/testdata/sf0.001", "lineitem"))

  private val families = Seq(
    ("rbql", RbqlEntries.queries, RbqlEntries.oracles),
    ("temporal", TemporalEntries.queries, TemporalEntries.oracles),
    ("profiling", ProfilingEntries.queries, ProfilingEntries.oracles),
    ("dedup", DedupEntries.queries, DedupEntries.oracles),
    ("text", TextEntries.queries, TextEntries.oracles),
    ("sampling", SamplingEntries.queries, SamplingEntries.oracles),
    ("embedding", EmbeddingEntries.queries, EmbeddingEntries.oracles))

  /** One per implemented operator from SURVEY.md §2 (+ the pipeline
    * families). Aggregated from the family objects with a uniqueness
    * assert — a name collision across families would otherwise silently
    * drop one side's entry in the Map merge. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val es = families.flatMap(_._2)
    require(es.map(_._1).distinct.size == es.size,
      "duplicate query name across entry families: " +
        es.groupBy(_._1).collect { case (k, v) if v.size > 1 => k }.mkString(","))
    es.toMap
  }

  /** Oracles whose expected rows are literal golden VALUES computed at
    * the driver's verify scale (sf0.01 testdata) — data-dependent pins,
    * not replayable SQL. A correctness run against any OTHER dataset
    * must skip them (degrading to the rows-only check) instead of
    * hard-failing on pins that were never valid there; [[Verify]] drops
    * them from `oracle_sql.json` when the sf dir is not sf0.01. */
  val goldenPinnedSf001: Set[String] =
    Set("q_simhash", "q_ann_topk", "q_ivf_topk", "q_kmeans",
      // recall-certification gates: the all-true VALUES oracles assert
      // that approximate search tuned FOR the sf0.01 corpus (nCentroids,
      // nProbe, band counts) clears its recall bar there. At other
      // scales the same parameters legitimately miss (e.g. nProbe=4 of
      // 16 cells over a 500-vector sf0.001 corpus), so off sf0.01 these
      // degrade to the rows-only check like the other pins.
      "q_ann_recall", "q_ivf_recall", "q_pq_recall", "q_pq256_recall",
      "q_ivfpq_recall", "q_ivfpq_res_recall", "q_semdedup_recall",
      "q_simhash_recall")

  /** DuckDB-equivalent SQL per query (same column names + order). Every
    * oracle must pair with a declared query — an orphaned oracle is a
    * mis-typed name that would silently never be checked. */
  val oracleSql: Map[String, String] = {
    val os = families.flatMap(_._3)
    require(os.map(_._1).distinct.size == os.size,
      "duplicate oracle name across entry families")
    val orphans = os.map(_._1).filterNot(queries.keySet)
    require(orphans.isEmpty, s"oracles without a query: $orphans")
    os.toMap
  }
}
