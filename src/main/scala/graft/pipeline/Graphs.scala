package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed graph clustering for near-duplicate resolution.
  *
  * A near-dup pass (MinHash-LSH, SimHash, n-gram Jaccard — see [[Dedup]])
  * produces PAIRS; turning pairs into keep/drop decisions needs the
  * transitive closure: if A~B and B~C, all three are one duplicate cluster
  * even when A and C never matched directly. At corpus scale that is a
  * connected-components problem over billions of edges.
  *
  * `connectedComponents` implements alternating large-star / small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * ACM SoCC'14): each round is a fixed number of hash-partitioned shuffles
  * over the edge set and the edge set converges to a star forest — every
  * node pointing at its component's minimum id — in O(log² n) rounds
  * (observed ~log n). No driver-side graph state, no O(diameter) label
  * propagation. Per-round lineage is truncated via [[Checkpoints.truncate]]:
  * lazily on local blocks by default (the convergence aggregate doubles as
  * the materialization action — ONE job per round), or durably to a
  * caller-supplied checkpoint directory for real-cluster runs where
  * executor loss must not kill a multi-hour job.
  *
  * Skew note: both star operations compute a per-node min as a WINDOW
  * aggregate over the node's partition — no `collect_set`, so a hot node
  * with millions of neighbors spills instead of building one giant array.
  */
object Graphs {

  /** Large-star: for each node u, m = min(Γ(u) ∪ {u}); emit (v, m) for
    * every strictly-larger neighbor v > u. Connects big neighbors to the
    * local minimum without touching smaller ones. */
  private[pipeline] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    sym
      .withColumn("m", least(min(col("v")).over(Window.partitionBy(col("u"))), col("u")))
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: orient every edge toward its larger endpoint, then for
    * each node u connect all smaller neighbors (and u itself) to the
    * minimum of that neighborhood. */
  private[pipeline] def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val withMin = oriented
      .withColumn("m", min(col("v")).over(Window.partitionBy(col("u"))))
    withMin.select(col("v").as("u"), col("m").as("v"))
      .union(withMin.select(col("u"), col("m").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** (edge count, order-insensitive content hash) — equality of consecutive
    * signatures is the convergence test. Canonicalized to (min, max) so
    * orientation flips don't read as change. */
  private def signature(edges: DataFrame): (Long, BigDecimal) = {
    val row = edges
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .distinct()
      // decimal sum: a Long sum overflows under ANSI on large edge sets
      .agg(count(lit(1)),
        coalesce(sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)))
      .head()
    (row.getLong(0), BigDecimal(row.getDecimal(1)))
  }

  /** Connected components of the undirected graph given as a pair list.
    *
    * Returns one row per node that appears in at least one edge:
    * (`id`, `comp`) where `comp` is the minimum node id in the component —
    * a deterministic cluster representative. Nodes with no edges are not
    * emitted (a duplicate-free doc has no cluster); callers wanting
    * singletons can left-join and coalesce comp to id.
    *
    * Edge sets at or below `localThreshold` (already deduplicated —
    * near-dup graphs are tiny next to their corpus) short-circuit to a
    * driver-side union-find: the star rounds cost ~2 jobs each and
    * converge in O(log n) rounds, pure fixed overhead when the edges fit
    * in memory. The default admits ≤2²⁰ edges (~16 MB) — the same bounded
    * driver-side pattern as the IVF centroid fetch; pass 0 to force the
    * distributed path.
    *
    * `checkpointDir`: when set, per-round lineage truncation uses durable
    * `checkpoint` into that directory (survives executor loss — use on a
    * real cluster); when None, non-durable executor-local blocks.
    */
  def connectedComponents(
      pairs: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 50, localThreshold: Long = 1L << 20,
      checkpointDir: Option[String] = None): DataFrame = {
    var edges = Checkpoints.truncate(pairs
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct(), checkpointDir)
    // the signature aggregate is also the action that materializes the
    // (lazy) checkpoint blocks — one job per round, not two
    var sig: (Long, BigDecimal) = signature(edges)
    if (sig._1 > 0L && sig._1 <= localThreshold) {
      // localComponents collects the edges eagerly, so the truncated
      // edge set's storage (blocks / durable files) is dead the moment
      // it returns — release it, or every fast-path call leaks its
      // checkpointed edge set for the session's lifetime (the round-9
      // skyline-decay class)
      val out = localComponents(edges)
      Checkpoints.release(edges, checkpointDir)
      return out
    }
    var converged = sig._1 == 0L
    var round = 0
    while (!converged && round < maxRounds) {
      val next = Checkpoints.truncate(smallStar(largeStar(edges)), checkpointDir)
      val nextSig = signature(next)
      converged = nextSig == sig
      // the signature materialized `next`, so the superseded round's
      // storage is dead — blocks AND (durable mode) checkpoint files;
      // otherwise O(rounds) dead copies of the edge set pile up in
      // executor storage / on the checkpoint filesystem
      Checkpoints.release(edges, checkpointDir)
      edges = next
      sig = nextSig
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    // Converged star forest: leaves point at the root (= component min) and
    // roots only appear as targets. comp(id) = min over (neighbors ∪ id)
    // labels leaves with the root and the root with itself in one pass.
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    sym.groupBy(col("u").as("id"))
      .agg(min(col("v")).as("mn"))
      .select(col("id"), least(col("mn"), col("id")).as("comp"))
  }

  /** Small-graph fast path: union-find with path compression on the
    * driver (edge count pre-checked against `localThreshold`). Same
    * output contract as the distributed path: (id, comp-minimum). */
  private def localComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.LongMap.empty[Long]
    // iterative find + full path compression: a recursive find would
    // recurse once per chain link and overflow the driver stack on a
    // long path component (chains up to the edge count are reachable
    // well inside the fast-path threshold)
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElseUpdate(root, root) != root) root = parent(root)
      var cur = x
      while (cur != root) { val next = parent(cur); parent(cur) = root; cur = next }
      root
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are already component minima: unions always point the larger
    // root at the smaller
    parent.keys.toSeq.map(k => (k, find(k))).toDF("id", "comp")
  }

  /** Resolve near-dup pairs into per-document keep/drop decisions: every
    * document keeps its cluster id (its own id when unclustered) and only
    * the cluster representative (minimum id) survives.
    *
    * The removal rides a left-anti join against the DROP set — clustered
    * non-representatives only, the strictly smallest formulation (the
    * full label table also carries every representative). When the dup
    * rate is low the drop set is broadcast-sized and AQE plans a
    * broadcast anti probe; at corpus-scale dup rates (a 100 TB crawl can
    * be 30%+ near-dup) no side fits in memory and the correct plan IS
    * the doc_id-keyed shuffle anti — unlike decontamination's
    * contamination-rate-bounded id set, this side is NOT guaranteed
    * small, so the broadcast is left to runtime stats instead of forced
    * (the round-8 decontaminate lesson cuts the other way here). */
  def dedupByCluster(
      docs: DataFrame, idCol: String,
      pairs: DataFrame, srcCol: String, dstCol: String,
      checkpointDir: Option[String] = None): DataFrame = {
    val labels = connectedComponents(pairs, srcCol, dstCol,
      checkpointDir = checkpointDir)
      .withColumnRenamed("id", "__cc_id")
    val drop = labels.where(col("comp") =!= col("__cc_id"))
      .select(col("__cc_id"))
    docs.join(drop, docs(idCol).cast("long") === col("__cc_id"), "left_anti")
  }

  /** [[dedupByCluster]] with a QUALITY keep-policy: each cluster's
    * survivor is its best-`score` document (ties → smallest id), not its
    * minimum id. The keep-the-longest / keep-the-highest-quality rule
    * every production dedup eventually wants — min-id throws away the
    * best copy whenever a truncated mirror happens to carry the smaller
    * id.
    *
    * Plan shape: cluster labels join the (id, score) projection — ids
    * and one double, never the text — the per-cluster winner is ONE
    * `max_by` hash aggregate on `comp` (partial map-side; carries a
    * single (score, id) struct per cluster, no window sort), and the
    * drop set anti-joins back by id. Like [[dedupByCluster]], the drop
    * side is dup-rate-sized, NOT guaranteed broadcastable — the anti
    * join is left to runtime stats. */
  def dedupByClusterBest(
      docs: DataFrame, idCol: String, score: Column,
      pairs: DataFrame, srcCol: String, dstCol: String,
      checkpointDir: Option[String] = None): DataFrame = {
    val labels = connectedComponents(pairs, srcCol, dstCol,
      checkpointDir = checkpointDir)
      .withColumnRenamed("id", "__cc_id")
    val scored = docs
      .select(col(idCol).cast("long").alias("__cc_id"),
        score.cast("double").alias("__cc_s"))
      .join(labels, "__cc_id") // clustered docs only
    // winner = max over (score, -id): highest score, then smallest id
    val winners = scored.groupBy(col("comp"))
      .agg(max_by(col("__cc_id"),
        struct(col("__cc_s"), (-col("__cc_id")).alias("__n"))).alias("__keep"))
    val drop = scored.join(winners, "comp")
      .where(col("__cc_id") =!= col("__keep"))
      .select(col("__cc_id"))
    docs.join(drop, docs(idCol).cast("long") === col("__cc_id"), "left_anti")
  }

  /** Triangle census of an undirected pair graph: one row with
    * `n_nodes`, `n_edges`, `n_triangles`, and the global clustering
    * (transitivity) coefficient 3·triangles / open-or-closed triples.
    * On a near-dup pair graph this is the LSH-threshold diagnostic: a
    * similarity relation should be near-transitive, so transitivity far
    * below 1 means the threshold is admitting non-equivalent pairs
    * (or banding recall is uneven across the clusters).
    *
    * Node-iterator shape (Schank & Wagner 2005): edges are canonical
    * a < b, so joining e(a,b)⋈e(b,c) enumerates each ordered wedge
    * a<b<c exactly once and a semi-join against e(a,c) closes it —
    * every triangle counted once, join fan-out bounded by the max
    * degree, never all-pairs. Triples come from the degree table
    * (Σ d·(d−1)/2), one aggregate over the edge list. */
  def triangleStats(pairs: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val spark = pairs.sparkSession
    // The canonical edge list is read by FOUR consumers (skew probe,
    // wedge-join left, semi-join right, degree stats) across TWO actions
    // (the probe below plus the census). Pair generation upstream is the
    // expensive part (an LSH/n-gram pass over the corpus), so cache the
    // ids-only distinct edges — 16 B/row, MEMORY_AND_DISK spills rather
    // than evicts at 100 TB — and, since the census is always exactly one
    // row, materialize eagerly and release the cache synchronously before
    // returning (the [[Checkpoints]] leak-class discipline: no storage
    // outlives the call).
    val e = pairs.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") < col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      // Skew probe — one 1-row aggregate over the degree table the census
      // needs anyway: wedges through a middle vertex grow with d², so on a
      // power-law dup graph ONE hub key can dominate the wedge exchange (a
      // straggler task doing maxDeg² of the work). The probe compares the
      // hub's wedge load against the average partition's and picks the salt
      // factor that brings the hub back to ~average; the common non-skewed
      // census pays nothing beyond this aggregate over the cached edges.
      // Doubles on purpose: the probe is a planning heuristic, and Σd² on
      // a 100 TB edge set overflows a long under ANSI.
      val probeRow = deg.agg(
        coalesce(max(col("d")), lit(0L)).cast("double"),
        coalesce(sum(col("d") * col("d").cast("double")), lit(0.0))).head()
      val p = spark.sessionState.conf.numShufflePartitions
      val saltFactor = wedgeSalt(probeRow.getDouble(0), probeRow.getDouble(1), p)
      val tri = wedgeJoin(e, saltFactor).join(
        e.select(col("a"), col("b").as("c")).hint("shuffle_hash"),
        Seq("a", "c"), "left_semi")
        .agg(count(lit(1)).as("n_triangles"))
      val stats = deg.agg(
        count(lit(1)).as("n_nodes"),
        (sum(col("d")) / 2).cast("long").as("n_edges"),
        sum(col("d") * (col("d") - 1) / 2).cast("long").as("n_triples"))
      val census = stats.crossJoin(tri)
        .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
          Rounding.halfUp(
            when(col("n_triples") > 0,
              lit(3.0) * col("n_triangles") / col("n_triples"))
              .otherwise(lit(0.0)), 6).as("transitivity"))
      val row = census.collect()
      // LocalRelation, not parallelize: free to read (no 1-task job per
      // downstream action) and broadcastable — same shape as the Search
      // index stats row
      spark.createDataFrame(
        java.util.Arrays.asList(row: _*), census.schema)
    } finally e.unpersist(blocking = false)
  }

  /** Salt factor for the wedge self-join: 1 (plain hash join) unless the
    * heaviest middle vertex alone produces more than 2× an average
    * partition's wedge load (maxDeg² > 2·Σd²/p), in which case the hub
    * scatters across ⌈maxDeg²·p/Σd²⌉ partitions (capped at p). */
  private[graft] def wedgeSalt(maxDeg: Double, sumD2: Double, p: Int): Int =
    if (sumD2 <= 0 || maxDeg * maxDeg <= 2.0 * sumD2 / p) 1
    else math.min(p.toDouble, math.ceil(maxDeg * maxDeg * p / sumD2)).toInt

  /** Ordered-wedge self-join e(a,m) ⋈ e(m,c): enumerates each a<m<c
    * exactly once. `saltFactor` > 1 scatters hot middle vertices: the
    * left side salts by a hash of the full (a,m) row — deterministic
    * row-content salt, the same retry-safe discipline as
    * [[Skew.saltedJoin]] (partition-id salts move rows under stage
    * retry, the SPARK-23207 silent-duplication class); since `e` is
    * distinct, every (a,m) row scatters independently — and the right
    * side replicates ×saltFactor. Shuffle volume is ids-only either
    * way. */
  private[graft] def wedgeJoin(e: DataFrame, saltFactor: Int): DataFrame = {
    val left = e.select(col("a"), col("b").as("m"))
    val right = e.select(col("a").as("m2"), col("b").as("c"))
    if (saltFactor <= 1)
      left.join(right, col("m") === col("m2")).select(col("a"), col("c"))
    else {
      val sl = left.withColumn("__sl",
        pmod(hash(col("a"), col("m")), lit(saltFactor)))
      val sr = right.withColumn("__sr",
        explode(sequence(lit(0), lit(saltFactor - 1))))
      sl.join(sr, col("m") === col("m2") && col("__sl") === col("__sr"))
        .select(col("a"), col("c"))
    }
  }
}
