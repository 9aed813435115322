package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the points not dominated under
  * (minimize `xCol`, maximize `yCol`) — q dominates p when q.x ≤ p.x,
  * q.y ≥ p.y, and at least one is strict. Callers negate a column for the
  * other orientations. (Skyline-in-Spark integrations exist as optimizer
  * extensions — EDBT 2023 "Integration of Skyline Queries into Spark
  * SQL"; this is the operator-level equivalent for the 2-D case, which
  * has an exact sort-based distributed shape.)
  *
  * Returns the distinct skyline points (`xCol`, `yCol`).
  *
  * Plan shape: x-range bucket boundaries are approxQuantile'd ONCE and
  * collected to the driver, so every pass buckets rows by the same
  * literal split points — no pinned lineage needed for the passes to
  * agree. (The previous formulation pinned a `localCheckpoint` between a
  * bounds pass and a filter pass; those candidate blocks stayed in the
  * block manager for the caller's lifetime, and a long suite of skyline
  * calls accumulated dead storage — the round-9 driver bench decay.)
  * Bucket maxima reduce through one partial-aggregated exchange (≤ P
  * rows survive), turn into an exclusive prefix-max broadcast, and one
  * hash exchange on the bucket id + per-partition sorted prefix-max scan
  * emits the frontier — one full-data shuffle total (the old shape paid
  * two: groupBy(x) then repartitionByRange). */
object Skyline {

  /** SFS (sort-filter-skyline) over an in-memory slice: ascending
    * dim-sum order means a point can only be dominated by an EARLIER
    * point (domination implies sum ≤, and equal sums cannot dominate
    * strictly), so one forward pass against the kept list is exact. All
    * dims are canonical minimize here. */
  private def sfs(points: Array[Array[Double]]): Array[Array[Double]] = {
    val sorted = points.sortBy(_.sum)
    val kept = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    def dominates(q: Array[Double], p: Array[Double]): Boolean = {
      var strict = false
      var d = 0
      while (d < q.length) {
        if (q(d) > p(d)) return false
        if (q(d) < p(d)) strict = true
        d += 1
      }
      strict
    }
    var i = 0
    while (i < sorted.length) {
      val p = sorted(i)
      if (!kept.exists(q => dominates(q, p))) kept += p
      i += 1
    }
    kept.toArray
  }

  /** N-dimensional skyline: the points not dominated under
    * (minimize `minimizeCols`, maximize `maximizeCols`). Returns the
    * DISTINCT dimension tuples of the frontier, in the input column
    * order (minimize then maximize, original values).
    *
    * Plan shape: dedup the dimension tuples (one hash aggregate), then
    * per-partition SFS passes — each partition's local skyline is a
    * superset-free candidate set, and rounds of repartition-to-fewer +
    * local SFS strictly shrink it until it either fits the bounded
    * driver merge (`localThreshold` rows, same pattern as
    * connectedComponents' fast path) or lands in one partition, where
    * the local pass IS the global answer — returned as a DataFrame
    * WITHOUT a driver collect, since with anti-correlated dimensions
    * the exact frontier can be O(input) and must never transit the
    * driver. (One EXECUTOR partition still holds the full candidate set
    * in that branch — inherent to any exact merge; size executor memory
    * for the frontier, not the input. In that branch the final round's
    * checkpoint blocks back the returned DataFrame, so their lifetime is
    * the caller's; in the driver-merge branch — the common case — the
    * final checkpoint is released before returning, so repeated calls
    * leak no block-manager storage.) NaN dimension values are dropped
    * with the nulls: NaN never compares dominated-or-dominating
    * consistently, and Spark aggregates sort it above every real double.
    *
    * `checkpointDir`: when set, per-round lineage truncation uses
    * durable `checkpoint` into that directory (survives executor loss on
    * a real cluster); when None, non-durable executor-local blocks. */
  def skylineND(
      df: DataFrame, minimizeCols: Seq[String], maximizeCols: Seq[String],
      localThreshold: Int = 1 << 16,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    require(minimizeCols.nonEmpty || maximizeCols.nonEmpty, "no dimensions")
    val dims = minimizeCols ++ maximizeCols
    val canon = minimizeCols.map(c => col(c).cast("double")) ++
      maximizeCols.map(c => (-col(c).cast("double")))
    var pts = df
      .select(canon.zipWithIndex.map { case (c, i) => c.as(s"d$i") }: _*)
      .where(dims.indices.map(i =>
        col(s"d$i").isNotNull && !isnan(col(s"d$i"))).reduce(_ && _))
      .distinct()
    import org.apache.spark.sql.Encoders
    val enc = Encoders.row(pts.schema)
    val nd = dims.length
    def localPass(d: DataFrame): DataFrame = d.mapPartitions { it =>
      val arr = it.map(r => Array.tabulate(nd)(r.getDouble)).toArray
      sfs(arr).iterator.map(a => Row.fromSeq(a.toIndexedSeq))
    }(enc)
    // lazy truncation: the count() below doubles as the materialization
    // action, so each shrink round costs one job
    pts = Checkpoints.truncate(localPass(pts), checkpointDir)
    var n = pts.count()
    while (n > localThreshold && pts.rdd.getNumPartitions > 1) {
      val target = math.max(1, pts.rdd.getNumPartitions / 4)
      val prev = pts
      pts = Checkpoints.truncate(localPass(pts.repartition(target)), checkpointDir)
      n = pts.count()
      // count() materialized the new round; the superseded candidate
      // storage (blocks + durable checkpoint files) is dead — drop it
      // instead of accumulating per round
      Checkpoints.release(prev, checkpointDir)
    }
    if (n > localThreshold) {
      // single partition, frontier larger than the driver budget: the
      // local pass was already the exact global answer — un-canonicalize
      // in-plan and hand back the distributed result, no collect
      return pts.select(dims.indices.map { i =>
        val d = col(s"d$i")
        (if (i < minimizeCols.length) d else -d).as(dims(i))
      }: _*)
    }
    // bounded driver merge across the remaining partitions
    val front: Array[Array[Double]] =
      sfs(pts.collect().map(r => Array.tabulate(nd)(r.getDouble)))
    // the candidates now live on the driver: the final round's blocks
    // (and durable files) are dead — release them so repeated calls
    // don't accumulate block-manager storage for the session's lifetime
    Checkpoints.release(pts, checkpointDir)
    // un-canonicalize (maximize dims were negated) and restore names
    val rows = front.map { a =>
      Row.fromSeq(dims.indices.map { i =>
        if (i < minimizeCols.length) a(i) else -a(i)
      })
    }
    val outSchema = org.apache.spark.sql.types.StructType(dims.map(c =>
      org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), outSchema)
  }

  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val pts = df
      .select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      // NaN is dropped like null: max() sorts NaN above every real double,
      // so a (x, NaN) row would shadow the genuine max-y at that x and
      // then fail the y > mx test — silently losing a frontier point
      .where(col("x").isNotNull && col("y").isNotNull &&
        !isnan(col("x")) && !isnan(col("y")))
    val p = spark.sessionState.conf.numShufflePartitions
    // deterministic x-range boundaries, collected ONCE: both the bounds
    // aggregate and the filter pass bucket rows by the same literal split
    // points, so the passes agree by construction — no pinned lineage
    val splits = pts.stat.approxQuantile(
      "x", (1 until p).map(_.toDouble / p).toArray, 0.01).distinct.sorted
    // bucket = count of splits strictly below x (native binary-search
    // expression, codegen'd) — monotone in x, so bucket order IS x order
    val withPid = pts.withColumn("pid",
      if (splits.isEmpty) lit(0)
      else org.apache.spark.sql.graft.sketch.bucket_index(
        col("x"), splits.toIndexedSeq))
    // per-bucket max y: partial-aggregated exchange, ≤ #buckets rows
    // survive the shuffle — a bounded driver collect
    val partMax = withPid.groupBy("pid").agg(max("y").as("my"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // exclusive prefix max over bucket index: every earlier bucket holds
    // smaller-or-equal x, so its max y is the external dominance bound
    val bounds = new Array[Double](splits.length + 1)
    var acc = Double.NegativeInfinity
    for (i <- bounds.indices) {
      bounds(i) = acc
      acc = math.max(acc, partMax.getOrElse(i, Double.NegativeInfinity))
    }
    val bBounds = spark.sparkContext.broadcast(bounds)
    import org.apache.spark.sql.Encoders
    val outEnc = Encoders.row(pts.schema)
    // dominance pre-sieve BEFORE the exchange (guide §2.3 — reduce, then
    // shuffle): the frontier scan's running max starts at bounds(pid)
    // and never decreases, so a row with y ≤ bounds(pid) can never be
    // emitted — it is dominated by an earlier bucket's max-y point.
    // Filtering it here is the exact same predicate the scan's first
    // comparison applies, so the output is row-identical while the
    // full-data shuffle shrinks to the near-frontier survivors (the ×10
    // bench shuffled 274 MB of rows the scan then discarded). The
    // bounds lookup is an O(1) element_at on a ≤(#buckets+1)-entry
    // constant array — bounded by numShufflePartitions, not the data.
    val sieved = withPid.filter(col("y") >
      element_at(lit(bounds), col("pid") + 1))
    // one hash exchange on the bucket id; (pid, x asc, y desc) sort means
    // the first row of each x group carries that x's max y, so the strict
    // running max both dedups equal-x ties and drops dominated points.
    // Several buckets may hash into one partition — the pid-change reset
    // reseeds the bound (safe: bounds(pid) already covers every earlier
    // bucket's max, so it is ≥ any carry-over)
    sieved.repartition(p, col("pid"))
      .sortWithinPartitions(col("pid"), col("x"), col("y").desc)
      .mapPartitions { it =>
        val b = bBounds.value
        var cur = -1
        var mx = Double.NegativeInfinity
        it.flatMap { r =>
          val pid = r.getInt(2)
          if (pid != cur) {
            cur = pid
            mx = if (pid < b.length) b(pid) else Double.NegativeInfinity
          }
          val y = r.getDouble(1)
          if (y > mx) { mx = y; Iterator(Row(r.getDouble(0), y)) }
          else Iterator.empty
        }
      }(outEnc)
      .select(col("x").as(xCol), col("y").as(yCol))
  }
}
