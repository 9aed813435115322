package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the points not dominated under
  * (minimize `xCol`, maximize `yCol`) — q dominates p when q.x ≤ p.x,
  * q.y ≥ p.y, and at least one is strict. Callers negate a column for the
  * other orientations. (Skyline-in-Spark integrations exist as optimizer
  * extensions — EDBT 2023 "Integration of Skyline Queries into Spark
  * SQL"; this is the operator-level equivalent for the 2-D case, which
  * has an exact sort-based distributed shape.)
  *
  * Returns the distinct skyline points (`xCol`, `yCol`), x-ascending.
  *
  * Plan shape: equal-x ties reduce with one hash aggregate (only the max
  * y at a given x can survive); candidates then range-repartition by x
  * and each partition runs one sequential prefix-max pass — the classic
  * sort-based skyline, parallel across ranges. Cross-partition dominance
  * needs only each partition's max y: a bounded P-row collect turns into
  * an exclusive prefix-max broadcast (the same partition-offset pattern
  * as NR materialization). The candidate set is persisted between the
  * bounds pass and the filter pass so both see identical range
  * boundaries (RangePartitioner samples — unpinned lineage could
  * repartition differently). */
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
    * for the frontier, not the input.) NaN dimension values are dropped
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
      .groupBy(col("x")).agg(max(col("y")).as("y"))
      .repartitionByRange(col("x"))
      .sortWithinPartitions(col("x"))
      // lazy: the bounds pass below is the materializing action; blocks
      // are then fixed, so the filter pass sees identical range
      // boundaries (RangePartitioner samples only once) without a
      // dedicated materialization job
      .localCheckpoint(eager = false)
    import org.apache.spark.sql.Encoders
    val rowEnc = Encoders.row(pts.schema)
    val boundsEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaDouble)
    // pass 1: per-partition max y (P rows — bounded driver collect)
    val partMax = pts.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var mx = Double.NegativeInfinity
      var any = false
      while (it.hasNext) { val r = it.next(); any = true
        val y = r.getDouble(1); if (y > mx) mx = y }
      if (any) Iterator((pid, mx)) else Iterator.empty
    }(boundsEnc).collect()
    // exclusive prefix max over partition index: everything in an earlier
    // range has smaller x, so its max y is the external dominance bound
    val maxPid = if (partMax.isEmpty) -1 else partMax.map(_._1).max
    val bounds = new Array[Double](maxPid + 2)
    var acc = Double.NegativeInfinity
    for (pid <- 0 to maxPid) {
      bounds(pid) = acc
      acc = math.max(acc, partMax.find(_._1 == pid).map(_._2)
        .getOrElse(Double.NegativeInfinity))
    }
    val bBounds = spark.sparkContext.broadcast(bounds)
    // pass 2: sequential prefix-max within the partition, seeded with the
    // bound from all earlier ranges; survivors are y strictly above it
    pts.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var mx = if (pid < bBounds.value.length) bBounds.value(pid)
               else Double.NegativeInfinity
      it.flatMap { r =>
        val y = r.getDouble(1)
        if (y > mx) { mx = y; Iterator(r) } else Iterator.empty
      }
    }(rowEnc)
      .select(col("x").as(xCol), col("y").as(yCol))
  }
}
