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

  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val pts = df
      .select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x")).agg(max(col("y")).as("y"))
      .repartitionByRange(col("x"))
      .sortWithinPartitions(col("x"))
      .localCheckpoint()
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
