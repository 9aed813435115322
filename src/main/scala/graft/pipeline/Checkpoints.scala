package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators ([[Graphs]], [[Skyline]]).
  *
  * Iterative Spark plans grow per round; without truncation the analyzer
  * cost and lineage depth blow up with the round count. Two modes:
  *
  *  - default (`dir = None`): `localCheckpoint(eager = false)` — blocks
  *    live on executors. LAZY on purpose: the caller's next action (the
  *    convergence aggregate / count) materializes the blocks, so each
  *    round costs ONE job instead of a materialize-job plus an
  *    aggregate-job. Non-durable: an executor loss mid-computation loses
  *    blocks and fails the job (acceptable on local[*]; not on a big
  *    cluster).
  *  - durable (`dir = Some(path)`): reliable `checkpoint()` to the given
  *    directory (HDFS/S3 on a real cluster) — survives executor death,
  *    the knob a 100 TB run needs. Eager, and therefore one extra job
  *    per round: a lazy reliable checkpoint would recompute the round's
  *    plan twice (once for the action, once for the checkpoint write),
  *    which is worse than the extra job.
  *
  * The SparkContext checkpoint dir is set from `dir` only when unset, so
  * an application-configured dir wins over the per-operator parameter.
  *
  * Durable-mode disk lifecycle: each round's `checkpoint()` writes one
  * full copy of the data under the checkpoint dir, and `unpersist()`
  * frees only block-manager storage — without explicit file deletion a
  * long iteration leaves O(rounds) dead copies on HDFS/S3 for the life
  * of the application. [[release]] deletes the superseded round's files
  * (the same discipline as MLlib's PeriodicCheckpointer); only the
  * FINAL round's checkpoint survives until application exit.
  */
private[pipeline] object Checkpoints {
  def truncate(df: DataFrame, dir: Option[String]): DataFrame = dir match {
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
      df.checkpoint()
    case None =>
      df.localCheckpoint(eager = false)
  }

  /** Free a SUPERSEDED round's storage: block-manager blocks always; in
    * durable mode also the reliable checkpoint files backing `df`. Only
    * call once the successor round is fully materialized (the durable
    * path is eager, so the successor never re-reads these files). File
    * deletion is best-effort — a failed delete costs disk, not
    * correctness.
    *
    * The unpersist must target the RDD UNDER the checkpointed Dataset's
    * `LogicalRDD`, not the Dataset: `Dataset.unpersist` routes through
    * `CacheManager.uncacheQuery`, which only drops `.cache()`d plan
    * entries — on a checkpointed Dataset it is a silent no-op and the
    * localCheckpoint blocks stay registered for the session's lifetime
    * (they only vanish when the ContextCleaner's GC-driven weak-ref pass
    * happens to run, which a large-heap driver may not do for hours —
    * the round-9 bench-decay class in its original form).
    * `RDD.unpersist` removes the `persistentRdds` registration
    * synchronously; block deletion is async under `blocking = false`. */
  def release(df: DataFrame, dir: Option[String]): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        if (dir.isDefined) lr.rdd.getCheckpointFile.foreach { f =>
          val conf = df.sparkSession.sparkContext.hadoopConfiguration
          val p = new org.apache.hadoop.fs.Path(f)
          try p.getFileSystem(conf).delete(p, true)
          catch { case _: java.io.IOException => () }
        }
      case _ => df.unpersist(blocking = false)
    }
}
