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
}
