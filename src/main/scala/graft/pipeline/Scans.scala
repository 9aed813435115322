package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism helpers for the sketch-heavy operators (r15
  * optimization round). */
object Scans {

  /** Scale-adaptive scan spread (optimization guide §2: derive
    * partitioning from the input, never a constant tuned for one
    * environment): heavy per-row kernels (shingling, minhash signatures,
    * md5 featurization) downstream of a file scan inherit the SCAN's
    * split count, and a small or single-row-group file gives the scan
    * fewer splits than the cluster has cores — the kernel then runs
    * near-serially while the rest of the cluster idles. When (and only
    * when) the input's estimated split count is below the default
    * parallelism, hash-repartition the RAW rows (id + text — the
    * cheapest bytes the operator will ever ship, far narrower than the
    * derived arrays) to full parallelism before the kernel runs.
    *
    * On a real 100 TB table the scan has thousands of row groups, the
    * estimate clears the bar, and this is a no-op — the operator keeps
    * its scan-parallel, zero-extra-exchange shape. The split estimate is
    * sizeInBytes / maxPartitionBytes (driver-side stats, no job); real
    * splits can only be FEWER (row-group clustering), which errs toward
    * spreading — correct, since the exchange it adds is proportional to
    * the (small) input that triggered it. */
  def spread(df: DataFrame, key: Column): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // idempotence: composed operators may each ask for a spread over the
    // same input — one barrier is enough, a second would re-exchange
    if (hasRootBarrier(df.queryExecution.analyzed)) return df
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    // floor: below this the kernel finishes in milliseconds serially and
    // the exchange + full-parallelism task scheduling cost MORE than
    // they save (measured: q_fuzzy's 22 KB supplier input regressed
    // 0.52 s → 1.2 s when spread unconditionally, while the 255 KB
    // projected documents corpus gains 3-5x from spreading). 64k
    // brackets that crossover; conf-overridable for experiments.
    val minBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.getOption("spark.graft.scan.spreadMinBytes")
        .getOrElse("64k"))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // BigInt compare: a petabyte-scale sizeInBytes must not overflow
    val small = bytes < BigInt(target) * BigInt(maxSplit)
    if (small && bytes >= BigInt(minBytes)) df.repartition(target, key)
    else df
  }

  @annotation.tailrec
  private def hasRootBarrier(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    p match {
      case proj: org.apache.spark.sql.catalyst.plans.logical.Project =>
        hasRootBarrier(proj.child)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        hasRootBarrier(f.child)
      case _: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation =>
        true
      case _ => false
    }
}
