package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Stable driver-side memo keys for DataFrame inputs: the canonicalized
  * logical plan of the relevant columns (exprId-normalized, so fresh
  * reads of the same source compare equal) plus a fingerprint of the
  * backing files (name/length/mtime), so overwriting a path in place
  * invalidates a memo instead of serving stale results. Purely local
  * inputs (no files) are content-keyed by the canonicalized plan itself
  * — LocalRelation equality includes the data. One driver-side metadata
  * pass, no Spark job. */
object PlanKey {

  /** File fingerprint of `df`'s input files. Stat calls are one driver
    * RPC per file, so they are capped — beyond 64 files the sorted name
    * set is the signal and the per-file stats are skipped. */
  def fingerprint(df: DataFrame): Int = {
    val files = df.inputFiles
    scala.util.hashing.MurmurHash3.orderedHash(
      if (files.length > 64) files.sorted.toSeq
      else files.sorted.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        try {
          val s = p.getFileSystem(
            df.sparkSession.sparkContext.hadoopConfiguration).getFileStatus(p)
          (f, s.getLen, s.getModificationTime)
        } catch { case _: Exception => (f, -1L, -1L) }
      }.toSeq)
  }

  /** (canonicalized plan of `df.select(cols)`, file fingerprint). */
  def of(df: DataFrame, cols: Seq[String]): (Any, Int) =
    (df.select(cols.map(col): _*).queryExecution.analyzed.canonicalized,
      fingerprint(df))
}
