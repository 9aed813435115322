package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance of a corpus snapshot: apply a batch
  * of keyed upserts and deletes to a base table — the nightly-refresh
  * primitive behind "the crawl re-fetched these URLs, these were taken
  * down, these are new". The lakehouse MERGE, expressed as plain
  * relational algebra so it runs on bare parquet with no table-format
  * dependency.
  *
  * Scale shape: resolving the winning change per key windows the CHANGE
  * BATCH (bounded by the delta, not the snapshot); the base table joins
  * that resolved set once with a LEFT ANTI on the key — when the delta
  * is small relative to the snapshot (the normal case) AQE broadcasts
  * it and the 100 TB base is scanned, never shuffled. Union with the
  * winning upserts finishes the merge. */
object Cdc {

  /** Apply `changes` to `base`. `changes` carries the base's columns
    * plus `seqCol` (change order, higher wins per key) and `opCol`
    * ("u" = upsert, "d" = delete). (key, seq) pairs must be unique —
    * ties within a key would make the winner partition-dependent, so
    * the resolution orders by (seq desc, op) deterministically and the
    * caller should treat equal seqs as a pipeline bug. Returns the new
    * snapshot: base rows untouched by any change, plus the latest
    * upsert image per changed key; keys whose latest change is a delete
    * disappear. */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, col(opCol).asc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val untouched = base.join(
      broadcast(latest.select(col(keyCol))), Seq(keyCol), "left_anti")
    val upserts = latest.filter(col(opCol) === "u")
      .drop(opCol, seqCol)
      .select(base.columns.map(col).toIndexedSeq: _*)
    untouched.unionByName(upserts)
  }
}
