package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities.
  *
  * AQE's skew-join splitting (on by default) handles most cases at
  * runtime; explicit salting remains the tool when one hot key dominates
  * a shuffle so badly that even split partitions overwhelm single tasks,
  * or when the small side is too big to broadcast but cheap to replicate
  * `saltFactor` ways.
  */
object Skew {

  /** Salted equi-join: the big side gets a deterministic per-row salt in
    * [0, saltFactor); the small side is replicated once per salt value.
    * Correct for inner and left joins on the big side. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    // row salt from STABLE row content only: spark_partition_id /
    // monotonically_increasing_id change under partial stage retry
    // (fetch-order dependent), which moves recomputed rows to shuffle
    // partitions other reducers already consumed — the SPARK-23207 class
    // of silent row duplication/loss. Hashing every column keeps the
    // hot-key scatter (identical full rows share a salt, which is fine:
    // they are literal duplicates) and survives retries.
    val salted = big.withColumn("__graft_salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val saltValues = explode(sequence(lit(0), lit(saltFactor - 1)))
    val expanded = small.withColumn("__graft_salt", saltValues)
    val cond: Column = salted(bigKey) === expanded(smallKey) &&
      salted("__graft_salt") === expanded("__graft_salt")
    salted.join(expanded, cond, joinType)
      .drop("__graft_salt")
  }

  /** Top-N heaviest keys of a column — the diagnostic used to decide
    * whether salting is worth it. One aggregation pass. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).alias("cnt"))
      .orderBy(col("cnt").desc).limit(topN)
}
