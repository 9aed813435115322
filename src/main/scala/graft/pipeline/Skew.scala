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

  /** True when the type contains a MapType anywhere — `hash()` rejects
    * maps (unordered entries have no canonical hash), even nested. */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType        => true
      case ArrayType(et, _)  => containsMap(et)
      case StructType(fs)    => fs.exists(f => containsMap(f.dataType))
      case _                 => false
    }
  }

  /** Salted equi-join: the big side gets a deterministic per-row salt in
    * [0, saltFactor); the small side is replicated once per salt value.
    * Correct for inner and left joins on the big side.
    *
    * `saltCols`: columns of `big` the salt is derived from; empty (the
    * default) means every hashable column. Map-typed columns are never
    * hashed (`hash()` rejects MapType). Degenerate-scatter caveat: rows
    * whose salt-source values are identical — literal duplicate rows, or
    * a `big` projected down to just the key — share one salt, so the hot
    * key does NOT scatter while the small side still pays the
    * ×saltFactor replication. Content-identical rows are inherently
    * indistinguishable to any retry-safe deterministic salt; if the hot
    * key's rows are literal duplicates, aggregate them first (count +
    * re-expand) instead of salting. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      saltFactor: Int = 8,
      joinType: String = "inner",
      saltCols: Seq[String] = Nil): DataFrame = {
    // row salt from STABLE row content only: spark_partition_id /
    // monotonically_increasing_id change under partial stage retry
    // (fetch-order dependent), which moves recomputed rows to shuffle
    // partitions other reducers already consumed — the SPARK-23207 class
    // of silent row duplication/loss. Hashing row content keeps the
    // hot-key scatter and survives retries.
    val sources =
      if (saltCols.nonEmpty) saltCols
      else big.schema.fields.collect {
        case f if !containsMap(f.dataType) => f.name
      }.toSeq
    require(sources.nonEmpty,
      "saltedJoin: no hashable (non-map) columns to derive a salt from; " +
        "pass saltCols explicitly")
    val salted = big.withColumn("__graft_salt",
      pmod(hash(sources.map(big(_)).toIndexedSeq: _*), lit(saltFactor)))
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
