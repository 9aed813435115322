package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fixtures for the per-family contract-entry objects
  * ([[RbqlEntries]] … [[EmbeddingEntries]]): table readers, planted
  * test corpora, and the recall-gate scale guard. */
private[graft] object EntryHelpers {

  /** Determinism-harness lever (test-only; never set in production
    * paths): when set, every table load round-robin-repartitions to
    * this many partitions, so a sweep can assert that contract-query
    * RESULTS are invariant to input partitioning — the property that
    * makes answers stable across cluster sizes and stage retries.
    * Global by design and safe only because ScalaTest suites here run
    * sequentially per forked JVM; a test must set it in try/finally
    * around its own reads and never across an async boundary. */
  @volatile private[graft] var perturbPartitions: Option[Int] = None

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    perturbPartitions.fold(df)(df.repartition(_))
  }

  def all(s: SparkSession, dir: String): Map[String, DataFrame] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .map(n => n -> t(s, dir, n)).toMap

  /** Query points for the ANN/IVF recall gates — three spread-out vector
    * ids so a recall regression can't hide behind one lucky point (round-2
    * verdict #8). Must match the VALUES lists in the oracles. */
  object RecallGate {
    val queryPoints: Seq[Int] = Seq(0, 7, 42)
  }

  /** ALL recall-gate query vectors in ONE job (r15 verdict item 5: the
    * per-point loop paid one driver head() per point). Sorted by id so
    * the downstream batched plan is deterministic. */
  def recallQueryVecs(emb: DataFrame): Seq[(Int, Seq[Float])] =
    emb.filter(col("vec_id")
        .isin(RecallGate.queryPoints.map(Int.box): _*))
      .select(col("vec_id").cast("int"), col("embedding"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
      .sortBy(_._1).toSeq

  /** The probe points as a 1-column DataFrame (`query_id` int) — the
    * left side that keeps the certification contract of one output row
    * per point even when a point's overlap is zero. */
  def recallPointList(s: SparkSession): DataFrame = {
    import s.implicits._
    RecallGate.queryPoints.toDF("query_id")
  }

  /** Embeddings plus 10 planted near-duplicates (vec_id+10000, every
    * component shifted by +0.01 in double then rounded back to float —
    * bit-reproducible in DuckDB as list_transform(e, x -> (x::DOUBLE +
    * 0.01)::FLOAT)). The synthetic corpus has no natural near-dups, so the
    * dedup/LSH recall path needs these to be non-vacuous. */
  def plantedEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val clones = emb.filter(col("vec_id") < 10).select(
      (col("vec_id") + 10000).alias("vec_id"),
      transform(col("embedding"),
        x => (x.cast("double") + lit(0.01)).cast("float")).alias("embedding"))
    emb.unionByName(clones)
  }

  /** Documents with a fixed 13-token boilerplate appended to every fifth
    * doc — deterministic planted duplication for the span-dedup queries
    * (mirrored verbatim in the DuckDB oracle). */
  val Boilerplate = " legal notice all rights reserved unauthorized" +
    " reproduction of this document is strictly prohibited"
  def boilerplated(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(Boilerplate)))
        .otherwise(col("text")).alias("txt"))

  /** Row bound for the recall-gate certification queries: their exact
    * baselines (the all-pairs cosine join in q_semdedup_recall, the
    * brute-force top-k scans in the ANN/PQ gates) are certification
    * machinery that is affordable ONLY at fixture scale — on a large
    * corpus the BASELINE, not the operator under test, explodes
    * quadratically. Guarded by ROW COUNT rather than directory name: a
    * renamed copy of the fixture still certifies, and a big corpus
    * under an innocuous-looking path still refuses (dir-suffix matching
    * is exactly the pitfall [[Verify.isSf001]] documents). */
  private[graft] val CertBaselineMaxRows = 10000L

  /** Fail fast (clear message, no quadratic work) when `df` is too big
    * for a recall gate's exact baseline. The one count() job is
    * metadata-only on parquet. */
  def certGuard(df: DataFrame, query: String): DataFrame = {
    val n = df.count()
    require(n <= CertBaselineMaxRows,
      s"$query refused: its exact recall baseline is fixture-scale " +
      s"certification machinery, and this corpus has $n rows " +
      s"(bound $CertBaselineMaxRows). Run the operator directly at " +
      "scale; the recall gate certifies on the fixture.")
    df
  }
}
