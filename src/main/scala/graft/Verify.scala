package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** True when `sfDir`'s BASENAME is exactly `sf0.01` — a raw
    * `endsWith("sf0.01")` would also match unrelated directories like
    * `.../mysf0.01` and ship sf0.01-pinned literal oracles (and the
    * O(n²) certification baselines) against foreign data. */
  private[graft] def isSf001(sfDir: String): Boolean =
    Paths.get(sfDir.replaceAll("/+$", "")).getFileName.toString == "sf0.01"

  private[graft] def isSf01(sfDir: String): Boolean =
    Paths.get(sfDir.replaceAll("/+$", "")).getFileName.toString == "sf0.1"

  /** Oracles applicable at `sfDir`: golden-pinned oracles carry literal
    * values computed at sf0.01 — at any other scale they'd hard-fail
    * spuriously, so they're dropped (degrading those queries to the
    * driver's rows-only check) — EXCEPT at sf0.1, which carries its own
    * certification set for the pinned family (SparkEntry.oracleSqlSf01,
    * r13 verdict item 4: the sf0.1 contract is the full 192). */
  private[graft] def oraclesFor(sfDir: String): Map[String, String] =
    if (isSf001(sfDir)) SparkEntry.oracleSql
    else if (isSf01(sfDir))
      SparkEntry.oracleSql -- SparkEntry.goldenPinnedSf001 ++
        SparkEntry.oracleSqlSf01
    else SparkEntry.oracleSql -- SparkEntry.goldenPinnedSf001

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // compatibility only, NOT a correctness dependence: if events ever
      // reverts to TIMESTAMP(NANOS) this reads it as long epoch-nanos,
      // which Temporal.epochNanos passes through; timestamp[us]/NTZ data
      // (the current driver testdata) normalizes through the same
      // adapter regardless of this flag
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // queries are independent — run 4 at a time through the shared
    // scheduler (FIFO pools interleave fine; per-query job latency was the
    // wall-clock floor when sequential)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // GRAFT_VERIFY_ONLY=q_a,q_b restricts the dump (local iteration on a
    // new query; the driver never sets it)
    val only = sys.env.get("GRAFT_VERIFY_ONLY").map(_.split(",").toSet)
    val futures = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      scala.concurrent.Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oraclesFor(sfDir)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
