package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with total + per-query secs.
  * One shared session; a warmup action absorbs JVM/codegen startup so
  * per-query numbers measure the queries, not the first-job tax.
  *
  * Each query runs GRAFT_BENCH_REPS times (default 3) and reports the
  * per-query MEDIAN — a single-sample bench cannot tell a real regression
  * from scheduler noise (round-3 verdict: a +33% single-sample delta was
  * unreadable). `value` is the sum of medians. */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core: the contract's bench environment is local[32];
    // a hardcoded small default silently ran the round-4 bench at local[4]
    // and doubled the reported time of every parallel-heavy query
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: codegen + shuffle machinery, not counted
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    // GRAFT_BENCH_ONLY=q_a,q_b restricts the run (local iteration);
    // GRAFT_BENCH_VERBOSE=1 prints every rep to stderr (regression triage)
    val only = sys.env.get("GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val verbose = sys.env.get("GRAFT_BENCH_VERBOSE").contains("1")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      // one unmeasured warmup per query (JIT + page cache), then timed reps
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      if (verbose) System.err.println(
        s"[bench] $name reps=${times.map(t => f"$t%.3f").mkString(",")}")
      name -> median(times)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
