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
    // Standing 10×-volume block (full runs only): the five text operators
    // re-run against a materialized ×10 documents table so sublinearity
    // regressions are caught automatically, not just in one-off smokes.
    // Ratios are ×10-median / 1×-median: ≈1 means parallelism-absorbed,
    // <10 sublinear; pair-producing queries legitimately exceed 1 because
    // replicated docs multiply the PAIR volume, not just the row count.
    val scale10x = if (only.isEmpty) {
      import org.apache.spark.sql.functions.{col, lit}
      val scaleQs = Seq("q_top_ngrams", "q_bm25", "q_lm_score", "q_spans",
        "q_minhash_pairs")
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      val n = base.count()
      val x10dir = java.nio.file.Files.createTempDirectory("graft_x10").toString
      (0 until 10).map(i =>
          base.withColumn("doc_id", col("doc_id") + lit(i * n)))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$x10dir/documents.parquet")
      val rows = scaleQs.map { name =>
        val fn = SparkEntry.queries(name)
        try { fn(spark, x10dir).count() } catch { case _: Throwable => () }
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, x10dir).count() } catch { case _: Throwable => -1L }
          (System.nanoTime() - t0) / 1e9
        }
        if (verbose) System.err.println(
          s"[bench] scale10x $name reps=${times.map(t => f"$t%.3f").mkString(",")}")
        name -> median(times)
      }
      val base1x = results.toMap
      val sq = rows.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val ratios = rows.map { case (k, v) =>
        "\"" + k + "\":" + base1x.get(k).filter(_ > 0).map(b => v / b).getOrElse(-1.0)
      }.mkString("{", ",", "}")
      s""","scale10x":{"rows":${n * 10},"queries":$sq,"ratio_vs_1x":$ratios}"""
    } else ""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps$scale10x}""")
    spark.stop()
  }
}
