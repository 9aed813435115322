package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}

/** r15 optimization-round profiling harness (temporary tool, not part of
  * the driver contract): for each named SparkEntry query, captures the
  * formatted plan to `<outDir>/<name>_<tag>.txt` and prints a per-job
  * wall/stage breakdown of one warmed execution — the measurement the
  * optimization guide §1 asks for before any change.
  *
  * Test-scope tool (r15 verdict item 10: must not ship in the
  * production artifact).
  * Usage: sbt "Test/runMain graft.tmp.Plans <outDir> <tag> q_a,q_b,..."
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS   (default all). */
object Plans {
  private final class JobProfile extends SparkListener {
    case class J(id: Int, desc: String, var ms: Long, var stages: Int,
      var tasks: Int, var shufReadMb: Double, var shufWriteMb: Double)
    val jobs = new scala.collection.mutable.ArrayBuffer[J]
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      starts.put(e.jobId, (System.nanoTime(), desc))
      e.stageIds.foreach(s => stageJob.put(s, e.jobId))
      jobs.synchronized { jobs += J(e.jobId, desc, -1, 0, 0, 0, 0) }
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      Option(starts.get(e.jobId)).foreach { case (t0, _) =>
        jobs.synchronized {
          jobs.find(_.id == e.jobId)
            .foreach(_.ms = (System.nanoTime() - t0) / 1000000)
        }
      }
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val jid = Option(stageJob.get(si.stageId)).getOrElse(-1)
      jobs.synchronized {
        jobs.find(_.id == jid).foreach { j =>
          j.stages += 1
          j.tasks += si.numTasks
          j.shufReadMb += si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1048576.0
          j.shufWriteMb += si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576.0
        }
      }
    }
    def reset(): Unit = jobs.synchronized { jobs.clear() }
  }

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // warmup: codegen + shuffle machinery
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    val prof = new JobProfile
    spark.sparkContext.addSparkListener(prof)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // one unmeasured warmup (memos, JIT, page cache)
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        System.err.println(s"[plans] $name warmup FAILED: $e") }
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
      // profiled run: per-job breakdown of one execution
      org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
      prof.reset()
      spark.sparkContext.setJobDescription(s"profile:$name")
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
      spark.sparkContext.setJobDescription(null)
      println(f"== $name wall=$wall%.3fs rows=$rows jobs=${prof.jobs.size}")
      prof.jobs.sortBy(_.id).foreach { j =>
        println(f"   job ${j.id}%3d ${j.ms}%6d ms stages=${j.stages}%2d " +
          f"tasks=${j.tasks}%4d shufRd=${j.shufReadMb}%8.2fMB " +
          f"shufWr=${j.shufWriteMb}%8.2fMB ${j.desc.take(60)}")
      }
    }
    spark.stop()
  }
}
