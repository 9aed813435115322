package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(name: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")
}

object SparkSpec {
  // override parallelism to stress partition-count-sensitive behavior
  // (e.g. GRAFT_TEST_CPUS=16 sbt test)
  private val cpus = sys.env.getOrElse("GRAFT_TEST_CPUS", "4")
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
