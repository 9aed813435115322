package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    val bg = graft.pipeline.TextAnalysis.bigrams(col("text"))

    time("warm explode count") {
      docs.select(explode(bg).alias("ngram")).count()
    }
    time("explode+group+collect") {
      docs.select(explode(bg).alias("ngram"))
        .groupBy("ngram").agg(count(lit(1)).alias("cnt")).count()
    }
    time("full q_top_ngrams") {
      docs.select(explode(bg).alias("ngram"))
        .groupBy("ngram").agg(count(lit(1)).alias("cnt"))
        .orderBy(col("cnt").desc, col("ngram").asc).limit(20).count()
    }
    docs.select(explode(bg).alias("ngram"))
      .groupBy("ngram").agg(count(lit(1)).alias("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc).limit(20).explain("formatted")
    spark.stop()
  }
}
