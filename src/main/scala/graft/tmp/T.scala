package graft.tmp
import org.apache.spark.sql.SparkSession
object T {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try println("like fn: " + spark.sql("SELECT like('abcta','a%ta') AS x").head())
    catch { case e: Exception => println("like fn FAILS: " + e.getMessage.take(100)) }
    try println("ilike fn: " + spark.sql("SELECT ilike('ABCTA','a%ta') AS x").head())
    catch { case e: Exception => println("ilike fn FAILS: " + e.getMessage.take(100)) }
    spark.stop()
  }
}
