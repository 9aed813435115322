package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC table scan — the Spark mapping of the reference's SQLite source
  * (/root/reference/rbql-py/rbql/rbql_sqlite.py:16-56: full-table cursor
  * scan, alnum-validated table name, header from cursor description).
  * Works against any JDBC URL on the classpath (for SQLite:
  * jdbc:sqlite:/path/db with the xerial driver; tests use embedded Derby
  * since that's what ships with Spark). Partitioned reads via
  * partitionColumn when a numeric key is supplied — the 100 TB path for
  * big external tables. */
object JdbcSource {

  def read(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8): DataFrame = {
    if (!table.forall(c => c.isLetterOrDigit || c == '_'))
      graft.engine.Errors.io(
        s"Unable to use '$table' as a table name (alphanumeric and underscores only)")
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val withParts = partitionColumn match {
      case Some(pc) =>
        // bounds probe: one tiny query, then a partitioned parallel scan
        val bounds = spark.read.format("jdbc").option("url", url)
          .option("query", s"SELECT MIN($pc) AS lo, MAX($pc) AS hi FROM $table")
          .load().head()
        if (bounds.isNullAt(0)) base
        else base
          .option("partitionColumn", pc)
          .option("lowerBound", bounds.get(0).toString)
          .option("upperBound", bounds.get(1).toString)
          .option("numPartitions", numPartitions)
      case None => base
    }
    withParts.load()
  }

  /** User-table names in the database (reference read_table_names,
    * rbql_main.py:241-245 — used by the sqlite CLI to auto-select the
    * table when the DB has exactly one). */
  def tableNames(url: String): Seq[String] = {
    val conn =
      try java.sql.DriverManager.getConnection(url)
      catch {
        case e: java.sql.SQLException =>
          graft.engine.Errors.io(s"Unable to open database: ${e.getMessage}")
      }
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (rs.next()) buf += rs.getString("TABLE_NAME")
      buf.toSeq
    } finally conn.close()
  }
}
