package graft

import graft.sources.JdbcSource

/** JDBC source spec over an embedded Derby database (the JDBC driver that
  * ships with Spark; same code path as SQLite-over-JDBC). */
class JdbcSpec extends SparkSpec {

  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("graftderby").toString
    val u = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE question (questionid INT, questiontext VARCHAR(100))")
    st.execute("INSERT INTO question VALUES (1, 'what is spark'), (2, NULL), (3, 'why catalyst')")
    st.close(); conn.close()
    u
  }

  test("jdbc full-table scan with header from metadata") {
    val df = JdbcSource.read(spark, url, "question")
    assert(df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSeq == Seq("questionid", "questiontext"))
    assert(df.count() == 3)
  }

  test("engine query over a jdbc table incl. null handling") {
    val df = JdbcSource.read(spark, url, "question")
    val out = Graft.query(spark,
      "SELECT a.QUESTIONID AS qid WHERE a.QUESTIONTEXT IS NOT NULL ORDER BY a.QUESTIONID",
      df)
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1, 3))
  }

  test("partitioned jdbc read") {
    val df = JdbcSource.read(spark, url, "question",
      partitionColumn = Some("questionid"), numPartitions = 2)
    assert(df.count() == 3)
    assert(df.rdd.getNumPartitions >= 1)
  }

  test("table name validation") {
    intercept[graft.engine.IoError] {
      JdbcSource.read(spark, url, "question; drop table x")
    }
  }
}
