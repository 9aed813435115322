package graft

import graft.sources.SqliteFile

/** Native SQLite file-format reader: typed fixture generated with the
  * standard sqlite3 library (512-byte pages so long texts spill into
  * overflow chains; a 2000-row table so the b-tree grows interior
  * pages; rowid aliases in both declaration forms; every storage
  * class). */
class SqliteFileSpec extends SparkSpec {

  private val fixture = {
    val url = getClass.getResource("/sqlite_native/typed.sqlite")
    assert(url != null, "typed.sqlite fixture missing")
    // the reader needs a plain filesystem path
    new java.io.File(url.toURI).getAbsolutePath
  }

  test("tableNames lists user tables only") {
    assert(SqliteFile.tableNames(fixture).sorted ==
      Seq("empty_t", "many", "typed"))
  }

  test("typed scan: storage classes, rowid alias, overflow chains") {
    val df = SqliteFile.read(spark, fixture, "typed")
    import org.apache.spark.sql.types._
    assert(df.schema.map(f => (f.name, f.dataType)) == Seq(
      "id" -> LongType,        // INTEGER PRIMARY KEY (rowid alias)
      "txt" -> StringType,
      "num" -> DoubleType,
      "mixed" -> StringType,   // int + real + text observed → string
      "data" -> BinaryType,
      "longtxt" -> StringType))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 5)
    // rowid alias: explicit ids pass through, the NULL insert got rowid 4
    assert(rows.map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L, 4L, 1000000007L))
    // overflow chain reassembled exactly
    assert(rows(0).getString(5) == "x" * 3000)
    assert(rows(1).getString(5) == "y" * 1500)
    assert(rows(1).getString(1) == "wörld ünïcode ✓")
    // doubles incl. negative zero and 1e308
    assert(rows(1).getDouble(2) == -2.25)
    assert(rows(3).getDouble(2) == 1e308)
    assert(java.lang.Double.valueOf(rows(4).getDouble(2)) ==
      java.lang.Double.valueOf(-0.0))
    // mixed column renders each storage class as its text form
    assert(rows.map(r => Option(r.get(3)).orNull).toSeq ==
      Seq("42", "3.14", "texty", "-9007199254740993", "0"))
    // blobs byte-exact; empty blob distinct from null
    assert(rows(0).getAs[Array[Byte]]("data").toSeq ==
      Seq[Byte](0, 1, -1, 'b', 'i', 'n'))
    assert(rows(2).getAs[Array[Byte]]("data").length == 0)
    assert(rows(4).isNullAt(4))
    // nulls survive
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2) && rows(4).isNullAt(5))
  }

  test("interior-page walk covers every row of a multi-page table") {
    val df = SqliteFile.read(spark, fixture, "many")
    assert(df.count() == 2000)
    val sample = df.filter(org.apache.spark.sql.functions.col("k")
      .isin(1L, 999L, 2000L)).orderBy("k").collect()
    assert(sample.map(_.getString(1)).toSeq ==
      Seq("row-00001", "row-00999", "row-02000"))
    // distributed decode: leaves split across > 1 partition
    assert(df.rdd.getNumPartitions > 1)
  }

  test("empty table falls back to declared-affinity schema") {
    val df = SqliteFile.read(spark, fixture, "empty_t")
    import org.apache.spark.sql.types._
    assert(df.schema.map(_.dataType) ==
      Seq(LongType, StringType, DoubleType, BinaryType))
    assert(df.count() == 0)
  }

  test("clear errors: missing table, bad table name, not a database") {
    intercept[Exception](SqliteFile.read(spark, fixture, "nope"))
    intercept[Exception](SqliteFile.read(spark, fixture, "bad-name;"))
    val tmp = java.nio.file.Files.createTempFile("notadb", ".sqlite")
    java.nio.file.Files.writeString(tmp, "this is not a database file at all")
    try intercept[Exception](SqliteFile.tableNames(tmp.toString))
    finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("WAL-mode database with a non-empty sidecar fails loudly") {
    // synthesize the hazard: copy the fixture, mark the header as WAL
    // (read/write version bytes 18/19 = 2), plant a non-empty -wal —
    // reading the stale main image silently would be wrong data
    val dir = java.nio.file.Files.createTempDirectory("graft_wal")
    try {
      val db = dir.resolve("w.sqlite")
      java.nio.file.Files.copy(java.nio.file.Paths.get(fixture), db)
      val bytes = java.nio.file.Files.readAllBytes(db)
      bytes(18) = 2; bytes(19) = 2
      java.nio.file.Files.write(db, bytes)
      java.nio.file.Files.write(dir.resolve("w.sqlite-wal"),
        Array.fill[Byte](64)(1))
      val e = intercept[Exception](SqliteFile.tableNames(db.toString))
      assert(e.getMessage.contains("WAL"), e.getMessage)
      // checkpointed WAL db (empty sidecar) reads fine
      java.nio.file.Files.write(dir.resolve("w.sqlite-wal"),
        Array.empty[Byte])
      assert(SqliteFile.tableNames(db.toString).nonEmpty)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("parseColumns handles quoting, constraints and comments-free DDL") {
    assert(SqliteFile.parseColumns(
      """CREATE TABLE "T" ("a b" TEXT, `c` INT, [d] REAL NOT NULL,
         e, PRIMARY KEY ("a b"), UNIQUE(c), CHECK (c > 0),
         FOREIGN KEY (e) REFERENCES x(y))""")
      .map(_._1) == Seq("a b", "c", "d", "e"))
    assert(SqliteFile.parseColumns(
      "CREATE TABLE t(x INTEGER PRIMARY KEY AUTOINCREMENT, y VARCHAR(10))")
      .map(_._1) == Seq("x", "y"))
  }
}
