package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.sources.SqliteFile

/** Differential fuzz of the native SQLite decoder: a randomized fixture
  * (4 tables, mixed INTEGER/REAL/TEXT/BLOB/typeless columns, values
  * spanning every integer serial-type width, ±0.0/1e±300 doubles,
  * multi-KB unicode texts and blobs that spill overflow chains at
  * 1024-byte pages) generated with the standard sqlite3 library, whose
  * own cursor dump is the committed expectation (fuzz_expected.jsonl).
  * Every cell must match under the reader's observed-storage-class
  * typing: numbers numerically (bit-exact doubles incl. -0.0), strings
  * exactly, blobs byte-exactly, promoted mixed columns through their
  * text/UTF-8 renderings. */
class SqliteDifferentialSpec extends SparkSpec {

  private def res(name: String): String =
    new java.io.File(getClass.getResource(s"/sqlite_native/$name").toURI)
      .getAbsolutePath

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** expected (json) vs actual (Spark cell) under the actual's type. */
  private def matches(e: JValue, a: Any): Boolean = (e, a) match {
    case (JNull, null) => true
    case (_, null) | (JNull, _) => false
    case (JInt(n), l: java.lang.Long) => n == BigInt(l)
    case (JInt(n), d: java.lang.Double) => n.toDouble == d.doubleValue()
    case (JInt(n), s: String) => n.toString == s
    case (o: JObject, a) =>
      (o \ "f", o \ "b") match {
        case (JString(f), JNothing) =>
          val want = f.toDouble
          a match {
            case d: java.lang.Double =>
              java.lang.Double.doubleToLongBits(want) ==
                java.lang.Double.doubleToLongBits(d)
            case s: String =>
              // promoted column renders via Double.toString; both
              // renderings round-trip to the same double
              java.lang.Double.doubleToLongBits(want) ==
                java.lang.Double.doubleToLongBits(s.toDouble)
            case _ => false
          }
        case (JNothing, JString(h)) =>
          a match {
            case b: Array[Byte] => java.util.Arrays.equals(b, hexBytes(h))
            case s: String => // blob in a string-promoted column
              s == new String(hexBytes(h),
                java.nio.charset.StandardCharsets.UTF_8)
            case _ => false
          }
        case _ => false
      }
    case (JString(t), s: String) => t == s
    case _ => false
  }

  private val cases: Seq[JObject] = {
    val src = scala.io.Source.fromFile(res("fuzz_expected.jsonl"), "UTF-8")
    try src.getLines().map(l =>
      JsonMethods.parse(l).asInstanceOf[JObject]).toList
    finally src.close()
  }

  for (c <- cases) {
    val JString(table) = c \ "table"
    test(s"differential: $table matches the sqlite3 library dump") {
      val cols = (c \ "cols").asInstanceOf[JArray].arr
        .map { case JString(s) => s }
      val expRows = (c \ "rows").asInstanceOf[JArray].arr
        .map(_.asInstanceOf[JArray].arr)
      val df = SqliteFile.read(spark, res("fuzz.sqlite"), table)
      assert(df.columns.toSeq == cols, df.columns.toSeq.toString)
      val got = df.collect()
      assert(got.length == expRows.length,
        s"${got.length} rows vs ${expRows.length}")
      // reader emits b-tree key order = rowid order = the dump's order
      got.zip(expRows).zipWithIndex.foreach { case ((row, exp), rix) =>
        // exp(0) is the rowid — the data cells follow
        cols.indices.foreach { i =>
          val e = exp(i + 1)
          val a = row.get(i)
          assert(matches(e, a),
            s"$table row $rix col ${cols(i)}: expected $e got " +
              s"${if (a == null) "null" else s"$a:${a.getClass.getSimpleName}"}")
        }
      }
    }
  }
}
