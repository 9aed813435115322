package graft.sources

import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Pure-JVM read-only SQLite scan — the native-file half of the
  * reference's SQLite source (`rbql-py/rbql/rbql_sqlite.py:16-56`:
  * full-table cursor scan, header from the cursor description, native
  * value types passed through). No driver exists in the offline cache,
  * so this decodes the PUBLIC file format directly
  * (sqlite.org/fileformat2: 100-byte header, table b-tree pages, varint
  * record headers with serial types, overflow-page chains).
  *
  * Scale shape: the DRIVER walks only the table's INTERIOR b-tree pages
  * to enumerate leaf page numbers (≤ filesize/pageSize ints, no row
  * data), then EXECUTORS decode disjoint leaf batches in parallel —
  * row decode, the O(rows) work, never runs on the driver. The file
  * path must be visible to executors (always true in local mode; a
  * cluster needs it on shared storage — a .sqlite file is a
  * single-machine artifact by nature, exactly as in the reference; at
  * real scale the read is the one-off ingest that lands the data in
  * parquet).
  *
  * Typing: SQLite cells are dynamically typed, Spark columns are not.
  * A cheap distributed first pass unions each column's OBSERVED storage
  * classes up the lattice null < long < double < string (blob-only →
  * binary; blob mixed with anything → string via UTF-8-lossy decode);
  * an empty table falls back to the declared-type affinity (the
  * sqlite.org affinity algorithm). `INTEGER PRIMARY KEY` columns are
  * rowid aliases — their cells store NULL and read back the rowid.
  * Unsupported shapes fail with a clear error: WITHOUT ROWID tables
  * (index b-trees), virtual tables, UTF-16 databases, and a non-empty
  * WAL (this reader sees only the main file's committed image). */
object SqliteFile extends Serializable {

  // ---- low-level file access ---------------------------------------

  private final case class Db(ch: FileChannel, pageSize: Int, usable: Int)

  private def open(path: String): Db = {
    val p = Paths.get(path)
    if (!Files.isRegularFile(p))
      graft.engine.Errors.io(s"The database does not exist: $path")
    val ch = FileChannel.open(p, StandardOpenOption.READ)
    val hdr = ByteBuffer.allocate(100)
    if (ch.read(hdr, 0L) != 100)
      graft.engine.Errors.io(s"Not a SQLite database (file too short): $path")
    hdr.flip()
    val magic = new Array[Byte](16)
    hdr.get(magic)
    // NUL-terminated magic assembled at runtime: a literal NUL byte in
    // the source would make git treat this file as binary
    val expect = "SQLite format 3".getBytes("ISO-8859-1") :+ 0.toByte
    if (!java.util.Arrays.equals(magic, expect))
      graft.engine.Errors.io(s"Not a SQLite database: $path")
    // WAL-mode database with a non-empty -wal sidecar: rows committed
    // since the last checkpoint live only in the WAL; reading the main
    // file would silently return a stale snapshot. Fail loudly instead
    // (a checkpointed WAL db -- empty/absent sidecar -- is safe to read).
    val rwVersion = math.max(hdr.get(18) & 0xff, hdr.get(19) & 0xff)
    if (rwVersion >= 2) {
      val wal = Paths.get(path + "-wal")
      if (Files.exists(wal) && Files.size(wal) > 0)
        graft.engine.Errors.io(
          s"SQLite database has a non-empty WAL ($path-wal): checkpoint " +
            "it first (PRAGMA wal_checkpoint) -- the native reader sees " +
            "only the main file's committed image")
    }
    val rawPs = ((hdr.get(16) & 0xff) << 8) | (hdr.get(17) & 0xff)
    val pageSize = if (rawPs == 1) 65536 else rawPs
    val reserved = hdr.get(20) & 0xff
    val encoding = hdr.getInt(56)
    if (encoding != 1)
      graft.engine.Errors.io(
        s"Unsupported SQLite text encoding $encoding (only UTF-8): $path")
    Db(ch, pageSize, pageSize - reserved)
  }

  private def page(db: Db, pageNo: Int): ByteBuffer = {
    val buf = ByteBuffer.allocate(db.pageSize)
    val off = (pageNo.toLong - 1) * db.pageSize
    if (db.ch.read(buf, off) <= 0)
      graft.engine.Errors.io(s"SQLite page $pageNo out of range")
    buf.flip()
    buf
  }

  private def u16(b: ByteBuffer, o: Int): Int =
    ((b.get(o) & 0xff) << 8) | (b.get(o + 1) & 0xff)
  private def u32(b: ByteBuffer, o: Int): Long =
    b.getInt(o).toLong & 0xffffffffL

  /** (value, bytesConsumed) of the big-endian 7-bit varint at `o`. */
  private def varint(b: ByteBuffer, o: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b.get(o + i)
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b.get(o + 8) & 0xff), 9)
  }

  // ---- b-tree walk ---------------------------------------------------

  /** Leaf page numbers of the table b-tree rooted at `root`, in key
    * order. Touches interior pages only — O(leaves/fanout) reads. */
  private def leafPages(db: Db, root: Int): Vector[Int] = {
    val out = Vector.newBuilder[Int]
    def walk(pageNo: Int): Unit = {
      val b = page(db, pageNo)
      val base = if (pageNo == 1) 100 else 0
      b.get(base) & 0xff match {
        case 13 => out += pageNo
        case 5 =>
          val n = u16(b, base + 3)
          val ptrs = base + 12
          var i = 0
          while (i < n) {
            walk(u32(b, u16(b, ptrs + 2 * i)).toInt)
            i += 1
          }
          walk(u32(b, base + 8).toInt)
        case 2 | 10 =>
          graft.engine.Errors.io(
            "WITHOUT ROWID tables are not supported by the native SQLite scan")
        case t =>
          graft.engine.Errors.io(s"Unexpected SQLite b-tree page type $t")
      }
    }
    walk(root)
    out.result()
  }

  /** Full record payload of a table-leaf cell, following the overflow
    * chain when the payload spills (thresholds per fileformat2 §1.6). */
  private def cellPayload(db: Db, b: ByteBuffer, cellOff: Int)
      : (Long, Array[Byte]) = {
    val (payloadLen, n1) = varint(b, cellOff)
    val (rowid, n2) = varint(b, cellOff + n1)
    val u = db.usable
    val x = u - 35
    val local =
      if (payloadLen <= x) payloadLen.toInt
      else {
        val m = (u - 12) * 32 / 255 - 23
        val k = m + ((payloadLen - m) % (u - 4)).toInt
        if (k <= x) k else m
      }
    val out = new Array[Byte](payloadLen.toInt)
    val dataOff = cellOff + n1 + n2
    val dup = b.duplicate()
    dup.position(dataOff); dup.limit(dataOff + local)
    dup.get(out, 0, local)
    var got = local
    if (got < payloadLen) {
      var next = u32(b, dataOff + local).toInt
      while (got < payloadLen) {
        if (next == 0)
          graft.engine.Errors.io("Corrupt SQLite overflow chain")
        val ob = page(db, next)
        next = u32(ob, 0).toInt
        val take = math.min(u - 4, payloadLen.toInt - got)
        val od = ob.duplicate()
        od.position(4); od.limit(4 + take)
        od.get(out, got, take)
        got += take
      }
    }
    (rowid, out)
  }

  /** Decode a record payload into column values: null / java.lang.Long /
    * java.lang.Double / String / Array[Byte]. */
  private def decodeRecord(payload: Array[Byte]): Array[Any] = {
    val b = ByteBuffer.wrap(payload)
    val (hdrLen, n0) = varint(b, 0)
    var ho = n0
    val types = Vector.newBuilder[Long]
    while (ho < hdrLen) {
      val (t, n) = varint(b, ho)
      types += t
      ho += n
    }
    var off = hdrLen.toInt
    types.result().map { t =>
      def int(bytes: Int): Long = {
        var v = if ((b.get(off) & 0x80) != 0) -1L else 0L
        var i = 0
        while (i < bytes) { v = (v << 8) | (b.get(off + i) & 0xff); i += 1 }
        off += bytes
        v
      }
      t match {
        case 0 => null
        case 1 => java.lang.Long.valueOf(int(1))
        case 2 => java.lang.Long.valueOf(int(2))
        case 3 => java.lang.Long.valueOf(int(3))
        case 4 => java.lang.Long.valueOf(int(4))
        case 5 => java.lang.Long.valueOf(int(6))
        case 6 => java.lang.Long.valueOf(int(8))
        case 7 =>
          val v = java.lang.Double.longBitsToDouble(int(8))
          java.lang.Double.valueOf(v)
        case 8 => java.lang.Long.valueOf(0L)
        case 9 => java.lang.Long.valueOf(1L)
        case n if n >= 13 && n % 2 == 1 =>
          val len = ((n - 13) / 2).toInt
          val s = new String(payload, off, len,
            java.nio.charset.StandardCharsets.UTF_8)
          off += len
          s
        case n if n >= 12 =>
          val len = ((n - 12) / 2).toInt
          val a = java.util.Arrays.copyOfRange(payload, off, off + len)
          off += len
          a
        case n =>
          graft.engine.Errors.io(s"Reserved SQLite serial type $n")
      }
    }.toArray
  }

  /** All (rowid, values) of one leaf page. */
  private def leafRows(db: Db, pageNo: Int)
      : Iterator[(Long, Array[Any])] = {
    val b = page(db, pageNo)
    val base = if (pageNo == 1) 100 else 0
    if ((b.get(base) & 0xff) != 13)
      graft.engine.Errors.io(s"SQLite page $pageNo is not a table leaf")
    val n = u16(b, base + 3)
    (0 until n).iterator.map { i =>
      val cellOff = u16(b, base + 8 + 2 * i)
      val (rowid, payload) = cellPayload(db, b, cellOff)
      (rowid, decodeRecord(payload))
    }
  }

  // ---- schema --------------------------------------------------------

  final case class MasterRow(typ: String, name: String, tblName: String,
      rootPage: Int, sql: String)

  /** sqlite_master rows (schema table b-tree is rooted at page 1). */
  def master(path: String): Seq[MasterRow] = {
    val db = open(path)
    try leafPages(db, 1).flatMap(p => leafRows(db, p)).map { case (_, v) =>
      def s(i: Int): String = v.lift(i).orNull match {
        case x: String => x
        case null => null
        case x => x.toString
      }
      val root = v.lift(3).orNull match {
        case l: java.lang.Long => l.toInt
        case _ => 0
      }
      MasterRow(s(0), s(1), s(2), root, s(4))
    }
    finally db.ch.close()
  }

  /** User-table names (mirrors the reference's read_table_names,
    * rbql_main.py:241-245). */
  def tableNames(path: String): Seq[String] =
    master(path).filter(m => m.typ == "table" &&
      !m.name.startsWith("sqlite_")).map(_.name)

  /** (columnName, declaredType) pairs parsed from CREATE TABLE sql:
    * top-level comma split inside the defs parens, table-level
    * constraints skipped, identifier quoting ("x", `x`, [x]) stripped. */
  private[graft] def parseColumns(sql: String): Seq[(String, String)] = {
    val open = sql.indexOf('(')
    if (open < 0) return Seq.empty
    var depth = 0
    var inQ: Char = 0
    var end = -1
    val items = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = open
    while (i < sql.length && end < 0) {
      val c = sql.charAt(i)
      if (inQ != 0) {
        if (c == inQ) inQ = 0
        if (depth >= 1) cur.append(c)
      } else c match {
        case '"' | '\'' | '`' => inQ = c; if (depth >= 1) cur.append(c)
        case '[' => inQ = ']'; if (depth >= 1) cur.append(c)
        case '(' => depth += 1; if (depth > 1) cur.append(c)
        case ')' =>
          depth -= 1
          if (depth == 0) { items += cur.toString; end = i }
          else cur.append(c)
        case ',' if depth == 1 => items += cur.toString; cur.clear()
        case _ => if (depth >= 1) cur.append(c)
      }
      i += 1
    }
    val constraint = "(?i)^(PRIMARY|UNIQUE|CHECK|FOREIGN|CONSTRAINT)\\b".r
    items.result().map(_.trim).filter(_.nonEmpty)
      .filterNot(it => constraint.findFirstIn(it).isDefined)
      .map { it =>
        val (name, rest) = it.charAt(0) match {
          case '"' | '`' | '\'' =>
            val close = it.indexOf(it.charAt(0), 1)
            (it.substring(1, close), it.substring(close + 1))
          case '[' =>
            val close = it.indexOf(']', 1)
            (it.substring(1, close), it.substring(close + 1))
          case _ =>
            val sp = it.indexWhere(_.isWhitespace)
            if (sp < 0) (it, "") else (it.substring(0, sp), it.substring(sp))
        }
        (name, rest.trim)
      }
  }

  /** Constant DEFAULT literal of a column declaration, decoded to the
    * reader's native value kinds — the value SQLite materializes when a
    * record predates the column (`ALTER TABLE … ADD COLUMN d T DEFAULT
    * x` stores old rows short; reading back must produce x, not NULL).
    * Supported: string ('…' with '' doubling), integer, real, NULL,
    * TRUE/FALSE, X'hex' blobs — the constant forms ADD COLUMN allows.
    * Anything unrecognized degrades to None (= NULL padding). */
  private[graft] def defaultOf(decl: String): Option[Any] = {
    val m = ("(?is)\\bDEFAULT\\s+(" +
      "'(?:[^']|'')*'" + "|" +        // string literal
      "[Xx]'[0-9A-Fa-f]*'" + "|" +    // blob literal
      "\\(?[-+]?[0-9]+(?:\\.[0-9]+)?(?:[eE][-+]?[0-9]+)?\\)?" + "|" +
      "NULL|TRUE|FALSE" +
      ")").r.findFirstMatchIn(decl)
    m.map(_.group(1)).flatMap { raw0 =>
      val raw = raw0.stripPrefix("(").stripSuffix(")")
      val up = raw.toUpperCase(java.util.Locale.ROOT)
      if (up == "NULL") None
      else if (up == "TRUE") Some(java.lang.Long.valueOf(1L))
      else if (up == "FALSE") Some(java.lang.Long.valueOf(0L))
      else if (raw.startsWith("'"))
        Some(raw.substring(1, raw.length - 1).replace("''", "'"))
      else if (up.startsWith("X'"))
        Some(raw.substring(2, raw.length - 1).grouped(2)
          .map(Integer.parseInt(_, 16).toByte).toArray)
      else if (raw.contains('.') || up.contains('E'))
        Some(java.lang.Double.valueOf(raw.toDouble))
      else
        try Some(java.lang.Long.valueOf(raw.toLong))
        catch { case _: NumberFormatException => None }
    }
  }

  /** sqlite.org §3.1 type-affinity algorithm over the declared type. */
  private def affinity(decl: String): String = {
    // Locale.ROOT: under a Turkish-locale JVM "integer".toUpperCase is
    // "İNTEGER" (dotted capital), which would miss the "INT" affinity
    val d = decl.toUpperCase(java.util.Locale.ROOT)
    if (d.contains("INT")) "INTEGER"
    else if (d.contains("CHAR") || d.contains("CLOB") || d.contains("TEXT"))
      "TEXT"
    else if (d.isEmpty || d.contains("BLOB")) "BLOB"
    else if (d.contains("REAL") || d.contains("FLOA") || d.contains("DOUB"))
      "REAL"
    else "NUMERIC"
  }

  // observed-storage lattice codes
  private val T_NULL = 0; private val T_LONG = 1; private val T_DOUBLE = 2
  private val T_BLOB = 3; private val T_STRING = 4

  private def obsCode(v: Any): Int = v match {
    case null => T_NULL
    case _: java.lang.Long => T_LONG
    case _: java.lang.Double => T_DOUBLE
    case _: Array[Byte] => T_BLOB
    case _ => T_STRING
  }

  private def join(a: Int, b: Int): Int =
    if (a == b) a
    else if (a == T_NULL) b
    else if (b == T_NULL) a
    else if ((a == T_LONG && b == T_DOUBLE) || (a == T_DOUBLE && b == T_LONG))
      T_DOUBLE
    else T_STRING // any mix involving text or blob+number renders as text

  private def sparkType(code: Int): DataType = code match {
    case T_LONG => LongType
    case T_DOUBLE => DoubleType
    case T_BLOB => BinaryType
    case _ => StringType
  }

  private def affinityCode(aff: String): Int = aff match {
    case "INTEGER" => T_LONG
    case "REAL" => T_DOUBLE
    case "BLOB" => T_BLOB
    case _ => T_STRING
  }

  private def coerce(v: Any, code: Int): Any = (v, code) match {
    case (null, _) => null
    case (l: java.lang.Long, T_LONG) => l
    case (l: java.lang.Long, T_DOUBLE) => java.lang.Double.valueOf(l.toDouble)
    case (d: java.lang.Double, T_DOUBLE) => d
    case (b: Array[Byte], T_BLOB) => b
    case (b: Array[Byte], _) =>
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    case (x, _) => x.toString
  }

  // ---- the scan --------------------------------------------------------

  /** Full-table scan of `table` in the SQLite file at `path`, schema from
    * observed storage classes (declared affinity for empty tables). */
  def read(spark: SparkSession, path: String, table: String): DataFrame = {
    if (!table.forall(c => c.isLetterOrDigit || c == '_'))
      graft.engine.Errors.io(
        s"Unable to use '$table' as a table name (alphanumeric and underscores only)")
    val m = master(path).find(r => r.typ == "table" && r.name == table)
      .getOrElse(graft.engine.Errors.io(s"No such table: $table"))
    if (m.rootPage <= 0)
      graft.engine.Errors.io(s"Virtual tables are not supported: $table")
    val cols = parseColumns(Option(m.sql).getOrElse(""))
    if (cols.isEmpty)
      graft.engine.Errors.io(s"Could not parse columns of table $table")
    val nCols = cols.size
    // rowid-alias detection, both declaration forms (fileformat2 §2.1):
    // inline `x INTEGER PRIMARY KEY`, or a table-level
    // `PRIMARY KEY ("x")` constraint naming a single INTEGER column —
    // either way the column's cells store NULL and read back the rowid
    val tablePk: Option[String] =
      "(?i)PRIMARY\\s+KEY\\s*\\(([^)]*)\\)".r
        .findFirstMatchIn(Option(m.sql).getOrElse(""))
        .map(_.group(1)).flatMap { inner =>
          inner.split(",").toSeq.map(_.trim) match {
            case Seq(one) =>
              Some(one.replaceAll("(?i)\\s+(ASC|DESC)$", "")
                .stripPrefix("\"").stripSuffix("\"")
                .stripPrefix("`").stripSuffix("`")
                .stripPrefix("[").stripSuffix("]"))
            case _ => None // composite PK never aliases rowid
          }
        }
    val rowidAlias = cols.indexWhere { case (name, decl) =>
      // inline form: INTEGER PRIMARY KEY [ASC] aliases; DESC does NOT
      // (sqlite.org/lang_createtable §rowid). Table-constraint form:
      // identifiers compare case-insensitively.
      ("(?i)^INTEGER\\s+PRIMARY\\s+KEY\\b".r.findFirstIn(decl).isDefined &&
        "(?i)^INTEGER\\s+PRIMARY\\s+KEY\\s+DESC\\b".r
          .findFirstIn(decl).isEmpty) ||
        (tablePk.exists(_.equalsIgnoreCase(name)) &&
          "(?i)^INTEGER\\b".r.findFirstIn(decl).isDefined)
    }
    val absPath = Paths.get(path).toAbsolutePath.toString
    val db = open(absPath)
    val leaves =
      try leafPages(db, m.rootPage)
      finally db.ch.close()
    val sc = spark.sparkContext
    val parts = math.max(1, math.min(leaves.size,
      spark.conf.getOption("spark.sql.shuffle.partitions")
        .map(_.toInt).getOrElse(sc.defaultParallelism)))
    // records written before an ALTER TABLE ADD COLUMN are stored SHORT;
    // the reader materializes the column's recorded DEFAULT for them
    // (null when none), like the sqlite3 library does
    val padDefaults: Array[Any] =
      cols.map { case (_, decl) => defaultOf(decl).orNull }.toArray
    // rows of one leaf batch, decoded executor-side; each partition opens
    // its own channel (cheap; pages are read once)
    def partitionRows(batch: Iterator[Int]): Iterator[Array[Any]] = {
      val pages = batch.toArray
      if (pages.isEmpty) Iterator.empty
      else {
        val d = open(absPath)
        val rows = pages.iterator.flatMap(p => leafRows(d, p)).map {
          case (rowid, vals) =>
            val out = new Array[Any](nCols)
            var i = 0
            while (i < nCols) {
              out(i) = if (i < vals.length) vals(i) else padDefaults(i)
              i += 1
            }
            if (rowidAlias >= 0 && out(rowidAlias) == null)
              out(rowidAlias) = java.lang.Long.valueOf(rowid)
            out
        }.toVector // materialize before closing the channel
        d.ch.close()
        rows.iterator
      }
    }
    val leafRdd = sc.parallelize(leaves, parts)
    // pass 1: per-column observed-storage lattice (bounded: nCols ints)
    val zero = Array.fill(nCols)(T_NULL)
    val observed = leafRdd.mapPartitions { batch =>
      val acc = Array.fill(nCols)(T_NULL)
      partitionRows(batch).foreach { vals =>
        var i = 0
        while (i < nCols) { acc(i) = join(acc(i), obsCode(vals(i))); i += 1 }
      }
      Iterator.single(acc)
    }.fold(zero)((a, b) => a.zip(b).map { case (x, y) => join(x, y) })
    val codes = cols.zipWithIndex.map { case ((_, decl), i) =>
      if (observed(i) == T_NULL) affinityCode(affinity(decl))
      else observed(i)
    }.toArray
    val schema = StructType(cols.zip(codes).map { case ((name, _), c) =>
      StructField(name, sparkType(c), nullable = true)
    })
    // pass 2: decode + coerce to the settled column types
    val rowRdd = leafRdd.mapPartitions { batch =>
      partitionRows(batch).map { vals =>
        Row.fromSeq(vals.toSeq.zip(codes.toSeq).map {
          case (v, c) => coerce(v, c)
        })
      }
    }
    spark.createDataFrame(rowRdd, schema)
  }
}
