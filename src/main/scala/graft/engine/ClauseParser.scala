package graft.engine

import scala.collection.mutable.ArrayBuffer

/** Shallow clause parser: locates clause keywords at paren-depth 0 in the
  * masked query text and slices the text between them into clause bodies.
  * Mirrors the reference's separate_actions
  * (/root/reference/rbql-py/rbql/rbql_engine.py:1241-1318) — keyword spans,
  * case-insensitive, no grammar for the expressions themselves.
  */
object ClauseParser {

  // Longest-match-first. Multi-word keywords use single spaces; the scanner
  // normalizes runs of whitespace during matching.
  private val ClauseKeywords: Seq[String] = Seq(
    "strict left join", "left outer join", "inner join", "left join", "join",
    "select", "update", "from", "where", "group by", "order by", "limit",
    "with")

  private final case class Hit(keyword: String, start: Int, end: Int)

  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Find clause keyword occurrences at paren-depth 0. */
  private def scan(text: String): Seq[Hit] = {
    val hits = ArrayBuffer.empty[Hit]
    var i = 0
    var depth = 0
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (depth == 0 && isWordChar(c) && (i == 0 || !isWordChar(text.charAt(i - 1)))) {
        // word start at depth 0 — try to match a keyword (multi-word aware)
        var matched: Option[(String, Int)] = None
        val it = ClauseKeywords.iterator
        while (it.hasNext && matched.isEmpty) {
          val kw = it.next()
          matchKeyword(lower, i, kw).foreach(end => matched = Some((kw, end)))
        }
        matched match {
          case Some((kw, end)) => hits += Hit(kw, i, end); i = end
          case None => while (i < text.length && isWordChar(text.charAt(i))) i += 1
        }
      } else i += 1
    }
    hits.toSeq
  }

  /** Match multi-word keyword `kw` at position `i`, any run of whitespace
    * between words. Returns end index. */
  private def matchKeyword(lower: String, i: Int, kw: String): Option[Int] = {
    val words = kw.split(' ')
    var pos = i
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (!lower.startsWith(word, pos)) return None
      pos += word.length
      if (pos < lower.length && isWordChar(lower.charAt(pos))) return None
      if (w < words.length - 1) {
        val ws = pos
        while (pos < lower.length && Character.isWhitespace(lower.charAt(pos))) pos += 1
        if (pos == ws) return None
      }
      w += 1
    }
    Some(pos)
  }

  /** Parse one masked pipe-stage into a StageAst. */
  def parse(masked: Lexer.Masked): StageAst = {
    val text = masked.text
    val hits = scan(text)
    if (hits.isEmpty || (hits.head.keyword != "select" && hits.head.keyword != "update"))
      Errors.parsing("Query must start with SELECT or UPDATE")
    if (hits.head.start != 0 && text.substring(0, hits.head.start).trim.nonEmpty)
      Errors.parsing(s"Unexpected text before ${hits.head.keyword.toUpperCase}: '${text.substring(0, hits.head.start).trim}'")

    // duplicate-clause guard: per exact SPELLING, with the reference's
    // message (locate_statements, rbql_engine.py:1250 — probed live:
    // 'select a1 inner join .. inner join ..' -> More than one "INNER
    // JOIN", while MIXED join spellings fall through to the join-syntax
    // error instead)
    hits.groupBy(_.keyword).collect { case (k, hs) if hs.size > 1 => k }
      .toSeq.sorted.headOption.foreach { k =>
        Errors.parsing(
          s"""More than one "${k.toUpperCase(java.util.Locale.ROOT)}" statements found""")
      }

    var select: Option[SelectSpec] = None
    var update: Option[UpdateSpec] = None
    var from: Option[String] = None
    var join: Option[JoinSpec] = None
    var where: Option[String] = None
    var groupBy: Option[Seq[String]] = None
    var orderBy: Option[Seq[OrderKey]] = None
    var limit: Option[Long] = None
    var withMods: Seq[String] = Seq.empty

    hits.zipWithIndex.foreach { case (h, idx) =>
      val bodyEnd = if (idx + 1 < hits.length) hits(idx + 1).start else text.length
      val body = text.substring(h.end, bodyEnd).trim
      h.keyword match {
        case "select" => select = Some(parseSelect(body))
        case "update" => update = Some(parseUpdate(body))
        case "from" =>
          if (body.isEmpty) Errors.parsing("FROM clause needs a table id")
          from = Some(body)
        case "where" =>
          checkNoAssignment(body)
          where = Some(body)
        case "group by" => groupBy = Some(splitTopLevel(body, ',').map(_.trim))
        case "order by" => orderBy = Some(parseOrderBy(body))
        case "limit" => limit = Some(parseIntLiteral(body, "LIMIT"))
        case "with" => withMods = parseWith(body)
        case jk =>
          val kind = jk match {
            case "join" | "inner join" => JoinKind.Inner
            case "left join" | "left outer join" => JoinKind.Left
            case "strict left join" => JoinKind.StrictLeft
          }
          join = Some(parseJoin(kind, body))
      }
    }

    if (select.isDefined && update.isDefined)
      Errors.parsing("Query can not contain both SELECT and UPDATE")
    if (select.isEmpty && update.isEmpty)
      Errors.parsing("Query must contain either SELECT or UPDATE")
    if (update.isDefined && select.isEmpty) {
      if (groupBy.isDefined) Errors.parsing("UPDATE can not be used with GROUP BY")
      if (orderBy.isDefined || limit.isDefined)
        Errors.parsing("UPDATE can not be used with ORDER BY / LIMIT")
    }
    select.foreach { s =>
      if (s.exceptCols.isDefined && join.isDefined)
        Errors.parsing("EXCEPT and JOIN are not allowed in the same query")
    }
    StageAst(select, update, from, join, where, groupBy, orderBy, limit, withMods)
  }

  /** Split on a separator char at paren-depth 0. */
  def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val parts = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      if (c == sep && depth == 0) { parts += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    parts += cur.toString
    parts.toSeq
  }

  private val TopRe = """(?is)^top\s+(\S+)\s+(.*)$""".r
  private val DistinctCountRe = """(?is)^distinct\s+count\s+(.*)$""".r
  private val DistinctRe = """(?is)^distinct\s+(.*)$""".r
  // `SELECT * EXCEPT cols` (reference form) or bare `SELECT EXCEPT cols`
  private val ExceptRe = """(?is)^(?:\*\s+)?except\s+(.*)$""".r
  private val AsRe = """(?is)^(.*\S)\s+as\s+([A-Za-z_][A-Za-z0-9_]*|`[^`]+`)\s*$""".r

  private def parseSelect(bodyIn: String): SelectSpec = {
    var body = bodyIn
    var topN: Option[Long] = None
    var distinct = false
    var distinctCount = false
    body match {
      case TopRe(n, rest) =>
        topN = Some(parseIntLiteral(n, "TOP")); body = rest
      case _ =>
    }
    body match {
      case DistinctCountRe(rest) => distinctCount = true; body = rest
      case DistinctRe(rest) => distinct = true; body = rest
      case _ =>
    }
    body match {
      case ExceptRe(rest) =>
        val cols = splitTopLevel(rest, ',').map(_.trim)
        if (cols.exists(_.isEmpty)) Errors.parsing("Empty column in EXCEPT list")
        return SelectSpec(topN, distinct, distinctCount, Some(cols), Seq.empty)
      case _ =>
    }
    if (body.trim.isEmpty) Errors.parsing("SELECT needs at least one expression")
    val items = splitTopLevel(body, ',').map(_.trim).map {
      case AsRe(e, a) => SelectItem(e.trim, Some(a.stripPrefix("`").stripSuffix("`")))
      case e =>
        if (e.isEmpty) Errors.parsing("Empty expression in SELECT list")
        SelectItem(e, None)
    }
    SelectSpec(topN, distinct, distinctCount, None, items)
  }

  private def parseUpdate(bodyIn: String): UpdateSpec = {
    val body = bodyIn.trim match {
      case b if b.toLowerCase(java.util.Locale.ROOT).startsWith("set ") => b.substring(4)
      case b => b
    }
    val assignments = splitTopLevel(body, ',').map(_.trim).map { a =>
      val eq = findTopLevelAssign(a)
      if (eq < 0) Errors.parsing(s"Invalid UPDATE assignment (expected 'var = expression'): '$a'")
      (a.substring(0, eq).trim, a.substring(eq + 1).trim)
    }
    if (assignments.isEmpty) Errors.parsing("UPDATE needs at least one assignment")
    UpdateSpec(assignments)
  }

  /** Index of the first single `=` at depth 0 that is not part of
    * ==, !=, <=, >=. */
  private def findTopLevelAssign(s: String): Int = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == '=' && depth == 0) {
        val prev = if (i > 0) s.charAt(i - 1) else ' '
        val next = if (i + 1 < s.length) s.charAt(i + 1) else ' '
        if (prev != '=' && prev != '!' && prev != '<' && prev != '>' && next != '=')
          return i
      }
      i += 1
    }
    -1
  }

  /** WHERE with a single `=` at top level is almost certainly a typo'd
    * assignment (reference guard, rbql_engine.py:1524-1528). */
  private def checkNoAssignment(body: String): Unit = {
    if (findTopLevelAssign(body) >= 0)
      Errors.parsing("WHERE expression contains assignment operator '='; use '==' for comparison")
  }

  private val DirRe = """(?is)^(.*\S)\s+(asc|desc)\s*$""".r

  /** RBQL semantics: one trailing ASC|DESC applies to the whole key tuple
    * (rbql_engine.py:1289-1296); per-key directions also honored as an
    * extension when given explicitly on non-final keys. */
  private def parseOrderBy(body: String): Seq[OrderKey] = {
    val pieces = splitTopLevel(body, ',').map(_.trim)
    if (pieces.exists(_.isEmpty)) Errors.parsing("Empty ORDER BY key")
    val parsed = pieces.map {
      case DirRe(e, d) => OrderKey(e.trim, d.equalsIgnoreCase("asc"))
      case e => OrderKey(e, asc = true)
    }
    val explicit = pieces.zip(parsed).collect {
      case (raw, k) if DirRe.findFirstIn(raw).isDefined => k
    }
    // single explicit direction on the final key → whole-tuple direction
    if (explicit.size == 1 && DirRe.findFirstIn(pieces.last).isDefined && !parsed.last.asc)
      parsed.map(_.copy(asc = false))
    else parsed
  }

  private def parseIntLiteral(s: String, clause: String): Long = {
    val t = s.trim
    try t.toLong
    catch {
      case _: NumberFormatException =>
        Errors.parsing(s"$clause expects an integer literal, got '$t'")
    }
  }

  private val WithRe = """(?is)^\(\s*([A-Za-z_, ]+?)\s*\)\s*$""".r

  private def parseWith(body: String): Seq[String] = body.trim match {
    case WithRe(mods) =>
      val ms = mods.split(',').map(_.trim.toLowerCase(java.util.Locale.ROOT)).toSeq
      val known = Set("header", "noheader")
      ms.find(!known.contains(_)).foreach(m => Errors.parsing(s"Unknown WITH modifier: '$m'"))
      ms
    case other => Errors.parsing(s"Invalid WITH clause: '$other' (expected WITH (header) or WITH (noheader))")
  }

  private def parseJoin(kind: JoinKind, body: String): JoinSpec = {
    val onIdx = findKeywordTopLevel(body, "on")
    if (onIdx < 0) Errors.parsing("JOIN clause requires ON: JOIN <table> ON a.key == b.key")
    val tableId = body.substring(0, onIdx).trim
    if (tableId.isEmpty) Errors.parsing("JOIN clause needs a table id")
    val onRaw = body.substring(onIdx + 2).trim
    if (onRaw.isEmpty) Errors.parsing("Empty ON condition in JOIN")
    JoinSpec(kind, tableId, onRaw)
  }

  private def findKeywordTopLevel(s: String, kw: String): Int = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && lower.startsWith(kw, i) &&
        (i == 0 || !isWordChar(s.charAt(i - 1))) &&
        (i + kw.length >= s.length || !isWordChar(s.charAt(i + kw.length))))
        return i
      i += 1
    }
    -1
  }
}
