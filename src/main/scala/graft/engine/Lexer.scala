package graft.engine

import scala.collection.mutable.ArrayBuffer

/** String-literal masking, so clause/keyword scanning never fires inside a
  * quoted literal. Semantics follow the reference's
  * separate_string_literals (/root/reference/rbql-py/rbql/rbql_engine.py:1222-1238):
  * replace every literal with an indexed placeholder, parse the masked text,
  * then restore literals inside each extracted clause.
  *
  * Our expression dialect is Spark SQL, so literals are single- or
  * double-quoted with backslash escapes and doubled-quote escapes.
  */
object Lexer {

  final case class Masked(text: String, literals: IndexedSeq[String]) {
    /** Restore literals in a fragment of the masked text. */
    def restore(fragment: String): String = {
      var out = fragment
      var i = 0
      while (i < literals.length) {
        out = out.replace(placeholder(i), literals(i))
        i += 1
      }
      out
    }
    def hasLiterals(fragment: String): Boolean = fragment.contains("###GRAFT_S")
  }

  def placeholder(i: Int): String = s"###GRAFT_S${i}E###"

  /** Mask string literals. Handles \-escapes and doubled quotes ('' / "")
    * inside literals. Unterminated literal → parsing error. */
  def mask(query: String): Masked = {
    val sb = new StringBuilder
    val lits = ArrayBuffer.empty[String]
    var i = 0
    val n = query.length
    while (i < n) {
      val c = query.charAt(i)
      if (c == '\'' || c == '"') {
        val quote = c
        val start = i
        i += 1
        var done = false
        while (!done) {
          if (i >= n) Errors.parsing(s"Unterminated string literal starting at position $start")
          val ch = query.charAt(i)
          if (ch == '\\' && i + 1 < n) i += 2
          else if (ch == quote && i + 1 < n && query.charAt(i + 1) == quote) i += 2 // doubled-quote escape
          else if (ch == quote) { i += 1; done = true }
          else i += 1
        }
        sb.append(placeholder(lits.length))
        lits += query.substring(start, i)
      } else {
        sb.append(c)
        i += 1
      }
    }
    // JS-dialect equality spellings (reference accepts === / !== in the
    // JS twin): normalize on the MASKED text, so literals are untouched
    val normalized = sb.toString.replace("===", "==").replace("!==", "!=")
    Masked(normalized, lits.toIndexedSeq)
  }

  /** Normalize the raw query text the way the reference's cleanup_query does
    * (rbql_engine.py:1398-1402 + strip_comments at :978-982): split on
    * newlines, trim each line, drop full-line `#` comments and empty lines,
    * join with single spaces, then strip trailing semicolons.
    *
    * Comment stripping runs BEFORE literal masking — same as the reference,
    * so a `#` at the start of a line inside a multi-line string literal is
    * treated as a comment there too (documented reference behavior, not a
    * divergence). */
  def cleanup(query: String): String = {
    val joined = query
      .split("\n", -1)
      .iterator
      .map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#"))
      .mkString(" ")
    val noSemi = joined.reverse.dropWhile(_ == ';').reverse.trim
    // `UPDATE a SET …` names the input table redundantly — strip it, like
    // the reference's remove_redundant_input_table_name
    // (rbql_engine.py:1405-1408; the FROM-a half is handled structurally
    // in PlanBuilder)
    "(?i)^update\\s+a\\s+set\\s".r.replaceFirstIn(noSemi, "update ")
  }

  private val StageSplit =
    """(?i)\|\>?\s*(?=(select|update)\b)""".r

  /** Split a masked query into pipe stages at top-level `| select` /
    * `| update` / `|> select` boundaries (reference split_query_to_stages,
    * rbql_engine.py:1577-1580). `||` (SQL concat) never matches because the
    * lookahead requires a SELECT/UPDATE keyword. */
  def splitStages(maskedText: String): Seq[String] = {
    val parts = StageSplit.split(maskedText).toSeq.map(_.trim)
    parts.filter(_.nonEmpty) match {
      case Nil => Seq(maskedText.trim)
      case ps  => ps
    }
  }
}
