package graft.sources

/** Port of the reference's quoted-field splitter semantics
  * (/root/reference/rbql-py/rbql/csv_utils.py:6-50 split_quoted_str /
  * extract_next_field): newline-agnostic, doubled-quote unescaping,
  * external whitespace tolerated around quoted fields (unless the
  * delimiter itself is a space), malformed quoting falls back to a raw
  * delimiter split for that field. */
object RfcSplit {

  private val FieldCore = "\"((?:[^\"]*\"\")*[^\"]*)\""
  private val FieldRe = java.util.regex.Pattern.compile(FieldCore)
  private val FieldReWs = java.util.regex.Pattern.compile(" *" + FieldCore + " *")

  /** Split one (possibly multiline) record into fields. */
  def splitQuoted(src: String, delim: String): Seq[String] =
    splitQuotedWithWarning(src, delim)._1

  /** Split plus the reference's defective-escaping warning flag: set when a
    * quoted field is not followed by a delimiter, or an unquoted field
    * contains a double quote (extract_next_field, csv_utils.py:11-30).
    *
    * The delimiter is matched as a full string — the reference's
    * split_quoted_str locates it with `str.find(dlm)` (csv_utils.py:24) but
    * then resumes at `uidx + 1`, mis-stepping multi-character delimiters;
    * here the scan resumes past the whole delimiter. */
  def splitQuotedWithWarning(src: String, delim: String): (Seq[String], Boolean) = {
    require(delim != "\"")
    val dlm = if (delim.isEmpty) "," else delim
    if (!src.contains('"')) return (split(src, dlm), false)
    val allowWs = dlm != " "
    val rgx = if (allowWs) FieldReWs else FieldRe
    val result = scala.collection.mutable.ArrayBuffer.empty[String]
    var warning = false
    var cidx = 0
    // one reusable matcher — region() resets it; allocating per field made
    // the splitter the CSV scan's top allocation site
    val m = rgx.matcher(src)
    while (cidx < src.length) {
      m.region(cidx, src.length)
      // Matcher.lookingAt anchors at the region start (Python re.match)
      if (m.lookingAt() &&
        (m.end == src.length || src.startsWith(dlm, m.end))) {
        result += m.group(1).replace("\"\"", "\"")
        cidx = m.end + dlm.length
      } else {
        if (m.lookingAt()) warning = true // quoted match not delimiter-bounded
        val uidx0 = src.indexOf(dlm, cidx)
        val uidx = if (uidx0 == -1) src.length else uidx0
        val field = src.substring(cidx, uidx)
        warning = warning || field.contains('"')
        result += field
        cidx = uidx + dlm.length
      }
    }
    if (src.nonEmpty && src.endsWith(dlm)) result += ""
    (result.toSeq, warning)
  }

  /** Field COUNT of one record — the same control flow as
    * [[splitQuotedWithWarning]] with zero per-field allocation (no
    * substring, no unescape, no buffer). Backs the width-inference pass
    * and the NF warning scan, which only need counts: counting via the
    * full splitter materialized and discarded every field array. */
  def countFields(src: String, delim: String): Int = {
    require(delim != "\"")
    val dlm = if (delim.isEmpty) "," else delim
    if (!src.contains('"')) return countPlain(src, dlm)
    val allowWs = dlm != " "
    val rgx = if (allowWs) FieldReWs else FieldRe
    var n = 0
    var cidx = 0
    val m = rgx.matcher(src)
    while (cidx < src.length) {
      m.region(cidx, src.length)
      if (m.lookingAt() &&
        (m.end == src.length || src.startsWith(dlm, m.end))) {
        n += 1
        cidx = m.end + dlm.length
      } else {
        val uidx0 = src.indexOf(dlm, cidx)
        val uidx = if (uidx0 == -1) src.length else uidx0
        n += 1
        cidx = uidx + dlm.length
      }
    }
    if (src.nonEmpty && src.endsWith(dlm)) n += 1
    n
  }

  private def countPlain(src: String, dlm: String): Int = {
    var n = 1
    var i = src.indexOf(dlm)
    while (i >= 0) { n += 1; i = src.indexOf(dlm, i + dlm.length) }
    n
  }

  private def split(src: String, dlm: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = src.indexOf(dlm)
    while (i >= 0) {
      out += src.substring(start, i)
      start = i + dlm.length
      i = src.indexOf(dlm, start)
    }
    out += src.substring(start)
    out.toSeq
  }
}
