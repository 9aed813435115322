package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

import scala.util.{Failure, Success, Try}

/** Data-driven runner over the reference's full engine golden corpus
  * (/root/reference/test/rbql_unit_tests.json, 104 cases; reference runner
  * shape: test/test_rbql.py:442-515).
  *
  * The reference embeds Python expressions; graft embeds Spark SQL. Queries
  * are translated mechanically by [[PyDialect.translate]] (int()→cast,
  * len()→length, string-`+`→`||`, `is None`→`is null`, …); cases whose
  * expressions are genuinely host-language (f-strings, raw strings, Python
  * init code) carry an explicit rewrite or a skip with a reason in
  * [[CorpusSpec.overrides]].
  *
  * Comparison mirrors the reference runner: ordered row equality after
  * float rounding, plus output-header equality when the case pins one.
  * Numbers and numeric strings canonicalize to the same form because the
  * reference surfaces typed values where graft's string-typed tables
  * surface int-preserved strings (SURVEY §1.2).
  *
  * expected_warnings are not asserted here: the in-memory table path pads
  * ragged rows (reference safe_get semantics) without a warning channel;
  * the CSV path, which is where the reference emits these warnings, covers
  * them in SourcesSpec.
  */
class CorpusSpec extends SparkSpec {

  import CorpusSpec._

  private val corpusFile = new java.io.File("/root/reference/test/rbql_unit_tests.json")

  private val cases: List[JObject] =
    if (!corpusFile.exists()) Nil
    else JsonMethods.parse(corpusFile) match {
      case JArray(cs) => cs.collect { case o: JObject => o }
      case _          => Nil
    }

  private def field(c: JObject, k: String): JValue = c \ k

  private def strOpt(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _          => None
  }

  private def scalarToStr(v: JValue): String = v match {
    case JString(s)  => s
    case JInt(i)     => i.toString
    case JLong(i)    => i.toString
    case JDouble(d)  => d.toString
    case JDecimal(d) => d.toString
    case JBool(b)    => b.toString
    case _           => null
  }

  private def tableOf(v: JValue): Option[Seq[Seq[String]]] = v match {
    case JArray(rows) => Some(rows.map {
      case JArray(cells) => cells.map(scalarToStr)
      case other         => Seq(scalarToStr(other))
    })
    case _ => None
  }

  private def namesOf(v: JValue): Option[Seq[String]] = v match {
    case JArray(ns) => Some(ns.map { case JString(s) => s; case o => scalarToStr(o) })
    case _          => None
  }

  // ---- canonical value form (reference round_floats + graft's string-typed
  // tables: 100 ≡ "100", 2.0 ≡ "2") -------------------------------------
  private def canonNum(bd: BigDecimal): String = {
    val s = bd.setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .underlying.stripTrailingZeros.toPlainString
    if (s == "-0") "0" else s
  }

  private val NumericRe = """-?\d+(\.\d+)?([eE][+-]?\d+)?""".r

  private def canon(v: Any): String = v match {
    case null                  => "\u0000NULL"
    case s: String             =>
      if (NumericRe.matches(s)) Try(canonNum(BigDecimal(s))).getOrElse(s) else s
    case d: Double             => canonNum(BigDecimal(d))
    case f: Float              => canonNum(BigDecimal(f.toDouble))
    case b: Boolean            => b.toString
    case n: java.lang.Number   => Try(canonNum(BigDecimal(n.toString))).getOrElse(n.toString)
    case seq: scala.collection.Seq[_] => seq.map(canon).mkString("[", ",", "]")
    case other                 => other.toString
  }

  private def canonJ(v: JValue): String = v match {
    case JNull | JNothing => "\u0000NULL"
    case JString(s)       => canon(s)
    case JInt(i)          => canonNum(BigDecimal(i))
    case JLong(i)         => canonNum(BigDecimal(i))
    case JDouble(d)       => canonNum(BigDecimal(d))
    case JDecimal(d)      => canonNum(d)
    case JBool(b)         => b.toString
    case JArray(xs)       => xs.map(canonJ).mkString("[", ",", "]")
    case other            => other.toString
  }

  // ---- per-case execution ----------------------------------------------
  private def runCase(c: JObject, graftQuery: String, init: Seq[String]): Unit = {
    val input = tableOf(field(c, "input_table")).getOrElse(Seq.empty)
    val inputNames = namesOf(field(c, "input_column_names"))
    val joinTable = tableOf(field(c, "join_table"))
    val joinNames = namesOf(field(c, "join_column_names"))

    val errorExpected = Seq("expected_error", "expected_error_py",
      "expected_error_py_2", "expected_error_py_3")
      .exists(k => strOpt(field(c, k)).isDefined)

    init.foreach(spark.sql(_).collect())

    val attempt = Try {
      val df = Graft.queryTableDf(spark, graftQuery, input, inputNames,
        joinTable.map(j => (j, joinNames)))
      // ragged (unpacked/variable-width) output spreads to per-record lists
      (df.columns.toSeq, Graft.spreadRagged(df))
    }

    if (errorExpected) {
      attempt match {
        case Success((_, rows)) =>
          fail(s"expected an error but query succeeded with ${rows.length} rows: $graftQuery")
        case Failure(_) => // any raised error satisfies the case; graft's
        // message texts legitimately differ from Python's
      }
    } else {
      val (cols, rows) = attempt match {
        case Success(r) => r
        case Failure(e) => fail(s"query failed: $graftQuery\n  ${e.getMessage}", e)
      }
      val expected = field(c, "expected_output_table") match {
        case JArray(rs) => rs.map { case JArray(cells) => cells.map(canonJ); case o => Seq(canonJ(o)) }
        case _          => Nil
      }
      val actual = rows.map(_.map(canon))
      assert(actual == expected,
        s"\nquery: $graftQuery\nexpected: ${expected.mkString(" | ")}\nactual:   ${actual.mkString(" | ")}")
      namesOf(field(c, "expected_output_header")).filter(_.nonEmpty).foreach { hdr =>
        assert(cols == hdr, s"\nquery: $graftQuery\nexpected header: $hdr\nactual header:   $cols")
      }
    }
  }

  // ---- test registration ------------------------------------------------
  private var ran = 0
  private val skipped = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

  for ((c, idx) <- cases.zipWithIndex) {
    val name = strOpt(field(c, "test_name")).getOrElse(s"case_$idx")
    val pyQuery = strOpt(field(c, "query_python"))
      .orElse(strOpt(field(c, "query_python_3")))
    val ov = overrides.get(name)

    (ov, pyQuery) match {
      case (Some(Skip(reason)), _) =>
        skipped += ((name, reason))
      case (None, None) =>
        skipped += ((name, "JS-only case (the reference's Python runner skips it too)"))
      case (maybeOv, _) =>
        ran += 1
        val (q, init) = maybeOv match {
          case Some(Rewrite(gq, init)) => (gq, init)
          case _                       => (PyDialect.translate(pyQuery.get), Seq.empty[String])
        }
        test(s"corpus[$idx]: $name") { runCase(c, q, init) }
    }
  }

  test("corpus accounting: every case runs or is skip-listed with a reason") {
    assert(cases.nonEmpty, s"corpus not found at $corpusFile")
    assert(ran + skipped.size == cases.size)
    info(s"corpus: ${cases.size} cases, $ran executed, ${skipped.size} skipped:")
    skipped.foreach { case (n, r) => info(s"  SKIP $n — $r") }
    assert(ran >= 85, s"expected ≥85 executed corpus cases, got $ran")
  }
}

object CorpusSpec {
  sealed trait Override
  final case class Skip(reason: String) extends Override
  final case class Rewrite(graftQuery: String, init: Seq[String] = Seq.empty) extends Override

  /** Cases whose Python expressions can't be mapped mechanically. Each entry
    * either rewrites the query in graft's dialect (same clause semantics
    * under test) or skips with the reason. */
  val overrides: Map[String, Override] = Map(
    // Python raw string literal with escaped quotes; rewritten with the
    // equivalent Spark literal (reference expected output keeps backslashes)
    "test4" -> Rewrite("""select cast(sqrt(cast(a1 as int)) as int), '\\\'\\"a1   bc'"""),
    // Python f-string interpolation → concat
    "string_interpolation_test" -> Rewrite(
      "select 'mv ' || a1 || ' ' || a2 || cast(NR as string) || ' --opt1 --opt2'"),
    // Python lambda over the collected list (len of list → size of array)
    "array_agg_with_grouping" -> Rewrite(
      """select array_agg(a2), a1, array_agg(a4, v -> size(v)) where a1 == "car" or a1 == "dog" group by a1"""),
    // Python user init code defines foobar(); graft's user-init surface is
    // SQL statements — a Spark 4 SQL UDF is the dialect-native equivalent
    "user_init_code_1" -> Rewrite(
      "select a1, foobar(a2), a3",
      init = Seq("CREATE OR REPLACE TEMPORARY FUNCTION foobar(val STRING) RETURNS STRING RETURN val || ' FOObar'")),
    // Python init code computes uuid.uuid5 (SHA-1-based name UUID); same
    // algorithm expressed as a SQL UDF: sha1(NAMESPACE_DNS bytes || name),
    // then splice in the version (5) and variant (10) bits per RFC 4122
    "User init code with import" -> Rewrite(
      "update set a1 = joe(a1)",
      init = Seq(
        """CREATE OR REPLACE TEMPORARY FUNCTION graft_uuid5_digest(val STRING) RETURNS STRING RETURN
           sha1(concat(unhex('6ba7b8109dad11d180b400c04fd430c8'), encode(val, 'UTF-8')))""",
        """CREATE OR REPLACE TEMPORARY FUNCTION joe(val STRING) RETURNS STRING RETURN
           concat(
             substr(graft_uuid5_digest(val), 1, 8), '-',
             substr(graft_uuid5_digest(val), 9, 4), '-',
             '5', substr(graft_uuid5_digest(val), 14, 3), '-',
             lpad(lower(hex((cast(conv(substr(graft_uuid5_digest(val), 17, 2), 16, 10) as int) & 63) | 128)), 2, '0'),
             substr(graft_uuid5_digest(val), 19, 2), '-',
             substr(graft_uuid5_digest(val), 21, 12))""")),
    // JS-only in the reference, but graft normalizes === / !== for parity —
    // run the query_js text directly
    "triple_equality_js" -> Rewrite("""select NR where a3 === "gamma""""),
    // JS-only cases with mechanically mappable expressions (round-3 verdict
    // item: run the query_js text where the semantics are host-neutral):
    // Math.min/Math.max over parsed ints → least/greatest
    "math_max_math_min_js" -> Rewrite(
      "select least(cast(a2 as int), cast(a4 as int)), greatest(cast(a2 as int), cast(a4 as int))"),
    // JS sorts the int-typed a2 numerically; the values are ints, so the
    // explicit cast expresses the same key
    "test_mixed_type_records_int_string" -> Rewrite(
      "select * order by cast(a2 as int)"),
    // string-typed a2 sorts lexicographically — the query text is already
    // host-neutral
    "test_non_mixed_records_js" -> Rewrite("select * order by a2"),
    // aggregate nested in a scalar call must error (same restriction as the
    // reference, host-neutral); fs.statSync → any scalar function
    "aggregate_inside_expression_js" -> Rewrite("select length(MAX(a1))"),
    // unknown identifier between conditions must error (graft raises its
    // own parse error; the corpus accepts any raised error)
    "JS: unexpected identifier" -> Rewrite("select * where a1 < 0 andor a1 > 40"),
    // the reference's JS backend REJECTS `and`/`or` with a hint; graft's
    // dialect (like the reference's Python backend) supports them, so these
    // error cases are deliberately non-errors here
    "Invalid JS 'and'" -> Skip(
      "graft supports the `and` keyword (Python-dialect semantics); the JS backend's rejection hint does not apply"),
    "Invalid JS 'or'" -> Skip(
      "graft supports the `or` keyword (Python-dialect semantics); the JS backend's rejection hint does not apply"),
    // graft deliberately supports the SQL LIKE operator (the reference
    // rejects it and points users at the like() function, which graft also
    // supports — q_like)
    "invalid like operator usage" -> Skip(
      "graft supports the SQL LIKE operator as a deliberate extension"),
    // python-specific syntax-error report formatting (caret position inside
    // the Python snippet); graft raises its own parse error for the same
    // query — the error-category behavior is covered by GoldenSpec
    "user-friendly syntax error report" -> Rewrite("select a1{, 'a string', a2")
  )
}

/** Mechanical Python-expression → Spark-SQL translation for corpus queries.
  * Only syntactic, literal-safe rewrites live here; anything semantic gets
  * an explicit override in [[CorpusSpec.overrides]]. */
object PyDialect {

  private val PH = '\u0001'
  private def ph(i: Int): String = s"$PH$i$PH"
  private val PhRe = s"$PH(\\d+)$PH".r

  /** Mask string literals (single/double quoted, backslash escapes) so
    * rewrites never touch literal text. */
  private def mask(q: String): (String, Vector[String]) = {
    val sb = new StringBuilder
    val lits = Vector.newBuilder[String]
    var n = 0
    var i = 0
    while (i < q.length) {
      val ch = q.charAt(i)
      if (ch == '\'' || ch == '"') {
        val quote = ch
        val start = i
        i += 1
        var done = false
        while (!done && i < q.length) {
          val c = q.charAt(i)
          if (c == '\\' && i + 1 < q.length) i += 2
          else if (c == quote) { i += 1; done = true }
          else i += 1
        }
        lits += q.substring(start, i)
        sb.append(ph(n)); n += 1
      } else { sb.append(ch); i += 1 }
    }
    (sb.toString, lits.result())
  }

  private def unquote(lit: String): String =
    if (lit.length >= 2) lit.substring(1, lit.length - 1) else lit

  /** Rewrite every balanced call `name(inner)` via `f`, innermost first. */
  private def rewriteCalls(s: String, name: String)(f: String => String): String = {
    val pat = ("""(?<![A-Za-z0-9_.])""" + java.util.regex.Pattern.quote(name) + """\(""").r
    pat.findFirstMatchIn(s) match {
      case None => s
      case Some(m) =>
        val open = m.end - 1
        var depth = 0
        var i = open
        var close = -1
        while (i < s.length && close < 0) {
          val c = s.charAt(i)
          if (c == '(') depth += 1
          else if (c == ')') { depth -= 1; if (depth == 0) close = i }
          i += 1
        }
        if (close < 0) s // unbalanced — leave for the engine to report
        else {
          val inner = rewriteCalls(s.substring(open + 1, close), name)(f)
          rewriteCalls(
            s.substring(0, m.start) + f(inner) + s.substring(close + 1), name)(f)
        }
    }
  }

  def translate(pyQuery: String): String = {
    val (masked0, lits0) = mask(pyQuery)
    var s = masked0
    var lits = lits0

    def addLit(text: String): String = { lits = lits :+ text; ph(lits.length - 1) }

    // type conversions / builtins (bottom-up, balanced)
    s = rewriteCalls(s, "int")(inner => s"cast($inner as int)")
    s = rewriteCalls(s, "float")(inner => s"cast($inner as double)")
    s = rewriteCalls(s, "str")(inner => s"cast($inner as string)")
    s = rewriteCalls(s, "len")(inner => s"length($inner)")
    s = rewriteCalls(s, "math.sqrt")(inner => s"sqrt($inner)")

    // re.search(PATTERN, X) is (not) None → regexp_like
    s = (s"""re\\.search\\(\\s*($PH\\d+$PH)\\s*,\\s*([^)]+?)\\)\\s*is\\s+not\\s+None""").r
      .replaceAllIn(s, m => util.matching.Regex.quoteReplacement(
        s"regexp_like(${m.group(2)}, ${m.group(1)})"))
    s = (s"""re\\.search\\(\\s*($PH\\d+$PH)\\s*,\\s*([^)]+?)\\)\\s*is\\s+None""").r
      .replaceAllIn(s, m => util.matching.Regex.quoteReplacement(
        s"not regexp_like(${m.group(2)}, ${m.group(1)})"))

    // X.split(SEP) → split(X, regex-quoted SEP)  (Python split is literal;
    // Spark's is a Java regex → \Q…\E quoting, doubled backslashes for the
    // non-ANSI string-literal escape pass)
    s = (s"""([A-Za-z0-9_\\]\\[.]+)\\.split\\(($PH\\d+$PH)\\)""").r.replaceAllIn(s, m => {
      val sep = unquote(lits(PhRe.findFirstMatchIn(m.group(2)).get.group(1).toInt))
      val quoted = java.util.regex.Pattern.quote(sep)
        .replace("\\", "\\\\").replace("'", "\\'")
      util.matching.Regex.quoteReplacement(s"split(${m.group(1)}, ${addLit(s"'$quoted'")})")
    })

    // string methods → Spark functions (receiver may be a var or a.name)
    val Recv = """([A-Za-z0-9_\]\[.]+)"""
    s = (Recv + """\.upper\(\s*\)""").r.replaceAllIn(s, m =>
      util.matching.Regex.quoteReplacement(s"upper(${m.group(1)})"))
    s = (Recv + """\.lower\(\s*\)""").r.replaceAllIn(s, m =>
      util.matching.Regex.quoteReplacement(s"lower(${m.group(1)})"))
    s = (Recv + s"""\\.replace\\(\\s*($PH\\d+$PH)\\s*,\\s*($PH\\d+$PH)\\s*\\)""").r
      .replaceAllIn(s, m => util.matching.Regex.quoteReplacement(
        s"replace(${m.group(1)}, ${m.group(2)}, ${m.group(3)})"))
    // Python str.find → instr - 1 (both use -1/0 for "not found")
    s = (Recv + s"""\\.find\\(\\s*($PH\\d+$PH)\\s*\\)""").r.replaceAllIn(s, m =>
      util.matching.Regex.quoteReplacement(
        s"(instr(${m.group(1)}, ${m.group(2)}) - 1)"))
    s = (Recv + s"""\\.startswith\\(\\s*($PH\\d+$PH)\\s*\\)""").r.replaceAllIn(s, m =>
      util.matching.Regex.quoteReplacement(
        s"startswith(${m.group(1)}, ${m.group(2)})"))
    s = (Recv + s"""\\.endswith\\(\\s*($PH\\d+$PH)\\s*\\)""").r.replaceAllIn(s, m =>
      util.matching.Regex.quoteReplacement(
        s"endswith(${m.group(1)}, ${m.group(2)})"))

    // Python membership over a split list: `LIT in split(x, sep)` →
    // array_contains(split(x, sep), LIT)
    s = (s"""($PH\\d+$PH)\\s+in\\s+(split\\([^()]*\\))""").r.replaceAllIn(s, m =>
      util.matching.Regex.quoteReplacement(
        s"array_contains(${m.group(2)}, ${m.group(1)})"))

    // format(expr, '.2f') → format_string('%.2f', expr). NOTE: never
    // String.trim here — the  placeholder marker is below U+0020 and
    // trim would strip it. The unrecognized-shape fallback uses a 
    // marker so rewriteCalls can't re-match it (restored below).
    s = rewriteCalls(s, "format") { inner =>
      val lastComma = {
        var depth = 0; var idx = -1
        inner.zipWithIndex.foreach { case (ch, i) =>
          if (ch == '(') depth += 1
          else if (ch == ')') depth -= 1
          else if (ch == ',' && depth == 0) idx = i
        }
        idx
      }
      def keep = s"format($inner)"
      if (lastComma < 0) keep
      else {
        val argT = inner.substring(0, lastComma)
        val fmtPh = inner.substring(lastComma + 1)
        PhRe.findFirstMatchIn(fmtPh) match {
          case Some(mm) =>
            val fmt = unquote(lits(mm.group(1).toInt))
            // float conversions need a DOUBLE arg (a DECIMAL would throw
            // IllegalFormatConversionException in Java's Formatter)
            val arg =
              if ("[efg]$".r.findFirstIn(fmt.toLowerCase(java.util.Locale.ROOT)).isDefined)
                s"cast(($argT) as double)"
              else argT
            s"format_string(${addLit(s"'%$fmt'")}, $arg)"
          case None => keep
        }
      }
    }
    s = s.replace("format(", "format(")

    // "…{}…".format(args) → format_string('…%s…', args)
    s = {
      val fmtRe = (s"""($PH\\d+$PH)\\.format\\(""").r
      var cur = s
      var m = fmtRe.findFirstMatchIn(cur)
      while (m.isDefined) {
        val mm = m.get
        val open = mm.end - 1
        var depth = 0; var i = open; var close = -1
        while (i < cur.length && close < 0) {
          val c = cur.charAt(i)
          if (c == '(') depth += 1
          else if (c == ')') { depth -= 1; if (depth == 0) close = i }
          i += 1
        }
        if (close < 0) m = None
        else {
          val litIdx = PhRe.findFirstMatchIn(mm.group(1)).get.group(1).toInt
          val fmt = unquote(lits(litIdx)).replace("%", "%%").replace("{}", "%s")
          val args = cur.substring(open + 1, close)
          cur = cur.substring(0, mm.start) +
            s"format_string(${addLit(s"'$fmt'")}, $args)" + cur.substring(close + 1)
          m = fmtRe.findFirstMatchIn(cur)
        }
      }
      cur
    }

    // string concatenation: `+` with a string literal on either side → ||
    var prev = ""
    while (prev != s) {
      prev = s
      s = (s"""($PH\\d+$PH)(\\s*)\\+""").r.replaceAllIn(s, m =>
        util.matching.Regex.quoteReplacement(s"${m.group(1)}${m.group(2)}||"))
      s = (s"""\\+(\\s*)($PH\\d+$PH)""").r.replaceAllIn(s, m =>
        util.matching.Regex.quoteReplacement(s"||${m.group(1)}${m.group(2)}"))
    }

    // None → null (covers `is [not] None` and bare None)
    s = """(?<![A-Za-z0-9_])None(?![A-Za-z0-9_])""".r.replaceAllIn(s, "null")

    // membership: in [a, b, c] → in (a, b, c)
    s = """(?i)(?<![A-Za-z0-9_])in\s*\[([^\]]*)\]""".r.replaceAllIn(s, m =>
      util.matching.Regex.quoteReplacement(s"in (${m.group(1)})"))

    // restore literals
    PhRe.replaceAllIn(s, m =>
      util.matching.Regex.quoteReplacement(lits(m.group(1).toInt)))
  }
}
