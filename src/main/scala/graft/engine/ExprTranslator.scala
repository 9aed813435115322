package graft.engine

import org.apache.spark.sql.types.StructType
import scala.util.matching.Regex

/** Translates RBQL variable references embedded in (masked) Spark-SQL
  * expression text into qualified column references.
  *
  * Variable forms (reference parsers, /root/reference/rbql-py/rbql/
  * rbql_engine.py:1048-1115):
  *   a1..aN, b1..bN          positional
  *   a[3], b[3]              positional (bracket)
  *   a.name, b.name          header/name-based (identifier-like)
  *   a["some name"]          header/name-based (arbitrary)
  *   NR                      1-based record number
  *   NF                      per-record field count
  *
  * The A side is aliased `graft_a`, the B (join) side `graft_b`; rewritten
  * references are fully qualified + backtick-quoted so arbitrary header
  * names survive and A/B name collisions stay unambiguous.
  */
final class ExprTranslator(
    aSchema: StructType,
    bSchema: Option[StructType],
    masked: Lexer.Masked,
    /** Opt-in reference parity for JSON object access
      * (`spark.graft.json.strictKeys`): a missing key raises the
      * reference's per-record error instead of binding null. */
    strictJsonKeys: Boolean = false) {

  /** Ragged mode: the A table is a single `__graft_fields` array<string>
    * column (faithful model of the reference's list-of-fields records,
    * SURVEY §1.4). Positional vars become element_at (null past the end —
    * safe_get semantics, rbql_engine.py:249-250) and NF is per-record. */
  private val raggedA: Boolean =
    aSchema.fieldNames.contains(ExprTranslator.FieldsCol)

  /** Whether the A table uses the ragged (fields-array) record model. */
  def isRaggedA: Boolean = raggedA

  import ExprTranslator._

  val nrCol = "__graft_nr"
  val bNrCol = "__graft_bnr"

  /** Set true by translate() when the expression referenced NR. */
  private var _usedNr = false
  def usedNr: Boolean = _usedNr

  /** Sides whose strict-JSON-key guards referenced a record number. */
  private var _usedStrictNr = Set.empty[Char]

  private def colByPos(side: Char, n: Int): String = {
    if (side == 'a' && raggedA)
      return s"try_element_at(graft_a.`${ExprTranslator.FieldsCol}`, $n)"
    // positional variables address user columns only — the materialized
    // NR columns are appended internals and must not shift/extend the range
    val user = userFields(side)
    // empty table (e.g. empty CSV file): variables never bind in the
    // reference's loop — any reference resolves to null and the query
    // returns empty rather than erroring
    if (user.isEmpty) return "cast(null as string)"
    if (n < 1)
      Errors.parsing(s"Variable ${side}$n is out of range: table ${side.toUpper} has ${user.length} columns")
    // PAST-the-width positional reads bind None, they do not error
    // (reference safe_get pads: `select a4` over a 2-column table emits
    // None values plus the sink's None-warning — probed live; only
    // sub-1 indices and UPDATE targets error). The null is typed string
    // so downstream Python-truthiness/equality behave like None.
    if (n > user.length) return "cast(null as string)"
    qualify(side, user(n - 1).name)
  }

  private def userFields(side: Char): Array[org.apache.spark.sql.types.StructField] =
    sideSchema(side).fields.filterNot(f => f.name == nrCol || f.name == bNrCol)

  /** JOIN-key strictness (reference resolve_join_variables): an
    * out-of-range positional KEY errors, unlike plain expression reads
    * which pad None. Empty tables bind null and never error. A ragged
    * (fields-array) A side has NO static width at all — the reference
    * errors per record at runtime ('No "aN" field at record NR', probed:
    * `a7 == b1` over 2-field records is a RUNTIME error at record 1, not
    * a parse error), which [[PlanBuilder.guardAJoinKeys]] reproduces. */
  private[engine] def checkJoinKeyRange(side: Char, n: Int): Unit = {
    if (side == 'a' && raggedA) {
      if (n < 1) Errors.parsing(
        s"""Unable to parse JOIN expression: Input table does not have field "$side$n"""")
      return
    }
    val user = userFields(side)
    if (user.nonEmpty && (n < 1 || n > user.length))
      Errors.parsing(
        s"Variable $side$n is out of range: table ${side.toUpper} has ${user.length} columns")
  }

  private def sideSchema(side: Char): StructType = side match {
    case 'a' => aSchema
    case 'b' =>
      bSchema.getOrElse(Errors.parsing("Variable with 'b' prefix used without JOIN"))
  }

  private def originalName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(graft.Graft.OriginalNameKey))
      f.metadata.getString(graft.Graft.OriginalNameKey)
    else f.name

  private def colByName(side: Char, name: String): String = {
    val schema = sideSchema(side)
    // duplicate header names resolve to the LAST occurrence (reference
    // parse_attribute_variables / parse_dictionary_variables build a
    // name→index dict in header order, rbql_engine.py:1048-1075)
    val exact = schema.fields.filter(f => originalName(f) == name).lastOption
    val field = exact
      .orElse(schema.fields.filter(f => originalName(f).equalsIgnoreCase(name)).lastOption)
      .getOrElse(Errors.parsing(
        s"Column '$name' not found in table ${side.toUpper}; available: ${schema.fields.map(originalName).mkString(", ")}"))
    qualify(side, field.name)
  }

  private def qualify(side: Char, col: String): String = {
    val alias = if (side == 'a') "graft_a" else "graft_b"
    s"$alias.`${col.replace("`", "``")}`"
  }

  /** Name of the source column a positional/named var refers to (for output
    * header inference). */
  def sourceName(side: Char, n: Int): String = userFields(side)(n - 1).name

  /** Translate one expression fragment (masked). Returns Spark SQL text with
    * literals restored. */
  def translate(fragment: String): String = {
    // Multi-arg min()/max() are the Python builtins (scalar least/greatest),
    // valid in ANY expression position in the reference — WHERE, ORDER BY,
    // UPDATE right-hand sides — not just select items (where
    // Aggregates.classify already rewrites them). Idempotent: 1-arg calls
    // are untouched, rewritten text has no min(/max( left. Safe on masked
    // text: literals are placeholders, so the top-level comma split cannot
    // hit a quoted comma.
    var s = Aggregates.rewritePolymorphic(fragment)
    // a["literal name"] / b['literal name'] — placeholder inside brackets
    s = BracketNameRe.replaceAllIn(s, m => {
      val side = m.group(1).charAt(0)
      val lit = masked.literals(m.group(2).toInt)
      Regex.quoteReplacement(colByName(side, unquote(lit)))
    })
    // a[3] / b[3]
    s = BracketPosRe.replaceAllIn(s, m =>
      Regex.quoteReplacement(colByPos(m.group(1).charAt(0), m.group(2).toInt)))
    // a1['name']['nested'] — string subscripts on a positional var are
    // JSON-object access on a VARIANT column (the JSON-lines data model,
    // reference rbql_json.py record = parsed object): chained keys become
    // one variant_get path
    s = VarSubscriptRe.replaceAllIn(s, m => {
      val side = m.group(1).charAt(0)
      val base = colByPos(side, m.group(2).toInt)
      val keys = """###GRAFT_S(\d+)E###""".r.findAllMatchIn(m.group(3))
        .map(mm => unquote(masked.literals(mm.group(1).toInt))).toList
      val rawPath = "$" + keys.map(k => s"['$k']").mkString
      // escape for embedding in a SQL string literal
      def pathLit(p: String) =
        "'" + p.replace("\\", "\\\\").replace("'", "\\'") + "'"
      val sqlLit = pathLit(rawPath)
      if (!strictJsonKeys)
        Regex.quoteReplacement(s"variant_get($base, $sqlLit)")
      else {
        // reference dict-access parity (rbql_engine.py:767 wraps the
        // KeyError: "At record NR, Details: 'key'"): each key-prefix is
        // existence-probed — variant_get-to-VARIANT returns SQL NULL only
        // for an ABSENT path (an explicit JSON null comes back as a
        // non-null variant encoding null, probed on Spark 4.1) — and the
        // first missing prefix raises with ITS key name, like Python's
        // left-to-right subscript evaluation. Known corner: subscripting
        // THROUGH a scalar/null also probes as absent and names the key,
        // where Python raises a TypeError with a different message.
        _usedStrictNr = _usedStrictNr + side
        val nrRef =
          if (side == 'a') s"graft_a.`$nrCol`" else s"graft_b.`$bNrCol`"
        val whens = keys.inits.toList.reverse.drop(1).map { prefix =>
          val pLit = pathLit("$" + prefix.map(k => s"['$k']").mkString)
          val keyMsg = prefix.last.replace("'", "''")
          s"WHEN variant_get($base, $pLit, 'variant') IS NULL THEN " +
            s"raise_error(CONCAT('At record ', CAST($nrRef AS STRING), " +
            "', Details: ''" + keyMsg + "''')) "
        }.mkString
        Regex.quoteReplacement(
          s"(CASE ${whens}ELSE variant_get($base, $sqlLit) END)")
      }
    })
    // b.NR / bNR — record number of the JOIN table (reference
    // rbql_engine.py:1030-1031 allows NR as a join key on either side)
    s = BNrRe.replaceAllIn(s, _ => Regex.quoteReplacement(s"graft_b.`$bNrCol`"))
    // a.NR / aNR (accepted join-key spelling)
    s = DotNrRe.replaceAllIn(s, _ => { _usedNr = true; Regex.quoteReplacement(s"graft_a.`$nrCol`") })
    // b.NF / bNF — join table field count (reference binds bNF per join
    // match, rbql_engine.py:674-689; constant for our fixed-schema B)
    s = BNfRe.replaceAllIn(s, _ => Regex.quoteReplacement(nfText('b')))
    // a.NF / aNF (alias of NF on the input table)
    s = ANfRe.replaceAllIn(s, _ => Regex.quoteReplacement(nfText('a')))
    // a.name / b.name
    s = DotNameRe.replaceAllIn(s, m =>
      Regex.quoteReplacement(colByName(m.group(1).charAt(0), m.group(2))))
    // a1 / b1
    s = PosRe.replaceAllIn(s, m =>
      Regex.quoteReplacement(colByPos(m.group(1).charAt(0), m.group(2).toInt)))
    // engine version variable (reference rbql_engine.py:49)
    s = VersionRe.replaceAllIn(s, _ => Regex.quoteReplacement("'0.1.0-graft'"))
    // NU — number of updated records so far (reference rbql_engine.py:693,
    // 704, 744; UPDATE-only, validated in PlanBuilder)
    s = ExprTranslator.NuRe.replaceAllIn(s, _ => Regex.quoteReplacement(s"`${ExprTranslator.NuCol}`"))
    // NR / NF (case-sensitive, like the reference)
    s = NrRe.replaceAllIn(s, _ => { _usedNr = true; Regex.quoteReplacement(s"graft_a.`$nrCol`") })
    s = NfRe.replaceAllIn(s, _ => Regex.quoteReplacement(nfText('a')))
    masked.restore(s)
  }

  /** SQL text for the field count of one side: per-record for a ragged A,
    * per-record for CSV-marked projected schemas (reference NF/bNF bind
    * the RECORD's length, rbql_engine.py get_row → len(record); the r14
    * probe showed the old constant-width NF diverging on ragged CSVs:
    * reference 2,1,3 vs constant 3), a constant for fixed schemas.
    *
    * Marked projected model: a null in a marked column is structurally
    * missing (never a value — CSV fields are strings), so the record's
    * width is the highest non-null marked position; unmarked columns
    * (can't be missing) count unconditionally. For the B side the
    * per-record form only applies on MATCHED rows — the reference binds
    * the join map's max_record_len on unmatched LEFT JOIN rows
    * (JoinMap null_record, rbql_engine.py:586) — so it gates on bNR
    * (null exactly when unmatched; PlanBuilder materializes bNR whenever
    * bNF is used over a marked B). */
  private def nfText(side: Char): String = {
    if (side == 'a' && raggedA) s"size(graft_a.`${ExprTranslator.FieldsCol}`)"
    else {
      val internal = Set(nrCol, bNrCol)
      val user = sideSchema(side).fields.filter(f => !internal.contains(f.name))
      val constWidth = user.length.toString
      def markedF(f: org.apache.spark.sql.types.StructField): Boolean =
        f.metadata.contains(graft.sources.CsvSource.MissingNullKey) &&
          f.metadata.getBoolean(graft.sources.CsvSource.MissingNullKey)
      if (user.isEmpty || !user.exists(markedF)) constWidth
      else {
        val alias = if (side == 'a') "graft_a" else "graft_b"
        val terms = user.zipWithIndex.map { case (f, i) =>
          val ref = s"$alias.`${f.name.replace("`", "``")}`"
          if (markedF(f))
            s"(CASE WHEN $ref IS NOT NULL THEN ${i + 1} ELSE 0 END)"
          else (i + 1).toString
        }
        val perRecord = s"greatest(${terms.mkString(", ")}, 0)"
        if (side == 'b' && bSchema.exists(_.fieldNames.contains(bNrCol)))
          s"(CASE WHEN graft_b.`$bNrCol` IS NOT NULL THEN $perRecord " +
            s"ELSE $constWidth END)"
        else if (side == 'b') constWidth // bNR absent: stay constant
        else perRecord
      }
    }
  }

  /** Does the masked stage text reference NR anywhere? (decides whether the
    * row-number column must be materialized before planning) */
  def stageUsesNr(stageText: String): Boolean =
    NrRe.findFirstIn(stageText).isDefined || DotNrRe.findFirstIn(stageText).isDefined

  /** 1-based field position a JOIN-key B variable addresses (None for NR
    * keys and opaque forms) — the reference's key_indices, which its
    * HashJoinMap bounds-checks per B record at build time
    * (rbql_engine.py:1363-1372). */
  def posOfBVar(raw: String): Option[Int] = {
    val r = raw.trim
    val bracket = """b\[(\d+)\]""".r
    val dotName = """b\.([A-Za-z_][A-Za-z0-9_]*)""".r
    val bracketName = """b\[###GRAFT_S(\d+)E###\]""".r
    r match {
      case _ if r == "bNR" || r == "b.NR" => None
      case p if p.matches("""b\d+""") => Some(p.drop(1).toInt)
      case bracket(n) => Some(n.toInt)
      case dotName(name) => posOfBName(name)
      case bracketName(idx) =>
        posOfBName(ExprTranslator.unquote(masked.literals(idx.toInt)))
      case _ => None
    }
  }

  private def posOfBName(name: String): Option[Int] =
    if (bSchema.isEmpty) None
    else {
      val user = userFields('b')
      val i = user.lastIndexWhere(f => originalName(f) == name)
      if (i >= 0) Some(i + 1) else None
    }
}

object ExprTranslator {
  /** Column name marking the ragged (fields-array) table model. */
  val FieldsCol = "__graft_fields"

  // word-boundary guards: no letter/digit/_/. immediately before the var
  private val Pre = """(?<![A-Za-z0-9_.`])"""
  val BracketNameRe: Regex = (Pre + """([ab])\[###GRAFT_S(\d+)E###\]""").r
  val BracketPosRe: Regex = (Pre + """([ab])\[(\d+)\]""").r
  /** a1['k'] / a1['k']['k2'] — variant path access on a positional var. */
  val VarSubscriptRe: Regex = (Pre + """([ab])(\d+)((?:\[###GRAFT_S\d+E###\])+)""").r

  /** Sides with variant-subscript accesses in the masked stage text —
    * decides NR materialization before planning when strict JSON keys
    * are on (the guard's error message carries the record number). */
  def stageStrictJsonSides(stageText: String): Set[Char] =
    VarSubscriptRe.findAllMatchIn(stageText).map(_.group(1).charAt(0)).toSet
  val PosRe: Regex = (Pre + """([ab])(\d+)(?![A-Za-z0-9_])""").r
  val DotNameRe: Regex = (Pre + """([ab])\.([A-Za-z_][A-Za-z0-9_]*)""").r
  val BNrRe: Regex = (Pre + """b(?:\.NR|NR)(?![A-Za-z0-9_])""").r
  val DotNrRe: Regex = (Pre + """a(?:\.NR|NR)(?![A-Za-z0-9_])""").r
  val BNfRe: Regex = (Pre + """b(?:\.NF|NF)(?![A-Za-z0-9_])""").r
  val ANfRe: Regex = (Pre + """a(?:\.NF|NF)(?![A-Za-z0-9_])""").r
  val NrRe: Regex = (Pre + """NR(?![A-Za-z0-9_])""").r
  val NuRe: Regex = (Pre + """NU(?![A-Za-z0-9_])""").r
  /** Column carrying the NU (updated-so-far) counter in UPDATE plans. */
  val NuCol = "__graft_nu_upd"
  val NfRe: Regex = (Pre + """NF(?![A-Za-z0-9_])""").r
  val VersionRe: Regex = (Pre + """RBQL_VERSION(?![A-Za-z0-9_])""").r

  def unquote(lit: String): String = {
    if (lit.length >= 2 && (lit.head == '\'' || lit.head == '"') && lit.last == lit.head) {
      val q = lit.head
      lit.substring(1, lit.length - 1)
        .replace("\\" + q, q.toString)
        .replace(s"$q$q", q.toString)
        .replace("\\\\", "\\")
    } else lit
  }
}
