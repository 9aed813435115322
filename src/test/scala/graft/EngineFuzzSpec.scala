package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

import scala.util.Try

/** Randomized differential corpus against the reference engine.
  *
  * `tools/gen_differential.py` generates random in-memory tables and random
  * queries from one expression AST, rendered in BOTH dialects — the
  * reference's Python-expression dialect (executed there against rbql-py to
  * record the expected output) and graft's Spark-SQL dialect (replayed
  * here). 834 committed cases over 18 templates (plain select / order+limit /
  * TOP / DISTINCT / GROUP BY aggregates / INNER+LEFT JOIN / STRICT LEFT
  * JOIN / composite-key join / UPDATE incl. multi-assignment / star /
  * EXCEPT / DISTINCT COUNT / global + grouped aggregates incl. ARRAY_AGG /
  * named-column header access / error parity / UNNEST-of-split /
  * star-unpack ragged output / pipe chaining with per-stage NR) widen
  * engine-semantics coverage far past the 104 hand-written
  * reference corpus cases in [[CorpusSpec]]. Expression grammar: int/float
  * arithmetic (+,-,*,/,abs-guarded %), 2-arg polymorphic min/max, ternary,
  * NR/NF, len/upper/lower/replace/concat/str, LIKE, regexp, substring-in,
  * starts/endswith, bare Python truthiness, and/or/not.
  *
  * Comparison: per-cell canonicalization — numbers (and numeric strings; the
  * reference surfaces typed values where graft's string tables surface
  * int-preserved strings) round to 6 significant digits because a
  * single-threaded Python fold and Spark partial aggregation associate float
  * sums differently; |x| < 1e-9 collapses to 0 so an all-equal VARIANCE
  * can't fail on a -1e-17. Rows compare ordered except GROUP BY / JOIN
  * templates (`ordered: false` in the fixture), which compare as sorted row
  * multisets — the reference emits first-seen group order, a
  * partition-order artifact graft deliberately does not replicate under
  * shuffle (SURVEY §1.2).
  */
class EngineFuzzSpec extends SparkSpec {

  private val cases: List[JObject] = {
    val in = getClass.getResourceAsStream("/differential/engine_fuzz.json")
    assert(in != null, "missing /differential/engine_fuzz.json test resource")
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    JsonMethods.parse(txt) match {
      case JArray(cs) => cs.collect { case o: JObject => o }
      case _          => Nil
    }
  }

  private def str(c: JObject, k: String): String =
    (c \ k) match { case JString(s) => s; case _ => null }

  private def bool(c: JObject, k: String): Boolean =
    (c \ k) match { case JBool(b) => b; case _ => true }

  /** Like bool but defaults ABSENT to false (expected_error). */
  private def bool2(c: JObject, k: String): Boolean =
    (c \ k) match { case JBool(b) => b; case _ => false }

  private def table(c: JObject, k: String): Option[Seq[Seq[String]]] =
    (c \ k) match {
      case JArray(rows) => Some(rows.map {
        case JArray(cells) => cells.map {
          case JString(s) => s
          case JNull      => null
          case other      => JsonMethods.compact(JsonMethods.render(other))
        }
        case _ => Seq.empty[String]
      })
      case _ => None
    }

  // ---- canonicalization --------------------------------------------------

  // Cells normalize to a tiny ADT compared with NUMERIC TOLERANCE (rel
  // 1e-6, abs 1e-9): digit-rounding canonicalization hits half-boundary
  // ties (a VARIANCE of ...0625 rounds to a different last digit per
  // float-association order), so numeric equality, not string identity, is
  // the contract. Numeric strings normalize to numbers — the reference
  // surfaces typed values where graft's string-typed tables surface
  // int-preserved strings.

  private sealed trait Cell
  private case object CNull extends Cell
  private final case class CNum(d: Double) extends Cell
  private final case class CStr(s: String) extends Cell
  private final case class CBool(b: Boolean) extends Cell

  private def cell(v: Any): Cell = v match {
    case null                => CNull
    case b: Boolean          => CBool(b)
    case d: Double           => CNum(d)
    case f: Float            => CNum(f.toDouble)
    case n: java.lang.Number => CNum(n.doubleValue())
    case s: String           =>
      Try(CNum(BigDecimal(s).toDouble)).getOrElse(CStr(s))
    case seq: scala.collection.Seq[_] =>
      CStr(seq.map(x => render(cell(x))).mkString("[", ",", "]"))
    case other => CStr(other.toString)
  }

  private def cellJ(v: JValue): Cell = v match {
    case JNull | JNothing => CNull
    case JBool(b)         => CBool(b)
    case JString(s)       => cell(s)
    case JInt(i)          => CNum(i.toDouble)
    case JLong(i)         => CNum(i.toDouble)
    case JDouble(d)       => CNum(d)
    case JDecimal(d)      => CNum(d.toDouble)
    case JArray(xs)       =>
      CStr(xs.map(x => render(cellJ(x))).mkString("[", ",", "]"))
    case other            => CStr(other.toString)
  }

  private def render(c: Cell): String = c match {
    case CNull    => "NULL"
    case CBool(b) => b.toString
    case CNum(d)  => if (d == math.floor(d) && math.abs(d) < 1e15)
                       d.toLong.toString
                     else f"$d%.6g"
    case CStr(s)  => s
  }

  private def cellEq(a: Cell, b: Cell): Boolean = (a, b) match {
    case (CNum(x), CNum(y)) =>
      math.abs(x - y) <=
        math.max(1e-9, 1e-6 * math.max(math.abs(x), math.abs(y)))
    case (x, y) => x == y
  }

  private def rowEq(a: Seq[Cell], b: Seq[Cell]): Boolean =
    a.length == b.length && a.lazyZip(b).forall(cellEq)

  /** Tolerant multiset equality: greedily match each expected row to a
    * distinct actual row (cases are tens of rows — O(n^2) is fine). */
  private def multisetEq(actual: Seq[Seq[Cell]],
                         expected: Seq[Seq[Cell]]): Boolean = {
    if (actual.length != expected.length) return false
    val pool = scala.collection.mutable.ArrayBuffer.from(actual)
    expected.forall { e =>
      val i = pool.indexWhere(rowEq(_, e))
      if (i < 0) false else { pool.remove(i); true }
    }
  }

  private def show(rows: Seq[Seq[Cell]]): String =
    rows.take(12).map(_.map(render).mkString("(", ", ", ")")).mkString(" | ")

  // ---- per-case runner -----------------------------------------------------

  private def names(c: JObject): Option[Seq[String]] =
    (c \ "input_column_names") match {
      case JArray(ns) => Some(ns.collect { case JString(s) => s })
      case _          => None
    }

  private def runCase(c: JObject): Unit = {
    val name = str(c, "name")
    val sql = str(c, "query_sql")
    val input = table(c, "input_table").getOrElse(Seq.empty)
    val join = table(c, "join_table")
    val ordered = bool(c, "ordered")

    if (bool2(c, "expected_error")) {
      // the reference raised on query_py; graft must reject query_sql too
      // (message texts legitimately differ — same contract as CorpusSpec)
      val attempt = Try {
        val df = Graft.queryTableDf(spark, sql, input, names(c),
          join.map(j => (j, None)))
        Graft.spreadRagged(df)
      }
      val rows = attempt.toOption.map(_.length)
      assert(attempt.isFailure,
        s"\n[$name] reference raised but graft succeeded with " +
          s"${rows.getOrElse(0)} rows: $sql")
      return
    }

    val df = Graft.queryTableDf(spark, sql, input, names(c),
      join.map(j => (j, None)))
    val actual = Graft.spreadRagged(df).map(_.map(cell))
    val expected = (c \ "expected_output_table") match {
      case JArray(rs) => rs.map {
        case JArray(cells) => cells.map(cellJ)
        case o             => Seq(cellJ(o))
      }
      case _ => Nil
    }

    val ok =
      if (ordered) actual.length == expected.length &&
        actual.lazyZip(expected).forall(rowEq)
      else multisetEq(actual, expected)
    assert(ok,
      s"\n[$name] query: $sql\npy:    ${str(c, "query_py")}" +
        s"\nexpected (${expected.length}): ${show(expected)}" +
        s"\nactual   (${actual.length}): ${show(actual)}")
  }

  for (c <- cases) {
    val name = str(c, "name")
    test(s"differential $name") { runCase(c) }
  }

  test("differential corpus present and complete") {
    assert(cases.length >= 800, s"expected >=800 fuzz cases, got ${cases.length}")
  }
}
