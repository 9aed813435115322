package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets

/** r15 advice regressions: the CSV reader's missing-as-null column marker
  * (CsvSource.MissingNullKey) must not ride through a SELECTed expression
  * or bare-variable slot into a later pipe stage. A stage's output record
  * is built as a plain value list `[e1, e2, …]` (reference
  * translate_select_expression, rbql_engine.py:1203-1219): a None produced
  * by stage 1 occupies its slot — the next stage's NF counts it, and as a
  * join key it simply matches nothing. Star is different: it splices the
  * ragged record itself (rbql_engine.py:665-668), so star-expanded columns
  * KEEP the marker and per-record NF / join-key errors propagate.
  *
  * Every expectation below is pinned from the live reference
  * (rbql.query_table over [['x','1'],['y'],['z','3','9']]).
  */
class PipeStageMarkerSpec extends SparkSpec {

  private def tmp(name: String, content: String): String = {
    val f = Files.createTempFile(s"graft_pipe_$name", ".csv")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    f.toString
  }

  private lazy val in = tmp("nf", "x,1\ny\nz,3,9\n")
  private lazy val b = tmp("jkb", "1,one\n7,seven\n")

  test("bare-var slot: select a2 | select NF, a1 -> NF is 1 per record") {
    val out = Graft.queryCsv(spark, "select a2 | select NF, a1", in)
      .collect().map(r => (r.get(0), r.get(1))).toSeq
    assert(out == Seq((1L, "1"), (1L, null), (1L, "3")))
  }

  test("two bare-var slots: select a1, a2 | select NF -> NF is 2 per record") {
    val out = Graft.queryCsv(spark, "select a1, a2 | select NF, a1", in)
      .collect().map(r => (r.get(0), r.get(1))).toSeq
    assert(out == Seq((2L, "x"), (2L, "y"), (2L, "z")))
  }

  test("star pass-through keeps per-record NF: select * | select NF") {
    val out = Graft.queryCsv(spark, "select * | select NF, a1", in)
      .collect().map(r => (r.get(0), r.get(1))).toSeq
    assert(out == Seq((2L, "x"), (1L, "y"), (3L, "z")))
  }

  test("piped None join key matches nothing instead of raising") {
    val piped = Graft.queryCsv(spark,
      s"select a2 | select a1, b2 inner join $b on a1 == b1", in)
    assert(piped.collect().map(_.toSeq).toSeq == Seq(Seq("1", "one")))
    // value-slot None from a 2-slot projection joins on the OTHER slot
    val piped2 = Graft.queryCsv(spark,
      s"select a1, a2 | select a1, b2 inner join $b on a2 == b1", in)
    assert(piped2.collect().map(_.toSeq).toSeq == Seq(Seq("x", "one")))
  }

  test("star-piped short record still raises the join-key error") {
    // reference: select * passes the ragged record; record 2 has no a2
    // -> RbqlRuntimeError 'No "a2" field at record 2'
    val e = intercept[Exception] {
      Graft.queryCsv(spark,
        s"select * | select a1, b2 inner join $b on a2 == b1", in).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("No \"a2\" field at record 2")))
  }

  test("unpiped short-record join key still raises") {
    val e = intercept[Exception] {
      Graft.queryCsv(spark,
        s"select a2, b2 inner join $b on a2 == b1", in).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("No \"a2\" field at record 2")))
  }

  test("update pass-through keeps per-record NF") {
    // reference: update copies the record list (safe_set in place), so
    // raggedness survives: NF = 2, 1, 3
    val out = Graft.queryCsv(spark,
      "update a1 = 'U' where NR == 1 | select NF, a1", in)
      .collect().map(r => (r.get(0), r.get(1))).toSeq
    assert(out == Seq((2L, "U"), (1L, "y"), (3L, "z")))
  }

  test("aggregate output slots are fixed: group by | select NF") {
    // reference: aggregate output records are fixed-length lists
    val out = Graft.queryCsv(spark,
      "select a1, count(*) group by a1 | select NF, a1", in)
      .collect().map(r => (r.get(0), r.get(1))).toSeq
    assert(out.map(_._1).toSet == Set(2L))
  }
}
