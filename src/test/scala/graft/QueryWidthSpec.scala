package graft

import graft.engine.{Lexer, QueryWidth}

/** Pins the query-derived CSV width hint ([[QueryWidth]]): which
  * queries may skip the width-inference scan, and that a hinted read is
  * output-identical to a full-width read (CSVBENCH.json records what
  * the skip buys: filtered projection 1.24× univocity vs 1.6× paying
  * the pass). */
class QueryWidthSpec extends SparkSpec {

  private def hint(q: String): Option[Int] =
    QueryWidth.inputWidthHint(Lexer.mask(Lexer.cleanup(q)))

  test("positional-only queries hint their max referenced index") {
    assert(hint("select a1, a3 where cast(a4 as int) > 5") == Some(4))
    assert(hint("select a2") == Some(2))
    assert(hint("select a[7], a1") == Some(7))
    assert(hint("select a1 order by a6 desc limit 3") == Some(6))
    assert(hint("select distinct a2, a5") == Some(5))
    assert(hint("select count(a1), a3 group by a3") == Some(3))
    assert(hint("select NR") == Some(1)) // no refs: minimal 1-col table
    // later pipe stages read stage OUTPUTS, not the file
    assert(hint("select a2, a1 | select a9 where NF > 1") == Some(2))
  }

  test("width-dependent constructs disable the hint") {
    assert(hint("select *").isEmpty)
    assert(hint("select a.*, a1").isEmpty)
    assert(hint("select NR, * where a1 > 2").isEmpty)
    assert(hint("select *split(a2, 'x')").isEmpty) // unpack
    assert(hint("select a1 where NF == 3").isEmpty)
    assert(hint("select a1, aNF").isEmpty)
    assert(hint("select * except a2").isEmpty)
    assert(hint("update a2 = a1").isEmpty)
    assert(hint("select a.price").isEmpty) // name ref
    assert(hint("select a[\"unit price\"]").isEmpty) // name-bracket ref
    assert(hint("select a1 join /tmp/b.csv on a1 == b2").isEmpty)
    assert(hint("select a1 from b").isEmpty)
    // string literals cannot fake tokens (masked text), but an
    // UNPARSEABLE query must defer to the real build for its error
    assert(hint("flagrantly not a query").isEmpty)
  }

  test("literals never affect the hint (masking)") {
    assert(hint("select a1 where a2 == 'NF * a9'") == Some(2))
  }

  test("hinted CSV read is output-identical to the full-width read") {
    val dir = java.nio.file.Files.createTempDirectory("graftqw").toString
    // 6-wide file; query touches a1/a3/a4 only; one ragged short row
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/w.csv"),
      "1,a,x,9,extra1,extra2\n2,b\n3,c,z,7,e1,e2\n")
    val q = "select a1, a3 where a4 is not null order by a1"
    val hinted = Graft.queryCsv(spark, q, s"$dir/w.csv", ",", "quoted",
      hasHeader = false).collect().map(_.toSeq).toSeq
    spark.conf.set(s"spark.graft.csv.declaredWidth.$dir/w.csv", "6")
    val full =
      try Graft.queryCsv(spark, q, s"$dir/w.csv", ",", "quoted",
        hasHeader = false).collect().map(_.toSeq).toSeq
      finally spark.conf.unset(s"spark.graft.csv.declaredWidth.$dir/w.csv")
    assert(hinted == full)
    assert(hinted == Seq(Seq("1", "x"), Seq("3", "z")))
  }
}
