package graft

import graft.engine.{ParsingError, GraftError}

/** Hand-ported slice of the reference's engine-level golden corpus
  * (/root/reference/test/rbql_unit_tests.json — 104 cases). The reference
  * embeds Python expressions; our dialect embeds Spark SQL, so each case's
  * expressions are translated (int(x) → cast, len → length, + → ||) while
  * the clause semantics under test stay identical. */
class GoldenSpec extends SparkSpec {

  private val t1 = Seq(
    Seq("5", "alpha", "beta"),
    Seq("-20", "alpha", "gamma"),
    Seq("50", "alpha", "delta"),
    Seq("20", "alpha", ""))

  private val vehicles = Seq(
    Seq("5", "car", "lada"),
    Seq("-20", "car", "Ferrari"),
    Seq("50", "plane", "tu-134"),
    Seq("20", "boat", "destroyer"),
    Seq("10", "boat", "yacht"))

  private val joinB = Seq(
    Seq("bicycle", "legs"),
    Seq("car", "gas"),
    Seq("plane", "wings"),
    Seq("boat", "wind"))

  private def run(q: String, in: Seq[Seq[String]],
      join: Option[Seq[Seq[String]]] = None): Seq[Seq[Any]] =
    Graft.queryTable(spark, q, in, None, join.map(j => (j, None)))

  // -- test1: NR + computed col + int filter ------------------------------
  test("golden: NR, computed column, numeric filter") {
    val out = run("select NR, a1, length(a3) where cast(a1 as int) > 5", t1)
    assert(out == Seq(Seq(3L, "50", 5), Seq(4L, "20", 0)))
  }

  test("golden: trailing semicolon tolerated") {
    val out = run("select NR, a1 where cast(a1 as int) > 5;", t1)
    assert(out.map(_(1)) == Seq("50", "20"))
  }

  test("golden: no select no update is an error") {
    val e = intercept[ParsingError] {
      run("NR, a1 where cast(a1 as int) > 5 order by a3", t1)
    }
    assert(e.getMessage.toLowerCase(java.util.Locale.ROOT).contains("select or update"))
  }

  test("golden: distinct with messy whitespace") {
    val out = run("\tselect    distinct\ta2 where cast(a1 as int) > -100 ", t1)
    assert(out == Seq(Seq("alpha")))
  }

  // -- joins --------------------------------------------------------------
  test("golden: inner join with NR, star, multi-key order") {
    val out = run(
      "select NR, * inner join b on a2 == b1 where b2 != 'alpha' " +
        "and cast(a1 as int) > -100 and length(b2) > 1 order by a2, cast(a1 as int)",
      vehicles, Some(joinB))
    assert(out == Seq(
      Seq(5L, "10", "boat", "yacht", "boat", "wind"),
      Seq(4L, "20", "boat", "destroyer", "boat", "wind"),
      Seq(2L, "-20", "car", "Ferrari", "car", "gas"),
      Seq(1L, "5", "car", "lada", "car", "gas"),
      Seq(3L, "50", "plane", "tu-134", "plane", "wings")))
  }

  test("golden: a-star b-star with separator literal") {
    val out = run(
      "select a.*, '====', b.* inner join b on a2 == b1 where a2 == 'car' " +
        "order by cast(a1 as int)",
      vehicles, Some(joinB))
    assert(out == Seq(
      Seq("-20", "car", "Ferrari", "====", "car", "gas"),
      Seq("5", "car", "lada", "====", "car", "gas")))
  }

  test("golden: left join null padding + null filter") {
    val out = run(
      "select a1, a2, b2 left join b on a2 == b1 where b2 is not null " +
        "order by cast(a1 as int)",
      Seq(Seq("1", "car"), Seq("2", "spaceship")), Some(joinB))
    assert(out == Seq(Seq("1", "car", "gas")))
  }

  test("golden: strict left join with single equal sign") {
    val out = run(
      "select length(b1), a2 strict left join b on a2 = b1",
      Seq(Seq("5", "car"), Seq("50", "plane")), Some(joinB))
    assert(out.toSet == Set(Seq(3, "car"), Seq(5, "plane")))
  }

  test("golden: join on NR") {
    val out = run(
      "select a1, b2 inner join b on aNR == bNR where a.NR >= 2",
      Seq(Seq("r1"), Seq("r2"), Seq("r3")),
      Some(Seq(Seq("x", "b1v"), Seq("y", "b2v"), Seq("z", "b3v"))))
    assert(out.toSet == Set(Seq("r2", "b2v"), Seq("r3", "b3v")))
  }

  test("golden: aNR and bNR as output columns") {
    val out = run(
      "select aNR, bNR, a1, b1 inner join b on a1 == b1",
      Seq(Seq("x"), Seq("y")),
      Some(Seq(Seq("y"), Seq("x"))))
    assert(out.toSet == Set(Seq(1L, 2L, "x", "x"), Seq(2L, 1L, "y", "y")))
  }

  test("golden: empty join table — inner drops all, left null-pads") {
    val inner = run("select a1, b2 inner join b on a1 == b1",
      Seq(Seq("x", "1")), Some(Seq.empty))
    assert(inner.isEmpty)
    val left = run("select a1, b2 left join b on a1 == b1",
      Seq(Seq("x", "1")), Some(Seq.empty))
    assert(left == Seq(Seq("x", null)))
  }

  test("golden: two key join") {
    val out = run(
      "select a1, a2, b1 join b on a1 == b2 and a2 == b3",
      Seq(Seq("Russia", "Moscow", "1147")),
      Some(Seq(Seq("Red Square", "Russia", "Moscow"),
        Seq("Eiffel", "France", "Paris"))))
    assert(out == Seq(Seq("Russia", "Moscow", "Red Square")))
  }

  test("golden: alias with join and star on headerless input errors") {
    // reference select_output_header (rbql_engine.py:1421-1423): star + AS
    // alias cannot be combined when the input table has no header
    val e = intercept[ParsingError] {
      run("select 'lala' as something, *, 'foo' as The_foo " +
        "inner join b on a2 == b1 where a2 == 'car' order by cast(a1 as int) desc",
        vehicles, Some(joinB))
    }
    assert(e.getMessage.contains("star"))
  }

  // -- except -------------------------------------------------------------
  test("golden: top N except with desc order") {
    val tbl = Seq(
      Seq("car", "1", "100", "1"), Seq("dog", "3", "100", "2"),
      Seq("mouse", "4", "50", "3"))
    val out = run("select top 2 * except a2, a4 order by a1 desc", tbl)
    assert(out == Seq(Seq("mouse", "50"), Seq("dog", "100")))
  }

  test("golden: except with join is an error") {
    intercept[ParsingError] {
      run("select * except a1 join b on a2 == b1", vehicles, Some(joinB))
    }
  }

  // -- update -------------------------------------------------------------
  test("golden: update with condition emits all rows") {
    val out = run(
      "update a2 = a2 || ' beta', a1 = '100' where cast(a1 as int) > 10",
      Seq(Seq("5", "alpha", "x"), Seq("50", "gamma", "y")))
    assert(out == Seq(Seq("5", "alpha", "x"), Seq("100", "gamma beta", "y")))
  }

  test("golden: update swap reads original values") {
    val out = run("update set a1 = a2, a2 = a1", Seq(Seq("car", "1")))
    assert(out == Seq(Seq("1", "car")))
  }

  test("golden: update with order by is an error") {
    intercept[ParsingError] {
      run("update a2 = 'x' where cast(a1 as int) > 10 order by a1 desc", t1)
    }
  }

  test("golden: update with inner join updates matched rows only") {
    val out = run(
      "UPDATE SET a3 = concat(a2, ' (', b2, ')') inner join b on a2 == b1 " +
        "where b2 != 'wings'",
      Seq(Seq("100", "magic carpet", "nimbus"), Seq("5", "car", "lada")),
      Some(joinB))
    assert(out.toSet == Set(
      Seq("100", "magic carpet", "nimbus"),
      Seq("5", "car", "car (gas)")))
  }

  test("golden: update left join null-safe assignment") {
    // LEFT join: an unmatched A row acts as ONE null B match (reference
    // LeftJoiner null_record) — the WHERE runs with null b-vars (Python
    // None != "wings" is True), so the assignment applies with b2 = null
    val out = run(
      "update set a3 = b2 left join b on a2 == b1 where b2 != 'wings'",
      Seq(Seq("100", "magic carpet", "nimbus"), Seq("5", "car", "lada")),
      Some(joinB))
    assert(out == Seq(
      Seq("100", "magic carpet", null),
      Seq("5", "car", "gas")))
  }

  // -- aggregates ---------------------------------------------------------
  test("golden: aggregate functions without group by, string coercion") {
    val tbl = Seq(
      Seq("car", "1", "100", "1"), Seq("car", "2", "100", "1"),
      Seq("dog", "3", "100", "2"), Seq("dog", "4", "100", "3"))
    val out = run(
      "select MIN(cast(a2 as int) * 10), MAX(a2), COUNT(*), COUNT(1), SUM(a3), AVG(a2), VARIANCE(a2), MEDIAN(a4)",
      tbl)
    assert(out.length == 1)
    val r = out.head
    assert(r(0) == 10) // min over an already-int expression stays int
    // int-preservation (NumHandler, rbql_engine.py:293-314): all-int
    // string inputs to MIN/MAX/SUM come back integral, as strings (the
    // reference's CSV-boundary observable)
    assert(r(1) == "4")
    assert(r(2) == 4L && r(3) == 4L)
    assert(r(4) == "400")
    assert(r(5) == 2.5)
    assert(r(6) == 1.25) // population variance
    assert(r(7) == 1.5) // exact median, mean of middle two
  }

  test("golden: sum/min/max switch to float when any value is non-integral") {
    val out = run("select SUM(a1), MIN(a1), MAX(a1)",
      Seq(Seq("1"), Seq("2.5"), Seq("3")))
    assert(out == Seq(Seq("6.5", "1.0", "3.0")))
  }

  test("golden: ARRAY_AGG collects in record (NR) order") {
    val out = run("select a2, ARRAY_AGG(a3) group by a2", vehicles)
    assert(out == Seq(
      Seq("boat", Seq("destroyer", "yacht")),
      Seq("car", Seq("lada", "Ferrari")),
      Seq("plane", Seq("tu-134"))))
    // order pin survives many partitions: 1 group, 200 rows, insertion order
    val big = (1 to 200).map(i => Seq("g", i.toString))
    val o2 = run("select ARRAY_AGG(a2) group by a1", big)
    assert(o2 == Seq(Seq((1 to 200).map(_.toString))))
  }

  test("golden: ARRAY_AGG with post-processing lambda") {
    val out = run(
      "select a2, ARRAY_AGG(a3, v -> slice(v, 1, 1)) group by a2", vehicles)
    assert(out == Seq(
      Seq("boat", Seq("destroyer")),
      Seq("car", Seq("lada")),
      Seq("plane", Seq("tu-134"))))
    val o2 = run(
      "select ARRAY_AGG(a1, v -> array_join(sort_array(v), ',')) group by a2",
      Seq(Seq("3", "x"), Seq("1", "x"), Seq("2", "x")))
    assert(o2 == Seq(Seq("1,2,3")))
  }

  test("golden: LIKE function form (reference like())") {
    val out = run("select a1 where LIKE(a3, '%ta')",
      Seq(Seq("5", "alpha", "beta"), Seq("-20", "alpha", "gamma"),
        Seq("50", "alpha", "delta")))
    assert(out == Seq(Seq("5"), Seq("50")))
  }

  test("golden: JS-style === and !== equality spellings") {
    val out = run("select NR where a3 === 'gamma'", t1)
    assert(out == Seq(Seq(2L)))
    // ZERO rows, not one 0-row: the reference's global aggregate over no
    // records emits nothing (no records → no group entries) — verified
    // against rbql-py; the previous expectation here was SQL semantics
    val out2 = run("select count(*) where a2 !== 'alpha'", t1)
    assert(out2 == Seq.empty)
  }

  test("golden: unpack operator *expr spreads the list into the record") {
    // reference Python star-unpacking in the select tuple ('unpack
    // operator' corpus case): ragged output rows, NOT one row per element
    val out = run("select *split(a2, '\\\\|')",
      Seq(Seq("1", "alpha"), Seq("2", "alpha|beta|gamma"), Seq("3", "")))
    assert(out == Seq(Seq("alpha"), Seq("alpha", "beta", "gamma"), Seq("")))
  }

  test("golden: NU counts updated records in record order") {
    val out = run(
      "update a2 = concat(a2, ' ', NU), a1 = '100' where cast(a1 as int) > 10",
      Seq(Seq("5", "alpha", "beta"), Seq("20", "zeta", "delta"),
        Seq("50", "eta", "epsilon"), Seq("8", "iota", "theta"),
        Seq("30", "mu", "nu")))
    assert(out == Seq(
      Seq("5", "alpha", "beta"),
      Seq("100", "zeta 1", "delta"),
      Seq("100", "eta 2", "epsilon"),
      Seq("8", "iota", "theta"),
      Seq("100", "mu 3", "nu")))
    // larger input across many partitions: NU matches filtered NR rank
    val big = (1 to 300).map(i => Seq(i.toString, "x"))
    val o2 = run("update a2 = cast(NU as string) where cast(a1 as int) % 3 == 0", big)
    val updated = o2.filter(_(1) != "x").map(_(1).asInstanceOf[String].toInt)
    assert(updated == (1 to 100).toList)
  }

  test("golden: NU counts matched records in record order under UPDATE+JOIN") {
    // reference PROCESS_UPDATE_JOIN increments NU per A record with a join
    // match satisfying WHERE, in input order (rbql_engine.py:682-697)
    val out = run(
      "update set a3 = cast(NU as string) inner join b on a2 == b1 where b2 != 'wings'",
      Seq(
        Seq("100", "magic carpet", "x"), // no match → not updated
        Seq("5", "car", "x"),            // match (gas) → NU 1
        Seq("50", "plane", "x"),         // match but b2 == wings → no update
        Seq("20", "boat", "x"),          // match (wind) → NU 2
        Seq("-20", "car", "x")),         // match (gas) → NU 3
      Some(joinB))
    assert(out == Seq(
      Seq("100", "magic carpet", "x"),
      Seq("5", "car", "1"),
      Seq("50", "plane", "x"),
      Seq("20", "boat", "2"),
      Seq("-20", "car", "3")))
  }

  test("golden: NU misuse errors") {
    intercept[ParsingError] { run("select NU", t1) }
    intercept[ParsingError] {
      run("update a1 = '1' where NU > 0", t1)
    }
  }

  test("golden: DISTINCT with mixed-direction ORDER BY over selected columns") {
    val out = run(
      "select distinct a2, a1 order by a2 asc, a1 desc",
      Seq(Seq("1", "x"), Seq("2", "x"), Seq("1", "x"), Seq("9", "a")))
    assert(out == Seq(Seq("a", "9"), Seq("x", "2"), Seq("x", "1")))
    // keys outside the SELECT list still require a single direction
    intercept[ParsingError] {
      run("select distinct a2 order by a2 asc, a1 desc",
        Seq(Seq("1", "x")))
    }
  }

  test("golden: duplicate WHERE clauses error") {
    val e = intercept[Exception] {
      run("select NR, a1 where cast(a1 as int) > 5 where cast(a1 as int) > 6", t1)
    }
    assert(e.getMessage.toLowerCase(java.util.Locale.ROOT).contains("where"))
  }

  test("golden: empty SELECT expression errors") {
    intercept[Exception] { run("select   where a3 == 'beta'", t1) }
  }

  test("golden: empty input table returns empty, not an error") {
    val out = run("select NR, a1 where cast(a1 as int) > 5", Seq.empty)
    assert(out.isEmpty)
  }

  test("golden: EXCEPT of an unknown field errors with the field name") {
    val e = intercept[Exception] {
      run("select except a2, a9", t1)
    }
    assert(e.getMessage.contains("a9") || e.getMessage.contains("out of range"))
  }

  test("golden: join key beyond join-table width errors") {
    val e = intercept[Exception] {
      run("select a1 join b on a2 == b5", vehicles, Some(joinB))
    }
    assert(e.getMessage.contains("b5") || e.getMessage.contains("out of range"))
  }

  test("golden: aggregate over non-numeric strings errors at runtime") {
    val e = intercept[Exception] {
      run("select SUM(a2)", Seq(Seq("1", "car"), Seq("2", "dog")))
    }
    assert(e.getMessage.contains("CAST_INVALID_INPUT") ||
      e.getMessage.toLowerCase(java.util.Locale.ROOT).contains("cannot be cast"))
  }

  test("golden: HAVING is rejected with a hint") {
    val e = intercept[Exception] {
      run("select a1, count(*) group by a1 HAVING count(*) > 1", t1)
    }
    assert(e.getMessage.toLowerCase(java.util.Locale.ROOT).contains("having"))
  }

  test("golden: ANY_VALUE keeps the first-seen value per group") {
    val out = run("select a2, ANY_VALUE(a3) group by a2", vehicles)
    assert(out == Seq(
      Seq("boat", "destroyer"),
      Seq("car", "lada"),
      Seq("plane", "tu-134")))
  }

  test("golden: case-insensitive aggregate names") {
    val out = run("select Count(*), mAx(a1) group by a2",
      Seq(Seq("1", "x"), Seq("2", "x")))
    assert(out == Seq(Seq(2L, "2")))
  }

  test("golden: group by single column is distinct-like") {
    val out = run("select a1 group by a1",
      Seq(Seq("car"), Seq("dog"), Seq("dog")))
    assert(out == Seq(Seq("car"), Seq("dog")))
  }

  test("golden: non-constant non-key column in aggregate errors at runtime") {
    val e = intercept[Exception] {
      run("select MAX(a2), a1, '100'", Seq(Seq("car", "100"), Seq("dog", "200")))
    }
    assert(e.getMessage.contains("Non-constant") ||
      e.getMessage.contains("NON_CONSTANT") || e.getMessage.contains("USER_RAISED"))
  }

  test("golden: aggregate inside expression is an error") {
    intercept[ParsingError] { run("select MAX(a1) / 2", t1) }
    intercept[ParsingError] { run("select MIN(a1), concat(MAX(a1), 'x')", t1) }
  }

  test("golden: order by + distinct disallowed in aggregate queries") {
    intercept[ParsingError] { run("select MAX(a2) order by a1", t1) }
    intercept[ParsingError] { run("select distinct MAX(a2) group by a1", t1) }
  }

  test("golden: aggregate on garbage string errors") {
    val e = intercept[Exception] { run("select SUM(a2)", Seq(Seq("1", "alpha"))) }
    assert(e.getMessage.toLowerCase(java.util.Locale.ROOT).contains("cast") ||
      e.getMessage.contains("CAST_INVALID_INPUT"))
  }

  test("golden: NR resets per pipe stage and follows stage-1 order") {
    // reference: NR = 0 restarts each stage (rbql_engine.py:743); stage 2
    // numbers records in the order stage 1 emitted them
    val out = run(
      "select a1, a2 where a2 != 'drop' order by a1 desc | select NR, a1",
      Seq(Seq("b", "keep"), Seq("c", "drop"), Seq("a", "keep"), Seq("d", "keep")))
    assert(out == Seq(Seq(1L, "d"), Seq(2L, "b"), Seq(3L, "a")))
  }

  // -- more ported cases --------------------------------------------------
  test("golden: regex filter (re.search → rlike)") {
    val out = run("select * where a2 rlike 'a +ze'",
      Seq(Seq("1", "alpha   zeta"), Seq("2", "alpha beta"), Seq("3", "a ze")))
    assert(out.map(_(0)) == Seq("1", "3"))
  }

  test("golden: unicode update") {
    val out = run("update a2 = 'Наполеон'",
      Seq(Seq("5", "Пётр Первый"), Seq("50", "Екатерина")))
    assert(out.map(_(1)).distinct == Seq("Наполеон"))
  }

  test("golden: single-column join table with null filter") {
    val out = run(
      "select a1, a2 left outer join b on a2 == b1 where b1 is not null",
      Seq(Seq("100", "magic carpet"), Seq("5", "car"), Seq("50", "plane")),
      Some(Seq(Seq("bicycle"), Seq("car"), Seq("plane"))))
    assert(out.map(_(1)).toSet == Set("car", "plane"))
  }

  test("golden: missing join-table field errors") {
    intercept[ParsingError] {
      run("select a1 inner join b on a2 == b5", vehicles, Some(joinB))
    }
  }

  test("golden: join with bracket/name variable styles in where") {
    // reference 'join with normalized column names' — our named access
    // works against real column names; bracket-literal resolves by name
    val out = Graft.queryTable(spark,
      """select a["speed"], b.propulsion inner join b on a.vehicle == b.vehicle where length(b["propulsion"]) > 3""",
      Seq(Seq("5", "car"), Seq("50", "plane")), Some(Seq("speed", "vehicle")),
      Some((Seq(Seq("car", "gas"), Seq("plane", "wings")),
        Some(Seq("vehicle", "propulsion")))))
    assert(out.toSet == Set(Seq("50", "wings")))
  }

  test("golden: aggregate without conversion on typed expressions") {
    val out = run(
      "select MAX(cast(a3 as int) + 5), MIN(cast(a2 as double) * 2), MEDIAN(cast(a4 as int) + 1)",
      Seq(Seq("car", "1", "100", "1"), Seq("car", "2", "100", "1"),
        Seq("dog", "3", "100", "2")))
    assert(out == Seq(Seq(105, 2.0, 2.0)))
  }

  // -- distinct count -----------------------------------------------------
  test("golden: distinct count with non-output order key and limit") {
    // reference case distinct_count_order_asc_limit: ORDER BY int(a2) asc
    // where a2 is not selected — sort-then-first-seen-dedup semantics
    val out = run(
      "select distinct count a1 where cast(a2 as int) > 10 " +
        "order by cast(a2 as int) asc limit 2",
      Seq(Seq("cde", "1234"), Seq("abc", "1234"), Seq("abc", "1234"),
        Seq("efg", "20"), Seq("zzz", "5")))
    assert(out == Seq(Seq(1L, "efg"), Seq(2L, "abc")) ||
      out == Seq(Seq(1L, "efg"), Seq(1L, "cde")))
    // (abc/cde both have min key 1234 — reference tie order is stable by
    // first appearance; either representative order is sort-correct)
  }

  test("golden: distinct with non-output desc order key") {
    val out = run(
      "select distinct a2 order by cast(a1 as int) desc",
      Seq(Seq("1", "x"), Seq("9", "y"), Seq("5", "x")))
    // x's max key = 5, y's = 9 → desc: y then x
    assert(out == Seq(Seq("y"), Seq("x")))
  }

  test("golden: distinct count prepends occurrence counts") {
    val out = run("select distinct count a1 where cast(a2 as int) > 10",
      Seq(Seq("cde", "1234"), Seq("abc", "1234"), Seq("abc", "1234"), Seq("zzz", "5")))
    assert(out.toSet == Set(Seq(1L, "cde"), Seq(2L, "abc")))
  }

  // -- query-text normalization (cleanup_query parity) --------------------
  test("golden: full-line # comments are stripped before parsing") {
    // reference strip_comments (rbql_engine.py:978-982) via cleanup_query
    // (rbql_engine.py:1398-1402): multi-line query with commented lines
    val out = run(
      "# leading comment\nselect NR, a1\n  # indented comment\nwhere cast(a1 as int) > 5\n#order by a3",
      t1)
    assert(out.map(_(1)) == Seq("50", "20"))
    // '#' mid-line is NOT a comment (only full lines are stripped)
    val out2 = run("select a2 || '#' || a3 where NR == 1", t1)
    assert(out2 == Seq(Seq("alpha#beta")))
  }

  test("golden: repeated trailing semicolons and blank lines tolerated") {
    val out = run("select NR, a1\n\nwhere cast(a1 as int) > 5 ;;\n", t1)
    assert(out.map(_(1)) == Seq("50", "20"))
  }

  // -- NF family ----------------------------------------------------------
  test("golden: aNF and bNF field counts") {
    // reference binds bNF per join match (rbql_engine.py:674-689); for our
    // fixed-schema tables both are constants (internal NR cols excluded)
    val out = run(
      "select NF, aNF, a.NF, bNF, b.NF inner join b on a2 == b1 where NR == 1",
      vehicles, Some(joinB))
    assert(out == Seq(Seq(3, 3, 3, 2, 2)))
    // usable in WHERE too
    val out2 = run("select a1 where NF == 3 and bNF == 2 inner join b on a2 == b1 order by cast(a1 as int) limit 1",
      vehicles, Some(joinB))
    assert(out2 == Seq(Seq("-20")))
  }

  test("golden: bNF without JOIN errors") {
    val e = intercept[ParsingError] { run("select bNF", t1) }
    assert(e.getMessage.toLowerCase(java.util.Locale.ROOT).contains("join"))
  }

  test("golden: limit applies after aggregation") {
    val out = run("select COUNT(*), a2 group by a2 limit 2",
      Seq(Seq("1", "x"), Seq("2", "y"), Seq("3", "z"), Seq("4", "x")))
    assert(out.length == 2)
    assert(out.head == Seq(2L, "x")) // sorted by group key, x first
  }
}
