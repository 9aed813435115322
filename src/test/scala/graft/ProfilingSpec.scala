package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Profiling

class ProfilingSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, null), (3.0, 30.0), (4.0, 40.0))
      .toDF("a", "b")
  }

  test("describe computes count, nulls, min/max/mean, exact median, cardinality") {
    val got = Profiling.describe(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getLong(7)))).toMap
    // tiny cardinalities are exact under HLL (dense register path)
    assert(got("a") == ((4L, 0L, 1.0, 4.0, 2.5, 2.5, 4L)))
    // b: nulls excluded from stats; median of {10,30,40} = 30
    assert(got("b") == ((3L, 1L, 10.0, 40.0, 26.666667, 30.0, 3L)))
  }

  test("topValues: exact top-k by frequency, value-asc tiebreak") {
    import spark.implicits._
    val d = Seq(3.0, 1.0, 1.0, 2.0, 2.0, 5.0).toDF("x")
    val got = Profiling.topValues(d, "x", 3)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // 1.0 and 2.0 tie at 2 → value asc; 3.0 and 5.0 tie at 1 → 3.0 wins
    assert(got == Seq((1.0, 2L), (2.0, 2L), (3.0, 1L)))
    // top-k plans as TakeOrdered over the aggregate, not a global sort
    val plan = Profiling.topValues(d, "x", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
  }

  test("approxTopValues matches exact topValues below sketch capacity; no value-keyed exchange") {
    import spark.implicits._
    val d = Seq(3.0, 1.0, 1.0, 2.0, 2.0, 5.0).toDF("x")
    val got = Profiling.approxTopValues(d, "x", 3)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(got == Seq((1.0, 2L), (2.0, 2L), (3.0, 1L)))
    // real data, string column: sketch capacity ≥ cardinality → exact
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val exact = Profiling.topValues(ev, "event_type", 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val approx = Profiling.approxTopValues(ev, "event_type", 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(approx == exact, s"$approx vs $exact")
    // the scale property: ONE exchange (the sketch merge), never a
    // hash aggregate keyed on the values themselves
    val plan = Profiling.approxTopValues(ev, "event_type", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(value"),
      s"value-keyed exchange in approx path:\n$plan")
  }

  test("approxTopValuesBy matches exact grouped top-k below sketch capacity") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val exact = Profiling.topValuesBy(ev, Seq("user_id"), "event_type", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    val approx = Profiling.approxTopValuesBy(ev, Seq("user_id"),
        "event_type", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(approx == exact,
      s"${(approx -- exact).take(5)} vs ${(exact -- approx).take(5)}")
  }

  test("describe cardinality lands within 2% of exact on real data") {
    val rows = SparkEntry.queries("q_cardinality_gate")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 3 && rows.forall(_.getBoolean(1)),
      s"cardinality gate failed: ${rows.mkString(", ")}")
  }

  test("exact and approx quantiles agree on known data, one pass each") {
    import spark.implicits._
    val d = (1 to 100).map(i => i.toDouble).toDF("x")
    val ex = Profiling.exactQuantiles(d, Seq("x"), Seq(0.0, 0.5, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // linear interpolation over 1..100: p=0.5 → 50.5
    assert(ex == Map(0.0 -> 1.0, 0.5 -> 50.5, 1.0 -> 100.0))
    val ap = Profiling.approxQuantiles(d, Seq("x"), Seq(0.0, 0.5, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(math.abs(ap(0.5) - 50.5) <= 1.0 && ap(0.0) == 1.0 && ap(1.0) == 100.0)
    // both plans: one aggregate pair, not one per (column, p)
    Seq(Profiling.exactQuantiles(d, Seq("x"), Seq(0.25, 0.75)),
      Profiling.approxQuantiles(d, Seq("x"), Seq(0.25, 0.75))).foreach { q =>
      val plan = q.queryExecution.executedPlan.toString
      val aggregates = "(?m)^\\s*\\+?-?\\s*(SortAggregate|HashAggregate|ObjectHashAggregate)"
        .r.findAllIn(plan).length
      assert(aggregates <= 2, s"expected one aggregate pair:\n$plan")
    }
  }

  test("grouped quantiles emit one row per (group, column, p)") {
    import spark.implicits._
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0)).toDF("g", "x")
    val got = Profiling.exactQuantilesBy(d, Seq("g"), Seq("x"), Seq(0.0, 0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(2)) -> r.getDouble(3)).toMap
    assert(got == Map(("a", 0.0) -> 1.0, ("a", 0.5) -> 2.0, ("a", 1.0) -> 3.0,
      ("b", 0.0) -> 10.0, ("b", 0.5) -> 15.0, ("b", 1.0) -> 20.0))
    val ap = Profiling.approxQuantilesBy(d, Seq("g"), Seq("x"), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(ap("a") == 2.0 && (ap("b") == 10.0 || ap("b") == 20.0))
  }

  test("rank-based approx-quantile gates hold on real data, plain + grouped") {
    // the gates certify approx_percentile's own contract (rank error
    // ≤ 1/accuracy); on sf0.001 every probe point must pass
    Seq("q_quantiles_gate", "q_quantiles_by_gate").foreach { name =>
      val rows = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").collect()
      assert(rows.nonEmpty, s"$name returned no rows")
      val tolIdx = rows.head.length - 1
      assert(rows.forall(_.getBoolean(tolIdx)),
        s"$name out of tolerance: ${rows.mkString(", ")}")
    }
  }

  test("topValuesBy: per-group top-k with deterministic tiebreak, pruned early") {
    import spark.implicits._
    val d = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 9.0), ("b", 8.0), ("b", 8.0)).toDF("g", "x")
    val got = Profiling.topValuesBy(d, Seq("g"), "x", k = 2)
      .orderBy("g", "rn").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
    // a: 1.0×2 then tie {2.0,3.0}×1 → value asc picks 2.0
    assert(got.toSeq == Seq(("a", 1.0, 2L, 1), ("a", 2.0, 1L, 2),
      ("b", 8.0, 2L, 1), ("b", 9.0, 1L, 2)))
  }

  test("histogram: exact equi-width counts, max in last bucket, empties kept") {
    import spark.implicits._
    val d = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 4.0, 8.0).toDF("x")
    val got = Profiling.histogram(d, "x", bins = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // range [0,8], width 2: [0,2)→{0,1}, [2,4)→{2,3}, [4,6)→{4,4}, [6,8]→{8}
    assert(got.toSeq == Seq((0, 0.0, 2.0, 2L), (1, 2.0, 4.0, 2L),
      (2, 4.0, 6.0, 2L), (3, 6.0, 8.0, 1L)))
    // constant column: all mass in bucket 0, no divide-by-zero
    val const = Seq(5.0, 5.0).toDF("x")
    val cg = Profiling.histogram(const, "x", 4).orderBy("bucket").collect()
    assert(cg.map(_.getLong(3)).toSeq == Seq(2L, 0L, 0L, 0L))
  }

  test("all statistics run in a single aggregate pass") {
    val plan = Profiling.describe(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    val aggregates = "(?m)^\\s*\\+?-?\\s*(SortAggregate|HashAggregate|ObjectHashAggregate)"
      .r.findAllIn(plan).length
    // partial + final of ONE aggregate (not one per column)
    assert(aggregates <= 2, s"expected one aggregate pair:\n$plan")
  }

  test("distinctSketches: per-group estimates exact at tiny cardinality; sketches are compact binary") {
    import spark.implicits._
    val d = (0L until 3000L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val sk = Profiling.distinctSketches(d, Seq("g"), "id")
    val rows = sk.collect()
    assert(rows.length == 3)
    // 1000 distinct ids per group at lgK 12: within the ~1.6% HLL bound
    rows.foreach { r =>
      val est = r.getLong(r.fieldIndex("estimate"))
      assert(math.abs(est - 1000L) <= 30, s"group ${r.getString(0)}: $est")
      // the whole point: per-group state is a few KB regardless of count
      assert(r.getAs[Array[Byte]]("sketch").length < 16384)
    }
  }

  test("unionSketchEstimate merges persisted sketches without rescanning, within the error bound") {
    import spark.implicits._
    val d = (0L until 5000L).map(i => (i, s"p${i % 4}")).toDF("id", "p")
    val sk = Profiling.distinctSketches(d, Seq("p"), "id")
    // persist → reload → union: the incremental-profiling path (binary
    // sketches survive a parquet roundtrip byte-identically)
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    sk.write.mode("overwrite").parquet(s"$dir/sk")
    val reloaded = spark.read.parquet(s"$dir/sk")
    val est = Profiling.unionSketchEstimate(reloaded)
      .head().getLong(0)
    assert(math.abs(est - 5000L) <= 250, s"union estimate $est vs 5000")
    // determinism: same sketches → same estimate
    val est2 = Profiling.unionSketchEstimate(sk).head().getLong(0)
    assert(est == est2)
  }

  test("CMS merge is lossless: unioned per-group sketches answer exactly like one pass") {
    import spark.implicits._
    val d = (0L until 4000L).map(i => (i, s"g${i % 4}", s"v${i % 7}"))
      .toDF("id", "g", "v")
    val probes = (0 until 7).map(i => s"v$i")
    val perGroup = Profiling.cmsEstimates(
      Profiling.freqSketches(d, Seq("g"), "v"), probes)
    val onePass = Profiling.cmsEstimates(
      Profiling.freqSketches(d.withColumn("__one", lit(1)), Seq("__one"), "v"),
      probes)
    assert(perGroup == onePass)
    // CMS overcounts only, within eps*N
    val truth = d.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.foreach { p =>
      assert(perGroup(p) >= truth(p), s"$p undercounted")
      assert(perGroup(p) <= truth(p) + math.ceil(0.01 * 4000).toLong,
        s"$p over bound: ${perGroup(p)} vs ${truth(p)}")
    }
  }

  test("CMS sketches survive a parquet roundtrip") {
    import spark.implicits._
    val d = (0L until 1000L).map(i => (i, s"d${i % 2}", s"k${i % 5}"))
      .toDF("id", "day", "k")
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    Profiling.freqSketches(d, Seq("day"), "k")
      .write.mode("overwrite").parquet(s"$dir/sk")
    val est = Profiling.cmsEstimates(
      spark.read.parquet(s"$dir/sk"), Seq("k0", "k4", "absent"))
    assert(est("k0") == 200L && est("k4") == 200L)
    assert(est("absent") <= math.ceil(0.01 * 1000).toLong)
  }

  test("sketching an appended partition and unioning covers the whole, sans full rescan") {
    import spark.implicits._
    // day1 and day2 overlap in ids: union must count distinct across
    // both, not sum (5000 distinct total, 3000+3000 rows)
    val day1 = (0L until 3000L).map(i => (i, "d1")).toDF("id", "day")
    val day2 = (2000L until 5000L).map(i => (i, "d2")).toDF("id", "day")
    val sk1 = Profiling.distinctSketches(day1, Seq("day"), "id")
    val sk2 = Profiling.distinctSketches(day2, Seq("day"), "id")
    val est = Profiling.unionSketchEstimate(sk1.unionByName(sk2))
      .head().getLong(0)
    assert(math.abs(est - 5000L) <= 250, s"got $est")
    assert(est != 6000L) // it deduplicated the 1000-id overlap
  }

  test("categoricalDrift: per-category shares, one-sided category floors at eps") {
    import spark.implicits._
    val d = Seq(("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "y"), ("b", "y"), ("b", "z"),
      ("c", "w")).toDF("side", "cat")
    val got = Profiling.categoricalDrift(d, "cat", "side", "a", "b")
      .orderBy("category").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq("x", "y", "z")) // 'w' filtered at scan
    val x = got(0); val z = got(2)
    assert(x._2 == 0.666667 && x._3 == 0.25)
    // z: absent on side a → p_a reported 0, term uses the eps floor
    assert(z._2 == 0.0 && z._3 == 0.25)
    val zTerm = BigDecimal((1e-6 - 0.25) * math.log(1e-6 / 0.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(z._4 - zTerm) < 1e-9)
  }

  test("schemaDiff classifies metadata drift without running a job") {
    import spark.implicits._
    val a = Seq((1L, "x", 2.0)).toDF("id", "name", "score")
    val b = Seq((1, "x", true)).toDF("id", "name", "flag")
    val got = Profiling.schemaDiff(a, b)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(got("id") == (("type_changed", "BIGINT", "INT")))
    assert(got("name") == (("unchanged", "STRING", "STRING")))
    assert(got("score")._1 == "removed" && got("score")._3 == null)
    assert(got("flag")._1 == "added" && got("flag")._2 == null)
  }

  test("benford: digit shares vs expectation; zeros excluded, all digits reported") {
    import spark.implicits._
    val d = Seq(100.5, 123.0, 190.0, 20.0, 2.7, 0.0, -30.0).toDF("x")
    val got = Profiling.benford(d, "x")
      .orderBy("digit").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 9) // every digit present, observed or not
    // digits: 1×3 (100,123,190), 2×2 (20, 2.7→2), 3×1 (−30); 0 excluded
    val byDigit = got.map(g => g._1 -> g._2).toMap
    assert(byDigit("1") == 0.5 && byDigit("2") == BigDecimal(2.0 / 6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(byDigit("9") == 0.0)
    // expectation column is the Benford share
    assert(got.head._3 == BigDecimal(math.log10(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("orphans: anti-join audit counts broken references, nulls excluded") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(3L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Profiling.orphans(child, parent, "fk", "pk").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == BigDecimal(1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // intact references → zero orphans, rate 0
    val ok = Profiling.orphans(child, Seq(1L, 2L, 3L).toDF("pk"),
      "fk", "pk").head()
    assert(ok.getLong(1) == 0L && ok.getDouble(2) == 0.0)
  }

  test("orderViolations counts per-key time regressions in arrival order") {
    import spark.implicits._
    // key 1 arrives ts 10,5,20,15 → two regressions; key 2 is clean
    val ev = Seq((1L, 10L, 1L), (1L, 5L, 2L), (1L, 20L, 3L),
      (1L, 15L, 4L), (2L, 1L, 5L), (2L, 2L, 6L))
      .toDF("user_id", "ts", "arr")
    val got = Profiling.orderViolations(ev, "user_id", "ts", "arr")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L)) // clean keys emit nothing
  }

  test("psiBySlice: leave-one-out per-slice drift, zero-count bins contribute") {
    import spark.implicits._
    // slices a and b share one distribution; slice c sits entirely in
    // the other bin — its leave-one-out psi must dwarf theirs
    val d = Seq(("a", 1.0), ("a", 1.5), ("b", 1.2), ("b", 1.8),
      ("c", 9.0), ("c", 9.5)).toDF("src", "v")
    val got = Profiling.psiBySlice(d, "v", "src", lo = 0.0, hi = 10.0,
        bins = 2)
      .orderBy("slice").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq("a", "b", "c"))
    assert(got.forall(_._2 == 2L))
    // c: bin0 share eps vs rest 1.0; bin1 share 1.0 vs rest eps —
    // both ε-floored terms contribute (hand-computed)
    val big = (1e-6 - 1.0) * math.log(1e-6 / 1.0) +
      (1.0 - 1e-6) * math.log(1.0 / 1e-6)
    val exp = BigDecimal(big).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(2)._3 - exp) < 1e-6, s"c psi ${got(2)._3} vs $exp")
    // a vs rest {b-half, c}: drifted but far less than c
    assert(got(0)._3 > 0 && got(0)._3 < got(2)._3)
    assert(got(1)._3 > 0 && got(1)._3 < got(2)._3)
  }

  test("ksBySlice: leave-one-out exact D per slice, matches pairwise KS") {
    import spark.implicits._
    // three slices; c is shifted — its leave-one-out D must dominate,
    // and the per-slice value must EQUAL ksStatistic run slice-vs-rest
    val d = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0),
      ("c", 8.0), ("c", 9.0)).toDF("src", "v")
    val got = Profiling.ksBySlice(d, "v", "src")
      .orderBy("slice").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq("a", "b", "c"))
    // c vs rest {1,1,2,2}: CDFs disjoint → D = 1; a vs rest {1,2,8,9}:
    // F_a(2)=1, F_rest(2)=0.5 → D = 0.5
    assert(got(2) == (("c", 2L, 1.0)))
    assert(got(0) == (("a", 2L, 0.5)) && got(1) == (("b", 2L, 0.5)))
    // consistency with the two-sample operator, per slice
    val rest = d.withColumn("side",
      when(col("src") === "c", "c").otherwise("rest"))
    val pairwise = Profiling.ksStatistic(rest, "v", "side", "c", "rest")
      .head().getDouble(0)
    assert(pairwise == got(2)._3)
    // a slice missing mass where the REST jumps is still measured at
    // the rest's jump points (the grid, not slice-only points)
    val e = Seq(("x", 1.0), ("x", 10.0), ("y", 5.0), ("y", 5.5))
      .toDF("src", "v")
    val dx = Profiling.ksBySlice(e, "v", "src")
      .filter(col("slice") === "x").head().getDouble(2)
    // F_x(5.5)=0.5 vs F_y(5.5)=1.0 → D = 0.5 occurs at y's jump
    assert(dx == 0.5, s"got $dx")
  }

  test("ksStatistic: exact D, partition-independent, zero on identical slices") {
    import spark.implicits._
    // a: {1,2,3,4}; b: {3,4,5,6} → D = |CDF_a - CDF_b| peaks at v∈[2,3):
    // CDF_a(2)=0.5, CDF_b(2)=0 → D = 0.5
    val d = (Seq(1, 2, 3, 4).map(v => ("a", v.toDouble)) ++
      Seq(3, 4, 5, 6).map(v => ("b", v.toDouble)) ++
      Seq(1, 2, 3, 4).map(v => ("c", v.toDouble)))  // c ≡ a's distribution
      .toDF("side", "v")
    val r = Profiling.ksStatistic(d, "v", "side", "a", "b").head()
    assert(r.getDouble(0) == 0.5 && r.getLong(1) == 4L && r.getLong(2) == 4L)
    // identical distributions → D = 0
    val same = Profiling.ksStatistic(d, "v", "side", "a", "c").head()
    assert(same.getDouble(0) == 0.0)
    // the distributed CDF must not depend on input partitioning
    val shuffled = Profiling.ksStatistic(d.repartition(7, col("v")),
      "v", "side", "a", "b").head()
    assert(shuffled.getDouble(0) == 0.5)
    // real data sanity: D ∈ [0, 1] against the driver tables
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dr = Profiling.ksStatistic(docs, "n_chars", "source", "src0", "src1")
      .head().getDouble(0)
    assert(dr >= 0.0 && dr <= 1.0)
  }

  test("correlationMatrix: all pairs in one pass, values match closed form") {
    import spark.implicits._
    // y = 2x exactly (corr 1); z exactly anti-correlated (corr -1)
    val d = Seq((1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0))
      .toDF("x", "y", "z")
    val got = Profiling.correlationMatrix(d, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSeq
    assert(got == Seq(("x", "y", 1.0), ("x", "z", -1.0), ("y", "z", -1.0)))
    // ONE aggregate pass: a single pair of hash-aggregate nodes (partial
    // + final), never an aggregate per pair
    val plan = Profiling.correlationMatrix(d, Seq("x", "y", "z"))
      .queryExecution.executedPlan.toString
    val nAgg = "(?i)hashaggregate".r.findAllIn(plan).length
    assert(nAgg <= 2, s"expected one partial+final aggregate, plan:\n$plan")
  }

  test("psiReport: shares and terms per bin; identical slices give zero PSI") {
    import spark.implicits._
    // side a: 4 rows in bin 0, 0 in bin 1; side b: 2 and 2
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 1.0), ("b", 2.0), ("b", 6.0), ("b", 7.0), ("c", 9.0),
      ("d", 1.0), ("d", 2.0), ("d", 3.0), ("d", 4.0))
      .toDF("side", "v")
    val got = Profiling.psiReport(d, "v", "side", "a", "b",
      lo = 0.0, hi = 10.0, bins = 2)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // bin0: pa=1.0 pb=0.5 → (0.5)·ln(2); bin1: pa=eps pb=0.5
    val t0 = BigDecimal((1.0 - 0.5) * math.log(1.0 / 0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t1 = BigDecimal((1e-6 - 0.5) * math.log(1e-6 / 0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.length == 2)
    assert(got(0) == ((0L, 1.0, 0.5, t0)))
    assert(got(1)._1 == 1L && got(1)._2 == 0.0 && got(1)._3 == 0.5)
    assert(math.abs(got(1)._4 - t1) < 1e-9)
    // identically-distributed slices → every term 0
    val same = Profiling.psiReport(d, "v", "side", "a", "d",
      lo = 0.0, hi = 10.0, bins = 2).collect()
    assert(same.forall(r => r.getDouble(3) == 0.0))
    // the 'c' row is filtered at the scan, never counted
    assert(got.map(_._2).sum == 1.0 && got.map(_._3).sum == 1.0)
  }

  test("keyUniqueness verdicts on unique and duplicated keys") {
    import spark.implicits._
    val uniq = Seq(1L, 2L, 3L).toDF("k")
    val u = Profiling.keyUniqueness(uniq, Seq("k")).collect().head
    assert((u.getLong(0), u.getLong(1), u.getLong(2), u.getBoolean(3)) ==
      ((3L, 3L, 0L, true)))
    val dup = Seq(1L, 2L, 2L, 3L, 3L).toDF("k")
    val d = Profiling.keyUniqueness(dup, Seq("k")).collect().head
    assert((d.getLong(0), d.getLong(1), d.getLong(2), d.getBoolean(3)) ==
      ((5L, 3L, 2L, false)))
  }

  test("percentileRankBy: ties share, per-group, singleton ranks zero") {
    import spark.implicits._
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0), ("b", 9.0))
      .toDF("g", "v")
    val got = Profiling.percentileRankBy(d, "v", "g")
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    // group a (n=4): ranks 1,2,2,4 → pr 0, 1/3, 1/3, 1
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got(("a", 1.0)) == 0.0)
    assert(got(("a", 2.0)) == r6(1.0 / 3))
    assert(got(("a", 5.0)) == 1.0)
    assert(got(("b", 9.0)) == 0.0)
  }

  test("autoHistogram: FD bins on a hand fixture; point mass collapses") {
    import spark.implicits._
    val d = (1 to 8).map(i => Tuple1(i.toDouble)).toDF("v")
    // n=8: IQR = 6.25−2.75 = 3.5; width = 2·3.5/2 = 3.5; range 7 → 2 bins
    val got = Profiling.autoHistogram(d, "v")
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 1.0, 4.5, 4L), (1L, 4.5, 8.0, 4L)))
    val const = Seq.fill(5)(Tuple1(3.0)).toDF("v")
    val c = Profiling.autoHistogram(const, "v").collect()
    assert(c.length == 1 && c.head.getLong(0) == 0L &&
      c.head.getLong(3) == 5L)
  }

  test("welchT matches the closed form on a hand fixture") {
    import spark.implicits._
    val d = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++ Seq(5.0, 7.0).map(("b", _))
      :+ ("c", 99.0)) // foreign slice must be excluded
      .toDF("g", "v")
    val r = Profiling.welchT(d, "v", "g", "a", "b").collect().head
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val (va, vb) = (1.0, 2.0) // sample variances
    val se = va / 3 + vb / 2
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 6.0)
    assert(r.getDouble(4) == r6((2.0 - 6.0) / math.sqrt(se)))
    assert(r.getDouble(5) == r6(se * se /
      ((va / 3) * (va / 3) / 2 + (vb / 2) * (vb / 2) / 1)))
  }

  test("kAnonymity flags combinations below k and only those") {
    import spark.implicits._
    val d = (Seq.fill(5)(("en", "web")) ++ Seq.fill(2)(("en", "book")) ++
      Seq.fill(9)(("de", "web"))).toDF("lang", "src")
    val got = Profiling.kAnonymity(d, Seq("lang", "src"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(got == Map(
      ("en", "web") -> ((5L, false)),
      ("en", "book") -> ((2L, true)),
      ("de", "web") -> ((9L, false))))
  }

  test("mutual information: dependent pair saturates, independent pair is zero") {
    import spark.implicits._
    // perfectly dependent: b = a → MI = H(a) = H(b) = ln 2, NMI = 1
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val d = Profiling.mutualInformation(dep, "a", "b").collect().head
    val ln2 = math.floor(math.log(2) * 1e6 + 0.5) / 1e6
    assert(d.getDouble(0) == ln2 && d.getDouble(1) == ln2 &&
      d.getDouble(2) == ln2)
    assert(math.abs(d.getDouble(3) - 1.0) < 1e-6)
    // independent: uniform product distribution → MI = 0, NMI = 0
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .toDF("a", "b")
    val i = Profiling.mutualInformation(ind, "a", "b").collect().head
    assert(math.abs(i.getDouble(0)) < 1e-9 && math.abs(i.getDouble(3)) < 1e-9)
    // degenerate marginal: constant a → H(a) = 0 → NMI pinned to 0
    val cst = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    assert(Profiling.mutualInformation(cst, "a", "b")
      .collect().head.getDouble(3) == 0.0)
  }

  test("madOutliersBy flags the value a classical z-score would absorb") {
    import spark.implicits._
    val d = ((1 to 9).map(i => ("a", i.toDouble)) :+ ("a", 100.0))
      .toDF("g", "v")
    val got = Profiling.madOutliersBy(d, "v", "g", z = 3.5)
      .select("v", "med", "mad", "robust_z", "is_outlier").collect()
      .map(r => r.getDouble(0) ->
        (r.getDouble(1), r.getDouble(2), Option(r.get(3)), r.getBoolean(4)))
      .toMap
    // med of {1..9, 100} = 5.5; MAD = med of |x−5.5| = 2.5
    assert(got(100.0)._1 == 5.5 && got(100.0)._2 == 2.5)
    assert(got(100.0)._4, "100 must be an outlier")
    assert(!got(5.0)._4 && !got(9.0)._4)
    // the same data through a mean/stddev z: (100−mean)/sd ≈ 2.85 < 3.5 —
    // the outlier inflates the scale it is judged by
    val (mean, sd) = {
      val vs = d.select("v").as[Double].collect()
      val m = vs.sum / vs.length
      (m, math.sqrt(vs.map(x => (x - m) * (x - m)).sum / vs.length))
    }
    assert((100.0 - mean) / sd < 3.5)
  }

  test("madOutliersBy: constant group has null robust_z, no outliers") {
    import spark.implicits._
    val d = Seq(("c", 7.0), ("c", 7.0), ("c", 7.0)).toDF("g", "v")
    val got = Profiling.madOutliersBy(d, "v", "g").collect()
    assert(got.forall(r => r.isNullAt(r.fieldIndex("robust_z"))))
    assert(got.forall(!_.getAs[Boolean]("is_outlier")))
  }

  test("winsorizeBy clips to per-group quantiles and leaves interior values") {
    import spark.implicits._
    // group a: 1..10 → p05/p95 interpolate to 1.45 / 9.55 (quantile_cont
    // over n=10: rank = (n-1)p); group b is constant → lo = hi = 7
    val d = ((1 to 10).map(i => ("a", i.toDouble)) ++
      Seq(("b", 7.0), ("b", 7.0))).toDF("g", "v")
    val got = Profiling.winsorizeBy(d, "v", "g")
      .select("g", "v", "lo", "hi", "clipped")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(("a", 1.0)) == ((1.45, 9.55, 1.45)))   // clipped up
    assert(got(("a", 10.0)) == ((1.45, 9.55, 9.55)))  // clipped down
    assert(got(("a", 5.0)) == ((1.45, 9.55, 5.0)))    // interior untouched
    assert(got(("b", 7.0)) == ((7.0, 7.0, 7.0)))
  }

  test("winsorizeBy plan broadcasts the cut table, never sorts the corpus") {
    import spark.implicits._
    val d = (1 to 100).map(i => ("g" + (i % 3), i.toDouble)).toDF("g", "v")
    val plan = Profiling.winsorizeBy(d, "v", "g")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
