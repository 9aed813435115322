package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.pipeline.Temporal
import graft.sinks.Sinks
import graft.sources.CsvSource

/** Property-based layer mirroring the reference's randomized testing
  * (/root/reference/test/test_csv_utils.py:70-260 random tables,
  * test_rbql.py:326-339 a1 ↔ a[1] style rewrites). Uses raw ScalaCheck
  * generators with fixed seeds (scalatestplus bridge is not on the
  * offline classpath). */
class PropertySpec extends SparkSpec {

  private val fieldGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("", "a,b", "x\"y", "has space", "ключ", "0", "-5", "3.14"))

  private val tableGen: Gen[Seq[Seq[String]]] = for {
    rows <- Gen.choose(1, 6)
    cols <- Gen.choose(1, 4)
    data <- Gen.listOfN(rows, Gen.listOfN(cols, fieldGen))
  } yield data.map(_.toSeq).toSeq

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: a1 and a[1] variable styles are equivalent") {
    samples(tableGen, 10).foreach { table =>
      val q1 = Graft.queryTable(spark, "select a1, NR where a1 != 'zz9'", table)
      val q2 = Graft.queryTable(spark, "select a[1], NR where a[1] != 'zz9'", table)
      assert(q1 == q2, s"style mismatch on $table")
    }
  }

  test("property: quoteField quotes exactly when needed") {
    samples(fieldGen, 40).foreach { f =>
      val quoted = Sinks.quoteField(f, ",")
      if (f.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        assert(quoted.startsWith("\"") && quoted.endsWith("\""))
      else assert(quoted == f)
    }
  }

  test("property: csv write/read roundtrip preserves values") {
    samples(tableGen, 6).foreach { table =>
      val w = table.map(_.length).max
      val uniform = table.zipWithIndex.map { case (r, i) =>
        i.toString +: r.padTo(w, "pad")
      }
      val schema = org.apache.spark.sql.types.StructType(
        (0 to w).map(i => org.apache.spark.sql.types.StructField(s"c$i",
          org.apache.spark.sql.types.StringType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(uniform.map(r =>
          org.apache.spark.sql.Row.fromSeq(r))), schema)
      val dir = java.nio.file.Files.createTempDirectory("graftprop").toString
      Sinks.writeCsv(df, s"$dir/t")
      val back = CsvSource.read(spark, s"$dir/t", hasHeader = true)
        .collect().map(_.toSeq.map(v => Option(v).map(_.toString).getOrElse("")))
        .sortBy(_.head).map(_.toSeq).toSeq
      val orig = uniform.sortBy(_.head).map(_.toSeq)
      assert(back == orig, s"roundtrip mismatch on $table")
    }
  }

  test("property: countFields agrees with the full splitter on arbitrary records") {
    // the allocation-free width/NF kernel must mirror splitQuoted exactly —
    // including malformed quoting, trailing delimiters, empty records, and
    // multi-char delimiters
    val rnd = new scala.util.Random(7)
    val alphabet = "ab,\"\n '\t;x|".toCharArray
    def randRecord(): String =
      (0 until rnd.nextInt(24)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (delim <- Seq(",", ";", "|", " ", "||"); _ <- 1 to 400) {
      val rec = randRecord()
      val expected = sources.RfcSplit.splitQuoted(rec, delim).length
      val actual = sources.RfcSplit.countFields(rec, delim)
      assert(actual == expected,
        s"countFields mismatch on [$rec] delim [$delim]: $actual != $expected")
    }
  }

  test("property: RfcSplit round-trips quoted joins, including multiline fields") {
    // reference invariant (test_csv_utils.py random round-trip): fields →
    // quote_field-join → split_quoted_str → the same fields
    val rnd = new scala.util.Random(42)
    val alphabet = "ab,\"\n '\t;x".toCharArray
    def randField(): String =
      (0 until rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 500).foreach { _ =>
      val fields = (0 until (1 + rnd.nextInt(6))).map(_ => randField())
      val joined = fields.map(f => sinks.Sinks.quoteField(f, ",")).mkString(",")
      val (back, warn) = sources.RfcSplit.splitQuotedWithWarning(joined, ",")
      assert(!warn, s"unexpected warning on [$joined]")
      assert(back == fields, s"roundtrip mismatch: $fields via [$joined] -> $back")
    }
  }

  test("RfcSplit flags defective escaping like the reference") {
    // unquoted field containing a quote
    assert(sources.RfcSplit.splitQuotedWithWarning("""a,br"oken,c""", ",")._2)
    // quoted field not followed by a delimiter
    assert(sources.RfcSplit.splitQuotedWithWarning("""a,"x"y,c""", ",")._2)
    // well-formed: no warning
    assert(!sources.RfcSplit.splitQuotedWithWarning("""a,"x,""y",c""", ",")._2)
  }

  test("RfcSplit matches the full multi-character delimiter") {
    // the reference's split_quoted_str locates dlm with str.find (full
    // string, csv_utils.py:24); a charAt(0) truncation would split on the
    // '#' inside fields
    assert(sources.RfcSplit.splitQuotedWithWarning("a#b###c###d", "###") ==
      (Seq("a#b", "c", "d"), false))
    assert(sources.RfcSplit.splitQuotedWithWarning(""""x###y"###z""", "###") ==
      (Seq("x###y", "z"), false))
    // quoted field followed by a full multi-char delimiter, trailing empty
    assert(sources.RfcSplit.splitQuotedWithWarning(""""q""uoted"###""", "###") ==
      (Seq("q\"uoted", ""), false))
    // multiline field under a multi-char delimiter
    assert(sources.RfcSplit.splitQuotedWithWarning("\"multi\nline\"###tail", "###") ==
      (Seq("multi\nline", "tail"), false))
  }

  test("property: RfcSplit round-trips under a multi-char delimiter") {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab#\"\n x".toCharArray
    def randField(): String =
      (0 until rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 300).foreach { _ =>
      val fields = (0 until (1 + rnd.nextInt(5))).map(_ => randField())
      // quote when the field contains a quote or the delimiter
      // any '#' must be quoted: adjacent field-final '#' + delimiter '##'
      // would be ambiguous at split time (same lossiness as Python's
      // str.split on overlapping delimiters)
      val joined = fields.map { f =>
        if (f.contains('"')) "\"" + f.replace("\"", "\"\"") + "\""
        else if (f.contains("#") || f.contains('\n')) "\"" + f + "\""
        else f
      }.mkString("##")
      val (back, warn) = sources.RfcSplit.splitQuotedWithWarning(joined, "##")
      assert(!warn, s"unexpected warning on [$joined]")
      assert(back == fields, s"roundtrip mismatch: $fields via [$joined] -> $back")
    }
  }

  test("RBQL_VERSION variable") {
    val out = Graft.queryTable(spark, "select RBQL_VERSION, a1 limit 1", Seq(Seq("x")))
    assert(out == Seq(Seq("0.1.0-graft", "x")))
  }

  test("positional access past the width binds None, not an error " +
      "(reference safe_get pads; join KEYS stay strict)") {
    // probed live: `select a[4], a1` / `select a4` over a narrow table
    // emit None values; only sub-1 indices and join keys error
    val rows = Graft.queryTable(spark, "select a[9], a1", Seq(Seq("x")))
    assert(rows == Seq(Seq(null, "x")))
    val rows2 = Graft.queryTable(spark, "select a7 where a9 is null",
      Seq(Seq("x"), Seq("y")))
    assert(rows2 == Seq(Seq(null), Seq(null)))
    // b-side reads past the JOIN table's width pad too (probed live);
    // only JOIN KEYS are strict
    val rows3 = Graft.queryTable(spark, "select a1, b7 JOIN B on a1 == b1",
      Seq(Seq("1", "2"), Seq("3", "4")),
      joinRows = Some((Seq(Seq("1", "x"), Seq("3", "y")), None)))
    assert(rows3 == Seq(Seq("1", null), Seq("3", null)))
    // UPDATE right-hand sides read through the same padding
    // (reference: `update a2 = a9` assigns None)
    val rows4 = Graft.queryTable(spark, "update a2 = a9",
      Seq(Seq("1", "2"), Seq("3", "4")))
    assert(rows4 == Seq(Seq("1", null), Seq("3", null)))
  }

  // ---- temporal operators vs driver-side brute force -------------------

  private val eventsGen: Gen[Seq[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 30)
    rows <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 4L)
      ts <- Gen.choose(0L, 50L)
    } yield (user, ts))
  } yield rows.zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }.toSeq

  test("property: asofJoin matches a brute-force scan") {
    import spark.implicits._
    samples(Gen.zip(eventsGen, eventsGen), 8).foreach { case (ls, rs) =>
      val left = ls.toDF("user_id", "ts", "event_id")
      val right = rs.map { case (u, t, i) => (u, t, i + 1000L) }
        .toDF("user_id", "ts", "event_id")
      val got = pipeline.Temporal
        .asofJoin(left, right, "user_id", "ts", "event_id", Seq("event_id"))
        .collect()
        .map(r => r.getLong(2) ->
          (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      // brute force: latest right with right.ts <= left.ts, same key;
      // ties on ts broken by the tie column (largest wins, like the
      // window's last())
      val expected = ls.map { case (u, t, i) =>
        val cand = rs.map { case (ru, rt, ri) => (ru, rt, ri + 1000L) }
          .filter { case (ru, rt, _) => ru == u && rt <= t }
        i -> (if (cand.isEmpty) -1L
              else cand.maxBy { case (_, rt, ri) => (rt, ri) }._3)
      }.toMap
      assert(got == expected, s"\nleft=$ls\nright=$rs")
    }
  }

  test("property: charEntropy bounds and permutation invariance") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val strGen = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', '!', 'é', '中')))
      .map(_.mkString)
    val strs = samples(strGen, 24).distinct
    val got = strs.toDF("text")
      .select(col("text"),
        pipeline.TextAnalysis.charEntropy(col("text")).as("h"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // entropy rounds half-up to 6 digits: allow that granularity
    strs.foreach { s =>
      val h = got(s)
      val distinct = s.codePoints().distinct().count().toDouble
      assert(h >= 0.0, s"negative entropy for ${s.take(20)}")
      assert(h <= math.log(distinct) / math.log(2.0) + 1e-6,
        s"entropy $h above log2($distinct) for ${s.take(20)}")
    }
    // permutation invariance: reversing the string keeps the histogram
    val rev = strs.map(_.reverse).toDF("text")
      .select(col("text"),
        pipeline.TextAnalysis.charEntropy(col("text")).as("h"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    strs.foreach(s => assert(got(s) == rev(s.reverse), s.take(20)))
  }

  test("property: planBands always factorizes n and tracks the threshold") {
    val nGen = Gen.oneOf(16, 32, 64, 128, 100, 120, 256)
    val tGen = Gen.choose(0.15, 0.95)
    samples(Gen.zip(nGen, tGen), 40).foreach { case (n, t) =>
      val (b, r) = pipeline.Dedup.planBands(n, t)
      assert(b * r == n, s"n=$n t=$t -> ($b,$r)")
      assert(b >= 1 && r >= 1)
      // the chosen plan's S-curve midpoint must beat the degenerate
      // plans' midpoints at tracking the threshold (unless n is prime
      // and they're the only options)
      val mid = math.pow(1.0 / b, 1.0 / r)
      if (b > 1 && r > 1) {
        assert(math.abs(mid - t) < 0.45, s"n=$n t=$t mid=$mid")
      }
    }
  }

  test("property: BPE segmentation is a lossless partition with bounded counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val wordGen = Gen.nonEmptyListOf(
      Gen.frequency(8 -> Gen.alphaLowerChar, 1 -> Gen.oneOf('ç', 'ö', '中')))
      .map(_.take(9).mkString)
    val textGen = Gen.nonEmptyListOf(wordGen).map(_.take(12).mkString(" "))
    val texts = samples(textGen, 30).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val model = pipeline.Bpe.learn(df, "text", numMerges = 40)
    val rows = df
      .select(col("id"), col("text"),
        pipeline.Bpe.segment(col("text"), model).as("seg"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(1)
      val seg = r.getSeq[String](2)
      val words = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      // lossless partition: subwords concatenate back to the words
      assert(seg.mkString("") == words.mkString(""), s"text='$text' seg=$seg")
      // bounds: one to len(word) subwords per word
      assert(seg.size >= words.length, s"fewer subwords than words: $seg")
      assert(seg.size <= words.map(w => w.codePointCount(0, w.length)).sum.max(1),
        s"more subwords than code points: $seg")
    }
  }

  test("property: sessionize matches a sequential scan") {
    import spark.implicits._
    samples(eventsGen, 8).foreach { evs =>
      if (evs.nonEmpty) {
        val gap = 7L
        val got = pipeline.Temporal
          .sessionize(evs.toDF("user_id", "ts", "event_id"),
            "user_id", "ts", "event_id", gap)
          .collect()
          .map(r => r.getLong(2) -> r.getLong(3)).toMap
        val expected = evs.groupBy(_._1).flatMap { case (_, rows) =>
          val ordered = rows.sortBy(r => (r._2, r._3))
          var sid = 0L
          var prev = Long.MinValue
          ordered.map { case (_, t, i) =>
            if (prev == Long.MinValue || t - prev > gap) sid += 1
            prev = t
            i -> sid
          }
        }
        assert(got == expected, s"events=$evs")
      }
    }
  }

  // --- round-9 temporal additions: brute-force oracles on random data ---

  private val asofCaseGen: Gen[(Seq[(Long, Long, Long)], Seq[(Long, Long, Long)])] =
    for {
      nl <- Gen.choose(1, 8)
      nr <- Gen.choose(0, 8)
      mkRow = for {
        k <- Gen.choose(1L, 3L)
        ts <- Gen.choose(0L, 40L)
      } yield (k, ts)
      ls <- Gen.listOfN(nl, mkRow)
      rs <- Gen.listOfN(nr, mkRow)
    } yield (
      ls.zipWithIndex.map { case ((k, t), i) => (k, t, 100L + i) }.toSeq,
      rs.zipWithIndex.map { case ((k, t), i) => (k, t, 200L + i) }.toSeq)

  test("property: asofJoin directions agree with a brute-force oracle") {
    import spark.implicits._
    val tol = 7L
    samples(asofCaseGen, 12).foreach { case (ls, rs) =>
      val ldf = ls.toDF("k", "ts", "event_id")
      val rdf = rs.toDF("k", "ts", "event_id")
      for (dir <- Seq("backward", "forward", "nearest")) {
        val got = Temporal.asofJoin(ldf, rdf, "k", "ts", "event_id",
          payload = Seq("event_id"), direction = dir, toleranceNs = tol)
          .select("event_id", "asof_event_id").collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
        val expected = ls.map { case (k, t, lid) =>
          // brute force: candidates within tolerance, nearest by
          // distance with the direction rule, ties by (ts, tie id)
          val back = rs.filter(r => r._1 == k && r._2 <= t && t - r._2 <= tol)
            .sortBy(r => (-r._2, r._3)).headOption
          val fwd = rs.filter(r => r._1 == k && r._2 >= t && r._2 - t <= tol)
            .sortBy(r => (r._2, r._3)).headOption
          val pick = dir match {
            case "backward" => back
            case "forward" => fwd
            case "nearest" => (back, fwd) match {
              case (Some(b), Some(f)) =>
                if (t - b._2 <= f._2 - t) Some(b) else Some(f)
              case (b, f) => b.orElse(f)
            }
          }
          lid -> pick.map(_._3).getOrElse(-1L)
        }.toMap
        assert(got == expected,
          s"dir=$dir left=$ls right=$rs got=$got want=$expected")
      }
    }
  }

  private val intervalsGen: Gen[Seq[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 10)
    iv <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 2L)
      s <- Gen.choose(0L, 30L)
      len <- Gen.choose(0L, 10L)
    } yield (k, s, s + len))
  } yield iv.toSeq

  test("property: mergeIntervals spans are disjoint, cover inputs, count members") {
    import spark.implicits._
    samples(intervalsGen, 15).foreach { iv =>
      val out = Temporal.mergeIntervals(
        iv.toDF("k", "s", "e"), "k", "s", "e")
        .select("k", "span_start", "span_end", "n_merged").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // member counts sum to the input count
      assert(out.map(_._4).sum == iv.size, s"iv=$iv out=${out.toSeq}")
      out.groupBy(_._1).foreach { case (k, spans) =>
        val sorted = spans.sortBy(_._2)
        // strictly separated (merged spans never touch)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._3 < b._2,
            s"touching spans should have merged: $a $b (iv=$iv)")
          case _ =>
        }
        // every input interval of this key lies inside exactly one span
        iv.filter(_._1 == k).foreach { case (_, s, e) =>
          val containing = sorted.filter(sp => sp._2 <= s && e <= sp._3)
          assert(containing.length == 1, s"($s,$e) in ${containing.toSeq} (iv=$iv)")
        }
      }
    }
  }

  test("property: drift measures are symmetric-ish, bounded, and sign-correct") {
    import spark.implicits._
    import graft.pipeline.Profiling
    val valGen = Gen.listOfN(14, Gen.choose(0.0, 10.0))
    samples(Gen.zip(valGen, valGen), 6).foreach { case (as, bs) =>
      val df = (as.map(("a", _)) ++ bs.map(("b", _))).toDF("side", "v")
      // KS is symmetric in its two samples and bounded in [0, 1]
      val dab = Profiling.ksStatistic(df, "v", "side", "a", "b")
        .head().getDouble(0)
      val dba = Profiling.ksStatistic(df, "v", "side", "b", "a")
        .head().getDouble(0)
      assert(dab == dba, s"KS asymmetric: $dab vs $dba")
      assert(dab >= 0.0 && dab <= 1.0)
      // every PSI term is non-negative ((p−q)·ln(p/q) ≥ 0 pointwise),
      // and swapping the sides preserves each |term|
      val terms = Profiling.psiReport(df, "v", "side", "a", "b",
        lo = 0.0, hi = 10.0, bins = 4).collect().map(_.getDouble(3))
      assert(terms.forall(_ >= 0.0), s"negative PSI term in ${terms.toSeq}")
      val swapped = Profiling.psiReport(df, "v", "side", "b", "a",
        lo = 0.0, hi = 10.0, bins = 4).collect().map(_.getDouble(3))
      assert(terms.sorted.toSeq == swapped.sorted.toSeq)
    }
  }

  test("property: AC automaton agrees with contains() on adversarial small alphabets") {
    // tiny alphabet forces overlapping/nested patterns and deep failure
    // chains — the paths a happy-case test never exercises
    val patGen = Gen.nonEmptyListOf(
      Gen.choose(1, 4).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString)))
      .map(_.distinct.take(6))
    val textGen = Gen.listOfN(40, Gen.oneOf('a', 'b')).map(_.mkString)
    samples(Gen.zip(patGen, textGen), 60).foreach { case (pats, text) =>
      val ac = new org.apache.spark.sql.graft.AcAutomaton(pats)
      val got = ac.scan(text).toSet
      val expect = pats.zipWithIndex
        .filter { case (p, _) => text.contains(p) }.map(_._2).toSet
      assert(got == expect,
        s"patterns=$pats text=$text got=$got expect=$expect")
    }
  }

  test("property: hilbert index is bijective and unit-step at any dims/bits") {
    import org.apache.spark.sql.graft.GraftHashOps
    // every (dims, bits) pair small enough to enumerate exhaustively
    for {
      dims <- 2 to 4
      bits <- 1 to (if (dims == 2) 4 else 2)
    } {
      val side = 1 << bits
      val total = 1L << (bits * dims)
      def coords(cell: Long): Array[Long] =
        Array.tabulate(dims)(d => (cell >> (d * bits)) & (side - 1))
      val m = (0L until total).map { cell =>
        GraftHashOps.hilbertIndex(coords(cell), bits) -> cell
      }.toMap
      assert(m.keySet == (0L until total).toSet,
        s"not a bijection at dims=$dims bits=$bits")
      // continuity: consecutive curve positions differ by EXACTLY one
      // unit step in exactly one coordinate — at every size
      (0L until total - 1).foreach { h =>
        val a = coords(m(h)); val b = coords(m(h + 1))
        val dist = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(dist == 1, s"jump at h=$h dims=$dims bits=$bits")
      }
    }
  }

  test("property: tfidfCosinePairs equals a brute-force reference on random corpora") {
    import spark.implicits._
    val word = Gen.oneOf("red", "blue", "green", "fox", "dog", "cat",
      "run", "jump", "qq1", "qq2")
    val docGen = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, word))
    val corpusGen = Gen.choose(4, 10).flatMap(n => Gen.listOfN(n, docGen))
    samples(corpusGen, 5).foreach { docsW =>
      val docs = docsW.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("id", "text")
      val thr = 0.3
      val got = graft.pipeline.Dedup
        .tfidfCosinePairs(docs, "text", "id", thr, maxDf = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      // brute force in plain Scala (same hashing is irrelevant here —
      // the word list is collision-free at 60 bits)
      val n = docsW.size.toDouble
      val tf = docsW.map(_.groupBy(identity).view.mapValues(_.size.toDouble).toMap)
      val dfm = tf.flatMap(_.keys).groupBy(identity).view.mapValues(_.size).toMap
      def vec(m: Map[String, Double]) =
        m.map { case (t, f) => t -> f * math.log(n / dfm(t)) }
      def cos(a: Map[String, Double], b: Map[String, Double]): Double = {
        val va = vec(a); val vb = vec(b)
        val dot = va.keySet.intersect(vb.keySet).toSeq
          .map(t => va(t) * vb(t)).sum
        val na = math.sqrt(va.values.map(x => x * x).sum)
        val nb = math.sqrt(vb.values.map(x => x * x).sum)
        if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
      }
      val expected = (for {
        i <- tf.indices; j <- (i + 1) until tf.size
        c = cos(tf(i), tf(j)) if c >= thr
      } yield (i.toLong, j.toLong) -> c).toMap
      assert(got.keySet == expected.keySet,
        s"pair sets differ: ${got.keySet} vs ${expected.keySet} on $docsW")
      expected.foreach { case (k, c) =>
        assert(math.abs(got(k) - c) < 1e-5, s"cosine $k: ${got(k)} vs $c")
      }
    }
  }

  test("property: Cdc.applyChanges equals a sequential reference fold") {
    import spark.implicits._
    val opGen = for {
      key <- Gen.choose(1L, 8L); seq <- Gen.choose(1L, 100L)
      op <- Gen.oneOf("u", "d"); v <- Gen.choose(0, 999)
    } yield (key, s"v$v", v, seq, op)
    val changesGen = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, opGen))
    samples(changesGen, 6).foreach { raw =>
      // enforce unique (key, seq) — the operator's documented contract
      val changes = raw.groupBy(c => (c._1, c._4)).values.map(_.head).toSeq
      val base = (1L to 5L).map(k => (k, s"base$k", k.toInt * 10))
      val expected = {
        val latest = changes.groupBy(_._1).view
          .mapValues(_.maxBy(c => (c._4, c._5))).toMap
        val untouched = base.filterNot(b => latest.contains(b._1))
        val ups = latest.values.filter(_._5 == "u")
          .map(c => (c._1, c._2, c._3))
        (untouched ++ ups).toSet
      }
      val got = graft.pipeline.Cdc.applyChanges(
        base.toDF("id", "txt", "v"),
        changes.toDF("id", "txt", "v", "seq", "op"), "id", "seq", "op")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .toSet
      assert(got == expected, s"changes=$changes")
    }
  }

  test("property: ewma stays within each row's trailing-window value range") {
    import spark.implicits._
    val seriesGen = for {
      n <- Gen.choose(2, 20)
      vs <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
    } yield vs
    samples(seriesGen, 8).foreach { vs =>
      val k = 4
      val df = vs.zipWithIndex
        .map { case (v, i) => (1L, i.toLong * 100, i.toLong, v) }
        .toDF("k", "ts", "tie", "v")
      val got = Temporal.ewma(df, "k", "ts", "tie", "v", alpha = 0.5, k = k)
        .orderBy("tie").select("ewma").collect().map(_.getDouble(0))
      got.zipWithIndex.foreach { case (e, i) =>
        val window = vs.slice(math.max(0, i - k + 1), i + 1)
        assert(e >= window.min - 1e-6 && e <= window.max + 1e-6,
          s"ewma $e outside window [${window.min}, ${window.max}] at $i")
      }
    }
  }

  test("property: transition probabilities sum to 1 per prev_state") {
    import spark.implicits._
    val evGen = for {
      n <- Gen.choose(4, 40)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 1000L)
        e <- Gen.oneOf("a", "b", "c")
      } yield (u, t, e))
    } yield rows.zipWithIndex.map { case ((u, t, e), i) => (u, t, i.toLong, e) }
    samples(evGen, 6).foreach { rows =>
      val tm = Temporal.transitionMatrix(
        rows.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", "event_type")
      val sums = tm.groupBy("prev_state")
        .agg(org.apache.spark.sql.functions.sum("prob").as("s"))
        .collect().map(_.getDouble(1))
      sums.foreach(s => assert(math.abs(s - 1.0) < 1e-4, s"row sum $s"))
    }
  }

  test("property: shuffleShards always balances to within one row") {
    import spark.implicits._
    val genN = Gen.choose(1, 200)
    samples(genN, 6).foreach { n =>
      val shards = 1 + (n % 7)
      val sizes = graft.pipeline.Sampling.shuffleShards(
        (1L to n.toLong).map(Tuple1(_)).toDF("id"), "id", shards)
        .groupBy("shard").count().collect().map(_.getLong(1))
      assert(sizes.sum == n.toLong)
      assert(sizes.max - sizes.min <= 1, s"n=$n shards=$shards ${sizes.toSeq}")
    }
  }

  test("property: winsorizeBy output is always inside [lo, hi] and order-preserving") {
    import spark.implicits._
    val g = for {
      n <- Gen.choose(3, 30)
      vs <- Gen.listOfN(n, Gen.choose(-1e6, 1e6))
    } yield vs
    samples(g, 6).foreach { vs =>
      val df = vs.map(("g", _)).toDF("grp", "v")
      val out = graft.pipeline.Profiling.winsorizeBy(df, "v", "grp")
        .select("v", "lo", "hi", "clipped").collect()
      out.foreach { r =>
        val (lo, hi, c) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
        assert(c >= lo - 1e-6 && c <= hi + 1e-6, s"clip $c outside [$lo,$hi]")
      }
      // clipping is monotone: sorting by v then by clipped agree
      val byV = out.sortBy(_.getDouble(0)).map(_.getDouble(3)).toSeq
      assert(byV == byV.sorted, "clip broke monotonicity")
    }
  }
}
