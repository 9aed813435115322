package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Search

class SearchSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "spark shuffle hash join build side"),
      (2L, "merge sort merge join spills to disk"),
      (3L, "broadcast hash join avoids the shuffle"),
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "spark spark spark hash")
    ).toDF("id", "text")
  }

  /** Reference BM25 computed independently (plain Scala). */
  private def expected(query: Seq[String], k1: Double = 1.2, b: Double = 0.75)
  : Map[Long, Double] = {
    val toks = Map(
      1L -> "spark shuffle hash join build side",
      2L -> "merge sort merge join spills to disk",
      3L -> "broadcast hash join avoids the shuffle",
      4L -> "the quick brown fox jumps over the lazy dog",
      5L -> "spark spark spark hash"
    ).view.mapValues(_.split("\\s+").toSeq).toMap
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    toks.map { case (id, tk) =>
      val dl = tk.size.toDouble
      val s = query.map { t =>
        val tf = tk.count(_ == t).toDouble
        val dft = toks.values.count(_.contains(t)).toDouble
        val idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
        idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      }.sum
      id -> math.floor(s * 1e6 + 0.5) / 1e6
    }
  }

  test("bm25 scores match an independent implementation") {
    val q = Seq("spark", "hash")
    val got = Search.bm25ScoreAll(docs, "text", "id", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp = expected(q)
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - exp(id)) < 1e-9, s"doc $id: $s vs ${exp(id)}")
    }
  }

  test("topK ranks by score desc with id tiebreak and drops non-matches") {
    val out = Search.bm25TopK(docs, "text", "id", Seq("spark", "hash"), k = 10)
      .collect().map(_.getLong(0))
    // doc 4 contains neither term → excluded even though k admits it
    assert(!out.contains(4L))
    val exp = expected(Seq("spark", "hash"))
    val want = exp.filter(_._2 > 0).toSeq
      .sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert(out.toSeq == want)
  }

  test("repeated query terms are deduplicated, not double-counted") {
    val once = Search.bm25ScoreAll(docs, "text", "id", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val twice = Search.bm25ScoreAll(docs, "text", "id", Seq("spark", "SPARK"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(once == twice)
  }

  test("plan: no shuffle of document rows; top-k is TakeOrdered") {
    val plan = Search.bm25TopK(docs, "text", "id", Seq("spark"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the only exchange feeds the 1-row stats aggregate (plus its
    // broadcast); document rows themselves must not hash-partition
    assert(!plan.contains("hashpartitioning(id"), plan)
  }

  test("text index probe is bit-identical to raw-text BM25 and prunes partitions") {
    val d = sf("documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_tidx").toString
    try {
      Search.buildTextIndex(d, "text", "doc_id", dir, buckets = 16)
      val q = Seq("spark", "hash", "merge")
      val fromIdx = Search.probeTextIndex(spark, dir, q, k = 50)
      val fromText = Search.bm25TopK(d, "text", "doc_id", q, k = 50)
      val a = fromIdx.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = fromText.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a == b, s"index diverges from raw scoring:\n$a\nvs\n$b")
      // the postings scan must push the bucket filter to PARTITION level
      val plan = fromIdx.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") &&
        plan.contains("bkt"), s"no partition pruning:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("appended index serves identically to a fresh full build") {
    import org.apache.spark.sql.functions.col
    val d = sf("documents")
    val dirA = java.nio.file.Files.createTempDirectory("graft_tidxA").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_tidxB").toString
    try {
      Search.buildTextIndex(d, "text", "doc_id", dirA, buckets = 16)
      Search.buildTextIndex(d.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", dirB, buckets = 16)
      Search.appendTextIndex(d.filter(col("doc_id") % 2 =!= 0),
        "text", "doc_id", dirB)
      val q = Seq("spark", "hash", "merge")
      val full = Search.probeTextIndex(spark, dirA, q, k = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val appended = Search.probeTextIndex(spark, dirB, q, k = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(appended == full, s"append diverges:\n$appended\nvs\n$full")
    } finally {
      Seq(dirA, dirB).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
    }
  }

  test("rrfFuse combines ranks; shared docs beat single-list leaders") {
    import spark.implicits._
    // doc 5 is rank 2 in BOTH lists → rrf 2/62 > doc 1's 1/61 (rank 1 in
    // one list only)
    val l1 = Seq((1L, 1), (5L, 2), (7L, 3)).toDF("id", "rn")
    val l2 = Seq((9L, 1), (5L, 2), (7L, 4)).toDF("id", "rn")
    val got = Search.rrfFuse(Seq(l1, l2), "id", c = 60, k = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(got.head._1 == 5L && got.head._2 == r6(2.0 / 62) &&
      got.head._3 == 2L)
    assert(got(1)._1 == 7L) // 1/63 + 1/64 > 1/61
    assert(got.map(_._1).toSeq == Seq(5L, 7L, 1L, 9L))
    // 1 and 9 tie at 1/61 → id tie-break orders them
    assert(got(2)._2 == got(3)._2)
  }

  test("rankBiasedOverlap: identical lists hit 1-p^k, disjoint hit 0") {
    import spark.implicits._
    val l1 = (1L to 20L).zipWithIndex.map { case (id, i) => (id, i + 1) }
      .toDF("id", "rn")
    val same = Search.rankBiasedOverlap(l1, l1, "id", p = 0.9, k = 20)
      .collect().head.getDouble(0)
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(same == r6(1.0 - math.pow(0.9, 20)), s"identical lists: $same")
    val l2 = (101L to 120L).zipWithIndex.map { case (id, i) => (id, i + 1) }
      .toDF("id", "rn")
    assert(Search.rankBiasedOverlap(l1, l2, "id", 0.9, 20)
      .collect().head.getDouble(0) == 0.0)
    // hand case: lists agree only on the top-1 item
    val l3 = (Seq((1L, 1)) ++ (201L to 219L).zipWithIndex.map {
      case (id, i) => (id, i + 2) }).toDF("id", "rn")
    val top1 = Search.rankBiasedOverlap(l1, l3, "id", 0.9, 20)
      .collect().head.getDouble(0)
    val expected = (1 to 20).map(d => 0.1 * math.pow(0.9, d - 1) / d).sum
    assert(math.abs(top1 - expected) < 1e-6, s"top-1 case: $top1")
  }

  test("topTfidfTerms ranks rare terms first and tie-breaks by term") {
    import spark.implicits._
    val d = Seq(
      (1L, "apple apple banana shared"),
      (2L, "banana cherry shared"),
      (3L, "cherry durian shared")).toDF("id", "text")
    val got = Search.topTfidfTerms(d, "text", "id", k = 2)
      .collect().map(r =>
        (r.getLong(0), r.getInt(3)) -> r.getString(1)).toMap
    // doc1: apple 2·ln3 > banana ln1.5; doc2: banana/cherry tie at
    // ln1.5 → lexicographic; doc3: durian ln3 > cherry ln1.5
    assert(got == Map(
      (1L, 1) -> "apple", (1L, 2) -> "banana",
      (2L, 1) -> "banana", (2L, 2) -> "cherry",
      (3L, 1) -> "durian", (3L, 2) -> "cherry"))
  }

  test("topTfidfTerms weight matches the closed form") {
    import spark.implicits._
    val d = Seq(
      (1L, "apple apple banana shared"),
      (2L, "banana cherry shared"),
      (3L, "cherry durian shared")).toDF("id", "text")
    val w = Search.topTfidfTerms(d, "text", "id", k = 2)
      .filter(col("id") === 1 && col("term") === "apple")
      .select("weight").collect().head.getDouble(0)
    assert(w == math.floor(2 * math.log(3.0) * 1e6 + 0.5) / 1e6)
  }

  test("topTfidfTerms plan prunes per-doc groups before the full sort") {
    val plan = Search.topTfidfTerms(docs, "text", "id", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
