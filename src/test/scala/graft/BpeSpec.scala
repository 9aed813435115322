package graft

import graft.pipeline.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // word frequencies: hug×10, pug×5, pun×12, bun×4, hugs×5 — pair
  // counts are then (u,g)=20, (p,u)=17, (u,n)=16, (h,u)=15, (g,s)=5,
  // (b,u)=4, so the merge order is hand-computable
  private def corpus = (
    Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
    Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("id", "text")

  test("learn recovers the hand-computed merge order") {
    val model = Bpe.learn(corpus, "text", numMerges = 4)
    // (u,g)20 → ug; then (u,n)16 → un; then (h,ug)15 → hug; (p,un)12
    assert(model.merges == IndexedSeq(
      ("u", "g"), ("u", "n"), ("h", "ug"), ("p", "un")),
      model.merges.toString)
  }

  test("learn is deterministic under repartitioning and stops when dry") {
    val a = Bpe.learn(corpus, "text", numMerges = 4).merges
    val b = Bpe.learn(corpus.repartition(7), "text", numMerges = 4).merges
    assert(a == b)
    // asking for more merges than the vocabulary supports stops early
    // rather than looping: every surviving pair occurs at least twice
    val big = Bpe.learn(corpus, "text", numMerges = 1000)
    assert(big.merges.size < 1000)
    assert(big.merges.take(4) == a)
  }

  test("segment applies merges greedily by rank, per word") {
    val model = Bpe.learn(corpus, "text", numMerges = 4)
    val seg = Seq((1L, "hugs bun PUG unseen"))
      .toDF("id", "text")
      .select(Bpe.segment(col("text"), model).as("t"))
      .head().getSeq[String](0)
    // hugs → hug+s, bun → b+un, pug (case-folded) → p+ug,
    // unseen → un+s+e+e+n (only (u,n) applies)
    assert(seg == Seq("hug", "s", "b", "un", "p", "ug", "un", "s", "e", "e", "n"),
      seg.toString)
    val n = Seq((1L, "hugs bun"))
      .toDF("id", "text")
      .select(Bpe.tokenCount(col("text"), model)).head().getInt(0)
    assert(n == 4)
  }

  test("segment stays inside whole-stage codegen") {
    val model = Bpe.learn(corpus, "text", numMerges = 4)
    val df = sf("documents")
      .select(Bpe.segment(col("text"), model).alias("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("model persists and reloads identically") {
    val model = Bpe.learn(corpus, "text", numMerges = 4)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_spec")
    try {
      Bpe.writeModel(model, s"$tmp/m", spark)
      val back = Bpe.readModel(spark, s"$tmp/m")
      assert(back.merges == model.merges)
      val s1 = corpus.select(Bpe.segment(col("text"), model).as("t"))
        .collect().map(_.getSeq[String](0))
      val s2 = corpus.select(Bpe.segment(col("text"), back).as("t"))
        .collect().map(_.getSeq[String](0))
      assert(s1.toSeq == s2.toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("astral code points segment as single symbols") {
    val model = Bpe.BpeModel(IndexedSeq(("😀", "😀")))
    val seg = Seq((1L, "😀😀x"))
      .toDF("id", "text")
      .select(Bpe.segment(col("text"), model).as("t"))
      .head().getSeq[String](0)
    assert(seg == Seq("😀😀", "x"), seg.toString)
  }

  test("fertility: merge-covered group approaches 1, uncovered group stays high") {
    import spark.implicits._
    // group a repeats one word (merges learn it fully → fertility → 1);
    // group b is unique long words the 'a'-dominated merge table cannot
    // compress as well
    val docs = ((1L to 20L).map(i => (i, "hello hello hello", "a")) ++
      (21L to 25L).map(i => (i, s"xylophone$i quixotic$i", "b")))
      .toDF("id", "text", "grp")
    val model = Bpe.learn(docs, "text", numMerges = 60)
    val got = Bpe.fertilityByGroup(docs, "text", "grp", model)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getInt(3))).toMap
    assert(got("a")._1 == 20L && got("b")._1 == 5L)
    assert(got("a")._2 == 1.0, s"covered group fertility ${got("a")._2}")
    assert(got("b")._2 >= 2.0, s"uncovered group fertility ${got("b")._2}")
    assert(got("a")._3 == 1 && got("b")._3 == 1, "bounds gate must hold")
  }
}
