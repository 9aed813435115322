package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Cross-document boilerplate line removal (the CCNet/C4 recipe):
  * frequency semantics (DISTINCT docs, not occurrences), order
  * preservation, whitespace immunity, row retention, and the explicit
  * broadcast probe shape. */
class BoilerplateSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("lines in >= minDocs distinct docs are dropped; unique lines survive in order") {
    val d = docs(
      1L -> "alpha one\nsubscribe now\nbody of doc one\nfooter 2026",
      2L -> "beta two\nsubscribe now\nbody of doc two\nfooter 2026",
      3L -> "gamma three\nsubscribe now\nbody of doc three\nfooter 2026")
    val out = Dedup.dropBoilerplateLines(d, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq(
      "alpha one\nbody of doc one",
      "beta two\nbody of doc two",
      "gamma three\nbody of doc three"))
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 2L, 2L)) // n_kept
    assert(out.map(_.getLong(3)).toSeq == Seq(2L, 2L, 2L)) // n_dropped
  }

  test("frequency counts DISTINCT docs: within-doc repetition never flags a line") {
    val d = docs(
      1L -> "echo echo line\necho echo line\necho echo line\nunique a",
      2L -> "unique b",
      3L -> "unique c")
    val out = Dedup.dropBoilerplateLines(d, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").collect()
    // 'echo echo line' appears 3x but only in doc 1 → kept, all of them
    assert(out.head.getString(1) ==
      "echo echo line\necho echo line\necho echo line\nunique a")
    assert(out.forall(_.getLong(3) == 0L))
  }

  test("whitespace-only lines are structure: never dropped, however common") {
    val d = docs(
      1L -> "a\n  \nx tail", 2L -> "b\n  \ny tail", 3L -> "c\n  \nz tail")
    val out = Dedup.dropBoilerplateLines(d, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq("a\n  \nx tail", "b\n  \ny tail", "c\n  \nz tail"))
  }

  test("comparison trims, reconstruction keeps the original line verbatim") {
    val d = docs(
      1L -> "  promo line  \nkeep one",
      2L -> "promo line\nkeep two",
      3L -> "\tpromo line\nkeep three")
    val out = Dedup.dropBoilerplateLines(d, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").collect()
    // all three spellings trim to the same key → all dropped
    assert(out.map(_.getString(1)).toSeq ==
      Seq("keep one", "keep two", "keep three"))
  }

  test("a doc whose every line is boilerplate survives with empty text") {
    val d = docs(
      1L -> "promo\nfooter", 2L -> "promo\nfooter", 3L -> "promo\nfooter",
      4L -> "promo\nreal content here")
    val out = Dedup.dropBoilerplateLines(d, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    assert(out(0).getString(1) == "" && out(0).getLong(2) == 0L)
    assert(out(3).getString(1) == "real content here")
  }

  test("broadcastBad=false returns the identical result") {
    val d = docs(
      1L -> "common\nu1", 2L -> "common\nu2", 3L -> "common\nu3")
    val a = Dedup.dropBoilerplateLines(d, "doc_id", "text", 2)
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.dropBoilerplateLines(d, "doc_id", "text", 2,
      broadcastBad = false).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("result is partitioning-independent") {
    val d = docs((1L to 40L).map(i =>
      i -> s"shared header\nbody $i\n${if (i % 2 == 0) "even footer" else s"odd $i"}"): _*)
    val a = Dedup.dropBoilerplateLines(d, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.dropBoilerplateLines(d.repartition(7), "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("the bad-line probe is an explicit broadcast join by default") {
    val d = docs(1L -> "x\na", 2L -> "x\nb", 3L -> "x\nc")
    val plan = Dedup.dropBoilerplateLines(d, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }
}
