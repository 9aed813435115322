package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair encoding (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016):
  * learn a merge table from the corpus's own word frequencies, then
  * segment and count subword tokens with it — real learned tokenization
  * for chunking/packing budgets instead of the whitespace/regex
  * heuristics.
  *
  * Scale shape: the fit consumes the WORD-FREQUENCY table, not the
  * corpus — one explode + hash-aggregate with map-side combine (the
  * Zipf head collapses mapper-side), truncated to the `maxWords` most
  * frequent words before the driver loop, so driver state is bounded
  * like a k-means/PQ model fit regardless of corpus size. The merge
  * loop is pure driver work over that bounded vocabulary. Application
  * is a per-row codegen'd expression whose rank table rides as a
  * reference object — zero shuffle, corpus scanned once per use. */
object Bpe {

  /** Ordered merge list; rank = position. */
  case class BpeModel(merges: IndexedSeq[(String, String)]) {
    /** Pair → rank, keyed `left + " " + right` (symbols are drawn from
      * whitespace-split words, so the space never collides). */
    @transient lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        m.put(a + " " + b, Integer.valueOf(i))
      }
      m
    }
  }

  /** Learn `numMerges` BPE merges from the corpus. Each iteration
    * merges the most frequent adjacent symbol pair (ties broken by the
    * lexicographically smallest pair — deterministic across runs and
    * partitionings); words start as code-point symbols, no end-of-word
    * marker (this tokenizer serves in-engine counting/packing, not
    * round-trip detokenization). Stops early when no pair repeats. */
  def learn(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 65536): BpeModel = {
    require(numMerges > 0, "numMerges must be positive")
    require(maxWords > 0, "maxWords must be positive")
    val wordCounts = df
      .select(explode_outer(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .filter(col("w").isNotNull && col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var vocab: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val cc = Character.charCount(cp)
        syms += w.substring(i, i + cc)
        i += cc
      }
      (syms.toArray, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) exhausted = true
      else {
        val best = candidates.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var k = 0
            while (k < syms.length) {
              if (k < syms.length - 1 && syms(k) == best._1 &&
                  syms(k + 1) == best._2) {
                out += syms(k) + syms(k + 1); k += 2
              } else { out += syms(k); k += 1 }
            }
            (out.toArray, c)
          }
        }
        iter += 1
      }
    }
    BpeModel(merges.toIndexedSeq)
  }

  /** Subword tokens of the whole text, words segmented independently —
    * one codegen'd pass, zero shuffle. */
  def segment(text: Column, model: BpeModel): Column =
    org.apache.spark.sql.graft.sketch.bpe_segment(text, model.ranks)

  /** Learned-tokenizer token count — drop-in for packing/chunk budgets. */
  def tokenCount(text: Column, model: BpeModel): Column =
    size(segment(text, model))

  /** Persist the merge table (rank-ordered); bounded, like a codebook. */
  /** Tokenizer fertility report per group: mean subwords-per-word under
    * `model`, with the certifying bounds gate. Fertility is THE
    * tokenizer-fit diagnostic per language/source — a language averaging
    * 3+ subwords per word is under-served by the learned merges (its
    * token budget buys 3× less text). Output per group: `n_docs`,
    * `fertility` (half-up 6, docs with ≥1 word), `fertility_ok` —
    * 1 ≤ fertility ≤ mean word length in non-space chars, the lossless-
    * partition invariant aggregated (oracle-replayable even though the
    * merge table itself is not SQL-expressible). One codegen'd scan +
    * one hash aggregate on the group key. */
  def fertilityByGroup(df: DataFrame, textCol: String, groupCol: String,
      model: BpeModel): DataFrame = {
    val nWords = size(TextAnalysis.tokens(lower(col(textCol)))).cast("double")
    val nSub = tokenCount(col(textCol), model).cast("double")
    val nonspace = length(regexp_replace(lower(trim(col(textCol))),
      "\\s+", "")).cast("double")
    val hasWords = nWords > 0 && length(trim(col(textCol))) > 0
    df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      Rounding.halfUp(avg(when(hasWords, nSub / nWords)), 6).as("fertility"),
      min(when(hasWords, (nSub >= nWords && nSub <= nonspace).cast("int"))
        .otherwise(lit(1))).as("fertility_ok"))
  }

  def writeModel(model: BpeModel, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }.toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a persisted merge table; rank order restored from storage,
    * so a reloaded model segments identically to the fitting session. */
  def readModel(spark: SparkSession, path: String): BpeModel =
    BpeModel(spark.read.parquet(path)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).map(t => (t._2, t._3)).toIndexedSeq)
}
