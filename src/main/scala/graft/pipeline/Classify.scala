package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document filtering: linear classifiers over hashed
  * n-gram features — the fastText-style quality/language filter used by
  * the GPT-3 / CCNet data recipes (Brown et al. 2020 §2.2 train a
  * logistic classifier to separate curated from raw text and keep
  * high-scoring documents; Joulin et al. 2017 show linear bag-of-ngram
  * models match deep ones for this).
  *
  * Both fits produce the same artifact — a [[LinearTextModel]]: one
  * weight per hash bucket plus a bias — so SCORING is identical and
  * shuffle-free: the per-row `graft_dsir_score` kernel walks the
  * document's n-gram array, md5-buckets each gram and accumulates
  * `weights[bucket]`; the model rides into codegen as a reference
  * `double[]` (the PQ-codebook pattern). Features (lowercased unigrams
  * + bigrams, md5-prefix-hashed into `buckets` cells) are IDENTICAL to
  * [[Dsir]]'s, so the same tokenization contract and the same DuckDB
  * replayability hold: an oracle can recompute every score from SQL.
  *
  * Scale shape: fitting runs on a LABELED set — in production a bounded
  * curated sample (thousands to millions of rows), never the 100 TB raw
  * corpus; both fits keep driver state at O(buckets) doubles. Applying
  * the model to the raw corpus is ONE plain scan — zero shuffle, zero
  * join (the round-8 DSIR lesson: never featurize-explode the corpus for
  * scoring when a per-row kernel can walk the gram array in place).
  */
object Classify {

  /** The portable artifact both fits produce: score(d) = bias +
    * Σ over feature occurrences f∈d of weights[bucket(f)]. */
  case class LinearTextModel(weights: Array[Double], bias: Double,
      buckets: Int) {
    require(weights.length == buckets, "weights must have one cell per bucket")
  }

  /** 32-bit md5-prefix bucket of a feature string — the engine-portable
    * hash shared with [[Dsir]]/[[Sampling]] (DuckDB:
    * `('0x' || substr(md5(f),1,8))::BIGINT % buckets`). */
  private def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Unigrams ++ bigrams of the lowercased, whitespace-split text — one
    * definition shared by the exploded count passes and the per-row
    * scoring kernel (identical to [[Dsir]]'s featurization). */
  private def grams(textCol: String): Column =
    concat(TextAnalysis.tokens(lower(col(textCol))),
      TextAnalysis.bigrams(col(textCol)))

  /** Per-occurrence hashed feature stream: (`idCol`, `f`). */
  private def features(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol), explode_outer(grams(textCol)).as("__g"))
      .filter(col("__g").isNotNull)
      .select(col(idCol), (hash32(col("__g")) % buckets).as("f"))

  /** Multinomial Naive Bayes over hashed n-grams, closed-form:
    *
    *   weights[j] = ln (cntPos(j)+α)/(nPos+αB) − ln (cntNeg(j)+α)/(nNeg+αB)
    *   bias       = ln nDocsPos / nDocsNeg
    *
    * `labelCol` must be an integer/boolean 0-1 column on `labeled`; both
    * classes must be present. The two per-class count tables are bounded
    * at `buckets` rows each (one explode + hash-aggregate with map-side
    * partial combine — the Zipf head never skews the shuffle), collected
    * once into the O(buckets) weight LUT. */
  def fitNaiveBayes(labeled: DataFrame, textCol: String, idCol: String,
      labelCol: String, buckets: Int = 8192,
      alpha: Double = 0.5): LinearTextModel = {
    require(buckets > 0, "buckets must be positive")
    require(alpha > 0, "alpha must be positive (zero counts divide by zero)")
    // closed-form and deterministic over an unchanged labeled sample —
    // the same fit-once-serve-many discipline as k-means/PQ (FitMemo):
    // the report family (q_nb_quality/q_auc/q_confusion/q_calibration)
    // refit the identical model otherwise
    FitMemo.cached(labeled, Seq(textCol, idCol, labelCol),
      ("nb", buckets, alpha)) {
      fitNaiveBayesUncached(labeled, textCol, idCol, labelCol, buckets, alpha)
    }
  }

  private def fitNaiveBayesUncached(labeled: DataFrame, textCol: String,
      idCol: String, labelCol: String, buckets: Int,
      alpha: Double): LinearTextModel = {
    val y = col(labelCol).cast("int")
    // one pass builds BOTH class histograms: tag each occurrence with its
    // doc's label, aggregate (f, y) — ≤ 2·buckets result rows
    val tagged = labeled.select(col(idCol), y.as("__y"),
        explode_outer(grams(textCol)).as("__g"))
      .filter(col("__g").isNotNull)
      .select(col("__y"), (hash32(col("__g")) % buckets).as("f"))
      .groupBy(col("__y"), col("f")).agg(count(lit(1)).as("cnt"))
      .collect()
    val cntP = Array.fill[Long](buckets)(0L)
    val cntN = Array.fill[Long](buckets)(0L)
    tagged.foreach { r =>
      val tgt = if (r.getInt(0) == 1) cntP else cntN
      tgt(r.getLong(1).toInt) = r.getLong(2)
    }
    val docCounts = labeled.groupBy(y.as("__y")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nDocsP = docCounts.getOrElse(1, 0L)
    val nDocsN = docCounts.getOrElse(0, 0L)
    require(nDocsP > 0 && nDocsN > 0,
      s"both classes must be present (pos=$nDocsP, neg=$nDocsN)")
    val nP = cntP.sum.toDouble
    val nN = cntN.sum.toDouble
    val aB = alpha * buckets
    val w = Array.tabulate(buckets)(j =>
      math.log((cntP(j) + alpha) / (nP + aB)) -
        math.log((cntN(j) + alpha) / (nN + aB)))
    LinearTextModel(w, math.log(nDocsP.toDouble / nDocsN), buckets)
  }

  /** Binary logistic regression over hashed n-grams, full-batch gradient
    * descent from zero initialization:
    *
    *   p_d     = σ(bias + Σ_j weights[j]·c_d(j))
    *   grad_j  = (1/n) Σ_d (p_d − y_d)·c_d(j)      weights[j] −= lr·grad_j
    *   grad_b  = (1/n) Σ_d (p_d − y_d)             bias       −= lr·grad_b
    *
    * Deterministic end to end (zero init, fixed order-independent sums),
    * so a single step is replayable in closed form by a SQL oracle
    * (σ(0) = ½ ⇒ weights[j] = lr/n·Σ_d (y_d−½)·c_d(j) after iteration 1).
    *
    * The labeled set is featurized ONCE into per-document sparse bucket
    * histograms and cached; each iteration is one `treeAggregate` whose
    * task state is O(buckets) doubles — model-fit driver state, like a
    * k-means codebook. The fit input is a bounded curated sample by
    * design; the 100 TB corpus only ever sees the scoring kernel. */
  def fitLogReg(labeled: DataFrame, textCol: String, idCol: String,
      labelCol: String, buckets: Int = 8192, lr: Double = 0.5,
      iters: Int = 50): LinearTextModel = {
    require(buckets > 0, "buckets must be positive")
    require(iters > 0, "iters must be positive")
    // deterministic end to end (zero init, order-independent per-bucket
    // sums) — memoized like the other deterministic fits (FitMemo)
    FitMemo.cached(labeled, Seq(textCol, idCol, labelCol),
      ("logreg", buckets, lr, iters)) {
      fitLogRegUncached(labeled, textCol, idCol, labelCol, buckets, lr, iters)
    }
  }

  private def fitLogRegUncached(labeled: DataFrame, textCol: String,
      idCol: String, labelCol: String, buckets: Int, lr: Double,
      iters: Int): LinearTextModel = {
    val spark = labeled.sparkSession
    // (y, sparse histogram) per doc: explode + per-doc count map. The
    // groupBy is keyed by the LABELED SAMPLE's ids — bounded by the
    // sample, not the corpus.
    val docFeats = labeled
      .select(col(idCol).as("__id"), col(labelCol).cast("double").as("__y"),
        explode_outer(grams(textCol)).as("__g"))
      .filter(col("__g").isNotNull)
      .select(col("__id"), col("__y"), (hash32(col("__g")) % buckets).as("f"))
      .groupBy(col("__id"), col("__y"), col("f"))
      .agg(count(lit(1)).cast("double").as("c"))
      .groupBy(col("__id"), col("__y"))
      .agg(collect_list(struct(col("f"), col("c"))).as("fc"))
    val rdd = docFeats.select(col("__y"), col("fc")).rdd.map { row =>
      val y = row.getDouble(0)
      val fc = row.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getLong(0).toInt, r.getDouble(1))).toArray
      (y, fc)
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = rdd.count().toDouble
    require(n > 0, "labeled sample is empty")
    var w = Array.fill(buckets)(0.0)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val wB = spark.sparkContext.broadcast(w)
      val bias = b
      val (gradW, gradB) = rdd.treeAggregate(
        (Array.fill(buckets)(0.0), 0.0))(
        seqOp = { case ((gw, gb), (y, fc)) =>
          var s = bias
          var i = 0
          while (i < fc.length) { s += wB.value(fc(i)._1) * fc(i)._2; i += 1 }
          val r = 1.0 / (1.0 + math.exp(-s)) - y
          i = 0
          while (i < fc.length) { gw(fc(i)._1) += r * fc(i)._2; i += 1 }
          (gw, gb + r)
        },
        combOp = { case ((g1, b1), (g2, b2)) =>
          var i = 0
          while (i < buckets) { g1(i) += g2(i); i += 1 }
          (g1, b1 + b2)
        })
      w = Array.tabulate(buckets)(j => w(j) - lr * gradW(j) / n)
      b = b - lr * gradB / n
      wB.destroy()
      it += 1
    }
    rdd.unpersist(blocking = false)
    LinearTextModel(w, b, buckets)
  }

  /** Persist a fitted model: the production cadence is fit-once on the
    * curated sample, score every nightly corpus batch — the artifact
    * must outlive the session (the KMeans/PQ-codebook pattern). Weights
    * store as (bucket, weight) rows, bias/buckets in a 1-row meta
    * table. */
  def writeModel(model: LinearTextModel, path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.weights.zipWithIndex.map { case (w, i) => (i, w) }.toSeq
      .toDF("bucket", "weight")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/weights")
    Seq((model.bias, model.buckets)).toDF("bias", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Reload a persisted model — bucket order restored from the stored
    * index, so scores from a reloaded model are bit-identical to the
    * fitting session's. O(buckets) driver state, same as fitting. */
  def readModel(spark: org.apache.spark.sql.SparkSession,
      path: String): LinearTextModel = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val buckets = meta.getInt(1)
    val w = Array.fill(buckets)(0.0)
    spark.read.parquet(s"$path/weights").collect()
      .foreach(r => w(r.getInt(0)) = r.getDouble(1))
    LinearTextModel(w, meta.getDouble(0), buckets)
  }

  /** Score every document under a fitted model — ONE shuffle-free corpus
    * scan through the `graft_dsir_score` kernel. Output: (`idCol`,
    * `n_feats`, `score` = bias + Σ weights[bucket], half-up 6,
    * `pred` = 1 if score > 0). Feature-less documents (empty text) score
    * the bare bias. */
  def score(df: DataFrame, textCol: String, idCol: String,
      model: LinearTextModel): DataFrame =
    withScore(df, textCol, model).select(
      col(idCol), col("n_feats"), col("score"), col("pred"))

  /** ROC-AUC of a score column against binary labels — the
    * Mann–Whitney rank statistic with average-rank tie correction:
    *
    *   AUC = (Σ R̄_pos − nP(nP+1)/2) / (nP·nN)
    *
    * where R̄ is the AVERAGE rank within a tied score group (rank-order
    * inside a tie is partition-arbitrary; averaging removes it, so the
    * result is deterministic and engine-portable). One row: (`n_pos`,
    * `n_neg`, `auc`), half-up 6; null AUC when a class is absent.
    *
    * EAGER: unlike the other report operators this executes at CALL time
    * (one range exchange + one fold job) and returns the one-row result
    * as a LocalRelation — callers must not expect a lazy plan. The score
    * column is compared as DOUBLE (a decimal score must not carry more
    * distinct values than double can hold) and a row counts as positive
    * iff `labelCol` casts to int 1, negative for any other non-null
    * label — labels are expected to be {0, 1}.
    *
    * Ranks come from a range-partition by score — never a
    * single-partition window; per-partition Mann–Whitney folds combine
    * through a segment-merging treeAggregate (exact half-integer
    * arithmetic, so association order cannot change the result), and
    * the driver touches O(segments) scalars, not O(#partitions) rows
    * (r15 verdict item 9: at 10⁵+ range partitions the un-tree'd
    * collect + single-threaded fold was the residual driver cost). */
  def aucScore(scored: DataFrame, scoreCol: String, labelCol: String,
      idCol: String): DataFrame = {
    // One range exchange, one pass (r15 optimization round, guide
    // §1.2/§2.4): the former global-rank + tie-window shape executed the
    // scored subtree FOUR times per run (the two-pass rank's counts job
    // and main job, each with its own range-sampling pass) through two
    // exchanges. The Mann–Whitney statistic only needs, per tied score
    // group, the group size m, its positive count g, and the count of
    // rows below it: tie-averaged rank = below + (m+1)/2. Range-partition
    // by score (equal scores land in one partition by the partitioner's
    // binary search), sort within, and fold each partition to four
    // numbers — (rows, positives, negatives, Σ g·(localBelow+(m+1)/2)) —
    // then combine on the driver with per-partition rank offsets:
    // offset_p multiplies every positive in p, so Σ R̄_pos =
    // Σ_p (localSum_p + offset_p·npos_p). Every intermediate is an exact
    // integer or half-integer (≤ 2⁵³), so the result is bit-identical to
    // the old window/aggregate arithmetic, including the final single
    // IEEE division and the halfUp(6). Nulls: a null score is its own
    // tie group (sorts first, as before); a null label occupies a rank
    // but joins neither class (sum semantics of the old aggregate).
    val spark = scored.sparkSession
    val sorted = scored
      .select(col(scoreCol).cast("double").as("__sc"),
        col(labelCol).cast("int").as("__y"))
      .repartitionByRange(col("__sc"))
      .sortWithinPartitions(col("__sc"))
    implicit val enc = org.apache.spark.sql.Encoders
      .tuple(org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble)
    val parts = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cnt = 0L; var npos = 0L; var nneg = 0L; var lsum = 0.0
      var base = 0L; var gm = 0L; var gp = 0L
      var has = false; var prevNull = false; var prev = 0.0
      def flush(): Unit = if (gm > 0) {
        lsum += gp * (base + (gm + 1) / 2.0)
        base += gm; gm = 0L; gp = 0L
      }
      it.foreach { r =>
        val isN = r.isNullAt(0)
        val v = if (isN) 0.0 else r.getDouble(0)
        if (!has || isN != prevNull ||
          (!isN && java.lang.Double.compare(prev, v) != 0)) flush()
        has = true; prevNull = isN; prev = v
        gm += 1; cnt += 1
        if (!r.isNullAt(1)) {
          val y = r.getInt(1)
          if (y == 1) { npos += 1; gp += 1 } else nneg += 1
        }
      }
      flush()
      Iterator.single((pid, cnt, npos, nneg, lsum))
    }
    // Tree combine over CONTIGUOUS partition-id segments: two adjacent
    // runs L (all ranks before) and R merge exactly — every positive in
    // R shifts up by L's row count, so srp = srp_L + srp_R + cnt_L·npos_R.
    // Non-adjacent runs stay separate until their gap arrives, so the
    // combine is associative AND commutative over the segment lists and
    // every intermediate stays an exact integer/half-integer ≤ 2⁵³ —
    // bit-identical to the sequential left fold it replaces.
    // scale-adaptive combine: below a few hundred partitions the tree
    // level is a pure extra shuffle round (measured: 0.57 → 0.69 s at 32
    // partitions), so small fan-ins fold the collected tuples through
    // the SAME segment code on the driver; at 10⁵+ range partitions the
    // treeAggregate keeps the driver at O(segments).
    // partition-count proxy WITHOUT touching .rdd on the lazy plan
    // (materializing the RDD's partition array would run the range
    // sampler as its own job): repartitionByRange targets the session's
    // shuffle partition count, which is exactly the fan-in the combine
    // must absorb.
    val segs =
      if (spark.sessionState.conf.numShufflePartitions <= 256)
        parts.collect().foldLeft(List.empty[AucSeg])((acc, e) =>
          insertAucSeg(acc, AucSeg(e._1, e._1, e._2, e._3, e._4, e._5)))
      else parts.rdd.treeAggregate(List.empty[AucSeg])(
        (acc, e) => insertAucSeg(acc,
          AucSeg(e._1, e._1, e._2, e._3, e._4, e._5)),
        (a, b) => b.foldLeft(a)(insertAucSeg), depth = 2)
    var offset = 0L; var srp = 0.0
    var nP = 0L; var nN = 0L
    segs.sortBy(_.start).foreach { s =>
      srp += s.srp + offset.toDouble * s.npos
      offset += s.cnt
      nP += s.npos; nN += s.nneg
    }
    val anyLabel = nP + nN > 0
    // replay the old aggregate's null shape: sum() over zero (non-null)
    // inputs is null, and the auc guard is n_pos > 0 && n_neg > 0
    val auc: java.lang.Double =
      if (nP > 0 && nN > 0) {
        val raw = (srp - nP.toDouble * (nP + 1) / 2) / (nP.toDouble * nN)
        java.lang.Double.valueOf(math.floor(raw * 1e6 + 0.5) / 1e6)
      } else null
    val nPosOut: java.lang.Long = if (anyLabel) java.lang.Long.valueOf(nP) else null
    val nNegOut: java.lang.Long = if (anyLabel) java.lang.Long.valueOf(nN) else null
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(nPosOut, nNegOut, auc)),
      StructType(Seq(StructField("n_pos", LongType), StructField("n_neg", LongType),
        StructField("auc", DoubleType))))
  }

  /** A contiguous run of [[aucScore]] range-partition ids already folded
    * together: row/class counts plus the run's internal Σ tie-averaged
    * positive ranks (ranks counted from the run's own first row). */
  private[graft] final case class AucSeg(start: Int, end: Int,
      cnt: Long, npos: Long, nneg: Long, srp: Double)

  /** Insert `s` into a sorted disjoint segment list, merging with any
    * touching neighbour (`end + 1 == start`). Partition ids are unique,
    * so segments never overlap. */
  private[graft] def insertAucSeg(acc: List[AucSeg],
      s: AucSeg): List[AucSeg] = {
    def merge(l: AucSeg, r: AucSeg): AucSeg =
      AucSeg(l.start, r.end, l.cnt + r.cnt, l.npos + r.npos,
        l.nneg + r.nneg, l.srp + r.srp + l.cnt.toDouble * r.npos)
    val (before, after) = acc.span(_.end < s.start)
    var pre = before
    var mid = s
    var post = after
    if (pre.nonEmpty && pre.last.end + 1 == mid.start) {
      mid = merge(pre.last, mid); pre = pre.init
    }
    if (post.nonEmpty && mid.end + 1 == post.head.start) {
      mid = merge(mid, post.head); post = post.tail
    }
    pre ::: (mid :: post)
  }

  /** Confusion matrix + the derived rates at a decision threshold on
    * the score: one row (`tp`, `fp`, `fn`, `tn`, `accuracy`,
    * `precision`, `recall`, `f1`), half-up 6, rate null when its
    * denominator is empty (no predicted positives / no actual
    * positives). One conditional-count aggregate over the scored
    * corpus. */
  def confusionReport(scored: DataFrame, scoreCol: String,
      labelCol: String, threshold: Double = 0.0): DataFrame = {
    val pos = col(scoreCol) > threshold
    val y = col(labelCol).cast("int") === 1
    val agg = scored.agg(
      count(when(pos && y, 1)).as("tp"),
      count(when(pos && !y, 1)).as("fp"),
      count(when(!pos && y, 1)).as("fn"),
      count(when(!pos && !y, 1)).as("tn"))
    val prec = when(col("tp") + col("fp") > 0,
      col("tp").cast("double") / (col("tp") + col("fp")))
    val rec = when(col("tp") + col("fn") > 0,
      col("tp").cast("double") / (col("tp") + col("fn")))
    agg.select(col("tp"), col("fp"), col("fn"), col("tn"),
      Rounding.halfUp((col("tp") + col("tn")).cast("double") /
        (col("tp") + col("fp") + col("fn") + col("tn")), 6).as("accuracy"),
      Rounding.halfUp(prec, 6).as("precision"),
      Rounding.halfUp(rec, 6).as("recall"),
      Rounding.halfUp(when(prec + rec > 0,
        lit(2.0) * prec * rec / (prec + rec)), 6).as("f1"))
  }

  /** Reliability diagram data: bucket predicted probabilities
    * (σ(score)) into `bins` equal-width bins and report each bin's mean
    * predicted probability against its empirical positive rate — the
    * calibration check that tells you whether a 0.9 from this model
    * means 90%. Output per non-empty bin: (`bin`, `n`, `mean_prob`,
    * `frac_pos`), half-up 6. One scan + one hash aggregate on the bin
    * index. */
  def calibrationReport(scored: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    // probabilities round to 6dp BEFORE binning: a last-ulp exp()
    // difference between engines must not flip a boundary bin
    val p = Rounding.halfUp(
      lit(1.0) / (lit(1.0) + exp(-col(scoreCol))), 6)
    val bin = least(floor(p * bins), lit(bins - 1)).cast("int")
    scored.select(bin.as("bin"), p.as("__p"),
        col(labelCol).cast("double").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        Rounding.halfUp(avg(col("__p")), 6).as("mean_prob"),
        Rounding.halfUp(avg(col("__y")), 6).as("frac_pos"))
  }

  /** [[score]] as a column APPEND (all input columns preserved, plus
    * `n_feats`/`score`/`pred`) — still a stateless per-row projection,
    * which makes it directly usable on an unbounded stream
    * ([[graft.streaming.DocStream.scoreStream]]): a join-back of the
    * projected [[score]] would be a stream-stream join Structured
    * Streaming rejects. */
  def withScore(df: DataFrame, textCol: String,
      model: LinearTextModel): DataFrame =
    df.withColumn("__s", org.apache.spark.sql.graft.sketch
        .dsir_score(grams(textCol), model.weights, model.buckets))
      .withColumn("n_feats", coalesce(col("__s.n_feats"), lit(0L)))
      .withColumn("score",
        Rounding.halfUp(coalesce(col("__s.iw"), lit(0.0)) + model.bias, 6))
      .withColumn("pred", (col("score") > 0).cast("int"))
      .drop("__s")
}
