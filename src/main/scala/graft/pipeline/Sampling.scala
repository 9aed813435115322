package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * Instead of RNG state (irreproducible across runs, engines, and
  * partitionings), a row is kept iff the md5 of its key falls below a
  * threshold: `substr(md5(key), 1, 8) < hex(rate * 2^32)`. Lowercase hex
  * strings compare in numeric order, so the filter is a plain string
  * comparison — a codegen'd, shuffle-free, pushdown-friendly map-side
  * predicate that selects the SAME rows on any engine with md5 (the
  * DuckDB oracle runs the identical expression). Sampling stays stable
  * under repartitioning and incremental reruns — the properties that
  * matter when the input is 100 TB and the pipeline reruns nightly. */
object Sampling {

  /** Hex threshold string for a rate in [0, 1]: rate-fraction of the
    * 32-bit md5-prefix space. */
  private[graft] def hexThreshold(rate: Double): String = {
    val clamped = math.max(0.0, math.min(1.0, rate))
    val bound = math.round(clamped * 4294967296.0) // 2^32
    if (bound >= 4294967296L) "ffffffffg" // sorts after every hex digit
    else f"$bound%08x"
  }

  private def keyHash(keyCol: Column): Column =
    substring(md5(keyCol.cast("string")), 1, 8)

  /** Keep ~`rate` of rows, chosen deterministically by `keyCol`. */
  def deterministicSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(keyHash(col(keyCol)) < lit(hexThreshold(rate)))

  /** Per-stratum rates (e.g. downsample dominant languages, keep the
    * tail): strata not in `rates` use `defaultRate`. One codegen'd CASE —
    * still no shuffle, no RNG. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(
      when(lit(false), lit(""))) { case (acc, (stratum, rate)) =>
      acc.when(col(strataCol) === stratum, lit(hexThreshold(rate)))
    }.otherwise(lit(hexThreshold(defaultRate)))
    df.filter(keyHash(col(keyCol)) < threshold)
  }

  /** Weighted sample WITHOUT replacement of `k` rows (Efraimidis–
    * Spirakis A-Res): each row draws its uniform u from the md5 of its
    * key — u = (hash32 + 0.5) / 2^32, never exactly 0 — and scores
    * u^(1/weight); the k largest scores win, so selection probability
    * rises with weight while staying deterministic (same key, same
    * fate) and engine-portable (the oracle replays the identical
    * arithmetic). Plan: map-side score + TakeOrderedAndProject — no
    * shuffle, no RNG state, stable under repartitioning. Rows with
    * null/non-positive weight are excluded. Output: input columns +
    * `sample_score` (half-up 6), score-descending. */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("__score", esScore(col(keyCol), weight))
      .orderBy(col("__score").desc, col(keyCol).asc)
      .limit(k)
      .withColumn("sample_score", Rounding.halfUp(col("__score"), 6))
      .drop("__score")
  }

  /** Per-group weighted sample: `kPerGroup` rows per group by the same
    * A-Res score — per-source subsampling in one window pass (single
    * exchange on the group key, no global sort). */
  def weightedSampleByGroup(df: DataFrame, groupCols: Seq[String],
      keyCol: String, weight: Column, kPerGroup: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(kPerGroup > 0, "kPerGroup must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__score").desc, col(keyCol).asc)
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("__score", esScore(col(keyCol), weight))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= kPerGroup)
      .withColumn("sample_score", Rounding.halfUp(col("__score"), 6))
      .drop("__score", "__rn")
  }

  /** Quota cap: keep at most `n` rows per group, chosen by md5 priority
    * of `keyCol` (same key, same fate — stable across reruns and
    * repartitionings; the RefinedWeb-style per-domain cap that stops a
    * handful of giant domains from dominating the mix). One exchange on
    * the group key; the rank filter compiles to WindowGroupLimit
    * (Spark's rank-limit pushdown), so each map task forwards at most
    * `n` rows per group into the shuffle instead of the group's full
    * membership — the property that matters when one domain holds 10⁹
    * documents. */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(keyHash(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic pre-training shuffle + sharding: rank every row by
    * the md5 of its key (a reproducible random order, decorrelated from
    * source/time locality) and deal ranks round-robin into `shards` —
    * shard sizes balanced to ±1, `pos` the within-shard write order.
    * The write-prep step before emitting training shards: same key set,
    * same shards, on any engine, any partitioning, any rerun. Rank via
    * [[Ranks.withGlobalRank]] — never a single-partition window. */
  def shuffleShards(df: DataFrame, keyCol: String, shards: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    Ranks.withGlobalRank(df, "__rank", keyHash(col(keyCol)), col(keyCol))
      .withColumn("shard", ((col("__rank") - 1) % shards).cast("int"))
      .withColumn("pos", ((col("__rank") - 1) / shards).cast("long"))
      .drop("__rank")
  }

  /** Leakage-safe split for near-duplicate corpora: connected components
    * of the near-dup `pairs` graph become the split unit, so a document
    * and ALL its near-duplicates land on the same side — the failure
    * this prevents is a test doc whose paraphrase sits in train, which a
    * doc-keyed split ([[splitByHash]]) cannot see. Singletons group by
    * their own id. Adds `cluster_key` (the component id) and `sliceCol`.
    *
    * Components come from [[Graphs.connectedComponents]] (alternating
    * large-star/small-star, edge-bounded); the split itself is the same
    * map-side md5 cut as [[splitByHash]], keyed by the component. */
  def clusterSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String, dstCol: String, weights: Seq[(String, Double)],
      salt: String = "", sliceCol: String = "split"): DataFrame = {
    val comps = Graphs.connectedComponents(pairs, srcCol, dstCol)
      .select(col("id").as("__ccid"), col("comp").as("__comp"))
    val withGrp = df
      .join(comps, df(idCol).cast("long") === col("__ccid"), "left")
      .withColumn("cluster_key",
        coalesce(col("__comp"), col(idCol).cast("long")))
      .drop("__ccid", "__comp")
    splitByHash(withGrp, "cluster_key", weights, salt, sliceCol)
  }

  /** EXACT stratified split: within every stratum, rows are md5-ranked
    * and cut at cumulative `ceil(fraction·n)` boundaries — each stratum
    * lands EXACTLY its proportional count in each slice (the hash-only
    * [[splitByHash]] is binomially approximate per stratum, which small
    * strata feel). Deterministic under repartitioning; adds `sliceCol`.
    * The per-stratum rank windows by the stratum key — the same
    * exact-vs-approximate trade documented on [[classBalance]]. */
  def exactStratifiedSplit(df: DataFrame, strataCol: String,
      keyCol: String, weights: Seq[(String, Double)],
      sliceCol: String = "split"): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.forall(_._2 >= 0), "fractions must be non-negative")
    val total = weights.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-6, s"fractions must sum to 1, got $total")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(keyHash(col(keyCol)).asc, col(keyCol).asc)
    val n = Window.partitionBy(col(strataCol))
    val ranked = df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
    // cumulative boundaries accumulate in DECIMAL: 0.8 + 0.1 in binary
    // doubles is 0.9000000000000001, and ceil(cum·n) at an exact
    // boundary (n a multiple of 10) would then disagree with any engine
    // whose SQL literal is plain 0.9
    val cuts = weights.map(w => BigDecimal(w._2.toString))
      .scanLeft(BigDecimal(0))(_ + _).tail.map(_.toDouble)
    val assigned = weights.init.zip(cuts).foldLeft(
      when(lit(false), lit(""))) { case (acc, ((name, _), cum)) =>
      acc.when(col("__rn") <= ceil(lit(cum) * col("__n")), lit(name))
    }.otherwise(lit(weights.last._1))
    ranked.withColumn(sliceCol, assigned).drop("__rn", "__n")
  }

  /** Class-balanced downsample: every label keeps exactly
    * min-class-count rows, chosen by md5-of-key rank within the class —
    * deterministic under repartitioning and reruns, like everything in
    * this module. The classifier-training counterpart of
    * [[capPerGroup]]: the cap is DERIVED (the rarest class size,
    * computed by one bounded aggregate and broadcast) instead of fixed.
    *
    * The exact-rank window sorts within each class; for classes too
    * large to sort, the approximate path is [[deterministicSample]] at
    * rate = target/classCount per class — same hash, no window. */
  def classBalance(df: DataFrame, labelCol: String,
      keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val target = df.groupBy(col(labelCol)).agg(count(lit(1)).as("__cnt"))
      .agg(min(col("__cnt")).as("__target"))
    val w = Window.partitionBy(col(labelCol))
      .orderBy(keyHash(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(target))
      .filter(col("__rn") <= col("__target"))
      .drop("__rn", "__target")
  }

  /** Deterministic uniform negative sampling for contrastive pair
    * construction: each anchor draws `k` pseudo-random corpus rows —
    * pick j of anchor a is the corpus row whose dense global rank is
    * `md5(a ǁ '#' ǁ j) mod N` (+1). Same anchor, same negatives, on any
    * engine, under any partitioning. The easy-negative counterpart of
    * [[Clustering.hardNegatives]]. Anchors drawn from the corpus have
    * self-collisions filtered (≤ 1 in N per draw, so ~k picks remain).
    *
    * Plan: one [[Ranks.withGlobalRank]] pass over the corpus (range
    * repartition, no single-partition window), then an equi-join on the
    * rank — uniform key, no skew. Output: (`anchorIdCol`, `j`,
    * `neg_id`). */
  def uniformNegatives(corpus: DataFrame, anchors: DataFrame,
      idCol: String, anchorIdCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val ranked = Ranks.withGlobalRank(
      corpus.select(col(idCol)), "__rank", col(idCol))
    val n = corpus.agg(count(lit(1)).as("__n"))
    val picks = anchors.select(col(anchorIdCol))
      .crossJoin(broadcast(n))
      .select(col(anchorIdCol),
        explode(sequence(lit(1), lit(k))).as("j"), col("__n"))
      .withColumn("__rank",
        conv(substring(md5(concat(col(anchorIdCol).cast("string"),
          lit("#"), col("j").cast("string"))), 1, 15), 16, 10)
          .cast("long") % col("__n") + 1)
    picks.join(ranked.select(col(idCol).as("neg_id"), col("__rank")),
        Seq("__rank"))
      .filter(col("neg_id") =!= col(anchorIdCol))
      .select(col(anchorIdCol), col("j"), col("neg_id"))
  }

  /** Efraimidis–Spirakis selection score: md5-derived uniform raised to
    * 1/weight. */
  private def esScore(key: Column, weight: Column): Column = {
    val u = (conv(keyHash(key), 16, 10).cast("double") + 0.5) / 4294967296.0
    pow(u, lit(1.0) / weight.cast("double"))
  }

  /** Leakage-safe train/val/test split: each row lands in exactly one
    * named slice, decided ONLY by the md5 of (`salt` ++ its `keyCol`)
    * — so the assignment is deterministic across runs, engines, and
    * repartitionings, and EVERY row sharing a key lands in the same
    * slice (choose the key at the leakage boundary: doc id, URL host,
    * user id — whatever must never straddle train and eval). `salt`
    * re-deals the split without touching the data.
    *
    * `weights` are (name, fraction) in declaration order; fractions
    * must sum to ~1. The unit interval is cut at cumulative-fraction
    * boundaries of the 32-bit md5-prefix space, so slice membership is
    * `bucket < boundary` on an 8-hex-digit string — the same codegen'd,
    * shuffle-free map-side predicate as [[deterministicSample]], with
    * zero coordination between rows: exactly the shape that survives
    * 100 TB (a pure projection; Parquet scan + filter pushdown intact,
    * no exchange anywhere). Adds `sliceCol` (default "split"). */
  def splitByHash(df: DataFrame, keyCol: String,
      weights: Seq[(String, Double)], salt: String = "",
      sliceCol: String = "split"): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.forall(_._2 >= 0), "fractions must be non-negative")
    val total = weights.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-6, s"fractions must sum to 1, got $total")
    val bucket = substring(
      md5(concat(lit(salt), col(keyCol).cast("string"))), 1, 8)
    val cuts = weights.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val assigned = weights.init.zip(cuts).foldLeft(
      when(lit(false), lit(""))) { case (acc, ((name, _), cum)) =>
      acc.when(bucket < lit(hexThreshold(cum)), lit(name))
    }.otherwise(lit(weights.last._1))
    df.withColumn(sliceCol, assigned)
  }
}
