package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Builds the DataFrame transform chain for one parsed pipe stage.
  *
  * Observable data flow matches the reference writer chain
  * (/root/reference/rbql-py/rbql/rbql_engine.py:1554-1563):
  * join → where → (aggregate | select/update) → distinct → sort → limit.
  * (The reference sorts before dedup; since its dedup is first-seen-stable,
  * sorting after dedup is observably identical and lets Catalyst push the
  * dedup below the global sort.)
  *
  * Everything stays declarative: filters/projections are Catalyst
  * expressions (predicate pushdown + whole-stage codegen apply); the only
  * imperative escape is NR materialization via zipWithIndex, done ONLY when
  * the query references NR.
  */
object PlanBuilder {

  val NrCol = "__graft_nr"
  val BNrCol = "__graft_bnr"

  private val OrderedAggRe =
    ("""(?i)(?<![A-Za-z0-9_.])(""" + Aggregates.OrderSensitive.mkString("|") + """)\s*\(""").r

  /** 1-based stable record number, assigned in source order BEFORE any
    * shuffle (SURVEY §7.4 hard-part 1). Two passes like zipWithIndex —
    * per-partition counts, then offset + in-partition counter — but fully
    * declarative: monotonically_increasing_id is (partitionId << 33) +
    * rowInPartition, so NR = offset(pid) + low-33-bits + 1. Stays inside
    * Tungsten/whole-stage codegen (the old rdd.zipWithIndex round-trip
    * deserialized every row and severed the columnar scan). Both jobs scan
    * with identical deterministic partitioning, the same assumption
    * zipWithIndex itself makes. */
  def withNr(df: DataFrame): DataFrame = {
    val counts = df.groupBy(spark_partition_id().alias("__p"))
      .agg(count(lit(1)).alias("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val maxPid = counts.lastOption.map(_._1).getOrElse(0)
    val offsets = new Array[Long](maxPid + 1)
    var acc = 0L
    counts.foreach { case (pid, c) => offsets(pid) = acc; acc += c }
    val offsetCol = element_at(
      array(offsets.map(o => lit(o)).toIndexedSeq: _*),
      spark_partition_id() + 1)
    df.withColumn(NrCol,
      offsetCol + monotonically_increasing_id().bitwiseAND((1L << 33) - 1) + 1L)
  }

  /** NU — running count (1-based, record order) of rows matching the
    * UPDATE's WHERE predicate (reference rbql_engine.py:693,704,744: the
    * counter increments before the assignments run, so the first updated
    * row reads 1). Distributed: per-partition matched counts → cumulative
    * offsets (one small job), plus a per-source-partition running-sum
    * window — parallelism stays one task per input partition, no global
    * sort. Only evaluated when the predicate holds, so values on
    * unmatched rows are irrelevant. */
  private def withNu(df: DataFrame, predSql: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val matched = when(expr(predSql), 1L).otherwise(0L)
    val base = df.withColumn("__graft_pid", spark_partition_id())
      .withColumn("__graft_mid", monotonically_increasing_id())
    val counts = base.groupBy(col("__graft_pid")).agg(sum(matched).alias("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val maxPid = counts.lastOption.map(_._1).getOrElse(0)
    val offsets = new Array[Long](maxPid + 1)
    var acc = 0L
    counts.foreach { case (p, c) => offsets(p) = acc; acc += c }
    val w = Window.partitionBy(col("__graft_pid")).orderBy(col("__graft_mid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn(ExprTranslator.NuCol,
      element_at(array(offsets.map(o => lit(o)).toIndexedSeq: _*),
        col("__graft_pid") + 1) + sum(matched).over(w))
      .drop("__graft_pid", "__graft_mid")
  }

  def build(
      spark: SparkSession,
      stageMaskedText: String,
      masked: Lexer.Masked,
      inputDf: DataFrame,
      resolveTable: String => DataFrame): DataFrame = {

    val ast = ClauseParser.parse(masked.copy(text = stageMaskedText))
    val fromDf = ast.from match {
      case Some(tid) => resolveTable(masked.restore(tid))
      case None => inputDf
    }

    val bDfRaw0 = ast.join.map(j => resolveTable(masked.restore(j.tableId)))

    // Order-sensitive aggregates (ARRAY_AGG/ANY_VALUE) read NR even when
    // the query text doesn't: their per-group semantics are pinned to
    // record order (first-seen / insertion order, rbql_engine.py:317-325,
    // 446-458) — without the pin, collect_list/first order would be
    // partition-dependent in a distributed plan.
    val usesOrderedAgg = OrderedAggRe.findFirstMatchIn(stageMaskedText).isDefined
    val usesNr = ExprTranslator.NrRe.findFirstIn(stageMaskedText).isDefined ||
      ExprTranslator.DotNrRe.findFirstIn(stageMaskedText).isDefined ||
      usesOrderedAgg
    val usesBNr = ExprTranslator.BNrRe.findFirstIn(stageMaskedText).isDefined

    // B-side record number (join key `bNR`/`b.NR`): materialized on the
    // join table the same way as A's
    val bDfRaw =
      if (usesBNr) bDfRaw0.map(b => withNr(b).withColumnRenamed(NrCol, BNrCol))
      else bDfRaw0

    val aDf0 = if (usesNr) withNr(fromDf) else fromDf
    val tr = new ExprTranslator(aDf0.schema, bDfRaw.map(_.schema), masked)
    val aDf = aDf0.alias("graft_a")

    // ---- UPDATE path (projection-as-mutation, README.md:82-84) -------
    val usesNu = ExprTranslator.NuRe.findFirstIn(stageMaskedText).isDefined
    if (usesNu && ast.update.isEmpty)
      Errors.parsing("NU (number of updated records) is only defined in UPDATE queries")
    ast.update.foreach { upd =>
      if (usesNu && ast.join.isDefined)
        Errors.parsing("NU is not supported in UPDATE with JOIN; use NR instead")
      if (ast.where.exists(w => ExprTranslator.NuRe.findFirstIn(w).isDefined))
        Errors.parsing("NU cannot be used in WHERE (it counts rows the WHERE already matched)")
      val aDfU =
        if (usesNu)
          withNu(aDf, ast.where.map(w => tr.translate(w)).getOrElse("true"))
            .alias("graft_a")
        else aDf
      return buildUpdate(aDfU, aDf0, bDfRaw, ast, upd, tr)
    }

    // ---- join --------------------------------------------------------
    val joined = ast.join match {
      case None => aDf
      case Some(j) =>
        val bDf = bDfRaw.get.alias("graft_b")
        j.kind match {
          case JoinKind.Inner => aDf.join(bDf, joinCondition(j.onRaw, tr), "inner")
          case JoinKind.Left => aDf.join(bDf, joinCondition(j.onRaw, tr), "left_outer")
          case JoinKind.StrictLeft =>
            strictLeftJoin(aDf, bDfRaw.get, joinPairs(j.onRaw, tr))
        }
    }

    val sel = ast.select.get

    // ---- WHERE -------------------------------------------------------
    if (ast.where.exists(w => Aggregates.containsAggCall(w)))
      Errors.parsing("Aggregate functions are not allowed in WHERE")
    val filtered = ast.where match {
      case Some(w) => joined.filter(expr(tr.translate(w)))
      case None => joined
    }

    // ---- classify select items --------------------------------------
    val aCols = aDf0.schema.fieldNames.toSeq
    val bCols = bDfRaw.map(_.schema.fieldNames.toSeq).getOrElse(Seq.empty)

    val isStar: String => Option[Seq[(String, Column)]] = raw => raw.trim match {
      case "*" =>
        val a = starCols("graft_a", aCols)
        val b = starCols("graft_b", bCols, aCols.toSet)
        Some(a ++ b)
      case "a.*" => Some(starCols("graft_a", aCols))
      case "b.*" =>
        if (bCols.isEmpty) Errors.parsing("b.* used without JOIN")
        Some(starCols("graft_b", bCols, aCols.toSet))
      case _ => None
    }

    sel.exceptCols.foreach { exc =>
      return buildExcept(filtered, ast, sel, exc, tr, aCols)
    }

    val classified = sel.items.map { it =>
      (it, if (isStar(it.rawExpr).isDefined) None
      else Some(Aggregates.classify(it.rawExpr, tr.translate)))
    }
    val hasAgg = ast.groupBy.isDefined ||
      classified.exists(_._2.exists(_.agg.isDefined))

    val result =
      if (hasAgg) buildAggregate(filtered, ast, sel, classified, tr)
      else buildProjection(filtered, ast, sel, classified, isStar, tr)

    // ---- limit -------------------------------------------------------
    val limited = (sel.topN, ast.limit) match {
      case (Some(_), Some(_)) => Errors.parsing("Use either TOP or LIMIT, not both")
      case (Some(n), None) => result.limit(checkInt(n))
      case (None, Some(n)) => result.limit(checkInt(n))
      case _ => result
    }
    limited
  }

  private def checkInt(n: Long): Int = {
    if (n < 0 || n > Int.MaxValue) Errors.parsing(s"LIMIT/TOP out of range: $n")
    n.toInt
  }

  private def starCols(
      alias: String, cols: Seq[String],
      clashWith: Set[String] = Set.empty): Seq[(String, Column)] =
    cols.filterNot(c => c == NrCol || c == BNrCol).map { c =>
      val outName =
        if (c == ExprTranslator.FieldsCol) "fields" // ragged star: the record
        else if (clashWith.contains(c)) s"b_$c"
        else c
      (outName, col(s"$alias.`${c.replace("`", "``")}`"))
    }

  /** ON: conjunction of equalities (reference parse_join_expression,
    * rbql_engine.py:991-1013 — equi-only). Returns (aSide, bSide) SQL text
    * per conjunct, normalized so the graft_b-referencing side is second.
    * Qualified translated sides keep this an equi-join for Catalyst
    * (broadcast/SMJ eligible). */
  private def joinPairs(onRaw: String, tr: ExprTranslator): Seq[(String, String)] =
    splitTopLevelKeyword(onRaw, "and").map { piece =>
      val sides = piece.split("==") match {
        case Array(l, r) => (l, r)
        case _ =>
          ClauseParser.splitTopLevel(piece, '=') match {
            case Seq(l, r) => (l, r)
            case _ => Errors.parsing(
              s"JOIN ON expects equality conditions joined by AND, got: '${piece.trim}'")
          }
      }
      val lt = tr.translate(sides._1)
      val rt = tr.translate(sides._2)
      if (lt.contains("graft_b.")) (rt, lt) else (lt, rt)
    }

  private def joinCondition(onRaw: String, tr: ExprTranslator): Column =
    joinPairs(onRaw, tr).map { case (a, b) => expr(a) === expr(b) }
      .reduce(_ && _)

  private def splitTopLevelKeyword(s: String, kw: String): Seq[String] = {
    val re = ("""(?i)(?<![A-Za-z0-9_])""" + kw + """(?![A-Za-z0-9_])""").r
    // split only at paren-depth 0
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var last = 0
    val ms = re.findAllMatchIn(s).toSeq
    for (m <- ms) {
      val before = s.substring(0, m.start)
      depth = before.count(_ == '(') - before.count(_ == ')')
      if (depth == 0) { parts += s.substring(last, m.start); last = m.end }
    }
    parts += s.substring(last)
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** STRICT LEFT JOIN: error unless every A row has exactly one B match
    * (reference StrictLeftJoiner, rbql_engine.py:595-603). Cardinality is
    * checked by joining B against its own per-key counts — an aggregation
    * of the (small) build side that broadcasts, instead of re-shuffling
    * the full joined result by a per-row id. Fails inside the job via
    * assert_true (no driver collect). */
  private def strictLeftJoin(aDf: DataFrame, bDfUnaliased: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    val keyAliases = pairs.indices.map(i => s"__graft_sk$i")
    val cnt = bDfUnaliased.alias("graft_b")
      .groupBy(pairs.zip(keyAliases).map { case ((_, b), n) => expr(b).alias(n) }: _*)
      .agg(count(lit(1)).alias("__graft_cnt"))
    val bPlus = bDfUnaliased.alias("graft_b")
      .join(cnt, pairs.zip(keyAliases).map { case ((_, b), n) =>
        expr(b) === col(n)
      }.reduce(_ && _))
      .drop(keyAliases: _*)
      .alias("graft_b")
    val cond = pairs.map { case (a, b) => expr(a) === expr(b) }.reduce(_ && _)
    aDf.join(bPlus, cond, "left_outer")
      .where(assert_true(col("__graft_cnt") === 1,
        lit("STRICT LEFT JOIN requires exactly one match for every record")).isNull)
      .drop("__graft_cnt")
  }

  // ---- UPDATE ---------------------------------------------------------
  /** UPDATE emits every input row, with assigned columns replaced where the
    * WHERE predicate holds (README.md:82-84 — "a special type of SELECT").
    * With JOIN: at most one B match allowed per A row (error if more), zero
    * matches ⇒ predicate treated as false (reference PROCESS_UPDATE_JOIN,
    * rbql_engine.py:682-697). */
  private def buildUpdate(
      aDf: DataFrame,
      aDf0: DataFrame,
      bDfRaw: Option[DataFrame],
      ast: StageAst,
      upd: UpdateSpec,
      tr: ExprTranslator): DataFrame = {
    val pred: Column = ast.where.map(w => expr(tr.translate(w))).getOrElse(lit(true))
    // UPDATE+JOIN cardinality (≤1 match; 0 ⇒ predicate false): per-key
    // counts joined onto B — aggregation of the build side, no full-result
    // re-shuffle (same shape as strictLeftJoin)
    val (base, effPred) = ast.join match {
      case None => (aDf, pred)
      case Some(j) =>
        val pairs = joinPairs(j.onRaw, tr)
        val keyAliases = pairs.indices.map(i => s"__graft_uk$i")
        val cnt = bDfRaw.get.alias("graft_b")
          .groupBy(pairs.zip(keyAliases).map { case ((_, b), n) => expr(b).alias(n) }: _*)
          .agg(count(lit(1)).alias("__graft_cnt"))
        val bPlus = bDfRaw.get.alias("graft_b")
          .join(cnt, pairs.zip(keyAliases).map { case ((_, b), n) =>
            expr(b) === col(n)
          }.reduce(_ && _))
          .drop(keyAliases: _*)
          .alias("graft_b")
        val cond = pairs.map { case (a, b) => expr(a) === expr(b) }.reduce(_ && _)
        val guarded = aDf.join(bPlus, cond, "left_outer")
          .where(assert_true(col("__graft_cnt").isNull || col("__graft_cnt") <= 1,
            lit("UPDATE with JOIN requires at most one match for every record")).isNull)
        (guarded, pred && col("__graft_cnt").isNotNull)
    }
    val assignTargets: Seq[(String, Column)] = upd.assignments.map {
      case (varRef, valueExpr) =>
        (resolveAssignTargetName(varRef, tr), expr(tr.translate(valueExpr)))
    }
    val outCols = aDf0.schema.fieldNames.filterNot(_ == NrCol).map { c =>
      val q = col(s"graft_a.`${c.replace("`", "``")}`")
      assignTargets.find(_._1 == c) match {
        case Some((_, v)) => when(effPred, v).otherwise(q).alias(c)
        case None => q.alias(c)
      }
    }
    base.select(outCols.toIndexedSeq: _*)
  }

  // ---- SELECT EXCEPT --------------------------------------------------
  private def buildExcept(
      filtered: DataFrame,
      ast: StageAst,
      sel: SelectSpec,
      exc: Seq[String],
      tr: ExprTranslator,
      aCols: Seq[String]): DataFrame = {
    val dropNames = exc.map(v => resolveAssignTargetName(v, tr))
    dropNames.find(n => !aCols.contains(n)).foreach(n =>
      Errors.parsing(s"EXCEPT column '$n' not found"))
    val kept = aCols.filterNot(c => dropNames.contains(c) || c == NrCol)
    var out = filtered.select(kept.map(c =>
      col(s"graft_a.`${c.replace("`", "``")}`").alias(c)).toIndexedSeq: _*)
    if (sel.distinct) out = out.dropDuplicates()
    out = applyOrderBySimple(out, ast, tr)
    (sel.topN orElse ast.limit).map(n => out.limit(checkInt(n))).getOrElse(out)
  }

  private def resolveAssignTargetName(varRef: String, tr: ExprTranslator): String = {
    val translated = tr.translate(varRef).trim
    """^graft_a\.`(.*)`$""".r.findFirstMatchIn(translated)
      .map(_.group(1).replace("``", "`"))
      .getOrElse(Errors.parsing(s"EXCEPT entries must be input-column variables, got '$varRef'"))
  }

  // ---- aggregate path -------------------------------------------------
  private def buildAggregate(
      filtered: DataFrame,
      ast: StageAst,
      sel: SelectSpec,
      classified: Seq[(SelectItem, Option[Aggregates.Item])],
      tr: ExprTranslator): DataFrame = {
    if (ast.orderBy.isDefined)
      Errors.parsing("ORDER BY is not allowed in aggregate queries (group keys define the output order)")
    if (sel.distinct || sel.distinctCount)
      Errors.parsing("DISTINCT is not allowed in aggregate queries")

    val groupKeyTexts: Seq[String] =
      ast.groupBy.getOrElse(Seq.empty).map(k => tr.translate(k))
    val groupKeys: Seq[Column] = groupKeyTexts.map(expr)

    // Classify each output: aggregate | group-key passthrough | other
    // group-constant expression. Key passthroughs reference the grouping
    // attribute directly — no string min/first aggregation, so the plan
    // stays HashAggregate (immutable agg buffers would force SortAggregate
    // + an extra per-partition sort of the full input).
    sealed trait Out
    case class AggOut(c: Column) extends Out
    case class KeyOut(keyIdx: Int) extends Out
    case class ConstOut(c: Column) extends Out

    val outs: Seq[(String, Out)] = classified.zipWithIndex.map {
      case ((item, cls), idx) =>
        val outName = outputName(item, idx, tr)
        val out = cls match {
          case Some(Aggregates.Item(_, Some(call))) =>
            AggOut(Aggregates.toColumn(call, resolveType(filtered, call.argSql), NrCol))
          case Some(Aggregates.Item(_, None)) =>
            val text = tr.translate(item.rawExpr)
            val ki = groupKeyTexts.indexOf(text)
            if (ki >= 0) KeyOut(ki)
            else {
              // non-key group-constant expression: verified via min==max
              // (partial-aggregatable — no Expand/second shuffle like
              // count_distinct; ConstGroupVerifier, rbql_engine.py:461-474)
              val e = expr(text)
              ConstOut(when(min(e) =!= max(e),
                raise_error(lit(s"Non-constant values in output column ${idx + 1} detected in aggregate query (column must be group-constant)")))
                .otherwise(min(e)))
            }
          case None => Errors.parsing("Star expansion is not allowed in aggregate queries")
        }
        (outName, out)
    }

    val aggCols = outs.collect {
      case (n, AggOut(c)) => c.alias(n)
      case (n, ConstOut(c)) => c.alias(n)
    }
    // agg() needs at least one aggregate: pure GROUP BY passthrough gets a
    // dummy that is dropped by the final projection
    val aggList = if (aggCols.nonEmpty) aggCols else Seq(count(lit(1)).alias("__graft_dummy"))

    if (groupKeys.nonEmpty) {
      // alias keys to reserved names so key/output name collisions are
      // impossible; result rows sorted by group key
      // (AggregateWriter.finish, rbql_engine.py:566-572)
      val aliasedKeys = groupKeys.zipWithIndex.map { case (k, i) =>
        k.alias(s"__graft_gk$i")
      }
      val finalCols = outs.map {
        case (n, KeyOut(ki)) => col(s"__graft_gk$ki").alias(n)
        case (n, _) => col(s"`${n.replace("`", "``")}`")
      }
      filtered.groupBy(aliasedKeys.toIndexedSeq: _*)
        .agg(aggList.head, aggList.tail.toIndexedSeq: _*)
        .orderBy(groupKeys.indices.map(i => col(s"__graft_gk$i").asc).toIndexedSeq: _*)
        .select(finalCols.toIndexedSeq: _*)
    } else {
      outs.collectFirst { case (_, KeyOut(_)) => () }.foreach { _ =>
        Errors.parsing("Non-aggregate column in a global aggregate query")
      }
      filtered.agg(aggList.head, aggList.tail.toIndexedSeq: _*)
    }
  }

  // ---- plain projection ----------------------------------------------
  private def buildProjection(
      filtered: DataFrame,
      ast: StageAst,
      sel: SelectSpec,
      classified: Seq[(SelectItem, Option[Aggregates.Item])],
      isStar: String => Option[Seq[(String, Column)]],
      tr: ExprTranslator): DataFrame = {

    // UNNEST: exactly one per query (rbql_engine.py:843)
    var unnestSeen = false

    val outPairs: Seq[(String, Column)] = classified.zipWithIndex.flatMap {
      case ((item, cls), idx) =>
        isStar(item.rawExpr) match {
          case Some(cols) => cols
          case None =>
            // use the polymorphic-rewritten text (min/max 2+args → least/
            // greatest) from classification, not the original raw
            val itemText = cls.map(_.raw).getOrElse(item.rawExpr)
            val (colExpr, fromUnnest) = buildItemColumn(itemText, tr)
            if (fromUnnest) {
              if (unnestSeen) Errors.parsing("Only one UNNEST is allowed per query")
              unnestSeen = true
            }
            Seq((outputName(item, idx, tr), colExpr))
        }
    }
    // uniquify duplicate output names (select a1, a1) — suffix
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val uniq = outPairs.map { case (n, c) =>
      val k = seen.getOrElse(n, 0)
      seen(n) = k + 1
      if (k == 0) c.alias(n) else c.alias(s"${n}_$k")
    }

    // hidden sort keys (ORDER BY may reference input variables that are not
    // selected — compute them pre-projection)
    val sortKeys = ast.orderBy.getOrElse(Seq.empty)
    val hiddenCols = sortKeys.zipWithIndex.map { case (k, i) =>
      expr(tr.translate(k.expr)).alias(s"__graft_ord$i")
    }
    val plainMode = !sel.distinct && !sel.distinctCount
    val nrTie: Seq[Column] =
      if (sortKeys.nonEmpty && plainMode && filtered.columns.contains(NrCol))
        Seq(col(NrCol).alias("__graft_ordnr"))
      else Seq.empty

    var out = filtered.select((uniq ++ hiddenCols ++ nrTie).toIndexedSeq: _*)
    val outNames = uniq.indices.map(i => out.columns(i))

    if (sel.distinct || sel.distinctCount) {
      // When every ORDER BY key is itself a selected expression, the key
      // is constant within each distinct tuple — dedup + a direct sort is
      // exactly the reference's sort-then-first-seen-dedup result, stays
      // HashAggregate (no immutable struct agg buffer forcing
      // SortAggregate), and supports mixed per-key directions.
      val outTexts: Set[String] = classified.flatMap { case (item, cls) =>
        if (isStar(item.rawExpr).isDefined) Nil
        else scala.util.Try(
          tr.translate(cls.map(_.raw).getOrElse(item.rawExpr))).toOption.toList
      }.toSet
      val covered = sortKeys.forall(k =>
        outNames.contains(k.expr.trim) ||
          scala.util.Try(tr.translate(k.expr)).toOption.exists(outTexts.contains))
      if (covered) {
        val ordNames = sortKeys.indices.map(i => s"__graft_ord$i")
        val groupCols = (outNames ++ ordNames).map(c => col(s"`$c`"))
        out =
          if (sel.distinctCount)
            out.groupBy(groupCols: _*).agg(count(lit(1)).alias("count"))
          else out.dropDuplicates(outNames ++ ordNames)
        if (sortKeys.nonEmpty)
          out = out.orderBy(sortKeys.zipWithIndex.map { case (k, i) =>
            val c = col(s"__graft_ord$i"); if (k.asc) c.asc else c.desc
          }.toIndexedSeq: _*).drop(ordNames: _*)
      } else {
        // Reference data flow: sort → first-seen dedup (writer chain,
        // rbql_engine.py:1554-1563) ⇒ each distinct tuple is represented
        // by its extreme sort key: min(struct(keys)) ascending, max
        // descending (DESC reverses the stably-sorted stream before
        // dedup). Mixed per-key directions are not expressible this way.
        if (sortKeys.map(_.asc).distinct.size > 1)
          Errors.parsing("With DISTINCT, ORDER BY keys outside the SELECT list must use a single direction; use a pipe stage instead")
        val asc = sortKeys.forall(_.asc)
        val grouped = out.groupBy(outNames.map(c => col(s"`$c`")): _*)
        val aggs: Seq[Column] =
          (if (sel.distinctCount) Seq(count(lit(1)).alias("count")) else Seq.empty) ++
            (if (sortKeys.nonEmpty) {
              val keyStruct = struct(sortKeys.indices.map(i => col(s"__graft_ord$i")): _*)
              Seq((if (asc) min(keyStruct) else max(keyStruct)).alias("__graft_ordk"))
            } else Seq.empty)
        out =
          if (aggs.nonEmpty) grouped.agg(aggs.head, aggs.tail: _*)
          else out.dropDuplicates(outNames)
        if (sortKeys.nonEmpty) {
          out = out.orderBy(if (asc) col("__graft_ordk").asc else col("__graft_ordk").desc)
            .drop("__graft_ordk")
        }
      }
      // occurrence count prepended as first column (UniqCountWriter,
      // rbql_engine.py:518-537)
      if (sel.distinctCount)
        out = out.select((col("count") +: outNames.map(c => col(s"`$c`"))).toIndexedSeq: _*)
      else out = out.select(outNames.map(c => col(s"`$c`")).toIndexedSeq: _*)
    } else if (sortKeys.nonEmpty) {
      val ordCols = sortKeys.zipWithIndex.map { case (k, i) =>
        val c = col(s"__graft_ord$i"); if (k.asc) c.asc else c.desc
      } ++ nrTie.headOption.map { _ =>
        // stable sort: reference reverses the stably-sorted list for DESC
        // (rbql_engine.py:550-557) → tiebreaker follows the direction
        val c = col("__graft_ordnr")
        if (sortKeys.forall(_.asc)) c.asc else c.desc
      }
      out = out.orderBy(ordCols.toIndexedSeq: _*)
        .drop(sortKeys.indices.map(i => s"__graft_ord$i"): _*)
        .drop("__graft_ordnr")
    }
    out
  }

  /** Build the Column for a non-star select item; returns (col, isUnnest). */
  private def buildItemColumn(raw: String, tr: ExprTranslator): (Column, Boolean) = {
    var t = raw.trim
    // unpack operator `*expr` (reference python dialect `select *a2.split()`,
    // test 'unpack operator') — sugar for UNNEST(expr). Plain stars were
    // already consumed by the caller's isStar.
    if (t.startsWith("*") && t.length > 1) t = s"UNNEST(${t.substring(1)})"
    val m = """(?i)^unnest\s*\(""".r.findFirstMatchIn(t)
    if (m.isDefined) {
      val open = m.get.end - 1
      var depth = 0; var i = open; var end = -1
      while (i < t.length && end < 0) {
        val c = t.charAt(i)
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) end = i + 1 }
        i += 1
      }
      if (end == t.length) {
        val inner = t.substring(open + 1, end - 1)
        return (explode(expr(tr.translate(inner))), true)
      }
    }
    (expr(tr.translate(t)), false)
  }

  /** Resolve the data type an expression would have against `df` (driver-
    * side analysis only — no job). None if analysis fails (the real error
    * surfaces later with better context). */
  private def resolveType(df: DataFrame, sql: String): Option[org.apache.spark.sql.types.DataType] =
    scala.util.Try(df.select(expr(sql)).schema.head.dataType).toOption

  /** Output header inference (select_output_header,
    * rbql_engine.py:1411-1454): alias > passthrough source name > colN. */
  private def outputName(item: SelectItem, idx: Int, tr: ExprTranslator): String = {
    item.alias.getOrElse {
      passthroughName(item.rawExpr, tr).getOrElse(s"col${idx + 1}")
    }
  }

  private def passthroughName(raw: String, tr: ExprTranslator): Option[String] = {
    val t = raw.trim
    if (t == "NR" || t == "NF") return Some(t)
    val translated =
      try tr.translate(t)
      catch { case _: GraftError => return None }
    """^graft_[ab]\.`(.*)`$""".r.findFirstMatchIn(translated.trim)
      .map(_.group(1).replace("``", "`"))
  }

  private def applyOrderBySimple(df: DataFrame, ast: StageAst, tr: ExprTranslator): DataFrame =
    ast.orderBy match {
      case Some(keys) =>
        df.orderBy(keys.map { k =>
          val name = k.expr.trim
          val c = if (df.columns.contains(name)) col(s"`$name`") else expr(tr.translate(k.expr))
          if (k.asc) c.asc else c.desc
        }.toIndexedSeq: _*)
      case None => df
    }
}
