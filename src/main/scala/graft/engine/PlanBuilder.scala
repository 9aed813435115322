package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PyEq

/** Builds the DataFrame transform chain for one parsed pipe stage.
  *
  * Observable data flow matches the reference writer chain
  * (/root/reference/rbql-py/rbql/rbql_engine.py:1554-1563):
  * join → where → (aggregate | select/update) → distinct → sort → limit.
  * (The reference sorts before dedup; since its dedup is first-seen-stable,
  * sorting after dedup with a first-seen-pinned position is observably
  * identical and lets Catalyst push the dedup below the global sort.)
  *
  * Everything stays declarative: filters/projections are Catalyst
  * expressions (predicate pushdown + whole-stage codegen apply); the only
  * imperative escape is NR materialization, done ONLY when the query
  * references NR or the result order requires it (see `ordered` below).
  *
  * == Ordered parity mode ==
  * The reference is a sequential engine: its output row order (input order;
  * for joins, A-order with B-matches in B-insertion order; stable sort for
  * ORDER BY; first-seen order for DISTINCT) is part of its observable
  * contract. A distributed engine cannot preserve input order for free once
  * a shuffle (join/dedup/sort) is involved, so that contract is paid for
  * only where it is part of the API: the RBQL-parity surfaces
  * (Graft.queryTable / queryCsv / the CLI) pass `ordered = true`, which
  * materializes NR (and bNR for joins) and pins the output order exactly.
  * The DataFrame surface (Graft.query on big tables) defaults to
  * `ordered = false`: same rows, order unspecified unless ORDER BY — the
  * right contract at 100 TB where a global order pin would serialize the
  * job on a single sort.
  */
object PlanBuilder {

  val NrCol = "__graft_nr"
  val BNrCol = "__graft_bnr"

  /** Hidden structural-output-width column (parity surface; see
    * buildProjection's owidCol and Cli's write-side width check). */
  val OwidCol = "__graft_owid"

  // Inputs persisted by withNr (two-pass NR over reorderable lineage) must
  // stay cached until the query's terminal action — but not FOREVER: the
  // interactive CLI loop / a long-lived session would otherwise leak one
  // cached plan per NR query until LRU eviction. Plan construction runs on
  // the caller's thread, so a ThreadLocal collector lets terminal surfaces
  // (Cli.runOne, Graft.queryTable) unpersist exactly what their own query
  // pinned, without racing concurrent queries on the same session.
  private val persistTracker =
    new ThreadLocal[scala.collection.mutable.Buffer[DataFrame]]

  /** Run `body` (plan construction) collecting every DataFrame it persists;
    * the caller unpersists them after its terminal action. */
  def trackPersists[T](body: => T): (T, Seq[DataFrame]) = {
    val buf = scala.collection.mutable.Buffer.empty[DataFrame]
    val prev = persistTracker.get()
    persistTracker.set(buf)
    try {
      val r = body
      (r, buf.toSeq)
    } finally {
      if (prev == null) persistTracker.remove() else persistTracker.set(prev)
    }
  }

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
    // The two passes must see identical per-partition contents AND order.
    // That holds for file scans / local data under narrow deterministic
    // operators (same split planning, same in-split order — the same
    // assumption zipWithIndex makes). Anything else — a shuffle in the
    // lineage (pipe stage over a join/agg), a JDBC read with no ORDER, a
    // sample — can legally reorder between jobs, which would silently
    // corrupt NR; those inputs are persisted first so both passes read the
    // materialized blocks. (Storage is LRU-evicted; only the parity/CLI
    // surfaces take this path at meaningful sizes.)
    val src =
      if (deterministicTwoPassScan(df)) df
      else {
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Option(persistTracker.get()).foreach(_ += p)
        p
      }
    val counts = src.groupBy(spark_partition_id().alias("__p"))
      .agg(count(lit(1)).alias("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val maxPid = counts.lastOption.map(_._1).getOrElse(0)
    val offsets = new Array[Long](maxPid + 1)
    var acc = 0L
    counts.foreach { case (pid, c) => offsets(pid) = acc; acc += c }
    val offsetCol = element_at(
      array(offsets.map(o => lit(o)).toIndexedSeq: _*),
      spark_partition_id() + 1)
    src.withColumn(NrCol,
      offsetCol + monotonically_increasing_id().bitwiseAND((1L << 33) - 1) + 1L)
  }

  /** True when two separate jobs over `df` are guaranteed to see the same
    * rows in the same per-partition order: deterministic narrow operators
    * over file scans or local data. A shuffle (join/agg/repartition/sort
    * feeding a pipe stage), a JDBC scan, or a sample can reorder between
    * jobs. */
  private def deterministicTwoPassScan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def ok(p: LogicalPlan): Boolean = p match {
      case l: LogicalRelation => l.relation.isInstanceOf[HadoopFsRelation]
      case _: LocalRelation => true
      // parallelize'd local data (queryTable) — fixed slices, stable order
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case n @ (_: Project | _: Filter | _: SubqueryAlias | _: Generate) =>
        n.expressions.forall(_.deterministic) && n.children.forall(ok)
      case _ => false
    }
    ok(df.queryExecution.analyzed)
  }

  /** NU — running count (1-based, record order) of rows matching the
    * UPDATE's effective predicate (reference rbql_engine.py:693,704,744:
    * the counter increments before the assignments run, so the first
    * updated row reads 1). Distributed: per-partition matched counts →
    * cumulative offsets (one small job), plus a per-source-partition
    * running-sum window — parallelism stays one task per input partition.
    * The input must already be in record order (UPDATE+JOIN callers sort
    * by NR first). Only evaluated when the predicate holds, so values on
    * unmatched rows are irrelevant. */
  private def withNu(df: DataFrame, matchedPred: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val matched = when(matchedPred, 1L).otherwise(0L)
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
      resolveTable: String => DataFrame,
      ordered: Boolean = false): DataFrame = {

    val ast = ClauseParser.parse(masked.copy(text = stageMaskedText))
    val fromDf0 = ast.from match {
      // `FROM a` names the input table itself (reference
      // remove_redundant_input_table_name, rbql_engine.py:1405-1407);
      // only falls through to the registry when no input was provided
      // (FROM-first form, where the placeholder carries a sentinel column)
      case Some(tid) if masked.restore(tid).equalsIgnoreCase("a") &&
          !inputDf.columns.contains("__graft_no_input") => inputDf
      case Some(tid) => resolveTable(masked.restore(tid))
      case None => inputDf
    }
    val fromDf = dedupColumns(fromDf0)

    val bDfRaw0 = ast.join.map(j => dedupColumns(resolveTable(masked.restore(j.tableId))))

    // Order-sensitive aggregates (ARRAY_AGG/ANY_VALUE) read NR even when
    // the query text doesn't: their per-group semantics are pinned to
    // record order (first-seen / insertion order, rbql_engine.py:317-325,
    // 446-458) — without the pin, collect_list/first order would be
    // partition-dependent in a distributed plan.
    val usesOrderedAgg = OrderedAggRe.findFirstMatchIn(stageMaskedText).isDefined
    val distinctMode = ast.select.exists(s => s.distinct || s.distinctCount)
    // ordered mode: narrow plans (no join/sort/dedup) keep input order for
    // free (collect concatenates partitions in order); only shuffling
    // operators need the NR pin
    val orderPin = ordered &&
      (ast.join.isDefined || ast.orderBy.isDefined || distinctMode)
    val usesNuEarly = ExprTranslator.NuRe.findFirstIn(stageMaskedText).isDefined
    // opt-in strict JSON key access (r13 verdict item 3): missing-key
    // reads raise the reference's per-record error instead of binding
    // null — the guard's message needs the record number, so sides with
    // variant subscripts materialize NR up front
    val strictJson = spark.conf
      .getOption("spark.graft.json.strictKeys").exists(_.toBoolean)
    val strictSides =
      if (strictJson) ExprTranslator.stageStrictJsonSides(stageMaskedText)
      else Set.empty[Char]
    val usesNr = ExprTranslator.NrRe.findFirstIn(stageMaskedText).isDefined ||
      ExprTranslator.DotNrRe.findFirstIn(stageMaskedText).isDefined ||
      usesOrderedAgg || orderPin || strictSides.contains('a') ||
      // NU over a join needs the record-order sort key
      (usesNuEarly && ast.join.isDefined)
    val usesBNr = ExprTranslator.BNrRe.findFirstIn(stageMaskedText).isDefined ||
      strictSides.contains('b') ||
      // bNF over a CSV-marked B table is per-record on matched rows but
      // the table max width on unmatched LEFT JOIN rows (reference
      // null_record, rbql_engine.py:586) — bNR is the match indicator
      (ExprTranslator.BNfRe.findFirstIn(stageMaskedText).isDefined &&
        bDfRaw0.exists(b => graft.sources.CsvSource.isMissingMarked(b.schema))) ||
      (ordered && ast.join.isDefined)

    // B-side record number (join key `bNR`/`b.NR`, and the within-A-record
    // output order pin: the reference emits a record's B matches in B
    // insertion order, rbql_engine.py:1380-1388 hash_map append order)
    val bDfRaw =
      if (usesBNr) bDfRaw0.map(b => withNr(b).withColumnRenamed(NrCol, BNrCol))
      else bDfRaw0

    // A-side join keys read per record with an ERROR on missing fields
    // (reference safe_join_get, rbql_engine.py:253-257 → 'No "aN" field
    // at record NR', :758-759) — unlike plain reads, which pad None.
    // Only CSV-marked columns can be record-missing, and the guard's
    // message needs NR, so a marked A table under a JOIN materializes it.
    val aKeyGuard = ast.join.isDefined &&
      (graft.sources.CsvSource.isMissingMarked(fromDf.schema) ||
        fromDf.columns.contains(ExprTranslator.FieldsCol))
    val aDf0 = if (usesNr || aKeyGuard) withNr(fromDf) else fromDf
    val tr = new ExprTranslator(aDf0.schema, bDfRaw.map(_.schema), masked,
      strictJsonKeys = strictJson)
    val aDf = {
      val base =
        if (aKeyGuard) guardAJoinKeys(aDf0, ast.join.get.onRaw, tr)
        else aDf0
      base.alias("graft_a")
    }

    // reference HashJoinMap.build (rbql_engine.py:1362-1373): a join key
    // index past a B record's own width is a build-time error, not a null
    // key. Only CSV-backed B tables carry per-record width information
    // (missing-as-null marker), so the check is confined to the parity
    // surface — parquet/scale joins pay nothing.
    ast.join.foreach { j =>
      if (bDfRaw0.exists(b => graft.sources.CsvSource.isMissingMarked(b.schema)))
        verifyCsvJoinKeys(bDfRaw.get, j.onRaw, tr)
    }

    // ---- UPDATE path (projection-as-mutation, README.md:82-84) -------
    val usesNu = usesNuEarly
    if (usesNu && ast.update.isEmpty)
      Errors.parsing("NU (number of updated records) is only defined in UPDATE queries")
    ast.update.foreach { upd =>
      if (ast.where.exists(w => ExprTranslator.NuRe.findFirstIn(w).isDefined))
        Errors.parsing("NU cannot be used in WHERE (it counts rows the WHERE already matched)")
      return buildUpdate(aDf, aDf0, bDfRaw, ast, upd, tr, ordered, usesNu)
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
      case Some(w) => joined.filter(pyTruthy(joined, tr.translate(w)))
      case None => joined
    }

    // ---- classify select items --------------------------------------
    val aCols = aDf0.schema.fieldNames.toSeq
    val bCols = bDfRaw.map(_.schema.fieldNames.toSeq).getOrElse(Seq.empty)

    val isStar: String => Option[Seq[(String, Column)]] = raw => raw.trim match {
      case "*" =>
        val a = starCols("graft_a", aDf0.schema)
        val b = bDfRaw.map(b0 => starCols("graft_b", b0.schema)).getOrElse(Seq.empty)
        Some(a ++ b)
      case "a.*" => Some(starCols("graft_a", aDf0.schema))
      case "b.*" =>
        if (bCols.isEmpty) Errors.parsing("b.* used without JOIN")
        Some(starCols("graft_b", bDfRaw.get.schema))
      case _ => None
    }

    sel.exceptCols.foreach { exc =>
      return buildExcept(filtered, ast, sel, exc, tr, aCols, ordered)
    }

    val classified = sel.items.map { it =>
      (it, if (isStar(it.rawExpr).isDefined) None
      else Some(Aggregates.classify(it.rawExpr, tr.translate)))
    }
    val hasAgg = ast.groupBy.isDefined ||
      classified.exists(_._2.exists(_.agg.isDefined))

    val headerCtx = HeaderCtx(
      aHasHeader = hasRealHeader(aDf0.schema),
      bHasHeader = bDfRaw.exists(b => hasRealHeader(b.schema)),
      // positional output names resolve against the REAL header only
      // (reference select_output_header: column_index < len(input_header)
      // → header name, else colN — rbql_engine.py:1445-1451); synthetic
      // past-header padding columns never name an output
      aUserCols = realHeader(aDf0.schema),
      bUserCols = bDfRaw.map(b => realHeader(b.schema)).getOrElse(Seq.empty),
      masked = masked)

    val result =
      if (hasAgg) buildAggregate(filtered, ast, sel, classified, tr, headerCtx)
      else buildProjection(filtered, ast, sel, classified, isStar, tr, ordered, headerCtx)

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

  private def isInternalCol(c: String): Boolean =
    c == NrCol || c == BNrCol || c == ExprTranslator.NuCol

  /** User-facing name of a field (original header name when the column was
    * renamed for internal addressability). */
  def originalName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(graft.Graft.OriginalNameKey))
      f.metadata.getString(graft.Graft.OriginalNameKey)
    else f.name

  /** Duplicate or empty column names (legal headers in the reference's
    * model) are renamed to unique internals, with the original name kept
    * in metadata for variable resolution and output headers. */
  private def dedupColumns(df: DataFrame): DataFrame = {
    val names = df.columns
    val bad = names.diff(names.distinct).toSet
    if (bad.isEmpty && !names.contains("")) return df
    // toDF renames positionally (duplicate names can't be referenced);
    // original metadata is reattached from the pre-rename schema
    val tmp = df.toDF(names.indices.map(i => s"__graft_t$i"): _*)
    tmp.select(df.schema.fields.zipWithIndex.map { case (f, i) =>
      if (bad.contains(f.name) || f.name.isEmpty) {
        val meta = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putString(graft.Graft.OriginalNameKey, f.name).build()
        col(s"__graft_t$i").as(s"__graft_col$i", meta)
      } else col(s"__graft_t$i").as(f.name, f.metadata)
    }.toIndexedSeq: _*)
  }

  private def isSynthetic(f: org.apache.spark.sql.types.StructField): Boolean =
    f.metadata.contains(graft.Graft.SyntheticNameKey) &&
      f.metadata.getBoolean(graft.Graft.SyntheticNameKey)

  /** The side's real header: the leading non-synthetic field names. A
    * headered CSV whose widest data row exceeds the header keeps its header
    * — the past-header columns are synthetic padding (projectFields), not
    * evidence of headerlessness. Fully-synthetic schema ⇒ empty (reference
    * input_header = None mode). */
  private def realHeader(schema: org.apache.spark.sql.types.StructType): Seq[String] =
    schema.fields.toSeq.filterNot(f => isInternalCol(f.name))
      .takeWhile(!isSynthetic(_)).map(originalName)

  /** True when the side's column names come from a real header (parquet /
    * CSV-with-header / user-provided names) rather than being synthetic
    * a1..aN positional names (reference input_header = None mode). */
  private def hasRealHeader(schema: org.apache.spark.sql.types.StructType): Boolean =
    realHeader(schema).nonEmpty

  private def starCols(
      alias: String, schema: org.apache.spark.sql.types.StructType): Seq[(String, Column)] =
    schema.fields.toSeq.filterNot(f => isInternalCol(f.name)).map { f =>
      // output header keeps source names verbatim — duplicates across A/B
      // (and within a bad header) are allowed, like the reference
      // (select_output_header, rbql_engine.py:1431-1438, no renaming)
      (originalName(f), col(s"$alias.`${f.name.replace("`", "``")}`"))
    }

  /** ON: conjunction of equalities (reference parse_join_expression,
    * rbql_engine.py:991-1013 — equi-only, each side a plain variable).
    * Returns (aSide, bSide) SQL text per conjunct, normalized so the
    * graft_b-referencing side is second; validates sides like the
    * reference's resolve_join_variables (rbql_engine.py:1016-1046).
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
      val validSyntax =
        "Valid JOIN syntax: <JOIN> /path/to/B/table on a... == b... [and a... == b... [and ... ]]"
      // classification is SYNTACTIC, like the reference's variable maps
      // (parse_basic_variables & co. scan the query text, not the schema) —
      // an empty join table must still accept `on a2 == b1` and simply
      // produce no matches
      def sideKind(raw: String): (Char, String) = {
        val r = raw.trim
        val aVar = r == "NR" || r == "aNR" || r == "a.NR" ||
          r.matches("""a\d+""") || r.matches("""a\[.*\]""") ||
          r.matches("""a\.[A-Za-z_][A-Za-z0-9_]*""")
        val bVar = r == "bNR" || r == "b.NR" ||
          r.matches("""b\d+""") || r.matches("""b\[.*\]""") ||
          r.matches("""b\.[A-Za-z_][A-Za-z0-9_]*""")
        // JOIN keys are STRICT about positional range (reference
        // resolve_join_variables: 'No field with index N ... in "B"
        // table') — unlike plain expression reads, which pad None
        // (safe_get). An empty join table is NOT an error — positional
        // vars resolve to null there and simply never match.
        def strictRange(raw0: String): Unit =
          """^([ab])(\d+)$""".r.findFirstMatchIn(raw0)
            .orElse("""^([ab])\[(\d+)\]$""".r.findFirstMatchIn(raw0))
            .foreach(m => tr.checkJoinKeyRange(m.group(1).charAt(0),
              m.group(2).toInt))
        if (aVar) { strictRange(r); ('a', tr.translate(r)) }
        else if (bVar) { strictRange(r); ('b', tr.translate(r)) }
        else {
          val t = (try tr.translate(raw) catch { case _: GraftError => "" }).trim
          if (t.startsWith("graft_a.`")) ('a', t)
          else if (t.startsWith("graft_b.`")) ('b', t)
          else ('?', t)
        }
      }
      val (k1, t1) = sideKind(sides._1)
      val (k2, t2) = sideKind(sides._2)
      // reference resolve_join_variables (rbql_engine.py:1016-1046): if the
      // second var is an input-table var, swap; then the first must be an
      // input var and the second a join var
      val ((ka, ta, ra), (kb, tb, rb)) =
        if (k2 == 'a') ((k2, t2, sides._2), (k1, t1, sides._1))
        else ((k1, t1, sides._1), (k2, t2, sides._2))
      if (ka != 'a') Errors.parsing(
        s"""Unable to parse JOIN expression: Input table does not have field "${ra.trim}"\n$validSyntax""")
      if (kb != 'b') Errors.parsing(
        s"""Unable to parse JOIN expression: Join table does not have field "${rb.trim}"\n$validSyntax""")
      (ta, tb)
    }

  /** Eager join-map width check for CSV-backed B tables (reference
    * HashJoinMap.get_single_key / get_multi_key, rbql_engine.py:1362-1373):
    * the first B record (in file order) whose width does not reach a join
    * key's index fails the build with the reference's message. One bounded
    * extra job over the (small, broadcast-side) B table; key indices are
    * checked in ON-clause order like the reference's key_indices loop. */
  private def verifyCsvJoinKeys(
      bDf: DataFrame, onRaw: String, tr: ExprTranslator): Unit = {
    val userNames = bDf.columns.filterNot(n => n == NrCol || n == BNrCol)
    val QualRe = """graft_b\.`((?:[^`]|``)*)`""".r
    val keyIdx = joinPairs(onRaw, tr).flatMap { case (_, b) =>
      b.trim match {
        case QualRe(esc) =>
          val name = esc.replace("``", "`")
          if (name == BNrCol) None // bNR join key: defined for every record
          else Some(userNames.indexOf(name)).filter(_ >= 0)
        case _ => None
      }
    }
    if (keyIdx.isEmpty) return
    val withBnr =
      if (bDf.columns.contains(BNrCol)) bDf
      else withNr(bDf).withColumnRenamed(NrCol, BNrCol)
    def ref(n: String) = col(s"`${n.replace("`", "``")}`")
    val firstMissing = coalesce(keyIdx.map(i =>
      when(ref(userNames(i)).isNull, lit(i + 1))): _*)
    val bad = withBnr
      .select(col(BNrCol).cast("long").alias("__nr"), firstMissing.alias("__ki"))
      .filter(col("__ki").isNotNull)
      .orderBy(col("__nr"))
      .limit(1).collect()
    bad.headOption.foreach { r =>
      Errors.runtime(
        s"""No field with index ${r.get(1)} at record ${r.getLong(0)} in "B" table""")
    }
  }

  /** A-side counterpart of [[verifyCsvJoinKeys]] (reference safe_join_get,
    * rbql_engine.py:253-257: reading a join key from an A record shorter
    * than the key index raises 'No "aN" field at record NR',
    * rbql_engine.py:758-759 — plain expression reads pad None instead).
    * The guard is an IN-JOB assert on the pre-join A side — no extra scan
    * over the potentially-large input table — and applies only to join-key
    * columns carrying the CSV reader's missing-as-null marker (a marked
    * null is structurally missing; CSV fields are never null otherwise).
    * Across partitions the reported record is the first failure the
    * scheduler surfaces, not necessarily the global minimum NR (the
    * reference processes sequentially); single-file parity inputs read as
    * one partition, where the two agree. */
  private def guardAJoinKeys(aDf: DataFrame, onRaw: String,
      tr: ExprTranslator): DataFrame = {
    val QualRe = """graft_a\.`((?:[^`]|``)*)`""".r
    // ragged (fields-array) model: a positional key translates to
    // try_element_at over the fields column — missing ⟺ the record is
    // shorter than the index (probed: the reference raises at the first
    // record whose width misses the key, even when every OTHER record
    // joins fine)
    val RaggedRe =
      ("""try_element_at\(graft_a\.`""" + ExprTranslator.FieldsCol +
        """`, (\d+)\)""").r
    val userNames = aDf.columns.filterNot(n => n == NrCol || n == BNrCol)
    val pairs = joinPairs(onRaw, tr)
    val marked = pairs.flatMap { case (a, _) =>
      a.trim match {
        case QualRe(esc) =>
          val name = esc.replace("``", "`")
          aDf.schema.fields.find(_.name == name).collect {
            case f if f.metadata.contains(graft.sources.CsvSource.MissingNullKey) &&
                f.metadata.getBoolean(graft.sources.CsvSource.MissingNullKey) &&
                userNames.indexOf(name) >= 0 =>
              (ref(name).isNull, userNames.indexOf(name) + 1)
          }
        case RaggedRe(n) =>
          Some((size(col(s"`${ExprTranslator.FieldsCol}`")) < n.toInt,
            n.toInt))
        case _ => None
      }
    }
    if (marked.isEmpty) return aDf
    // first missing key in ON-clause order, like the reference's
    // sequential lhs evaluation
    val firstBad = coalesce(marked.map { case (miss, i) =>
      when(miss, lit(i)) }: _*)
    aDf.where(assert_true(firstBad.isNull,
      concat(lit("No \"a"), firstBad.cast("string"),
        lit("\" field at record "), col(NrCol).cast("string"))).isNull)
  }

  private def ref(n: String) = col(s"`${n.replace("`", "``")}`")

  /** Join keys compare null-safely (`<=>`): the reference's join map is a
    * Python dict, where a None key matches a None key (rbql_engine.py:
    * 1371-1392). EqualNullSafe is still extracted as an equi-join key by
    * Catalyst, so broadcast/shuffle-hash planning is unaffected. */
  private def joinCondition(onRaw: String, tr: ExprTranslator): Column =
    joinPairs(onRaw, tr).map { case (a, b) => expr(a) <=> expr(b) }
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

  /** STRICT LEFT JOIN: error unless every A row has exactly one B match —
    * zero matches is an error too (reference StrictLeftJoiner,
    * rbql_engine.py:595-603). Cardinality is checked by joining B against
    * its own per-key counts — an aggregation of the (small) build side that
    * broadcasts, instead of re-shuffling the full joined result by a
    * per-row id. Fails inside the job via assert_true (no driver collect). */
  private def strictLeftJoin(aDf: DataFrame, bDfUnaliased: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    val keyAliases = pairs.indices.map(i => s"__graft_sk$i")
    val cnt = bDfUnaliased.alias("graft_b")
      .groupBy(pairs.zip(keyAliases).map { case ((_, b), n) => expr(b).alias(n) }: _*)
      .agg(count(lit(1)).alias("__graft_cnt"))
    val bPlus = bDfUnaliased.alias("graft_b")
      .join(cnt, pairs.zip(keyAliases).map { case ((_, b), n) =>
        expr(b) <=> col(n)
      }.reduce(_ && _))
      .drop(keyAliases: _*)
      .alias("graft_b")
    val cond = pairs.map { case (a, b) => expr(a) <=> expr(b) }.reduce(_ && _)
    aDf.join(bPlus, cond, "left_outer")
      // unmatched rows carry a null count — that is the zero-match error case
      .where(assert_true(coalesce(col("__graft_cnt"), lit(0L)) === 1,
        lit("In \"STRICT LEFT JOIN\" each key in A must have exactly one match in B")).isNull)
      .drop("__graft_cnt")
  }

  // ---- UPDATE ---------------------------------------------------------
  /** UPDATE emits every input row, with assigned columns replaced where the
    * WHERE predicate holds (README.md:82-84 — "a special type of SELECT").
    * With JOIN: at most one B match allowed per A row (error if more), zero
    * matches ⇒ predicate treated as false (reference PROCESS_UPDATE_JOIN,
    * rbql_engine.py:682-697). RHS expressions read the ORIGINAL record
    * (reference binds a-vars from record_a before the assignments run), so
    * `update set a1 = a2, a2 = a1` swaps. */
  private def buildUpdate(
      aDf0Aliased: DataFrame,
      aDf0: DataFrame,
      bDfRaw: Option[DataFrame],
      ast: StageAst,
      upd: UpdateSpec,
      tr: ExprTranslator,
      ordered: Boolean,
      usesNu: Boolean): DataFrame = {
    // NU without a join counts over the raw record stream (already in
    // record order — narrow scan)
    val aDf =
      if (usesNu && ast.join.isEmpty)
        withNu(aDf0Aliased,
          ast.where.map(w => pyTruthy(aDf0Aliased, tr.translate(w))).getOrElse(lit(true)))
          .alias("graft_a")
      else aDf0Aliased
    val pred: Column = ast.where.map(w => pyTruthy(aDf, tr.translate(w))).getOrElse(lit(true))
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
            expr(b) <=> col(n)
          }.reduce(_ && _))
          .drop(keyAliases: _*)
          .alias("graft_b")
        val cond = pairs.map { case (a, b) => expr(a) <=> expr(b) }.reduce(_ && _)
        val guarded = aDf.join(bPlus, cond, "left_outer")
          .where(assert_true(col("__graft_cnt").isNull || col("__graft_cnt") <= 1,
            lit("More than one record in UPDATE query matched a key from the input table in the join table")).isNull)
        // join-kind semantics on unmatched A rows (reference get_rhs):
        //   INNER  → no match list ⇒ predicate false, row passes unchanged
        //   LEFT   → one null record ⇒ predicate runs with null b-vars
        //            (update_left_join: unmatched rows DO update, with null)
        //   STRICT → exactly-one required ⇒ error on zero matches
        val (g0, p0) = j.kind match {
          case JoinKind.Inner => (guarded, pred && col("__graft_cnt").isNotNull)
          case JoinKind.Left => (guarded, pred)
          case JoinKind.StrictLeft =>
            val g = guarded.where(assert_true(
              coalesce(col("__graft_cnt"), lit(0L)) === 1,
              lit("In \"STRICT LEFT JOIN\" each key in A must have exactly one match in B")).isNull)
            (g, pred)
        }
        // NU over a join: the shuffle destroyed record order, so restore it
        // by NR before the running count (reference PROCESS_UPDATE_JOIN
        // increments NU per matched A record in input order)
        if (usesNu) (withNu(g0.orderBy(col(NrCol)), p0), p0)
        else (g0, p0)
    }

    val raggedA = aDf0.columns.contains(ExprTranslator.FieldsCol)
    val keepNr = ordered && ast.join.isDefined && aDf0.columns.contains(NrCol)

    val projected =
      if (raggedA) {
        // ragged records: positional assignment inside the fields array;
        // unassigned positions and the record's own length are untouched
        // (reference up_fields = record_a[:], PROCESS_UPDATE_SIMPLE)
        val positions: Seq[(Int, Column)] = upd.assignments.map {
          case (varRef, valueExpr) =>
            (resolveAssignPos(varRef), PyEq.expr(tr.translate(valueExpr)))
        }
        var f = col(s"graft_a.`${ExprTranslator.FieldsCol}`")
        positions.foreach { case (pos, v) =>
          // i is the 0-based index inside transform; RHS reads the original
          // record because the value expr references graft_a columns, not `f`
          f = transform(f,
            (x, i) => when(i === (pos - 1) && effPred, v.cast("string")).otherwise(x))
        }
        val outCols = Seq(f.alias(ExprTranslator.FieldsCol)) ++
          (if (keepNr) Seq(col(s"graft_a.`$NrCol`").alias("__graft_ordnr")) else Seq.empty)
        base.select(outCols: _*)
      } else {
        val assignTargets: Seq[(String, Column)] = upd.assignments.map {
          case (varRef, valueExpr) =>
            (resolveAssignTargetName(varRef, tr), PyEq.expr(tr.translate(valueExpr)))
        }
        val outCols = aDf0.schema.fieldNames.filterNot(isInternalCol).map { c =>
          val q = col(s"graft_a.`${c.replace("`", "``")}`")
          assignTargets.find(_._1 == c) match {
            case Some((_, v)) => when(effPred, v).otherwise(q).alias(c)
            case None => q.alias(c)
          }
        }.toSeq ++ (if (keepNr) Seq(col(s"graft_a.`$NrCol`").alias("__graft_ordnr")) else Seq.empty)
        base.select(outCols.toIndexedSeq: _*)
      }

    // UPDATE with JOIN shuffles; parity mode restores the input order
    // (reference PROCESS_UPDATE_JOIN iterates A records sequentially)
    if (keepNr) projected.orderBy(col("__graft_ordnr").asc).drop("__graft_ordnr")
    else projected
  }

  // ---- SELECT EXCEPT --------------------------------------------------
  private def buildExcept(
      filtered: DataFrame,
      ast: StageAst,
      sel: SelectSpec,
      exc: Seq[String],
      tr: ExprTranslator,
      aCols: Seq[String],
      ordered: Boolean): DataFrame = {
    val dropNames = exc.map(v => resolveAssignTargetName(v, tr))
    dropNames.find(n => !aCols.contains(n)).foreach(n =>
      Errors.parsing(s"EXCEPT column '$n' not found"))
    val kept = aCols.filterNot(c => dropNames.contains(c) || isInternalCol(c))
    val pinNames =
      if (ordered && ast.join.isDefined && ast.orderBy.isEmpty && !sel.distinct)
        Seq("__graft_ordnr") ++
          (if (filtered.columns.contains(BNrCol)) Seq("__graft_ordbnr") else Seq.empty)
      else Seq.empty
    val pinCols = pinNames.map {
      case "__graft_ordnr" => col(s"graft_a.`$NrCol`").alias("__graft_ordnr")
      case n => col(s"graft_b.`$BNrCol`").alias(n)
    }
    var out = filtered.select((kept.map(c =>
      col(s"graft_a.`${c.replace("`", "``")}`").alias(c)) ++ pinCols).toIndexedSeq: _*)
    if (sel.distinct) out = out.dropDuplicates(kept)
    if (pinNames.nonEmpty)
      out = out.orderBy(pinNames.map(col(_).asc): _*)
    out = applyOrderBySimple(out, ast, tr)
    out = out.drop("__graft_ordnr", "__graft_ordbnr")
    (sel.topN orElse ast.limit).map(n => out.limit(checkInt(n))).getOrElse(out)
  }

  private def resolveAssignTargetName(varRef: String, tr: ExprTranslator): String = {
    val translated = tr.translate(varRef).trim
    """^graft_a\.`(.*)`$""".r.findFirstMatchIn(translated)
      .map(_.group(1).replace("``", "`"))
      .getOrElse(Errors.parsing(s"UPDATE/EXCEPT entries must be input-column variables, got '$varRef'"))
  }

  /** 1-based field position of an assignment target on a ragged table
    * (positional addressing only — there are no names to assign through). */
  private def resolveAssignPos(varRef: String): Int = {
    val t = varRef.trim
    """^a(\d+)$""".r.findFirstMatchIn(t).map(_.group(1).toInt)
      .orElse("""^a\[(\d+)\]$""".r.findFirstMatchIn(t).map(_.group(1).toInt))
      .getOrElse(Errors.parsing(
        s"UPDATE on a ragged (variable-width) table requires positional targets (aN), got '$varRef'"))
  }

  // ---- output header --------------------------------------------------
  /** Context for output-header inference (reference select_output_header,
    * rbql_engine.py:1411-1454). */
  private case class HeaderCtx(
      aHasHeader: Boolean,
      bHasHeader: Boolean,
      aUserCols: Seq[String],
      bUserCols: Seq[String],
      masked: Lexer.Masked)

  private val HdrPosVar = """^([ab])(\d+)$""".r
  private val HdrBracketPos = """^([ab])\[(\d+)\]$""".r
  private val HdrDotName = """^([ab])\.([A-Za-z_][A-Za-z0-9_]*)$""".r
  private val HdrBracketName = """^([ab])\[###GRAFT_S(\d+)E###\]$""".r
  private val HdrBareIdent = """^[A-Za-z_][A-Za-z0-9_]*$""".r

  /** Output column name at 1-based output position `pos` (position counts
    * previously-expanded stars, reference len(output_header)+1). */
  private def headerName(item: SelectItem, pos: Int, ctx: HeaderCtx): String = {
    item.alias.getOrElse {
      val t = item.rawExpr.trim
      def posName(side: String, n: Int): String = {
        val (has, cols) =
          if (side == "a") (ctx.aHasHeader, ctx.aUserCols)
          else (ctx.bHasHeader, ctx.bUserCols)
        if (has && n >= 1 && n <= cols.length) cols(n - 1) else s"col$pos"
      }
      t match {
        case HdrPosVar(s, n) => posName(s, n.toInt)
        case HdrBracketPos(s, n) => posName(s, n.toInt)
        case HdrDotName(_, name) => name // a.vehicle → "vehicle" (no prefix)
        case HdrBracketName(_, idx) =>
          ExprTranslator.unquote(ctx.masked.literals(idx.toInt))
        case HdrBareIdent() if !Set("true", "false", "null").contains(t.toLowerCase(java.util.Locale.ROOT)) =>
          t // NR, NF, aNR, bNR, NU, RBQL_VERSION, ... keep the variable name
        case _ => s"col$pos"
      }
    }
  }

  // ---- aggregate path -------------------------------------------------
  private def buildAggregate(
      filtered: DataFrame,
      ast: StageAst,
      sel: SelectSpec,
      classified: Seq[(SelectItem, Option[Aggregates.Item])],
      tr: ExprTranslator,
      headerCtx: HeaderCtx): DataFrame = {
    if (ast.orderBy.isDefined)
      Errors.parsing("ORDER BY is not allowed in aggregate queries (group keys define the output order)")
    if (sel.distinct || sel.distinctCount)
      Errors.parsing("DISTINCT is not allowed in aggregate queries")

    val groupKeyTexts: Seq[String] =
      ast.groupBy.getOrElse(Seq.empty).map(k => tr.translate(k))
    val groupKeys: Seq[Column] = groupKeyTexts.map(t => PyEq.expr(t))

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
        val outName = headerName(item, idx + 1, headerCtx)
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
              val e = PyEq.expr(text)
              ConstOut(when(min(e) =!= max(e),
                raise_error(lit(s"Non-constant values in output column ${idx + 1} detected in aggregate query (column must be group-constant)")))
                .otherwise(min(e)))
            }
          case None => Errors.parsing("Star expansion is not allowed in aggregate queries")
        }
        (outName, out)
    }

    val internalNames = outs.indices.map(i => s"__graft_c$i")
    val aggCols = outs.zip(internalNames).collect {
      case ((_, AggOut(c)), n) => c.alias(n)
      case ((_, ConstOut(c)), n) => c.alias(n)
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
      val finalCols = outs.zip(internalNames).map {
        case ((_, KeyOut(ki)), _) => col(s"__graft_gk$ki")
        case ((_, _), n) => col(n)
      }
      filtered.groupBy(aliasedKeys.toIndexedSeq: _*)
        .agg(aggList.head, aggList.tail.toIndexedSeq: _*)
        .orderBy(groupKeys.indices.map(i => col(s"__graft_gk$i").asc).toIndexedSeq: _*)
        .select(finalCols.toIndexedSeq: _*)
        .toDF(outs.map(_._1): _*)
    } else {
      outs.collectFirst { case (_, KeyOut(_)) => () }.foreach { _ =>
        Errors.parsing("Non-aggregate column in a global aggregate query")
      }
      // grouped on a CONSTANT key, not df.agg(): the reference emits ZERO
      // rows for a global aggregate over no records (its global aggregate
      // is a group map with a constant key — no records, no entries;
      // rbql_engine.py AggregateWriter), where SQL's global aggregate
      // yields one row of COUNT=0/NULLs. Caught by the differential fuzz
      // on a fully-filtered WHERE. Same plan shape as the one-row path:
      // map-side partial aggregation into a single merged group.
      filtered.groupBy(lit(1).alias("__graft_gk0"))
        .agg(aggList.head, aggList.tail.toIndexedSeq: _*)
        .drop("__graft_gk0")
        .toDF(outs.map(_._1): _*)
    }
  }

  // ---- plain projection ----------------------------------------------
  /** Pipe parity (r15 advice): clear the CSV reader's missing-as-null
    * marker on non-star output slots. A SELECTed expression or bare
    * variable fills a fixed SLOT in the stage-output record — the value
    * may be None, but the slot exists (the reference builds stage output
    * as a literal list `[e1, e2, …]`, rbql_engine.py:1203-1219) — so a
    * later pipe stage must treat a null there as a VALUE: NF counts the
    * slot, the A-side join-key guard stays quiet, and the owid width
    * channel uses the constant stage width. Star-spliced columns keep the
    * marker: `select *` passes the ragged record itself, and the
    * reference's per-record NF / missing-key errors propagate through it
    * (probed live — see PipeStageMarkerSpec). */
  private def scrubMissingMarks(
      df: DataFrame, slotNames: Seq[String], fromStar: Seq[Boolean]): DataFrame = {
    def marked(f: org.apache.spark.sql.types.StructField): Boolean =
      f.metadata.contains(graft.sources.CsvSource.MissingNullKey) &&
        f.metadata.getBoolean(graft.sources.CsvSource.MissingNullKey)
    val starSlot = slotNames.zip(fromStar).toMap
    val fields = df.schema.fields
    if (!fields.exists(f => marked(f) && !starSlot.getOrElse(f.name, true)))
      return df
    df.select(fields.map { f =>
      val c = ref(f.name)
      if (marked(f) && !starSlot.getOrElse(f.name, true)) {
        val meta = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putBoolean(graft.sources.CsvSource.MissingNullKey, false).build()
        c.as(f.name, meta)
      } else c
    }.toIndexedSeq: _*)
  }

  private def buildProjection(
      filtered: DataFrame,
      ast: StageAst,
      sel: SelectSpec,
      classified: Seq[(SelectItem, Option[Aggregates.Item])],
      isStar: String => Option[Seq[(String, Column)]],
      tr: ExprTranslator,
      ordered: Boolean,
      headerCtx: HeaderCtx): DataFrame = {

    val raggedA = tr.isRaggedA
    // unpack operator `*expr` (reference Python star-unpacking in the select
    // tuple, `select *a2.split('|')` — 'unpack operator' corpus case):
    // spreads a list INTO the output record, producing ragged output rows.
    // Distinct from UNNEST, which emits one output record per element.
    val hasUnpack = classified.exists { case (item, _) =>
      val t = item.rawExpr.trim
      t.startsWith("*") && t.length > 1 && isStar(t).isEmpty
    }
    if (hasUnpack || (raggedA && classified.exists(c => isStar(c._1.rawExpr).isDefined)))
      return buildRaggedProjection(filtered, ast, sel, classified, isStar, tr, ordered)

    // headerless input: star + AS alias cannot be combined (reference
    // select_output_header, rbql_engine.py:1421-1423)
    val anyStar = classified.exists(c => isStar(c._1.rawExpr).isDefined)
    val anyAlias = classified.exists(_._1.alias.isDefined)
    if (!headerCtx.aHasHeader && anyStar && anyAlias)
      Errors.parsing("Using both * (star) and AS alias in the same query is not allowed for input tables without header")

    // UNNEST: exactly one per query (rbql_engine.py:843)
    var unnestIdx: Option[Int] = None

    val outPairs = scala.collection.mutable.ArrayBuffer.empty[(String, Column)]
    // which output slots came from star expansion: star splices the ragged
    // record itself (rbql_engine.py:665-668), so those columns keep the
    // reader's missing-as-null marker; every other slot is a fixed value
    // position in the stage-output list (rbql_engine.py:1203-1219) and the
    // marker is scrubbed below (r15 advice — leaked marks corrupted NF and
    // the join-key guard in later pipe stages)
    val slotFromStar = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    classified.foreach { case (item, cls) =>
      isStar(item.rawExpr) match {
        case Some(cols) =>
          outPairs ++= cols
          slotFromStar ++= Seq.fill(cols.size)(true)
        case None =>
          // use the polymorphic-rewritten text (min/max 2+args → least/
          // greatest) from classification, not the original raw
          val itemText = cls.map(_.raw).getOrElse(item.rawExpr)
          val (colExpr, fromUnnest) = buildItemColumn(itemText, tr,
            deferExplode = ordered && !sel.distinct && !sel.distinctCount)
          if (fromUnnest) {
            if (unnestIdx.isDefined) Errors.parsing("Only one UNNEST is allowed per query")
            unnestIdx = Some(outPairs.length)
          }
          outPairs += ((headerName(item, outPairs.length + 1, headerCtx), colExpr))
          slotFromStar += false
      }
    }

    val finalNames = outPairs.map(_._1).toSeq
    val internalNames = outPairs.indices.map(i => s"__graft_c$i")
    val internal = outPairs.zip(internalNames).map { case ((_, c), n) => c.alias(n) }

    // Structural output width per record (reference record-as-list len,
    // consumed by the CLI's write-side width check, rbql_csv.py:208-210):
    // fixed select items contribute 1 each; a star contributes the record's
    // own width — the last position PRESENT in the source record. Only
    // columns still carrying the reader's missing-as-null marker shorten
    // the width on null: a null in an UNMARKED column (e.g. a prior
    // UPDATE stage assigned None — the projection expression drops the
    // reader metadata) is a genuine None VALUE occupying its slot, so it
    // counts as present and writes as an empty field plus the reference's
    // None-warning, exactly like the reference's fixed-length record
    // list (r12 advice: last-non-null over output columns silently
    // shortened UPDATE-then-star records).
    // Parity-surface only (ordered + CSV-marked input, no join).
    val owidCol: Option[Column] =
      if (ordered && ast.join.isEmpty && anyStar &&
          !sel.distinct && !sel.distinctCount &&
          graft.sources.CsvSource.isMissingMarked(filtered.schema)) {
        // no-join: star columns align positionally with the input's
        // non-internal fields, whose metadata says which are reader-marked
        val starFields = filtered.schema.fields.toSeq
          .filterNot(f => isInternalCol(f.name))
        def marked(i: Int): Boolean = starFields.lift(i).exists(f =>
          f.metadata.contains(graft.sources.CsvSource.MissingNullKey) &&
            f.metadata.getBoolean(graft.sources.CsvSource.MissingNullKey))
        val parts = classified.map { case (item, _) =>
          isStar(item.rawExpr) match {
            case Some(cols) =>
              val whens = cols.zipWithIndex.map { case ((_, c), i) =>
                if (marked(i)) when(c.isNotNull, lit(i + 1)).otherwise(lit(0))
                else lit(i + 1)
              }
              greatest((whens :+ lit(0) :+ lit(0)): _*)
            case None => lit(1)
          }
        }
        Some(parts.reduce(_ + _).alias(OwidCol))
      } else None

    // hidden sort keys (ORDER BY may reference input variables that are not
    // selected — compute them pre-projection)
    val sortKeys = ast.orderBy.getOrElse(Seq.empty)
    // ORDER BY may also name an output alias (graft extension — the
    // reference evaluates sort keys against input variables only); aliases
    // resolve to the already-computed output column
    val hiddenCols = sortKeys.zipWithIndex.map { case (k, i) =>
      val keyCol = finalNames.indexOf(k.expr.trim) match {
        case -1 => PyEq.expr(tr.translate(k.expr))
        case oi => col(s"__graft_c$oi")
      }
      keyCol.alias(s"__graft_ord$i")
    }
    val distinctMode = sel.distinct || sel.distinctCount
    val hasNr = filtered.columns.contains(NrCol)
    val hasBNr = filtered.columns.contains(BNrCol)
    // stream-position tie/pin columns: NR, and bNR for joins (the reference
    // emits each A record's B matches in B insertion order)
    val pinNeeded = ordered && (sortKeys.nonEmpty || ast.join.isDefined || distinctMode)
    val nrTie: Seq[Column] =
      if (pinNeeded && hasNr)
        Seq(col(NrCol).alias("__graft_ordnr")) ++
          (if (hasBNr) Seq(col(BNrCol).alias("__graft_ordbnr")) else Seq.empty)
      else if (sortKeys.nonEmpty && !distinctMode && hasNr)
        Seq(col(NrCol).alias("__graft_ordnr"))
      else Seq.empty
    val tieNames = nrTie.indices.map(i => if (i == 0) "__graft_ordnr" else "__graft_ordbnr")

    var out = filtered.select(
      (internal ++ owidCol.toSeq ++ hiddenCols ++ nrTie).toIndexedSeq: _*)
    out = scrubMissingMarks(out, internalNames, slotFromStar.toSeq)

    if (distinctMode) {
      val singleDirection = sortKeys.map(_.asc).distinct.size <= 1
      if (ordered && singleDirection) {
        // Reference data flow: stable sort → first-seen dedup (writer
        // chain, rbql_engine.py:1554-1563). Each distinct tuple's output
        // position is its first occurrence in the (sorted) stream =
        // min(struct(sortKeys, NR, bNR)) ascending; DESC reverses the
        // stably-sorted stream, making it max(...) descending (ties
        // reverse too — Python list.reverse after stable sort).
        val asc = sortKeys.forall(_.asc)
        val posParts = sortKeys.indices.map(i => col(s"__graft_ord$i")) ++
          tieNames.map(col(_))
        val posStruct = struct(posParts: _*)
        val grouped = out.groupBy(internalNames.map(col(_)): _*)
        val aggs: Seq[Column] =
          (if (sel.distinctCount) Seq(count(lit(1)).alias("count")) else Seq.empty) :+
            (if (asc) min(posStruct) else max(posStruct)).alias("__graft_ordk")
        out = grouped.agg(aggs.head, aggs.tail: _*)
          .orderBy(if (asc) col("__graft_ordk").asc else col("__graft_ordk").desc)
          .drop("__graft_ordk")
      } else {
        // unordered mode (scale surface): same rows, order pinned only by
        // the ORDER BY keys themselves
        val outTexts: Set[String] = classified.flatMap { case (item, cls) =>
          if (isStar(item.rawExpr).isDefined) Nil
          else scala.util.Try(
            tr.translate(cls.map(_.raw).getOrElse(item.rawExpr))).toOption.toList
        }.toSet
        val covered = sortKeys.forall(k =>
          finalNames.contains(k.expr.trim) ||
            scala.util.Try(tr.translate(k.expr)).toOption.exists(outTexts.contains))
        if (covered) {
          val ordNames = sortKeys.indices.map(i => s"__graft_ord$i")
          val groupCols = (internalNames ++ ordNames).map(col(_))
          out =
            if (sel.distinctCount)
              out.groupBy(groupCols: _*).agg(count(lit(1)).alias("count"))
            else out.dropDuplicates((internalNames ++ ordNames).toSeq)
          if (sortKeys.nonEmpty)
            out = out.orderBy(sortKeys.zipWithIndex.map { case (k, i) =>
              val c = col(s"__graft_ord$i"); if (k.asc) c.asc else c.desc
            }.toIndexedSeq: _*).drop(ordNames: _*)
        } else {
          if (sortKeys.map(_.asc).distinct.size > 1)
            Errors.parsing("With DISTINCT, ORDER BY keys outside the SELECT list must use a single direction; use a pipe stage instead")
          val asc = sortKeys.forall(_.asc)
          val grouped = out.groupBy(internalNames.map(col(_)): _*)
          val aggs: Seq[Column] =
            (if (sel.distinctCount) Seq(count(lit(1)).alias("count")) else Seq.empty) ++
              (if (sortKeys.nonEmpty) {
                val keyStruct = struct(sortKeys.indices.map(i => col(s"__graft_ord$i")): _*)
                Seq((if (asc) min(keyStruct) else max(keyStruct)).alias("__graft_ordk"))
              } else Seq.empty)
          out =
            if (aggs.nonEmpty) grouped.agg(aggs.head, aggs.tail: _*)
            else out.dropDuplicates(internalNames.toSeq)
          if (sortKeys.nonEmpty) {
            out = out.orderBy(if (asc) col("__graft_ordk").asc else col("__graft_ordk").desc)
              .drop("__graft_ordk")
          }
        }
      }
      // occurrence count prepended as first column (UniqCountWriter,
      // rbql_engine.py:518-537)
      if (sel.distinctCount) {
        out = out.select((col("count") +: internalNames.map(col(_))).toIndexedSeq: _*)
        return out.toDF(("count" +: finalNames): _*)
      }
      out = out.select(internalNames.map(col(_)).toIndexedSeq: _*)
      return out.toDF(finalNames: _*)
    }

    if (sortKeys.nonEmpty) {
      val ordCols = sortKeys.zipWithIndex.map { case (k, i) =>
        val c = col(s"__graft_ord$i"); if (k.asc) c.asc else c.desc
      } ++ tieNames.map { n =>
        // stable sort: reference reverses the stably-sorted list for DESC
        // (rbql_engine.py:550-557) → tiebreaker follows the direction
        val c = col(n)
        if (sortKeys.forall(_.asc)) c.asc else c.desc
      }
      out = out.orderBy(ordCols.toIndexedSeq: _*)
    } else if (pinNeeded && tieNames.nonEmpty) {
      // join without ORDER BY: restore the reference's stream order
      // (A record order, B matches in B insertion order)
      out = out.orderBy(tieNames.map(col(_).asc): _*)
    }
    out = out.drop(sortKeys.indices.map(i => s"__graft_ord$i"): _*)
      .drop(tieNames: _*)

    // deferred UNNEST explode (ordered mode): explode AFTER the sort so the
    // array's own element order survives — sorted output is range-
    // partitioned and the subsequent narrow explode preserves intra-
    // partition order (Spark's sort is not stable, so exploding first would
    // scramble elements that share all sort keys)
    unnestIdx.foreach { ui =>
      if (ordered && !sel.distinct && !sel.distinctCount) {
        val cols = internalNames.zipWithIndex.map { case (n, i) =>
          if (i == ui) explode(col(n)).alias(n) else col(n)
        } ++ owidCol.map(_ => col(OwidCol)).toSeq
        out = out.select(cols.toIndexedSeq: _*)
      }
    }

    if (owidCol.isDefined) out.toDF((finalNames :+ OwidCol): _*)
    else out.toDF(finalNames: _*)
  }

  /** Ragged output: any `*expr` unpack (or a star over a ragged table)
    * spreads a list inline into the record, so the output is a single
    * fields-array column (the reference's record-as-list model). The
    * in-memory / CLI surfaces spread it back into per-record field lists. */
  private def buildRaggedProjection(
      filtered: DataFrame,
      ast: StageAst,
      sel: SelectSpec,
      classified: Seq[(SelectItem, Option[Aggregates.Item])],
      isStar: String => Option[Seq[(String, Column)]],
      tr: ExprTranslator,
      ordered: Boolean): DataFrame = {
    if (sel.distinct || sel.distinctCount)
      Errors.parsing("DISTINCT is not supported with ragged (unpacked) output")
    val parts: Seq[Column] = classified.map { case (item, cls) =>
      val t = item.rawExpr.trim
      isStar(t) match {
        case Some(cols) =>
          // star over ragged A yields the fields array itself; fixed-width
          // sides contribute their columns as strings
          concat(cols.map { case (n, c) =>
            if (n == ExprTranslator.FieldsCol) c else array(c.cast("string"))
          }: _*)
        case None if t.startsWith("*") && t.length > 1 =>
          expr(tr.translate(cls.map(_.raw).getOrElse(item.rawExpr).trim.substring(1)))
            .cast("array<string>")
        case None =>
          val itemText = cls.map(_.raw).getOrElse(item.rawExpr)
          array(PyEq.expr(tr.translate(itemText)).cast("string"))
      }
    }
    val fieldsCol = (if (parts.length == 1) parts.head else concat(parts: _*))
      .alias(ExprTranslator.FieldsCol)

    val sortKeys = ast.orderBy.getOrElse(Seq.empty)
    val hiddenCols = sortKeys.zipWithIndex.map { case (k, i) =>
      PyEq.expr(tr.translate(k.expr)).alias(s"__graft_ord$i")
    }
    val hasNr = filtered.columns.contains(NrCol)
    val hasBNr = filtered.columns.contains(BNrCol)
    val pinNeeded = ordered && (sortKeys.nonEmpty || ast.join.isDefined)
    val nrTie: Seq[Column] =
      if (pinNeeded && hasNr)
        Seq(col(NrCol).alias("__graft_ordnr")) ++
          (if (hasBNr) Seq(col(BNrCol).alias("__graft_ordbnr")) else Seq.empty)
      else Seq.empty
    val tieNames = nrTie.indices.map(i => if (i == 0) "__graft_ordnr" else "__graft_ordbnr")

    var out = filtered.select((Seq(fieldsCol) ++ hiddenCols ++ nrTie).toIndexedSeq: _*)
    if (sortKeys.nonEmpty) {
      val ordCols = sortKeys.zipWithIndex.map { case (k, i) =>
        val c = col(s"__graft_ord$i"); if (k.asc) c.asc else c.desc
      } ++ tieNames.map { n =>
        val c = col(n); if (sortKeys.forall(_.asc)) c.asc else c.desc
      }
      out = out.orderBy(ordCols.toIndexedSeq: _*)
    } else if (tieNames.nonEmpty) {
      out = out.orderBy(tieNames.map(col(_).asc): _*)
    }
    out.drop(sortKeys.indices.map(i => s"__graft_ord$i"): _*)
      .drop(tieNames: _*)
  }

  /** Build the Column for a non-star select item; returns (col, isUnnest).
    * With deferExplode the UNNEST item stays an array column — the caller
    * explodes it after sorting (ordered-mode element-order preservation). */
  private def buildItemColumn(raw: String, tr: ExprTranslator,
      deferExplode: Boolean): (Column, Boolean) = {
    val t = raw.trim
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
        val arrCol = PyEq.expr(tr.translate(inner))
        return (if (deferExplode) arrCol else explode(arrCol), true)
      }
    }
    (PyEq.expr(tr.translate(t)), false)
  }

  /** Resolve the data type an expression would have against `df` (driver-
    * side analysis only — no job). None if analysis fails (the real error
    * surfaces later with better context). */
  private def resolveType(df: DataFrame, sql: String): Option[org.apache.spark.sql.types.DataType] =
    scala.util.Try(df.select(expr(sql)).schema.head.dataType).toOption

  /** WHERE predicates follow Python truthiness (the reference evaluates
    * the expression as host-language code: `where len(a5)` keeps rows with
    * non-empty a5, 0/''/None are falsy). Non-boolean predicate types are
    * mapped to their truthiness; null stays null (→ row dropped), exactly
    * Python's None-is-falsy. */
  private def pyTruthy(df: DataFrame, predSql: String): Column = {
    import org.apache.spark.sql.types._
    val c = PyEq.expr(predSql)
    resolveType(df, predSql) match {
      case Some(BooleanType) | None => c
      case Some(_: NumericType) => c =!= 0
      case Some(StringType) => length(c) > 0
      case Some(_: ArrayType) => size(c) > 0
      case Some(NullType) => lit(false)
      case Some(_) => c // let analysis report the real error
    }
  }

  private def applyOrderBySimple(df: DataFrame, ast: StageAst, tr: ExprTranslator): DataFrame =
    ast.orderBy match {
      case Some(keys) =>
        df.orderBy(keys.map { k =>
          val name = k.expr.trim
          val c = if (df.columns.contains(name)) col(s"`$name`") else PyEq.expr(tr.translate(k.expr))
          if (k.asc) c.asc else c.desc
        }.toIndexedSeq: _*)
      case None => df
    }
}
