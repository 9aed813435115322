package graft.engine

/** Query-derived CSV width hint (the 100 TB text-scan lever, automated):
  * the split-path CSV reader pays a whole extra scan to infer the true
  * table width before projecting `a1..aW` — but when stage 1 references
  * the input ONLY through literal positional variables, projecting just
  * the maximum referenced index is output-identical to projecting the
  * true width:
  *
  *  - reads past a record's (or the table's) end bind None either way
  *    (reference safe_get pads — [[ExprTranslator.colByPos]]);
  *  - padding columns beyond the last referenced index can never
  *    surface in the output of a star-free, NF-free selection;
  *  - the NF warning scan is a separate pass and is not affected.
  *
  * Eligibility is deliberately conservative — any construct whose
  * meaning depends on the TRUE width disables the hint:
  *
  *  - UPDATE / EXCEPT / star / `*expr` unpack emit all (or
  *    width-dependent) columns;
  *  - NF (constant = table width in fixed mode) in any clause;
  *  - name-based refs (`a.name`, `a["name"]`) resolve through header
  *    positions the hint cannot bound;
  *  - JOIN: the reference validates positional JOIN KEYS against the
  *    true width ('No field with index N'), which a padded table would
  *    mask — joins pay the inference pass;
  *  - FROM: the query reads a different table than the hinted path.
  *
  * Only STAGE 1 is analyzed: later pipe stages operate on stage
  * outputs, never on the input file. */
object QueryWidth {

  private val NfRe = """(^|[^A-Za-z0-9_.])(a\.|b\.)?(NF|aNF|bNF)\b""".r
  // a.NF is harmless for BOTH callers: inputWidthHint rejects it via NfRe
  // anyway, and the ragged model computes per-record NF natively
  private val NameDotRe = """(^|[^A-Za-z0-9_])[ab]\.(?!NR\b|NF\b)[A-Za-z_]""".r
  private val NameBracketRe = """(^|[^A-Za-z0-9_])[ab]\[(?!\d+\])""".r
  private val PosRe = """(^|[^A-Za-z0-9_])a(?:\[)?(\d+)(?:\])?""".r

  /** Max `aN`/`a[N]` index the first stage can touch, or None when the
    * query's semantics need the true table width. */
  def inputWidthHint(masked: Lexer.Masked): Option[Int] = {
    val stage1 = masked.copy(text = Lexer.splitStages(masked.text).head)
    val ast =
      try ClauseParser.parse(stage1)
      catch { case _: GraftError => return None } // let the real build report it
    if (ast.update.isDefined || ast.from.isDefined || ast.join.isDefined)
      return None
    val sel = ast.select.getOrElse(return None)
    if (sel.exceptCols.isDefined) return None
    if (sel.items.exists { it =>
        val t = it.rawExpr.trim
        t == "*" || t == "a.*" || t == "b.*" || t.startsWith("*")
      }) return None
    val text = (sel.items.map(_.rawExpr) ++ ast.where.toSeq ++
      ast.groupBy.getOrElse(Nil) ++
      ast.orderBy.getOrElse(Nil).map(_.expr)).mkString(" ")
    if (NfRe.findFirstIn(text).isDefined) return None
    if (NameDotRe.findFirstIn(text).isDefined) return None
    if (NameBracketRe.findFirstIn(text).isDefined) return None
    val refs = PosRe.findAllMatchIn(text).map(_.group(2).toInt).toSeq
    // a query with no positional refs at all (e.g. `select NR`) still
    // needs ≥1 column so the table exists
    Some(math.max(1, if (refs.isEmpty) 1 else refs.max))
  }

  /** Whether EVERY stage addresses the input only through positional /
    * NR / NF forms — a headerless CSV read can then use the single-scan
    * RAGGED fields-array model (no width-inference pass; star output
    * arity, per-record NF and safe_get padding are inherent — the
    * engine's primary parity surface, the in-memory queryTable model).
    * Name refs need a header; JOIN/FROM keep the projected model (the
    * join-key machinery addresses projected columns). Unparseable stages
    * return false and let the real build report the error. */
  def raggedEligible(masked: Lexer.Masked): Boolean =
    Lexer.splitStages(masked.text).forall { st =>
      val ast =
        try ClauseParser.parse(masked.copy(text = st))
        catch { case _: GraftError => return false }
      ast.from.isEmpty && ast.join.isEmpty &&
        // EXCEPT resolves entries to PROJECTED column names (a ragged
        // table has none — 'UPDATE/EXCEPT entries must be input-column
        // variables'); keep it on the projected model
        ast.select.forall(_.exceptCols.isEmpty) &&
        NameDotRe.findFirstIn(st).isEmpty &&
        NameBracketRe.findFirstIn(st).isEmpty
    }
}
