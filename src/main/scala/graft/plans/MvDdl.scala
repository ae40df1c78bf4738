package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias,
  UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation,
  UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression,
  Literal, PlanExpression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  Join, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sources.{DerivedTable, GraftCatalog, Versioned}

/** SQL lifecycle for incrementally maintained MATERIALIZED VIEWS —
  * the spelling the Iceberg/Delta MV proposals define, over the
  * engine's existing [[DerivedTable]] machinery:
  *
  *   CREATE MATERIALIZED VIEW [IF NOT EXISTS] mv KEY (k)
  *     AS SELECT …row-pure… FROM src [WHERE …]
  *   CREATE MATERIALIZED VIEW [IF NOT EXISTS] mv KEY (k)
  *     AS SELECT … FROM fact f [LEFT] JOIN dim d ON f.fk = d.dk
  *        [AND f.fk2 = d.dk2 …] [WHERE …]
  *   CREATE MATERIALIZED VIEW [IF NOT EXISTS] mv ROW KEY (id)
  *     AS SELECT g, sum(v) AS sum_v, count(v) AS cnt_v,
  *               count(*) AS n_rows[, min(c) AS min_c, max(c) AS max_c]
  *        FROM src GROUP BY g
  *   DROP MATERIALIZED VIEW [IF EXISTS] mv
  *
  * CREATE runs the BOOTSTRAP build and persists the view's spec
  * (kind, source dir, key, query text) in the destination's own table
  * properties — the same travels-with-the-bytes discipline as the
  * `src=vN` pin — so `CALL graft.system.refresh_mv('mv')` advances it
  * with no caller-supplied arguments and `SHOW TBLPROPERTIES`
  * surfaces the stored definition. The spec-persisting property
  * commit re-pins `src=vN` in its note, so the pin is never buried.
  *
  * KIND is detected from the query: a GROUP BY query must match the
  * delta-maintainable aggregate shape EXACTLY (the stored schema of
  * [[DerivedTable.refreshAgg]], canonical aliases and order) and
  * names the SOURCE row identity via ROW KEY; a two-table query must
  * be the N:1 equi-join shape (fact first, qualified equalities —
  * one or an AND of several, the composite join key — INNER or LEFT
  * OUTER; [[DerivedTable.refreshJoinKeys]] maintains it from BOTH
  * sides' changelogs); anything else must be row-pure —
  * SELECT/WHERE over ONE table, no windows, subqueries, DISTINCT,
  * LIMIT or ORDER BY, because none of those propagate per-key
  * deltas. Every refusal states its contract. */
object MvDdl {

  // the view-name token is backquote-aware: a quoted segment may hold
  // spaces or '(' (graft.`/tmp/my dir/mv`), so the name is a run of
  // `…` segments and plain chars, not a bare \S+ slice
  private val Ident = "(?:`[^`]*`|[^\\s(;`])+"
  private val CreateRe =
    ("(?is)\\s*CREATE\\s+MATERIALIZED\\s+VIEW\\s+" +
      s"(IF\\s+NOT\\s+EXISTS\\s+)?($Ident)\\s+(ROW\\s+)?KEY\\s*" +
      "\\(\\s*([A-Za-z0-9_`]+)\\s*\\)\\s+" +
      "(?:PARTITIONED\\s+BY\\s*\\(\\s*([A-Za-z0-9_`]+)\\s*\\)\\s+)?" +
      "AS\\s+(.+?)\\s*;?\\s*").r
  private val DropRe =
    ("(?is)\\s*DROP\\s+MATERIALIZED\\s+VIEW\\s+" +
      s"(IF\\s+EXISTS\\s+)?($Ident)\\s*;?\\s*").r

  def parse(sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] = sqlText match {
    case CreateRe(ine, tbl, rowKw, key, pcol, query) =>
      Some(CreateMaterializedViewCommand(
        delegate.parseMultipartIdentifier(tbl),
        ifNotExists = ine != null, rowKeySpelling = rowKw != null,
        key.replace("`", ""), query.trim,
        partitionCol = Option(pcol).map(_.replace("`", ""))))
    case DropRe(ife, tbl) =>
      Some(DropMaterializedViewCommand(
        delegate.parseMultipartIdentifier(tbl), ifExists = ife != null))
    case _ => None
  }

  /** Resolve an identifier to its directory WITHOUT requiring the
    * table to exist (a CREATE target) — the graft catalog's own
    * mapping, selected like [[GraftDdl.tableDir]] does. */
  def destDir(spark: SparkSession, parts: Seq[String],
      what: String): String = {
    val (cat, rest) = GraftDdl.catalogAndRest(spark, parts)
    cat match {
      case g: GraftCatalog =>
        g.dirFor(Identifier.of(rest.init.toArray, rest.last))
      case other => throw new UnsupportedOperationException(
        s"$what needs the graft catalog; '${other.name}' cannot " +
          "hold graft materialized views")
    }
  }

  /** One eligible aggregate call: (lowercased fn, its single bare
    * column arg — None for count(*)/count(1) — and, fourth slot, the
    * SQL text of an EXPRESSION argument when the arg is not a bare
    * column: `sum(price * (1 - discount))` reports (sum, None,
    * Some(text)), and the shape loops accept it when the alias
    * derives a measure name — the expression materializes as a
    * derived column on every snapshot-side read, the group-expression
    * discipline applied to measures). `count(DISTINCT c)` reports as
    * the synthetic fn name "count_distinct" — the EXACT
    * distinct-count measure, maintained by affected-group recompute
    * (see [[graft.sources.DerivedTable.refreshAgg]]). */
  private def fnOf(e: Expression)
      : Option[(String, Option[String], Option[String])] =
    e match {
      case f: UnresolvedFunction
          if f.filter.isEmpty && f.nameParts.length == 1 =>
        val name = f.nameParts.head.toLowerCase(java.util.Locale.ROOT)
        if (f.isDistinct) f.arguments match {
          // only count(DISTINCT <one bare column or expression>) is
          // a shape the engine maintains; sum/avg DISTINCT refuse
          case Seq(ua: UnresolvedAttribute)
              if name == "count" && ua.nameParts.length == 1 =>
            Some(("count_distinct", Some(ua.nameParts.head), None))
          case Seq(arg) if name == "count" && eligibleExpr(arg) =>
            Some(("count_distinct", None, Some(arg.sql)))
          case _ => None
        } else f.arguments match {
          case Seq(ua: UnresolvedAttribute) if ua.nameParts.length == 1 =>
            Some((name, Some(ua.nameParts.head), None))
          case Seq(l: Literal) if name == "count" && l.value != null =>
            Some((name, None, None))
          case Seq(_: UnresolvedStar) if name == "count" =>
            Some((name, None, None))
          case Seq(arg) if eligibleExpr(arg) =>
            Some((name, None, Some(arg.sql)))
          case _ => None
        }
      case _ => None
    }

  /** An aggregate ARGUMENT expression the engine can materialize as
    * a derived column: no nested aggregate/window/subquery (those
    * are swept again at CREATE, but a nested agg would otherwise
    * slip through as "an expression") and not a lone literal (a
    * constant measure is a definition mistake, not a rollup). */
  private def eligibleExpr(e: Expression): Boolean =
    !e.isInstanceOf[Literal] && !e.isInstanceOf[UnresolvedStar] &&
      e.collectFirst {
        case f: UnresolvedFunction if f.nameParts.length == 1 &&
          AggFnNames.contains(
            f.nameParts.head.toLowerCase(java.util.Locale.ROOT)) => ()
        case p: PlanExpression[_] => ()
      }.isEmpty

  private val AggFnNames = Set("sum", "count", "avg", "min", "max",
    "approx_count_distinct", "graft_kll", "mean", "stddev", "variance",
    "first", "last", "collect_list", "collect_set")

  /** Match the parsed query against the delta-maintainable aggregate
    * shape — `SELECT g…, sum(a) AS sum_<a>, count(a) AS cnt_<a>[,
    * sum(b) AS sum_<b>, count(b) AS cnt_<b> …], count(*) AS n_rows[,
    * avg(c) AS avg_<c> …][, min(c) AS min_<c>, max(c) AS max_<c> …]
    * FROM src [WHERE pred] GROUP BY g…`, canonical aliases IN ORDER
    * (so `SELECT * FROM mv` returns exactly what the definition
    * reads) — and extract (groups with their optional
    * bucket-expression texts, value columns, avg columns, extrema,
    * where-text — plus the approx- and EXACT-distinct and KLL
    * measure column lists between avg and extrema). A group key may
    * be a bare column OR a
    * deterministic scalar EXPRESSION aliased in the select list
    * (`SELECT date_trunc('day', ts) AS day … GROUP BY
    * date_trunc('day', ts)` — or `GROUP BY day`, the group-by-alias
    * spelling): the bucket materializes as a derived column on every
    * snapshot-side read and the delta algebra runs on the bucketed
    * stream unchanged. Multi-column GROUP BY, MULTI-MEASURE sum/cnt
    * pairs, and a WHERE predicate are all delta-maintainable; None
    * for any other shape. */
  def aggShapeOf(p: LogicalPlan):
      Option[(Seq[(String, Option[String])], Seq[String],
        Seq[(String, String)], Seq[String], Seq[String], Seq[String],
        Seq[String], Seq[String], Option[String])] = {
    val agg = p match {
      case a: Aggregate => a
      case _ => return None
    }
    def relUnder(n: LogicalPlan): Boolean = n match {
      case _: UnresolvedRelation => true
      case s: SubqueryAlias => s.child.isInstanceOf[UnresolvedRelation]
      case _ => false
    }
    val where = agg.child match {
      case n if relUnder(n) => None
      case f: Filter if relUnder(f.child) => Some(f.condition.sql)
      case _ => return None // HAVING/joins/nesting under GROUP BY:
      // not expressible as a filtered single-table delta stream
    }
    val nG = agg.groupingExpressions.length
    val outs = agg.aggregateExpressions
    // at minimum the groups plus n_rows: a COUNT-ONLY rollup
    // (`SELECT g, count(*) AS n_rows … GROUP BY g` — the frequency
    // table) is delta-maintainable with no sum/cnt pair at all
    if (nG == 0 || outs.length < nG + 1) return None
    // the first |groups| outputs are the group columns, in order,
    // each paired with its grouping expression
    val gs: Seq[(String, Option[String])] =
      agg.groupingExpressions.zip(outs.take(nG)).map {
        case (gua: UnresolvedAttribute, out)
            if gua.nameParts.length == 1 =>
          val g = gua.nameParts.head
          out match {
            case ua: UnresolvedAttribute if ua.nameParts == Seq(g) =>
              (g, None)
            case UnresolvedAlias(ua: UnresolvedAttribute, _)
                if ua.nameParts == Seq(g) => (g, None)
            case Alias(ua: UnresolvedAttribute, name)
                if ua.nameParts == Seq(g) && name == g => (g, None)
            // GROUP BY <alias>: the grouping ref names the select
            // list's expression alias
            case Alias(child, name)
                if name == g &&
                  !child.isInstanceOf[UnresolvedAttribute] =>
              (g, Some(child.sql))
            case _ => return None
          }
        // expression spelled in BOTH places: textual plan identity
        // (same parser, same .sql rendering)
        case (ge, Alias(child, name)) if ge.sql == child.sql =>
          (name, Some(child.sql))
        case _ => return None
      }
    val gNames = gs.map(_._1)
    if (gNames.distinct.length != gNames.length) return None
    def aliased(e: Expression)
        : Option[(String, String, Option[String], Option[String])] =
      e match {
        case Alias(child, name) => fnOf(child).map {
          case (fn, arg, exprTxt) => (name, fn, arg, exprTxt) }
        case _ => None
      }
    val rest = outs.drop(nG).map(aliased)
    if (rest.exists(_.isEmpty)) return None
    val seq = rest.flatten
    // EXPRESSION-VALUED measures: `sum(price * (1 - discount)) AS
    // sum_rev` names the measure via its alias, and the argument
    // text materializes as a derived column (`rev`) on every
    // snapshot-side read — the group-expression discipline applied
    // to measures, so the delta algebra is unchanged. ONE name maps
    // to ONE text: the same derived name fed from two different
    // expressions refuses (shape mismatch), the same text under the
    // same name shares the single derived column (sum + min/max of
    // one revenue expression).
    val valExprs =
      scala.collection.mutable.LinkedHashMap[String, String]()
    def reg(x: String, e: String): Boolean =
      valExprs.get(x) match {
        case Some(prev) => prev == e
        case None => valExprs.put(x, e); true
      }
    // alias-derived measure name: the part after the family prefix,
    // eligible when nonempty and not a group key
    def dn(alias: String, prefix: String): Option[String] = {
      val x = alias.stripPrefix(prefix)
      if (alias.startsWith(prefix) && x.nonEmpty &&
        !gNames.contains(x)) Some(x) else None
    }
    // one or more MEASURES — canonical (sum_<c>, cnt_<c>) pairs — a
    // rollup usually carries several, and one view maintains them
    // all in the same delta pass
    var i = 0
    val vals = scala.collection.mutable.ArrayBuffer[String]()
    var more = true
    while (more) {
      (seq.lift(i), seq.lift(i + 1)) match {
        case (Some((n1, "sum", Some(c1), None)),
            Some((n2, "count", Some(c2), None)))
            if c1 == c2 && n1 == s"sum_$c1" && n2 == s"cnt_$c1" &&
              !gNames.contains(c1) && !vals.contains(c1) =>
          vals += c1; i += 2
        case (Some((n1, "sum", None, Some(e1))),
            Some((n2, "count", None, Some(e2))))
            if e1 == e2 && dn(n1, "sum_").isDefined &&
              n2 == s"cnt_${n1.stripPrefix("sum_")}" &&
              !vals.contains(n1.stripPrefix("sum_")) &&
              reg(n1.stripPrefix("sum_"), e1) =>
          vals += n1.stripPrefix("sum_"); i += 2
        case _ => more = false
      }
    }
    // zero pairs is legal — the COUNT-ONLY rollup — but n_rows is
    // always mandatory (it is the delta algebra's group-death signal)
    seq.lift(i) match {
      case Some(("n_rows", "count", None, None)) => i += 1
      case _ => return None
    }
    // optional avg entries — any subset of the values, IN VALUE
    // ORDER (so the stored schema is a function of the query) —
    // each stored as the exact quotient of its pair; an expression
    // avg must repeat its pair's exact text
    val avgsB = scala.collection.mutable.ArrayBuffer[String]()
    var moreAvg = true
    while (moreAvg) {
      seq.lift(i) match {
        case Some((name, "avg", Some(c), None))
            if name == s"avg_$c" && vals.contains(c) &&
              !valExprs.contains(c) && !avgsB.contains(c) =>
          avgsB += c; i += 1
        case Some((name, "avg", None, Some(e)))
            if dn(name, "avg_").exists(x => vals.contains(x) &&
              valExprs.get(x).contains(e) &&
              !avgsB.contains(x)) =>
          avgsB += name.stripPrefix("avg_"); i += 1
        case _ => moreAvg = false
      }
    }
    if (avgsB.nonEmpty &&
      avgsB.toSeq != vals.toSeq.filter(avgsB.contains)) return None
    // optional approx-distinct measures: approx_count_distinct(<c>)
    // AS adc_<c> over non-group columns — the delta-maintainable
    // spelling of count(DISTINCT): the view stores the estimate plus
    // a mergeable HLL sketch (inserts merge, a group that lost rows
    // recomputes — see [[DerivedTable.refreshAgg]])
    val disB = scala.collection.mutable.ArrayBuffer[String]()
    var moreDis = true
    while (moreDis) {
      seq.lift(i) match {
        case Some((name, "approx_count_distinct", Some(c), None))
            if name == s"adc_$c" && !gNames.contains(c) &&
              !disB.contains(c) =>
          disB += c; i += 1
        case Some((name, "approx_count_distinct", None, Some(e)))
            if dn(name, "adc_").exists(x => !disB.contains(x) &&
              reg(x, e)) =>
          disB += name.stripPrefix("adc_"); i += 1
        case _ => moreDis = false
      }
    }
    // optional EXACT distinct-count measures: count(DISTINCT <c>) AS
    // cd_<c> — not delta-invertible in EITHER direction (an inserted
    // value may already exist; a deleted one may survive on another
    // row), so every refresh recomputes exactly the touched groups
    // from the pinned snapshot — the extrema discipline, with the
    // extrema's O(rows of touched groups) cost. approx_count_distinct
    // stays the merge-on-insert spelling for groups too hot to rescan
    val cdB = scala.collection.mutable.ArrayBuffer[String]()
    var moreCd = true
    while (moreCd) {
      seq.lift(i) match {
        case Some((name, "count_distinct", Some(c), None))
            if name == s"cd_$c" && !gNames.contains(c) &&
              !cdB.contains(c) =>
          cdB += c; i += 1
        case Some((name, "count_distinct", None, Some(e)))
            if dn(name, "cd_").exists(x => !cdB.contains(x) &&
              reg(x, e)) =>
          cdB += name.stripPrefix("cd_"); i += 1
        case _ => moreCd = false
      }
    }
    // optional KLL QUANTILE sketch measures: graft_kll(<c>) AS
    // kll_<c> — the mergeable percentile summary (p50/p99 BY group);
    // read quantiles with graft_kll_quantile(kll_<c>, q)
    val kllB = scala.collection.mutable.ArrayBuffer[String]()
    var moreKll = true
    while (moreKll) {
      seq.lift(i) match {
        case Some((name, "graft_kll", Some(c), None))
            if name == s"kll_$c" && !gNames.contains(c) &&
              !kllB.contains(c) =>
          kllB += c; i += 1
        case Some((name, "graft_kll", None, Some(e)))
            if dn(name, "kll_").exists(x => !kllB.contains(x) &&
              reg(x, e)) =>
          kllB += name.stripPrefix("kll_"); i += 1
        case _ => moreKll = false
      }
    }
    // optional extrema: (min_c, max_c) pairs over non-group columns
    val ext = seq.drop(i).grouped(2).map {
      case Seq((n1, "min", Some(c1), None), (n2, "max", Some(c2), None))
          if c1 == c2 && !gNames.contains(c1) &&
            n1 == s"min_$c1" && n2 == s"max_$c1" => Some(c1)
      case Seq((n1, "min", None, Some(e1)), (n2, "max", None, Some(e2)))
          if e1 == e2 && dn(n1, "min_").isDefined &&
            n2 == s"max_${n1.stripPrefix("min_")}" &&
            reg(n1.stripPrefix("min_"), e1) =>
        Some(n1.stripPrefix("min_"))
      case _ => None
    }.toSeq
    if (ext.exists(_.isEmpty)) return None
    Some((gs, vals.toSeq, valExprs.toSeq, avgsB.toSeq, disB.toSeq,
      cdB.toSeq, kllB.toSeq, ext.flatten, where))
  }

  private[plans] val AggShapeMsg =
    "a GROUP BY materialized view must match the delta-maintainable " +
      "shape exactly: SELECT <g…>[, sum(<a>) AS sum_<a>, count(<a>) " +
      "AS cnt_<a>[, more sum/cnt pairs …]], count(*) AS n_rows[, " +
      "avg(<c>) AS avg_<c> per value column, in value order][, " +
      "approx_count_distinct(<c>) AS adc_<c> …][, count(DISTINCT " +
      "<c>) AS cd_<c> …][, graft_kll(<c>) " +
      "AS kll_<c> …][, min(<c>) AS " +
      "min_<c>, max(<c>) AS max_<c> …] FROM <src> [WHERE <pred>] " +
      "GROUP BY <g…> — a group key may be a bare column or a " +
      "deterministic expression aliased in the select list (GROUP " +
      "BY date_trunc('day', ts) with date_trunc('day', ts) AS day, " +
      "or GROUP BY day); an aggregate ARGUMENT may be a " +
      "deterministic expression whose alias derives the measure " +
      "name (sum(price * (1 - discount)) AS sum_rev with " +
      "count(price * (1 - discount)) AS cnt_rev — same text in " +
      "every spelling of one name); no HAVING or other aggregates; " +
      "exact " +
      "count(DISTINCT <c>) AS cd_<c> recomputes the TOUCHED groups " +
      "from the pinned snapshot on every refresh (the extrema " +
      "discipline) — approx_count_distinct(<c>) AS adc_<c> is the " +
      "merge-on-insert spelling (mergeable HLL sketch: estimate " +
      "plus sketch state, no recompute on the append path)"

  private[plans] val RowPureMsg =
    "a row-pure materialized view supports SELECT … FROM <one " +
      "table> [WHERE …] only — windows, subqueries, DISTINCT, " +
      "LIMIT and ORDER BY do not propagate per-key deltas (each " +
      "output row must derive from the single input row with its " +
      "key); a two-table equi-join takes the join-view shape instead"

  private[plans] val JoinShapeMsg =
    "a join materialized view must be SELECT … FROM <fact> " +
      "[INNER|LEFT [OUTER]] JOIN <dim> ON <fact>.<fk> = <dim>.<dk> " +
      "[AND <fact>.<fk2> = <dim>.<dk2> …] [JOIN <dim2> ON " +
      "<fact>.<fk> = <dim2>.<dk> …] [WHERE …] — distinct tables, the " +
      "FIRST the fact whose KEY names the row identity, every ON an " +
      "equality (or AND of equalities) between the FACT and the dim " +
      "that join introduces (a star), both sides qualified, no other " +
      "join types, windows, subqueries, DISTINCT, LIMIT or ORDER BY. " +
      "SNOWFLAKED shapes — any join TREE where each relation joins " +
      "exactly ONE earlier relation (a dim joined to a dim, a star " +
      "with snowflaked legs, N-hop chains) — auto-chain when every " +
      "output is a qualified column or a row-pure expression whose " +
      "references are all 2-part qualified"

  private[plans] val AggJoinShapeMsg =
    "an aggregate-over-join materialized view must be SELECT <g…>, " +
      "sum(<q>.<v>) AS sum_<v>, count(<q>.<v>) AS cnt_<v>, count(*) " +
      "AS n_rows[, avg(<q>.<v>) AS avg_<v>][, approx_count_distinct " +
      "AS adc_<c>][, count(DISTINCT <q>.<c>) AS cd_<c>][, " +
      "graft_kll(<q>.<c>) AS kll_<c>][, min/max pairs " +
      "…] FROM " +
      "<fact> JOIN <dim> ON <fact>.<fk> = <dim>.<dk> … [WHERE …] " +
      "GROUP BY <g…> — group keys are bare/qualified columns or " +
      "deterministic expressions aliased in the select list, " +
      "aggregate ARGUMENTS may be expressions whose alias derives " +
      "the measure name (sum(f.price * (1 - f.disc)) AS sum_rev), " +
      "the join is the star shape, or any SNOWFLAKED join tree — " +
      "each relation joined to exactly ONE earlier relation (linear " +
      "chains, stars with snowflaked legs, any mix) with every " +
      "reference 2-part qualified; invertible shapes " +
      "maintain the gold DIRECTLY, others chain a HIDDEN join " +
      "silver at <view>.silver (snowflakes peel one hop per hidden " +
      "level at <view>.snow, .snow2, …) and delta-maintain the " +
      "gold over it"

  /** Match `SELECT g…, aggs FROM fact JOIN dim… [WHERE …] GROUP BY
    * g…` — the aggregate-over-join shape the engine AUTO-CHAINS: a
    * hidden silver join view materializes the projected join stream
    * and the gold is the standard aggregate view over it. Returns
    * (fact alias as written, groups as (silver column name,
    * qualified sql, is-expression), values as (column name,
    * qualified sql) — one per sum/cnt measure pair — avg column
    * names, extrema as (column name, qualified sql), per-dim join
    * shape). Group keys are bare/qualified columns OR deterministic
    * expressions aliased in the select list (the silver projects any
    * scalar of the join row); aggregate args may be qualified,
    * canonical aliases use the LAST name part. */
  def aggOverJoinShapeOf(p: LogicalPlan): Option[(String,
      Seq[(String, String, Boolean)], Seq[(String, String)],
      Seq[String], Seq[(String, String)], Seq[(String, String)],
      Seq[(String, String)], Seq[(String, String)],
      Seq[(Seq[String], Seq[String], String)])] = {
    val agg = p match {
      case a: Aggregate => a
      case _ => return None
    }
    val shape = joinShapeOf(agg.child).getOrElse(return None)
    val joins = agg.child.collect { case j: Join => j }
    val factAlias = joins.last.left match {
      case s: SubqueryAlias if s.child.isInstanceOf[UnresolvedRelation]
        => s.alias
      case u: UnresolvedRelation => u.multipartIdentifier.last
      case _ => return None
    }
    val (gs, vals, avgs, dis, cds, kll, ext) =
      aggJoinListOf(agg).getOrElse(return None)
    Some((factAlias, gs, vals, avgs, dis, cds, kll, ext, shape))
  }

  /** The SELECT-list half of the aggregate-over-join shapes — groups
    * as (name, qualified sql, is-expression) and the measure
    * families as (name, qualified sql) lists — shared by the STAR
    * matcher ([[aggOverJoinShapeOf]]) and the SNOWFLAKE one
    * ([[aggOverSnowflakeShapeOf]]). */
  private def aggJoinListOf(agg: Aggregate)
      : Option[(Seq[(String, String, Boolean)],
        Seq[(String, String)], Seq[String], Seq[(String, String)],
        Seq[(String, String)], Seq[(String, String)],
        Seq[(String, String)])] = {
    val nG = agg.groupingExpressions.length
    val outs = agg.aggregateExpressions
    // at minimum the groups plus n_rows — the COUNT-ONLY rollup
    // works over joins too
    if (nG == 0 || outs.length < nG + 1) return None
    // a group key is a bare/qualified COLUMN, or — because the
    // hidden silver can project ANY deterministic scalar of the join
    // row — an EXPRESSION aliased in the select list (spelled in
    // both places, or GROUP BY <alias>): the daily-revenue-by-label
    // rollup `GROUP BY date_trunc('day', f.ts), d.label` works in
    // one view. The third element flags EXPRESSION groups — the
    // CREATE refuses those whose alias shadows a fact/dim column
    // (Spark resolves GROUP BY <name> to the REAL column first, so a
    // shadowed alias would make the gate and the analyzer disagree
    // about what the definition groups by).
    val gs: Seq[(String, String, Boolean)] =
      agg.groupingExpressions.zip(outs.take(nG)).map {
        case (ge, out) =>
          ge match {
            case gua: UnresolvedAttribute
                if gua.nameParts.length <= 2 =>
              val gp = gua.nameParts
              out match {
                case ua: UnresolvedAttribute if ua.nameParts == gp =>
                  (gp.last, ge.sql, false)
                case UnresolvedAlias(ua: UnresolvedAttribute, _)
                    if ua.nameParts == gp => (gp.last, ge.sql, false)
                case Alias(ua: UnresolvedAttribute, name)
                    if ua.nameParts == gp => (name, ge.sql, false)
                // GROUP BY <alias> of an expression output
                case Alias(child, name)
                    if gp == Seq(name) &&
                      !child.isInstanceOf[UnresolvedAttribute] =>
                  (name, child.sql, true)
                case _ => return None
              }
            case _ => out match {
              case Alias(child, name) if child.sql == ge.sql =>
                (name, ge.sql, true)
              case _ => return None
            }
          }
      }
    val gNames = gs.map(_._1)
    if (gNames.distinct.length != gNames.length) return None
    // one eligible aggregate with a 1- or 2-part column arg:
    // (alias, lowercased fn, Some((col last part, qualified sql)))
    // (alias, fn, bare/qualified column as (last part, sql), or —
    // fourth slot — an EXPRESSION argument's sql text; the hidden
    // silver (or the direct slice) projects any scalar of the join
    // row, so `sum(f.price * (1 - f.disc)) AS sum_rev` is a measure
    // whose derived column the alias names, like [[fnOf]])
    def fnOf2(e: Expression): Option[(String, String,
        Option[(String, String)], Option[String])] =
      e match {
        case Alias(f: UnresolvedFunction, name)
            if f.filter.isEmpty && f.nameParts.length == 1 =>
          val fn = f.nameParts.head.toLowerCase(java.util.Locale.ROOT)
          if (f.isDistinct) f.arguments match {
            // count(DISTINCT <q>.<c>) — the exact distinct-count
            // measure, "count_distinct" like [[fnOf]]
            case Seq(ua: UnresolvedAttribute)
                if fn == "count" && ua.nameParts.length <= 2 =>
              Some((name, "count_distinct",
                Some((ua.nameParts.last, ua.sql)), None))
            case Seq(arg) if fn == "count" && eligibleExpr(arg) =>
              Some((name, "count_distinct", None, Some(arg.sql)))
            case _ => None
          } else f.arguments match {
            case Seq(ua: UnresolvedAttribute)
                if ua.nameParts.length <= 2 =>
              Some((name, fn, Some((ua.nameParts.last, ua.sql)), None))
            case Seq(l: Literal) if fn == "count" && l.value != null =>
              Some((name, fn, None, None))
            case Seq(_: UnresolvedStar) if fn == "count" =>
              Some((name, fn, None, None))
            case Seq(arg) if eligibleExpr(arg) =>
              Some((name, fn, None, Some(arg.sql)))
            case _ => None
          }
        case _ => None
      }
    val rest = outs.drop(nG).map(fnOf2)
    if (rest.exists(_.isEmpty)) return None
    val seq = rest.flatten
    // EXPRESSION measures over joins: the alias derives the measure
    // name and the (name, sql) pair flows through the existing slice
    // projection (`<sql> AS <name>`) — same consistency rule as the
    // single-table shape: one name, one text
    val exprTexts =
      scala.collection.mutable.LinkedHashMap[String, String]()
    def reg(x: String, e: String): Boolean =
      exprTexts.get(x) match {
        case Some(prev) => prev == e
        case None => exprTexts.put(x, e); true
      }
    def dn(alias: String, prefix: String): Option[String] = {
      val x = alias.stripPrefix(prefix)
      if (alias.startsWith(prefix) && x.nonEmpty &&
        !gNames.contains(x)) Some(x) else None
    }
    // one or more (sum_<c>, cnt_<c>) measure pairs over the SAME
    // qualified column (or the same expression text) each
    var i = 0
    val vals = scala.collection.mutable
      .ArrayBuffer[(String, String)]()
    var more = true
    while (more) {
      (seq.lift(i), seq.lift(i + 1)) match {
        case (Some((n1, "sum", Some((c1, s1)), None)),
            Some((n2, "count", Some((c2, s2)), None)))
            if c1 == c2 && s1 == s2 && n1 == s"sum_$c1" &&
              n2 == s"cnt_$c1" && !gNames.contains(c1) &&
              !vals.exists(_._1 == c1) =>
          vals += ((c1, s1)); i += 2
        case (Some((n1, "sum", None, Some(e1))),
            Some((n2, "count", None, Some(e2))))
            if e1 == e2 && dn(n1, "sum_").isDefined &&
              n2 == s"cnt_${n1.stripPrefix("sum_")}" &&
              !vals.exists(_._1 == n1.stripPrefix("sum_")) &&
              reg(n1.stripPrefix("sum_"), e1) =>
          vals += ((n1.stripPrefix("sum_"), e1)); i += 2
        case _ => more = false
      }
    }
    // zero pairs is legal (count-only); n_rows stays mandatory
    seq.lift(i) match {
      case Some(("n_rows", "count", None, None)) => i += 1
      case _ => return None
    }
    // optional avg entries — a subset of the values, in value order;
    // an expression avg repeats its pair's exact text
    val avgsB = scala.collection.mutable.ArrayBuffer[String]()
    var moreAvg = true
    while (moreAvg) {
      seq.lift(i) match {
        case Some((name, "avg", Some((c, sql)), None))
            if name == s"avg_$c" && !avgsB.contains(c) &&
              vals.exists(v => v._1 == c && v._2 == sql) =>
          avgsB += c; i += 1
        case Some((name, "avg", None, Some(e)))
            if dn(name, "avg_").exists(x => !avgsB.contains(x) &&
              vals.exists(v => v._1 == x && v._2 == e)) =>
          avgsB += name.stripPrefix("avg_"); i += 1
        case _ => moreAvg = false
      }
    }
    if (avgsB.nonEmpty &&
      avgsB.toSeq != vals.map(_._1).toSeq.filter(avgsB.contains))
      return None
    // optional approx-distinct measures (the single-table shape's
    // qualified twin) — the hidden silver projects the column, the
    // gold maintains the sketch
    val disB = scala.collection.mutable
      .ArrayBuffer[(String, String)]()
    var moreDis = true
    while (moreDis) {
      seq.lift(i) match {
        case Some((name, "approx_count_distinct", Some((c, sql)),
            None))
            if name == s"adc_$c" && !gNames.contains(c) &&
              !disB.exists(_._1 == c) =>
          disB += ((c, sql)); i += 1
        case Some((name, "approx_count_distinct", None, Some(e)))
            if dn(name, "adc_").exists(x =>
              !disB.exists(_._1 == x) && reg(x, e)) =>
          disB += ((name.stripPrefix("adc_"), e)); i += 1
        case _ => moreDis = false
      }
    }
    // optional EXACT distinct-count measures (qualified twin) —
    // non-invertible, so their presence forces the hidden-silver
    // auto-chain (the recompute's input is the joined stream)
    val cdB = scala.collection.mutable
      .ArrayBuffer[(String, String)]()
    var moreCd = true
    while (moreCd) {
      seq.lift(i) match {
        case Some((name, "count_distinct", Some((c, sql)), None))
            if name == s"cd_$c" && !gNames.contains(c) &&
              !cdB.exists(_._1 == c) =>
          cdB += ((c, sql)); i += 1
        case Some((name, "count_distinct", None, Some(e)))
            if dn(name, "cd_").exists(x =>
              !cdB.exists(_._1 == x) && reg(x, e)) =>
          cdB += ((name.stripPrefix("cd_"), e)); i += 1
        case _ => moreCd = false
      }
    }
    // optional KLL quantile measures (qualified twin)
    val kllB = scala.collection.mutable
      .ArrayBuffer[(String, String)]()
    var moreKll = true
    while (moreKll) {
      seq.lift(i) match {
        case Some((name, "graft_kll", Some((c, sql)), None))
            if name == s"kll_$c" && !gNames.contains(c) &&
              !kllB.exists(_._1 == c) =>
          kllB += ((c, sql)); i += 1
        case Some((name, "graft_kll", None, Some(e)))
            if dn(name, "kll_").exists(x =>
              !kllB.exists(_._1 == x) && reg(x, e)) =>
          kllB += ((name.stripPrefix("kll_"), e)); i += 1
        case _ => moreKll = false
      }
    }
    val ext = seq.drop(i).grouped(2).map {
      case Seq((n1, "min", Some((c1, s1)), None),
          (n2, "max", Some((c2, s2)), None))
          if c1 == c2 && s1 == s2 && !gNames.contains(c1) &&
            n1 == s"min_$c1" && n2 == s"max_$c1" => Some((c1, s1))
      case Seq((n1, "min", None, Some(e1)),
          (n2, "max", None, Some(e2)))
          if e1 == e2 && dn(n1, "min_").isDefined &&
            n2 == s"max_${n1.stripPrefix("min_")}" &&
            reg(n1.stripPrefix("min_"), e1) =>
        Some((n1.stripPrefix("min_"), e1))
      case _ => None
    }.toSeq
    if (ext.exists(_.isEmpty)) return None
    Some((gs, vals.toSeq, avgsB.toSeq, disB.toSeq,
      cdB.toSeq, kllB.toSeq, ext.flatten))
  }

  /** Match `SELECT g…, aggs FROM <join tree> [WHERE …] GROUP BY g…`
    * — the aggregate-over-SNOWFLAKE shape: the same SELECT-list
    * contract as [[aggOverJoinShapeOf]] over any join TREE
    * ([[treeHopsOf]]) — linear chains, stars with snowflaked legs,
    * any mix. The CREATE auto-chains recursively: each level peels
    * one fact-adjacent hop with children into a hidden join silver
    * at `<dst>.snow[k]` and rewrites the query onto (silver,
    * remaining dims) — a tree one relation smaller, until it is a
    * STAR the standard aggregate-over-join machinery maintains.
    * Every column reference in the groups, measure arguments, and
    * WHERE must be 2-part qualified (the rewrite onto the silver
    * must be exact). The WHERE condition here sits UNDER the
    * Aggregate. */
  def aggOverSnowflakeShapeOf(p: LogicalPlan)
      : Option[(Seq[String], Seq[SnowHop], Option[String],
        Seq[(String, String, Boolean)], Seq[(String, String)],
        Seq[String], Seq[(String, String)], Seq[(String, String)],
        Seq[(String, String)], Seq[(String, String)])] = {
    val agg = p match {
      case a: Aggregate => a
      case _ => return None
    }
    val (aliases, hops) = treeHopsOf(agg.child).getOrElse(return None)
    val whereText = agg.child match {
      case f: Filter => Some(f.condition.sql)
      case _ => None
    }
    val (gs, vals, avgs, dis, cds, kll, ext) =
      aggJoinListOf(agg).getOrElse(return None)
    Some((aliases, hops, whereText, gs, vals, avgs, dis, cds, kll,
      ext))
  }

  // slices `SELECT … FROM <tail> GROUP BY …` to the tail — the
  // synthesized silver reuses the original FROM/JOIN/WHERE text
  // VERBATIM (aliases, ON conditions, predicate quals all preserved);
  // the shape is already plan-validated, so a mis-slice can only
  // fail loudly at the silver's own parse
  private[plans] val AggJoinSplit =
    "(?is)^\\s*SELECT\\s+.*?\\s+FROM\\s+(.+)\\s+GROUP\\s+BY\\s+.*$".r

  /** Match the parsed query against the delta-maintainable STAR join
    * shape and extract one (fact-side fk columns, dim-side key
    * columns — aligned by position — join type) triple PER DIM, in
    * FROM order. The FIRST relation in the FROM clause is the fact;
    * its alias (or table name's last part) must qualify the fk side
    * of every equality, and each join's ON condition (one equality
    * or an AND of equalities — composite join key) must reference
    * the fact and exactly the dim that join introduces (left-deep
    * star only — a dim joined to another dim is a SNOWFLAKE, which
    * [[snowflakeShapeOf]] handles by auto-chaining a hidden silver).
    * None for any other shape. */
  def joinShapeOf(p: LogicalPlan):
      Option[Seq[(Seq[String], Seq[String], String)]] = {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo}
    // collect is pre-order: outermost join first; a left-deep chain
    // reversed is FROM order
    val joins = p.collect { case j: Join => j }
    if (joins.isEmpty) return None
    // only projection/filter may sit above the joins; each join side
    // is the (possibly aliased) bare relation or the next join down
    val badAbove = p.collect {
      case n if !n.isInstanceOf[Project] && !n.isInstanceOf[Filter] &&
        !n.isInstanceOf[SubqueryAlias] && !n.isInstanceOf[Join] &&
        !n.isInstanceOf[UnresolvedRelation] => n
    }
    if (badAbove.nonEmpty) return None
    // the chain must be LEFT-deep: every join's left child is the
    // next join (or the fact relation at the innermost)
    val leftDeep = joins.sliding(2).forall {
      case Seq(outer, inner) => outer.left eq inner
      case _ => true
    }
    if (!leftDeep) return None
    def sideOf(n: LogicalPlan): Option[String] = n match {
      case s: SubqueryAlias if s.child.isInstanceOf[UnresolvedRelation]
        => Some(s.alias)
      case u: UnresolvedRelation => Some(u.multipartIdentifier.last)
      case _ => None
    }
    // ON-clause qualifiers match their join-side alias under the
    // session's resolution rules — case-INSENSITIVE by default (the
    // analyzer would accept `ON F.fk = D.dk` for aliases f/d, so the
    // shape gate must not refuse it)
    val fold: String => String =
      if (org.apache.spark.sql.internal.SQLConf.get
          .caseSensitiveAnalysis) identity
      else _.toLowerCase(java.util.Locale.ROOT)
    val factAlias = sideOf(joins.last.left).map(fold)
      .getOrElse(return None)
    val fromOrder = joins.reverse
    val dimAliases = fromOrder.map(j =>
      sideOf(j.right).map(fold).getOrElse(return None))
    if ((factAlias +: dimAliases).distinct.length !=
      dimAliases.length + 1) return None
    // flatten `a AND b AND …` into the equality list
    def conjuncts(e: org.apache.spark.sql.catalyst.expressions
        .Expression): Seq[org.apache.spark.sql.catalyst.expressions
        .Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    Some(fromOrder.zip(dimAliases).map { case (j, dimAlias) =>
      val jt = j.joinType match {
        case Inner => "inner"
        case LeftOuter => "left"
        case _ => return None
      }
      val pairs = j.condition.toSeq.flatMap(conjuncts).map {
        case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
            if a.nameParts.length == 2 && b.nameParts.length == 2 =>
          val sides = Map(fold(a.nameParts.head) -> a.nameParts.last,
            fold(b.nameParts.head) -> b.nameParts.last)
          (for {
            fk <- sides.get(factAlias)
            dk <- sides.get(dimAlias)
            if sides.size == 2
          } yield (fk, dk)).getOrElse(return None)
        case _ => return None
      }
      if (pairs.isEmpty ||
        pairs.map(_._1).distinct.length != pairs.length) return None
      (pairs.map(_._1), pairs.map(_._2), jt)
    })
  }

  /** One hop's extracted join shape inside a snowflake chain. */
  final case class SnowHop(leftAlias: String, rightAlias: String,
      leftCols: Seq[String], rightCols: Seq[String], joinType: String)

  /** Everything [[CreateMaterializedViewCommand]] needs to AUTO-CHAIN
    * a snowflaked plain-join view: aliases in FROM order, one
    * [[SnowHop]] per join (leftAlias = the PARENT relation), the
    * outputs as (expression SQL text, output name, the expression's
    * 2-part-qualified references as (folded qualifier, column)) — a
    * pure column is just the one-ref case — and the WHERE
    * condition's 2-part-qualified references with its original
    * text. */
  final case class SnowTreeShape(aliases: Seq[String],
      hops: Seq[SnowHop],
      outputs: Seq[(String, String, Seq[(String, String)])],
      whereRefs: Seq[(String, String)], whereText: Option[String])

  /** A join TREE of N ≥ 2 joins — each join's ON links the relation
    * it introduces to exactly ONE earlier relation, its PARENT: the
    * linear snowflake chain (`fact ⋈ d1 ON fact, d2 ⋈ d1 ON d1, …`),
    * a star with a snowflaked leg (`fact ⋈ d1 ON fact, fact ⋈ d2 ON
    * fact, d3 ⋈ d2 ON d2`), and any mix are all trees. Returns
    * (aliases in FROM order, one [[SnowHop]] per join with
    * `leftAlias` = the parent's alias). None for the pure STAR
    * (every parent the fact — [[joinShapeOf]]'s shape, always tried
    * first, so a star landing here had a SELECT-list problem the
    * star contract should name), ONs that reference two earlier
    * relations or none, and anything non-left-deep. */
  private def treeHopsOf(p: LogicalPlan)
      : Option[(Seq[String], Seq[SnowHop])] = {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo}
    val joins = p.collect { case j: Join => j }
    if (joins.length < 2) return None
    val badAbove = p.collect {
      case n if !n.isInstanceOf[Project] && !n.isInstanceOf[Filter] &&
        !n.isInstanceOf[SubqueryAlias] && !n.isInstanceOf[Join] &&
        !n.isInstanceOf[UnresolvedRelation] => n
    }
    if (badAbove.nonEmpty) return None
    val leftDeep = joins.sliding(2).forall {
      case Seq(outer, inner) => outer.left eq inner
      case _ => true
    }
    if (!leftDeep) return None
    def sideOf(n: LogicalPlan): Option[String] = n match {
      case s: SubqueryAlias if s.child.isInstanceOf[UnresolvedRelation]
        => Some(s.alias)
      case u: UnresolvedRelation => Some(u.multipartIdentifier.last)
      case _ => None
    }
    val fold: String => String =
      if (org.apache.spark.sql.internal.SQLConf.get
          .caseSensitiveAnalysis) identity
      else _.toLowerCase(java.util.Locale.ROOT)
    val fromOrder = joins.reverse
    val aliases = sideOf(joins.last.left).getOrElse(return None) +:
      fromOrder.map(j => sideOf(j.right).getOrElse(return None))
    if (aliases.map(fold).distinct.length != aliases.length)
      return None
    def conjuncts(e: org.apache.spark.sql.catalyst.expressions
        .Expression): Seq[org.apache.spark.sql.catalyst.expressions
        .Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // one hop: every equality links the introduced relation `ra` to
    // ONE consistent earlier relation — the parent
    def hopOf(j: Join, earlier: Seq[String], ra: String)
        : Option[SnowHop] = {
      val jt = j.joinType match {
        case Inner => "inner"
        case LeftOuter => "left"
        case _ => return None
      }
      val byFold = earlier.map(a => fold(a) -> a).toMap
      val triples = j.condition.toSeq.flatMap(conjuncts).map {
        case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
            if a.nameParts.length == 2 && b.nameParts.length == 2 =>
          val (rSide, oSide) =
            if (fold(a.nameParts.head) == fold(ra)) (a, b)
            else if (fold(b.nameParts.head) == fold(ra)) (b, a)
            else return None
          val pq = fold(oSide.nameParts.head)
          if (pq == fold(ra) || !byFold.contains(pq)) return None
          (byFold(pq), oSide.nameParts.last, rSide.nameParts.last)
        case _ => return None
      }
      if (triples.isEmpty ||
        triples.map(_._1).distinct.length != 1) return None
      val pairs = triples.map(t => (t._2, t._3))
      if (pairs.map(_._1).distinct.length != pairs.length) return None
      Some(SnowHop(triples.head._1, ra, pairs.map(_._1),
        pairs.map(_._2), jt))
    }
    val hops = fromOrder.zipWithIndex.map { case (j, i) =>
      hopOf(j, aliases.take(i + 1), aliases(i + 1))
        .getOrElse(return None) }
    // the pure star belongs to joinShapeOf (tried first): reaching
    // here with one means the SELECT list was the problem — let the
    // caller refuse with the star contract instead of attempting a
    // peel that cannot terminate
    if (hops.forall(h => fold(h.leftAlias) == fold(aliases.head)))
      return None
    Some((aliases, hops))
  }

  /** Match the SNOWFLAKED plain-join shape — any join TREE
    * ([[treeHopsOf]]) that is not the pure star [[joinShapeOf]]
    * expresses: `SELECT <outputs> FROM fact f JOIN d1 ON f.fk = d1.dk
    * JOIN d2 ON d1.b = d2.c [JOIN …] [WHERE <qualified refs only>]`.
    * The engine auto-chains it: each CREATE level peels one
    * fact-adjacent hop with children into a hidden `fact ⋈ dX` join
    * silver and rewrites the view onto (silver, remaining dims) —
    * recursing until the rewrite is a STAR the standard join-view
    * machinery maintains. Outputs are qualified columns or aliased
    * row-pure EXPRESSIONS; every reference must be 2-part qualified
    * (the cross-hop rewrite relocates each reference exactly) —
    * None otherwise. */
  def snowflakeShapeOf(p: LogicalPlan): Option[SnowTreeShape] = {
    val (aliases, hops) = treeHopsOf(p).getOrElse(return None)
    val fold: String => String =
      if (org.apache.spark.sql.internal.SQLConf.get
          .caseSensitiveAnalysis) identity
      else _.toLowerCase(java.util.Locale.ROOT)
    // outputs: 2-part qualified over the tree's aliases
    val proj = p match {
      case pr: Project => pr
      case _ => return None
    }
    val known = aliases.map(fold).toSet
    def qualCol(ua: UnresolvedAttribute): Option[(String, String)] =
      if (ua.nameParts.length == 2 &&
        known.contains(fold(ua.nameParts.head)))
        Some((fold(ua.nameParts.head), ua.nameParts.last))
      else None
    // an output may be a pure qualified column, or (r18) an ALIASED
    // row-pure EXPRESSION whose every reference is 2-part qualified
    // — the cross-hop rewrite relocates each reference exactly; an
    // aggregate/window/subquery inside is not row-pure and refuses
    def exprOut(e: Expression, name: String)
        : Option[(String, String, Seq[(String, String)])] = {
      val refs = e.collect { case ua: UnresolvedAttribute => ua }
      if (!refs.forall(ua => qualCol(ua).isDefined)) return None
      val bad = e.collectFirst {
        case fn: UnresolvedFunction if fn.nameParts.length == 1 &&
          AggFnNames.contains(fn.nameParts.head
            .toLowerCase(java.util.Locale.ROOT)) => ()
        case pe: PlanExpression[_] => ()
      }
      if (bad.isDefined) None
      else Some((e.sql, name, refs.map(ua => qualCol(ua).get)))
    }
    val outs = proj.projectList.map {
      case ua: UnresolvedAttribute =>
        qualCol(ua).map { case (q, c) =>
          (ua.sql, c, Seq((q, c))) }.getOrElse(return None)
      case UnresolvedAlias(ua: UnresolvedAttribute, _) =>
        qualCol(ua).map { case (q, c) =>
          (ua.sql, c, Seq((q, c))) }.getOrElse(return None)
      case Alias(ua: UnresolvedAttribute, name) =>
        qualCol(ua).map { case (q, c) =>
          (ua.sql, name, Seq((q, c))) }.getOrElse(return None)
      case Alias(child, name) =>
        exprOut(child, name).getOrElse(return None)
      case _ => return None
    }
    if (outs.map(_._2).distinct.length != outs.length) return None
    // WHERE: every reference 2-part qualified (the rewrite onto the
    // silver must be exact); keep the refs and the original text
    val (whereRefs, whereText) = proj.child match {
      case fl: Filter =>
        val refs = fl.condition.collect {
          case ua: UnresolvedAttribute => ua }
        if (!refs.forall(ua => qualCol(ua).isDefined)) return None
        (refs.map(ua => qualCol(ua).get), Some(fl.condition.sql))
      case _ => (Nil, None)
    }
    Some(SnowTreeShape(aliases, hops, outs, whereRefs, whereText))
  }
}

/** The CREATE statement: validate the query's shape, run the
  * bootstrap build, persist the spec in the destination's properties
  * (re-pinning `src=vN` in the property commit's note). Returns one
  * row (kind, from_version, to_version). */
case class CreateMaterializedViewCommand(parts: Seq[String],
    ifNotExists: Boolean, rowKeySpelling: Boolean, key: String,
    queryText: String,
    partitionCol: Option[String] = None,
    // internal recursion plumbing (the snowflake-aggregate rewrite):
    // autoChain marks the created view so plain refresh_mv cascades
    // into its hidden upstream; extraProps ride the bootstrap commit
    // (e.g. the ORIGINAL pre-rewrite query text); snowDepth numbers
    // the hidden `.snow[k]` silvers an N-hop chain peels per level
    autoChain: Boolean = false,
    extraProps: Map[String, String] = Map.empty,
    snowDepth: Int = 0)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{IntegerType, StringType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("kind", StringType, nullable = false)(),
      AttributeReference("from_version", IntegerType, nullable = false)(),
      AttributeReference("to_version", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val name = parts.mkString(".")
    val dstDir = MvDdl.destDir(spark, parts, "CREATE MATERIALIZED VIEW")
    if (Versioned.currentVersion(spark, dstDir) > 0) {
      if (ifNotExists) return Seq.empty
      throw new IllegalStateException(
        s"table $name already exists (CREATE MATERIALIZED VIEW " +
          "refuses to adopt standing tables; DROP it or use IF NOT " +
          "EXISTS)")
    }
    val parsed = spark.sessionState.sqlParser.parsePlan(queryText)
    // the precondition messages cite the contract the query is
    // actually under: an aggregate query gets the agg-shape contract
    // (the agg-over-join one when it also joins), anything else the
    // row-pure one
    val isAggQuery = parsed.exists {
      case _: Aggregate => true
      case _ => false
    }
    val hasJoin = parsed.exists {
      case _: Join => true
      case _ => false
    }
    val isJoinQuery = !isAggQuery && hasJoin
    val isAggJoin = isAggQuery && hasJoin
    val shapeMsg =
      if (isAggJoin) MvDdl.AggJoinShapeMsg
      else if (isAggQuery) MvDdl.AggShapeMsg
      else if (isJoinQuery) MvDdl.JoinShapeMsg
      else MvDdl.RowPureMsg
    // relations INSIDE subquery expressions would dodge the
    // table-count rule, and windows/subqueries aren't row-pure —
    // sweep the expression trees before counting relations
    val exprBad = parsed.flatMap(_.expressions.flatMap(_.collect {
      case _: PlanExpression[_] => "subquery"
      case w if w.getClass.getSimpleName.contains("Window") =>
        "window function"
    })).distinct
    require(exprBad.isEmpty,
      s"${exprBad.mkString(", ")} in the view query: " + shapeMsg)
    val rels = parsed.collect { case u: UnresolvedRelation => u }
    if (!isJoinQuery && !isAggJoin)
      require(rels.length == 1,
        s"the view query reads ${rels.length} tables: " + shapeMsg)
    else {
      require(rels.length >= 2,
        s"the view query reads ${rels.length} tables: " + shapeMsg)
      require(rels.map(_.multipartIdentifier).distinct.length ==
          rels.length,
        "the view query reads the same table twice (self-join): " +
          shapeMsg)
    }
    val srcDir = GraftDdl.tableDir(spark, rels.head.multipartIdentifier,
      "CREATE MATERIALIZED VIEW source")
    val srcCols = Versioned.read(spark, srcDir).columns.toSet
    require(srcCols.contains(key),
      s"key column '$key' is not in the source table " +
        s"(has: ${srcCols.toSeq.sorted.mkString(", ")})")
    if (isAggJoin) {
      // aggregate-over-join AUTO-CHAINS: a hidden silver join view
      // at `<dst>.silver` materializes the projected join stream
      // (reusing the original FROM/JOIN/WHERE text verbatim), and
      // the gold is the standard delta-maintained aggregate view
      // over it — one name, one refresh_mv (auto-cascade), DROP
      // removes both
      require(rowKeySpelling,
        "a GROUP BY materialized view names the SOURCE row identity " +
          "— spell it ROW KEY (<fact row id>), not KEY")
      val starAgg = MvDdl.aggOverJoinShapeOf(parsed)
      if (starAgg.isEmpty) {
        // not a star under the aggregate: the 3-relation SNOWFLAKE
        // auto-chains — a hidden fact⋈d1 join silver materializes at
        // `<dst>.snow`, the aggregate query REWRITES onto
        // `silver ⋈ d2` (now a star), and this command recurses into
        // the standard aggregate-over-join machinery
        val snowAgg = MvDdl.aggOverSnowflakeShapeOf(parsed).getOrElse(
          throw new UnsupportedOperationException(
            MvDdl.AggJoinShapeMsg))
        return SnowflakeAggCreate.run(spark, parts, dstDir, srcDir,
          srcCols, rels, snowAgg, key, queryText, partitionCol,
          snowDepth, extraProps)
      }
      val (factAlias, gs, vals, avgs, dis, cds, kll, ext, shape) =
        starAgg.get
      require(shape.length == rels.length - 1, MvDdl.AggJoinShapeMsg)
      // several measures may read the SAME join column (sum + kll of
      // one value, min/max of a summed column): the slice projects
      // each distinct (name, qualified source) ONCE — only a name
      // fed from two DIFFERENT sources is a real collision
      val measureCols = (vals ++ dis ++ cds ++ kll ++ ext).distinct
      val silverCols = key +: (gs.map(_._1) ++ measureCols.map(_._1))
      require(silverCols.distinct.length == silverCols.length,
        s"the view's column names collide after unqualifying " +
          s"(${silverCols.mkString(", ")}) — alias the group keys " +
          "apart from the row key and aggregate columns")
      val dimsCols = rels.tail.zip(shape).map { case (rel, (fks, dks,
          jt)) =>
        val dimDir = GraftDdl.tableDir(spark,
          rel.multipartIdentifier, "CREATE MATERIALIZED VIEW dim")
        fks.foreach(fk => require(srcCols.contains(fk),
          s"join column '$fk' is not in the fact table " +
            s"(has: ${srcCols.toSeq.sorted.mkString(", ")})"))
        val dimCols = Versioned.read(spark, dimDir).columns.toSet
        dks.foreach(dk => require(dimCols.contains(dk),
          s"join column '$dk' is not in the dim table " +
            s"(has: ${dimCols.toSeq.sorted.mkString(", ")})"))
        ((DerivedTable.JoinDim(dimDir, fks, dks), jt), dimCols)
      }
      val dims = dimsCols.map(_._1)
      // an EXPRESSION group whose alias names a real fact/dim column
      // refuses: Spark resolves GROUP BY <name> to the column FIRST,
      // so the gate and the analyzer would disagree about what the
      // definition groups by (the single-table shadow rule's twin)
      val allCols = srcCols ++ dimsCols.flatMap(_._2)
      gs.collect { case (n, _, true) if allCols.contains(n) => n }
        .foreach(n => throw new IllegalArgumentException(
          s"derived group name '$n' shadows a fact/dim column — " +
            "alias the bucket differently"))
      val tail = queryText match {
        case MvDdl.AggJoinSplit(t) => t
        case _ => throw new UnsupportedOperationException(
          MvDdl.AggJoinShapeMsg)
      }
      val silverText = s"SELECT `$factAlias`.`$key` AS `$key`, " +
        (gs.map { case (a, q, _) => s"$q AS `$a`" } ++
          measureCols.map { case (c, q) => s"$q AS `$c`" })
          .mkString(", ") +
        s" FROM $tail"
      // INVERTIBLE-measure shapes (sum/cnt/avg only) maintain the
      // gold DIRECTLY — no hidden silver, no second copy of the join
      // stream, ONE commit per refresh: each refresh re-derives the
      // touched fact keys' join output at the pinned versions and
      // patches the groups algebraically ([[DerivedTable
      // .refreshAggJoin]]). Extrema and approx-distinct need an
      // affected-group RECOMPUTE whose input is a fact-wide join, so
      // those shapes keep the hidden-silver auto-chain below (silver
      // point reads make the recompute O(touched groups)).
      if (dis.isEmpty && cds.isEmpty && kll.isEmpty && ext.isEmpty) {
        val (from, to) = DerivedTable.refreshAggJoin(spark, srcDir,
          dims.map(_._1), dstDir, key,
          DerivedTable.mvJoinTransformStar(spark, silverText),
          gs.map(_._1), vals.map(_._1), avgs = avgs,
          partitionCol = partitionCol,
          bootstrapProps = Map(
            DerivedTable.MvKindProp -> "aggjoin",
            DerivedTable.MvSourceProp -> srcDir,
            DerivedTable.MvDimProp ->
              dims.map(_._1.dir).mkString(";"),
            DerivedTable.MvRowKeyProp -> key,
            DerivedTable.MvFkProp ->
              dims.map(_._1.fkCols.mkString(",")).mkString(";"),
            DerivedTable.MvDimKeyProp ->
              dims.map(_._1.dimKeys.mkString(",")).mkString(";"),
            DerivedTable.MvJoinTypeProp ->
              dims.map(_._2).mkString(";"),
            DerivedTable.MvGroupProp -> gs.map(_._1).mkString(","),
            DerivedTable.MvValueProp -> vals.map(_._1).mkString(","),
            DerivedTable.MvQueryProp -> queryText,
            DerivedTable.MvSliceProp -> silverText) ++
            (if (avgs.nonEmpty)
              Seq(DerivedTable.MvAvgProp -> avgs.mkString(","))
             else Nil) ++
            (if (autoChain)
              Seq(DerivedTable.MvAutoChainProp -> "true")
             else Nil) ++ extraProps ++
            partitionCol.map(DerivedTable.MvPartitionProp -> _))
        return Seq(Row("aggjoin", from, to))
      }
      val silverDir = dstDir + ".silver"
      require(Versioned.currentVersion(spark, silverDir) == 0,
        s"$silverDir already exists — a crashed CREATE left the " +
          "hidden silver behind; remove it and retry")
      DerivedTable.refreshJoinStar(spark, srcDir, dims.map(_._1),
        silverDir, key,
        DerivedTable.mvJoinTransformStar(spark, silverText),
        bootstrapProps = Map(
          DerivedTable.MvKindProp -> "join",
          DerivedTable.MvSourceProp -> srcDir,
          DerivedTable.MvDimProp ->
            dims.map(_._1.dir).mkString(";"),
          DerivedTable.MvKeyProp -> key,
          DerivedTable.MvFkProp ->
            dims.map(_._1.fkCols.mkString(",")).mkString(";"),
          DerivedTable.MvDimKeyProp ->
            dims.map(_._1.dimKeys.mkString(",")).mkString(";"),
          DerivedTable.MvJoinTypeProp ->
            dims.map(_._2).mkString(";"),
          DerivedTable.MvQueryProp -> silverText,
          DerivedTable.MvHiddenSilverOfProp -> dstDir))
      val (from, to) =
        try DerivedTable.refreshAgg(spark, silverDir, dstDir, key,
          gs.map(_._1), vals.headOption.map(_._1).getOrElse(""),
          extrema = ext.map(_._1),
          moreValues = vals.drop(1).map(_._1), avgCols = avgs,
          distinctCols = dis.map(_._1),
          exactDistinctCols = cds.map(_._1), kllCols = kll.map(_._1),
          partitionCol = partitionCol,
          bootstrapProps = Map(
            DerivedTable.MvKindProp -> "agg",
            DerivedTable.MvSourceProp -> silverDir,
            DerivedTable.MvRowKeyProp -> key,
            DerivedTable.MvGroupProp -> gs.map(_._1).mkString(","),
            DerivedTable.MvValueProp -> vals.map(_._1).mkString(","),
            DerivedTable.MvExtremaProp -> ext.map(_._1).mkString(","),
            DerivedTable.MvQueryProp -> queryText,
            DerivedTable.MvAutoChainProp -> "true") ++
            (if (avgs.nonEmpty)
              Seq(DerivedTable.MvAvgProp -> avgs.mkString(","))
             else Nil) ++
            (if (dis.nonEmpty)
              Seq(DerivedTable.MvDistinctProp ->
                dis.map(_._1).mkString(","))
             else Nil) ++
            (if (cds.nonEmpty)
              Seq(DerivedTable.MvExactDistinctProp ->
                cds.map(_._1).mkString(","))
             else Nil) ++
            (if (kll.nonEmpty)
              Seq(DerivedTable.MvKllProp ->
                kll.map(_._1).mkString(","))
             else Nil) ++ extraProps ++
            partitionCol.map(DerivedTable.MvPartitionProp -> _))
        catch { case e: Throwable =>
          // CREATE spans two tables; a failed gold bootstrap must
          // not strand the silver (the retry would refuse on it)
          val p = new org.apache.hadoop.fs.Path(silverDir)
          scala.util.Try(p.getFileSystem(
            spark.sessionState.newHadoopConf()).delete(p, true))
          throw e
        }
      Seq(Row("aggjoin", from, to))
    } else if (isAggQuery) {
      val (gs, vals, vExprs, avgs, dis, cds, kll, ext, where) =
        MvDdl.aggShapeOf(parsed)
        .getOrElse(
          throw new UnsupportedOperationException(MvDdl.AggShapeMsg))
      require(rowKeySpelling,
        "a GROUP BY materialized view names the SOURCE row identity " +
          "— spell it ROW KEY (<source row id>), not KEY")
      val bare = gs.collect { case (g, None) => g }
      val gExprs = gs.collect { case (g, Some(t)) => (g, t) }
      // expression-valued measures materialize as derived columns —
      // exempt their names from the source-column check
      val derivedVals = vExprs.map(_._1).toSet
      (bare ++ vals ++ dis ++ cds ++ kll ++ ext)
        .filterNot(derivedVals.contains).foreach(c =>
        require(srcCols.contains(c),
          s"column '$c' is not in the source table " +
            s"(has: ${srcCols.toSeq.sorted.mkString(", ")})"))
      // a bucket alias that SHADOWS a source column would change
      // what the stored WHERE sees at refresh time — refuse eagerly
      // (refreshAgg re-checks, but HERE the user can still edit);
      // the same rule covers derived MEASURE names
      gExprs.map(_._1).filter(srcCols.contains).foreach(n =>
        throw new IllegalArgumentException(
          s"derived group name '$n' shadows a source column — " +
            "alias the bucket differently"))
      derivedVals.filter(srcCols.contains).foreach(n =>
        throw new IllegalArgumentException(
          s"derived measure name '$n' shadows a source column — " +
            "alias the measure differently"))
      // reference checks shared by the WHERE predicate and every
      // bucket expression: qualified names can't re-resolve against
      // the bare snapshot reads at refresh time, unknown columns
      // refuse NOW, not at the first refresh
      def checkRefs(text: String, what: String): Unit = {
        val refs = spark.sessionState.sqlParser.parseExpression(text)
          .collect { case ua: UnresolvedAttribute => ua }
        val quals = refs.filter(_.nameParts.length > 1).map(_.name)
        require(quals.isEmpty,
          s"$what references ${quals.mkString(", ")} with a " +
            "qualifier — the stored text re-resolves against " +
            "the bare source columns at every refresh; use " +
            "unqualified names")
        refs.filter(_.nameParts.length == 1).map(_.nameParts.head)
          .foreach(c => require(srcCols.contains(c),
            s"$what column '$c' is not in the source table " +
              s"(has: ${srcCols.toSeq.sorted.mkString(", ")})"))
      }
      where.foreach(checkRefs(_, "WHERE"))
      gExprs.foreach { case (g, t) =>
        checkRefs(t, s"group expression '$g'") }
      vExprs.foreach { case (v, t) =>
        checkRefs(t, s"measure expression '$v'") }
      // the spec rides the BOOTSTRAP commit itself — data, pin, and
      // identity publish atomically, so no crash window can leave a
      // standing table that is not yet (and can never become) a view
      val (from, to) = DerivedTable.refreshAgg(spark, srcDir, dstDir,
        key, gs.map(_._1), vals.headOption.getOrElse(""),
        extrema = ext, where = where,
        partitionCol = partitionCol,
        groupExprs = gExprs, moreValues = vals.drop(1), avgCols = avgs,
        distinctCols = dis, exactDistinctCols = cds, kllCols = kll,
        valueExprs = vExprs,
        bootstrapProps = Map(
          DerivedTable.MvKindProp -> "agg",
          DerivedTable.MvSourceProp -> srcDir,
          DerivedTable.MvRowKeyProp -> key,
          DerivedTable.MvGroupProp -> gs.map(_._1).mkString(","),
          DerivedTable.MvValueProp -> vals.mkString(","),
          DerivedTable.MvExtremaProp -> ext.mkString(","),
          DerivedTable.MvQueryProp -> queryText) ++
          gExprs.map { case (g, t) =>
            (DerivedTable.MvGroupExprPrefix + g) -> t } ++
          vExprs.map { case (v, t) =>
            (DerivedTable.MvValueExprPrefix + v) -> t } ++
          (if (avgs.nonEmpty)
            Seq(DerivedTable.MvAvgProp -> avgs.mkString(","))
           else Nil) ++
          (if (dis.nonEmpty)
            Seq(DerivedTable.MvDistinctProp -> dis.mkString(","))
           else Nil) ++
          (if (cds.nonEmpty)
            Seq(DerivedTable.MvExactDistinctProp -> cds.mkString(","))
           else Nil) ++
          (if (kll.nonEmpty)
            Seq(DerivedTable.MvKllProp -> kll.mkString(","))
           else Nil) ++
          where.map(DerivedTable.MvWhereProp -> _) ++
          partitionCol.map(DerivedTable.MvPartitionProp -> _))
      Seq(Row("agg", from, to))
    } else if (isJoinQuery) {
      require(!rowKeySpelling,
        "ROW KEY is the aggregate-view spelling; a join view takes " +
          "KEY (<fact key column>)")
      val starShape = MvDdl.joinShapeOf(parsed)
      if (starShape.isEmpty) {
        // not a star: a SNOWFLAKED join tree auto-chains — each
        // level peels one fact-adjacent hop into a hidden fact⋈dX
        // silver at <dst>.snow[k] and rewrites the view onto
        // (silver, remaining dims), recursing until it is a star
        val snow = MvDdl.snowflakeShapeOf(parsed).getOrElse(
          throw new UnsupportedOperationException(MvDdl.JoinShapeMsg))
        return SnowflakeCreate.run(spark, parts, dstDir, srcDir,
          srcCols, rels, snow, key, queryText, partitionCol,
          snowDepth, extraProps)
      }
      val shape = starShape.get
      require(shape.length == rels.length - 1,
        MvDdl.JoinShapeMsg)
      val dims = rels.tail.zip(shape).map { case (rel, (fks, dks,
          jt)) =>
        val dimDir = GraftDdl.tableDir(spark,
          rel.multipartIdentifier, "CREATE MATERIALIZED VIEW dim")
        val dimCols = Versioned.read(spark, dimDir).columns.toSet
        fks.foreach(fk => require(srcCols.contains(fk),
          s"join column '$fk' is not in the fact table " +
            s"(has: ${srcCols.toSeq.sorted.mkString(", ")})"))
        dks.foreach(dk => require(dimCols.contains(dk),
          s"join column '$dk' is not in the dim table " +
            s"(has: ${dimCols.toSeq.sorted.mkString(", ")})"))
        (DerivedTable.JoinDim(dimDir, fks, dks), jt)
      }
      // spec rides the bootstrap commit — see the agg branch;
      // multi-dim fragments join with `;` in FROM order
      val ((from, to), _) = DerivedTable.refreshJoinStar(spark, srcDir,
        dims.map(_._1), dstDir, key,
        DerivedTable.mvJoinTransformStar(spark, queryText),
        partitionCol = partitionCol,
        bootstrapProps = Map(
          DerivedTable.MvKindProp -> "join",
          DerivedTable.MvSourceProp -> srcDir,
          DerivedTable.MvDimProp ->
            dims.map(_._1.dir).mkString(";"),
          DerivedTable.MvKeyProp -> key,
          DerivedTable.MvFkProp ->
            dims.map(_._1.fkCols.mkString(",")).mkString(";"),
          DerivedTable.MvDimKeyProp ->
            dims.map(_._1.dimKeys.mkString(",")).mkString(";"),
          DerivedTable.MvJoinTypeProp ->
            dims.map(_._2).mkString(";"),
          DerivedTable.MvQueryProp -> queryText) ++
          // a snowflake peel's terminal star carries the auto-chain
          // mark (refresh_mv cascades through the hidden silvers)
          // and the inherited props (the pre-rewrite query text)
          (if (autoChain)
            Seq(DerivedTable.MvAutoChainProp -> "true")
           else Nil) ++ extraProps ++
          partitionCol.map(DerivedTable.MvPartitionProp -> _))
      Seq(Row("join", from, to))
    } else {
      require(!rowKeySpelling,
        "ROW KEY is the aggregate-view spelling; a row-pure view " +
          "takes KEY (<key column>)")
      // structural row-purity: only projection/filter over the table
      val badNodes = parsed.collect {
        case p if !p.isInstanceOf[Project] && !p.isInstanceOf[Filter] &&
          !p.isInstanceOf[SubqueryAlias] &&
          !p.isInstanceOf[UnresolvedRelation] => p.nodeName
      }.distinct
      require(badNodes.isEmpty,
        s"${badNodes.mkString(", ")} in the view query: " +
          MvDdl.RowPureMsg)
      val t = DerivedTable.mvTransform(spark, queryText)
      // spec rides the bootstrap commit — see the agg branch
      val (from, to) = DerivedTable.refresh(spark, srcDir, dstDir,
        key, t, partitionCol = partitionCol, bootstrapProps = Map(
          DerivedTable.MvKindProp -> "derived",
          DerivedTable.MvSourceProp -> srcDir,
          DerivedTable.MvKeyProp -> key,
          DerivedTable.MvQueryProp -> queryText) ++
          partitionCol.map(DerivedTable.MvPartitionProp -> _))
      Seq(Row("derived", from, to))
    }
  }
}

/** The snowflaked plain-join CREATE continuation of
  * [[CreateMaterializedViewCommand]] — see [[MvDdl.snowflakeShapeOf]].
  * The same peel discipline as [[SnowflakeAggCreate]]: pick the
  * first fact-adjacent dim X that other relations hang off,
  * materialize the hidden fact⋈X join silver at `<dst>.snow[k]`,
  * rewrite the outputs/ONs/WHERE onto (silver, remaining dims), and
  * recurse — until the rewrite is a STAR the standard join-view
  * machinery maintains. */
private object SnowflakeCreate {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute

  def run(spark: SparkSession, parts: Seq[String], dstDir: String,
      factDir: String, factCols: Set[String],
      rels: Seq[UnresolvedRelation], snow: MvDdl.SnowTreeShape,
      key: String, queryText: String,
      partitionCol: Option[String], depth: Int,
      inheritedProps: Map[String, String]): Seq[Row] = {
    val aliases = snow.aliases; val hops = snow.hops
    require(rels.length == aliases.length, MvDdl.JoinShapeMsg)
    val fold: String => String =
      if (org.apache.spark.sql.internal.SQLConf.get
          .caseSensitiveAnalysis) identity
      else _.toLowerCase(java.util.Locale.ROOT)
    def relText(r: UnresolvedRelation): String =
      r.multipartIdentifier.map(p => s"`$p`").mkString(".")
    val relCols: Seq[Set[String]] = factCols +:
      rels.tail.map(r => Versioned.read(spark, GraftDdl.tableDir(
        spark, r.multipartIdentifier,
        "CREATE MATERIALIZED VIEW dim")).columns.toSet)
    val quals = aliases.map(fold)
    val byQual = quals.zip(relCols).toMap
    def requireIn(cols: Seq[String], in: Set[String],
        what: String): Unit =
      cols.foreach(c => require(in.contains(c),
        s"column '$c' is not in the $what table " +
          s"(has: ${in.toSeq.sorted.mkString(", ")})"))
    hops.indices.foreach { i =>
      requireIn(hops(i).leftCols, byQual(fold(hops(i).leftAlias)),
        s"hop-${i + 1} left (${hops(i).leftAlias})")
      requireIn(hops(i).rightCols, relCols(i + 1),
        s"hop-${i + 1} right")
    }
    (snow.outputs.flatMap(_._3) ++ snow.whereRefs)
      .foreach { case (q, c) => require(byQual(q).contains(c),
        s"column '$q.$c' is not in its table") }
    val fQ = quals.head
    // PEEL target: the first fact-adjacent dim other hops hang off —
    // see [[SnowflakeAggCreate]] (treeHopsOf excluded pure stars)
    val parentsWithChildren = hops.map(h => fold(h.leftAlias)).toSet
    val peelIdx = hops.indexWhere(h => fold(h.leftAlias) == fQ &&
      parentsWithChildren.contains(fold(h.rightAlias)))
    require(peelIdx >= 0, MvDdl.JoinShapeMsg)
    val peelHop = hops(peelIdx)
    val xA = peelHop.rightAlias; val xQ = fold(xA)
    val xRel = rels(peelIdx + 1)
    val xDir = GraftDdl.tableDir(spark, xRel.multipartIdentifier,
      "CREATE MATERIALIZED VIEW dim")
    // silver columns: everything the outer SELECT/WHERE references
    // from fact and X, the key, the remaining star legs' fact-side
    // join columns, and X's children's join columns — output names
    // unqualify, so cross-relation collisions refuse
    val allRefs = snow.outputs.flatMap(_._3) ++ snow.whereRefs
    val otherHops = hops.zipWithIndex.filter(_._2 != peelIdx)
      .map(_._1)
    val neededF = (key +: (allRefs.collect {
      case (q, c) if q == fQ => c } ++
      otherHops.filter(h => fold(h.leftAlias) == fQ)
        .flatMap(_.leftCols))).distinct
    val neededX = (allRefs.collect { case (q, c) if q == xQ => c } ++
      otherHops.filter(h => fold(h.leftAlias) == xQ)
        .flatMap(_.leftCols)).distinct
    require(neededF.intersect(neededX).isEmpty,
      "the snowflake's hidden silver projects fact and peeled-dim " +
        s"columns unqualified, and (${neededF.intersect(neededX)
          .mkString(", ")}) collide — alias them apart (or chain " +
        "views manually)")
    def jt(t: String) = if (t == "left") "LEFT JOIN" else "JOIN"
    // NO WHERE in the silver: the predicate may reference later
    // dims, so it rides the rewritten gold query
    val silverText = "SELECT " + (neededF.map(c =>
        s"`${aliases.head}`.`$c` AS `$c`") ++
      neededX.map(c => s"`$xA`.`$c` AS `$c`"))
        .mkString(", ") +
      s" FROM ${relText(rels.head)} `${aliases.head}` " +
      jt(peelHop.joinType) + s" ${relText(xRel)} " +
      s"`$xA` ON " +
      peelHop.leftCols.zip(peelHop.rightCols).map { case (l, r) =>
        s"`${aliases.head}`.`$l` = `$xA`.`$r`"
      }.mkString(" AND ")
    val remainingQs = quals.filterNot(q => q == fQ || q == xQ).toSet
    val sAlias = Iterator.from(0)
      .map(i => if (i == 0) "snow_silver" else s"snow_silver$i")
      .find(a => !remainingQs.contains(fold(a))).get
    // rewrite any fact/peeled-dim qualifier to the silver's alias —
    // inside EXPRESSION outputs too, the same transform
    def rwText(t: String): String =
      spark.sessionState.sqlParser.parseExpression(t).transform {
        case ua: UnresolvedAttribute if ua.nameParts.length == 2 &&
            (fold(ua.nameParts.head) == fQ ||
              fold(ua.nameParts.head) == xQ) =>
          UnresolvedAttribute(Seq(sAlias, ua.nameParts.last))
      }.sql
    val outs = snow.outputs.map { case (sql, n, _) =>
      s"${rwText(sql)} AS `$n`"
    }
    val whereRewritten = snow.whereText.map(rwText)
    val silverDir =
      dstDir + (if (depth == 0) ".snow" else s".snow${depth + 1}")
    val fromTail = hops.zipWithIndex.filter(_._2 != peelIdx)
      .map { case (h, i) =>
        val pq = fold(h.leftAlias)
        val leftA = if (pq == fQ || pq == xQ) sAlias else h.leftAlias
        jt(h.joinType) + s" ${relText(rels(i + 1))} " +
          s"`${aliases(i + 1)}` ON " +
          h.leftCols.zip(h.rightCols).map { case (l, r) =>
            s"`$leftA`.`$l` = `${aliases(i + 1)}`.`$r`"
          }.mkString(" AND ")
      }.mkString(" ")
    val goldText = "SELECT " + outs.mkString(", ") +
      s" FROM `graft`.`$silverDir` `$sAlias` " + fromTail +
      whereRewritten.map(w => s" WHERE $w").getOrElse("")
    require(Versioned.currentVersion(spark, silverDir) == 0,
      s"$silverDir already exists — a crashed CREATE left the " +
        "hidden silver behind; remove it and retry")
    DerivedTable.refreshJoinStar(spark, factDir,
      Seq(DerivedTable.JoinDim(xDir, peelHop.leftCols,
        peelHop.rightCols)), silverDir, key,
      DerivedTable.mvJoinTransformStar(spark, silverText),
      bootstrapProps = Map(
        DerivedTable.MvKindProp -> "join",
        DerivedTable.MvSourceProp -> factDir,
        DerivedTable.MvDimProp -> xDir,
        DerivedTable.MvKeyProp -> key,
        DerivedTable.MvFkProp -> peelHop.leftCols.mkString(","),
        DerivedTable.MvDimKeyProp ->
          peelHop.rightCols.mkString(","),
        DerivedTable.MvJoinTypeProp -> peelHop.joinType,
        DerivedTable.MvQueryProp -> silverText,
        DerivedTable.MvHiddenSilverOfProp -> dstDir))
    try CreateMaterializedViewCommand(parts, ifNotExists = false,
      rowKeySpelling = false, key, goldText,
      partitionCol = partitionCol, autoChain = true,
      // the TOP level's pre-rewrite text survives every level
      extraProps = inheritedProps +
        ("graft.mv.original_query" -> inheritedProps
          .getOrElse("graft.mv.original_query", queryText)),
      snowDepth = depth + 1)
      .run(spark)
    catch { case e: Throwable =>
      // CREATE spans several tables; a failed downstream bootstrap
      // must not strand this level's silver (the retry would refuse)
      val p = new org.apache.hadoop.fs.Path(silverDir)
      scala.util.Try(p.getFileSystem(
        spark.sessionState.newHadoopConf()).delete(p, true))
      throw e
    }
  }
}

/** The aggregate-over-SNOWFLAKE auto-chain: pick the first
  * fact-adjacent dim X that other relations hang off, synthesize the
  * hidden fact⋈X join silver at `<dst>.snow[k]` (projecting the key,
  * every fact/X column the aggregate references, the remaining star
  * legs' fact-side join columns, and X's children's join columns),
  * REWRITE the aggregate query onto (silver, remaining dims) — a
  * join TREE one relation smaller — and recurse into
  * [[CreateMaterializedViewCommand]]. Linear chains, stars with
  * snowflaked legs, and any mixed tree peel one hop per level
  * (`.snow`, `.snow2`, …) until the rewrite is a STAR, which the
  * standard aggregate-over-join machinery maintains (direct
  * algebraic for invertible shapes, the hidden `<dst>.silver` chain
  * otherwise). One name; refresh_mv auto-cascades through every
  * hidden hop; DROP removes all. */
private object SnowflakeAggCreate {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute

  def run(spark: SparkSession, parts: Seq[String], dstDir: String,
      factDir: String, factCols: Set[String],
      rels: Seq[UnresolvedRelation],
      snowAgg: (Seq[String], Seq[MvDdl.SnowHop], Option[String],
        Seq[(String, String, Boolean)], Seq[(String, String)],
        Seq[String], Seq[(String, String)], Seq[(String, String)],
        Seq[(String, String)], Seq[(String, String)]),
      key: String, queryText: String,
      partitionCol: Option[String], depth: Int,
      inheritedProps: Map[String, String]): Seq[Row] = {
    val (aliases, hops, whereText, gs, vals, avgs, dis, cds, kll,
      ext) = snowAgg
    require(rels.length == aliases.length, MvDdl.AggJoinShapeMsg)
    val fold: String => String =
      if (org.apache.spark.sql.internal.SQLConf.get
          .caseSensitiveAnalysis) identity
      else _.toLowerCase(java.util.Locale.ROOT)
    def relText(r: UnresolvedRelation): String =
      r.multipartIdentifier.map(p => s"`$p`").mkString(".")
    // relation columns in FROM order: fact first, then each dim
    val relCols: Seq[Set[String]] = factCols +:
      rels.tail.map(r => Versioned.read(spark, GraftDdl.tableDir(
        spark, r.multipartIdentifier,
        "CREATE MATERIALIZED VIEW dim")).columns.toSet)
    val quals = aliases.map(fold)
    val byQual = quals.zip(relCols).toMap
    def requireIn(cols: Seq[String], in: Set[String],
        what: String): Unit =
      cols.foreach(c => require(in.contains(c),
        s"column '$c' is not in the $what table " +
          s"(has: ${in.toSeq.sorted.mkString(", ")})"))
    // hop i introduces relation i+1; its left columns live in the
    // PARENT relation (any earlier one — the tree shape)
    hops.indices.foreach { i =>
      requireIn(hops(i).leftCols, byQual(fold(hops(i).leftAlias)),
        s"hop-${i + 1} left (${hops(i).leftAlias})")
      requireIn(hops(i).rightCols, relCols(i + 1),
        s"hop-${i + 1} right")
    }
    val fQ = quals.head
    // PEEL target: the FIRST fact-adjacent dim other hops hang off.
    // One exists whenever the tree is not a star (walk any
    // dim-parented hop's parent chain upward — it meets the fact at
    // a dim with children); treeHopsOf already excluded pure stars.
    val parentsWithChildren = hops.map(h => fold(h.leftAlias)).toSet
    val peelIdx = hops.indexWhere(h => fold(h.leftAlias) == fQ &&
      parentsWithChildren.contains(fold(h.rightAlias)))
    require(peelIdx >= 0, MvDdl.AggJoinShapeMsg)
    val peelHop = hops(peelIdx)
    val xA = peelHop.rightAlias; val xQ = fold(xA)
    val xRel = rels(peelIdx + 1)
    val xDir = GraftDdl.tableDir(spark, xRel.multipartIdentifier,
      "CREATE MATERIALIZED VIEW dim")
    // every reference in the groups, measure arguments, and WHERE
    // must be 2-part qualified over the chain's aliases — the
    // rewrite onto the silver must be exact (a bare name is
    // ambiguous across the hops)
    val parser = spark.sessionState.sqlParser
    def refsOf(text: String): Seq[(String, String)] =
      parser.parseExpression(text).collect {
        case ua: UnresolvedAttribute =>
          require(ua.nameParts.length == 2 &&
            byQual.contains(fold(ua.nameParts.head)),
            s"reference '${ua.name}' in the aggregate-over-snowflake " +
              "query is not 2-part qualified over the chain's " +
              "relations — qualify every column (the rewrite onto " +
              "the hidden silver must be exact)")
          (fold(ua.nameParts.head), ua.nameParts.last)
      }
    val allTexts = gs.map(_._2) ++
      (vals ++ dis ++ cds ++ kll ++ ext).map(_._2) ++ whereText.toSeq
    val allRefs = allTexts.flatMap(refsOf)
    allRefs.foreach { case (q, c) => require(byQual(q).contains(c),
      s"column '$q.$c' is not in its table") }
    // the hidden silver projects (unqualified) everything fact and
    // the peeled dim contribute: referenced columns, the key, the
    // OTHER fact-adjacent hops' fact-side join columns (the
    // remaining star legs join the silver on them), and the peeled
    // dim's children's parent-side columns
    val otherHops = hops.zipWithIndex.filter(_._2 != peelIdx)
      .map(_._1)
    val neededF = (key +: (allRefs.collect {
      case (q, c) if q == fQ => c } ++
      otherHops.filter(h => fold(h.leftAlias) == fQ)
        .flatMap(_.leftCols))).distinct
    val neededX = (allRefs.collect { case (q, c) if q == xQ => c } ++
      otherHops.filter(h => fold(h.leftAlias) == xQ)
        .flatMap(_.leftCols)).distinct
    require(neededF.intersect(neededX).isEmpty,
      "the snowflake's hidden silver projects fact and peeled-dim " +
        s"columns unqualified, and (${neededF.intersect(neededX)
          .mkString(", ")}) collide — alias them apart (or chain " +
        "views manually)")
    def jt(t: String) = if (t == "left") "LEFT JOIN" else "JOIN"
    // NO WHERE in the silver: the predicate may reference later
    // dims, so it rides the rewritten gold query
    val silverText = "SELECT " + (neededF.map(c =>
        s"`${aliases.head}`.`$c` AS `$c`") ++
      neededX.map(c => s"`$xA`.`$c` AS `$c`"))
        .mkString(", ") +
      s" FROM ${relText(rels.head)} `${aliases.head}` " +
      jt(peelHop.joinType) + s" ${relText(xRel)} " +
      s"`$xA` ON " +
      peelHop.leftCols.zip(peelHop.rightCols).map { case (l, r) =>
        s"`${aliases.head}`.`$l` = `$xA`.`$r`"
      }.mkString(" AND ")
    val remainingQs = quals.filterNot(q => q == fQ || q == xQ).toSet
    val sAlias = Iterator.from(0)
      .map(i => if (i == 0) "snow_silver" else s"snow_silver$i")
      .find(a => !remainingQs.contains(fold(a))).get
    // rewrite any fact/peeled-dim qualifier to the silver's alias;
    // the remaining dims' references stay
    def rw(text: String): String =
      parser.parseExpression(text).transform {
        case ua: UnresolvedAttribute if ua.nameParts.length == 2 &&
            (fold(ua.nameParts.head) == fQ ||
              fold(ua.nameParts.head) == xQ) =>
          UnresolvedAttribute(Seq(sAlias, ua.nameParts.last))
      }.sql
    val valByName = vals.toMap
    val selList = gs.map { case (n, q, _) => s"${rw(q)} AS `$n`" } ++
      vals.flatMap { case (n, q) => Seq(
        s"sum(${rw(q)}) AS `sum_$n`",
        s"count(${rw(q)}) AS `cnt_$n`") } ++
      Seq("count(*) AS `n_rows`") ++
      avgs.map(n => s"avg(${rw(valByName(n))}) AS `avg_$n`") ++
      dis.map { case (n, q) =>
        s"approx_count_distinct(${rw(q)}) AS `adc_$n`" } ++
      cds.map { case (n, q) =>
        s"count(DISTINCT ${rw(q)}) AS `cd_$n`" } ++
      kll.map { case (n, q) => s"graft_kll(${rw(q)}) AS `kll_$n`" } ++
      ext.flatMap { case (n, q) => Seq(
        s"min(${rw(q)}) AS `min_$n`", s"max(${rw(q)}) AS `max_$n`") }
    val silverDir =
      dstDir + (if (depth == 0) ".snow" else s".snow${depth + 1}")
    // the remaining hops keep their relations and ON columns in FROM
    // order; a hop whose parent was the fact or the peeled dim joins
    // the silver's alias instead (its columns live there unqualified)
    val fromTail = hops.zipWithIndex.filter(_._2 != peelIdx)
      .map { case (h, i) =>
        val pq = fold(h.leftAlias)
        val leftA = if (pq == fQ || pq == xQ) sAlias else h.leftAlias
        jt(h.joinType) + s" ${relText(rels(i + 1))} " +
          s"`${aliases(i + 1)}` ON " +
          h.leftCols.zip(h.rightCols).map { case (l, r) =>
            s"`$leftA`.`$l` = `${aliases(i + 1)}`.`$r`"
          }.mkString(" AND ")
      }.mkString(" ")
    val rewritten = "SELECT " + selList.mkString(", ") +
      s" FROM `graft`.`$silverDir` `$sAlias` " + fromTail +
      whereText.map(w => s" WHERE ${rw(w)}").getOrElse("") +
      " GROUP BY " + gs.map(g => rw(g._2)).mkString(", ")
    require(Versioned.currentVersion(spark, silverDir) == 0,
      s"$silverDir already exists — a crashed CREATE left the " +
        "hidden silver behind; remove it and retry")
    DerivedTable.refreshJoinStar(spark, factDir,
      Seq(DerivedTable.JoinDim(xDir, peelHop.leftCols,
        peelHop.rightCols)), silverDir, key,
      DerivedTable.mvJoinTransformStar(spark, silverText),
      bootstrapProps = Map(
        DerivedTable.MvKindProp -> "join",
        DerivedTable.MvSourceProp -> factDir,
        DerivedTable.MvDimProp -> xDir,
        DerivedTable.MvKeyProp -> key,
        DerivedTable.MvFkProp -> peelHop.leftCols.mkString(","),
        DerivedTable.MvDimKeyProp ->
          peelHop.rightCols.mkString(","),
        DerivedTable.MvJoinTypeProp -> peelHop.joinType,
        DerivedTable.MvQueryProp -> silverText,
        DerivedTable.MvHiddenSilverOfProp -> dstDir))
    try CreateMaterializedViewCommand(parts, ifNotExists = false,
      rowKeySpelling = true, key, rewritten,
      partitionCol = partitionCol, autoChain = true,
      // the TOP level's pre-rewrite text survives every level
      extraProps = inheritedProps +
        ("graft.mv.original_query" -> inheritedProps
          .getOrElse("graft.mv.original_query", queryText)),
      snowDepth = depth + 1)
      .run(spark)
    catch { case e: Throwable =>
      // the recursion cleans its own hidden silvers up; this level
      // must not strand the snow silver either
      val p = new org.apache.hadoop.fs.Path(silverDir)
      scala.util.Try(p.getFileSystem(
        spark.sessionState.newHadoopConf()).delete(p, true))
      throw e
    }
  }
}

/** DROP MATERIALIZED VIEW: deletes the view's directory, but ONLY
  * when the table actually carries a materialized-view spec — a plain
  * table refuses with the DROP TABLE advice (and vice versa nothing
  * stops DROP TABLE on a view: it IS a table). */
case class DropMaterializedViewCommand(parts: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val name = parts.mkString(".")
    val dir = MvDdl.destDir(spark, parts, "DROP MATERIALIZED VIEW")
    if (Versioned.currentVersion(spark, dir) == 0) {
      if (ifExists) return Seq.empty
      throw new IllegalArgumentException(
        s"materialized view $name does not exist")
    }
    val props = Versioned.properties(spark, dir)
    require(props.contains(DerivedTable.MvKindProp),
      s"$name is a plain table, not a materialized view — use DROP " +
        "TABLE")
    // a HIDDEN silver is auto-chain machinery: dropping it alone
    // would orphan its gold (every later refresh/read dies) — drop
    // the owner, which removes both
    props.get(DerivedTable.MvHiddenSilverOfProp).foreach(owner =>
      throw new IllegalArgumentException(
        s"$name is the hidden silver of the aggregate-over-join " +
          s"view at $owner — DROP MATERIALIZED VIEW the owner " +
          "instead (it removes both)"))
    // a rewrite-enabled view deregisters from its source's pointer
    // list — a dangling entry is harmless (the rule skips absent
    // views) but costs a probe per analyzed aggregate
    if (props.get(MvRewriteRule.RewriteProp)
        .exists(_.trim.equalsIgnoreCase("true")))
      props.get(DerivedTable.MvSourceProp).foreach { src =>
        scala.util.Try {
          val cur = Versioned.properties(spark, src)
            .get(MvRewriteRule.SourceViewsProp)
            .map(_.split(";").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(Nil)
          if (cur.contains(dir)) {
            val left = cur.filterNot(_ == dir)
            if (left.isEmpty)
              Versioned.setProperties(spark, src,
                unset = Seq(MvRewriteRule.SourceViewsProp))
            else
              Versioned.setProperties(spark, src, set =
                Map(MvRewriteRule.SourceViewsProp ->
                  left.mkString(";")))
          }
          MvRewriteRule.invalidate()
        }
      }
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    f.delete(p, true)
    // an auto-chained gold owns its hidden upstream — DROP removes
    // them all: `.silver` (aggregate-over-join), `.snow` and the
    // `.snow<k>` levels an N-hop chain peeled — absent siblings no-op
    if (props.get(DerivedTable.MvAutoChainProp)
        .exists(_.trim.equalsIgnoreCase("true"))) {
      f.delete(new org.apache.hadoop.fs.Path(dir + ".silver"), true)
      f.delete(new org.apache.hadoop.fs.Path(dir + ".snow"), true)
      var k = 2
      while (f.delete(
          new org.apache.hadoop.fs.Path(dir + s".snow$k"), true))
        k += 1
    }
    Seq.empty
  }
}
