package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Cast, Coalesce, Divide, Expression, Literal,
  NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.sources.{DerivedTable, Versioned}

/** AUTOMATIC QUERY REWRITE over maintained aggregate views — the
  * classic "answer the rollup from the materialized view" move
  * (Oracle's QUERY REWRITE, Calcite's materialized-view substitution):
  * a user's `SELECT g…, sum(v), count(*) … FROM src [WHERE …] GROUP
  * BY g…` serves from a REGISTERED, provably-fresh aggregate MV over
  * the same source instead of rescanning it. At 100 TB this turns a
  * full source scan into an O(groups) view read — the cost move the
  * whole MV subsystem exists for, applied without the user rewriting
  * a line of SQL.
  *
  * Opt-in and discoverable without scanning the filesystem:
  * `CALL graft.system.enable_rewrite(view)` stamps the view
  * (`graft.mv.rewrite`) and records the view's dir in the SOURCE
  * table's own properties (`graft.rewrite.views`, a csv — the
  * materialized-view-log discipline: the base table names its
  * rewrite candidates), so ANY later session's scan of the source
  * discovers the registration from metadata it already reads.
  *
  * Correctness gate: the rewrite fires ONLY when the view's `src=vN`
  * pin EQUALS the snapshot version the query actually scans (the
  * [[MetadataAggRule.SnapshotTag]] carries it — time travel included,
  * and the comparison is exact, not "currently fresh"). A stale or
  * mid-refresh view never substitutes: the query falls back to the
  * ordinary scan, so the rewrite can change COST, never a result —
  * unless the view EXPLICITLY opts into bounded staleness
  * ([[MvRewriteRule.RewriteStaleProp]]: serve while lagging the
  * scan by at most N source versions, the stale_tolerated trade).
  * Like-for-like algebra only: sum(v) ↦ SUM(sum_v), count(v) ↦
  * SUM(cnt_v), count(*)/count(1) ↦ SUM(n_rows) (coalesced to 0 so a
  * global rollup over an empty source stays 0, non-null like count),
  * avg(v) ↦ SUM(sum_v)/SUM(cnt_v) (exactly Spark's own
  * sum-then-divide evaluation), min/max(v) ↦ MIN(min_v)/MAX(max_v)
  * when the view stores extrema. Re-aggregation makes COARSER
  * rollups serve too: any GROUP BY over a SUBSET of the view's
  * group columns (including the global rollup) — the roll-up
  * property of sums/counts/extrema. The query's WHERE must match
  * the view's stored predicate semantically (both absent, or
  * semantically equal under the session resolver); EXPRESSION group
  * keys and measures match the same way — the stored
  * `date_trunc('day', ts)` bucket or `price * (1 - disc)` argument
  * analyzes over the scan's own attributes and compares
  * semantically with the query's spelling, so the time-bucketed
  * dashboard rollup serves too; DECIMAL measures don't rewrite
  * (re-summing changes precision), and any unmapped output falls
  * back to the scan.
  *
  * Scale note: discovery costs ONE properties read per (source,
  * snapshot) per JVM (memoized — snapshots are immutable); a source
  * with no registration pays nothing else. The candidate probe is
  * two metadata reads per registered view per analyzed aggregate. */
case class MvRewriteRule(spark: SparkSession)
    extends Rule[LogicalPlan] {
  import MvRewriteRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!plan.resolved) return plan
    plan.resolveOperatorsUp {
      // note: a MetadataAggRule.ProbedTag (the sidecar fold gave up)
      // does NOT disqualify — a tombstoned snapshot's count(*) can
      // still serve from a fresh view when one is registered
      case a: Aggregate if a.getTagValue(ProbedTag).isEmpty =>
        tryRewrite(a).getOrElse {
          a.setTagValue(ProbedTag, true)
          a
        }
    }
  }

  private def tryRewrite(a: Aggregate): Option[LogicalPlan] = {
    // Aggregate over [Filter over] the TAGGED snapshot expansion
    val (cond, under) = a.child match {
      case f: Filter => (Some(f.condition), f.child)
      case c => (None, c)
    }
    val (dir, ver, out) =
      MetadataAggRule.taggedUnder(under).getOrElse(return None)
    val views = candidates(spark, dir, ver)
    if (views.isEmpty) return None
    val resolver = spark.sessionState.analyzer.resolver
    views.iterator.flatMap(v =>
        tryView(a, cond, out, dir, ver, v, resolver))
      .nextOption()
  }

  /** One candidate view against the query; None = not applicable
    * (wrong pin, shape mismatch, unmatched WHERE — never an error:
    * the fallback scan is always correct). */
  private def tryView(a: Aggregate, cond: Option[Expression],
      srcOut: Seq[Attribute], srcDir: String, scannedVer: Int,
      viewDir: String,
      resolver: (String, String) => Boolean): Option[LogicalPlan] = {
    // pin the view version FIRST and re-check head after reading the
    // note: versions only grow, so equal before/after means the note
    // belonged to exactly that version (no torn read under a
    // concurrent refresh)
    val v1 = Versioned.currentVersion(spark, viewDir)
    if (v1 == 0) return None
    val pin = Versioned.notePin(spark, viewDir, "src")
      .getOrElse(return None)
    if (Versioned.currentVersion(spark, viewDir) != v1) return None
    val props = Versioned.properties(spark, viewDir)
    if (pin != scannedVer) {
      // opt-in BOUNDED-STALENESS serving (Oracle's stale_tolerated,
      // BigQuery MV max_staleness): the view may LAG the scanned
      // snapshot by up to N source versions — the caller accepts
      // answers that miss the last N commits in exchange for the
      // O(groups) read. Only ever BEHIND: a pin AHEAD of the scan
      // (time travel below the pin) would serve future data, which
      // no staleness contract permits.
      val lagOk = props.get(RewriteStaleProp)
        .flatMap(t => scala.util.Try(t.trim.toInt).toOption)
        .exists(bound => pin < scannedVer && scannedVer - pin <= bound)
      if (!lagOk) return None
    }
    if (!props.get(DerivedTable.MvKindProp).contains("agg")) return None
    if (!props.get(DerivedTable.MvSourceProp).contains(srcDir))
      return None
    def csv(k: String): Seq[String] =
      props.get(k).map(_.split(",").map(_.trim).filter(_.nonEmpty)
        .toSeq).getOrElse(Nil)
    val groups = csv(DerivedTable.MvGroupProp)
    val values = csv(DerivedTable.MvValueProp).toSet
    val extrema = csv(DerivedTable.MvExtremaProp).toSet
    // EXPRESSION group keys and measures (GROUP BY date_trunc('day',
    // ts); sum(price * (1 - disc)) AS sum_rev) match by SEMANTIC
    // equality: each stored text analyzes over a LocalRelation
    // carrying the scan's own attributes — same expression ids, same
    // type coercion — and compares against the query's expression.
    // An unanalyzable stored text disqualifies the candidate.
    def analyzedText(t: String): Option[Expression] = scala.util.Try {
      val parsed = spark.sessionState.sqlParser.parseExpression(t)
      val an = spark.sessionState.analyzer.execute(
        org.apache.spark.sql.catalyst.plans.logical.Project(
          Seq(Alias(parsed, "x")()),
          org.apache.spark.sql.catalyst.plans.logical
            .LocalRelation(srcOut)))
      an.collectFirst {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
          p.projectList.head match {
            case Alias(c, _) => c
            case e => e
          }
      }
    }.toOption.flatten
    def storedExpr(prefix: String, n: String): Option[Expression] =
      props.get(prefix + n).map(t =>
        analyzedText(t).getOrElse(return None))
    // view groups: (name, None) for a bare column, (name, Some(e))
    // for a derived bucket
    val viewGroups: Seq[(String, Option[Expression])] = groups.map(g =>
      (g, storedExpr(DerivedTable.MvGroupExprPrefix, g)))
    // derived-measure names with their analyzed argument expressions
    val exprMeasures: Seq[(String, Expression)] =
      props.keys.filter(_.startsWith(DerivedTable.MvValueExprPrefix))
        .map(_.stripPrefix(DerivedTable.MvValueExprPrefix)).toSeq
        .map(n => (n,
          storedExpr(DerivedTable.MvValueExprPrefix, n)
            .getOrElse(return None)))
    // WHERE: both absent, or semantically equal once the stored text
    // resolves against the SAME attributes the query's filter binds.
    // The text analyzes over a LocalRelation carrying the scan's
    // output (same expression ids), so type coercion applies exactly
    // as it did to the query's own predicate — without it, `v >= 100`
    // would compare an uncoerced int literal against the query's
    // already-cast one and never match
    (props.get(DerivedTable.MvWhereProp), cond) match {
      case (None, None) => ()
      case (Some(w), Some(c)) =>
        val pc = scala.util.Try {
          val parsed = spark.sessionState.sqlParser.parseExpression(w)
          val analyzed = spark.sessionState.analyzer.execute(
            Filter(parsed,
              org.apache.spark.sql.catalyst.plans.logical
                .LocalRelation(srcOut)))
          analyzed.collectFirst { case f: Filter => f.condition }
        }.toOption.flatten.getOrElse(return None)
        if (!pc.resolved || !c.semanticEquals(pc)) return None
      case _ => return None
    }
    // query groups map onto the view's tuple — a bare column by
    // name, a derived bucket by semantic equality — and must form a
    // SUBSET of it (equal = direct projection; strict subset/empty =
    // coarser roll-up by re-aggregation)
    def groupNameOf(e: Expression): Option[String] = e match {
      case ar: AttributeReference =>
        viewGroups.collectFirst {
          case (g, None) if resolver(g, ar.name) => g }
      case _ => viewGroups.collectFirst {
        case (g, Some(ge)) if e.semanticEquals(ge) => g }
    }
    val groupNames = a.groupingExpressions.map(e =>
      groupNameOf(e).getOrElse(return None))
    // the view's head snapshot, read PINNED at the version whose
    // note was checked — immutable, so no refresh can slide data
    // under the substituted plan
    val viewScan = Versioned.read(spark, viewDir, Some(v1))
      .queryExecution.analyzed
    def vAttr(n: String): Option[Attribute] =
      viewScan.output.find(o => resolver(o.name, n))
    // EXACT group match (the query's tuple IS the view's) serves a
    // plain PROJECT over the view — no re-aggregation, no shuffle:
    // one stored row per query group by the view invariant. This is
    // also the only shape where non-rollupable measures serve:
    // count(DISTINCT c) from the exact cd_<c>, approx_count_distinct
    // at the default precision from adc_<c> (HLL slot state is a
    // per-slot max, so merge order cannot change the estimate)
    val exactMatch = groupNames.distinct.length == groups.length
    val derivedGroups = viewGroups.collect {
      case (g, Some(ge)) => (g, ge) }
    if (exactMatch)
      return tryProject(a, viewScan, vAttr, values, extrema,
        csv(DerivedTable.MvExactDistinctProp).toSet,
        csv(DerivedTable.MvDistinctProp).toSet, exprMeasures,
        derivedGroups, resolver, srcDir, scannedVer, viewDir, v1)
    def agg(f: org.apache.spark.sql.catalyst.expressions.aggregate
        .AggregateFunction): AggregateExpression =
      AggregateExpression(f, Complete, isDistinct = false)
    // COARSER regroup below: only rollupable measures apply
    // (distinct counts cannot re-aggregate across merged groups)
    // one measure mapping: the query's aggregate call onto the
    // view's maintained columns; None aborts the whole candidate
    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined || ae.mode != Complete)
        return None
      // a bare column by name, a derived measure by semantic
      // equality of the argument expression (DECIMAL re-summing
      // changes precision — fall back)
      def col(e: Expression): Option[String] = e match {
        case ar: AttributeReference
            if !ar.dataType.isInstanceOf[DecimalType] => Some(ar.name)
        case _ if e.dataType.isInstanceOf[DecimalType] => None
        case _ => exprMeasures.collectFirst {
          case (n, ex) if e.semanticEquals(ex) => n }
      }
      def measure(prefix: String, c: String): Option[Attribute] =
        values.find(resolver(_, c)).flatMap(m => vAttr(s"$prefix$m"))
      def count(c: Attribute): Expression =
        Coalesce(Seq(agg(Sum(c)), Literal(0L)))
      ae.aggregateFunction match {
        case Sum(e, _) => col(e).flatMap(measure("sum_", _)).map(c =>
          agg(Sum(c)))
        case Count(Seq(e)) => col(e) match {
          case Some(c) => measure("cnt_", c).map(count)
          case None => e match {
            // count(*) / count(<non-null literal>)
            case l: Literal if l.value != null =>
              vAttr("n_rows").map(count)
            case _ => None
          }
        }
        case Min(e) => col(e).flatMap(c =>
          extrema.find(resolver(_, c)).flatMap(m =>
            vAttr(s"min_$m"))).map(c => agg(Min(c)))
        case Max(e) => col(e).flatMap(c =>
          extrema.find(resolver(_, c)).flatMap(m =>
            vAttr(s"max_$m"))).map(c => agg(Max(c)))
        case Average(e, _) => col(e).flatMap { c =>
          for {
            s <- measure("sum_", c)
            n <- measure("cnt_", c)
          } yield Divide(Cast(agg(Sum(s)), DoubleType),
            Cast(agg(Sum(n)), DoubleType))
        }
        case _ => None
      }
    }
    // every output maps one-to-one, keeping its NAME and EXPRESSION
    // ID so parent operators' references stay bound
    def reAlias(e: Expression, of: NamedExpression): NamedExpression =
      Alias(e, of.name)(exprId = of.exprId, qualifier = of.qualifier)
    val newAggs: Seq[NamedExpression] = a.aggregateExpressions.map {
      case ar: AttributeReference =>
        vAttr(ar.name).map(reAlias(_, ar)).getOrElse(return None)
      case al @ Alias(ar: AttributeReference, _) =>
        vAttr(ar.name).map(reAlias(_, al)).getOrElse(return None)
      case al @ Alias(ae: AggregateExpression, _) =>
        mapAgg(ae).map(reAlias(_, al)).getOrElse(return None)
      // a derived BUCKET respelled in the select list (SELECT
      // date_trunc('day', ts) AS day … GROUP BY …) projects the
      // view's stored group column
      case al @ Alias(e, _)
          if e.find(_.isInstanceOf[AggregateExpression]).isEmpty =>
        groupNameOf(e).flatMap(vAttr).map(reAlias(_, al))
          .getOrElse(return None)
      // avg spells Divide(sum, count) only through mapAgg — any
      // other computed output (sum(v) + 1, grouping sets artifacts)
      // falls back to the scan
      case _ => return None
    }
    // count() over an EMPTY view still produces its row on the
    // GLOBAL rollup — Aggregate with no grouping does (one row, the
    // coalesce turns the NULL sum into 0), so no special case
    val newGroups: Seq[Expression] = groupNames.map(g =>
      vAttr(g).getOrElse(return None))
    logInfo(s"graft.mv.rewrite: serving aggregate over $srcDir@v" +
      s"$scannedVer from the maintained view $viewDir@v$v1 " +
      "(coarser re-aggregation)")
    Some(Aggregate(newGroups, newAggs, viewScan))
  }

  /** The exact-group-match fast path: the query's group tuple IS the
    * view's, so every output is one stored column (or a scalar of
    * two) — a PROJECT over the O(groups) view, zero shuffle. */
  private def tryProject(a: Aggregate, viewScan: LogicalPlan,
      vAttr: String => Option[Attribute], values: Set[String],
      extrema: Set[String], exactDistinct: Set[String],
      approxDistinct: Set[String],
      exprMeasures: Seq[(String, Expression)],
      derivedGroups: Seq[(String, Expression)],
      resolver: (String, String) => Boolean,
      srcDir: String, scannedVer: Int, viewDir: String,
      v1: Int): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate
      .HyperLogLogPlusPlus
    def col(e: Expression): Option[String] = e match {
      case ar: AttributeReference
          if !ar.dataType.isInstanceOf[DecimalType] => Some(ar.name)
      case _ if e.dataType.isInstanceOf[DecimalType] => None
      case _ => exprMeasures.collectFirst {
        case (n, ex) if e.semanticEquals(ex) => n }
    }
    def measure(prefix: String, c: String): Option[Attribute] =
      values.find(resolver(_, c)).flatMap(m => vAttr(s"$prefix$m"))
    def mapScalar(ae: AggregateExpression): Option[Expression] = {
      if (ae.filter.isDefined || ae.mode != Complete) return None
      ae.aggregateFunction match {
        // count(DISTINCT c) — exact per stored group, not rollupable,
        // so only this path serves it
        case Count(Seq(e)) if ae.isDistinct =>
          col(e).flatMap(c => exactDistinct.find(resolver(_, c))
            .flatMap(m => vAttr(s"cd_$m")))
        case _ if ae.isDistinct => None
        case Sum(e, _) => col(e).flatMap(measure("sum_", _))
        case Count(Seq(e)) => col(e) match {
          case Some(c) => measure("cnt_", c)
            .map(x => Coalesce(Seq(x, Literal(0L))))
          case None => e match {
            case l: Literal if l.value != null => vAttr("n_rows")
              .map(x => Coalesce(Seq(x, Literal(0L))))
            case _ => None
          }
        }
        case Min(e) => col(e).flatMap(c =>
          extrema.find(resolver(_, c)).flatMap(m => vAttr(s"min_$m")))
        case Max(e) => col(e).flatMap(c =>
          extrema.find(resolver(_, c)).flatMap(m => vAttr(s"max_$m")))
        case Average(e, _) => col(e).flatMap(c => for {
          s <- measure("sum_", c)
          n <- measure("cnt_", c)
        } yield Divide(Cast(s, DoubleType), Cast(n, DoubleType)))
        // approx_count_distinct at the DEFAULT precision: the stored
        // estimate derives from the merged sketch, and HLL merge is
        // a per-slot max — order-independent, so it equals a fresh
        // single-pass sketch of the same values bit-for-bit
        case h: HyperLogLogPlusPlus
            if h.relativeSD == 0.05 && h.children.length >= 1 =>
          col(h.child).flatMap(c =>
            approxDistinct.find(resolver(_, c))
              .flatMap(m => vAttr(s"adc_$m")))
        case _ => None
      }
    }
    def reAlias(e: Expression, of: NamedExpression): NamedExpression =
      Alias(e, of.name)(exprId = of.exprId, qualifier = of.qualifier)
    val outs: Seq[NamedExpression] = a.aggregateExpressions.map {
      case ar: AttributeReference =>
        vAttr(ar.name).map(reAlias(_, ar)).getOrElse(return None)
      case al @ Alias(ar: AttributeReference, _) =>
        vAttr(ar.name).map(reAlias(_, al)).getOrElse(return None)
      case al @ Alias(ae: AggregateExpression, _) =>
        mapScalar(ae).map(reAlias(_, al)).getOrElse(return None)
      case al @ Alias(e, _)
          if e.find(_.isInstanceOf[AggregateExpression]).isEmpty =>
        derivedGroups.collectFirst {
          case (g, ge) if e.semanticEquals(ge) => g }
          .flatMap(vAttr).map(reAlias(_, al)).getOrElse(return None)
      case _ => return None
    }
    logInfo(s"graft.mv.rewrite: serving aggregate over $srcDir@v" +
      s"$scannedVer from the maintained view $viewDir@v$v1 " +
      "(exact group match, projection only)")
    Some(org.apache.spark.sql.catalyst.plans.logical.Project(outs,
      viewScan))
  }
}

object MvRewriteRule {
  /** Set on an Aggregate whose candidate probe already failed this
    * analysis — fixpoint re-passes skip re-reading metadata for an
    * answer that cannot change within one immutable snapshot. */
  val ProbedTag = new TreeNodeTag[Boolean]("graft.mvRewriteProbed")

  /** The view property marking rewrite opt-in, and the SOURCE-side
    * pointer property naming its rewrite candidates (csv of view
    * dirs) — the base table names its views so any session's scan
    * discovers them from metadata it already reads. */
  val RewriteProp = "graft.mv.rewrite"
  val SourceViewsProp = "graft.rewrite.views"

  /** Opt-in bounded-staleness serving: the view may lag the scanned
    * snapshot by up to this many SOURCE versions and still
    * substitute — the explicit trade of freshness for the O(groups)
    * read (absent or 0 = the exact pin-equality default). */
  val RewriteStaleProp = "graft.mv.rewrite.max-staleness-versions"

  // (sourceDir, scannedVersion) -> registered view dirs; immutable
  // per snapshot, so memoizable for the JVM's lifetime. enable/
  // disable clear it so same-session registration is visible
  // immediately even on an unchanged snapshot.
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), Seq[String]]()

  def invalidate(): Unit = memo.clear()

  private[plans] def candidates(spark: SparkSession, dir: String,
      ver: Int): Seq[String] =
    memo.computeIfAbsent((dir, ver), _ =>
      Versioned.properties(spark, dir).get(SourceViewsProp)
        .map(_.split(";").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil))
}
