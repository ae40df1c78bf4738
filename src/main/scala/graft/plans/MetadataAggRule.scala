package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias,
  UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
  LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{GraftVersionedTable, Versioned}
import graft.sources.Versioned.StatsAgg

/** The metadata-only aggregate rewrite behind
  * [[VersionedRelationRule]]: a global `MIN` / `MAX` / `COUNT` over a
  * bare graft catalog table answers from the snapshot's stats
  * sidecars — a LocalRelation-backed one-row plan, zero data files
  * listed or scanned — whenever [[Versioned.statsAggregate]] can
  * PROVABLY carry it (no live tombstones, no pending schema steps,
  * every file stats-covered; see its scaladoc for the full bail
  * list). Ineligible or unprovable shapes fall back to the ordinary
  * snapshot-scan expansion, so the rewrite can change COST, never a
  * result.
  *
  * Shape: `Aggregate` with NO grouping over (SubqueryAlias chains of)
  * the relation, every output an alias of one un-filtered,
  * un-DISTINCT `min(col)` / `max(col)` / `count(col)` / `count(*)`.
  * A WHERE / local filter inserts a Filter between the two and the
  * shape no longer matches — by construction, not by a guard.
  * The GROUPED twin — `GROUP BY <one column>` whose outputs are that
  * column and eligible aggregates of other columns — serves from
  * [[Versioned.statsAggregateBy]] when the group column is the hive
  * partition axis of every live file (the "rows and freshest
  * timestamp per day" dashboard rollup).
  *
  * The eligibility probe also matches the UNRESOLVED spelling so the
  * host rule can HOLD the relation un-expanded across analyzer
  * passes until the aggregate's functions resolve (the expansion is
  * irreversible; expanding first would destroy the pattern the
  * resolved pass rewrites). */
private[plans] object MetadataAggRule {

  /** Set by [[VersionedRelationRule]] on the root of every ordinary
    * snapshot expansion: (tableDir, snapshotVersion). This is how the
    * DATASET API keeps the rewrite: `spark.table(t)` analyzes — and
    * irreversibly expands — the bare relation before `.agg(...)` ever
    * builds the aggregate, so by the time the pattern exists the
    * relation node is gone; the tag lets the aggregate pass recover
    * the snapshot identity from the expanded subtree (the same role
    * `SupportsPushDownAggregates` plays on a DSv2 scan builder —
    * optimizer-time aggregate pushdown keyed to the scan's identity).
    * Catalyst's transform machinery copies tags onto rewritten nodes,
    * so the mark survives later analyzer passes. */
  val SnapshotTag = new TreeNodeTag[(String, Int)]("graft.snapshot")

  /** Set on an Aggregate whose sidecar probe already FAILED this
    * analysis, so fixpoint re-passes (and the SQL fallback's expanded
    * form) skip re-folding the manifest for an answer that cannot
    * change within one immutable snapshot. */
  val ProbedTag = new TreeNodeTag[Boolean]("graft.metaAggProbed")

  /** The graft relation under alias wrappers, if the subtree is
    * exactly that (any other operator in between disqualifies). */
  def relationUnder(p: LogicalPlan): Option[DataSourceV2Relation] =
    p match {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftVersionedTable] => Some(r)
      case s: SubqueryAlias => relationUnder(s.child)
      case _ => None
    }

  /** The TAGGED snapshot expansion under alias wrappers and pure
    * column-pruning Projects (bare attribute lists — a rename or
    * computed column disqualifies), if the subtree is exactly that:
    * (tableDir, version, the expansion's output attributes). Pruning
    * Projects pass through because their attributes share the
    * expansion's expression ids, so aggregate references still
    * resolve against the full output. */
  def taggedUnder(p: LogicalPlan): Option[(String, Int, Seq[Attribute])] =
    p.getTagValue(SnapshotTag) match {
      case Some((dir, v)) => Some((dir, v, p.output))
      case None => p match {
        case s: SubqueryAlias => taggedUnder(s.child)
        case pr: Project
            if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
          taggedUnder(pr.child)
        case _ => None
      }
    }

  /** Cheap shape test, callable on resolved AND unresolved trees:
    * a GLOBAL aggregate of eligible functions, or a SINGLE-column
    * grouped one whose outputs are the grouping column and eligible
    * functions (the partition-rollup shape). */
  def shapeEligible(a: Aggregate): Boolean = {
    val g = a.groupingExpressions
    if (a.aggregateExpressions.isEmpty || g.length > 1) false
    else if (g.isEmpty) a.aggregateExpressions.forall(shapeOk)
    else isColRef(g.head) &&
      a.aggregateExpressions.forall(e => isColRef(e) || shapeOk(e))
  }

  private def isColRef(e: Expression): Boolean = e match {
    case _: AttributeReference => true
    case _: UnresolvedAttribute => true
    case Alias(c, _) => isColRef(c)
    case u: UnresolvedAlias => isColRef(u.child)
    case _ => false
  }

  private def shapeOk(e: NamedExpression): Boolean = e match {
    case Alias(child, _) => exprOk(child)
    case u: UnresolvedAlias => exprOk(u.child)
    case _ => false
  }

  private val Names = Set("min", "max", "count")

  private def exprOk(e: Expression): Boolean = e match {
    case ae: AggregateExpression =>
      !ae.isDistinct && ae.filter.isEmpty && ae.mode == Complete &&
        (ae.aggregateFunction match {
          case Min(_) | Max(_) => true
          case c: Count => c.children.length == 1
          case _ => false
        })
    case f: UnresolvedFunction =>
      Names.contains(f.nameParts.last.toLowerCase(java.util.Locale.ROOT)) &&
        !f.isDistinct && f.filter.isEmpty
    case _ => false
  }

  /** Map one aggregate function onto a [[StatsAgg]] want under a
    * column resolver; None for anything the sidecars can't answer
    * (min(c + 1), avg, a disallowed column). Shared by the global and
    * grouped mappers. */
  private def aggWant(ae: AggregateExpression,
      colOf: Expression => Option[String]): Option[StatsAgg] =
    ae.aggregateFunction match {
      case Min(c) => colOf(c).map(StatsAgg.MinOf)
      case Max(c) => colOf(c).map(StatsAgg.MaxOf)
      case Count(Seq(l: Literal)) if l.value != null =>
        Some(StatsAgg.CountStar)
      case Count(Seq(c)) => colOf(c).map(StatsAgg.CountOf)
      case _ => None
    }

  /** Map a RESOLVED eligible aggregate onto [[StatsAgg]] wants; None
    * when any output aggregates a non-column expression (min(c + 1)
    * has no sidecar answer). */
  private def wantsOf(a: Aggregate,
      relOutput: Seq[Attribute]): Option[Seq[(String, StatsAgg)]] = {
    val ids = relOutput.map(_.exprId).toSet
    def colOf(e: Expression): Option[String] = e match {
      case ar: AttributeReference if ids.contains(ar.exprId) =>
        Some(ar.name)
      case _ => None
    }
    val mapped = a.aggregateExpressions.map {
      case Alias(ae: AggregateExpression, name) =>
        aggWant(ae, colOf).map(name -> _)
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) None else Some(mapped.flatten)
  }

  /** Attempt the rewrite of a resolved eligible aggregate. Returns
    * the replacement plan (a Project rebinding the one-row answer
    * onto the aggregate's output ids) or None when the manifest
    * cannot carry it. Output dataTypes must match EXACTLY — a
    * sidecar dtype that drifted from the relation's schema falls
    * back rather than smuggling a differently-typed column through
    * an Alias. */
  def tryRewrite(spark: SparkSession, a: Aggregate,
      r: DataSourceV2Relation): Option[LogicalPlan] = {
    val t = r.table.asInstanceOf[GraftVersionedTable]
    tryRewriteOver(spark, a, t.tableDir, t.snapshotVersion, r.output)
  }

  /** The rewrite core, shared by the SQL (un-expanded relation) and
    * Dataset (tagged expansion) entry points: attempt to serve the
    * aggregate from the snapshot's stats sidecars, addressing columns
    * by `relOutput`'s expression ids. */
  def tryRewriteOver(spark: SparkSession, a: Aggregate, dir: String,
      ver: Int, relOutput: Seq[Attribute]): Option[LogicalPlan] = {
    // the MV staleness gate covers the scan-free path too: a bounded
    // stale view must refuse a sidecar-served COUNT(*) exactly like a
    // scan (both SQL spellings and the Dataset tag route land here);
    // pinned historical aggregates are exempt like any pinned read.
    // mv.refresh-on-read already fired at catalog resolution, so
    // `ver` is fresh on that path (this gate covers the race only).
    graft.sources.DerivedTable.requireFreshEnough(spark, dir,
      Some(ver))
    if (a.groupingExpressions.nonEmpty)
      return tryRewriteGrouped(spark, a, dir, ver, relOutput)
    for {
      wants <- wantsOf(a, relOutput)
      df <- Versioned.statsAggregate(spark, dir, wants, Some(ver))
      real = df.queryExecution.analyzed
      if real.output.map(_.dataType) == a.output.map(_.dataType)
    } yield Project(a.output.zip(real.output).map { case (tgt, src) =>
      Alias(src, tgt.name)(exprId = tgt.exprId,
        qualifier = tgt.qualifier)
    }, real)
  }

  /** The grouped variant: GROUP BY one relation column, every output
    * either that column or an eligible aggregate of a DIFFERENT
    * column — served by [[Versioned.statsAggregateBy]] when the group
    * column is the table's hive partition axis. The group value
    * itself is never a min/max/count target here (its stats live in
    * paths, not sidecars), and any such spelling keeps the scan. */
  private def tryRewriteGrouped(spark: SparkSession, a: Aggregate,
      dir: String, ver: Int,
      relOutput: Seq[Attribute]): Option[LogicalPlan] = {
    val ids = relOutput.map(_.exprId).toSet
    val gAttr = a.groupingExpressions.head match {
      case ar: AttributeReference if ids.contains(ar.exprId) => ar
      case _ => return None
    }
    def isGroupRef(e: Expression): Boolean = e match {
      case ar: AttributeReference => ar.exprId == gAttr.exprId
      case Alias(c, _) => isGroupRef(c)
      case _ => false
    }
    // outputs in order: Left(groupRef) | Right(want)
    val slots: Seq[Option[Either[Unit, (String, StatsAgg)]]] =
      a.aggregateExpressions.map {
        case e if isGroupRef(e) => Some(Left(()))
        case Alias(ae: AggregateExpression, name) =>
          // the group column itself never maps (its stats live in
          // paths, not sidecars)
          aggWant(ae, {
            case ar: AttributeReference if ids.contains(ar.exprId) &&
              ar.exprId != gAttr.exprId => Some(ar.name)
            case _ => None
          }).map(w => Right(name -> w))
        case _ => None
      }
    if (slots.exists(_.isEmpty)) return None
    // bare `SELECT pk ... GROUP BY pk` (wants empty) serves too: the
    // distinct partition values straight from the paths — the SHOW
    // PARTITIONS dashboard probe (note `SELECT DISTINCT pk` does NOT
    // reach this shape: ReplaceDistinctWithAggregate runs in the
    // optimizer, after analysis)
    val wants = slots.flatten.collect { case Right(w) => w }
    for {
      df <- Versioned.statsAggregateBy(spark, dir,
        gAttr.name, gAttr.name, gAttr.dataType.catalogString, wants,
        Some(ver))
      real = df.queryExecution.analyzed
      // positional source for each output: group refs map to the
      // group column (position 0), wants map 1..n in order
      srcs = {
        var wi = 0
        slots.flatten.map {
          case Left(_) => real.output.head
          case Right(_) => { wi += 1; real.output(wi) }
        }
      }
      if srcs.map(_.dataType) == a.output.map(_.dataType)
    } yield Project(a.output.zip(srcs).map { case (tgt, src) =>
      Alias(src, tgt.name)(exprId = tgt.exprId,
        qualifier = tgt.qualifier)
    }, real)
  }
}
