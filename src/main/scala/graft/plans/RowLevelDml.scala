package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases,
  UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet,
  AttributeReference, CommonExpressionRef, Expression, Literal,
  SubqueryExpression, With}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteAction, DeleteFromTable, InsertAction, LogicalPlan,
  MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types.BooleanType

import graft.sources.{GraftVersionedTable, Versioned}

/** Analyzer lowering of SQL row-level DML — `DELETE FROM`, `UPDATE`,
  * `MERGE INTO` on [[graft.sources.GraftCatalog]] tables — onto the
  * engine's snapshot primitives ([[Versioned.deleteWhere]],
  * [[Versioned.updateWhere]], [[Versioned.mergeInto]]).
  *
  * Why an analyzer rewrite instead of Spark's
  * `SupportsRowLevelOperations` protocol: the group-based (and
  * delta-based) row-level APIs read the target through a DSv2 `Scan`,
  * and a Versioned snapshot read is not a scan — merge-on-read
  * tombstones apply as anti-joins, hidden transforms drop derived
  * columns, rename chains re-title old files (the same reason
  * [[VersionedRelationRule]] expands READS in the analyzer). A
  * `Scan`-fed DELETE would resurrect MoR-deleted rows into the
  * rewrite. Lowering the resolved command onto the engine's
  * DataFrame-level primitives keeps ONE implementation of snapshot
  * semantics correct, and the engine's copy-on-write machinery
  * ([[Versioned]]'s mergeFiles) already implements the
  * touched-files-only cost model the group-based protocol exists to
  * express.
  *
  * Resolved conditions/assignments are carried into the command as
  * re-resolvable [[Column]]s: every [[AttributeReference]] of the
  * target (and, for MERGE, the source) is rewritten to an
  * [[UnresolvedAttribute]] — bare for single-table DELETE/UPDATE,
  * qualified `__t`/`__s` for MERGE's two-sided expressions — which
  * re-resolves against the engine's read frames at run time.
  * Correlated subqueries are refused loudly (their inner plans bind
  * the command's expression ids, which cannot survive that
  * re-resolution); uncorrelated subqueries pass through as resolved
  * sub-plans. */
case class RowLevelDmlRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private object GraftTarget {
    def unapply(p: LogicalPlan): Option[(DataSourceV2Relation,
        GraftVersionedTable)] =
      EliminateSubqueryAliases(p) match {
        case r: DataSourceV2Relation
            if r.table.isInstanceOf[GraftVersionedTable] =>
          Some((r, r.table.asInstanceOf[GraftVersionedTable]))
        case _ => None
      }
  }

  /** Remap a resolved expression's attribute references onto
    * name-based lookups and wrap it as a [[Column]]. */
  private def toCol(e: Expression, target: Seq[Attribute],
      tQual: Seq[String], source: Seq[Attribute] = Nil,
      sQual: Seq[String] = Nil): Column = {
    val tIds = AttributeSet(target)
    val sIds = AttributeSet(source)
    e.foreach {
      case s: SubqueryExpression if s.isCorrelated =>
        throw new UnsupportedOperationException(
          "correlated subqueries are not supported in graft DML " +
            "conditions; rewrite as a join or an uncorrelated subquery")
      case _ => ()
    }
    // inline `With` common-subexpression wrappers (nullif & friends)
    // FIRST: their tree rebuild reads children's dataType, which an
    // UnresolvedAttribute cannot answer — and the re-analysis of the
    // produced Column re-derives the sharing anyway
    val inlined = e.transformUp {
      case w: With =>
        val defs = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case r: CommonExpressionRef => defs(r.id)
        }
    }
    val remapped = inlined.transform {
      case a: AttributeReference if tIds.contains(a) =>
        UnresolvedAttribute(tQual :+ a.name)
      case a: AttributeReference if sIds.contains(a) =>
        UnresolvedAttribute(sQual :+ a.name)
    }
    remapped.foreach {
      case a: AttributeReference => throw new IllegalStateException(
        s"DML expression references '${a.name}' from outside the " +
          "statement's target/source — cannot lower")
      case _ => ()
    }
    SparkInternals.column(remapped)
  }

  private def flatName(key: Expression): String = key match {
    case ar: AttributeReference => ar.name
    case other => throw new UnsupportedOperationException(
      s"assignment to nested field ${other.sql} is not supported on " +
        "graft tables (flat top-level columns only)")
  }

  private def assigns(as: Seq[Assignment], target: Seq[Attribute],
      tQual: Seq[String], source: Seq[Attribute],
      sQual: Seq[String]): Seq[(String, Column)] =
    as.map(a => flatName(a.key) ->
      toCol(a.value, target, tQual, source, sQual))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case DeleteFromTable(GraftTarget(r, t), cond) if cond.resolved =>
        val lowered = cond match {
          // no WHERE (the parser supplies literal true): truncate —
          // one empty linked snapshot, no per-row tombstones
          case Literal(true, BooleanType) => None
          case c => Some(toCol(c, r.output, Nil))
        }
        GraftDeleteCommand(t.tableDir, t.name(), lowered)

      case UpdateTable(GraftTarget(r, t), as, condOpt)
          if as.forall(_.resolved) && condOpt.forall(_.resolved) =>
        GraftUpdateCommand(t.tableDir, t.name(),
          condOpt.map(toCol(_, r.output, Nil)),
          assigns(as, r.output, Nil, Nil, Nil))

      // `!needSchemaEvolution` holds the lowering back until Spark's
      // ResolveMergeIntoSchemaEvolution has routed any missing source
      // columns through alterTable (the catalog's metadata-only
      // addColumn — AUTOMATIC_SCHEMA_EVOLUTION capability) and
      // re-resolved the target at its evolved schema.
      case m: MergeIntoTable if m.resolved && m.duplicateResolved &&
          !m.needSchemaEvolution &&
          GraftTarget.unapply(m.targetTable).isDefined =>
        val Some((r, t)) = GraftTarget.unapply(m.targetTable)
        val tOut = r.output
        val sOut = m.sourceTable.output
        val tq = Seq("__t")
        val sq = Seq("__s")
        def c(e: Expression) = toCol(e, tOut, tq, sOut, sq)
        def clause(a: Any): Versioned.MergeClause = a match {
          case UpdateAction(condO, set, _) => Versioned.MergeUpdate(
            condO.map(c), assigns(set, tOut, tq, sOut, sq))
          case DeleteAction(condO) =>
            Versioned.MergeDelete(condO.map(c))
          case other => throw new UnsupportedOperationException(
            s"MERGE action $other is not supported on graft tables")
        }
        val inserts = m.notMatchedActions.map {
          case InsertAction(condO, set) => Versioned.MergeInsert(
            condO.map(c), assigns(set, tOut, tq, sOut, sq))
          case other => throw new UnsupportedOperationException(
            s"MERGE action $other is not supported on graft tables")
        }
        GraftMergeCommand(t.tableDir, t.name(), m.sourceTable,
          c(m.mergeCondition), m.matchedActions.map(clause), inserts,
          m.notMatchedBySourceActions.map(clause))
    }
}

/** `DELETE FROM <graft table> [WHERE cond]`. With a condition: a
  * merge-on-read POSITIONAL delete ([[Versioned.deleteWhere]]) — one
  * provenance scan, (file, ordinal) tombstones, NO data file
  * rewritten; [[Versioned.compactDeletes]] folds tombstones back into
  * data later (Iceberg's format-v2 delete cost model). Without: a
  * truncate — one empty linked snapshot, history retained for time
  * travel. */
case class GraftDeleteCommand(tableDir: String, tableName: String,
    cond: Option[Column]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.sources.DerivedTable.requireNotMv(spark, tableDir,
      tableName, "DELETE")
    cond match {
      case Some(p) => Versioned.deleteWhere(spark, tableDir, p,
        note = Some(s"DELETE FROM $tableName"))
      case None => Versioned.commit(
        Versioned.read(spark, tableDir).limit(0), tableDir,
        note = Some(s"DELETE FROM $tableName (truncate)"))
    }
    Seq.empty
  }
}

/** `UPDATE <graft table> SET ... [WHERE cond]` →
  * [[Versioned.updateWhere]] (copy-on-write: touched files only). */
case class GraftUpdateCommand(tableDir: String, tableName: String,
    cond: Option[Column], set: Seq[(String, Column)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.sources.DerivedTable.requireNotMv(spark, tableDir,
      tableName, "UPDATE")
    Versioned.updateWhere(spark, tableDir, cond.getOrElse(lit(true)),
      set, note = Some(s"UPDATE $tableName"))
    Seq.empty
  }
}

/** `MERGE INTO <graft table> USING <source> ON ...` →
  * [[Versioned.mergeInto]] (one atomic copy-on-write commit; the
  * Iceberg/Delta one-source-row-per-target-row cardinality contract
  * enforced). The source plan re-wraps as a DataFrame at run time. */
case class GraftMergeCommand(tableDir: String, tableName: String,
    source: LogicalPlan, on: Column,
    matched: Seq[Versioned.MergeClause],
    notMatched: Seq[Versioned.MergeInsert],
    notMatchedBySource: Seq[Versioned.MergeClause])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    graft.sources.DerivedTable.requireNotMv(spark, tableDir,
      tableName, "MERGE")
    Versioned.mergeInto(spark, tableDir,
      SparkInternals.ofRows(spark, source), on, matched, notMatched,
      notMatchedBySource, note = Some(s"MERGE INTO $tableName"))
    Seq.empty
  }
}
