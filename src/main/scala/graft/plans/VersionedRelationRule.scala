package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
  DeleteFromTable, LogicalPlan, MergeIntoTable, Project, UpdateTable,
  V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.execution.datasources.DataSource
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation

import graft.sources.{GraftMetaTable, GraftVersionedTable, Versioned}

/** Analyzer rule behind [[graft.sources.GraftCatalog]]: replaces every
  * relation whose table is a [[GraftVersionedTable]] with the FULL
  * [[Versioned.read]] plan of that pinned snapshot.
  *
  * Why a rewrite instead of a DSv2 `Scan`: a snapshot read is a plan,
  * not a file list — merge-on-read tombstones apply as anti-joins,
  * hidden partition transforms drop their derived columns, linked
  * schema-evolved entries union by name. The `Scan` API hands back
  * batches of one relation; it cannot express joins. Substituting the
  * declarative plan during analysis gives Catalyst the same tree the
  * programmatic API builds — predicate pushdown, column pruning, and
  * AQE all still apply, and there is exactly ONE read implementation
  * to keep correct.
  *
  * Each occurrence gets a FRESH `read()` (new expression ids), so a
  * self-join of two snapshots never aliases one subtree; the Project
  * re-binds the fresh outputs onto the relation's attribute ids, which
  * is what the rest of the query references. Schema equality is
  * guaranteed by construction: the catalog derived the table's schema
  * from the same `read()` of the same immutable snapshot. */
case class VersionedRelationRule(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    // WRITE and DML targets stay as relations: `INSERT INTO
    // graft.db.t` / `writeTo(...).append()` resolve the table under a
    // V2WriteCommand whose target must remain a NamedRelation for the
    // V1-fallback write exec, and DELETE/UPDATE/MERGE targets must
    // stay relations for [[RowLevelDmlRule]] to recover the table
    // identity — only READ occurrences expand into the snapshot plan.
    // (A write's/merge's SOURCE query is not a target; its graft
    // relations still rewrite, so `INSERT INTO t SELECT FROM t
    // VERSION AS OF 1` reads the pin and appends to the head, and
    // `MERGE INTO t USING t VERSION AS OF 1` merges a pinned read.)
    val writeTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def addTargetTree(p: LogicalPlan): Unit = p.foreach(writeTargets.add)
    // Relations sitting directly under a metadata-aggregate-shaped
    // global Aggregate are HELD un-expanded until the aggregate's
    // functions resolve — the resolved pass then either rewrites the
    // whole pattern to the sidecar-served one-row plan or expands the
    // relation in place (see [[MetadataAggRule]]). Holding is safe:
    // the relation is a resolved leaf, so everything above it keeps
    // resolving; a shape that turns ineligible is simply not re-held
    // on the next pass and expands normally.
    val held = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case w: V2WriteCommand => writeTargets.add(w.table)
      case d: DeleteFromTable => addTargetTree(d.table)
      case u: UpdateTable => addTargetTree(u.table)
      case m: MergeIntoTable => addTargetTree(m.targetTable)
      case a: Aggregate if MetadataAggRule.shapeEligible(a) =>
        MetadataAggRule.relationUnder(a.child).foreach(held.add)
      case _ => ()
    }
    // the metadata-agg rewrite waits for the WHOLE plan to resolve,
    // not just the Aggregate: HAVING / ORDER BY spellings that
    // reference aggregate functions resolve by REWRITING the child
    // Aggregate (ResolveAggregateFunctions widens its output), and a
    // premature substitution would strand them unresolvable
    val planResolved = plan.resolved
    plan.resolveOperatorsUp {
      case a: Aggregate if planResolved &&
          MetadataAggRule.shapeEligible(a)
          && MetadataAggRule.relationUnder(a.child).exists(r =>
            !writeTargets.contains(r)) =>
        val r = MetadataAggRule.relationUnder(a.child).get
        MetadataAggRule.tryRewrite(spark, a, r).getOrElse {
          // manifest can't carry it: expand the relation in place so
          // the pattern dissolves and the fixpoint proceeds to the
          // ordinary scan-plan aggregate. The probed mark keeps the
          // TAGGED pass below from re-folding the same manifest for
          // the same (immutable) snapshot on the next fixpoint pass.
          val newChild = a.child.transformUp {
            case rel: DataSourceV2Relation if rel eq r =>
              expandVersioned(rel)
          }
          val na = a.withNewChildren(Seq(newChild))
          na.setTagValue(MetadataAggRule.ProbedTag, true)
          na
        }
      // the DATASET spelling of the same rewrite: `spark.table(t)`
      // already analyzed (and expanded) the relation before .agg()
      // built the aggregate, so the pattern here is Aggregate over
      // the TAGGED expansion ([[MetadataAggRule.SnapshotTag]], set in
      // expandVersioned) — serve it from the sidecars exactly like
      // the SQL shape, or mark it probed and keep the scan plan
      case a: Aggregate if planResolved &&
          a.getTagValue(MetadataAggRule.ProbedTag).isEmpty &&
          MetadataAggRule.shapeEligible(a) &&
          MetadataAggRule.taggedUnder(a.child).isDefined =>
        val (dir, ver, out) = MetadataAggRule.taggedUnder(a.child).get
        MetadataAggRule.tryRewriteOver(spark, a, dir, ver, out)
          .getOrElse {
            a.setTagValue(MetadataAggRule.ProbedTag, true)
            a
          }
      // `spark.readStream.table("graft.db.t")`: the catalog table
      // advertises no streaming capability (a changelog batch is a
      // PLAN the DSv2 PartitionReader contract can't express), so the
      // resolved StreamingRelationV2 rewrites to the V1
      // `graft-changes` source in APPENDS mode — the table's own rows
      // as they commit, Spark-owned triggers/offsets/restarts, a
      // delete/update event failing loudly (set the source's
      // skipDeletes via `.option(...)` on a format() read for an
      // append-only view that drops them). The relation's own output
      // attributes carry over, so references stay bound.
      case s: StreamingRelationV2
          if s.table.isInstanceOf[GraftVersionedTable] =>
        val t = s.table.asInstanceOf[GraftVersionedTable]
        // forward EVERY reader option (startingVersion, skipDeletes,
        // …) — dropping one would silently ignore the user's request
        // (a swallowed backfill is data loss vs intent). Only `path`
        // is forced; `mode` defaults to appends (the readStream.table
        // contract: the table's rows) but an explicit option wins —
        // note mode=changes adds the two metadata columns, which no
        // longer match the relation's output, so it is refused here
        // rather than failing downstream with a shape mismatch.
        import scala.jdk.CollectionConverters._
        val user = s.extraOptions.asScala.toMap
        // `.option("withChanges", true)` upgrades the stream to the
        // FULL changelog: the relation's output widens by the two
        // metadata columns and the source runs in changes mode — the
        // analyzer's next pass resolves downstream `_change_type`
        // references against the widened output. (An explicit `mode`
        // option is still refused: its schema contract belongs to the
        // format() spelling.)
        val withChangesKey = user.keys.find(
          _.equalsIgnoreCase("withChanges"))
        val wantChanges = withChangesKey.exists(
          k => user(k).equalsIgnoreCase("true"))
        require(!user.get("mode").exists(_ != "appends"),
          "readStream.table streams the table's rows (mode=appends); " +
            "for the full changelog with _change_type/_commit_version " +
            "use .option(\"withChanges\", true) or " +
            "spark.readStream.format(\"graft-changes\").load(dir)")
        val cleaned = withChangesKey.fold(user)(user - _)
        if (wantChanges) {
          import org.apache.spark.sql.catalyst.expressions.AttributeReference
          import org.apache.spark.sql.types.{IntegerType, StringType,
            StructField, StructType}
          // the source derives (base schema + meta cols); pin base to
          // the RELATION's resolved schema so the stream's shape can
          // never drift from what the analyzer bound downstream
          val base = StructType(s.output.map(a =>
            StructField(a.name, a.dataType, a.nullable)))
          val metaAttrs = Seq(
            AttributeReference(Versioned.ChangeTypeCol, StringType)(),
            AttributeReference(Versioned.CommitVersionCol, IntegerType,
              nullable = false)())
          StreamingRelation(
            DataSource(spark, className = "graft-changes",
              userSpecifiedSchema = Some(base),
              options = cleaned ++ Map("path" -> t.tableDir,
                "mode" -> "changes")),
            "graft-changes", s.output ++ metaAttrs)
        } else StreamingRelation(
          DataSource(spark, className = "graft-changes",
            options = cleaned ++ Map("path" -> t.tableDir,
              "mode" -> "appends")),
          "graft-changes", s.output)
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftVersionedTable] &&
            !writeTargets.contains(r) && !held.contains(r) =>
        expandVersioned(r)
      // metadata tables (t.history / t.files) expand the same way —
      // driver-metadata frames, never a data-file scan
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftMetaTable] &&
            !writeTargets.contains(r) =>
        val t = r.table.asInstanceOf[GraftMetaTable]
        val real = (t.kind match {
          case "history" => Versioned.history(spark, t.tableDir)
          case "files" =>
            Versioned.files(spark, t.tableDir, t.pinnedVersion)
          case "refs" => Versioned.refs(spark, t.tableDir)
          case "partitions" =>
            Versioned.partitions(spark, t.tableDir, t.pinnedVersion)
          case "snapshots" =>
            Versioned.snapshots(spark, t.tableDir, t.pinnedVersion)
          case "manifests" =>
            Versioned.manifests(spark, t.tableDir, t.pinnedVersion)
          case "all_files" => Versioned.allFiles(spark, t.tableDir)
          case "all_manifests" => Versioned.allManifests(spark, t.tableDir)
          case "metadata_log" => Versioned.metadataLog(spark, t.tableDir)
          case "entries" =>
            Versioned.entries(spark, t.tableDir, t.pinnedVersion)
          case "position_deletes" =>
            Versioned.positionDeletes(spark, t.tableDir, t.pinnedVersion)
          case "stats" =>
            Versioned.statsTable(spark, t.tableDir, t.pinnedVersion)
        }).queryExecution.analyzed
        require(real.output.length == r.output.length,
          s"metadata table ${t.name()} changed shape between catalog " +
            "resolution and planning")
        Project(r.output.zip(real.output).map { case (tgt, src) =>
          Alias(src, tgt.name)(exprId = tgt.exprId,
            qualifier = tgt.qualifier)
        }, real)
    }
  }

  /** The ordinary snapshot expansion of one graft relation: a fresh
    * `Versioned.read` plan with its outputs rebound onto the
    * relation's attribute ids. */
  private def expandVersioned(r: DataSourceV2Relation): LogicalPlan = {
    val t = r.table.asInstanceOf[GraftVersionedTable]
    // the MV staleness gate: a view bounded by
    // mv.max-staleness-versions refuses to serve stale — enforced at
    // the single point every catalog READ expands through (refresh
    // itself reads by path and is exempt, or it could never catch
    // up; an explicit VERSION AS OF below the head is exempt too —
    // the pinned snapshot is immutable). mv.refresh-on-read fires at
    // catalog RESOLUTION (GraftCatalog.load), so the version this
    // expansion received is already fresh; this gate only covers the
    // load-to-expansion race, where it refreshes the view and then
    // REFUSES with a re-run hint rather than serving the captured
    // (superseded) snapshot — the bound stays a hard contract.
    graft.sources.DerivedTable.requireFreshEnough(spark, t.tableDir,
      Some(t.snapshotVersion))
    val real = Versioned.read(spark, t.tableDir,
      Some(t.snapshotVersion)).queryExecution.analyzed
    require(real.output.length == r.output.length,
      s"snapshot v=${t.snapshotVersion} at ${t.tableDir} changed " +
        "shape between catalog resolution and planning " +
        "(snapshots are immutable; this indicates a corrupted " +
        "manifest)")
    val proj = Project(r.output.zip(real.output).map { case (tgt, src) =>
      Alias(src, tgt.name)(exprId = tgt.exprId,
        qualifier = tgt.qualifier)
    }, real)
    // mark the expansion with its snapshot identity so a LATER
    // incremental analysis (the Dataset API's .agg over this plan)
    // can still serve metadata-only aggregates — see the tagged
    // Aggregate case above
    proj.setTagValue(MetadataAggRule.SnapshotTag,
      (t.tableDir, t.snapshotVersion))
    proj
  }
}
