package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{GraftFunctions, MinHashBandsAgg, RollingMinHash,
  ShingleHashes, SimHashAgg, VecDot}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions at session build time, so third-party sessions can opt in
  * with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions` — the standard extension
  * wiring. [[Sessions.get]] also registers per-session for sessions built
  * elsewhere. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.VecDotName),
      new ExpressionInfo(classOf[VecDot].getName,
        GraftFunctions.VecDotName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2,
          s"${GraftFunctions.VecDotName} expects 2 " +
            s"arguments, got ${exprs.length}")
        VecDot(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.PqAdcName),
      new ExpressionInfo(classOf[graft.functions.PqAdc].getName,
        GraftFunctions.PqAdcName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2,
          s"${GraftFunctions.PqAdcName} expects 2 " +
            s"arguments, got ${exprs.length}")
        graft.functions.PqAdc(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.RollingMinHashName),
      new ExpressionInfo(classOf[RollingMinHash].getName,
        GraftFunctions.RollingMinHashName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val w = GraftFunctions.rollingWindowArg(exprs) // validates arity
        RollingMinHash(exprs.head, w)
      }))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.SimHashAggName),
      new ExpressionInfo(classOf[SimHashAgg].getName,
        GraftFunctions.SimHashAggName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1,
          s"${GraftFunctions.SimHashAggName} expects 1 argument, " +
            s"got ${exprs.length}")
        SimHashAgg(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.MinHashBandsName),
      new ExpressionInfo(classOf[MinHashBandsAgg].getName,
        GraftFunctions.MinHashBandsName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val (perms, bands) = GraftFunctions.minhashBandsArgs(exprs)
        MinHashBandsAgg(exprs.head, perms, bands)
      }))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.ShingleHashesName),
      new ExpressionInfo(classOf[ShingleHashes].getName,
        GraftFunctions.ShingleHashesName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val n = GraftFunctions.shingleNArg(exprs)
        ShingleHashes(exprs.head, n)
      }))
    // The Iceberg partition-spec-evolution DDL (`ALTER TABLE … ADD/
    // DROP/REPLACE PARTITION FIELD`) is a parser-extension production
    // in Iceberg too — Spark's grammar has no such clause, so the
    // statement is recognized ahead of the delegate and lowered onto
    // Versioned.setSpec. See graft.plans.PartitionFieldDdl.
    e.injectParser((session, delegate) =>
      graft.plans.GraftSqlParser(delegate, session))
    // Band theta-joins (abs(a-b) <= c with no equi keys) become bucketed
    // equi-joins instead of cartesian products.
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    // Catalog-resolved Versioned snapshots (graft.db.t [VERSION |
    // TIMESTAMP AS OF ...]) expand into their full read plan during
    // analysis — see VersionedRelationRule for why this is a rewrite
    // rather than a DSv2 Scan.
    e.injectResolutionRule(s => graft.plans.VersionedRelationRule(s))
    // SQL row-level DML (DELETE FROM / UPDATE / MERGE INTO) on catalog
    // tables lowers onto the engine's snapshot primitives — see
    // RowLevelDmlRule for why this is an analyzer rewrite rather than
    // the SupportsRowLevelOperations scan/write protocol.
    e.injectResolutionRule(s => graft.plans.RowLevelDmlRule(s))
    // Aggregates over a source that registers rewrite-enabled
    // materialized views (CALL graft.system.enable_rewrite) serve
    // from the view when its pin equals the scanned snapshot — a
    // 100-TB rollup becomes an O(groups) view read, result-identical
    // by the pin check. See MvRewriteRule.
    e.injectResolutionRule(s => graft.plans.MvRewriteRule(s))
  }
}
