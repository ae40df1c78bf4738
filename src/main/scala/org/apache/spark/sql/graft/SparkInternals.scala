package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}

/** The engine's single, narrow bridge to two `private[sql]` seams of
  * the classic Spark API — deliberately placed under
  * `org.apache.spark.sql` (the standard third-party-connector
  * technique; Delta and Iceberg's Spark runtimes do the same) so the
  * rest of the codebase never reaches into Spark internals directly:
  *
  *  - wrapping an already-RESOLVED Catalyst [[Expression]] back into a
  *    user-facing [[Column]], which the SQL row-level DML lowering
  *    ([[graft.plans.RowLevelDmlRule]]) needs to hand a `DELETE` /
  *    `UPDATE` / `MERGE` condition to the engine's DataFrame-level
  *    primitives;
  *  - wrapping a resolved [[LogicalPlan]] into a [[DataFrame]]
  *    (`Dataset.ofRows`), which the MERGE lowering needs for its
  *    source-side query;
  *  - marking a frame's plan `isStreaming = true`
  *    (`internalCreateDataFrame`), which a V1 streaming `Source`'s
  *    `getBatch` contract asserts — the same call `FileStreamSource`
  *    makes for its per-batch frames. The wrapped RDD is the frame's
  *    own LAZY physical plan (`toRdd`), so execution stays fully
  *    distributed; the plan is frozen at batch construction, which is
  *    exactly a micro-batch's contract
  *    ([[graft.streaming.ChangeStreamSource]]).
  *
  * Nothing else belongs here: every addition widens the surface that
  * can break on a Spark upgrade.
  */
object SparkInternals {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Drain the listener bus (`private[spark] waitUntilEmpty`) — the
    * commit path's write-metrics harvest ([[graft.sources.Versioned]])
    * registers a listener around its stage write and must observe the
    * write job's final TaskEnd events, which post asynchronously.
    * Returns false on timeout (the caller degrades to footer reads —
    * never blocks a commit on a wedged bus). */
  def waitListenerBus(sc: org.apache.spark.SparkContext,
      timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The inverse bridge of [[streamingFrame]], for the V1 streaming
    * SINK side: a `Sink.addBatch` frame arrives marked
    * `isStreaming = true`, and handing it to any batch writer
    * (`df.write`, [[graft.sources.Versioned.append]]) would fail
    * analysis with "streaming sources must be executed with
    * writeStream.start()". Re-wrap the micro-batch's own LAZY
    * physical plan (`toRdd`) as a plain batch frame — execution stays
    * distributed and runs when the write job pulls it; the plan is
    * frozen at batch construction, which is exactly the micro-batch
    * contract. */
  def batchFrame(df: DataFrame): DataFrame =
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
        isStreaming = false)

  def streamingFrame(df: DataFrame,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, schema,
        isStreaming = true)
}
