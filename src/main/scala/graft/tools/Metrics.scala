package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Query-metrics introspection — the Spark-native analog of the
  * reference's timing harvest from Presto's `system.runtime.queries`
  * (reference README.md:206, SURVEY.md §2.1 S7): a
  * QueryExecutionListener that records, per completed query, the
  * driver-measured wall time plus the executed plan's aggregated SQL
  * metrics (rows produced at the root, bytes written to shuffles, rows
  * read from scans). Listener callbacks are off the execution hot path,
  * so recording costs nothing per row at any scale.
  */
object Metrics {

  /** `peakExecutionMemory` sums the per-operator "peakMemory" metric
    * (hash aggregates, sort buffers, join builds) and `spillSize` the
    * bytes those operators spilled to disk — the Spark-native analog of
    * the reference's container-memory panels (reference
    * README.md:212-219): "uses fewer resources" becomes a recorded
    * number instead of a dashboard screenshot. */
  case class QueryMetrics(
      funcName: String,
      durationNs: Long,
      outputRows: Long,
      scanRows: Long,
      /** Rows out of non-cache scan NODES in the executed plan —
        * excludes InMemoryTableScan, whose output is a cache re-read
        * (and whose backing file scan lives in the InMemoryRelation's
        * own cached plan, outside this tree), so a query that
        * materializes a frame once and re-reads it from memory is not
        * triple-billed here while `scanRows` keeps the historical
        * any-scan sum. Actual rows READ from storage are task
        * inputMetrics territory (see TextEventsSpec's one-pass
        * assert), not plan metrics. */
      fileScanRows: Long,
      shuffleBytesWritten: Long,
      peakExecutionMemory: Long = 0L,
      spillSize: Long = 0L,
      failed: Boolean = false,
      planSummary: String = "")

  class Recorder extends QueryExecutionListener {
    private val queue = new ConcurrentLinkedQueue[QueryMetrics]()

    def records: Seq[QueryMetrics] = queue.asScala.toSeq
    def clear(): Unit = queue.clear()

    /** Full executed tree: AQE wraps its final plan and each
      * materialized stage in leaf nodes (AdaptiveSparkPlanExec,
      * QueryStageExec), so plain `collect` stops at them — expand
      * through the wrappers. */
    private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: inner.flatMap(allNodes)
    }

    private def metricSum(nodes: Seq[SparkPlan],
        nodeFilter: String => Boolean, metricName: String): Long =
      nodes.collect {
        case n if nodeFilter(n.nodeName) =>
          n.metrics.get(metricName).map(_.value).getOrElse(0L)
      }.sum

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      val nodes = allNodes(qe.executedPlan)
      val root = nodes.find(n => n.metrics.contains("numOutputRows"))
      queue.add(QueryMetrics(
        funcName,
        durationNs,
        root.flatMap(_.metrics.get("numOutputRows").map(_.value))
          .getOrElse(0L),
        metricSum(nodes, _.toLowerCase.contains("scan"), "numOutputRows"),
        metricSum(nodes, n => {
          val l = n.toLowerCase
          l.contains("scan") && !l.contains("inmemory")
        }, "numOutputRows"),
        metricSum(nodes, _.startsWith("Exchange"), "shuffleBytesWritten"),
        peakExecutionMemory = metricSum(nodes, _ => true, "peakMemory"),
        spillSize = metricSum(nodes, _ => true, "spillSize"),
        failed = false,
        planSummary = nodes.map(n =>
          s"${n.nodeName}${n.metrics.keys.mkString("[", ",", "]")}")
          .mkString(" | ")))
    }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      queue.add(QueryMetrics(funcName, 0L, 0L, 0L, 0L, 0L, failed = true))
  }

  /** Attach a fresh recorder to the session and return it. */
  def attach(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r)
    r
  }

  def detach(spark: SparkSession, r: Recorder): Unit =
    spark.listenerManager.unregister(r)
}
