package graft.tools

import graft.Sessions

/** Dev profiling harness: run named SparkEntry queries (comma list,
  * prefix match) with a job-count listener and print, per query and
  * per rep: wall, Spark job count, summed in-job wall (submit->end)
  * and summed task wall. (wall - jobwall) is driver-side planning /
  * metadata / commit time BETWEEN actions — the number that decides
  * whether to cut job COUNT or job COST (guide §1: measure first).
  * Usage: runMain graft.tools.QueryJobs <q1,q2,..> [sfDir] [reps]
  */
object QueryJobs {
  def main(args: Array[String]): Unit = {
    val prefixes = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.get("graft-query-jobs")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobNanos = new java.util.concurrent.atomic.AtomicLong
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val deserMs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val schedMs = new java.util.concurrent.atomic.AtomicLong
    val stageNames =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val stageTask = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.AtomicLong]()
    val stageCount = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.AtomicInteger]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); starts.put(js.jobId, js.time); ()
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId)).foreach(t0 =>
            jobNanos.addAndGet((je.time - t0) * 1000000L))
          ()
        }
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (te.taskInfo != null) {
            tasks.incrementAndGet()
            taskNanos.addAndGet(te.taskInfo.duration * 1000000L)
            if (te.taskMetrics != null) {
              deserMs.addAndGet(te.taskMetrics.executorDeserializeTime)
              runMs.addAndGet(te.taskMetrics.executorRunTime)
              gcMs.addAndGet(te.taskMetrics.jvmGCTime)
              schedMs.addAndGet(math.max(0L, te.taskInfo.duration -
                te.taskMetrics.executorDeserializeTime -
                te.taskMetrics.executorRunTime))
            }
            Option(stageNames.get(te.stageId)).foreach { nm =>
              stageTask.computeIfAbsent(nm,
                _ => new java.util.concurrent.atomic.AtomicLong)
                .addAndGet(te.taskInfo.duration)
              stageCount.computeIfAbsent(nm,
                _ => new java.util.concurrent.atomic.AtomicInteger)
                .incrementAndGet()
            }
          }
          ()
        }
        override def onStageSubmitted(
            ss: org.apache.spark.scheduler.SparkListenerStageSubmitted)
            : Unit = {
          stageNames.put(ss.stageInfo.stageId,
            ss.stageInfo.name.take(100)); ()
        }
      })
    // Catalyst phase budget per execution (analysis/optimization/
    // planning), summed across the executions a query runs — splits
    // the driver-side gap into "planning" vs "everything else"
    val phaseNanos = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.AtomicLong]()
    val execs = new java.util.concurrent.atomic.AtomicInteger
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        private def add(qe: org.apache.spark.sql.execution.QueryExecution)
            : Unit = {
          execs.incrementAndGet()
          qe.tracker.phases.foreach { case (ph, summary) =>
            phaseNanos.computeIfAbsent(ph,
              _ => new java.util.concurrent.atomic.AtomicLong)
              .addAndGet((summary.endTimeMs - summary.startTimeMs) *
                1000000L)
          }
        }
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = add(qe)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = add(qe)
      })
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    names.foreach { name =>
      (1 to reps).foreach { i =>
        val j0 = jobs.get; val jn0 = jobNanos.get
        val tn0 = taskNanos.get; val tk0 = tasks.get
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graft.SparkInternals
          .waitListenerBus(spark.sparkContext, 10000L)
        import scala.jdk.CollectionConverters._
        val ph = phaseNanos.asScala.toSeq.sortBy(_._1)
          .map { case (k, v) => f"$k=${v.get / 1e9}%.2f" }
          .mkString(" ")
        println(f"QUERY_JOBS $name rep$i: wall=$wall%.2f s" +
          s" jobs=${jobs.get - j0} tasks=${tasks.get - tk0}" +
          f" jobwall=${(jobNanos.get - jn0) / 1e9}%.2f" +
          f" taskwall=${(taskNanos.get - tn0) / 1e9}%.2f" +
          s" execs=${execs.getAndSet(0)} $ph" +
          f" deser=${deserMs.getAndSet(0) / 1e3}%.1f" +
          f" run=${runMs.getAndSet(0) / 1e3}%.1f" +
          f" gc=${gcMs.getAndSet(0) / 1e3}%.1f" +
          f" other=${schedMs.getAndSet(0) / 1e3}%.1f")
        phaseNanos.clear()
        if (sys.env.contains("QUERY_JOBS_STAGES")) {
          stageTask.asScala.toSeq.sortBy(-_._2.get).take(12)
            .foreach { case (nm, ms) =>
              println(f"QUERY_JOBS   stage ${ms.get / 1e3}%8.1f s " +
                s"x${stageCount.get(nm).get}  $nm")
            }
          stageTask.clear(); stageCount.clear()
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
