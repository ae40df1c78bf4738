package graft

import graft.tools.Metrics

class MetricsSpec extends SparkSpec {

  test("recorder captures duration, scan rows and shuffle bytes") {
    val r = Metrics.attach(spark)
    try {
      graft.operators.Relational.groupAgg(spark, sf).collect()
      // Listener callbacks are async — poll until delivered.
      val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
      while (r.records.isEmpty && System.nanoTime < deadline)
        Thread.sleep(50)
      val recs = r.records
      assert(recs.nonEmpty && recs.forall(!_.failed))
      val m = recs.last
      assert(m.durationNs > 0, m.planSummary)
      assert(m.scanRows > 0, m.planSummary) // parquet scan rows
      assert(m.shuffleBytesWritten > 0, m.planSummary) // group-by partials
      // The resource half of the reference's comparison methodology:
      // a shuffling aggregate must report nonzero peak execution memory.
      assert(m.peakExecutionMemory > 0, m.planSummary)
      assert(m.spillSize >= 0)
    } finally Metrics.detach(spark, r)
  }
}
