package graft.tools

/** Ad-hoc plan audit: prints join/exchange shape of named queries. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.get("plan-audit")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    def audit(n: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"AUDIT $n broadcasts=${"BroadcastHashJoin".r.findAllIn(p).size} " +
        s"smj=${"SortMergeJoin".r.findAllIn(p).size} " +
        s"exch=${"Exchange".r.findAllIn(p).size} " +
        s"cartesian=${p.contains("Cartesian")}")
    }
    audit("e10", graft.operators.Events.funnel(s, d))
    audit("e11", graft.operators.Events.retentionCohorts(s, d))
    audit("t19", graft.operators.TextAnalysis.lmScore(s, d))
    audit("t17", graft.operators.TextAnalysis.shuffleShard(s, d))
    audit("m05", graft.operators.Multimodal.ahashNearDup(s, d))
    s.stop()
  }
}
