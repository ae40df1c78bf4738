package graft.tools

/** Dump `.explain("formatted")` of named SparkEntry queries to files —
  * the before/after plan artifacts the optimization rounds commit under
  * plans/rNN/. Usage:
  *   runMain graft.tools.PlanDump <outDir> <suffix> <query>[,<query>...]
  * writes <outDir>/<query>_<suffix>.txt per query. Queries build lazily;
  * nothing executes (the dump is the pre-execution plan, which is the
  * comparable artifact — AQE finalization depends on runtime stats).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.Sessions.get("graft-plan-dump")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(s, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"PLAN_DUMP wrote ${n}_$suffix.txt")
    }
    s.stop()
  }
}
