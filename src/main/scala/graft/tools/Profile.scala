package graft.tools

import org.apache.spark.sql.DataFrame
import graft.Sessions

/** Dev profiling harness: time one SparkEntry query end-to-end N times
  * and print its formatted physical plan — the .explain feedback loop
  * the build plan calls for. Usage:
  *   runMain graft.tools.Profile <queryName> [sfDir] [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.get("graft-profile")
    def build: DataFrame = graft.SparkEntry.queries(name)(spark, sfDir)
    build.explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = build
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analyze+optimize+plan
      val t2 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t3 = System.nanoTime()
      println(f"PROFILE $name rep $i: total ${(t3 - t0) / 1e9}%.3f s " +
        f"(construct ${(t1 - t0) / 1e9}%.3f, plan ${(t2 - t1) / 1e9}%.3f, " +
        f"exec ${(t3 - t2) / 1e9}%.3f)")
    }
    spark.stop()
  }
}
