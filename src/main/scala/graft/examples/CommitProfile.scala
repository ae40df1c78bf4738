package graft.examples

import org.apache.spark.sql.SparkSession
import graft.sources.Versioned

/** Commit-path profiling harness (not part of the query surface):
  * creates a small table and runs N sequential appends, printing
  * wall time per append — used to localize per-commit constant
  * overhead (run under JFR for stacks). */
object CommitProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.get("graft-commit-profile")
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-commit-profile").resolve("t").toString
    val base = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v")
    Versioned.commit(base, dir)
    // warm
    Versioned.append(base.limit(10), dir)
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val t0 = System.nanoTime()
    (1 to n).foreach { i =>
      val t = System.nanoTime()
      Versioned.append(base.limit(10), dir)
      println(f"append $i%2d: ${(System.nanoTime() - t) / 1e6}%.1f ms")
    }
    println(f"TOTAL $n appends: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    // phase candidates, timed standalone at the final version
    def time(label: String)(body: => Any): Unit = {
      val t = System.nanoTime()
      body
      println(f"  $label: ${(System.nanoTime() - t) / 1e6}%.1f ms")
    }
    (1 to 3).foreach { _ =>
      time("currentVersion")(Versioned.currentVersion(spark, dir))
      time("read().schema")(Versioned.read(spark, dir).schema)
      time("read+union.schema")(Versioned.read(spark, dir)
        .unionByName(base.limit(10), allowMissingColumns = true).schema)
      time("properties")(Versioned.properties(spark, dir))
      time("write 10 rows raw")(base.limit(10).write
        .mode("overwrite").parquet(dir + "-raw"))
    }
    spark.stop()
  }
}
