package graft.examples

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.operators.Dedup
import graft.sources.Tables

/** Perf probe for the shingle pipeline: prints the optimized plan (to
  * check whether the split stays bound to one projection) and stage
  * timings at the given SF. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.get("graft-dedup-probe")
    val sh = Dedup.shingleRows(spark, sfDir)

    println("=== optimized plan (shingleRows) ===")
    println(sh.queryExecution.optimizedPlan.toString.take(4000))

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    time("shingle_count")(sh.count())
    time("d01_exact")(Dedup.shingleJaccard(spark, sfDir).count())
    time("d02_minhash")(Dedup.minhashLsh(spark, sfDir).count())
    time("d03_simhash")(Dedup.simhashPairs(spark, sfDir).count())
    time("d04_embedding")(Dedup.embeddingNearDup(spark, sfDir).count())
    spark.stop()
  }
}
