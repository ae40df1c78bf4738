package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** One-off measurement driver: prints the persisted IVF-PQ probe's
  * actual recall@k per scale factor, so gate floors and docs state
  * measured numbers instead of guesses. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.get("graft-recall-probe")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val dir = java.nio.file.Files
        .createTempDirectory("recall-probe").resolve("ivfpq").toString
      Similarity.buildIvfPqIndex(s, d, dir)
      val approx = Similarity.ivfPqTopKIndexed(s, d, dir)
        .select(col("query_id"), col("neighbor_id"))
        .withColumn("hit", lit(1L))
      val r = Similarity.bruteForceTopK(s, d)
        .select(col("query_id"), col("neighbor_id"))
        .join(approx, Seq("query_id", "neighbor_id"), "left")
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") /
          count(lit(1))).as("recall")).head().getDouble(0)
      println(s"RECALL $d = $r")
    }
    s.stop()
  }
}
