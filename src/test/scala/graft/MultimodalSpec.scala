package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("payload bytes survive the binary cast (byte length = utf8 length)") {
    val bad = Multimodal.mediaMeta(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet"), "doc_id")
      .filter(length(col("text").cast("binary")).cast("long") =!=
        col("n_bytes"))
      .count()
    assert(bad == 0)
  }

  test("feature extraction emits one feature row per document") {
    val feats = Multimodal.extractFeatures(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(feats.length == n)
    assert(feats.forall(f => f.feature.length == 4 &&
      f.mean_byte >= 0 && f.mean_byte <= 255))
  }

  test("frame sampling strides by 4 within n_frames") {
    val rows = Multimodal.sampleFrames(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val idx = r.getLong(2)
      idx % 4 == 0 && idx < r.getLong(1)
    })
  }
}
