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

  test("byte-pool resize: 8 buckets per long doc, means in byte range, " +
      "bucket means average to the document mean") {
    val pooled = Multimodal.resizePooled(spark, sf).collect()
    assert(pooled.forall(p => p.m >= 0 && p.m <= 255))
    val byDoc = pooled.groupBy(_.doc_id)
    byDoc.values.foreach { ps =>
      if (ps.head.n_bytes >= 8) assert(ps.length == 8)
      assert(ps.map(_.bk).sorted.toSeq == (0 until ps.length))
    }
    // weighted bucket means reconstruct the exact document mean
    val feats = Multimodal.extractFeatures(spark, sf).collect()
      .map(f => f.doc_id -> f.mean_byte).toMap
    byDoc.foreach { case (id, ps) =>
      val n = ps.head.n_bytes
      val weighted = ps.map { p =>
        // bucket k covers [ceil(k*n/8) .. ceil((k+1)*n/8)) positions
        val lo = (p.bk.toLong * n + 7) / 8; val hi = ((p.bk + 1L) * n + 7) / 8
        p.m * (hi - lo)
      }.sum / n
      assert(math.abs(weighted - feats(id)) < 1e-9)
    }
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
