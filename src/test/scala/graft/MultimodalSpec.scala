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

  test("aHash banding finds exactly the all-pairs hamming<=d set") {
    import org.apache.spark.sql.functions._
    val banded = Multimodal.ahashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reference: naive all-pairs over the same hashes — the banding
    // must lose nothing (pigeonhole: d < 8 bands) and add nothing
    // (every candidate is distance-verified)
    val h = Multimodal.payloadAHash(spark, sf)
    val naive = h.as("x").join(h.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        expr("cast(bit_count(x.ahash ^ y.ahash) as bigint)").as("dist"))
      .filter(col("dist") <= 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == naive && banded.nonEmpty)
    // hashes are 32-bit: no bit above 31 is ever set
    assert(h.filter(expr("shiftright(ahash, 32) != 0")).count() == 0)
  }
}
