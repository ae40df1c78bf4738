package graft

import org.apache.spark.sql.functions._
import graft.functions.RollingMinHash
import graft.operators.TextAnalysis

class RollingHashSpec extends SparkSpec {

  /** Independent reference: brute-force min over all window hashes. */
  private def reference(s: String, w: Int): Long = {
    val b = s.getBytes("UTF-8")
    if (b.isEmpty) 0L
    else {
      val win = math.min(w, b.length)
      (0 to b.length - win).map { i =>
        b.slice(i, i + win).foldLeft(0L)((h, c) => h * 257L + (c & 0xff))
      }.reduce((a, x) =>
        if (java.lang.Long.compareUnsigned(x, a) < 0) x else a)
    }
  }

  test("expression matches the brute-force reference on sample strings") {
    import spark.implicits._
    val samples = Seq("the quick brown fox jumps over the lazy dog",
      "short", "", "aaaaaaaaaaaaaaaaaaaaaaaa",
      "unicode: héllo wörld ünd mörê")
    val got = samples.toDF("s")
      .select(call_function("graft_rolling_minhash", col("s")))
      .collect().map(_.getLong(0))
    val want = samples.map(reference(_, 16))
    assert(got.toSeq == want)
  }

  test("appending text only adds windows: unsigned min never increases") {
    val base = "the quick brown fox jumps over the lazy dog"
    val fpBase = RollingMinHash.compute(base.getBytes("UTF-8"), 16)
    Seq(" and more", " xyz", base).foreach { suffix =>
      val fpExt = RollingMinHash.compute(
        (base + suffix).getBytes("UTF-8"), 16)
      assert(java.lang.Long.compareUnsigned(fpExt, fpBase) <= 0)
    }
  }

  test("query emits one fingerprint per document") {
    val df = TextAnalysis.rollingFingerprints(spark, sf)
    assert(df.count() ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    assert(df.select("rolling_fp").distinct().count() > 1)
  }
}
