package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, TextAnalysis}

class TextEventsSpec extends SparkSpec {

  test("text stats cover every document exactly once") {
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(TextAnalysis.textStats(spark, sf).count() == n)
  }

  test("fingerprint is whitespace/case-insensitive") {
    import spark.implicits._
    val df = Seq("Hello  World", "hello world", "HELLO\tWORLD ").toDF("text")
    val fps = df.select(TextAnalysis.fingerprintCol(col("text")))
      .collect().map(_.getString(0)).distinct
    assert(fps.length == 1)
  }

  test("langId predicts a language for every doc, from the fixed set") {
    val preds = TextAnalysis.langId(spark, sf)
      .select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "de", "fr", "es")))
  }

  test("dedupExact keep_ids are distinct doc ids") {
    val df = TextAnalysis.dedupExact(spark, sf)
    assert(df.select("keep_id").distinct().count() == df.count())
  }

  test("sessionize: session count never exceeds event count") {
    val rows = Events.sessionize(spark, sf).collect()
    assert(rows.forall(r => r.getLong(1) <= r.getLong(2) && r.getLong(1) >= 1))
    val evTotal = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.map(_.getLong(2)).sum == evTotal)
  }

  test("tumbling hourly counts sum to total events") {
    val total = Events.tumblingHourly(spark, sf)
      .agg(sum("cnt")).head().getLong(0)
    assert(total == spark.read.parquet(s"$sf/events.parquet").count())
  }
}
