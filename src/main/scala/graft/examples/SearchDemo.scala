package graft.examples

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.{Similarity, TextAnalysis}
import graft.sources.{Tables, Versioned}

/** End-to-end corpus-search service over the persisted index family —
  * the build -> probe -> incremental-append -> re-probe lifecycle a
  * standing 100 TB corpus runs, for BOTH retrieval modalities:
  *
  *   keyword: inverted postings index (bucket-pruned BM25, t24 layout)
  *   semantic: IVF-PQ vector index (cell-pruned ADC + rerank, s12)
  *
  * Run: `sbt "runMain graft.examples.SearchDemo [sfDir] [outDir]"`.
  * Prints SEARCH_DEMO_* lines for smoke checking.
  */
object SearchDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "target/tmp/search-demo"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val spark = Sessions.get("graft-search-demo")

    // —— keyword side: inverted index ——
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val textIdx = s"$out/postings"
    TextAnalysis.buildTextIndexOf(docs, textIdx)
    val terms = Seq("spark", "vector", "stream")
    val kw = TextAnalysis.bm25SearchIndexed(spark, textIdx, terms, 10)
      .cache()
    println(s"SEARCH_DEMO_KW_HITS=${kw.count()}")
    println("SEARCH_DEMO_KW_TOP=" + kw.orderBy(col("score").desc)
      .select(col("doc_id")).head().getLong(0))
    // incremental: new docs land O(delta); stats merge, probe sees them
    val fresh = spark.range(1).select(
      lit(900001L).as("doc_id"),
      lit("spark spark spark vector stream").as("text"))
    TextAnalysis.appendToTextIndex(spark, fresh, textIdx)
    val kw2 = TextAnalysis.bm25SearchIndexed(spark, textIdx, terms, 10)
    val freshRank = kw2.filter(col("doc_id") === 900001L).count()
    println(s"SEARCH_DEMO_KW_FRESH_FOUND=$freshRank")
    println("SEARCH_DEMO_POSTINGS_VERSIONS=" +
      Versioned.currentVersion(spark, textIdx))
    // cross-engine handoff: the index's own bytes (postings buckets +
    // the pinned stats file) are everything a second engine needs to
    // serve the same BM25 (q50 proves the hash match in DuckDB)
    val (expPostings, expStats) =
      TextAnalysis.exportTextIndex(spark, textIdx)
    println(s"SEARCH_DEMO_EXPORT_POSTING_FILES=${expPostings.size}")
    println("SEARCH_DEMO_EXPORT_STATS_NDOCS=" + spark.read
      .parquet(expStats: _*).head().getLong(0))
    // Lucene-semantics delete: the fresh doc leaves results
    // immediately; compaction applies the set and restores exact
    // stats so the raw-file export stays offerable
    TextAnalysis.deleteFromTextIndex(spark,
      spark.range(1).select(lit(900001L).as("doc_id")), textIdx)
    println("SEARCH_DEMO_KW_DELETED_FOUND=" +
      TextAnalysis.bm25SearchIndexed(spark, textIdx, terms, 10)
        .filter(col("doc_id") === 900001L).count())
    TextAnalysis.compactTextIndex(spark, textIdx)
    println("SEARCH_DEMO_KW_NDOCS_AFTER_DELETE=" + spark.read
      .parquet(TextAnalysis.exportTextIndex(spark, textIdx)._2: _*)
      .head().getLong(0))
    // O(batch) RE-INDEX: upsert inserts a new doc, then replaces its
    // postings atomically at exact scalars — no delete -> full-rewrite
    // compact -> append detour, and no staleness window at all
    def oneDoc(id: Long, text: String) = spark.range(1)
      .select(lit(id).as("doc_id"), lit(text).as("text"))
    TextAnalysis.upsertIntoTextIndex(spark,
      oneDoc(900002L, "zzztoken zzztoken first body"), textIdx)
    TextAnalysis.upsertIntoTextIndex(spark,
      oneDoc(900002L, "qqqtoken replacement body"), textIdx)
    println("SEARCH_DEMO_KW_REINDEXED_OLD_GONE=" +
      TextAnalysis.bm25SearchIndexed(spark, textIdx,
        Seq("zzztoken"), 10).count())
    println("SEARCH_DEMO_KW_REINDEXED_NEW_FOUND=" +
      TextAnalysis.bm25SearchIndexed(spark, textIdx,
        Seq("qqqtoken"), 10)
        .filter(col("doc_id") === 900002L).count())

    // —— semantic side: IVF-PQ vector index ——
    val vecIdx = s"$out/ivfpq"
    Similarity.buildIvfPqIndex(spark, sfDir, vecIdx)
    val ann = Similarity.ivfPqTopKIndexed(spark, sfDir, vecIdx).cache()
    println(s"SEARCH_DEMO_ANN_ROWS=${ann.count()}")
    println("SEARCH_DEMO_ANN_QUERIES=" +
      ann.select(col("query_id")).distinct().count())
    // append an exact twin of query 0's embedding. Operational
    // invariant: the source STORE receives a vector BEFORE its index
    // append (the index holds only code bytes; the rerank fetches
    // floats from the store) — here the store extension is the
    // unioned frame passed to the probe.
    val emb = Tables.load(spark, sfDir, "embeddings")
    val twin = emb.filter(col("vec_id") === 0)
      .select(lit(900000L).as("vec_id"), col("embedding"))
    Similarity.appendToIvfPqIndex(spark, twin, vecIdx)
    val stored = Versioned.read(spark, vecIdx)
      .filter(col("vec_id") >= 900000L).count()
    println(s"SEARCH_DEMO_ANN_APPENDED=$stored")
    // the appended twin is findable: query 0's new top-1 (cosine 1)
    val extendedStore = emb
      .filter(col("vec_id") >= Similarity.NumQueries)
      .select(col("vec_id"), col("embedding")).unionAll(twin)
    val top1 = Similarity.ivfPqTopKIndexed(spark, sfDir, vecIdx,
        corpus = Some(extendedStore))
      .filter(col("query_id") === 0 && col("rank") === 1)
      .head().getLong(2)
    println(s"SEARCH_DEMO_ANN_FRESH_TOP1=$top1")
    println("SEARCH_DEMO_INDEX_CODE_BYTES=" + Versioned.read(spark, vecIdx)
      .select(max(org.apache.spark.sql.functions.size(col("codes"))))
      .head().getInt(0))
    // cross-engine handoff, semantic side: the consistent triple
    // (code cells + pinned centroids + pinned codebooks) is everything
    // a second engine needs to run the same ADC probe (q51 proves the
    // candidate-set match in DuckDB)
    val (expCodes, expCents, expCbs) =
      Similarity.exportVectorIndex(spark, vecIdx)
    println(s"SEARCH_DEMO_EXPORT_CODE_FILES=${expCodes.size}")
    println(s"SEARCH_DEMO_EXPORT_CENTROID_FILES=${expCents.size}")
    println(s"SEARCH_DEMO_EXPORT_CODEBOOK_FILES=${expCbs.size}")
    // delete the twin: gone from every shortlist immediately, and
    // compaction drops its code bytes from the rewritten cells
    Similarity.deleteFromVectorIndex(spark,
      spark.range(1).select(lit(900000L).as("vec_id")), vecIdx)
    println("SEARCH_DEMO_ANN_DELETED_FOUND=" +
      Similarity.ivfPqTopKIndexed(spark, sfDir, vecIdx,
          corpus = Some(extendedStore))
        .filter(col("neighbor_id") === 900000L).count())
    Similarity.compactIvfPqIndex(spark, vecIdx)
    println("SEARCH_DEMO_ANN_TOP1_AFTER_DELETE=" +
      Similarity.ivfPqTopKIndexed(spark, sfDir, vecIdx,
          corpus = Some(extendedStore))
        .filter(col("query_id") === 0 && col("rank") === 1)
        .head().getLong(2))
    // O(batch) RE-EMBED: the vector returns at its NEW position in one
    // upsert (query 1's exact embedding), generation pins unchanged
    val reEmbedded = emb.filter(col("vec_id") === 1)
      .select(lit(900000L).as("vec_id"), col("embedding"))
    Similarity.upsertIntoVectorIndex(spark, reEmbedded, vecIdx)
    val store2 = emb.filter(col("vec_id") >= Similarity.NumQueries)
      .select(col("vec_id"), col("embedding")).unionAll(reEmbedded)
    println("SEARCH_DEMO_ANN_REEMBED_TOP1_Q1=" +
      Similarity.ivfPqTopKIndexed(spark, sfDir, vecIdx,
          corpus = Some(store2))
        .filter(col("query_id") === 1 && col("rank") === 1)
        .head().getLong(2))
    spark.stop()
  }
}
