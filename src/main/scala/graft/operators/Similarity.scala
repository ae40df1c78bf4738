package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the `embeddings` fixture
  * (north-star: similarity search for a training-data pipeline).
  *
  * Two paths with one contract — top-k cosine neighbors per query:
  *  - [[bruteForceTopK]]: exact baseline. Queries broadcast, candidates
  *    streamed, per-query top-k. This is the verification oracle.
  *  - [[ivfTopK]]: IVF-style scale path. Vectors are assigned to the
  *    nearest of C deterministic centroids (one shuffle, once, amortized
  *    across queries); a query probes only its nProbe closest cells, so
  *    the scored candidate set is ~nProbe/C of the corpus. At 100 TB the
  *    centroid table stays broadcast-sized and the per-cell layout is the
  *    partitioning key, turning ANN into a pruned scan instead of a full
  *    cross join.
  */
object Similarity {

  val K = 5
  val NumQueries = 10 // queries: vec_id < 10; corpus: vec_id >= 10
  // Fixture embeddings are near-uniform random, so IVF recall ~=
  // nProbe/C plus a locality lift; 6/16 measures ~0.6 recall@5. On real
  // (clustered) embeddings the same plan gives much higher recall — the
  // knobs trade recall for the fraction of the corpus scored.
  val Centroids = 16
  val NProbe = 6

  private def emb(s: SparkSession, d: String) =
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"),
        l2Norm(col("embedding")).as("nrm"))

  /** Exact top-k cosine neighbors for each query vector. The query side
    * is tiny and broadcast; the window shuffles only (corpus x queries)
    * scored rows partitioned by query — with small k, swap in a
    * per-partition partial top-k merge if queries ever grow large. */
  def bruteForceTopK(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") < NumQueries)
      .withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "q_emb")
      .withColumnRenamed("nrm", "q_nrm")
    val scored = e.filter(col("vec_id") >= NumQueries)
      .join(broadcast(q))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF index: assign every corpus vector to its nearest centroid.
    * Centroids are the first C corpus vectors (deterministic; a k-means
    * refinement would slot in here without changing the query plan). */
  private def assignCells(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val scored = corpus.join(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("cell"),
        (dot(col("c_emb"), col("embedding")) /
          (col("c_nrm") * col("nrm"))).as("c_cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("cell"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
  }

  /** IVF approximate top-k: probe the nProbe cells nearest to each query,
    * exact-score only vectors in those cells. Approximate by design —
    * the spec checks recall against [[bruteForceTopK]] rather than
    * equality, so this query has a rows-only driver check. */
  def ivfTopK(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val corpus = e.filter(col("vec_id") >= NumQueries)
    val cents = corpus.filter(col("vec_id") < NumQueries + Centroids)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    val indexed = assignCells(corpus, cents)

    val q = e.filter(col("vec_id") < NumQueries)
      .withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "q_emb")
      .withColumnRenamed("nrm", "q_nrm")
    val qCells = {
      val scored = q.join(broadcast(cents))
        .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cell"),
          (dot(col("c_emb"), col("q_emb")) /
            (col("c_nrm") * col("q_nrm"))).as("c_cos"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("c_cos").desc, col("cell"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= NProbe)
        .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cell"))
    }
    val scored = indexed.join(broadcast(qCells), "cell")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }
}
