package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.VectorFunctions

/** Near-duplicate detection over the `documents` / `embeddings` fixtures —
  * the dedup stage of a training-data pipeline (north-star; the reference
  * has no dedup surface, SURVEY.md §7.4).
  *
  * Three text algorithms share one semantic contract — "emit pairs whose
  * 3-gram shingle Jaccard ≥ threshold" — so the MinHash-LSH and SimHash
  * paths are *candidate generators* whose candidates are verified with the
  * exact Jaccard; all three are checked against the same DuckDB oracle.
  *
  * Scale story (100 TB): the exact path self-joins the shingle inverted
  * index — quadratic in docs sharing a hot shingle, fine for verification,
  * wrong at scale. The LSH paths bound the join to per-bucket candidates:
  * MinHash banding shuffles 16 small (band, hash) keys per doc and only
  * near-identical docs collide, so the candidate set (and the exact-verify
  * join behind it) stays linear-ish in the true duplicate count.
  */
object Dedup {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** Word 3-gram shingles of lowercased text (empty when under 3 tokens). */
  def shingleCol: Column = {
    expr("""CASE WHEN size(split(trim(lower(text)), '\\s+')) >= 3 THEN
        transform(sequence(0, size(split(trim(lower(text)), '\\s+')) - 3),
          i -> concat_ws(' ',
            split(trim(lower(text)), '\\s+')[i],
            split(trim(lower(text)), '\\s+')[i + 1],
            split(trim(lower(text)), '\\s+')[i + 2]))
        ELSE CAST(array() AS array<string>) END""").as("shingles")
  }

  /** doc_id -> distinct shingle rows (the inverted-index input). */
  private def shingleRows(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), shingleCol)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .distinct()

  /** Exact Jaccard over candidate pairs. `candidates` (a_id < b_id)
    * restricts the inverted-index join; None means all co-occurring
    * pairs. */
  private def jaccardPairs(sh: DataFrame, minJ: Double,
      candidates: Option[DataFrame]): DataFrame = {
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common0 = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    val common1 = candidates match {
      case Some(c) => common0.join(c.hint("broadcast"), Seq("a_id", "b_id"),
        "left_semi")
      case None => common0
    }
    val common = common1.groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("common"))
    common
      .join(counts.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("n", "na"), "a_id")
      .join(counts.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("n", "nb"), "b_id")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= minJ)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Exact 3-gram shingle Jaccard near-dup pairs (threshold 0.5). */
  def shingleJaccard(s: SparkSession, d: String): DataFrame =
    jaccardPairs(shingleRows(s, d), 0.5, None)

  // —— MinHash + LSH ——

  val NumPerms = 128
  val Bands = 16 // 16 bands x 8 rows

  /** Per-doc MinHash signature (128 permutations), computed row-local with
    * higher-order functions: no explode, no shuffle — one pass over the
    * text. Permutation i is xxhash64(shingle, i). */
  def minhashSignature: Column =
    expr(s"""transform(sequence(0, ${NumPerms - 1}),
        i -> array_min(transform(shingles, sh -> xxhash64(sh, i))))""")
      .as("sig")

  /** LSH banding: doc pairs sharing at least one of the 16 band hashes
    * become candidates; candidates are then exact-verified. Emits the
    * same (a_id, b_id, jaccard >= 0.5) contract as [[shingleJaccard]] —
    * banding at 16x8 has ~99.9% recall at j >= 0.9, and the fixture's
    * planted dups sit at j >= 0.85 with a gap to 0.1, so LSH+verify
    * reproduces the exact answer. */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    val sigs = docs(s, d)
      .select(col("doc_id"), shingleCol)
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), minhashSignature)
    val r = NumPerms / Bands
    val banded = sigs.select(
      col("doc_id"),
      posexplode(expr(s"""transform(sequence(0, ${Bands - 1}),
          b -> xxhash64(slice(sig, b * $r + 1, $r)))""")))
      .toDF("doc_id", "band", "band_hash")
    val cands = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    jaccardPairs(shingleRows(s, d), 0.5, Some(cands))
  }

  // —— SimHash ——

  /** 64-bit SimHash over shingle hashes, row-local: bit j of the sketch is
    * the majority vote of bit j across xxhash64(shingle). */
  def simhashCol: Column =
    expr("""aggregate(sequence(0, 63), 0L, (acc, j) ->
        acc + IF(2 * size(filter(transform(shingles, sh -> xxhash64(sh)),
                           h -> ((h >> j) & 1) = 1))
                 >= size(shingles), shiftleft(1L, j), 0L))""")
      .as("simhash")

  /** SimHash near-dup: 16x4-bit chunk banding guarantees every pair with
    * hamming distance <= 15 collides on some chunk (pigeonhole); the
    * fixture's jaccard>=0.5 pairs measure hamming 1-11, so recall is
    * exact. Candidates are exact-verified to the same (jaccard >= 0.5)
    * contract. 4-bit chunks collide often on random pairs — for
    * web-page-style near-identical dedup (hamming <= 3) widen to 16-bit
    * chunks and drop the verify join; here the verify keeps precision. */
  def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val sk = docs(s, d)
      .select(col("doc_id"), shingleCol)
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), simhashCol)
    val chunks = sk.select(
      col("doc_id"), col("simhash"),
      posexplode(expr("""transform(sequence(0, 15),
          c -> (simhash >> (c * 4)) & 15)""")))
      .toDF("doc_id", "simhash", "chunk", "chunk_val")
    val cands = chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") &&
          col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(bit_count(expr("x.simhash ^ y.simhash")) <= 15)
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    jaccardPairs(shingleRows(s, d), 0.5, Some(cands))
  }

  // —— Embedding near-dup ——

  /** Cosine near-dup pairs over embeddings (threshold 0.45, above the
    * fixture's random-pair band). Brute-force all-pairs with precomputed
    * norms — the verification path; the ANN module's LSH/IVF bucketing is
    * the scale path. */
  def embeddingNearDup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.l2Norm(col("embedding")).as("nrm"))
    e.as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        (VectorFunctions.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= 0.45)
      .orderBy(col("a_id"), col("b_id"))
  }
}
