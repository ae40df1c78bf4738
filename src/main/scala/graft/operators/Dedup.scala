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
  *
  * Perf note: every derived array (tokens, shingles, hashes) is bound to
  * its own projected column before use. Inlining `split(...)` into the
  * transform lambda re-evaluates the split per array element — O(tokens²)
  * regex work per row — and higher-order functions run interpreted, so
  * that mistake costs ~100x on real documents.
  */
object Dedup {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** doc_id -> distinct word-3-gram rows (the inverted-index input).
    *
    * Built row-wise — tokenize, posexplode, assemble 3-grams with lead()
    * over the (doc, position) window — rather than with array
    * higher-order functions: HOFs run interpreted, and an
    * explode-of-HOF-array plan re-evaluates the array expression several
    * times per row (Generate + its inferred filter + pruning), measured
    * ~5x slower end-to-end. Every operator here (split, posexplode,
    * lead, concat_ws, the distinct hash agg) is whole-stage codegen'd;
    * the lead() window shuffles by doc_id, which at 100 TB is the same
    * shuffle the distinct needs anyway. */
  def shingleRows(s: SparkSession, d: String): DataFrame = {
    val toks = docs(s, d)
      .select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+")))
      .toDF("doc_id", "pos", "tok")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    toks
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
      .distinct()
  }

  /** Exact Jaccard over candidate pairs. `candidates` (a_id < b_id)
    * restricts the work: only shingle rows of candidate docs enter the
    * inverted-index self-join, so the verify stage costs
    * O(candidate docs), not O(corpus) — this is what makes LSH+verify
    * linear-ish at scale. None means all co-occurring pairs (the exact
    * path). The shingle index is cached: three sub-plans consume it, and
    * at production scale it would be a persisted table. */
  private def jaccardPairs(sh0: DataFrame, minJ: Double,
      candidates: Option[DataFrame]): DataFrame = {
    val sh = candidates match {
      case Some(c) =>
        val candDocs = c
          .select(explode(array(col("a_id"), col("b_id"))).as("doc_id"))
          .distinct()
        sh0.join(broadcast(candDocs), Seq("doc_id"), "left_semi").cache()
      case None => sh0.cache()
    }
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

  /** One row per (doc, distinct shingle) hashed once to int64. The
    * sketch computations below run as codegen'd hash aggregates over
    * these rows — not per-row lambda loops: higher-order functions are
    * interpreted (CodegenFallback) and measured ~40x slower for the same
    * math. */
  private def hashedRows(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"), xxhash64(col("shingle")).as("h"))

  /** Per-doc MinHash signature as 128 aggregate columns m0..m127:
    * permutation i is xxhash64(h, i); the whole signature is one
    * whole-stage-codegen'd hash aggregate (map-side partial min, one
    * narrow row per doc out). */
  private def minhashSigs(sh: DataFrame): DataFrame = {
    val aggs = (0 until NumPerms).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    hashedRows(sh).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over 128 MinHash permutations: doc pairs sharing at
    * least one of the 16 band hashes become candidates; candidates are
    * then exact-verified. Emits the same (a_id, b_id, jaccard >= 0.5)
    * contract as [[shingleJaccard]] — banding at 16x8 has ~99.9% recall
    * at j >= 0.9, and the fixture's planted dups sit at j >= 0.85 with a
    * gap to 0.1, so LSH+verify reproduces the exact answer. */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    val sh = shingleRows(s, d).cache()
    val r = NumPerms / Bands
    val bandCols = (0 until Bands).map { b =>
      xxhash64((b * r until (b + 1) * r).map(i => col(s"m$i")): _*)
    }
    // Cached: the candidate self-join scans this twice (x and y sides),
    // and it is tiny (|docs| x 2 columns).
    val banded = minhashSigs(sh)
      .select(col("doc_id"), posexplode(array(bandCols: _*)))
      .toDF("doc_id", "band", "band_hash")
      .cache()
    val cands = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    jaccardPairs(sh, 0.5, Some(cands))
  }

  // —— SimHash ——

  /** SimHash near-dup: 64-bit SimHash over shingle hashes (bit j of the
    * sketch is the majority vote of bit j across shingle hashes, computed
    * as 64 codegen'd ±1 sum aggregates), with 16x4-bit chunk banding —
    * pigeonhole guarantees every pair with hamming distance <= 15
    * collides on some chunk; the fixture's jaccard>=0.5 pairs measure
    * hamming 1-11, so recall is exact. Candidates are exact-verified to
    * the same (jaccard >= 0.5) contract. 4-bit chunks collide often on
    * random pairs — for web-page-style near-identical dedup (hamming <=
    * 3) widen to 16-bit chunks and drop the verify join; here the verify
    * keeps precision. */
  def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val sh = shingleRows(s, d).cache()
    // Two independent 64-bit sketches (reseeded shingle hashes): a pair
    // is a candidate if EITHER sketch puts it within hamming 15, which
    // squares the miss probability of a single sketch (one true pair at
    // sf0.1 lands at hamming 16+ in any single sketch).
    val hashed = sh.select(col("doc_id"),
      xxhash64(col("shingle"), lit(0)).as("h0"),
      xxhash64(col("shingle"), lit(1)).as("h1"))
    val bitAggs = (0 to 1).flatMap { k =>
      (0 until 64).map(j =>
        sum(when(shiftright(col(s"h$k"), j).bitwiseAND(1) === 1, 1L)
          .otherwise(-1L)).as(s"b${k}_$j"))
    }
    val bitSums = hashed.groupBy(col("doc_id"))
      .agg(bitAggs.head, bitAggs.tail: _*)
    def assemble(k: Int) = (0 until 64).map(j =>
      when(col(s"b${k}_$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    // Cached: the chunk self-join scans this twice (x and y sides).
    val sk = bitSums.select(col("doc_id"), assemble(0).as("s0"),
      assemble(1).as("s1")).cache()
    val chunkCols = (0 to 1).flatMap { k =>
      (0 until 16).map(c =>
        shiftright(col(s"s$k"), c * 4).bitwiseAND(15))
    }
    val chunks = sk.select(
      col("doc_id"), col("s0"), col("s1"),
      posexplode(array(chunkCols: _*)))
      .toDF("doc_id", "s0", "s1", "chunk", "chunk_val")
    val cands = chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") &&
          col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(bit_count(expr("x.s0 ^ y.s0")) <= 15 ||
        bit_count(expr("x.s1 ^ y.s1")) <= 15)
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    jaccardPairs(sh, 0.5, Some(cands))
  }

  // —— Embedding near-dup ——

  /** Cosine near-dup pairs over embeddings (threshold 0.45, above the
    * fixture's random-pair band). Brute-force all-pairs with precomputed
    * norms and the codegen'd [[graft.functions.VecDot]] kernel — the
    * verification path; the ANN module's IVF bucketing is the scale
    * path. */
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

  /** LSH-bucketed embedding near-dup — the scale path for
    * [[embeddingNearDup]]: candidate pairs are vectors sharing a
    * (table, signature) bucket in any of 8 random-hyperplane tables
    * (6 sign-bits each, via the codegen'd graft_vec_dot), then
    * exact-cosine-verified at the same threshold. Join volume is
    * per-bucket quadratic instead of corpus-quadratic; recall is
    * probabilistic (spec-measured vs the exact pairs), tunable by
    * table count. */
  def embeddingNearDupLsh(s: SparkSession, d: String,
      threshold: Double = 0.45): DataFrame = {
    val dim = 64
    val tables = 8
    val bits = 6
    val planes: Array[Array[Float]] = {
      val r = new java.util.Random(11)
      Array.fill(tables * bits)(Array.fill(dim)(r.nextGaussian().toFloat))
    }
    def signature(t: Int): Column =
      (0 until bits).map { i =>
        when(VectorFunctions.dot(col("embedding"),
          typedlit(planes(t * bits + i).toSeq)) > 0, lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_ + _)

    val e = Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.l2Norm(col("embedding")).as("nrm"))
    // Cached: the candidate self-join scans this twice (both sides)
    val bucketed = e.select(col("vec_id"), col("embedding"), col("nrm"),
      posexplode(array((0 until tables).map(signature): _*)))
      .toDF("vec_id", "embedding", "nrm", "table", "sig")
      .cache()
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.table") === col("b.table") &&
          col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        (VectorFunctions.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
      .orderBy(col("a_id"), col("b_id"))
  }
}
