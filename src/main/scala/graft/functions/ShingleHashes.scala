package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingle_hashes(text[, n])`: the distinct word-n-gram shingles
  * of a document, each hashed to int64, in one per-row pass — ascending
  * array<bigint> out.
  *
  * Replaces the declarative shingle-index build (posexplode tokens ->
  * lead() window -> concat_ws -> distinct), which costs two shuffles of
  * every token/shingle STRING before the index exists. This expression
  * moves the row-count explosion after the hashing: the plan becomes
  * scan -> project -> explode of longs, with no shuffle at all, and all
  * downstream consumers (inverted-index join, MinHash, SimHash) operate
  * on 8-byte keys. At 100 TB that removes the two widest shuffles of the
  * dedup pipeline; per-doc work is identical (it is the same tokenize +
  * hash, relocated).
  *
  * Hash compatibility: the hash of a shingle is XXH64 (seed 42) of its
  * UTF-8 `tok1 tok2 tok3` form — bit-identical to
  * `xxhash64(concat_ws(' ', toks...))`, so sketches built on these
  * values match the previous string formulation. Tokenization matches
  * `split(text, "\\s+")` (same Java regex). Set semantics (Jaccard
  * counts) are preserved up to 64-bit collisions (~1e-7 for a 1e6-
  * shingle corpus, and deterministic).
  *
  * Evaluated once per document row (not per pair), so interpreted eval
  * is off the hot path; CodegenFallback keeps the surrounding stage
  * simple.
  */
case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"${GraftFunctions.ShingleHashesName} n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.ShingleHashesName} requires a string argument, " +
        s"got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = ShingleHashes.Ws.split(input.asInstanceOf[UTF8String].toString)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      hs(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L)
      i += 1
    }
    // sort + in-place dedup: set semantics without per-element boxing
    java.util.Arrays.sort(hs)
    var out = 1
    i = 1
    while (i < m) {
      if (hs(i) != hs(i - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

object ShingleHashes {
  /** Same pattern as Spark's `split(text, "\\s+")`. */
  private val Ws = Pattern.compile("\\s+")
}
