package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `graft_gram_top_shares(text, lo, hi)`: for every n-gram length n in
  * [lo, hi], the most frequent word-n-gram's share of all the
  * document's n-grams at that length — array<double> of hi-lo+1
  * entries, element i for n = lo+i; null where the document has no
  * n-gram of that length (fewer than n tokens).
  *
  * The top-n-gram share (Gopher's repetition rules, t14) is a
  * PER-DOCUMENT mode: the r18 shape exploded every (doc, n, gram)
  * into rows and paid a (doc, n, gram)-keyed exchange plus two more
  * aggregation exchanges and a join to reassemble the battery. This
  * expression computes the mode inside the projection — tokenize
  * once, hash each n-token window, sort, longest equal run over m =
  * tokens-n+1 windows — so the whole battery is per-row work with no
  * shuffle at all (guide §2.4: remove shuffles outright). A first cut
  * kept the per-row shape declaratively (array_sort + the `aggregate`
  * higher-order function); its per-element interpreted lambdas
  * measured ~2x slower than the exploded original — the VecDot
  * lesson — hence the native kernel.
  *
  * Hash discipline: XXH64 (seed 42) of the window's space-joined
  * UTF-8 form, the same as [[ShingleHashes]]. The share counts grams
  * BY HASH IDENTITY, so it is identical to counting the gram strings
  * up to 64-bit collisions (~1e-7 corpus-wide, deterministic) — the
  * repo's documented shingle discipline.
  *
  * Evaluated once per document row; CodegenFallback keeps the
  * surrounding stage simple (the per-row loop is already compiled
  * scala, there is no per-element expression tree to fuse).
  */
case class GramTopShares(child: Expression, lo: Int, hi: Int)
  extends UnaryExpression with CodegenFallback {

  require(lo >= 1 && hi >= lo,
    s"${GraftFunctions.GramTopSharesName} needs 1 <= lo <= hi, " +
      s"got [$lo, $hi]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.GramTopSharesName} requires a string " +
        s"argument, got ${child.dataType.sql}")

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any = {
    val toks =
      GramTopShares.Ws.split(input.asInstanceOf[UTF8String].toString)
    val out = new Array[Any](hi - lo + 1)
    val sb = new java.lang.StringBuilder
    var n = lo
    while (n <= hi) {
      val m = toks.length - n + 1
      if (m <= 0) out(n - lo) = null
      else {
        val hs = new Array[Long](m)
        var i = 0
        while (i < m) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          val bytes = sb.toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          hs(i) = XXH64.hashUnsafeBytes(bytes,
            Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
          i += 1
        }
        java.util.Arrays.sort(hs)
        var best = 1L
        var run = 1L
        i = 1
        while (i < m) {
          if (hs(i) == hs(i - 1)) run += 1 else run = 1
          if (run > best) best = run
          i += 1
        }
        out(n - lo) = best.toDouble / m
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): GramTopShares =
    copy(child = c)
}

object GramTopShares {
  /** Same pattern as Spark's `split(text, "\\s+")`. */
  private val Ws = Pattern.compile("\\s+")
}
