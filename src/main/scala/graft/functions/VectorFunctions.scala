package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * codegen'd higher-order functions (zip_with / aggregate) — no UDFs, so
  * the arithmetic stays inside whole-stage codegen and runs at scan speed.
  *
  * All math is promoted to double before accumulation: float-precision
  * sums diverge from the DuckDB oracle (and drift at 100 TB row counts);
  * the sequential left-fold of `aggregate` gives a deterministic
  * summation order.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ with double accumulation — the codegen'd [[VecDot]]
    * expression (the HOF formulation below runs interpreted and is kept
    * only as a semantic reference). */
  def dot(a: Column, b: Column): Column =
    call_function(GraftFunctions.VecDotName, a, b)

  /** Reference HOF formulation of [[dot]] (interpreted; for tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NaN when either vector is all-zero (caller
    * filters), matching DuckDB list_cosine_similarity semantics. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine when the norms are precomputed columns — the form used in
    * pairwise scoring so each norm is computed once per vector, not once
    * per pair. */
  def cosinePre(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)
}
