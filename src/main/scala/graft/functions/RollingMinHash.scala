package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd rolling-hash fingerprint: Karp-Rabin polynomial hash
  * (base 257, mod 2^64 via natural long overflow) over a sliding
  * `window`-byte window of the UTF-8 text, winnowed to the MINIMUM window
  * hash — one 64-bit document fingerprint whose value is stable under
  * edits that don't touch the minimizing window (the winnowing property
  * used for plagiarism/near-dup detection at scale).
  *
  * Texts shorter than the window hash their full byte span. Deterministic
  * and engine-local (not DuckDB-reproducible), so queries over it get
  * rows-only driver checks; RollingHashSpec pins the exact values against
  * an independent Scala reference implementation.
  */
case class RollingMinHash(child: Expression, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_minhash requires a string argument, got " +
        child.dataType.sql)

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    java.lang.Long.valueOf(RollingMinHash.compute(bytes, window))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingMinHash.compute($c.getBytes(), $window)")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object RollingMinHash {
  final val Base = 257L

  /** Shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte], window: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // pow = Base^(w-1) for the outgoing byte
    var pow = 1L
    var i = 1
    while (i < w) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xff) * pow) * Base + (bytes(i) & 0xff)
      if (java.lang.Long.compareUnsigned(h, min) < 0) min = h
      i += 1
    }
    min
  }
}
