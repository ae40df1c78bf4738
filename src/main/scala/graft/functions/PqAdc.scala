package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType,
  DoubleType}

/** Native Catalyst expression: product-quantization ASYMMETRIC
  * DISTANCE — `Σ_j qtab[j * K + codes[j]]` where `qtab` is a query's
  * flattened M x K subspace lookup table (`array<double>`) and
  * `codes` a candidate's M code bytes (`array<tinyint>`); K is
  * derived as `qtab.length / codes.length` per row, so one expression
  * serves any (M, K) configuration.
  *
  * This is PQ's per-candidate hot loop — at scale it runs once per
  * (query, stored vector) pair. The `aggregate(sequence(...))`
  * higher-order formulation it replaces runs interpreted
  * (CodegenFallback) and allocates the index sequence per row; like
  * [[VecDot]] this is a tight primitive loop with full whole-stage
  * codegen. Code bytes decode UNSIGNED: the storage type is a signed
  * tinyint, so a code value >= 128 arrives as a negative byte and
  * `& 0xff` recovers the slot (128..255) — full K = 256 round-trips.
  * An out-of-range (>= K) or null code contributes 0 — degrade,
  * never throw, matching the HOF's element_at-null semantics.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc requires (array<double> qtab, array<tinyint> " +
          s"codes), got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val tab = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0) return java.lang.Double.valueOf(0.0)
    val k = tab.numElements() / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (!codes.isNullAt(j)) {
        val c = codes.getByte(j).toInt & 0xff
        val slot = j * k + c
        if (c < k && !tab.isNullAt(slot))
          acc += tab.getDouble(slot)
      }
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $b.numElements();
         |double $acc = 0.0;
         |if ($m > 0) {
         |  int $k = $a.numElements() / $m;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if (!$b.isNullAt($j)) {
         |      int $c = ((int) $b.getByte($j)) & 0xff;
         |      if ($c < $k && !$a.isNullAt($j * $k + $c)) {
         |        $acc += $a.getDouble($j * $k + $c);
         |      }
         |    }
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}
