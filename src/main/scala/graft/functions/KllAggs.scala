package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL QUANTILE sketches (DataSketches `KllDoublesSketch`) — the
  * mergeable percentile summary the rollup story needs beside the
  * HLL distinct sketch: `p99(latency) BY day` cannot be maintained
  * from per-group sums, but a KLL sketch of each group's values can
  * be (a) merged with a new batch's sketch on insert and (b) asked
  * for any quantile at read.
  *
  * Contract note (the honest difference from HLL): a KLL sketch is
  * EXACT — all values retained, quantiles are true order statistics,
  * bytes deterministic — until a group exceeds ~k values (k = 200
  * here). Beyond that, compaction samples (rank error ≤ ~1.65% at
  * k = 200, the published bound) and the byte representation varies
  * run to run; the sketch remains a valid summary of exactly the
  * values fed to it, which is the quantile-sketch contract every
  * store that ships one (Druid, Pinot) documents the same way. */
object KllAggs {
  /** Fixed accuracy parameter: ~1.65% worst-case rank error, ~5 KB
    * max sketch — the DataSketches default, one choice everywhere so
    * stored sketches always merge. */
  val K = 200

  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** `graft_kll(x)` — aggregate a group's DOUBLE values into KLL sketch
  * bytes; NULL for a group with no non-null values (so an empty and
  * an all-null group store identically). */
case class KllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.KllName} requires a double argument " +
        s"(cast numerics), got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(KllAggs.K)

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) null else buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // heapified sketches are read-optimized; merges need a writable
    // heap instance, so rebuild one around the bytes
    val s = KllDoublesSketch.newHeapInstance(KllAggs.K)
    s.merge(KllAggs.heapify(bytes))
    s
  }

  override def withNewMutableAggBufferOffset(
      o: Int): KllSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(
      o: Int): KllSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      c: Expression): KllSketchAgg = copy(child = c)
  override def prettyName: String = GraftFunctions.KllName
}

/** `graft_kll_merge(sk)` — aggregate MERGE of stored sketch bytes
  * (roll day sketches up to a month at read); NULL when every input
  * is null. */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.KllMergeName} requires KLL sketch bytes, " +
        s"got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(KllAggs.K)

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllAggs.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) null else buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val s = KllDoublesSketch.newHeapInstance(KllAggs.K)
    s.merge(KllAggs.heapify(bytes))
    s
  }

  override def withNewMutableAggBufferOffset(
      o: Int): KllMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(
      o: Int): KllMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      c: Expression): KllMergeAgg = copy(child = c)
  override def prettyName: String = GraftFunctions.KllMergeName
}

/** `graft_kll_union(a, b)` — SCALAR union of two nullable sketch
  * columns (either side NULL = empty), the [[KllSketchAgg]] twin of
  * `hll_union`: the incremental MV patch merges the stored sketch
  * with the new rows' sketch per group row. */
case class KllUnion(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.KllUnionName} requires two KLL sketch byte " +
        s"columns, got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null) b
    else if (b == null) a
    else {
      val s = KllDoublesSketch.newHeapInstance(KllAggs.K)
      s.merge(KllAggs.heapify(a.asInstanceOf[Array[Byte]]))
      s.merge(KllAggs.heapify(b.asInstanceOf[Array[Byte]]))
      s.toByteArray
    }
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): KllUnion = copy(left = l, right = r)
  override def prettyName: String = GraftFunctions.KllUnionName
}

/** `graft_kll_quantile(sk, q)` — the quantile estimate at rank `q`
  * in [0, 1] from sketch bytes; NULL for a NULL (empty) sketch.
  * Exact (a true order statistic, inclusive rule) while the group
  * held ≤ ~k values; within the published rank error beyond. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.KllQuantileName} requires (sketch bytes, " +
        s"double rank), got (${left.dataType.sql}, " +
        s"${right.dataType.sql})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val q = right.eval(input)
    if (a == null || q == null) null
    else {
      val rank = q.asInstanceOf[Double]
      require(rank >= 0.0 && rank <= 1.0,
        s"${GraftFunctions.KllQuantileName} rank must be in [0, 1], " +
          s"got $rank")
      KllAggs.heapify(a.asInstanceOf[Array[Byte]]).getQuantile(rank)
    }
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): KllQuantile = copy(left = l, right = r)
  override def prettyName: String = GraftFunctions.KllQuantileName
}
