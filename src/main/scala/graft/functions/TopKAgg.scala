package graft.functions

import java.lang.{Double => JDouble}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Native bounded top-k aggregate: `graft_topk(score, id[, k])` over a
  * group's (double score, int64 id) rows returns the k best as
  * `array<struct<neighbor_id bigint, cosine double>>`, ordered by
  * (score desc, id asc) — exactly the `row_number() OVER (ORDER BY
  * cosine DESC, neighbor_id) <= k` contract of the ANN queries.
  *
  * Why an aggregate and not a window: the window formulation shuffles
  * every scored (query x corpus) row into #queries tasks and sorts them —
  * parallelism collapses to the query count and the sort is O(corpus)
  * per query. This aggregate is an ObjectHashAggregate: each input
  * partition folds its rows into a k-slot sorted array per query
  * (partial aggregation, map-side), and only #queries x k-entry states
  * cross the shuffle. At 100 TB the scored-row stream never moves.
  *
  * Duplicate ids within a group are folded (first occurrence wins; with
  * deterministic scores, occurrences are identical) — so multi-table LSH
  * probes need no pre-aggregation `distinct()` pass.
  *
  * State is a flat Array[Long] — slot 0 the current size n <= k, then n
  * (doubleToLongBits(score), id) pairs kept sorted best-first; insertion
  * is an O(k) shift, merge an O(k^2) fold of two sorted lists (k is
  * single-digit for ANN probes, so both are trivial next to the dot
  * products that feed them).
  */
case class TopKNeighborsAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with LongArrayAggState with BinaryLike[Expression] {

  require(k >= 1, s"${GraftFunctions.TopKName}: k must be >= 1, got $k")

  override def stateLen: Int = 1 + 2 * k

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"${GraftFunctions.TopKName} score must be double, " +
          s"got ${left.dataType.sql}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"${GraftFunctions.TopKName} id must be bigint, " +
          s"got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](stateLen)

  /** Insert (score, id) preserving the sorted-best-first invariant;
    * duplicate ids, NaN scores (0/0 cosines of zero-norm vectors —
    * meaningless as similarities, and NaN comparisons would corrupt the
    * sort invariant) and entries past the k-th are dropped. */
  private def insert(buf: Array[Long], score: Double, id: Long)
      : Array[Long] = {
    if (JDouble.isNaN(score)) return buf
    val n = buf(0).toInt
    var i = 0
    while (i < n) {
      if (buf(2 + 2 * i) == id) return buf
      i += 1
    }
    var pos = 0
    while (pos < n && {
      val s = JDouble.longBitsToDouble(buf(1 + 2 * pos))
      s > score || (s == score && buf(2 + 2 * pos) < id)
    }) pos += 1
    if (pos >= k) return buf
    val newN = math.min(n + 1, k)
    var j = newN - 1
    while (j > pos) {
      buf(1 + 2 * j) = buf(1 + 2 * (j - 1))
      buf(2 + 2 * j) = buf(2 + 2 * (j - 1))
      j -= 1
    }
    buf(1 + 2 * pos) = JDouble.doubleToLongBits(score)
    buf(2 + 2 * pos) = id
    buf(0) = newN
    buf
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s == null || id == null) buf
    else insert(buf, s.asInstanceOf[Double], id.asInstanceOf[Long])
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val n2 = b2(0).toInt
    var i = 0
    while (i < n2) {
      insert(b1, JDouble.longBitsToDouble(b2(1 + 2 * i)), b2(2 + 2 * i))
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(0).toInt
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      rows(i) = InternalRow(
        buf(2 + 2 * i), JDouble.longBitsToDouble(buf(1 + 2 * i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKNeighborsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKNeighborsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKNeighborsAgg =
    copy(left = l, right = r)
}
