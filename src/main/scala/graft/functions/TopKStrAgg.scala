package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** String-payload sibling of [[TopKNeighborsAgg]]:
  * `graft_topk_str(score, payload[, k])` keeps the k best
  * (score desc, payload asc) entries of a group and returns
  * `array<struct<token string, score double>>` — the exact top-k shape
  * for vocabulary building (top tokens per language) and any other
  * "heaviest strings per group" question.
  *
  * Same scale rationale as the numeric variant: the window-rank
  * formulation shuffles every (group, string, count) row into #groups
  * tasks — with a handful of strata over a web-scale vocabulary that is
  * a straight serialization point. Here each partition folds its rows
  * into a k-slot state (partial aggregation), so only #groups x k
  * entries cross the shuffle. Duplicate payloads fold (first
  * occurrence wins — occurrences are identical when scores are
  * deterministic).
  *
  * State is a sorted ArrayBuffer of (score, payload); payloads are
  * copied on insert (the input UTF8String aliases the row buffer) and
  * serialized length-prefixed.
  */
case class TopKStringsAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, UTF8String)]]
  with BinaryLike[Expression] {

  require(k >= 1, s"${GraftFunctions.TopKStrName}: k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"${GraftFunctions.TopKStrName} score must be double, " +
          s"got ${left.dataType.sql}")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"${GraftFunctions.TopKStrName} payload must be string, " +
          s"got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): ArrayBuffer[(Double, UTF8String)] =
    new ArrayBuffer[(Double, UTF8String)](k)

  /** true when (s1, p1) ranks strictly better than (s2, p2). */
  private def better(s1: Double, p1: UTF8String,
      s2: Double, p2: UTF8String): Boolean =
    s1 > s2 || (s1 == s2 && p1.compareTo(p2) < 0)

  private def insert(buf: ArrayBuffer[(Double, UTF8String)],
      score: Double, payload: UTF8String): ArrayBuffer[(Double, UTF8String)] = {
    if (java.lang.Double.isNaN(score)) return buf // would corrupt the sort
    var i = 0
    while (i < buf.length) {
      if (buf(i)._2.equals(payload)) return buf
      i += 1
    }
    var pos = 0
    while (pos < buf.length &&
      better(buf(pos)._1, buf(pos)._2, score, payload)) pos += 1
    if (pos >= k) return buf
    buf.insert(pos, (score, payload))
    if (buf.length > k) buf.remove(k)
    buf
  }

  override def update(buf: ArrayBuffer[(Double, UTF8String)],
      input: InternalRow): ArrayBuffer[(Double, UTF8String)] = {
    val s = left.eval(input)
    val p = right.eval(input)
    if (s == null || p == null) buf
    else insert(buf, s.asInstanceOf[Double],
      p.asInstanceOf[UTF8String].clone()) // copy out of the row buffer
  }

  override def merge(b1: ArrayBuffer[(Double, UTF8String)],
      b2: ArrayBuffer[(Double, UTF8String)]): ArrayBuffer[(Double, UTF8String)] = {
    b2.foreach { case (s, p) => insert(b1, s, p) }
    b1
  }

  override def eval(buf: ArrayBuffer[(Double, UTF8String)]): Any =
    new GenericArrayData(
      buf.map { case (s, p) => InternalRow(p, s) }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, UTF8String)]): Array[Byte] = {
    val payloadBytes = buf.map(_._2.getBytes)
    val size = 4 + buf.map(12 + _._2.numBytes()).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.length)
    buf.indices.foreach { i =>
      bb.putDouble(buf(i)._1)
      bb.putInt(payloadBytes(i).length)
      bb.put(payloadBytes(i))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, UTF8String)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, UTF8String)](n)
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf += ((s, UTF8String.fromBytes(arr)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKStringsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStringsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKStringsAgg =
    copy(left = l, right = r)
}
