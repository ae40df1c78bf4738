package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared plumbing for the sketch aggregates: Array[Long] state with
  * flat ByteBuffer serialization. */
trait LongArrayAggState { self: TypedImperativeAggregate[Array[Long]] =>
  def stateLen: Int

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }
}

/** Native SimHash aggregate: `graft_simhash_agg(h)` over a group's int64
  * feature hashes returns the 64-bit SimHash sketch (bit j is the
  * majority vote of bit j across hashes, ties → 1, matching
  * `sum(±1) >= 0`).
  *
  * Replaces the declarative 64-column `sum(when(...))` formulation: one
  * tiny expression instead of a 64-wide aggregate row, so driver-side
  * analysis is O(1) instead of O(64 deep trees), the generated code stays
  * small, and the update is a single tight loop over a 64-slot state
  * array (ObjectHashAggregate, partial+final merge — shuffle volume is
  * one 512-byte state per (mapper, doc)).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with LongArrayAggState with UnaryLike[Expression] {

  override def stateLen: Int = 64

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.SimHashAggName} requires a bigint argument, " +
        s"got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += (((h >>> j) & 1L) << 1) - 1L // +1 when bit set, else -1
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var sk = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) >= 0) sk |= 1L << j
      j += 1
    }
    sk
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SimHashAgg =
    copy(child = c)
}

/** Native MinHash-banding aggregate: `graft_minhash_bands(h[, perms,
  * bands])` over a group's int64 shingle hashes returns the LSH band-key
  * array — permutation i is XXH64(h, seed=i), the signature is the
  * per-permutation minimum, and band b's key is the XXH64 fold (seed 42)
  * of its perms/bands minima.
  *
  * Replaces the declarative 128-column `min(xxhash64(h, i))` aggregate +
  * band-hash projection for the same reasons as [[SimHashAgg]]: constant
  * driver-side analysis, small codegen, one loop per row, 1 KiB state
  * per group in the partial->final shuffle. Emitting band keys (not raw
  * minima) keeps the downstream candidate join narrow: bands x 8 bytes
  * per doc.
  */
case class MinHashBandsAgg(
    child: Expression,
    numPerms: Int,
    bands: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with LongArrayAggState with UnaryLike[Expression] {

  // bands = 0 is the SIGNATURE mode: eval emits the raw per-permutation
  // minima instead of folded band keys — what a persisted dedup index
  // stores to estimate Jaccard between corpora without re-shingling
  require(numPerms >= 1 && bands >= 0 &&
    (bands == 0 || numPerms % bands == 0),
    s"${GraftFunctions.MinHashBandsName}: perms ($numPerms) must be a " +
      s"positive multiple of bands ($bands), or bands = 0 for the " +
      "raw signature")

  override def stateLen: Int = numPerms

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${GraftFunctions.MinHashBandsName} requires a bigint argument, " +
        s"got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numPerms) {
        val p = XXH64.hashLong(h, i)
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    if (bands == 0) return new GenericArrayData(buf.clone())
    val r = numPerms / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L // XxHash64's default seed, folded like xxhash64(cols*)
      var i = b * r
      while (i < (b + 1) * r) {
        acc = XXH64.hashLong(buf(i), acc)
        i += 1
      }
      keys(b) = acc
      b += 1
    }
    new GenericArrayData(keys)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashBandsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashBandsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MinHashBandsAgg =
    copy(child = c)
}
