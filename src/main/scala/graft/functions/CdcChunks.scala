package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native codegen'd content-defined chunking (the FastCDC/gear-hash
  * family): split a binary payload at positions where a byte-driven
  * rolling gear hash (`h = (h << 1) + gear(b)` — each byte's influence
  * shifts out of the 64-bit window after 64 steps, so a boundary
  * depends only on the ~64 bytes before it) hits `h & mask == 0`,
  * with min/max chunk-size guards (avg/4 and avg*4 around the
  * `2^avgBits` target). Returns one `(hash, len)` struct per chunk,
  * where `hash` is FNV-1a 64 over the chunk's own bytes.
  *
  * This is the binary-payload dedup primitive (backup/dedup-storage
  * literature, here the media-payload analog of text shingling): an
  * INSERTION or prefix shift changes only the chunks it touches —
  * boundaries resynchronize within ~64 bytes + a min-chunk — so two
  * near-identical payloads share almost all chunk hashes, and
  * cross-payload chunk-hash grouping finds duplicated content without
  * any alignment search. Deterministic and engine-local (not
  * DuckDB-reproducible); the m06 gate reduces the CDC properties —
  * lossless reconstruction, size bounds, prefix-shift resync — to
  * oracle-stated constants, and CdcChunksSpec pins exact behavior. */
case class CdcChunks(child: Expression, avgBits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks requires a binary argument, got " +
        child.dataType.sql)

  override def dataType: DataType = CdcChunks.OutType

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[Array[Byte]], avgBits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunks.compute($c, $avgBits)")

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object CdcChunks {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("hash", LongType, nullable = false),
    StructField("len", IntegerType, nullable = false))),
    containsNull = false)

  /** Fixed byte→random table (splitmix64 over the byte value): the
    * gear. Deterministic forever — chunk boundaries are part of the
    * on-disk dedup contract, like a hash seed. */
  private val Gear: Array[Long] = Array.tabulate(256) { i =>
    var z = i.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over `bytes[from, until)` — the chunk's content hash,
    * independent of the boundary-finding gear hash. */
  def fnv64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte], avgBits: Int): GenericArrayData = {
    require(avgBits >= 2 && avgBits <= 28,
      s"avgBits must be in [2, 28], got $avgBits")
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val avg = 1 << avgBits
    val minS = math.max(1, avg >> 2)
    val maxS = avg << 2
    val mask = (avg - 1).toLong
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= minS && (h & mask) == 0L) || len >= maxS) {
        out += InternalRow(fnv64(bytes, start, i + 1), len)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n)
      out += InternalRow(fnv64(bytes, start, n), n - start)
    new GenericArrayData(out.toArray)
  }
}
