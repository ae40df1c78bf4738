package org.apache.spark.sql

import org.apache.spark.sql.types.StructType

/** Access bridge for the ONE `private[sql]` entry point a V1
  * streaming `Source` needs: `getBatch`'s DataFrame must carry
  * `isStreaming = true` (MicroBatchExecution asserts it), and the
  * only way to mark an arbitrary plan streaming is
  * `internalCreateDataFrame(rdd, schema, isStreaming = true)` — the
  * same call `FileStreamSource` makes for its per-batch frames. The
  * wrapped RDD is the frame's own physical plan (`toRdd` is lazy), so
  * execution stays fully distributed; the plan is frozen at batch
  * construction, which is exactly a micro-batch's contract.
  *
  * Lives in `org.apache.spark.sql` solely for `private[sql]` access —
  * the standard third-party-connector technique; nothing here is
  * copied code. Used by [[graft.streaming.ChangeStreamSource]]. */
object GraftStreamingBridge {
  def streamingFrame(df: DataFrame, schema: StructType): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, schema,
      isStreaming = true)
  }
}
