package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot join/aggregation keys.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default in [[graft.Sessions]]), which splits oversized shuffle
  * partitions at runtime. These explicit forms cover the cases AQE can't
  * touch: broadcast-ineligible dimension joins against power-law fact
  * keys, and distinct-heavy aggregations.
  */
object Skew {

  /** Salted inner equi-join: the large (skewed) side gets a uniform salt
    * in [0, salts), the small side is replicated once per salt value, and
    * the join key becomes (key, salt) — a hot key's rows spread across
    * `salts` reducers instead of one. The salt value never affects the
    * join result, only its placement. Use when the small side is too big
    * to broadcast but the large side has power-law keys. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedLarge = large
      .withColumn("_salt", (rand(42) * salts).cast("int"))
    val replicatedSmall = small
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase distinct count for skewed group keys: phase 1 dedups
    * (key, value) pairs sharded by value hash, phase 2 sums shard counts
    * per key. A hot key's distinct set is counted across many reducers
    * instead of materializing on one. */
  def saltedDistinctCount(df: DataFrame, key: String, value: String,
      shards: Int = 32): DataFrame = {
    df.select(col(key), col(value))
      .withColumn("_shard", pmod(xxhash64(col(value)), lit(shards)))
      .groupBy(col(key), col("_shard"))
      .agg(countDistinct(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n_distinct"))
  }
}
