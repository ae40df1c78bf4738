package graft.functions

import org.apache.spark.sql.SparkSession

/** Registry for the engine's native Catalyst expressions. Registration is
  * idempotent and happens in [[graft.Sessions.get]]; SQL and the Column
  * API both resolve the functions by name afterwards. */
object GraftFunctions {
  val VecDotName = "graft_vec_dot"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      VecDotName,
      { exprs =>
        require(exprs.length == 2,
          s"$VecDotName expects 2 arguments, got ${exprs.length}")
        VecDot(exprs(0), exprs(1))
      },
      "built-in")
  }
}
