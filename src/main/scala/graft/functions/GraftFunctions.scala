package graft.functions

import org.apache.spark.sql.SparkSession

/** Registry for the engine's native Catalyst expressions. Registration is
  * idempotent and happens in [[graft.Sessions.get]]; SQL and the Column
  * API both resolve the functions by name afterwards. */
object GraftFunctions {
  val VecDotName = "graft_vec_dot"
  val RollingMinHashName = "graft_rolling_minhash"
  val DefaultRollingWindow = 16

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      VecDotName,
      { exprs =>
        require(exprs.length == 2,
          s"$VecDotName expects 2 arguments, got ${exprs.length}")
        VecDot(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      RollingMinHashName,
      { exprs =>
        require(exprs.nonEmpty && exprs.length <= 2,
          s"$RollingMinHashName expects 1-2 arguments, got ${exprs.length}")
        val w = if (exprs.length == 2)
          exprs(1).eval(null).asInstanceOf[Number].intValue()
        else DefaultRollingWindow
        RollingMinHash(exprs.head, w)
      },
      "built-in")
  }
}
