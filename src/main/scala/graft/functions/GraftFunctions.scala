package graft.functions

import org.apache.spark.sql.SparkSession

/** Registry for the engine's native Catalyst expressions. Registration is
  * idempotent and happens in [[graft.Sessions.get]]; SQL and the Column
  * API both resolve the functions by name afterwards. */
object GraftFunctions {
  val VecDotName = "graft_vec_dot"
  val RollingMinHashName = "graft_rolling_minhash"
  val DefaultRollingWindow = 16

  /** Validated extraction of the optional window argument: it must be a
    * foldable (literal) expression evaluating to a number >= 1 — a
    * non-literal column would otherwise eval(null) to garbage, and a
    * window < 1 would index bytes(i) with negative i at runtime. */
  def rollingWindowArg(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Int = {
    require(exprs.nonEmpty && exprs.length <= 2,
      s"$RollingMinHashName expects 1-2 arguments, got ${exprs.length}")
    if (exprs.length < 2) DefaultRollingWindow
    else {
      val e = exprs(1)
      require(e.foldable,
        s"$RollingMinHashName window argument must be a literal, " +
          s"got non-foldable expression: ${e.sql}")
      val v = e.eval(null)
      require(v != null, s"$RollingMinHashName window must not be null")
      val w = v.asInstanceOf[Number].intValue()
      require(w >= 1, s"$RollingMinHashName window must be >= 1, got $w")
      w
    }
  }

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
      exprs => {
        val w = rollingWindowArg(exprs) // validates arity before .head
        RollingMinHash(exprs.head, w)
      },
      "built-in")
  }
}
