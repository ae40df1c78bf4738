package graft.functions

import org.apache.spark.sql.SparkSession

/** Registry for the engine's native Catalyst expressions. Registration is
  * idempotent and happens in [[graft.Sessions.get]]; SQL and the Column
  * API both resolve the functions by name afterwards. */
object GraftFunctions {
  val VecDotName = "graft_vec_dot"
  val PqAdcName = "graft_pq_adc"
  val RollingMinHashName = "graft_rolling_minhash"
  val CdcChunksName = "graft_cdc_chunks"
  val DefaultCdcAvgBits = 13 // 8 KiB average chunks, the dedup-storage default
  val SimHashAggName = "graft_simhash_agg"
  val KllName = "graft_kll"
  val KllMergeName = "graft_kll_merge"
  val KllUnionName = "graft_kll_union"
  val KllQuantileName = "graft_kll_quantile"
  val MinHashBandsName = "graft_minhash_bands"
  val ShingleHashesName = "graft_shingle_hashes"
  val GramTopSharesName = "graft_gram_top_shares"
  val TopKName = "graft_topk"
  val TopKStrName = "graft_topk_str"
  val DefaultTopK = 5
  val DefaultRollingWindow = 16
  val DefaultMinHashPerms = 128
  val DefaultMinHashBands = 16
  val DefaultShingleN = 3

  /** Validated literal-int argument: must be foldable and >= min (a
    * non-literal column would eval(null) to garbage). */
  private def literalIntArg(fn: String, what: String,
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      min: Int): Int = {
    require(e.foldable,
      s"$fn $what argument must be a literal, got non-foldable: ${e.sql}")
    val v = e.eval(null)
    require(v != null, s"$fn $what must not be null")
    val i = v.asInstanceOf[Number].intValue()
    require(i >= min, s"$fn $what must be >= $min, got $i")
    i
  }

  /** Validated (perms, bands) arguments of graft_minhash_bands. */
  def minhashBandsArgs(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : (Int, Int) = {
    require(exprs.nonEmpty && exprs.length <= 3,
      s"$MinHashBandsName expects 1-3 arguments, got ${exprs.length}")
    val perms =
      if (exprs.length >= 2)
        literalIntArg(MinHashBandsName, "perms", exprs(1), 1)
      else DefaultMinHashPerms
    val bands =
      if (exprs.length >= 3)
        // 0 = signature mode (raw minima), see MinHashBandsAgg
        literalIntArg(MinHashBandsName, "bands", exprs(2), 0)
      else DefaultMinHashBands
    require(bands == 0 || perms % bands == 0,
      s"$MinHashBandsName: perms ($perms) must be a multiple of bands " +
        s"($bands), or bands = 0 for the raw signature")
    (perms, bands)
  }

  /** Validated optional k argument of graft_topk / graft_topk_str. */
  def topKArg(fn: String,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Int = {
    require(exprs.length >= 2 && exprs.length <= 3,
      s"$fn expects 2-3 arguments, got ${exprs.length}")
    if (exprs.length < 3) DefaultTopK
    else literalIntArg(fn, "k", exprs(2), 1)
  }

  /** Validated optional n argument of graft_shingle_hashes. */
  def shingleNArg(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Int = {
    require(exprs.nonEmpty && exprs.length <= 2,
      s"$ShingleHashesName expects 1-2 arguments, got ${exprs.length}")
    if (exprs.length < 2) DefaultShingleN
    else literalIntArg(ShingleHashesName, "n", exprs(1), 1)
  }

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
      PqAdcName,
      { exprs =>
        require(exprs.length == 2,
          s"$PqAdcName expects 2 arguments, got ${exprs.length}")
        PqAdc(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      RollingMinHashName,
      exprs => {
        val w = rollingWindowArg(exprs) // validates arity before .head
        RollingMinHash(exprs.head, w)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      CdcChunksName,
      exprs => {
        require(exprs.nonEmpty && exprs.length <= 2,
          s"$CdcChunksName expects 1-2 arguments, got ${exprs.length}")
        val bits = if (exprs.length < 2) DefaultCdcAvgBits else {
          val e = exprs(1)
          require(e.foldable, s"$CdcChunksName avgBits must be a " +
            s"literal, got non-foldable expression: ${e.sql}")
          val v = e.eval(null)
          require(v != null, s"$CdcChunksName avgBits must not be null")
          val b = v.asInstanceOf[Number].intValue()
          // fail at ANALYSIS, not per-row at execution
          require(b >= 2 && b <= 28,
            s"$CdcChunksName avgBits must be in [2, 28], got $b")
          b
        }
        CdcChunks(exprs.head, bits)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      SimHashAggName,
      exprs => {
        require(exprs.length == 1,
          s"$SimHashAggName expects 1 argument, got ${exprs.length}")
        SimHashAgg(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      KllName,
      exprs => {
        require(exprs.length == 1,
          s"$KllName expects 1 argument, got ${exprs.length}")
        // numerics welcome: the sketch is over doubles
        KllSketchAgg(org.apache.spark.sql.catalyst.expressions
          .Cast(exprs.head, org.apache.spark.sql.types.DoubleType))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      KllMergeName,
      exprs => {
        require(exprs.length == 1,
          s"$KllMergeName expects 1 argument, got ${exprs.length}")
        KllMergeAgg(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      KllUnionName,
      exprs => {
        require(exprs.length == 2,
          s"$KllUnionName expects 2 arguments, got ${exprs.length}")
        KllUnion(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      KllQuantileName,
      exprs => {
        require(exprs.length == 2,
          s"$KllQuantileName expects 2 arguments, got ${exprs.length}")
        KllQuantile(exprs(0), org.apache.spark.sql.catalyst
          .expressions.Cast(exprs(1),
            org.apache.spark.sql.types.DoubleType))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MinHashBandsName,
      exprs => {
        val (perms, bands) = minhashBandsArgs(exprs) // validates arity
        MinHashBandsAgg(exprs.head, perms, bands)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      TopKName,
      exprs => {
        val k = topKArg(TopKName, exprs) // validates arity
        TopKNeighborsAgg(exprs(0), exprs(1), k)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      TopKStrName,
      exprs => {
        val k = topKArg(TopKStrName, exprs) // validates arity
        TopKStringsAgg(exprs(0), exprs(1), k)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ShingleHashesName,
      exprs => {
        val n = shingleNArg(exprs) // validates arity
        ShingleHashes(exprs.head, n)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      GramTopSharesName,
      exprs => {
        require(exprs.length == 3,
          s"$GramTopSharesName expects 3 arguments, got ${exprs.length}")
        val lo = literalIntArg(GramTopSharesName, "lo", exprs(1), 1)
        val hi = literalIntArg(GramTopSharesName, "hi", exprs(2), lo)
        GramTopShares(exprs.head, lo, hi)
      },
      "built-in")
  }
}
