package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sources.Versioned

/** The Iceberg write-order DDL spellings over the engine's
  * table-properties surface:
  *
  *   ALTER TABLE t WRITE ORDERED BY (c1 [ASC|DESC], c2 …)   — parens optional
  *   ALTER TABLE t WRITE UNORDERED
  *
  * ORDERED BY stores [[Versioned.WriteOrderProp]]
  * (`write.sort-order`), which every DATA WRITE — appends, INSERTs,
  * and the maintenance rewrites ([[Versioned.compact]]/
  * [[Versioned.compactSmall]] and their CALL spellings) — applies as
  * a per-file local sort; only an explicit clustering strategy
  * (z-order) opts out. Iceberg's write.sort-order semantics: files
  * come back internally ordered for range-scan and compression
  * locality without a global exchange.
  * UNORDERED unsets it. Like the PARTITION FIELD and BRANCH/TAG
  * productions these are SQL-extension statements Spark's grammar
  * does not know, so the delegating parser recognizes them ahead of
  * the delegate (reference analog: the demo's ETL hand-sorts before
  * every write, csv_to_ice.py:27 — here the table declares the order
  * once and maintenance maintains it). */
object WriteOrderDdl {

  private val ColRe = "[A-Za-z0-9_`]+(?:\\s+(?:ASC|DESC))?"
  private val ColsRe = s"$ColRe(?:\\s*,\\s*$ColRe)*"
  // parens are an optional MATCHED pair — `(k` must fall through to
  // the delegate's error, not half-parse
  private val OrderedRe =
    ("(?is)\\s*ALTER\\s+TABLE\\s+(.+?)\\s+WRITE\\s+ORDERED\\s+BY\\s+" +
      s"(?:\\(\\s*($ColsRe)\\s*\\)|($ColsRe))\\s*;?\\s*").r
  private val UnorderedRe =
    "(?is)\\s*ALTER\\s+TABLE\\s+(.+?)\\s+WRITE\\s+UNORDERED\\s*;?\\s*".r
  // ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS c1, c2] — the
  // standard SQL spelling of the stats backfill (`CALL
  // graft.system.collect_stats`). Spark's grammar parses ANALYZE for
  // ITS catalogs but DSv2 tables refuse downstream, so the graft
  // spelling is intercepted here; a statement naming another
  // catalog's table still falls through to the delegate untouched.
  private val AnalyzeRe =
    ("(?is)\\s*ANALYZE\\s+TABLE\\s+(.+?)\\s+COMPUTE\\s+STATISTICS" +
      "(?:\\s+FOR\\s+COLUMNS\\s+([A-Za-z0-9_`]+" +
      "(?:\\s*,\\s*[A-Za-z0-9_`]+)*))?\\s*;?\\s*").r
  // SHOW PARTITIONS t — Spark parses this for every catalog but DSv2
  // tables refuse downstream (partition management is a Table
  // capability); graft tables serve it from the manifest rollup. The
  // PARTITION(...)-filtered form falls through (delegate semantics).
  private val ShowPartsRe =
    "(?is)\\s*SHOW\\s+PARTITIONS\\s+([^()]+?)\\s*;?\\s*".r

  /** Whether an ANALYZE statement's table lives in the graft catalog —
    * decided from the PARSED identifier (so `` `graft`.t `` resolves
    * like graft.t) plus the session's current catalog (so `USE graft;
    * ANALYZE TABLE t` backfills instead of hitting Spark's DSv2
    * refusal). An identifier explicitly naming another REGISTERED
    * catalog is never intercepted, whatever the current catalog. */
  private def analyzesGraft(parts: Seq[String],
      session: SparkSession): Boolean = {
    // catalog references resolve case-insensitively in Spark — the
    // head compare must match (ANALYZE TABLE GRAFT.t == graft.t)
    if (parts.length > 1 && parts.head.equalsIgnoreCase("graft")) true
    else if (session == null) false
    else {
      val cm = session.sessionState.catalogManager
      val explicitOther = parts.length > 1 &&
        !parts.head.equalsIgnoreCase("graft") &&
        scala.util.Try(cm.catalog(parts.head)).isSuccess
      // under USE graft, a name that resolves as a temp view — bare
      // local (`t`) OR global (`global_temp.t`) — names the VIEW
      // (Spark's resolution order), not a graft table: fall through
      // to the delegate's ANALYZE. isTempView handles both spellings
      // and returns false for anything longer.
      val tempView = parts.length <= 2 &&
        session.sessionState.catalog.isTempView(parts)
      !explicitOther && !tempView && cm.currentCatalog.name == "graft"
    }
  }

  def parse(sqlText: String, delegate: ParserInterface,
      session: SparkSession = null): Option[LogicalPlan] = sqlText match {
    case OrderedRe(tbl, parens, bare) =>
      val cols = if (parens != null) parens else bare
      val order = Versioned.parseWriteOrder(cols.replace("`", ""))
      Some(SetWriteOrderCommand(
        delegate.parseMultipartIdentifier(tbl), order))
    case UnorderedRe(tbl) =>
      Some(ClearWriteOrderCommand(delegate.parseMultipartIdentifier(tbl)))
    case ShowPartsRe(tbl) =>
      scala.util.Try(delegate.parseMultipartIdentifier(tbl)).toOption
        .filter(analyzesGraft(_, session))
        .map { parts0 =>
          val parts =
            if (parts0.length > 1 && parts0.head.equalsIgnoreCase("graft"))
              "graft" +: parts0.tail
            else parts0
          ShowPartitionsCommand(parts)
        }
    case AnalyzeRe(tbl, cols) =>
      scala.util.Try(delegate.parseMultipartIdentifier(tbl)).toOption
        .filter(analyzesGraft(_, session))
        .map { parts0 =>
          // the head matched case-insensitively (GRAFT.t == graft.t);
          // normalize it so the downstream catalog lookup — which is
          // exact on the registered name — resolves
          val parts =
            if (parts0.length > 1 && parts0.head.equalsIgnoreCase("graft"))
              "graft" +: parts0.tail
            else parts0
          val statsCols = Option(cols).toSeq.flatMap(
            _.replace("`", "").split(",").map(_.trim).filter(_.nonEmpty))
          AnalyzeTableCommand(parts, statsCols)
        }
    case _ => None
  }
}

/** `SHOW PARTITIONS graft.t` — the standard spelling over the
  * manifest's per-partition rollup ([[Versioned.partitions]]): one
  * `partition` string row per live value (`pk=p0`, Spark's native
  * format), resolved from sidecar metadata — never a data scan.
  * Spark's own exec needs a SupportsPartitionManagement table; the
  * graft read plan is an analyzer expansion, so the spelling is
  * served here instead. */
case class ShowPartitionsCommand(parts: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "partition",
      org.apache.spark.sql.types.StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val rows = Versioned.partitions(spark,
        GraftDdl.tableDir(spark, parts, "SHOW PARTITIONS"))
      .select("partition").collect()
    // layout-less files roll up under a NULL partition value; the
    // output attribute is non-nullable (Spark's native format), so an
    // unpartitioned or mixed-layout table refuses cleanly — mirroring
    // Spark's own "not allowed on a table that is not partitioned"
    if (rows.exists(_.isNullAt(0)))
      throw new UnsupportedOperationException(
        s"SHOW PARTITIONS is not allowed on ${parts.mkString(".")}: " +
          (if (rows.length == 1) "the table is not partitioned"
           else "the snapshot mixes partitioned and unpartitioned " +
             "files (compact with a partition column to unify the " +
             "layout)"))
    rows.map(r => Row(r.getString(0))).sortBy(_.getString(0)).toSeq
  }
}

/** `ANALYZE TABLE graft.t COMPUTE STATISTICS [FOR COLUMNS …]` —
  * backfills the per-file stats sidecars ([[Versioned.collectStats]]):
  * row counts for every stats-less root always, min/max for the named
  * columns. Returns the number of roots updated. Only statements whose
  * table identifier starts with the graft catalog are intercepted —
  * ANALYZE on any other catalog's table parses through the delegate
  * unchanged. */
case class AnalyzeTableCommand(parts: Seq[String],
    statsCols: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "updated_roots",
      org.apache.spark.sql.types.IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.tableDir(spark, parts,
      "ANALYZE TABLE … COMPUTE STATISTICS")
    if (statsCols.nonEmpty) {
      val cols = Versioned.read(spark, dir).columns.toSet
      val missing = statsCols.filterNot(cols.contains)
      require(missing.isEmpty,
        s"FOR COLUMNS name(s) ${missing.mkString(", ")} not in " +
          s"${parts.mkString(".")} (has: ${cols.toSeq.sorted.mkString(", ")})")
    }
    Seq(Row(Versioned.collectStats(spark, dir, statsCols)))
  }
}

case class SetWriteOrderCommand(parts: Seq[String],
    order: Seq[(String, Boolean)]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    require(order.nonEmpty, "WRITE ORDERED BY needs at least one column")
    val dir = GraftDdl.tableDir(spark, parts, "ALTER TABLE … WRITE ORDERED BY")
    // validate against the CURRENT schema — a typo'd order column
    // must fail the statement, not silently no-op every compaction
    val cols = Versioned.read(spark, dir).columns.toSet
    val missing = order.map(_._1).filterNot(cols.contains)
    require(missing.isEmpty,
      s"WRITE ORDERED BY column(s) ${missing.mkString(", ")} not in " +
        s"${parts.mkString(".")} (has: ${cols.toSeq.sorted.mkString(", ")})")
    val rendered = order.map { case (c, desc) =>
      if (desc) s"$c desc" else c }.mkString(",")
    Versioned.setProperties(spark, dir,
      set = Map(Versioned.WriteOrderProp -> rendered),
      note = Some(s"WRITE ORDERED BY ($rendered)"))
    Seq.empty
  }
}

case class ClearWriteOrderCommand(parts: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.tableDir(spark, parts, "ALTER TABLE … WRITE UNORDERED")
    // idempotent like Iceberg's: clearing an unset order is a no-op
    if (Versioned.properties(spark, dir)
        .contains(Versioned.WriteOrderProp))
      Versioned.setProperties(spark, dir,
        unset = Seq(Versioned.WriteOrderProp),
        note = Some("WRITE UNORDERED"))
    Seq.empty
  }
}
