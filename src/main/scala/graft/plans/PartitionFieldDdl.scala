package graft.plans

import scala.util.Try

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.{GraftVersionedTable, Versioned}

/** The Iceberg partition-spec-evolution DDL spellings —
  *
  *   ALTER TABLE t ADD PARTITION FIELD days(ts)
  *   ALTER TABLE t DROP PARTITION FIELD days(ts)
  *   ALTER TABLE t REPLACE PARTITION FIELD days(ts) WITH months(ts)
  *
  * — lowered onto [[Versioned.setSpec]] (the same metadata-only commit
  * `CALL graft.system.set_spec` drives; setSpec's doc names this DDL as
  * its analog, and the reference declares its own layout with the
  * sibling `PARTITIONED BY` clause, csv_to_ice.py:54).
  *
  * Why a delegating parser rather than DSv2 `TableChange`: Spark's
  * ALTER TABLE grammar has no PARTITION FIELD clause (it is an Iceberg
  * SQL-extension production), and `TableCatalog.alterTable`'s change
  * vocabulary covers columns/properties only — so the statement must be
  * recognized BEFORE Spark's parser rejects it. The parser intercepts
  * exactly these three shapes (the mandatory FIELD keyword keeps
  * Spark's own `ALTER TABLE … ADD PARTITION (spec)` Hive syntax
  * untouched) and emits a command plan; everything else passes to the
  * delegate verbatim, errors included.
  *
  * Graft specs are single-field (one hidden transform per write, the
  * layout [[Versioned.Transform]] models), so ADD onto an already
  * partitioned table refuses loudly with the REPLACE spelling in the
  * message, DROP requires naming the current field (Iceberg's own
  * cannot-find-field contract), and REPLACE is the two-step evolution
  * in one commit. */
object PartitionFieldDdl {

  // (?is): case-insensitive, dot-matches-newline. Anchored via .matches
  // through Scala's regex pattern matching; optional trailing ';'.
  private val AddRe =
    """(?is)\s*ALTER\s+TABLE\s+(.+?)\s+ADD\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*""".r
  private val DropRe =
    """(?is)\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*""".r
  private val ReplaceRe =
    """(?is)\s*ALTER\s+TABLE\s+(.+?)\s+REPLACE\s+PARTITION\s+FIELD\s+(.+?)\s+WITH\s+(.+?)\s*;?\s*""".r

  /** A bare column is identity partitioning (the Iceberg shorthand);
    * internal whitespace normalizes so `bucket(16, id)` parses. */
  private def transform(field: String): Versioned.Transform = {
    val s = field.replaceAll("\\s+", "")
    Versioned.Transform.parse(if (s.contains("(")) s else s"identity($s)")
  }

  /** Recognize a PARTITION FIELD statement; None = not ours. The table
    * ident parses through the DELEGATE parser so quoting rules
    * (`graft.`/abs/dir``) stay exactly Spark's. */
  def parse(sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] = sqlText match {
    case ReplaceRe(tbl, from, to) =>
      Some(AlterPartitionFieldCommand(delegate.parseMultipartIdentifier(tbl),
        expect = Some(transform(from)), next = Some(transform(to))))
    case AddRe(tbl, field) =>
      Some(AlterPartitionFieldCommand(delegate.parseMultipartIdentifier(tbl),
        expect = None, next = Some(transform(field))))
    case DropRe(tbl, field) =>
      Some(AlterPartitionFieldCommand(delegate.parseMultipartIdentifier(tbl),
        expect = Some(transform(field)), next = None))
    case _ => None
  }
}

private[plans] object GraftDdl {
  /** The shared identifier-resolution prelude of every graft DDL
    * command: `parts.head` names the catalog when it resolves as one,
    * else the statement targets the session's current catalog. */
  def catalogAndRest(spark: SparkSession, parts: Seq[String])
      : (org.apache.spark.sql.connector.catalog.CatalogPlugin,
        Seq[String]) = {
    val cm = spark.sessionState.catalogManager
    if (parts.length > 1 && Try(cm.catalog(parts.head)).isSuccess)
      (cm.catalog(parts.head), parts.tail)
    else (cm.currentCatalog, parts)
  }

  /** Resolve a multipart table ident to the graft table's directory
    * through the session's own catalog machinery (so `graft.db.t`,
    * `graft.`/abs/dir``, and current-catalog shorthand all resolve
    * exactly as reads do). */
  def tableDir(spark: SparkSession, parts: Seq[String],
      what: String): String = {
    val (cat, rest) = catalogAndRest(spark, parts)
    val tc = cat match {
      case t: TableCatalog => t
      case other => throw new UnsupportedOperationException(
        s"catalog ${other.name} cannot hold graft tables")
    }
    tc.loadTable(Identifier.of(rest.init.toArray, rest.last)) match {
      case g: GraftVersionedTable => g.tableDir
      case _ => throw new UnsupportedOperationException(
        s"$what needs a graft versioned table; " +
          s"${parts.mkString(".")} is not one")
    }
  }
}

/** `expect` = the field the statement names as CURRENT (DROP/REPLACE
  * verify it against the live spec); `next` = the spec after the commit
  * (None = unpartitioned). ADD is (expect=None, next=Some). */
case class AlterPartitionFieldCommand(parts: Seq[String],
    expect: Option[Versioned.Transform],
    next: Option[Versioned.Transform]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftDdl.tableDir(spark, parts,
      "ALTER TABLE … PARTITION FIELD")
    val cur = Versioned.currentTransform(spark, dir)
    val name = parts.mkString(".")
    (expect, next) match {
      case (None, Some(t)) => // ADD
        require(cur.isEmpty, s"table $name is already partitioned by " +
          s"${cur.get.render}; single-field specs — use REPLACE " +
          s"PARTITION FIELD ${cur.get.render} WITH ${t.render}, or " +
          "DROP it first")
        Versioned.setSpec(spark, dir, Some(t),
          note = Some(s"ALTER TABLE $name ADD PARTITION FIELD ${t.render}"))
      case (Some(f), None) => // DROP
        require(cur.contains(f), s"cannot DROP partition field " +
          s"${f.render}: table $name is partitioned by " +
          s"${cur.map(_.render).getOrElse("(nothing)")}")
        Versioned.setSpec(spark, dir, None,
          note = Some(s"ALTER TABLE $name DROP PARTITION FIELD ${f.render}"))
      case (Some(f), Some(t)) => // REPLACE
        require(cur.contains(f), s"cannot REPLACE partition field " +
          s"${f.render}: table $name is partitioned by " +
          s"${cur.map(_.render).getOrElse("(nothing)")}")
        Versioned.setSpec(spark, dir, Some(t),
          note = Some(s"ALTER TABLE $name REPLACE PARTITION FIELD " +
            s"${f.render} WITH ${t.render}"))
      case (None, None) =>
        throw new IllegalStateException("unreachable: parser emits no-op")
    }
    Seq.empty
  }
}

/** Delegating session parser for the engine's Iceberg-extension DDL:
  * PARTITION FIELD statements lower to [[AlterPartitionFieldCommand]],
  * branch/tag statements to [[RefDdl]]'s commands; every other string
  * — plans, expressions, identifiers, schemas — passes to Spark's
  * parser untouched (errors included, so diagnostics stay Spark's). */
case class GraftSqlParser(delegate: ParserInterface,
    session: SparkSession = null) extends ParserInterface {
  @throws[ParseException]
  override def parsePlan(sqlText: String): LogicalPlan =
    PartitionFieldDdl.parse(sqlText, delegate)
      .orElse(RefDdl.parse(sqlText, delegate))
      .orElse(WriteOrderDdl.parse(sqlText, delegate, session))
      .orElse(MvDdl.parse(sqlText, delegate))
      .getOrElse(delegate.parsePlan(sqlText))
  @throws[ParseException]
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  @throws[ParseException]
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  @throws[ParseException]
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  @throws[ParseException]
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  @throws[ParseException]
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  @throws[ParseException]
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  @throws[ParseException]
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  @throws[ParseException]
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
