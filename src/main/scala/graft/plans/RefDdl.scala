package graft.plans

import scala.util.Try

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sources.Versioned

/** The Iceberg branch/tag DDL spellings over the engine's named-ref
  * surface ([[Versioned.createBranch]]/[[Versioned.tag]] and their
  * drops — the same operations `CALL graft.system.create_branch` /
  * `create_tag` / `drop_branch` drive):
  *
  *   ALTER TABLE t CREATE BRANCH [IF NOT EXISTS] audit [AS OF VERSION 3]
  *   ALTER TABLE t CREATE [OR REPLACE] TAG golden [AS OF VERSION 3]
  *   ALTER TABLE t DROP BRANCH [IF EXISTS] audit
  *   ALTER TABLE t DROP TAG [IF EXISTS] golden
  *   VACUUM t [RETAIN n VERSIONS]
  *
  * Like PARTITION FIELD ([[PartitionFieldDdl]]) these are Iceberg
  * SQL-extension productions Spark's grammar does not know, so the
  * delegating parser recognizes them ahead of the delegate. Existence
  * semantics are Iceberg's: bare CREATE refuses an existing name
  * (the engine's tag() re-pins silently — the DDL adds the check),
  * OR REPLACE moves it, IF NOT EXISTS no-ops; bare DROP refuses a
  * missing name, IF EXISTS no-ops. */
object RefDdl {

  private val VacuumRe =
    ("(?is)\\s*VACUUM\\s+(.+?)" +
      "(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS)?\\s*;?\\s*").r

  private val CreateRe =
    ("(?is)\\s*ALTER\\s+TABLE\\s+(.+?)\\s+CREATE\\s+(OR\\s+REPLACE\\s+)?" +
      "(BRANCH|TAG)\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([A-Za-z0-9_\\-`]+)" +
      "(?:\\s+AS\\s+OF\\s+VERSION\\s+(\\d+))?\\s*;?\\s*").r
  private val DropRe =
    ("(?is)\\s*ALTER\\s+TABLE\\s+(.+?)\\s+DROP\\s+(BRANCH|TAG)\\s+" +
      "(IF\\s+EXISTS\\s+)?([A-Za-z0-9_\\-`]+)\\s*;?\\s*").r

  private def clean(name: String): String = name.replace("`", "")

  def parse(sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] = sqlText match {
    case CreateRe(tbl, orReplace, kind, ifNotExists, name, version) =>
      require(orReplace == null || ifNotExists == null,
        "CREATE OR REPLACE and IF NOT EXISTS cannot combine")
      Some(CreateRefCommand(delegate.parseMultipartIdentifier(tbl),
        branch = kind.equalsIgnoreCase("branch"), clean(name),
        version = Option(version).map(_.toInt),
        replace = orReplace != null, ifNotExists = ifNotExists != null))
    case DropRe(tbl, kind, ifExists, name) =>
      Some(DropRefCommand(delegate.parseMultipartIdentifier(tbl),
        branch = kind.equalsIgnoreCase("branch"), clean(name),
        ifExists = ifExists != null))
    case VacuumRe(tbl, keep) if !tbl.trim.exists(_.isWhitespace) =>
      // VACUUM is claimed by other lakehouse dialects too (Delta's
      // RETAIN n HOURS): yield to a delegate that can parse the
      // statement, and only intercept the graft spelling when it
      // cannot. The whitespace guard keeps a foreign clause tail
      // (swallowed into the lazy table group) from being misread as
      // our statement — it falls through to the delegate's error.
      Try(delegate.parsePlan(sqlText)).toOption.orElse(
        Some(VacuumCommand(delegate.parseMultipartIdentifier(tbl),
          keep = Option(keep).map(_.toInt).getOrElse(1))))
    case _ => None
  }
}

/** `VACUUM t [RETAIN n VERSIONS]` — the Delta-style spelling over
  * [[Versioned.vacuum]] (default: keep the newest unpinned snapshot
  * only, matching `CALL graft.system.vacuum`); tags, branch heads and
  * their linked files stay pinned regardless. Returns the retained
  * version count, like the procedure. */
case class VacuumCommand(parts: Seq[String], keep: Int)
    extends LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "retained_versions",
      org.apache.spark.sql.types.IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    require(keep >= 1, s"RETAIN must keep at least 1 version, got $keep")
    val dir = GraftDdl.tableDir(spark, parts, "VACUUM")
    Versioned.vacuum(spark, dir, keep = keep)
    Seq(Row(Versioned.versions(spark, dir).size))
  }
}

case class CreateRefCommand(parts: Seq[String], branch: Boolean,
    refName: String, version: Option[Int], replace: Boolean,
    ifNotExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val what = if (branch) "BRANCH" else "TAG"
    val dir = GraftDdl.tableDir(spark, parts, s"ALTER TABLE … $what")
    val exists =
      if (branch) Versioned.branches(spark, dir).contains(refName)
      else Versioned.tags(spark, dir).contains(refName)
    if (exists && ifNotExists) return Seq.empty
    if (exists && !replace) throw new IllegalStateException(
      s"$what '$refName' already exists on ${parts.mkString(".")} — " +
        s"CREATE OR REPLACE $what moves it, IF NOT EXISTS no-ops")
    if (branch) {
      // a branch name is a LINEAGE: replace = drop the old incarnation
      // (its unpublished commits stay generation-fenced) + fresh
      // create. Validate the anchor BEFORE the drop — a bad AS OF
      // VERSION must fail the statement, not destroy the branch it
      // was asked to move (the tag path validates inside tag()).
      version.foreach { v =>
        val vs = Versioned.versions(spark, dir)
        require(vs.contains(v),
          s"cannot branch at v=$v of ${parts.mkString(".")} " +
            s"(retained: ${vs.mkString(", ")})")
      }
      if (exists) Versioned.dropBranch(spark, dir, refName)
      Versioned.createBranch(spark, dir, refName, at = version)
    } else Versioned.tag(spark, dir, refName, version = version)
    Seq.empty
  }
}

case class DropRefCommand(parts: Seq[String], branch: Boolean,
    refName: String, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val what = if (branch) "BRANCH" else "TAG"
    val dir = GraftDdl.tableDir(spark, parts, s"ALTER TABLE … $what")
    val exists =
      if (branch) Versioned.branches(spark, dir).contains(refName)
      else Versioned.tags(spark, dir).contains(refName)
    if (!exists) {
      if (ifExists) return Seq.empty
      throw new IllegalArgumentException(
        s"$what '$refName' does not exist on ${parts.mkString(".")} — " +
          s"DROP $what IF EXISTS no-ops")
    }
    if (branch) Versioned.dropBranch(spark, dir, refName)
    else Versioned.dropTag(spark, dir, refName)
    Seq.empty
  }
}
