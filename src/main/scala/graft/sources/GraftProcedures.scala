package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Maintenance stored procedures — the Iceberg `CALL catalog.system.*`
  * surface (the reference's engines run `rewrite_data_files` /
  * `expire_snapshots` through exactly this SQL shape) over the
  * engine's table-maintenance API:
  *
  *   CALL graft.system.compact(table => '/dir')
  *   CALL graft.system.expire_snapshots(table => 'db.t',
  *        older_than => TIMESTAMP '2026-01-01 00:00:00')
  *   CALL graft.system.fast_forward(table => 'db.t', from => 'staging')
  *
  * Each procedure takes the table as its first argument (a `db.t` name
  * under the catalog root, or an absolute `/dir` path), executes ONE
  * engine call, and returns a single result row (the published version
  * or the retained-version count) through a driver-local scan — no
  * executor work beyond what the engine op itself schedules. The SQL
  * arguments ride Spark's own procedure binding (named `param => v`
  * or positional, defaults filled by the analyzer). */
object GraftProcedures {

  /** One procedure: unbound and bound in one object (static parameter
    * list — nothing to specialize at bind time; Spark's analyzer does
    * the name/position matching, default filling, and coercion against
    * [[parameters]]). */
  private final class Proc(procName: String, describe: String,
      params: Seq[ProcedureParameter], resultSchema: StructType,
      body: Seq[Any] => Seq[Any])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = describe
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val args: Seq[Any] = params.zipWithIndex.map { case (p, i) =>
        if (input.numFields <= i || input.isNullAt(i)) null
        else p.dataType() match {
          case StringType => input.getUTF8String(i).toString
          case IntegerType => input.getInt(i)
          case LongType | TimestampType => input.getLong(i)
          case DoubleType => input.getDouble(i)
          case BooleanType => input.getBoolean(i)
          case other => throw new IllegalStateException(
            s"unsupported procedure parameter type $other")
        }
      }
      val out = body(args)
      val row = InternalRow.fromSeq(out.map {
        case s: String => UTF8String.fromString(s)
        case x => x
      })
      util.Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = Array(row)
        override def readSchema(): StructType = resultSchema
      }).iterator()
    }
  }

  private def p(name: String, dt: DataType,
      default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  private def versionRow = StructType(Seq(
    StructField("version", IntegerType, nullable = false)))
  private def retainedRow = StructType(Seq(
    StructField("retained_versions", IntegerType, nullable = false)))

  private def spark: SparkSession = SparkSession.active

  /** All procedures, keyed by name under the `system` namespace.
    * `resolve` maps the SQL `table` argument to a directory (the
    * catalog's identifier mapping). */
  def load(name: String, resolve: String => String)
      : Option[UnboundProcedure] = {
    def dir(a: Any): String = {
      require(a != null, "the 'table' argument is required")
      resolve(a.asInstanceOf[String])
    }
    // -1 sentinel = "the table's write.target-file-size-bytes
    // property, else the 128 MB default" — a declared property drives
    // every maintenance rewrite unless the CALL overrides it
    def target(d: String, a: Any): Long = {
      val v = a.asInstanceOf[Int]
      if (v > 0) v * 1024L * 1024
      else Versioned.targetFileBytes(spark, d)
    }
    val mb = 1024L * 1024
    Option(name match {
      case "compact" => new Proc("compact",
        "rewrite the current snapshot into target-sized files " +
          "(default size: the write.target-file-size-bytes property, " +
          "else 128 MB)",
        Seq(p("table", StringType),
          p("target_file_mb", IntegerType, Some("-1"))),
        versionRow,
        a => {
          val d = dir(a(0))
          // CALL-driven maintenance keeps the table's layout: the
          // rewrite inherits the current hidden-transform spec
          Seq(Versioned.compact(spark, d,
            targetFileBytes = target(d, a(1)),
            transform = Versioned.currentTransform(spark, d)))
        })
      case "compact_small" => new Proc("compact_small",
        "binpack only files under the size floor; where_partition " +
          "(a hive segment, e.g. 'days_ts=2024-06-01') scopes the " +
          "sweep to one partition directory — the daily-maintenance " +
          "shape whose cost tracks the day, not the table",
        Seq(p("table", StringType),
          p("target_file_mb", IntegerType, Some("-1")),
          p("min_file_mb", IntegerType, Some("16")),
          p("where_partition", StringType, Some("''"))),
        versionRow,
        a => {
          val d = dir(a(0))
          val wp = Option(a(3)).map(_.asInstanceOf[String].trim)
            .filter(_.nonEmpty)
          Seq(Versioned.compactSmall(spark, d,
            targetFileBytes = target(d, a(1)),
            minFileBytes = a(2).asInstanceOf[Int] * mb,
            partitionWhere = wp))
        })
      case "compact_deletes" => new Proc("compact_deletes",
        "fold merge-on-read tombstones into the files they reach",
        Seq(p("table", StringType),
          p("min_delete_ratio", DoubleType, Some("0.0"))),
        versionRow,
        a => {
          val d = dir(a(0))
          Seq(Versioned.compactDeletes(spark, d,
            minDeleteRatio = a(1).asInstanceOf[Double],
            transform = Versioned.currentTransform(spark, d)))
        })
      case "vacuum" => new Proc("vacuum",
        "expire all but the newest N unpinned snapshots; dry_run " +
          "reports the would-be retained count, expiring nothing",
        Seq(p("table", StringType),
          p("keep", IntegerType, Some("1")),
          p("dry_run", BooleanType, Some("false"))),
        retainedRow,
        a => {
          val d = dir(a(0))
          val keep = a(1).asInstanceOf[Int]
          if (a(2).asInstanceOf[Boolean])
            Seq(Versioned.versions(spark, d).size -
              Versioned.vacuumCandidates(spark, d, keep).size)
          else {
            Versioned.vacuum(spark, d, keep)
            Seq(Versioned.versions(spark, d).size)
          }
        })
      case "expire_snapshots" => new Proc("expire_snapshots",
        "expire unpinned snapshots older than a timestamp",
        Seq(p("table", StringType),
          p("older_than", TimestampType),
          p("keep_min", IntegerType, Some("1"))),
        retainedRow,
        a => {
          val d = dir(a(0))
          require(a(1) != null, "'older_than' is required")
          Versioned.vacuumOlderThan(spark, d,
            olderThanMillis = Math.floorDiv(
              a(1).asInstanceOf[Long], 1000L),
            keepMin = a(2).asInstanceOf[Int])
          Seq(Versioned.versions(spark, d).size)
        })
      case "rollback" => new Proc("rollback",
        "republish an old snapshot as the new current version",
        Seq(p("table", StringType), p("version", IntegerType)),
        versionRow,
        a => {
          require(a(1) != null, "'version' is required")
          Seq(Versioned.rollback(spark, dir(a(0)),
            a(1).asInstanceOf[Int]))
        })
      case "create_tag" => new Proc("create_tag",
        "pin a named tag to a snapshot (default: current)",
        Seq(p("table", StringType), p("name", StringType),
          p("version", IntegerType, Some("-1"))),
        versionRow,
        a => Seq(Versioned.tag(spark, dir(a(0)),
          a(1).asInstanceOf[String],
          Some(a(2).asInstanceOf[Int]).filter(_ > 0))))
      case "create_branch" => new Proc("create_branch",
        "start a writable branch at a snapshot (default: current)",
        Seq(p("table", StringType), p("name", StringType),
          p("at", IntegerType, Some("-1"))),
        versionRow,
        a => Seq(Versioned.createBranch(spark, dir(a(0)),
          a(1).asInstanceOf[String],
          Some(a(2).asInstanceOf[Int]).filter(_ > 0))))
      case "fast_forward" => new Proc("fast_forward",
        "publish a branch's commits onto another (default: main)",
        Seq(p("table", StringType), p("from", StringType),
          p("to", StringType, Some("'main'"))),
        versionRow,
        a => Seq(Versioned.fastForward(spark, dir(a(0)),
          from = a(1).asInstanceOf[String],
          to = a(2).asInstanceOf[String])))
      case "set_spec" => new Proc("set_spec",
        "declare the default partition spec for future writes " +
          "('days(ts)', 'bucket(16,id)', 'identity(col)', … or " +
          "'none' to clear); existing files keep their layout",
        Seq(p("table", StringType), p("spec", StringType)),
        versionRow,
        a => {
          require(a(1) != null, "'spec' is required")
          val s = a(1).asInstanceOf[String].trim
          Seq(Versioned.setSpec(spark, dir(a(0)),
            if (s == "none") None
            else Some(Versioned.Transform.parse(s))))
        })
      case "rewrite_zorder" => new Proc("rewrite_zorder",
        "republish the snapshot z-order-clustered on two numeric " +
          "columns with both harvested into the stats sidecar, so 2-D " +
          "box queries prune at the manifest level",
        Seq(p("table", StringType), p("col_a", StringType),
          p("col_b", StringType),
          p("target_file_mb", IntegerType, Some("-1"))),
        versionRow,
        a => {
          require(a(1) != null && a(2) != null,
            "'col_a' and 'col_b' are required")
          val d = dir(a(0))
          Seq(Versioned.compactZOrder(spark, d,
            a(1).asInstanceOf[String], a(2).asInstanceOf[String],
            targetFileBytes = target(d, a(3))))
        })
      case "remove_orphan_files" => new Proc("remove_orphan_files",
        "sweep aged crash debris (loser stages, reclaim dirs, torn " +
          "tmp files) the commit protocol's self-healing never " +
          "revisits; never races a live commit",
        Seq(p("table", StringType),
          p("older_than_hours", IntegerType, Some("24")),
          p("dry_run", BooleanType, Some("false"))),
        StructType(Seq(StructField("orphans_removed", IntegerType,
          nullable = false))),
        a => {
          require(a(1) != null,
            "'older_than_hours' must not be NULL (omit it for 24h)")
          Seq(Versioned.removeOrphanFiles(spark, dir(a(0)),
            olderThanMillis = a(1).asInstanceOf[Int] * 3600L * 1000,
            dryRun = a(2).asInstanceOf[Boolean]))
        })
      case "collect_stats" => new Proc("collect_stats",
        "backfill stats sidecars for linked version roots missing " +
          "them (counts always; min/max for cols => 'a,b') — upgrades " +
          "legacy tables to O(versions) metadata queries and pruning " +
          "without rewriting data",
        Seq(p("table", StringType), p("cols", StringType, Some("''"))),
        StructType(Seq(StructField("roots_updated", IntegerType,
          nullable = false))),
        a => {
          val cols = Option(a(1)).map(_.asInstanceOf[String]).getOrElse("")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          Seq(Versioned.collectStats(spark, dir(a(0)), cols))
        })
      case "drop_branch" => new Proc("drop_branch",
        "delete a branch pin (its unpublished commits stay fenced)",
        Seq(p("table", StringType), p("name", StringType)),
        StructType(Seq(StructField("dropped", BooleanType,
          nullable = false))),
        a => {
          Versioned.dropBranch(spark, dir(a(0)),
            a(1).asInstanceOf[String])
          Seq(true)
        })
      case "add_files" => new Proc("add_files",
        "import pre-existing parquet files (file or directory " +
          "source_path, comma-separable) as one snapshot commit " +
          "without a rewrite — hardlinked on a local volume, copied " +
          "otherwise (copy_only => true forces the copy)",
        Seq(p("table", StringType), p("source_path", StringType),
          p("copy_only", BooleanType, Some("false"))),
        versionRow,
        a => {
          require(a(1) != null, "'source_path' is required")
          val srcs = a(1).asInstanceOf[String].split(",")
            .map(_.trim).filter(_.nonEmpty).toSeq
          // the same eager MV write guard as SQL DML: importing
          // foreign files into a view diverges it out-of-band, which
          // the next refresh would only catch as a corrupt pin
          DerivedTable.requireNotMv(spark, dir(a(0)),
            a(0).asInstanceOf[String], "CALL add_files into it")
          Seq(Versioned.importFiles(spark, dir(a(0)), srcs,
            note = Some(s"CALL add_files(${srcs.size} source(s))"),
            link = !a(2).asInstanceOf[Boolean]))
        })
      case "clone_table" => new Proc("clone_table",
        "clone a snapshot into an empty table (Delta CLONE analog): " +
          "data files hardlinked/copied via the export path — the " +
          "clone owns its bytes, the source vacuums freely; " +
          "properties and declared spec carry over",
        Seq(p("source", StringType), p("dest", StringType),
          p("version", IntegerType, Some("-1"))),
        versionRow,
        a => {
          require(a(1) != null, "'dest' is required")
          val ver = Option(a(2)).map(_.asInstanceOf[Int]).filter(_ > 0)
          Seq(Versioned.cloneTable(spark, dir(a(0)), dir(a(1)), ver))
        })
      case "create_changelog_view" => new Proc("create_changelog_view",
        "register the (from, to] row-level changelog as a temp view " +
          "(Iceberg's create_changelog_view): inserts and deletes " +
          "with _change_type/_commit_version metadata columns, " +
          "queryable by plain SQL",
        Seq(p("table", StringType),
          p("from_version", IntegerType),
          p("to_version", IntegerType, Some("-1")),
          p("view_name", StringType, Some("''"))),
        StructType(Seq(
          StructField("view_name", StringType, nullable = false),
          StructField("change_rows", LongType, nullable = false))),
        a => {
          val d = dir(a(0))
          require(a(1) != null, "'from_version' is required")
          val from = a(1).asInstanceOf[Int]
          val toRaw = a(2).asInstanceOf[Int]
          val to = if (toRaw > 0) toRaw
            else Versioned.currentVersion(spark, d)
          val named = a(3).asInstanceOf[String]
          val view = if (named != null && named.nonEmpty) named
            else {
              val base = new org.apache.hadoop.fs.Path(d).getName
                .replaceAll("[^A-Za-z0-9_]", "_")
              s"${base}_changes_${from}_$to"
            }
          val df = Versioned.readChanges(spark, d, from, to)
          df.createOrReplaceTempView(view)
          Seq(view, df.count())
        })
      case "refresh_derived" => new Proc("refresh_derived",
        "incrementally advance a derived table to query(source) — " +
          "'query' is SQL selecting FROM __source__ and must be " +
          "row-pure by 'key' (keys pass through; filtering allowed); " +
          "reads only the source commits since the destination's " +
          "pinned version and lands one atomic commit carrying the " +
          "new pin",
        Seq(p("source", StringType), p("dest", StringType),
          p("key", StringType), p("query", StringType)),
        StructType(Seq(
          StructField("from_version", IntegerType, nullable = false),
          StructField("to_version", IntegerType, nullable = false))),
        a => {
          require(a(1) != null, "'dest' is required")
          require(a(2) != null, "'key' is required")
          require(a(3) != null, "'query' is required")
          val q = a(3).asInstanceOf[String]
          require(q.contains("__source__"),
            "'query' must select FROM __source__ (the placeholder " +
              "the engine binds to the full source at bootstrap and " +
              "to the changed rows on incremental refreshes)")
          val t: org.apache.spark.sql.DataFrame =>
              org.apache.spark.sql.DataFrame = df => {
            val tag = java.util.UUID.randomUUID().toString
              .replace("-", "")
            val view = "__graft_refresh_src_" + tag
            // determinism gate over an EMPTY STUB of the source
            // schema: a rand()/uuid() in the query would re-sample
            // per refresh and silently diverge the derived table
            // (the CREATE MATERIALIZED VIEW contract, shared here)
            val stub = view + "_stub"
            DerivedTable.stubOf(spark, df.schema)
              .createOrReplaceTempView(stub)
            try DerivedTable.requireDeterministicOver(
              spark.sql(q.replace("__source__", stub)), q)
            finally spark.catalog.dropTempView(stub)
            df.createOrReplaceTempView(view)
            // spark.sql resolves the view at ANALYSIS, so the view is
            // inlined into the returned plan and can drop immediately
            try spark.sql(q.replace("__source__", view))
            finally spark.catalog.dropTempView(view)
          }
          val (from, to) = DerivedTable.refresh(spark, dir(a(0)),
            dir(a(1)), a(2).asInstanceOf[String], t)
          Seq(from, to)
        })
      case "refresh_agg" => new Proc("refresh_agg",
        "incrementally advance an AGGREGATE view — dest holds " +
          "SELECT group_by, sum(value), count(value), count(*) FROM " +
          "source GROUP BY group_by, maintained by algebraic deltas: " +
          "touched rows diffed between the pinned snapshots via " +
          "point-set pruned reads, groups patched in place, one " +
          "atomic commit carrying the new pin; optional measure " +
          "families: extrema (min/max csv), distinct (HLL " +
          "approx-distinct csv), exact_distinct (count(DISTINCT) " +
          "csv — affected-group recompute), kll (quantile-sketch csv)",
        Seq(p("source", StringType), p("dest", StringType),
          p("row_key", StringType), p("group_by", StringType),
          p("value", StringType),
          p("extrema", StringType, Some("''")),
          p("where", StringType, Some("''")),
          p("group_exprs", StringType, Some("''")),
          p("with_avg", StringType, Some("'false'")),
          p("distinct", StringType, Some("''")),
          p("exact_distinct", StringType, Some("''")),
          p("kll", StringType, Some("''"))),
        StructType(Seq(
          StructField("from_version", IntegerType, nullable = false),
          StructField("to_version", IntegerType, nullable = false))),
        a => {
          require(a(1) != null, "'dest' is required")
          require(a(2) != null, "'row_key' is required")
          require(a(3) != null, "'group_by' is required")
          require(a(4) != null, "'value' is required")
          val ext = Option(a(5)).map(_.asInstanceOf[String]).toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
          // group_by accepts a csv: multi-column groups are
          // first-class in the refreshAgg algebra. group_exprs are
          // `;`-separated bucket-expression texts aligned
          // POSITIONALLY with group_by ('' = bare column), the
          // expression-group-key spelling (GROUP BY date_trunc…)
          val groups = a(3).asInstanceOf[String].split(",")
            .map(_.trim).filter(_.nonEmpty).toSeq
          val exprTexts = Option(a(7)).map(_.asInstanceOf[String])
            .filter(_.nonEmpty).map(_.split(";", -1).map(_.trim).toSeq)
            .getOrElse(Nil)
          require(exprTexts.isEmpty ||
            exprTexts.length == groups.length,
            s"'group_exprs' has ${exprTexts.length} entries but " +
              s"'group_by' names ${groups.length} columns — align " +
              "them positionally ('' for a bare column)")
          val gExprs = groups.zip(exprTexts).collect {
            case (g, t) if t.nonEmpty => (g, t) }
          // value accepts a csv (multi-measure views); with_avg is
          // 'true' (avg of the first value), 'false', or a csv of
          // value columns
          val vals = a(4).asInstanceOf[String].split(",")
            .map(_.trim).filter(_.nonEmpty).toSeq
          val avgs = Option(a(8)).map(_.asInstanceOf[String])
            .map(_.trim).filter(_.nonEmpty).toSeq.flatMap {
              case t if t.equalsIgnoreCase("true") => Seq(vals.head)
              case t if t.equalsIgnoreCase("false") => Nil
              case t => t.split(",").map(_.trim)
                .filter(_.nonEmpty).toSeq
            }
          // the measure-family csvs the MV DDL shapes also take:
          // 'distinct' = approx_count_distinct (HLL sketch columns),
          // 'exact_distinct' = count(DISTINCT) via affected-group
          // recompute, 'kll' = quantile-sketch columns
          def csvAt(i: Int) = Option(a(i))
            .map(_.asInstanceOf[String]).toSeq.flatMap(_.split(","))
            .map(_.trim).filter(_.nonEmpty)
          // value accepts '' — the COUNT-ONLY rollup (no sum/cnt
          // pair; the destination stores groups + n_rows)
          val (from, to) = DerivedTable.refreshAgg(spark, dir(a(0)),
            dir(a(1)), a(2).asInstanceOf[String],
            groups, vals.headOption.getOrElse(""),
            extrema = ext,
            where = Option(a(6)).map(_.asInstanceOf[String])
              .filter(_.nonEmpty),
            groupExprs = gExprs,
            moreValues = vals.drop(1), avgCols = avgs,
            distinctCols = csvAt(9), exactDistinctCols = csvAt(10),
            kllCols = csvAt(11))
          Seq(from, to)
        })
      case "refresh_join" => new Proc("refresh_join",
        "incrementally advance a JOIN view — dest holds " +
          "query(fact, dim) keyed by the fact row identity 'key' " +
          "('query' selects FROM __fact__ JOIN __dim__), maintained " +
          "from BOTH changelogs: fact events name touched keys, dim " +
          "events locate affected fact rows through the fk point " +
          "read, the union re-derives against the pinned dim; one " +
          "atomic commit carries both pins (src=vN;dim=vM)",
        Seq(p("fact", StringType), p("dim", StringType),
          p("dest", StringType), p("key", StringType),
          p("fk", StringType), p("dim_key", StringType),
          p("query", StringType)),
        StructType(Seq(
          StructField("fact_from", IntegerType, nullable = false),
          StructField("fact_to", IntegerType, nullable = false),
          StructField("dim_from", IntegerType, nullable = false),
          StructField("dim_to", IntegerType, nullable = false))),
        a => {
          Seq(("fact", 0), ("dim", 1), ("dest", 2), ("key", 3),
            ("fk", 4), ("dim_key", 5), ("query", 6))
            .foreach { case (n, i) =>
              require(a(i) != null, s"'$n' is required") }
          val q = a(6).asInstanceOf[String]
          require(q.contains("__fact__") && q.contains("__dim__"),
            "'query' must select FROM __fact__ JOIN __dim__ (the " +
              "placeholders the engine binds to the touched fact " +
              "slice and the pinned dim snapshot at each refresh)")
          val t: (org.apache.spark.sql.DataFrame,
              org.apache.spark.sql.DataFrame) =>
              org.apache.spark.sql.DataFrame = (fdf, ddf) => {
            val tag = java.util.UUID.randomUUID().toString
              .replace("-", "")
            val fv = "__graft_refresh_fact_" + tag
            val dv = "__graft_refresh_dim_" + tag
            // determinism gate over EMPTY STUBS (see refresh_derived)
            DerivedTable.stubOf(spark, fdf.schema)
              .createOrReplaceTempView(fv + "_stub")
            DerivedTable.stubOf(spark, ddf.schema)
              .createOrReplaceTempView(dv + "_stub")
            try DerivedTable.requireDeterministicOver(
              spark.sql(q.replace("__fact__", fv + "_stub")
                .replace("__dim__", dv + "_stub")), q)
            finally {
              spark.catalog.dropTempView(fv + "_stub")
              spark.catalog.dropTempView(dv + "_stub")
            }
            fdf.createOrReplaceTempView(fv)
            ddf.createOrReplaceTempView(dv)
            // spark.sql resolves the views at ANALYSIS, so they are
            // inlined into the returned plan and can drop immediately
            try spark.sql(q.replace("__fact__", fv)
              .replace("__dim__", dv))
            finally {
              spark.catalog.dropTempView(fv)
              spark.catalog.dropTempView(dv)
            }
          }
          // fk / dim_key accept a csv: composite join keys are
          // first-class in the refreshJoinKeys algebra
          def csv(v: Any) = v.asInstanceOf[String].split(",")
            .map(_.trim).filter(_.nonEmpty).toSeq
          val ((f1, t1), (f2, t2)) = DerivedTable.refreshJoinKeys(spark,
            dir(a(0)), dir(a(1)), dir(a(2)),
            a(3).asInstanceOf[String], csv(a(4)), csv(a(5)), t)
          Seq(f1, t1, f2, t2)
        })
      case "ingest_dedup" => new Proc("ingest_dedup",
        "the crawl-ingest loop from SQL: dedup the batch table's " +
          "(doc_id, text) rows against the persisted MinHash-LSH " +
          "dedup index at 'index', append the survivors, return the " +
          "kept/dropped counts — one sketch pass, replay-safe " +
          "(already-indexed ids refuse; allow_reingest => 'true' " +
          "keeps them by identity instead, the idempotent-retry mode)",
        Seq(p("index", StringType), p("batch", StringType),
          p("min_jaccard", StringType, Some("'0.5'")),
          p("allow_reingest", StringType, Some("'false'"))),
        StructType(Seq(
          StructField("kept", LongType, nullable = false),
          StructField("dropped", LongType, nullable = false))),
        a => {
          require(a(1) != null, "'batch' is required")
          val minJ = Option(a(2)).map(_.asInstanceOf[String])
            .filter(_.nonEmpty).map(_.toDouble).getOrElse(0.5)
          val re = Option(a(3)).map(_.asInstanceOf[String])
            .exists(_.trim.equalsIgnoreCase("true"))
          val batch = Versioned.read(spark, dir(a(1)))
            .select(org.apache.spark.sql.functions.col("doc_id"),
              org.apache.spark.sql.functions.col("text"))
          val verdict = graft.operators.Dedup.ingestDedup(spark,
            batch, dir(a(0)), minJ, allowReingest = re)
          val counts = verdict.groupBy("kept").count().collect()
            .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
          Seq(counts.getOrElse(true, 0L), counts.getOrElse(false, 0L))
        })
      case "ingest_vectors" => new Proc("ingest_vectors",
        "the vector crawl-ingest loop from SQL: near-dup the batch " +
          "table's (vec_id, embedding) rows against the persisted " +
          "int8/float IVF index at 'index' (SemDeDup-style " +
          "multi-probe), append the survivors at the pinned centroid " +
          "generation, return the kept/dropped counts — replay-safe " +
          "(already-ingested ids drop by identity)",
        Seq(p("index", StringType), p("batch", StringType),
          p("min_cosine", StringType, Some("'0.98'"))),
        StructType(Seq(
          StructField("kept", LongType, nullable = false),
          StructField("dropped", LongType, nullable = false))),
        a => {
          require(a(1) != null, "'batch' is required")
          val minCos = Option(a(2)).map(_.asInstanceOf[String])
            .filter(_.nonEmpty).map(_.toDouble).getOrElse(0.98)
          val batch = Versioned.read(spark, dir(a(1)))
            .select(org.apache.spark.sql.functions.col("vec_id"),
              org.apache.spark.sql.functions.col("embedding"))
          val verdict = graft.operators.Similarity.ingestDedupVectors(
            spark, batch, dir(a(0)), minCos)
          val counts = verdict.groupBy("kept").count().collect()
            .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
          Seq(counts.getOrElse(true, 0L), counts.getOrElse(false, 0L))
        })
      case "refresh_mv" => new Proc("refresh_mv",
        "argument-free refresh of a CREATE MATERIALIZED VIEW table: " +
          "reads the spec (kind, source, key, query) back from the " +
          "view's own properties and dispatches to the derived, " +
          "aggregate, or join delta-maintenance path; cascade => " +
          "'true' refreshes stale upstream views first (upstream-" +
          "first is the only order that clears transitive staleness " +
          "in a bronze→silver→gold chain)",
        Seq(p("view", StringType),
          p("cascade", StringType, Some("'false'"))),
        StructType(Seq(
          StructField("kind", StringType, nullable = false),
          StructField("from_version", IntegerType, nullable = false),
          StructField("to_version", IntegerType, nullable = false))),
        a => {
          val casc = Option(a(1)).map(_.asInstanceOf[String])
            .exists(_.trim.equalsIgnoreCase("true"))
          val (kind, from, to) = DerivedTable.refreshMv(spark,
            dir(a(0)), cascade = casc)
          Seq(kind, from, to)
        })
      case "follow_mv" => new Proc("follow_mv",
        "CONTINUOUS maintenance: start a follower that refreshes " +
          "the view (cascading through upstream views) whenever a " +
          "source commits — exactly-once by the pin protocol, no " +
          "checkpoint to manage. DURABLE: the interval persists in " +
          "graft.mv.follow, so any later session's first read of " +
          "the view re-arms the follower; stop it (and unset the " +
          "property) with unfollow_mv",
        Seq(p("view", StringType),
          p("poll_interval_ms", IntegerType, Some("1000"))),
        StructType(Seq(
          StructField("following", StringType, nullable = false))),
        a => {
          val iv = Option(a(1)).map(_.asInstanceOf[Int]).getOrElse(1000)
          require(iv > 0, s"poll_interval_ms must be > 0, got $iv")
          val d = dir(a(0))
          require(!graft.streaming.MvFollower.following().contains(d),
            s"a follower is already running on $d — unfollow first")
          // persist FIRST: a crash between the property commit and
          // the arm still re-arms at the next read — the reverse
          // order could follow for this session only and silently
          // stop at restart
          Versioned.setProperties(spark, d, set =
            Map(graft.sources.DerivedTable.MvFollowProp ->
              iv.toString))
          graft.streaming.MvFollower.ensureFollowing(spark, d,
            iv.toLong)
          Seq(d)
        })
      case "unfollow_mv" => new Proc("unfollow_mv",
        "stop the follow_mv loop on a view (drains the in-flight " +
          "refresh; surfaces its last recorded failure) and unset " +
          "the durable graft.mv.follow property so no later session " +
          "re-arms it",
        Seq(p("view", StringType)),
        StructType(Seq(
          StructField("was_following", BooleanType, nullable = false))),
        a => {
          val d = dir(a(0))
          // unset BEFORE stopping: a concurrent read between stop
          // and unset would re-arm the very follower being stopped
          if (Versioned.properties(spark, d)
              .contains(graft.sources.DerivedTable.MvFollowProp))
            Versioned.setProperties(spark, d, unset =
              Seq(graft.sources.DerivedTable.MvFollowProp))
          Seq(graft.streaming.MvFollower.unfollow(d))
        })
      case "enable_rewrite" => new Proc("enable_rewrite",
        "register an aggregate materialized view for AUTOMATIC QUERY " +
          "REWRITE: matching GROUP BY queries over its source serve " +
          "from the view whenever the view's pin equals the scanned " +
          "snapshot (result-identical, or the scan proceeds " +
          "unchanged). Stamps graft.mv.rewrite on the view and " +
          "records the view in the SOURCE's graft.rewrite.views — " +
          "the materialized-view-log discipline, so any session " +
          "discovers the registration from the source's own " +
          "metadata. max_staleness_versions > 0 opts into serving " +
          "while the view lags the scanned snapshot by up to that " +
          "many source versions (the stale_tolerated trade; the " +
          "default 0 keeps the exact pin-equality contract)",
        Seq(p("view", StringType),
          p("max_staleness_versions", IntegerType, Some("0"))),
        StructType(Seq(
          StructField("source", StringType, nullable = false))),
        a => {
          val d = dir(a(0))
          val stale = Option(a(1)).map(_.asInstanceOf[Int])
            .getOrElse(0)
          require(stale >= 0,
            s"max_staleness_versions must be >= 0, got $stale")
          val props = Versioned.properties(spark, d)
          require(props.get(graft.sources.DerivedTable.MvKindProp)
              .contains("agg"),
            s"$d is not a single-source aggregate materialized view " +
              "— query rewrite serves GROUP BY rollups from " +
              "kind=agg views only")
          val src = props(graft.sources.DerivedTable.MvSourceProp)
          Versioned.setProperties(spark, d, set =
            Map(graft.plans.MvRewriteRule.RewriteProp -> "true") ++
              (if (stale > 0)
                Map(graft.plans.MvRewriteRule.RewriteStaleProp ->
                  stale.toString)
               else Map.empty))
          val cur = Versioned.properties(spark, src)
            .get(graft.plans.MvRewriteRule.SourceViewsProp)
            .map(_.split(";").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(Nil)
          if (!cur.contains(d))
            Versioned.setProperties(spark, src, set =
              Map(graft.plans.MvRewriteRule.SourceViewsProp ->
                (cur :+ d).mkString(";")))
          // the pointer property is itself a SOURCE commit, which
          // stales every view pinned below it — refresh the view
          // being registered so its rewrite serves immediately (a
          // net-zero window: the pin advances note-only). Any LATER
          // metadata-only source commit pauses rewrites the same
          // way until the next refresh — the pin equality is the
          // whole correctness argument, so it stays exact.
          graft.sources.DerivedTable.refreshMv(spark, d)
          graft.plans.MvRewriteRule.invalidate()
          Seq(src)
        })
      case "disable_rewrite" => new Proc("disable_rewrite",
        "deregister a view from automatic query rewrite: removes it " +
          "from the source's graft.rewrite.views and unsets the " +
          "view's graft.mv.rewrite mark",
        Seq(p("view", StringType)),
        StructType(Seq(
          StructField("was_enabled", BooleanType, nullable = false))),
        a => {
          val d = dir(a(0))
          val props = Versioned.properties(spark, d)
          val was = props.get(graft.plans.MvRewriteRule.RewriteProp)
            .exists(_.trim.equalsIgnoreCase("true"))
          props.get(graft.sources.DerivedTable.MvSourceProp)
            .foreach { src =>
              val cur = Versioned.properties(spark, src)
                .get(graft.plans.MvRewriteRule.SourceViewsProp)
                .map(_.split(";").map(_.trim).filter(_.nonEmpty)
                  .toSeq).getOrElse(Nil)
              if (cur.contains(d)) {
                val left = cur.filterNot(_ == d)
                if (left.isEmpty)
                  Versioned.setProperties(spark, src, unset =
                    Seq(graft.plans.MvRewriteRule.SourceViewsProp))
                else
                  Versioned.setProperties(spark, src, set =
                    Map(graft.plans.MvRewriteRule.SourceViewsProp ->
                      left.mkString(";")))
              }
            }
          if (was)
            Versioned.setProperties(spark, d, unset =
              Seq(graft.plans.MvRewriteRule.RewriteProp,
                graft.plans.MvRewriteRule.RewriteStaleProp))
          graft.plans.MvRewriteRule.invalidate()
          Seq(java.lang.Boolean.valueOf(was))
        })
      case _ => null
    })
  }

  val names: Seq[String] = Seq("compact", "compact_small",
    "compact_deletes", "vacuum", "expire_snapshots", "rollback",
    "create_tag", "create_branch", "fast_forward", "drop_branch",
    "set_spec", "collect_stats", "rewrite_zorder",
    "remove_orphan_files", "create_changelog_view", "add_files",
    "clone_table", "refresh_derived", "refresh_agg", "refresh_join",
    "refresh_mv", "follow_mv", "unfollow_mv",
    "enable_rewrite", "disable_rewrite",
    "ingest_dedup", "ingest_vectors")
}
