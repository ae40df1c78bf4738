package graft.tools

import java.nio.file.{Files, Paths}

import graft.{Sessions, SparkEntry}

/** Subset [[graft.Verify]] for local iteration: run only the named
  * queries (all when none given), dump each result parquet plus the
  * matching oracle_sql.json slice, ready for tools/compare_oracle.py.
  *
  *   sbt "runMain graft.tools.VerifyOne /root/testdata/sf0.01 /tmp/out q47_export_snapshot"
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: VerifyOne <sfDir> <outDir> [name...]")
    val (sfDir, outDir) = (args(0), args(1))
    val names = args.drop(2).toSet
    val spark = Sessions.get("graft-verify-one")
    new java.io.File(outDir).mkdirs()
    val picked = SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names(n) }
    picked.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify-one] $name failed: ${e.getMessage}")
        e.printStackTrace()
      } finally spark.catalog.clearCache()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (n, _) => names.isEmpty || names(n) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
