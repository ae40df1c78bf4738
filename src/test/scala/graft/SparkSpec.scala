package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + fixture paths for all suites (one JVM-wide session
  * via getOrCreate; suites must not stop it). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.get("graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
