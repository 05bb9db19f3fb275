package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one forked test JVM). */
object TestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftbridge.GraftExtensions")
    .config("spark.sql.catalog.graft",
      "org.apache.spark.sql.graftbridge.GraftCatalog")
    // fresh catalog root per test JVM — no cross-run table collisions
    .config("spark.sql.catalog.graft.root",
      java.nio.file.Files.createTempDirectory("graftcat").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSession.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
