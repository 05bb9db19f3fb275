package graft

import org.apache.spark.sql.functions._

/** Round-13: ADVICE fixes — mp4 box-size overflow, case-insensitive
  * column-DDL uniqueness, list-separator column-name guards, atomic
  * multi-change ALTER TABLE. */
class HostileMp4OverflowSpec extends SparkSpec {
  import graft.operators.Multimodal
  import spark.implicits._

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)

  test("a POSITIVE largesize that wraps p + sz past Long.MaxValue degrades to unknown") {
    val ftypBody = "isom".getBytes ++ be32(0) ++ "isom".getBytes
    val okFtyp = be32(8L + ftypBody.length) ++ "ftyp".getBytes ++ ftypBody
    // after okFtyp the walk sits at p = okFtyp.length > 0; a largesize
    // of Long.MaxValue - 8 is positive (passes any `sz < hdr` check)
    // but p + sz wraps negative — the unfixed `p + sz > to` bound
    // let it through and the next iteration indexed a negative offset
    val wrap = okFtyp ++ be32(1L) ++ "mdat".getBytes ++
      be64(Long.MaxValue - 8L) ++ Array.fill[Byte](16)(0)
    // the same trap one level down: moov child with a wrapping largesize
    val wrapChild = okFtyp ++ be32(40L) ++ "moov".getBytes ++
      be32(1L) ++ "trak".getBytes ++ be64(Long.MaxValue - 16L) ++
      Array.fill[Byte](16)(0)
    val out = Multimodal.mp4Meta(
      Seq((1L, wrap), (2L, wrapChild)).toDF("id", "bin"), "id", "bin")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unknown", 2L -> "unknown"),
      s"wrapping largesizes must abort to unknown, got $out")
  }
}

class ColumnDdlGuardSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vddl").toFile
    d.delete(); d.getAbsolutePath
  }

  test("rename/add uniqueness is case-insensitive (Spark SQL resolution is)") {
    val root = freshRoot()
    VersionedTable.commit(
      (0L until 8L).map(i => (i, i * 2L)).toDF("id", "p"), root)
    // RENAME p TO `ID` would commit a schema SQL can never address
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "p", "ID")
    }
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.addColumn(spark, root, "Id",
        org.apache.spark.sql.types.LongType)
    }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    // but a case-only rename of the SAME column is legal
    VersionedTable.renameColumn(spark, root, "p", "P")
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("id", "P"))
    // and the physical slot of a renamed column stays guarded
    // case-insensitively too
    VersionedTable.renameColumn(spark, root, "P", "price")
    val e3 = intercept[IllegalArgumentException] {
      VersionedTable.addColumn(spark, root, "p",
        org.apache.spark.sql.types.LongType)
    }
    assert(e3.getMessage.contains("collision"), e3.getMessage)
  }

  test("column names with ',' or '=' are rejected before they corrupt manifest lists") {
    val root = freshRoot()
    VersionedTable.commit(
      (0L until 8L).map(i => (i, i * 2L)).toDF("id", "p"), root)
    for (bad <- Seq("a,b", "a=b", "", "a\tb")) {
      intercept[IllegalArgumentException] {
        VersionedTable.renameColumn(spark, root, "p", bad)
      }
      intercept[IllegalArgumentException] {
        VersionedTable.addColumn(spark, root, bad,
          org.apache.spark.sql.types.LongType)
      }
    }
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("id", "p"),
      "rejected DDL must leave the schema untouched")
  }

  test("one ALTER TABLE statement is all-or-nothing (single metadata commit)") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.at13")
    spark.sql("CREATE TABLE graft.at13 AS SELECT id AS k, id * 2 AS p FROM range(10)")
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
    val root = cat.tableDir(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "at13"))
    val v0 = VersionedTable.currentVersion(spark, root)
    // two adds in one statement → exactly ONE new version
    spark.sql("ALTER TABLE graft.at13 ADD COLUMNS (x BIGINT, y BIGINT)")
    assert(VersionedTable.currentVersion(spark, root) == v0 + 1,
      "a multi-change ALTER must publish as one commit")
    assert(spark.table("graft.at13").columns.toSeq == Seq("k", "p", "x", "y"))
    // a failing change aborts the WHOLE statement: z must not appear
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.at13 ADD COLUMNS (z BIGINT, p BIGINT)")
    }
    assert(VersionedTable.currentVersion(spark, root) == v0 + 1,
      "a failed ALTER must commit nothing")
    assert(spark.table("graft.at13").columns.toSeq == Seq("k", "p", "x", "y"),
      "half-applied ALTER observed")
    spark.sql("DROP TABLE graft.at13")
  }
}
