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

/** Round-13: the SQL maintenance + CDC surface — DSv2 stored
  * procedures (`CALL graft.optimize/compact_small/vacuum/restore/
  * shard_manifest`) and the `vt_changes` table function, all usable
  * by a SQL-only client against catalog identifiers. */
class SqlMaintenanceSpec extends SparkSpec {
  import graft.sources.VersionedTable
  import org.apache.spark.sql.connector.catalog.Identifier

  private def rootOf(name: String): String =
    spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
      .tableDir(Identifier.of(Array.empty[String], name))

  test("CALL optimize clusters + stats; a selective SQL read then prunes files") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.mt")
    spark.sql("CREATE TABLE graft.mt AS " +
      "SELECT /*+ REPARTITION(16) */ id % 97 AS k, id AS v FROM range(5000)")
    val root = rootOf("mt")
    // scattered layout: a k-range read keeps ~every file
    val (kept0, total0) = VersionedTable.prunedFiles(spark, root, "k", "10", "12")
    assert(total0 >= 8, s"need a multi-file table, got $total0")
    val ver = spark.sql("CALL graft.optimize('mt', 'k', 8, 8)")
      .head().getLong(0)
    assert(ver == VersionedTable.currentVersion(spark, root))
    val (kept1, total1) = VersionedTable.prunedFiles(spark, root, "k", "10", "12")
    assert(kept1.size * 2 < total1,
      s"post-optimize selective read must open a strict minority: " +
        s"${kept1.size} of $total1 (was ${kept0.size} of $total0)")
    // the pruned read is reachable from pure SQL too
    val n = spark.sql(s"SELECT count(*) FROM vt_read_range('mt', 'k', '10', '12')")
      .head().getLong(0)
    assert(n == spark.sql("SELECT count(*) FROM graft.mt WHERE k BETWEEN 10 AND 12")
      .head().getLong(0))
  }

  test("vt_changes reads the change feed by catalog ident; restore rolls back as a new commit") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.cdc")
    spark.sql("CREATE TABLE graft.cdc AS SELECT id AS k, id * 2 AS p FROM range(100)")
    spark.sql("INSERT INTO graft.cdc SELECT id, id * 2 FROM range(100, 130)")
    spark.sql("DELETE FROM graft.cdc WHERE k % 10 = 7")
    // v1 empty, v2 CTAS, v3 insert, v4 DV delete
    val ins = spark.sql(
      "SELECT _change_type, count(*) AS n FROM vt_changes('cdc', 2, 3) GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ins == Map("insert" -> 30L), s"v2->v3 must be the 30 inserts: $ins")
    val del = spark.sql(
      "SELECT _change_type, count(*) AS n FROM vt_changes('cdc', 3, 4) GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(del == Map("delete" -> 13L), s"v3->v4 must be the 13 DV deletes: $del")
    // restore to the pre-delete state — a NEW commit, old reads intact
    val v = spark.sql("CALL graft.restore('cdc', 3)").head().getLong(0)
    assert(v == 5L)
    assert(spark.sql("SELECT count(*) FROM graft.cdc").head().getLong(0) == 130L)
    assert(spark.sql("SELECT count(*) FROM graft.cdc VERSION AS OF 4")
      .head().getLong(0) == 117L, "the rolled-back era must stay readable")
    spark.sql("DROP TABLE graft.cdc")
  }

  test("CALL vacuum honors retention: time travel inside the window survives, outside dies") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.vac")
    spark.sql("CREATE TABLE graft.vac AS SELECT id AS k FROM range(50)")
    spark.sql("INSERT OVERWRITE graft.vac SELECT id FROM range(60)")
    spark.sql("INSERT OVERWRITE graft.vac SELECT id FROM range(70)")
    val root = rootOf("vac")
    // retain the last 2 versions; grace 0 so the test sees deletions
    val deleted = spark.sql("CALL graft.vacuum('vac', 2, 0)")
      .head().getInt(0)
    assert(deleted > 0, "the overwritten v2 files must be collected")
    assert(spark.sql("SELECT count(*) FROM graft.vac VERSION AS OF 3")
      .head().getLong(0) == 60L, "inside the retention window")
    intercept[Exception] {
      spark.sql("SELECT count(*) FROM graft.vac VERSION AS OF 2").collect()
    }
    assert(spark.sql("SELECT count(*) FROM graft.vac").head().getLong(0) == 70L)
    spark.sql("DROP TABLE graft.vac")
  }

  test("maintenance races a writer under OCC: optimize + INSERT both land") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.mocc")
    spark.sql("CREATE TABLE graft.mocc AS " +
      "SELECT id % 31 AS k, id AS v FROM range(2000) DISTRIBUTE BY id % 8")
    val f1 = Future(spark.sql("CALL graft.optimize('mocc', 'k', 8, 4)"))
    val f2 = Future(spark.sql(
      "INSERT INTO graft.mocc SELECT 1000 + id, id FROM range(5)"))
    Await.result(Future.sequence(Seq(f1, f2)), 120.seconds)
    // whichever order the commits serialized in, nothing is lost
    assert(spark.sql("SELECT count(*) FROM graft.mocc").head().getLong(0) == 2005L)
    assert(spark.sql("SELECT count(*) FROM graft.mocc WHERE k >= 1000")
      .head().getLong(0) == 5L)
    spark.sql("DROP TABLE graft.mocc")
  }

  test("CALL compact_small folds the append frontier from pure SQL") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.cs")
    spark.sql("CREATE TABLE graft.cs (k BIGINT)")
    for (i <- 0 until 4)
      spark.sql(s"INSERT INTO graft.cs SELECT id + ${i * 10} FROM range(10)")
    val root = rootOf("cs")
    val before = VersionedTable.snapshot(spark, root).files.size
    val v = spark.sql("CALL graft.compact_small('cs')").head().getLong(0)
    assert(v == VersionedTable.currentVersion(spark, root))
    val after = VersionedTable.snapshot(spark, root).files.size
    assert(after < before, s"small files must fold: $before -> $after")
    assert(spark.sql("SELECT count(*) FROM graft.cs").head().getLong(0) == 40L)
    spark.sql("DROP TABLE graft.cs")
  }
}

/** Round-13: CREATE TABLE with a declared clustered layout — the
  * `clustering` table property routes EVERY catalog write through the
  * interleave sink, so a SQL-created table is prunable from its first
  * inserted row, and the declared layout survives appends, renames
  * and drops. */
class ClusteredCreateTableSpec extends SparkSpec {
  import graft.sources.VersionedTable
  import org.apache.spark.sql.connector.catalog.Identifier

  private def rootOf(name: String): String =
    spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
      .tableDir(Identifier.of(Array.empty[String], name))

  test("a CTAS with clustering='k' is born prunable; appends stay clustered") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.born")
    spark.sql("""CREATE TABLE graft.born TBLPROPERTIES ('clustering' = 'k')
      AS SELECT /*+ REPARTITION(16) */ id % 997 AS k, id AS v
      FROM range(20000)""")
    val root = rootOf("born")
    val (kept, total) = VersionedTable.prunedFiles(spark, root, "k", "100", "120")
    assert(total >= 3, s"need a multi-file table, got $total")
    assert(kept.size * 2 < total,
      s"a selective read on a BORN-clustered table must open a strict " +
        s"minority of files: ${kept.size} of $total")
    assert(spark.sql(
      "SELECT count(*) FROM vt_read_range('born', 'k', '100', '120')")
      .head().getLong(0) ==
      spark.sql("SELECT count(*) FROM graft.born WHERE k BETWEEN 100 AND 120")
        .head().getLong(0))
    // an APPEND through the catalog routes through the same sink:
    // the new commit's files are key-disjoint too, so the selective
    // read still prunes across both commits
    spark.sql("INSERT INTO graft.born " +
      "SELECT /*+ REPARTITION(16) */ id % 997, id FROM range(20000, 40000)")
    val (kept2, total2) = VersionedTable.prunedFiles(spark, root, "k", "100", "120")
    assert(total2 > total, "append must add files")
    assert(kept2.size * 2 < total2,
      s"appends must stay clustered: ${kept2.size} of $total2")
    spark.sql("DROP TABLE graft.born")
  }

  test("the declared layout follows renames and leaves on drop") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.cl2")
    spark.sql("""CREATE TABLE graft.cl2 TBLPROPERTIES ('clustering' = 'k')
      AS SELECT id % 97 AS k, id AS v FROM range(2000)""")
    val root = rootOf("cl2")
    spark.sql("ALTER TABLE graft.cl2 RENAME COLUMN k TO kk")
    assert(VersionedTable.manifestMeta(spark, root).get("clustering")
      .contains("kk"), "clustering must follow the rename")
    // an append under the new name still clusters (logical name)
    spark.sql("INSERT INTO graft.cl2 SELECT id % 97, id FROM range(2000, 4000)")
    assert(VersionedTable.manifestMeta(spark, root).get("clustering")
      .contains("kk"), "clustering must survive the append")
    spark.sql("ALTER TABLE graft.cl2 DROP COLUMN kk")
    assert(VersionedTable.manifestMeta(spark, root).get("clustering").isEmpty,
      "dropping the cluster column must clear the declared layout")
    spark.sql("DROP TABLE graft.cl2")
  }

  test("clustering on a column missing from the schema is rejected at CREATE") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.cl3")
    intercept[Exception] {
      spark.sql(
        "CREATE TABLE graft.cl3 (k BIGINT) TBLPROPERTIES ('clustering' = 'nope')")
    }
  }
}
