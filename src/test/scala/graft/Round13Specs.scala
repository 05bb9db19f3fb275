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

/** Round-13: the SQL-only change-feed poll loop — the manual form of a
  * streaming change-feed client on the SQL surface. The consumer keeps
  * ONE watermark (the last version it applied), reads the head via
  * `vt_history`, and drains `vt_changes(t, last, cur)` windows. The
  * exactly-once argument is structural: windows are half-open
  * `(last, cur]` intervals chained end-to-start, so every committed
  * version lands in EXACTLY one window; `vt_changes` net-change
  * semantics inside a window is what a net-state consumer wants
  * (transient versions cancel), and replaying the deltas in window
  * order reproduces the table bit-for-bit. The push-based equivalent
  * is [[graft.streaming.StreamingOps.followVersionedTable]]; this spec
  * pins the pull-based SQL contract it composes with. */
class SqlChangeFeedPollSpec extends SparkSpec {

  test("disjoint vt_changes windows deliver every commit exactly once and replay to the table") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.feed")
    spark.sql("CREATE TABLE graft.feed (k BIGINT, v BIGINT)") // v1: empty
    def cur(): Long = spark.sql(
      "SELECT max(version) FROM vt_history('feed')").head().getLong(0)

    // the consumer: watermark + multiset state (file-level CDF emits
    // delete+insert pairs for rewritten files, so state is a counted
    // bag, deltas applied deletes-first within a window)
    var last = cur()
    val state = scala.collection.mutable.Map.empty[(Long, Long), Int]
    val windows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def poll(): Unit = {
      val c = cur()
      if (c > last) { // nothing new ⇒ no vt_changes call (from < to)
        val rows = spark.sql(
          s"SELECT k, v, _change_type FROM vt_changes('feed', $last, $c)")
          .collect()
        rows.filter(_.getString(2) == "delete").foreach { r =>
          val key = (r.getLong(0), r.getLong(1))
          val n = state.getOrElse(key, 0) - 1
          assert(n >= 0, s"delete of a row the consumer never saw: $key")
          if (n == 0) state.remove(key) else state(key) = n
        }
        rows.filter(_.getString(2) == "insert").foreach { r =>
          val key = (r.getLong(0), r.getLong(1))
          state(key) = state.getOrElse(key, 0) + 1
        }
        windows += ((last, c)); last = c
      }
    }

    spark.sql("INSERT INTO graft.feed SELECT id, id * 3 FROM range(20)")  // v2
    spark.sql("INSERT INTO graft.feed SELECT id, id * 3 FROM range(20, 30)") // v3
    poll() // one window spanning TWO commits
    poll() // idle poll: must be a no-op, not a re-delivery
    spark.sql("DELETE FROM graft.feed WHERE k % 5 = 1")                   // v4 (DV)
    poll()
    spark.sql("CALL graft.optimize('feed', 'k', 4, 4)")                   // v5 rewrite
    spark.sql("INSERT INTO graft.feed SELECT id, id FROM range(100, 105)") // v6
    poll() // rewrite window: delete+insert pairs must cancel in the bag

    // exactly-once: the windows chain (last, cur] with no gap/overlap
    // from the subscription point to the final head
    assert(windows.head._1 == 1L && windows.last._2 == cur(),
      s"windows must cover (1, head]: $windows")
    windows.sliding(2).foreach { case Seq((_, a), (b, _)) =>
      assert(a == b, s"windows must chain end-to-start: $windows")
    case _ => () }

    // replay convergence: the consumer's bag IS the table
    assert(state.values.forall(_ == 1), s"duplicate delivery: $state")
    val table = spark.sql("SELECT k, v FROM graft.feed").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(state.keySet == table,
      s"replayed state must equal the table: ${state.keySet.size} vs ${table.size}")
    spark.sql("DROP TABLE graft.feed")
  }
}

/** Round-13: ISO-BMFF sample tables — parity on the sampled stub and
  * the hostile-degradation contract (any malformed table ⇒ ZERO rows
  * for that document, never an exception — the m11/m13 posture on the
  * stts/stsc/stsz/stco surface). */
class Mp4SampleTableSpec extends SparkSpec {
  import graft.operators.Multimodal
  import spark.implicits._

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def box(t: String, body: Array[Byte]): Array[Byte] =
    be32(8L + body.length) ++ t.getBytes ++ body

  test("the sample map recovers the stub's exact layout in both mdat positions") {
    // 70 bytes -> 3 samples (32, 32, 6), 1 chunk; id 2 (mdat-first,
    // largesize) and id 3 (moov-first) must both resolve offsets
    val payload = Array.tabulate[Byte](70)(i => (i + 1).toByte)
    val in = Seq((2L, payload, 2), (3L, payload, 1))
      .toDF("doc_id", "payload", "nt")
    val stubs = Multimodal.encodeMp4Sampled(in, "doc_id", "payload", "nt")
    val rows = Multimodal.mp4SampleMap(stubs, "id", "bin").collect()
      .map(r => (r.doc_id, r.track_id, r.sample_idx) ->
        (r.chunk_idx, r.size, r.dts_ms, r.pts_ms, r.rel_offset)).toMap
    assert(rows.size == 2 * 3 + 3, s"2 tracks x 3 + 1 track x 3: ${rows.size}")
    for (doc <- Seq(2L, 3L); tid <- 1L to (if (doc == 2) 2L else 1L)) {
      // round 14: odd track ids carry the stub's +25 ctts composition
      // offset (pts = dts + 25); even tracks decode = present
      val c = if (tid % 2 == 1) 25L else 0L
      assert(rows((doc, tid, 0L)) == ((0L, 32L, 0L, 0L + c, 0L)))
      assert(rows((doc, tid, 1L)) == ((0L, 32L, 40L, 40L + c, 32L)))
      assert(rows((doc, tid, 2L)) == ((0L, 6L, 80L, 80L + c, 64L)))
    }
    // demux slices the true bytes: sample 1 covers payload[32..64)
    val sums = Multimodal.mp4SampleDemux(stubs, "id", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(5)).toMap
    val expect1 = (32 until 64).map(i => (payload(i) & 0xFF).toLong).sum
    assert(sums((2L, 1L)) == expect1 && sums((3L, 1L)) == expect1)
    val expect2 = (64 until 70).map(i => (payload(i) & 0xFF).toLong).sum
    assert(sums((2L, 2L)) == expect2)
  }

  test("hostile sample tables degrade to zero rows, never an exception") {
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    def trak(stts: Array[Byte], stsc: Array[Byte], stsz: Array[Byte],
             stco: Array[Byte]): Array[Byte] = {
      val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++
        be32(1) ++ be32(0) ++ be32(120) ++ Array.fill[Byte](60)(0))
      val mdhd = box("mdhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(1000) ++ be32(120) ++ be32(0))
      box("trak", tkhd ++ box("mdia", mdhd ++ box("minf",
        box("stbl", stts ++ stsc ++ stsz ++ stco))))
    }
    val mdat = box("mdat", Array.tabulate[Byte](96)(_.toByte))
    def file(t: Array[Byte]): Array[Byte] = {
      val moov = box("moov", box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++
        be32(0) ++ be32(1000) ++ be32(120) ++ Array.fill[Byte](80)(0)) ++ t)
      ftyp ++ moov ++ mdat
    }
    def okStts(n: Long) = box("stts", be32(0) ++ be32(1) ++ be32(n) ++ be32(40))
    def okStsc() = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(4) ++ be32(1))
    def okStsz(sizes: Seq[Long]) = box("stsz",
      be32(0) ++ be32(0) ++ be32(sizes.length) ++
        sizes.flatMap(be32(_)).toArray)
    def okStco(off: Long) = box("stco", be32(0) ++ be32(1) ++ be32(off))
    // hostile variants, each a distinct degradation path:
    val cases = Seq(
      // stsz entry count overruns its box
      "stsz_overrun" -> file(trak(okStts(3), okStsc(),
        box("stsz", be32(0) ++ be32(0) ++ be32(1000) ++ be32(32)), okStco(0))),
      // fixed-size arm: count x size cannot fit in mdat (allocation trap)
      "stsz_fixed_huge" -> file(trak(okStts(3), okStsc(),
        box("stsz", be32(0) ++ be32(32) ++ be32(0x7FFFFFFFL)), okStco(0))),
      // stts total disagrees with stsz count
      "stts_mismatch" -> file(trak(okStts(99), okStsc(),
        okStsz(Seq(32L, 32L, 32L)), okStco(0))),
      // stco offset sends a sample past the mdat body
      "stco_past_mdat" -> file(trak(okStts(3), okStsc(),
        okStsz(Seq(32L, 32L, 32L)), okStco(1 << 20))),
      // stsc first run starts past chunk 1: no rule for the first chunk
      "stsc_gap" -> file(trak(okStts(3),
        box("stsc", be32(0) ++ be32(1) ++ be32(9) ++ be32(4) ++ be32(1)),
        okStsz(Seq(32L, 32L, 32L)), okStco(0))),
      // stco count overruns its box
      "stco_overrun" -> file(trak(okStts(3), okStsc(),
        okStsz(Seq(32L, 32L, 32L)),
        box("stco", be32(0) ++ be32(500) ++ be32(0))))
    )
    val in = cases.zipWithIndex.map { case ((_, bytes), i) => (i.toLong, bytes) }
      .toDF("id", "bin")
    val n = Multimodal.mp4SampleMap(in, "id", "bin").count()
    assert(n == 0L, s"every hostile case must degrade to zero rows, got $n")
    assert(Multimodal.mp4SampleDemux(in, "id", "bin").count() == 0L)
  }

  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)

  test("co64 chunk offsets resolve like stco; a hostile top-bit co64 degrades") {
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    def trakCo64(off: Long): Array[Byte] = {
      val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++
        be32(1) ++ be32(0) ++ be32(120) ++ Array.fill[Byte](60)(0))
      val mdhd = box("mdhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(1000) ++ be32(120) ++ be32(0))
      val stts = box("stts", be32(0) ++ be32(1) ++ be32(3) ++ be32(40))
      val stsc = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(4) ++ be32(1))
      val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(3) ++
        be32(32) ++ be32(32) ++ be32(6))
      val co64 = box("co64", be32(0) ++ be32(1) ++ be64(off))
      box("trak", tkhd ++ box("mdia", mdhd ++ box("minf",
        box("stbl", stts ++ stsc ++ stsz ++ co64))))
    }
    def fileOf(off: Long): Array[Byte] = {
      val moov = box("moov", box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++
        be32(0) ++ be32(1000) ++ be32(120) ++ Array.fill[Byte](80)(0)) ++
        trakCo64(off))
      ftyp ++ moov ++ box("mdat", Array.tabulate[Byte](70)(i => (i + 1).toByte))
    }
    // two-pass: measure where mdat's body lands, then point co64 at it
    val bodyStart = fileOf(0L).length - 70L
    val good = fileOf(bodyStart)
    val rows = Multimodal.mp4SampleMap(
      Seq((1L, good)).toDF("id", "bin"), "id", "bin").collect()
      .map(r => r.sample_idx -> (r.size, r.pts_ms, r.rel_offset)).toMap
    assert(rows == Map(0L -> ((32L, 0L, 0L)), 1L -> ((32L, 40L, 32L)),
      2L -> ((6L, 80L, 64L))), s"co64 must resolve like stco: $rows")
    // a top-bit co64 offset wraps `rel`/`abs + sz` if unguarded
    val hostile = fileOf(java.lang.Long.MIN_VALUE + 7L)
    assert(Multimodal.mp4SampleMap(
      Seq((2L, hostile)).toDF("id", "bin"), "id", "bin").count() == 0L)
    assert(Multimodal.mp4SampleDemux(
      Seq((2L, hostile)).toDF("id", "bin"), "id", "bin").count() == 0L)
    // and a LARGE POSITIVE co64 offset (top bit clear) wraps abs + sz
    // past Long.MaxValue — must degrade too, not emit garbage refs
    val hostilePos = fileOf(java.lang.Long.MAX_VALUE - 100L)
    assert(Multimodal.mp4SampleMap(
      Seq((3L, hostilePos)).toDF("id", "bin"), "id", "bin").count() == 0L)
    assert(Multimodal.mp4SampleDemux(
      Seq((3L, hostilePos)).toDF("id", "bin"), "id", "bin").count() == 0L)
  }

  test("with two mdat boxes, demux slices the LAST one (the one the map validated)") {
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    val decoy = box("mdat", Array.fill[Byte](70)(9)) // first mdat: garbage
    val payload = Array.tabulate[Byte](70)(i => (i + 1).toByte)
    def trakAt(off: Long): Array[Byte] = {
      val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++
        be32(1) ++ be32(0) ++ be32(120) ++ Array.fill[Byte](60)(0))
      val mdhd = box("mdhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(1000) ++ be32(120) ++ be32(0))
      val stts = box("stts", be32(0) ++ be32(1) ++ be32(3) ++ be32(40))
      val stsc = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(4) ++ be32(1))
      val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(3) ++
        be32(32) ++ be32(32) ++ be32(6))
      val stco = box("stco", be32(0) ++ be32(1) ++ be32(off))
      box("trak", tkhd ++ box("mdia", mdhd ++ box("minf",
        box("stbl", stts ++ stsc ++ stsz ++ stco))))
    }
    def fileAt(off: Long): Array[Byte] = {
      val moov = box("moov", box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++
        be32(0) ++ be32(1000) ++ be32(120) ++ Array.fill[Byte](80)(0)) ++
        trakAt(off))
      ftyp ++ decoy ++ moov ++ box("mdat", payload)
    }
    val bodyStart = fileAt(0L).length - 70L // the SECOND mdat's body
    val sums = Multimodal.mp4SampleDemux(
      Seq((1L, fileAt(bodyStart))).toDF("id", "bin"), "id", "bin").collect()
      .map(r => r.getLong(2) -> r.getLong(5)).toMap
    val expect0 = (0 until 32).map(i => (payload(i) & 0xFF).toLong).sum
    assert(sums(0L) == expect0,
      s"demux must slice the LAST mdat (decoy sum would be ${32 * 9}): $sums")
  }
}

/** Round-13: NESTED-STRUCT column mapping — RENAME/DROP/ADD of struct
  * fields by dotted path are metadata-only (colmap keys logical
  * paths; stats/shards/bloom stay keyed by dotted PHYSICAL path), the
  * prune serves nested stats leaves, and the logical↔physical
  * projection rides struct→struct CASTs that preserve NULL parents. */
class NestedColumnMappingSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable
  import org.apache.spark.sql.types._

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vnest").toFile
    d.delete(); d.getAbsolutePath
  }

  private def dataFiles(root: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(root, "data"))
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSet
  }

  private def mk(root: String): Unit = {
    // props is NULL every 16th row — the null-preservation probe
    val df = (0L until 64L).map(i => (i, i % 16L == 7L, i)).toDF("id", "nl", "i")
      .select(col("id"),
        when(!col("nl"), struct(
          concat(lit("L"), (col("i") % 3).cast("string")).as("lang"),
          (col("i") * 10).as("score"))).as("props"),
        (col("i") % 7).as("qty"))
      .repartitionByRange(4, col("id"))
    VersionedTable.commit(df, root, statsCols = Seq("id", "props.score"))
  }

  test("nested rename/drop/add are metadata-only; stats + prune survive by physical path") {
    val root = freshRoot()
    mk(root)
    val before = dataFiles(root)

    // nested stats were computed under the dotted physical key
    val (k0, t0) = VersionedTable.prunedFiles(spark, root, "props.score", "100", "200")
    assert(t0 >= 4 && k0.size < t0, s"nested stats must prune: ${k0.size} of $t0")

    // rename the LEAF, then the PARENT — both zero-data-file commits
    val v2 = VersionedTable.renameColumn(spark, root, "props.lang", "language")
    val v3 = VersionedTable.renameColumn(spark, root, "props", "meta")
    assert(dataFiles(root) == before, "nested renames must write ZERO data files")

    val cur = VersionedTable.read(spark, root)
    assert(cur.schema("meta").dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("language", "score"))
    assert(cur.filter(col("id") === 5L).head().getAs[org.apache.spark.sql.Row]("meta")
      .getAs[Long]("score") == 50L)
    // NULL parents stay NULL through the rename cast (not struct-of-nulls)
    assert(cur.filter(col("id") === 7L).head().isNullAt(1),
      "a NULL struct must survive the logical aliasing as NULL")
    // time travel sees each era's names
    assert(VersionedTable.read(spark, root, v2 - 1).schema("props")
      .dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("lang", "score"))

    // prune + readRange on the renamed nested leaf (stats key unchanged)
    val (k1, t1) = VersionedTable.prunedFiles(spark, root, "meta.score", "100", "200")
    assert(k1.size == k0.size && t1 == t0, "rename must not break nested skipping")
    assert(VersionedTable.readRange(spark, root, "meta.score", "100", "200")
      .count() == cur.filter(col("meta.score").between(100L, 200L)).count())

    // nested ADD: metadata-only, NULL-backfills inside the struct
    VersionedTable.addColumn(spark, root, "meta.note", StringType)
    assert(dataFiles(root) == before, "nested add must write ZERO data files")
    val withNote = VersionedTable.read(spark, root)
    assert(withNote.filter(col("meta").isNotNull &&
      col("meta.note").isNull).count() == 60L, "added nested field NULL-backfills")

    // nested DROP: metadata-only; old era still sees it; the physical
    // slot (props.score on disk) stays reserved
    VersionedTable.dropColumn(spark, root, "meta.score")
    assert(dataFiles(root) == before, "nested drop must write ZERO data files")
    assert(!VersionedTable.read(spark, root).schema("meta").dataType
      .asInstanceOf[StructType].fieldNames.contains("score"))
    assert(VersionedTable.read(spark, root, v3).schema("meta").dataType
      .asInstanceOf[StructType].fieldNames.contains("score"),
      "the dropped nested field stays readable at its era")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.addColumn(spark, root, "meta.score", LongType)
    }
    assert(e.getMessage.contains("physical column collision"), e.getMessage)
    // a DIFFERENT leaf lands on a fresh physical slot: legal
    VersionedTable.addColumn(spark, root, "meta.score2", LongType)

    // appends after the renames land under stable physical names:
    // time-travel readers and current readers agree on the bytes
    val app = Seq((1000L, ("LX", "hi", 123L))).toDF("id", "m")
      .select(col("id"), col("m").cast(VersionedTable.read(spark, root)
        .schema("meta").dataType).as("meta"), lit(0L).as("qty"))
    VersionedTable.commit(app, root, mode = "append")
    assert(VersionedTable.read(spark, root).filter(col("id") === 1000L)
      .head().getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("score2") == 123L)
  }

  test("path errors are precise; maps/arrays are rejected; DDL stays case-safe") {
    val root = freshRoot()
    mk(root)
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "props.nope", "x")
    }
    assert(e1.getMessage.contains("no column props.nope"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "qty.sub", "x")
    }
    assert(e2.getMessage.contains("not a struct"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "props.lang", "props.SCORE")
    }
    assert(e3.getMessage.contains("already exists"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "props.lang", "other.lang2")
    }
    assert(e4.getMessage.contains("across structs"), e4.getMessage)
    // dropping the last field of a struct is a precise error
    VersionedTable.dropColumn(spark, root, "props.lang")
    val e5 = intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, root, "props.score")
    }
    assert(e5.getMessage.contains("last field"), e5.getMessage)
  }

  test("nested paths work through SQL ALTER TABLE, and eras time-travel") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.nst")
    spark.sql("""CREATE TABLE graft.nst AS
      SELECT id AS k, named_struct('lang', concat('L', id % 3),
        'score', id * 10) AS props FROM range(50)""")
    spark.sql("ALTER TABLE graft.nst RENAME COLUMN props.lang TO language")
    assert(spark.sql("SELECT props.language FROM graft.nst WHERE k = 4")
      .head().getString(0) == "L1")
    spark.sql("ALTER TABLE graft.nst ADD COLUMNS (props.flag BOOLEAN)")
    assert(spark.sql(
      "SELECT count(*) FROM graft.nst WHERE props.flag IS NULL")
      .head().getLong(0) == 50L)
    spark.sql("ALTER TABLE graft.nst DROP COLUMN props.flag")
    assert(!spark.sql("SELECT props.* FROM graft.nst").columns.contains("flag"))
    // the pre-rename era answers under ITS names
    assert(spark.sql("SELECT props.lang FROM graft.nst VERSION AS OF 2 WHERE k = 4")
      .head().getString(0) == "L1")
    spark.sql("DROP TABLE graft.nst")
  }
}

/** Round-13: SHALLOW CLONE — a metadata-only writable fork. The v1
  * manifest references the source's files by absolute path (zero
  * bytes copied); mutations land under the clone's own root; the
  * clone's vacuum can never delete source bytes (it only scans the
  * clone's data/); OPTIMIZE materializes the clone into full
  * independence. */
class ShallowCloneSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag).toFile
    d.delete(); d.getAbsolutePath
  }

  private def dataFileCount(root: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val d = new java.io.File(root, "data")
    if (!d.exists()) 0
    else walk(d).count(_.getName.endsWith(".parquet"))
  }

  test("clone reads the pinned source era; writes diverge; vacuum is root-scoped") {
    val src = freshRoot("vclsrc"); val dst = freshRoot("vcldst")
    VersionedTable.commit(
      (0L until 200L).map(i => (i, i * 3L)).toDF("id", "p")
        .repartitionByRange(4, col("id")),
      src, statsCols = Seq("id"))
    VersionedTable.renameColumn(spark, src, "p", "price")    // colmap carries
    VersionedTable.deleteWhereDv(spark, src, "id % 50 = 1")  // dv lines carry
    val vPin = VersionedTable.currentVersion(spark, src)
    VersionedTable.commit(Seq((999L, 1L)).toDF("id", "price"),
      src, mode = "append")                                  // post-pin commit

    assert(VersionedTable.clone(spark, src, dst, vPin) == 1L)
    assert(dataFileCount(dst) == 0, "a shallow clone copies ZERO data files")
    // the clone IS the pinned era: schema (colmap), rows (DVs applied)
    val cloneDf = VersionedTable.read(spark, dst)
    assert(cloneDf.columns.toSeq == Seq("id", "price"))
    assert(cloneDf.count() == 196L, "the 4 DV-deleted rows stay deleted")
    assert(cloneDf.filter(col("id") === 999L).isEmpty,
      "commits after the pin are not in the clone")
    // stats lines carried verbatim: the clone prunes from birth
    val (kept, total) = VersionedTable.prunedFiles(spark, dst, "id", "10", "20")
    assert(kept.size < total, s"clone must data-skip: ${kept.size} of $total")

    // writes land under the CLONE only; the source never observes them
    VersionedTable.commit(Seq((5000L, 7L)).toDF("id", "price"),
      dst, mode = "append")
    VersionedTable.deleteWhereDv(spark, dst, "id = 0")
    assert(VersionedTable.read(spark, dst).count() == 196L)
    assert(VersionedTable.read(spark, src).count() == 197L,
      "the source must not observe clone writes")
    assert(dataFileCount(dst) >= 1, "clone writes live under the clone root")

    // the clone's vacuum scans only its own data/: source files survive
    val srcFiles = dataFileCount(src)
    VersionedTable.vacuum(spark, dst, retainVersions = 1, graceMs = 0L)
    assert(dataFileCount(src) == srcFiles,
      "clone vacuum must NEVER touch source bytes")
    assert(VersionedTable.read(spark, dst).count() == 196L)

    // OPTIMIZE materializes: every referenced file now lives under dst
    VersionedTable.optimize(spark, dst, Seq("id"), nFiles = 4)
    val snap = VersionedTable.snapshot(spark, dst)
    assert(snap.files.forall(_.startsWith(dst)),
      s"post-optimize clone must be self-contained: ${snap.files.take(2)}")
    assert(VersionedTable.read(spark, dst).count() == 196L)
  }

  test("CALL graft.clone works end-to-end on pure SQL") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.csrc")
    spark.sql("DROP TABLE IF EXISTS graft.cdst")
    spark.sql("CREATE TABLE graft.csrc AS SELECT id AS k, id * 2 AS p FROM range(100)")
    spark.sql("DELETE FROM graft.csrc WHERE k % 10 = 3")
    val v = spark.sql("CALL graft.clone('csrc', 'cdst')").head().getLong(0)
    assert(v == 1L)
    assert(spark.sql("SELECT count(*) FROM graft.cdst").head().getLong(0) == 90L)
    spark.sql("INSERT INTO graft.cdst SELECT 1000 + id, id FROM range(5)")
    assert(spark.sql("SELECT count(*) FROM graft.cdst").head().getLong(0) == 95L)
    assert(spark.sql("SELECT count(*) FROM graft.csrc").head().getLong(0) == 90L,
      "SQL clone writes must not reach the source")
    // clone target with prior commits is rejected precisely
    val e = intercept[Exception] {
      spark.sql("CALL graft.clone('csrc', 'cdst')").collect()
    }
    assert(e.getMessage.contains("already has commits"), e.getMessage)
    spark.sql("DROP TABLE graft.csrc"); spark.sql("DROP TABLE graft.cdst")
  }
}

/** Round-13: clustered layout on a NESTED stats leaf — the
  * `clustering` table property accepts dotted paths, the curve key
  * rides the nested column, stats land under the dotted physical key,
  * and the declared layout re-prefixes when the parent struct is
  * renamed. */
class NestedClusteringSpec extends SparkSpec {
  import graft.sources.VersionedTable
  import org.apache.spark.sql.connector.catalog.Identifier

  private def rootOf(name: String): String =
    spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
      .tableDir(Identifier.of(Array.empty[String], name))

  test("CTAS clustering='props.len' is born-prunable; the layout follows a parent rename") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.ncl")
    spark.sql("""CREATE TABLE graft.ncl TBLPROPERTIES ('clustering' = 'props.len')
      AS SELECT /*+ REPARTITION(16) */ id AS k,
         named_struct('len', id % 997, 'tag', concat('t', id % 5)) AS props
      FROM range(20000)""")
    val root = rootOf("ncl")
    val d = VersionedTable.prunedFilesDetail(spark, root,
      Seq(("props.len", "100", "120")), -1L)
    assert(d.totalFiles >= 4, s"need a multi-file table: ${d.totalFiles}")
    assert(d.kept.size * 2 < d.totalFiles,
      s"nested-clustered CTAS must be born prunable: ${d.kept.size} of ${d.totalFiles}")
    // the SQL surface prunes too, with correct rows
    val n = spark.sql(
      "SELECT count(*) FROM vt_read_range('ncl', 'props.len', '100', '120')")
      .head().getLong(0)
    assert(n == spark.sql(
      "SELECT count(*) FROM graft.ncl WHERE props.len BETWEEN 100 AND 120")
      .head().getLong(0))
    // renaming the PARENT re-prefixes the declared layout; appends
    // keep clustering (and keep pruning) under the new path
    spark.sql("ALTER TABLE graft.ncl RENAME COLUMN props TO meta")
    assert(VersionedTable.manifestMeta(spark, root).get("clustering")
      .contains("meta.len"), "clustering must re-prefix with the parent")
    spark.sql("""INSERT INTO graft.ncl
      SELECT /*+ REPARTITION(16) */ id, named_struct('len', id % 997,
        'tag', concat('t', id % 5)) FROM range(20000, 40000)""")
    val d2 = VersionedTable.prunedFilesDetail(spark, root,
      Seq(("meta.len", "100", "120")), -1L)
    assert(d2.totalFiles > d.totalFiles, "append must add files")
    assert(d2.kept.size * 2 < d2.totalFiles,
      s"appends must stay nested-clustered: ${d2.kept.size} of ${d2.totalFiles}")
    spark.sql("DROP TABLE graft.ncl")
  }
}

/** Round-13: MATERIALIZE closes the shallow-clone caveat — foreign
  * (source-rooted) files byte-copy under the clone's own root with
  * their 3-segment keys preserved (deletion vectors stay bound),
  * stats/shards carry verbatim (pruning untouched, layout NOT
  * rewritten), and after materialize the SOURCE can be vacuumed or
  * dropped without invalidating the clone. */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag).toFile
    d.delete(); d.getAbsolutePath
  }

  test("materialize self-contains a sharded clone; source drop no longer breaks it") {
    val src = freshRoot("vmsrc"); val dst = freshRoot("vmdst")
    VersionedTable.commit(
      (0L until 512L).map(i => (i, i * 2L)).toDF("k", "v")
        .repartitionByRange(8, col("k")), src, statsCols = Seq("k"))
    VersionedTable.deleteWhereDv(spark, src, "k % 100 = 9")
    VersionedTable.shardManifest(spark, src, targetFilesPerShard = 2)
    VersionedTable.clone(spark, src, dst)
    // one clone-local commit so materialize sees a MIX of local and
    // foreign files (only the foreign ones must copy)
    VersionedTable.commit(Seq((9000L, 1L)).toDF("k", "v"), dst, mode = "append")
    val before = VersionedTable.read(spark, dst).collect().toSet
    val v = VersionedTable.materialize(spark, dst)
    assert(v == VersionedTable.currentVersion(spark, dst))
    // every referenced file now lives under the clone root
    val snap = VersionedTable.snapshot(spark, dst)
    assert(snap.files.forall(_.startsWith(dst)),
      s"materialize must localize every file: ${snap.files.filterNot(_.startsWith(dst)).take(2)}")
    // identical rows — including the DV-deleted ones STAYING deleted
    // (the 3-segment key preservation contract)
    assert(VersionedTable.read(spark, dst).collect().toSet == before)
    assert(VersionedTable.read(spark, dst).filter("k = 9").isEmpty,
      "source-era DV must stay bound to the copied file")
    // stats carried verbatim: pruning still works, layout untouched
    val d = VersionedTable.prunedFilesDetail(spark, dst, "k", "0", "63")
    assert(d.kept.size < d.totalFiles, s"stats must survive materialize: $d")
    assert(d.shardsTotal > 0, "the two-level layout must survive materialize")
    // idempotent: nothing foreign remains
    assert(VersionedTable.materialize(spark, dst) == v)
    // THE DOCUMENTED DROP PROCEDURE: retire the pre-materialize
    // history (those manifests still reference the source), then
    // destroy the source entirely
    VersionedTable.vacuum(spark, dst, retainVersions = 1, graceMs = 0L)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(src))
    assert(VersionedTable.read(spark, dst).collect().toSet == before,
      "a materialized clone must survive source destruction")
  }

  test("CALL graft.materialize works on pure SQL") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.msrc")
    spark.sql("DROP TABLE IF EXISTS graft.mdst")
    spark.sql("CREATE TABLE graft.msrc AS SELECT id AS k FROM range(100)")
    spark.sql("CALL graft.clone('msrc', 'mdst')")
    val v = spark.sql("CALL graft.materialize('mdst')").head().getLong(0)
    assert(v == 2L, s"clone v1 + materialize commit = v2, got $v")
    spark.sql("DROP TABLE graft.msrc") // the source is gone...
    assert(spark.sql("SELECT count(*) FROM graft.mdst").head().getLong(0) == 100L,
      "...and the materialized clone must not care")
    spark.sql("DROP TABLE graft.mdst")
  }
}
