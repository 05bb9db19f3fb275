package graft

/** Round 16 — the r15 verdict's asks plus the ADVICE findings: the
  * streaming sink's idempotence watermark keyed PER QUERY (a fresh
  * checkpoint or a second concurrent writer can no longer be silently
  * muted by another writer's table-global watermark), complete-mode
  * empty epochs overwriting to empty, MERGE ON compound target-side
  * predicates with file-set pruning, the relaxed (standard) MERGE
  * source-cardinality rule, narrowed tag() race detection. */
class KeyedWatermarkSpec extends SparkSpec {
  import graft.sources.VersionedTable

  private val schema = new org.apache.spark.sql.types.StructType()
    .add("k", "bigint", nullable = false)

  private def newWriter(root: String, qid: String,
                        complete: Boolean = false) =
    new org.apache.spark.sql.graftbridge.GraftStreamingWrite(
      root, schema, qid, overwriteEachEpoch = complete)

  /** Stage + commit one epoch of `n` rows starting at `base` through
    * the real DSv2 writer path (the direct-drive shape the r15 replay
    * spec established). */
  private def writeEpoch(w: org.apache.spark.sql.graftbridge.GraftStreamingWrite,
                         epoch: Long, base: Long, n: Int = 4): Unit = {
    val factory = w.createStreamingWriterFactory(
      new org.apache.spark.sql.connector.write.PhysicalWriteInfo {
        override def numPartitions(): Int = 1
      })
    val dw = factory.createWriter(0, 0L, epoch)
    (0 until n).foreach(i => dw.write(
      org.apache.spark.sql.catalyst.InternalRow(base + i)))
    w.commit(epoch, Array(dw.commit()))
  }

  private def freshRoot(tag: String): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(tag).toString + "/t"
    VersionedTable.commit(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), root)
    root
  }

  test("a fresh-checkpoint query (epochs restarting at 0) appends — it is " +
      "never muted by a previous writer's watermark") {
    val root = freshRoot("kwm1")
    val wA = newWriter(root, "query-a")
    writeEpoch(wA, 0L, 0L)
    writeEpoch(wA, 1L, 100L)
    assert(VersionedTable.read(spark, root).count() == 8L)
    // the r15 data-loss shape: a NEW query (fresh checkpoint, epoch
    // ids restart at 0) onto the same table — the table-global
    // watermark (1) would have silently dropped epochs 0 and 1
    val wB = newWriter(root, "query-b")
    writeEpoch(wB, 0L, 200L)
    writeEpoch(wB, 1L, 300L)
    assert(VersionedTable.read(spark, root).count() == 16L,
      "fresh-checkpoint epochs 0/1 must LAND, not be skipped")
    assert(VersionedTable.lastBatchId(spark, root, "query-a") == 1L)
    assert(VersionedTable.lastBatchId(spark, root, "query-b") == 1L)
  }

  test("two interleaved writers each land every epoch; each skips only " +
      "its OWN replays") {
    val root = freshRoot("kwm2")
    val wA = newWriter(root, "query-a")
    val wB = newWriter(root, "query-b")
    writeEpoch(wA, 0L, 0L)
    writeEpoch(wB, 0L, 100L)
    writeEpoch(wA, 1L, 200L)
    writeEpoch(wB, 1L, 300L)
    assert(VersionedTable.read(spark, root).count() == 16L,
      "interleaved writers must not clobber each other's watermarks")
    // same-checkpoint replay (crash-restart of query-a) still skips —
    // a fresh write instance, same queryId, same epoch id
    val wA2 = newWriter(root, "query-a")
    writeEpoch(wA2, 1L, 200L)
    assert(VersionedTable.read(spark, root).count() == 16L,
      "own-epoch replay must still be exactly-once")
    // and its NEXT epoch lands
    writeEpoch(wA2, 2L, 400L)
    assert(VersionedTable.read(spark, root).count() == 20L)
  }

  test("legacy bare-key tables keep replay protection until the first " +
      "keyed commit supersedes the bare key") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("kwm3").toString + "/t"
    // a pre-r16 streamed table: bare #batch=5 in the manifest
    VersionedTable.commit((0L until 4L).map(Tuple1(_)).toDF("k"), root,
      meta = Map("batch" -> "5"))
    // a restart of the legacy query replays epoch 5: the bare key is
    // the only record, so the fallback must skip it
    val w = newWriter(root, "legacy-restart")
    writeEpoch(w, 5L, 100L)
    assert(VersionedTable.read(spark, root).count() == 4L,
      "legacy replay must skip via the bare-key fallback")
    // its next epoch lands — and writes a KEYED entry
    writeEpoch(w, 6L, 100L)
    assert(VersionedTable.read(spark, root).count() == 8L)
    // once a keyed entry exists the bare key is superseded: a fresh
    // query starting at epoch 0 appends
    val w2 = newWriter(root, "fresh-query")
    writeEpoch(w2, 0L, 200L)
    assert(VersionedTable.read(spark, root).count() == 12L,
      "keyed-era tables must not mute new queries through the bare key")
    // observation watermark = max over every entry
    assert(VersionedTable.lastBatchId(spark, root) == 6L)
  }

  test("complete mode publishes an EMPTY epoch as an overwrite to zero rows") {
    val root = freshRoot("kwm4")
    val w = newWriter(root, "complete-q", complete = true)
    writeEpoch(w, 0L, 0L)
    assert(VersionedTable.read(spark, root).count() == 4L)
    // the complete-mode result legitimately shrank to nothing: the
    // epoch must overwrite to empty, not keep serving epoch 0's rows
    w.commit(1L, Array.empty)
    assert(VersionedTable.read(spark, root).count() == 0L,
      "an empty complete epoch must truncate the table")
    // and the watermark advanced: a replay of the empty epoch skips
    w.commit(1L, Array.empty)
    assert(VersionedTable.lastBatchId(spark, root, "complete-q") == 1L)
    writeEpoch(w, 2L, 500L)
    assert(VersionedTable.read(spark, root).count() == 4L)
  }

  test("end-to-end: a second writeStream with a FRESH checkpoint appends " +
      "to a table a previous stream already wrote") {
    SparkEntry.configure(spark)
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    spark.sql("DROP TABLE IF EXISTS graft.kwm6")
    spark.sql("CREATE TABLE graft.kwm6 (k BIGINT)")
    def run(ckpt: String, lo: Long, hi: Long): Unit = {
      val in = MemoryStream[Long]
      val q = in.toDF().toDF("k").writeStream
        .option("checkpointLocation", ckpt).toTable("graft.kwm6")
      in.addData(lo until hi: _*)
      q.processAllAvailable(); q.stop()
      q.exception.foreach(throw _)
    }
    run(java.nio.file.Files.createTempDirectory("kwm6a").toString, 0L, 5L)
    // the fresh checkpoint restarts epoch ids at 0 — r15 dropped this
    run(java.nio.file.Files.createTempDirectory("kwm6b").toString, 10L, 15L)
    val ks = spark.sql("SELECT k FROM graft.kwm6").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ks == ((0L until 5L) ++ (10L until 15L)).sorted,
      s"fresh-checkpoint epochs must land exactly once: $ks")
    spark.sql("DROP TABLE graft.kwm6")
  }

  test("the keyed watermark survives interleaved maintenance commits") {
    import spark.implicits._
    val root = freshRoot("kwm5")
    val w = newWriter(root, "query-m")
    writeEpoch(w, 0L, 0L)
    writeEpoch(w, 1L, 100L)
    VersionedTable.commit(Seq(999L).toDF("k"), root, mode = "append")
    assert(VersionedTable.lastBatchId(spark, root, "query-m") == 1L,
      "a batch INSERT must carry every batch.<queryId> entry forward")
    // replay after maintenance still skips
    val w2 = newWriter(root, "query-m")
    writeEpoch(w2, 1L, 100L)
    assert(VersionedTable.read(spark, root).count() == 9L)
  }
}

class MergeOnPredicateSpec extends SparkSpec {
  import graft.sources.VersionedTable

  test("MERGE ON key equality AND a target-side predicate: matched " +
      "narrows, BY-SOURCE sees pred-false rows, unmatched-only keys insert") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.mop1")
    spark.sql("CREATE TABLE graft.mop1 AS SELECT id AS k, " +
      "CASE WHEN id < 5 THEN 'a' ELSE 'b' END AS grp, id * 10 AS v " +
      "FROM range(10)")
    // source hits keys 3 (grp a), 7 (grp b = pred-false), 12 (absent)
    spark.sql("""
      MERGE INTO graft.mop1 t USING (
        SELECT * FROM VALUES (3L, 333L), (7L, 777L), (12L, 1212L) AS s(k, v)) s
      ON t.k = s.k AND t.grp = 'a'
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, grp, v) VALUES (s.k, 'new', s.v)""")
    val rows = spark.sql("SELECT k, grp, v FROM graft.mop1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // k=3 updated (pred-true match); k=7 NOT updated (pred-false ⇒
    // unmatched) AND inserted as a new row; k=12 inserted
    assert(rows.contains((3L, "a", 333L)), rows.toString)
    assert(rows.contains((7L, "b", 70L)), "pred-false row must keep its value")
    assert(rows.contains((7L, "new", 777L)),
      "a key matching only pred-false rows is unmatched ⇒ inserts")
    assert(rows.contains((12L, "new", 1212L)), rows.toString)
    assert(rows.size == 12, rows.toString)
    spark.sql("DROP TABLE graft.mop1")
  }

  test("a compound-ON merge rewrites ONLY files holding pred-true matches") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.mop2")
    // two commits ⇒ two disjoint file sets, distinguishable by grp
    spark.sql("CREATE TABLE graft.mop2 AS " +
      "SELECT id AS k, 'a' AS grp, id * 10 AS v FROM range(6)")
    spark.sql("INSERT INTO graft.mop2 " +
      "SELECT id AS k, 'b' AS grp, id * 100 AS v FROM range(6)")
    val root = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
      .tableDir(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "mop2"))
    val before = VersionedTable.snapshot(spark, root).files.toSet
    val bFiles = before.filter { p =>
      // the era-2 commit's files hold only grp='b' rows
      spark.read.parquet(p).filter("grp = 'b'").limit(1).count() > 0
    }
    assert(bFiles.nonEmpty && bFiles != before)
    spark.sql("""
      MERGE INTO graft.mop2 t USING (
        SELECT * FROM VALUES (2L, 999L) AS s(k, v)) s
      ON t.k = s.k AND t.grp = 'a'
      WHEN MATCHED THEN UPDATE SET v = s.v""")
    val after = VersionedTable.snapshot(spark, root).files.toSet
    assert(bFiles.subsetOf(after),
      s"files with no pred-true match must carry forward untouched:\n" +
        s"before=$before\nafter=$after")
    val upd = spark.sql(
      "SELECT grp, v FROM graft.mop2 WHERE k = 2 ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(upd == Seq(("a", 999L), ("b", 200L)), upd.toString)
    spark.sql("DROP TABLE graft.mop2")
  }

  test("side-crossing non-equality ON terms stay rejected precisely") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.mop3")
    spark.sql("CREATE TABLE graft.mop3 AS SELECT id AS k, id AS v FROM range(5)")
    val e = intercept[Exception] {
      spark.sql("""
        MERGE INTO graft.mop3 t USING (SELECT 1L AS k, 2L AS v) s
        ON t.k = s.k AND t.v < s.v
        WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    assert(e.getMessage.contains("target-side"), e.getMessage)
    spark.sql("DROP TABLE graft.mop3")
  }
}

class ConstraintSpec extends SparkSpec {
  import graft.sources.VersionedTable

  test("ADD CONSTRAINT ... CHECK: a violating INSERT fails loudly and " +
      "leaves the table unchanged; a valid one lands") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.con1")
    spark.sql("CREATE TABLE graft.con1 AS SELECT id AS k, id * 10 AS v FROM range(5)")
    spark.sql("ALTER TABLE graft.con1 ADD CONSTRAINT v_nonneg CHECK (v >= 0)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.con1 VALUES (100L, -1L)")
    }
    assert(e.getMessage.contains("v_nonneg") ||
      e.getMessage.toLowerCase.contains("constraint"), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM graft.con1").head().getLong(0) == 5L,
      "a violating INSERT must leave the table unchanged")
    spark.sql("INSERT INTO graft.con1 VALUES (100L, 1L)")
    assert(spark.sql("SELECT count(*) FROM graft.con1").head().getLong(0) == 6L)
    // NULL passes a plain CHECK (SQL semantics) …
    spark.sql("INSERT INTO graft.con1 VALUES (101L, CAST(NULL AS BIGINT))")
    // … and IS NOT NULL expresses NOT NULL
    spark.sql("ALTER TABLE graft.con1 ADD CONSTRAINT k_nn CHECK (k IS NOT NULL)")
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO graft.con1 VALUES (CAST(NULL AS BIGINT), 5L)")
    }
    assert(e2.getMessage.contains("k_nn") ||
      e2.getMessage.toLowerCase.contains("constraint"), e2.getMessage)
    // DROP releases enforcement
    spark.sql("ALTER TABLE graft.con1 DROP CONSTRAINT k_nn")
    spark.sql("INSERT INTO graft.con1 VALUES (CAST(NULL AS BIGINT), 5L)")
    assert(spark.sql("SELECT count(*) FROM graft.con1").head().getLong(0) == 8L)
    spark.sql("DROP TABLE graft.con1")
  }

  test("ADD CONSTRAINT validates EXISTING data and fails when rows violate") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.con2")
    spark.sql("CREATE TABLE graft.con2 AS SELECT id - 2 AS v FROM range(5)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.con2 ADD CONSTRAINT pos CHECK (v >= 0)")
    }
    assert(e.getMessage.toLowerCase.contains("constraint"), e.getMessage)
    // nothing recorded — writes stay unconstrained
    spark.sql("INSERT INTO graft.con2 VALUES (-99L)")
    assert(spark.sql("SELECT count(*) FROM graft.con2").head().getLong(0) == 6L)
    spark.sql("DROP TABLE graft.con2")
  }

  test("constraints gate MERGE and UPDATE (merge-on-read) paths too") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.con3")
    spark.sql("CREATE TABLE graft.con3 AS SELECT id AS k, id * 10 AS v FROM range(5)")
    spark.sql("ALTER TABLE graft.con3 ADD CONSTRAINT v_cap CHECK (v < 1000)")
    val em = intercept[Exception] {
      spark.sql("""
        MERGE INTO graft.con3 t USING (SELECT 1L AS k, 5000L AS v) s
        ON t.k = s.k
        WHEN MATCHED AND s.v > 0 THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    }
    assert(em.getMessage.contains("v_cap") ||
      em.getMessage.toLowerCase.contains("constraint"), em.getMessage)
    val eu = intercept[Exception] {
      spark.sql("UPDATE graft.con3 SET v = v * 1000 WHERE k = 2")
    }
    assert(eu.getMessage.contains("v_cap") ||
      eu.getMessage.toLowerCase.contains("constraint"), eu.getMessage)
    val rows = spark.sql("SELECT k, v FROM graft.con3 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == (0L until 5L).map(i => (i, i * 10)),
      s"failed DML must leave the table unchanged: $rows")
    spark.sql("DROP TABLE graft.con3")
  }

  test("constraints gate the STREAMING sink: a violating epoch fails the " +
      "stream and publishes nothing") {
    SparkEntry.configure(spark)
    val root = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
      .tableDir(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "con4"))
    spark.sql("DROP TABLE IF EXISTS graft.con4")
    spark.sql("CREATE TABLE graft.con4 (k BIGINT)")
    spark.sql("ALTER TABLE graft.con4 ADD CONSTRAINT k_pos CHECK (k >= 0)")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", "bigint", nullable = false)
    val w = new org.apache.spark.sql.graftbridge.GraftStreamingWrite(
      root, schema, "con4-q", overwriteEachEpoch = false)
    def writeEpoch(epoch: Long, base: Long): Unit = {
      val factory = w.createStreamingWriterFactory(
        new org.apache.spark.sql.connector.write.PhysicalWriteInfo {
          override def numPartitions(): Int = 1
        })
      val dw = factory.createWriter(0, 0L, epoch)
      (0 until 3).foreach(i => dw.write(
        org.apache.spark.sql.catalyst.InternalRow(base + i)))
      w.commit(epoch, Array(dw.commit()))
    }
    writeEpoch(0L, 5L)
    assert(spark.sql("SELECT count(*) FROM graft.con4").head().getLong(0) == 3L)
    val e = intercept[Exception] { writeEpoch(1L, -10L) }
    assert(e.getMessage.contains("k_pos") ||
      e.getMessage.toLowerCase.contains("constraint"), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM graft.con4").head().getLong(0) == 3L,
      "a violating epoch must publish nothing")
    // no staged orphans for the failed epoch
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.listStatus(new org.apache.hadoop.fs.Path(root, "data"))
      .map(_.getPath.getName).exists(_.startsWith("e1-")),
      "violating epoch's staged files must be dropped")
    spark.sql("DROP TABLE graft.con4")
  }

  test("constraints are era properties: carried through maintenance, " +
      "reported via Table.constraints, absent in pre-add eras") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("con5").toString + "/t"
    VersionedTable.commit((0L until 4L).map(i => (i, i)).toDF("k", "v"), root)
    VersionedTable.addConstraint(spark, root, "v-ok", "v >= 0")
    VersionedTable.commit((10L until 14L).map(i => (i, i)).toDF("k", "v"),
      root, mode = "append")
    assert(VersionedTable.constraintsOf(spark, root) == Map("v-ok" -> "v >= 0"),
      "append must carry the constraint forward")
    assert(VersionedTable.constraintsOf(spark, root, 1L).isEmpty,
      "the pre-add era has no constraint")
    intercept[Exception] {
      VersionedTable.commit(Seq((-1L, -5L)).toDF("k", "v"), root, mode = "append")
    }
    assert(VersionedTable.read(spark, root).count() == 8L)
    // the SQL-only discovery surface: vt_constraints lists per era
    SparkEntry.configure(spark)
    val listed = spark.sql(s"SELECT name, predicate FROM vt_constraints('$root')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(listed == Seq(("v-ok", "v >= 0")), listed.toString)
    assert(spark.sql(s"SELECT * FROM vt_constraints('$root', 1)").count() == 0L)
  }
}

class StreamUpdateModeSpec extends SparkSpec {
  import graft.sources.VersionedTable

  test("update output mode onto an upsert_keys table: a watermarked-style " +
      "keyed aggregate converges to one row per key across restarts") {
    SparkEntry.configure(spark)
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    spark.sql("DROP TABLE IF EXISTS graft.upd1")
    spark.sql("CREATE TABLE graft.upd1 (k STRING, n BIGINT) " +
      "TBLPROPERTIES ('upsert_keys' = 'k')")
    val ckpt = java.nio.file.Files.createTempDirectory("upd1ck").toString
    val in = MemoryStream[String]
    def start() = in.toDF().toDF("k")
      .groupBy("k").count().select(
        org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.col("count").as("n"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).toTable("graft.upd1")
    val q1 = start()
    in.addData("a", "a", "b")
    q1.processAllAvailable()
    in.addData("a", "c")
    q1.processAllAvailable(); q1.stop(); q1.exception.foreach(throw _)
    def state() = spark.sql("SELECT k, n FROM graft.upd1 ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(state() == Seq(("a", 3L), ("b", 1L), ("c", 1L)),
      s"epochs must UPSERT, not append: ${state()}")
    // restart over the SAME checkpoint: replays nothing, new deltas land
    val q2 = start()
    in.addData("b", "b")
    q2.processAllAvailable(); q2.stop(); q2.exception.foreach(throw _)
    assert(state() == Seq(("a", 3L), ("b", 3L), ("c", 1L)),
      s"restart must keep converged totals: ${state()}")
    spark.sql("DROP TABLE graft.upd1")
  }

  test("append output mode still rejects an unwatermarked aggregate loudly") {
    SparkEntry.configure(spark)
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    spark.sql("DROP TABLE IF EXISTS graft.upd2")
    spark.sql("CREATE TABLE graft.upd2 (k STRING, n BIGINT) " +
      "TBLPROPERTIES ('upsert_keys' = 'k')")
    val in = MemoryStream[String]
    val e = intercept[Exception] {
      val q = in.toDF().toDF("k").groupBy("k").count()
        .select(org.apache.spark.sql.functions.col("k"),
          org.apache.spark.sql.functions.col("count").as("n"))
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("upd2ck").toString)
        .toTable("graft.upd2")
      q.processAllAvailable(); q.stop()
      q.exception.foreach(throw _)
    }
    assert(e.getMessage.toLowerCase.contains("append") ||
      e.getMessage.toLowerCase.contains("watermark"), e.getMessage)
    spark.sql("DROP TABLE graft.upd2")
  }

  test("upsert epochs are exactly-once per writer and keep time travel eras") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.upd3")
    spark.sql("CREATE TABLE graft.upd3 (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('upsert_keys' = 'k')")
    val root = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
      .tableDir(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "upd3"))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", "bigint", nullable = false).add("v", "bigint", nullable = false)
    def writeEpoch(w: org.apache.spark.sql.graftbridge.GraftStreamingWrite,
                   epoch: Long, kv: Seq[(Long, Long)]): Unit = {
      val factory = w.createStreamingWriterFactory(
        new org.apache.spark.sql.connector.write.PhysicalWriteInfo {
          override def numPartitions(): Int = 1
        })
      val dw = factory.createWriter(0, 0L, epoch)
      kv.foreach { case (k, v) => dw.write(
        org.apache.spark.sql.catalyst.InternalRow(k, v)) }
      w.commit(epoch, Array(dw.commit()))
    }
    val w = new org.apache.spark.sql.graftbridge.GraftStreamingWrite(
      root, schema, "upd3-q", overwriteEachEpoch = false)
    writeEpoch(w, 0L, Seq((1L, 10L), (2L, 20L)))
    val v1 = VersionedTable.currentVersion(spark, root)
    writeEpoch(w, 1L, Seq((2L, 99L), (3L, 30L)))
    def state() = spark.sql("SELECT k, v FROM graft.upd3 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(state() == Seq((1L, 10L), (2L, 99L), (3L, 30L)), state().toString)
    // crash-replay of epoch 1 (fresh write instance, same queryId):
    // the keyed watermark inside the upsert's OCC loop skips it
    val w2 = new org.apache.spark.sql.graftbridge.GraftStreamingWrite(
      root, schema, "upd3-q", overwriteEachEpoch = false)
    writeEpoch(w2, 1L, Seq((2L, 99L), (3L, 30L)))
    assert(state() == Seq((1L, 10L), (2L, 99L), (3L, 30L)),
      "replayed upsert epoch must be exactly-once")
    // the pre-upsert era is intact (merge-on-read: no file rewrites)
    val era1 = VersionedTable.read(spark, root, v1).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(era1 == Seq((1L, 10L), (2L, 20L)),
      s"time travel must serve the pre-upsert era: $era1")
    spark.sql("DROP TABLE graft.upd3")
  }
}

class AutoCompactSpec extends SparkSpec {
  import graft.sources.VersionedTable

  test("autocompact = N bounds a long stream's file count, row-exact, " +
      "with pinned readers unaffected") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.ac1")
    spark.sql("CREATE TABLE graft.ac1 (k BIGINT) " +
      "TBLPROPERTIES ('autocompact' = '5')")
    val root = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
      .tableDir(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "ac1"))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", "bigint", nullable = false)
    val w = new org.apache.spark.sql.graftbridge.GraftStreamingWrite(
      root, schema, "ac1-q", overwriteEachEpoch = false)
    def writeEpoch(epoch: Long, base: Long): Unit = {
      val factory = w.createStreamingWriterFactory(
        new org.apache.spark.sql.connector.write.PhysicalWriteInfo {
          override def numPartitions(): Int = 1
        })
      val dw = factory.createWriter(0, 0L, epoch)
      (0 until 10).foreach(i => dw.write(
        org.apache.spark.sql.catalyst.InternalRow(base + i)))
      w.commit(epoch, Array(dw.commit()))
    }
    // pin a reader mid-stream and check it later
    writeEpoch(0L, 0L)
    val pinnedV = VersionedTable.currentVersion(spark, root)
    (1L until 20L).foreach(e => writeEpoch(e, e * 10L))
    val files = VersionedTable.snapshot(spark, root).files
    assert(files.size < 20,
      s"50-epoch-class stream must end with a bounded file count, got " +
        s"${files.size}")
    val ks = spark.sql("SELECT k FROM graft.ac1").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ks == (0L until 200L).toSeq, "compaction must be row-exact")
    // the pinned pre-compaction reader still serves its era (files
    // survive until vacuum)
    assert(VersionedTable.read(spark, root, pinnedV).count() == 10L)
    // the watermark survived every compaction commit
    assert(VersionedTable.lastBatchId(spark, root, "ac1-q") == 19L)
    spark.sql("DROP TABLE graft.ac1")
  }
}

class DefaultColumnSpec extends SparkSpec {
  import graft.sources.VersionedTable

  test("ADD COLUMN ... DEFAULT backfills pre-add files at read, fills " +
      "omitted columns at insert, and keeps explicit NULLs null") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.dft1")
    spark.sql("CREATE TABLE graft.dft1 AS SELECT id AS k FROM range(3)")
    spark.sql("ALTER TABLE graft.dft1 ADD COLUMN lang STRING DEFAULT 'en'")
    // pre-add rows: files lack the column ⇒ existence default
    val pre = spark.sql("SELECT k, lang FROM graft.dft1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(pre == Seq((0L, "en"), (1L, "en"), (2L, "en")), pre.toString)
    // INSERT omitting the column fills the CURRENT default
    spark.sql("INSERT INTO graft.dft1 (k) VALUES (10L)")
    // explicit NULL stays NULL (per-file existence semantics: the
    // post-add file HOLDS the column)
    spark.sql("INSERT INTO graft.dft1 VALUES (11L, CAST(NULL AS STRING))")
    spark.sql("INSERT INTO graft.dft1 VALUES (12L, 'fr')")
    val rows = spark.sql("SELECT k, lang FROM graft.dft1 WHERE k >= 10 ORDER BY k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(rows == Seq((10L, Some("en")), (11L, None), (12L, Some("fr"))),
      rows.toString)
    // SET DEFAULT moves only the CURRENT default: new omitted inserts
    // fill the new value, pre-add history keeps the add-time backfill
    spark.sql("ALTER TABLE graft.dft1 ALTER COLUMN lang SET DEFAULT 'de'")
    spark.sql("INSERT INTO graft.dft1 (k) VALUES (13L)")
    val after = spark.sql("SELECT k, lang FROM graft.dft1 ORDER BY k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(after == Seq((0L, Some("en")), (1L, Some("en")), (2L, Some("en")),
      (10L, Some("en")), (11L, None), (12L, Some("fr")), (13L, Some("de"))),
      after.toString)
    spark.sql("DROP TABLE graft.dft1")
  }

  test("defaults are era metadata: time travel predates them; the " +
      "DataFrame API sees the same backfill") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("dft2").toString + "/t"
    VersionedTable.commit((0L until 4L).map(i => (i, i * 2)).toDF("k", "v"), root)
    VersionedTable.alterColumns(spark, root, Seq(
      VersionedTable.addColumnTransform(root, "score",
        org.apache.spark.sql.types.LongType, Some("100"))))
    val cur = VersionedTable.read(spark, root).orderBy("k")
      .select("k", "score").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cur == (0L until 4L).map(i => (i, 100L)), cur.toString)
    // the pre-add era has no such column at all
    assert(!VersionedTable.read(spark, root, 1L).columns.contains("score"))
    // appends carrying the column write real values
    VersionedTable.commit(Seq((9L, 9L, 7L)).toDF("k", "v", "score"),
      root, mode = "append")
    val all = VersionedTable.read(spark, root).orderBy("k")
      .select("k", "score").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(all == (0L until 4L).map(i => (i, 100L)) :+ (9L, 7L), all.toString)
  }

  test("a NOT NULL-style constraint accepts a write omitting a DEFAULTed " +
      "column (the stored files serve the default, not NULL)") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.dft3")
    spark.sql("CREATE TABLE graft.dft3 AS SELECT id AS k FROM range(2)")
    spark.sql("ALTER TABLE graft.dft3 ADD COLUMN tag STRING DEFAULT 'x'")
    spark.sql("ALTER TABLE graft.dft3 ADD CONSTRAINT tag_nn " +
      "CHECK (tag IS NOT NULL)")
    spark.sql("INSERT INTO graft.dft3 (k) VALUES (5L)")
    assert(spark.sql("SELECT count(*) FROM graft.dft3 WHERE tag = 'x'")
      .head().getLong(0) == 3L)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.dft3 VALUES (6L, CAST(NULL AS STRING))")
    }
    assert(e.getMessage.contains("tag_nn") ||
      e.getMessage.toLowerCase.contains("constraint"), e.getMessage)
    spark.sql("DROP TABLE graft.dft3")
  }
}

class IdentityColumnSpec16 extends SparkSpec {
  import graft.sources.VersionedTable

  test("GENERATED ALWAYS AS IDENTITY: inserts omitting the column get " +
      "unique ascending ids; explicit values are rejected") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.idt1")
    spark.sql("CREATE TABLE graft.idt1 " +
      "(id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT)")
    spark.sql("INSERT INTO graft.idt1 (k) VALUES (10L), (20L), (30L)")
    spark.sql("INSERT INTO graft.idt1 (k) VALUES (40L), (50L)")
    val rows = spark.sql("SELECT id, k FROM graft.idt1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.size == 5 && rows.map(_._1).distinct.size == 5,
      s"ids must be unique: $rows")
    assert(rows.map(_._1).forall(_ >= 1L), s"START WITH 1: $rows")
    // the second commit's ids sit strictly above the first's range
    val firstIds = rows.filter(r => r._2 <= 30L).map(_._1)
    val secondIds = rows.filter(r => r._2 >= 40L).map(_._1)
    assert(secondIds.min > firstIds.max,
      s"ranges must not overlap: $firstIds vs $secondIds")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.idt1 VALUES (999L, 60L)")
    }
    assert(e.getMessage.toLowerCase.contains("identity") ||
      e.getMessage.toLowerCase.contains("always"), e.getMessage)
    spark.sql("DROP TABLE graft.idt1")
  }

  test("GENERATED BY DEFAULT: explicit ids pass through, NULL slots " +
      "generate, and the high-water clears explicit values") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.idt2")
    spark.sql("CREATE TABLE graft.idt2 (id BIGINT GENERATED BY DEFAULT " +
      "AS IDENTITY (START WITH 100 INCREMENT BY 10), k BIGINT)")
    spark.sql("INSERT INTO graft.idt2 VALUES (5000L, 1L)")
    spark.sql("INSERT INTO graft.idt2 (k) VALUES (2L)")
    val rows = spark.sql("SELECT id, k FROM graft.idt2 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.head == (5000L, 1L), rows.toString)
    val gen = rows(1)._1
    assert(gen != 5000L && gen >= 100L, s"generated id: $gen")
    // the explicit 5000 advanced the mark: later generated ids clear it
    spark.sql("INSERT INTO graft.idt2 (k) VALUES (3L)")
    val gen3 = spark.sql("SELECT id FROM graft.idt2 WHERE k = 3").head().getLong(0)
    assert(gen3 > 5000L,
      s"high-water must clear explicit values, got $gen3")
    spark.sql("DROP TABLE graft.idt2")
  }

  test("paths that cannot generate reject GENERATED ALWAYS tables " +
      "precisely; maintenance carries the high-water mark") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.idt3")
    spark.sql("CREATE TABLE graft.idt3 " +
      "(id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT)")
    spark.sql("INSERT INTO graft.idt3 (k) VALUES (1L), (2L)")
    val root = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
      .tableDir(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "idt3"))
    val em = intercept[Exception] {
      spark.sql("""MERGE INTO graft.idt3 t USING (SELECT 1L AS id, 9L AS k) s
        ON t.id = s.id WHEN MATCHED AND s.k > 0 THEN UPDATE SET k = s.k
        WHEN NOT MATCHED THEN INSERT (id, k) VALUES (s.id, s.k)""")
    }
    assert(em.getMessage.contains("GENERATED ALWAYS"), em.getMessage)
    val eu = intercept[Exception] {
      spark.sql("UPDATE graft.idt3 SET id = 77 WHERE k = 1")
    }
    assert(eu.getMessage.contains("GENERATED ALWAYS") ||
      eu.getMessage.toLowerCase.contains("identity"), eu.getMessage)
    val es = intercept[Exception] {
      new org.apache.spark.sql.graftbridge.GraftStreamingWrite(root,
        new org.apache.spark.sql.types.StructType().add("k", "bigint"),
        "q-id", overwriteEachEpoch = false)
    }
    assert(es.getMessage.contains("GENERATED ALWAYS"), es.getMessage)
    // a DELETE (merge-on-read, no generation) still works, and the
    // high-water mark survives it: the next insert's ids stay unique
    spark.sql("DELETE FROM graft.idt3 WHERE k = 1")
    spark.sql("INSERT INTO graft.idt3 (k) VALUES (3L)")
    val ids = spark.sql("SELECT id FROM graft.idt3").collect()
      .map(_.getLong(0)).toSeq
    assert(ids.distinct.size == ids.size, s"ids must stay unique: $ids")
    spark.sql("DROP TABLE graft.idt3")
  }
}

class MergeCardinalitySpec extends SparkSpec {

  test("duplicate UNMATCHED source keys insert one row each; duplicate " +
      "MATCHED keys still fail the standard cardinality error") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.mcd1")
    spark.sql("CREATE TABLE graft.mcd1 AS SELECT id AS k, id AS v FROM range(3)")
    // keys 10,10 are absent from the target: both rows insert (the
    // standard MERGE contract; the r15 global rejection refused this)
    spark.sql("""
      MERGE INTO graft.mcd1 t USING (
        SELECT * FROM VALUES (10L, 1L), (10L, 2L), (1L, 99L) AS s(k, v)) s
      ON t.k = s.k
      WHEN MATCHED AND s.v > 0 THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val rows = spark.sql("SELECT k, v FROM graft.mcd1 ORDER BY k, v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((0L, 0L), (1L, 99L), (2L, 2L), (10L, 1L), (10L, 2L)),
      rows.toString)
    // two source rows for a MATCHED key: ambiguous update ⇒ error
    val e = intercept[Exception] {
      spark.sql("""
        MERGE INTO graft.mcd1 t USING (
          SELECT * FROM VALUES (1L, 5L), (1L, 6L) AS s(k, v)) s
        ON t.k = s.k
        WHEN MATCHED AND s.v > 0 THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    }
    assert(e.getMessage.contains("multiple rows for matched key"),
      e.getMessage)
    spark.sql("DROP TABLE graft.mcd1")
  }
}
