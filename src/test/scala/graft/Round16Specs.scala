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
