package graft

/** Round 15 — the r14 verdict's asks plus the ADVICE findings:
  * s10/s16 bounded candidate cut, vacuum's tag-chain retention (the
  * stream-resume-after-vacuum fix), tag no-clobber, deep-materialize
  * crash recovery, vt_read '@'-path fallback, hostile zero-count
  * ctts/stts runs. */
class IvfPqBoundsSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("s10/s16 candidate cut is a bounded-state aggregate, never a probed-cell per-query window") {
    // every window that legitimately remains is CONSTANT-bounded:
    // the nProbe cell cut (≤ nCells rows per query post-crossjoin),
    // the centroid seed numbering (nCells rows total), the batch
    // cell assignment (s16; ≤ nCells rows per vector), and the final
    // rerank (≤ rerank·k rows per query). The O(queries ×
    // probed-cell-width) `ark` cut must NOT be a window — it rides
    // TopKAgg (ObjectHashAggregate with map-side partials, ≤ rerank·k
    // pairs per query per partition through the exchange), the same
    // shape s5/s13/s18 pin.
    for ((q, wantWindows) <- Seq("s10_knn_ivfpq" -> 3,
        "s16_knn_ivfpq_incremental" -> 4)) {
      val plan = executed(SparkEntry.queries(q)(spark, sfDir))
      assert(plan.contains("ObjectHashAggregate"), s"$q: ${plan.take(2000)}")
      val nWindows = plan.split("\\bWindow \\[").length - 1
      assert(nWindows == wantWindows,
        s"$q: expected $wantWindows constant-bounded windows, got $nWindows" +
          " — a new window here is a candidate-cut regression")
    }
  }
}

class TagChainVacuumSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("stream resume from a tag works AFTER vacuum: the manifest chain survives") {
    // the r14 ADVICE scenario: tag v1, append v2..v4, vacuum with
    // retainVersions=1 — the old vacuum kept only v1 + v4, so the
    // delta walk (snapshot(v-1) vs snapshot(v)) threw on the retired
    // v2/v3 manifests; the chain pin keeps v1..v4 resolvable
    val root = tmpDir("tagchain") + "/t"
    VersionedTable.commit((0L until 6L).map(i => (i, i)).toDF("k", "v"), root)
    VersionedTable.tag(spark, root, "pinned-era")
    for (b <- 1 to 3)
      VersionedTable.commit(
        (b * 100L until b * 100L + 4L).map(i => (i, i)).toDF("k", "v"),
        root, mode = "append")
    val deleted = VersionedTable.vacuum(spark, root,
      retainVersions = 1, graceMs = 0L)
    assert(deleted == 0, s"chain pin must keep every era's files: $deleted")
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-cdc")
      .option("table", root).option("startingVersion", "pinned-era")
      .load().writeStream
      .option("checkpointLocation", tmpDir("tagchainck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(_.getLong(0)) }; ()
      }.start()
    q.awaitTermination(120000)
    q.exception.foreach(throw _)
    assert(out.sorted == Seq(100L, 101L, 102L, 103L, 200L, 201L, 202L, 203L,
      300L, 301L, 302L, 303L),
      s"resume after vacuum must deliver every post-pin version: ${out.sorted}")
    // dropping the tag releases the chain: the next vacuum retires
    // the old eras' manifests AND their exclusive files
    VersionedTable.dropTag(spark, root, "pinned-era")
    assert(VersionedTable.vacuum(spark, root,
      retainVersions = 1, graceMs = 0L) == 0) // appends share all files
    intercept[Exception] { VersionedTable.read(spark, root, 2L).collect() }
    assert(VersionedTable.read(spark, root).count() == 18L)
  }

  test("startingVersion into a vacuumed era fails naming the cause and the tag recovery") {
    val root = tmpDir("vacstart") + "/t"
    VersionedTable.commit((0L until 4L).map(i => (i, i)).toDF("k", "v"), root)
    for (b <- 1 to 3)
      VersionedTable.commit(
        (b * 10L until b * 10L + 2L).map(i => (i, i)).toDF("k", "v"),
        root, mode = "append")
    VersionedTable.vacuum(spark, root, retainVersions = 1, graceMs = 0L)
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft-cdc")
        .option("table", root).option("startingVersion", "1")
        .load().writeStream
        .option("checkpointLocation", tmpDir("vacstartck"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .start()
      q.awaitTermination(60000)
      q.exception.foreach(throw _)
    }
    def deep(t: Throwable): String =
      if (t == null) "" else t.toString + deep(t.getCause)
    assert(deep(e).contains("vacuumed") && deep(e).contains("TAG"),
      s"must name the vacuumed manifest and the tag recovery: ${deep(e)}")
  }

  test("racing tag() calls: exactly one wins even on RawLocalFileSystem") {
    // FileSystem.rename on the local fs silently overwrites, so the
    // no-clobber publish must come from FileContext.rename — two
    // threads racing the same name must produce one winner and one
    // IllegalStateException/IllegalArgumentException, never a
    // silently re-pointed tag
    val root = tmpDir("tagrace") + "/t"
    import spark.implicits._
    graft.sources.VersionedTable.commit(
      (0L until 4L).map(i => (i, i)).toDF("k", "v"), root)
    graft.sources.VersionedTable.commit(
      (4L until 8L).map(i => (i, i)).toDF("k", "v"), root, mode = "append")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val attempts = (1L to 2L).map(v => Future(
      scala.util.Try(graft.sources.VersionedTable.tag(
        spark, root, "contended", v))))
    val results = Await.result(Future.sequence(attempts), 60.seconds)
    assert(results.count(_.isSuccess) == 1,
      s"exactly one tag creation must win: $results")
    // whichever version won, the tag resolves to it — not to a mix
    val won = results.collectFirst { case scala.util.Success(v) => v }.get
    assert(graft.sources.VersionedTable.tagVersion(spark, root, "contended") == won)
  }
}

class VtReadAtPathSpec extends SparkSpec {
  import spark.implicits._

  test("vt_read of a PATH whose last component contains '@' still reads the path") {
    // the round-14 tag syntax made 'prefix@suffix' a tag lookup; a
    // plain path like /data/run@2024 must fall back to the path read
    // when no such tag exists (the pre-tag behavior those paths had)
    org.apache.spark.sql.graftbridge.GraftTableFunctions.install(spark)
    val base = java.nio.file.Files.createTempDirectory("vtat").toString
    val root = s"$base/run@2024"
    graft.sources.VersionedTable.commit(
      (0L until 7L).map(i => (i, i)).toDF("k", "v"), root)
    assert(spark.sql(s"SELECT count(*) FROM vt_read('$root')")
      .head().getLong(0) == 7L)
    // and a REAL tag on such a table still resolves through '@'
    graft.sources.VersionedTable.tag(spark, root, "pin")
    graft.sources.VersionedTable.commit(
      (0L until 3L).map(i => (i, i)).toDF("k", "v"), root)
    assert(spark.sql(s"SELECT count(*) FROM vt_read('$root@pin')")
      .head().getLong(0) == 7L)
    // a catalog identifier with a bad tag still fails loudly
    spark.sql("DROP TABLE IF EXISTS graft.vtat15")
    spark.sql("CREATE TABLE graft.vtat15 AS SELECT id FROM range(5)")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM vt_read('vtat15@nope')").collect()
    }
    assert(e.getMessage.contains("no tag"), e.getMessage)
    spark.sql("DROP TABLE graft.vtat15")
  }
}

class GraftStreamingSinkSpec extends SparkSpec {
  import graft.sources.VersionedTable
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.processAllAvailable(); q.stop()
    q.exception.foreach(throw _)
  }

  test("writeStream.toTable: append epochs land as exactly-once table commits") {
    SparkEntry.configure(spark)
    implicit val sq = spark.sqlContext
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.snk1")
    spark.sql("CREATE TABLE graft.snk1 (k BIGINT, v BIGINT)")
    val root = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
      .tableDir(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "snk1"))
    val ckpt = tmpDir("snkck")
    val in = MemoryStream[(Long, Long)]
    def start() = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", ckpt).toTable("graft.snk1")
    // two epochs in run 1
    val q1 = start()
    in.addData((0L until 5L).map(i => (i, i * 2)): _*)
    q1.processAllAvailable()
    in.addData((10L until 13L).map(i => (i, i * 2)): _*)
    drain(q1)
    assert(spark.sql("SELECT count(*) FROM graft.snk1").head().getLong(0) == 8L)
    // each epoch is ONE table commit carrying its #batch watermark
    assert(VersionedTable.lastBatchId(spark, root) >= 1L)
    // RUN 2 over the same checkpoint: the engine replays nothing, new
    // data lands once; a replayed epoch id would be skipped by the
    // watermark (exercised by the direct replay below)
    val q2 = start()
    in.addData((20L until 24L).map(i => (i, i)): _*)
    drain(q2)
    val all = spark.sql("SELECT k FROM graft.snk1").collect().map(_.getLong(0))
    assert(all.sorted.toSeq ==
      ((0L until 5L) ++ (10L until 13L) ++ (20L until 24L)).sorted,
      s"restart must not duplicate or drop: ${all.sorted.toSeq}")
    assert(all.length == all.distinct.length)
    // snapshot isolation: every version is a whole epoch — counts per
    // version step by epoch sizes, never a partial file set
    val v = VersionedTable.currentVersion(spark, root)
    assert(VersionedTable.read(spark, root, v - 1).count() == 8L)
    spark.sql("DROP TABLE graft.snk1")
  }

  test("a replayed epoch publishes nothing and leaves no staged files") {
    SparkEntry.configure(spark)
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.snk2")
    spark.sql("CREATE TABLE graft.snk2 (k BIGINT)")
    val root = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
      .tableDir(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "snk2"))
    // drive the StreamingWrite DIRECTLY so the replayed-epoch path is
    // deterministic: epoch 7 committed once, then "replayed" (the
    // crash-restart shape: staged again, then commit called again)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", "bigint", nullable = false)
    def writeEpoch(w: org.apache.spark.sql.graftbridge.GraftStreamingWrite,
                   epoch: Long, base: Long): Unit = {
      val factory = w.createStreamingWriterFactory(
        new org.apache.spark.sql.connector.write.PhysicalWriteInfo {
          override def numPartitions(): Int = 2
        })
      val msgs = (0 until 2).map { pid =>
        val dw = factory.createWriter(pid, pid.toLong, epoch)
        (0 until 3).foreach(i => dw.write(
          org.apache.spark.sql.catalyst.InternalRow(base + pid * 3 + i)))
        dw.commit()
      }
      w.commit(epoch, msgs.toArray)
    }
    val w1 = new org.apache.spark.sql.graftbridge.GraftStreamingWrite(
      root, schema, "q-spec", overwriteEachEpoch = false)
    writeEpoch(w1, 7L, 0L)
    assert(VersionedTable.read(spark, root).count() == 6L)
    // the restart: a NEW write instance replays epoch 7 with the same
    // rows — the watermark skips the publish and drops the staging
    val w2 = new org.apache.spark.sql.graftbridge.GraftStreamingWrite(
      root, schema, "q-spec", overwriteEachEpoch = false)
    writeEpoch(w2, 7L, 0L)
    assert(VersionedTable.read(spark, root).count() == 6L,
      "replayed epoch must not duplicate")
    // nothing staged survives under data/
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = f.listStatus(new org.apache.hadoop.fs.Path(root, "data"))
      .map(_.getPath.getName).filter(_.startsWith("e7-"))
    val live = VersionedTable.snapshot(spark, root).files
      .map(p => p.split('/').takeRight(2).head).toSet
    assert(staged.forall(live.contains),
      s"replay staging must be dropped: ${staged.mkString(", ")} vs $live")
    // and epoch 8 continues normally
    writeEpoch(w2, 8L, 100L)
    assert(VersionedTable.read(spark, root).count() == 12L)
    // the #batch watermark SURVIVES interleaved maintenance commits
    // (round-15 review finding): a plain batch INSERT between epochs
    // must not reset it to -1, or a crash-replayed epoch after
    // maintenance would re-append
    import spark.implicits._
    VersionedTable.commit(Seq(999L).toDF("k"), root, mode = "append")
    assert(VersionedTable.lastBatchId(spark, root) == 8L,
      "maintenance commit must carry the epoch watermark forward")
    // replay AFTER maintenance (a fresh restart = fresh write
    // instance/staging nonce): still skipped by the carried watermark
    val w3 = new org.apache.spark.sql.graftbridge.GraftStreamingWrite(
      root, schema, "q-spec", overwriteEachEpoch = false)
    writeEpoch(w3, 8L, 100L)
    assert(VersionedTable.read(spark, root).count() == 13L,
      "replayed epoch after a maintenance commit must not duplicate")
    spark.sql("DROP TABLE graft.snk2")
  }

  test("a clustered table's streaming epochs are key-disjoint and prunable at birth") {
    // the write declares RequiresDistributionAndOrdering on the
    // cluster columns, so the engine range-shuffles each micro-batch
    // before the writers run — per-epoch files carry disjoint [min,
    // max] on the leading cluster column and a selective read prunes
    // from the manifest alone, no OPTIMIZE pass needed
    SparkEntry.configure(spark)
    implicit val sq = spark.sqlContext
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.snkclu")
    spark.sql("""CREATE TABLE graft.snkclu (k BIGINT, v BIGINT)
      TBLPROPERTIES ('clustering' = 'k', 'statscols' = 'k')""")
    val root = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
      .tableDir(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "snkclu"))
    // AQE would coalesce a 400-row epoch's four range partitions into
    // ONE file (adjacent-range coalescing preserves disjointness, but
    // one file can't demonstrate pruning) — hold it off for the stream
    val coalesce0 = spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val in = MemoryStream[(Long, Long)]
      val q = in.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", tmpDir("snkcluck"))
        .toTable("graft.snkclu")
      // keys arrive SHUFFLED — without the range exchange every file
      // would span the whole domain and nothing could prune
      in.addData(scala.util.Random.shuffle((0L until 400L).toList)
        .map(i => (i, i)): _*)
      drain(q)
    } finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", coalesce0)
    val d = VersionedTable.prunedFilesDetail(spark, root, "k", "0", "40")
    // 4 disjoint epoch files + the CREATE's stats-less empty file
    // (conservatively kept): the [0,40] probe keeps 2 of 5
    assert(d.totalFiles >= 5, s"expected a multi-file epoch: ${d.totalFiles}")
    assert(d.kept.size * 2 <= d.totalFiles,
      s"epoch files must be key-disjoint enough to prune: " +
        s"kept ${d.kept.size} of ${d.totalFiles}")
    assert(spark.sql("SELECT count(*) FROM graft.snkclu WHERE k < 40")
      .head().getLong(0) == 40L)
    spark.sql("DROP TABLE graft.snkclu")
  }

  test("composed replication is now declarative on BOTH ends: readStream.table -> writeStream.toTable") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.repsrc")
    spark.sql("DROP TABLE IF EXISTS graft.repdst")
    spark.sql("CREATE TABLE graft.repsrc AS SELECT id AS k, id * 2 AS v FROM range(40)")
    spark.sql("CREATE TABLE graft.repdst (k BIGINT, v BIGINT)")
    val ckpt = tmpDir("repck")
    def replicate(): Unit = {
      val q = spark.readStream.option("skipChangeCommits", "true")
        .table("graft.repsrc")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("graft.repdst")
      q.awaitTermination(120000)
      q.exception.foreach(throw _)
    }
    replicate()
    assert(spark.sql("SELECT count(*) FROM graft.repdst").head().getLong(0) == 40L)
    spark.sql("INSERT INTO graft.repsrc SELECT id + 1000, id FROM range(6)")
    replicate()
    val src = spark.sql("SELECT * FROM graft.repsrc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dst = spark.sql("SELECT * FROM graft.repdst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dst == src, s"replica diverged: ${dst.size} vs ${src.size}")
    // idempotent re-run: nothing new at the source, nothing lands
    replicate()
    assert(spark.sql("SELECT count(*) FROM graft.repdst").head().getLong(0) == 46L)
    spark.sql("DROP TABLE graft.repsrc")
    spark.sql("DROP TABLE graft.repdst")
  }
}

class MergeCdcApplySpec extends SparkSpec {

  test("MERGE with conditional DELETE/UPDATE/INSERT: the CDC-apply idiom") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.mrg15")
    spark.sql(
      "CREATE TABLE graft.mrg15 AS SELECT id AS k, id * 10 AS p FROM range(10)")
    // a CDC batch: delete k=2,3; update k=5 (p=555); insert k=20
    // (and a 'delete' for an absent key, which must do nothing)
    spark.sql("""
      SELECT * FROM VALUES
        (2L, 0L,   'delete'), (3L, 0L, 'delete'), (5L, 555L, 'update'),
        (20L, 200L, 'insert'), (30L, 0L, 'delete')
      AS cdc(k, p, _change_type)""").createOrReplaceTempView("cdc15")
    spark.sql("""
      MERGE INTO graft.mrg15 t USING cdc15 s ON t.k = s.k
      WHEN MATCHED AND s._change_type = 'delete' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED AND s._change_type <> 'delete' THEN INSERT *""")
    val got = spark.sql("SELECT k, p FROM graft.mrg15 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0L until 10L).filterNot(Set(2L, 3L))
      .map(k => (k, if (k == 5L) 555L else k * 10)) :+ ((20L, 200L))
    assert(got == want, s"CDC apply diverged: $got")
    // time travel still serves the pre-merge era (one atomic commit)
    assert(spark.sql("SELECT count(*) FROM graft.mrg15 VERSION AS OF 2")
      .head().getLong(0) == 10L)
    spark.sql("DROP TABLE graft.mrg15")
  }

  test("first-match-wins clause order and partial SET keep unassigned columns") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.mrg15b")
    spark.sql("""CREATE TABLE graft.mrg15b AS
      SELECT id AS k, id AS a, id * 100 AS b FROM range(6)""")
    spark.sql("""
      SELECT * FROM VALUES (1L, 11L, 1L), (2L, 22L, 9L), (4L, 44L, 9L)
      AS s(k, a, tier)""").createOrReplaceTempView("src15b")
    // clause 1 matches tier=1 (k=1 → a=11); clause 2 is the fallback
    // (k=2,4 → DELETE); unassigned column b must keep its value
    spark.sql("""
      MERGE INTO graft.mrg15b t USING src15b s ON t.k = s.k
      WHEN MATCHED AND s.tier = 1 THEN UPDATE SET a = s.a
      WHEN MATCHED THEN DELETE""")
    val got = spark.sql("SELECT k, a, b FROM graft.mrg15b ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Seq(0L, 1L, 3L, 5L).map(k =>
      (k, if (k == 1L) 11L else k, k * 100))
    assert(got == want, s"clause order / partial SET diverged: $got")
    spark.sql("DROP TABLE graft.mrg15b")
  }

  test("WHEN NOT MATCHED BY SOURCE: the full-sync idiom (DELETE) and target-side UPDATE") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.mrg15d")
    spark.sql(
      "CREATE TABLE graft.mrg15d AS SELECT id AS k, id AS p FROM range(8)")
    spark.sql("""SELECT * FROM VALUES (2L, 22L), (5L, 55L), (20L, 200L)
      AS s(k, p)""").createOrReplaceTempView("src15d")
    // full sync: target becomes exactly the source
    spark.sql("""
      MERGE INTO graft.mrg15d t USING src15d s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val got = spark.sql("SELECT k, p FROM graft.mrg15d ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((2L, 22L), (5L, 55L), (20L, 200L)),
      s"full sync diverged: $got")
    // conditional BY SOURCE UPDATE with a target-side expression
    spark.sql("""
      MERGE INTO graft.mrg15d t
      USING (SELECT 2 AS k, 0 AS p) s ON t.k = s.k
      WHEN NOT MATCHED BY SOURCE AND t.p > 100 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET p = t.p + 1000""")
    val got2 = spark.sql("SELECT k, p FROM graft.mrg15d ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 == Seq((2L, 22L), (5L, 1055L)),
      s"conditional BY SOURCE diverged: $got2")
    spark.sql("DROP TABLE graft.mrg15d")
  }

  test("still rejected precisely: side-crossing conditions, duplicate source keys") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.mrg15c")
    spark.sql("CREATE TABLE graft.mrg15c AS SELECT id AS k, id AS p FROM range(4)")
    spark.sql("SELECT * FROM VALUES (1L, 9L), (1L, 8L), (3L, 7L) AS s(k, p)")
      .createOrReplaceTempView("src15c")
    // a BY SOURCE condition referencing SOURCE columns is meaningless
    // (there is no source row) — Spark's own analyzer refuses to
    // resolve it (UNRESOLVED_COLUMN); our tgtOnlySql check stays as
    // defense-in-depth for direct-API construction
    val e1 = intercept[Exception] { spark.sql("""
      MERGE INTO graft.mrg15c t USING (SELECT DISTINCT * FROM src15c) s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED BY SOURCE AND s.p > 0 THEN DELETE""") }
    assert(e1.getMessage.contains("cannot be resolved") ||
      e1.getMessage.contains("source columns"), e1.getMessage)
    val e2 = intercept[Exception] { spark.sql("""
      MERGE INTO graft.mrg15c t USING src15c s ON t.k = s.k
      WHEN MATCHED AND t.p > 1 THEN DELETE""") }
    assert(e2.getMessage.contains("target columns"), e2.getMessage)
    // the standard MERGE cardinality contract: duplicate source keys
    // matching a target row must throw, never last-writer-wins
    val e3 = intercept[Exception] { spark.sql("""
      MERGE INTO graft.mrg15c t USING src15c s ON t.k = s.k
      WHEN MATCHED AND s.p < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET p = s.p""") }
    assert(e3.getMessage.contains("multiple rows"), e3.getMessage)
    spark.sql("DROP TABLE graft.mrg15c")
  }

  test("composed: a graft-cdc stream batch applies downstream via MERGE") {
    SparkEntry.configure(spark)
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft.cdcsrc15")
    spark.sql("DROP TABLE IF EXISTS graft.cdcdst15")
    spark.sql("CREATE TABLE graft.cdcsrc15 AS SELECT id AS k, id AS v FROM range(12)")
    spark.sql("CREATE TABLE graft.cdcdst15 AS SELECT k, v FROM graft.cdcsrc15")
    // upstream mutates: delete two keys, append two rows
    spark.sql("DELETE FROM graft.cdcsrc15 WHERE k IN (3, 7)")
    spark.sql("INSERT INTO graft.cdcsrc15 SELECT id + 100, id FROM range(2)")
    val srcRoot = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
      .tableDir(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "cdcsrc15"))
    val ckpt = java.nio.file.Files.createTempDirectory("cdcapply").toString
    val q = spark.readStream.format("graft-cdc")
      .option("table", srcRoot).option("startingVersion", "3")
      .load().writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // per-key reduction, then THE SQL consumer idiom
        b.createOrReplaceTempView("cdc_batch15")
        b.sparkSession.sql("""
          WITH latest AS (
            SELECT k, v, _change_type FROM (
              SELECT *, row_number() OVER (PARTITION BY k
                ORDER BY _commit_version DESC,
                         CASE _change_type WHEN 'insert' THEN 0 ELSE 1 END
              ) AS rn FROM cdc_batch15) WHERE rn = 1)
          MERGE INTO graft.cdcdst15 t USING latest s ON t.k = s.k
          WHEN MATCHED AND s._change_type = 'delete' THEN DELETE
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED AND s._change_type <> 'delete' THEN INSERT *""")
        ()
      }.start()
    q.awaitTermination(120000)
    q.exception.foreach(throw _)
    val src = spark.sql("SELECT * FROM graft.cdcsrc15").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dst = spark.sql("SELECT * FROM graft.cdcdst15").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dst == src, s"CDC apply diverged: ${dst.size} vs ${src.size}")
    spark.sql("DROP TABLE graft.cdcsrc15")
    spark.sql("DROP TABLE graft.cdcdst15")
  }
}

class StreamAdmissionSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col
  import graft.sources.VersionedTable

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  // exactly N files: parallelize with N slices, no shuffle — AQE can
  // coalesce even a user repartition's tiny partitions
  private def exactFiles(root: String, n: Int, base: Long = 0L): Unit = {
    val rows = (0 until n).map(i => org.apache.spark.sql.Row(base + i))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, n),
      new org.apache.spark.sql.types.StructType().add("k", "long", false))
    VersionedTable.commit(df, root,
      mode = if (base == 0L) "overwrite" else "append")
    ()
  }

  test("maxFilesPerTrigger splits the initial snapshot; exactly-once across a mid-snapshot restart") {
    // a 100-file snapshot (1 row per file) under maxFilesPerTrigger=25
    // must drain in exactly 4 micro-batches, survive a crash INSIDE
    // the snapshot, and deliver every row exactly once overall
    val root = tmpDir("snapsplit") + "/t"
    exactFiles(root, 100)
    val ckpt = tmpDir("snapsplitck")
    val byBatch = scala.collection.mutable.Map[Long, Seq[Long]]()
    def run(failAt: Long): Option[Throwable] = {
      val q = spark.readStream.format("graft-cdc")
        .option("table", root)
        .option("maxFilesPerTrigger", "25")
        .load().writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          if (id == failAt) sys.error("injected mid-snapshot crash")
          byBatch.synchronized {
            byBatch(id) = b.collect().map(_.getLong(0)).toSeq }
          ()
        }.start()
      val term = scala.util.Try(q.awaitTermination(120000))
      q.exception.map(e => e: Throwable).orElse(term.failed.toOption)
    }
    // run 1 crashes on the THIRD slice — two slices committed
    assert(run(failAt = 2L).isDefined, "injected crash must surface")
    assert(byBatch.keys.max == 1L && byBatch.values.map(_.size).sum == 50)
    // run 2 resumes MID-SNAPSHOT from the checkpointed file index
    assert(run(failAt = -1L).isEmpty)
    val all = byBatch.values.flatten.toSeq
    assert(byBatch.size == 4,
      s"100 files / 25 per trigger must be 4 batches, got ${byBatch.size}")
    assert(byBatch.values.forall(_.size <= 25),
      s"a slice exceeded the cap: ${byBatch.view.mapValues(_.size).toMap}")
    assert(all.sorted == (0L until 100L),
      s"exactly-once across the mid-snapshot restart, got ${all.size} rows")
  }

  test("delta versions admit by file budget: exact-fit versions land one per batch") {
    val root = tmpDir("deltabudget") + "/t"
    exactFiles(root, 2)
    // three appended versions, exactly 2 files each
    for (b <- 1 to 3) exactFiles(root, 2, base = b * 100L)
    val ckpt = tmpDir("deltabudgetck")
    var batches = 0
    val q = spark.readStream
      .option("startingVersion", "2") // deltas only: v2..v4
      .option("maxFilesPerTrigger", "2")
      .format("graft-cdc").option("table", root)
      .load().writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (b.count() > 0) batches += 1; ()
      }.start()
    q.awaitTermination(120000)
    q.exception.foreach(throw _)
    // 3 versions x 2 files under a 2-file budget = one version per batch
    assert(batches == 3, s"expected 3 version-granular batches, got $batches")
  }

  test("a single huge pure-append VERSION splits across micro-batches; data-change versions land whole") {
    // one INSERT committing 12 files under maxFilesPerTrigger=4 must
    // drain in 3 batches (the r14 verdict's 'a version is unbounded'
    // seam), survive a mid-version crash exactly-once, and a DV
    // delete (data-change) must still land as ONE whole batch
    val root = tmpDir("versplit") + "/t"
    exactFiles(root, 2)          // v1: the starting snapshot (2 files)
    val ckpt = tmpDir("versplitck")
    val byBatch = scala.collection.mutable.Map[Long, Seq[Long]]()
    def run(failAt: Long): Option[Throwable] = {
      val q = spark.readStream.format("graft-cdc")
        .option("table", root)
        .option("startingVersion", "2")
        .option("maxFilesPerTrigger", "4")
        .load().writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          if (id == failAt) sys.error("injected mid-version crash")
          byBatch.synchronized {
            byBatch(id) = b.collect().map(_.getLong(0)).toSeq }
          ()
        }.start()
      val term = scala.util.Try(q.awaitTermination(120000))
      q.exception.map(e => e: Throwable).orElse(term.failed.toOption)
    }
    exactFiles(root, 12, base = 100L) // v2: ONE 12-file append
    // crash after the first 4-file slice — restart resumes mid-version
    assert(run(failAt = 1L).isDefined, "injected crash must surface")
    assert(byBatch.values.map(_.size).sum == 4, s"one slice committed: $byBatch")
    assert(run(failAt = -1L).isEmpty)
    assert(byBatch.size == 3,
      s"12 files / 4 per trigger must be 3 batches, got ${byBatch.size}")
    assert(byBatch.values.flatten.toSeq.sorted == (100L until 112L),
      "exactly-once across the mid-version restart")
    // a data-change commit (DV delete) still lands whole in one batch
    graft.sources.VersionedTable.deleteWhereDv(spark, root, "k >= 100 AND k < 110")
    val before = byBatch.size
    assert(run(failAt = -1L).isEmpty)
    val dels = byBatch.toSeq.drop(before).flatMap(_._2)
    assert(byBatch.size == before + 1 && dels.size == 10,
      s"the 10-row DV delete must be ONE whole batch: ${byBatch.size - before} batches, ${dels.size} rows")
  }

  test("startingTimestamp resolves at-or-before and streams what landed after") {
    val root = tmpDir("startts") + "/t"
    VersionedTable.commit((0L until 5L).map(i => (i, i)).toDF("k", "v"), root)
    Thread.sleep(20)
    val mid = System.currentTimeMillis()
    Thread.sleep(20)
    VersionedTable.commit((100L until 103L).map(i => (i, i)).toDF("k", "v"),
      root, mode = "append")
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-cdc")
      .option("table", root).option("startingTimestamp", mid.toString)
      .load().writeStream
      .option("checkpointLocation", tmpDir("starttsck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(_.getLong(0)) }; ()
      }.start()
    q.awaitTermination(120000)
    q.exception.foreach(throw _)
    assert(out.sorted == (100L until 103L),
      s"only the post-timestamp commit streams, got ${out.sorted}")
    // both options together are rejected; a pre-table instant fails
    // loudly through versionAsOf's at-or-before rule
    def failsWith(needle: String)(opts: (String, String)*): Unit = {
      val e = intercept[Exception] {
        var r = spark.readStream.format("graft-cdc").option("table", root)
        opts.foreach { case (k, v) => r = r.option(k, v) }
        val qq = r.load().writeStream
          .option("checkpointLocation", tmpDir("starttsfail"))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
          .start()
        qq.awaitTermination(60000)
        qq.exception.foreach(throw _)
      }
      def deep(t: Throwable): String =
        if (t == null) "" else t.toString + deep(t.getCause)
      assert(deep(e).contains(needle), s"wanted '$needle' in: ${deep(e)}")
    }
    failsWith("mutually exclusive")(
      "startingTimestamp" -> "5", "startingVersion" -> "1")
    failsWith("precedes")("startingTimestamp" -> "5")
  }
}

class StreamSchemaDriftSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("ALTER TABLE ADD COLUMN mid-stream fails the LIVE stream precisely; a restart serves it") {
    // the drift posture only bites a LIVE stream: a restarted stream
    // re-reads the table schema, so its start era already includes the
    // new column — exactly the recovery the failure message names
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.drift15")
    spark.sql("CREATE TABLE graft.drift15 AS SELECT id AS k FROM range(6)")
    val ckpt = tmpDir("driftck")
    val rows = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = spark.readStream.option("skipChangeCommits", "true")
      .table("graft.drift15").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized { rows ++= b.collect() }; ()
      }.start()
    q.processAllAvailable() // the snapshot, under the start schema
    assert(rows.size == 6 && q.exception.isEmpty)
    // mid-stream additive change + rows under the new schema: the LIVE
    // query must fail naming the column and the opt-out
    spark.sql("ALTER TABLE graft.drift15 ADD COLUMNS (tag BIGINT)")
    spark.sql("INSERT INTO graft.drift15 SELECT id + 100, id FROM range(3)")
    val err = intercept[Exception] {
      q.processAllAvailable()
      q.exception.foreach(throw _)
    }
    def deep(t: Throwable): String =
      if (t == null) "" else t.toString + deep(t.getCause)
    assert(deep(err).contains("allowSchemaDrift") && deep(err).contains("tag"),
      s"drift must fail naming the column and the opt-out: ${deep(err)}")
    // the RESTART (same checkpoint!) picks up the new schema: the two
    // delta rows arrive WITH the tag column, nothing replays
    val rows2 = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q2 = spark.readStream.option("skipChangeCommits", "true")
      .table("graft.drift15").writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        rows2.synchronized { rows2 ++= b.collect() }; ()
      }.start()
    q2.awaitTermination(120000)
    q2.exception.foreach(throw _)
    assert(rows2.nonEmpty && rows2.head.schema.fieldNames.contains("tag"),
      s"restart must serve the new column: ${rows2.headOption}")
    assert(rows2.map(_.getLong(0)).sorted.toSeq == Seq(100L, 101L, 102L))
    // the opt-out keeps the LIVE stream alive under its start schema
    spark.sql("DROP TABLE IF EXISTS graft.drift15b")
    spark.sql("CREATE TABLE graft.drift15b AS SELECT id AS k FROM range(4)")
    val rows3 = new scala.collection.mutable.ArrayBuffer[Long]()
    val q3 = spark.readStream.option("skipChangeCommits", "true")
      .option("allowSchemaDrift", "true")
      .table("graft.drift15b").writeStream
      .option("checkpointLocation", tmpDir("driftck3"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        rows3.synchronized { rows3 ++= b.collect().map(_.getLong(0)) }; ()
      }.start()
    q3.processAllAvailable()
    spark.sql("ALTER TABLE graft.drift15b ADD COLUMNS (extra BIGINT)")
    spark.sql("INSERT INTO graft.drift15b SELECT id + 50, id FROM range(2)")
    q3.processAllAvailable()
    q3.stop()
    q3.exception.foreach(throw _)
    assert(rows3.sorted == Seq(0L, 1L, 2L, 3L, 50L, 51L),
      s"opt-out keeps serving the start schema: ${rows3.sorted}")
    spark.sql("DROP TABLE graft.drift15")
    spark.sql("DROP TABLE graft.drift15b")
  }
}

class HostileZeroRunSpec extends SparkSpec {
  import graft.operators.Multimodal
  import spark.implicits._

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def box(t: String, body: Array[Byte]): Array[Byte] =
    be32(8L + body.length) ++ t.getBytes ++ body
  private val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)

  // the CttsElstSpec 3-sample track with a parameterized ctts
  private def trakOf(off: Long, ctts: Array[Byte]): Array[Byte] = {
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
      box("stbl", stts ++ ctts ++ stsc ++ stsz ++ stco))))
  }

  private def fileOf(ctts: Array[Byte]): Array[Byte] = {
    def assemble(off: Long): Array[Byte] = {
      val moov = box("moov", box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++
        be32(0) ++ be32(1000) ++ be32(120) ++ Array.fill[Byte](80)(0)) ++
        trakOf(off, ctts))
      ftyp ++ moov ++ box("mdat", Array.tabulate[Byte](70)(i => (i + 1).toByte))
    }
    assemble(assemble(0L).length - 70L)
  }

  test("a zero-count ctts run rejects the track (no silent wrong pts)") {
    // hostile shape: ctts = [(0, 500), (3, 0)] — the total still
    // matches the sample count, but the walk's run pointer advances
    // on `left == 0` AFTER a decrement, so the zero-count run would
    // stall at -1 and serve offset 500 to EVERY sample. The track
    // must degrade to zero rows instead.
    val zeroRun = box("ctts", be32(0) ++ be32(2) ++
      be32(0) ++ be32(500) ++ be32(3) ++ be32(0))
    val goodCtts = box("ctts", be32(0) ++ be32(1) ++ be32(3) ++ be32(30))
    val df = Seq((1L, fileOf(goodCtts)), (2L, fileOf(zeroRun)))
      .toDF("doc_id", "payload")
    val byDoc = Multimodal.mp4SampleMap(df, "doc_id", "payload")
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.get(1L).contains(3L), s"well-formed stub must map: $byDoc")
    assert(!byDoc.contains(2L),
      s"a zero-count ctts run must reject the track: $byDoc")
  }
}
