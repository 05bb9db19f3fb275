package graft

import org.apache.spark.sql.functions._

/** Round-14: ADVICE fixes — legacy literal-dot column names under the
  * column-DDL transforms (exact-top-level-name-wins mirrored from the
  * read side), hostile mp4 stts/stsc entry counts bounded against
  * mdat before allocation — plus the round's features (named tags,
  * streaming source, deep materialize, array-of-struct mapping,
  * ctts/elst). */
class LegacyDottedColumnDdlSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vdot").toFile
    d.delete(); d.getAbsolutePath
  }

  test("RENAME of a column literally named 'a.b' treats it as one leaf") {
    val root = freshRoot()
    // pre-nested-era shape: commit() accepts any frame column name,
    // including a literal dot — the r12 regression parsed it as a
    // struct path and failed with "no field 'a'"
    VersionedTable.commit(
      (0L until 8L).map(i => (i, i * 3L)).toDF("id", "a.b"), root)
    VersionedTable.renameColumn(spark, root, "a.b", "c")
    val cur = VersionedTable.read(spark, root)
    assert(cur.columns.toSeq == Seq("id", "c"))
    assert(cur.agg(sum("c")).as[Long].head == (0L until 8L).map(_ * 3).sum)
    // the era before the rename still reads under the literal name
    val v1 = VersionedTable.read(spark, root, 1L)
    assert(v1.columns.toSeq == Seq("id", "a.b"))
    // renaming BACK to a dotted name would re-create the ambiguity
    val e = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "c", "x.y")
    }
    assert(e.getMessage.contains("MOVE") || e.getMessage.contains("dotted"),
      e.getMessage)
  }

  test("DROP of a literal-dot column reserves ITS name, not a segment walk") {
    val root = freshRoot()
    VersionedTable.commit(
      (0L until 6L).map(i => (i, i + 10L, i + 20L)).toDF("id", "a.b", "keep"),
      root)
    VersionedTable.dropColumn(spark, root, "a.b")
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("id", "keep"))
    // the reservation is the FULL literal name: a new column 'a.b'
    // must be rejected (its on-disk slot is still owned), while a
    // column named just 'b' is free
    val e = intercept[Exception] {
      VersionedTable.addColumn(spark, root, "a.b",
        org.apache.spark.sql.types.LongType)
    }
    assert(e.getMessage.contains("no field 'a'") ||
      e.getMessage.contains("collision"), e.getMessage)
    VersionedTable.addColumn(spark, root, "b",
      org.apache.spark.sql.types.LongType)
    assert(VersionedTable.read(spark, root).columns.toSeq ==
      Seq("id", "keep", "b"))
  }

  test("a renamed struct sharing the first segment no longer mis-keys the literal column's stats") {
    val root = freshRoot()
    // struct 'a' with leaf 'b' (physical path "a.b") AND a literal
    // top-level "a.b" cannot coexist without ambiguity — but a literal
    // "a.b" alongside a PLAIN column 'a' that later gains a mapping is
    // the advice's scenario; the literal column's stats key must stay
    // "a.b" (its own name), not "<phys(a)>.b"
    val df = (0L until 8L).map(i => (i, i * 2L, i * 5L)).toDF("id", "a", "a.b")
    VersionedTable.commit(df, root, statsCols = Seq("id", "a.b"))
    VersionedTable.renameColumn(spark, root, "a", "a2")
    // a range read on the literal column still prunes/reads correctly
    val got = VersionedTable.readRange(spark, root, "a.b", "10", "25")
      .agg(count(lit(1))).as[Long].head
    assert(got == (0L until 8L).count(i => i * 5 >= 10 && i * 5 <= 25))
    // and DROP still works after the sibling rename
    VersionedTable.dropColumn(spark, root, "a.b")
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("id", "a2"))
  }
}

class HostileSampleTableBoundSpec extends SparkSpec {
  import graft.operators.Multimodal
  import spark.implicits._

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def box(t: String, body: Array[Byte]): Array[Byte] =
    be32(8L + body.length) ++ t.getBytes ++ body
  private def full(t: String, entries: Array[Byte], n: Long): Array[Byte] =
    box(t, be32(0) ++ be32(n) ++ entries)

  test("box-bounded stts/stsc counts exceeding mdat bytes abort before allocating") {
    // mdat body is 8 bytes, but a 64 KiB stts box claims 8k entries —
    // box-bounded (entries fit the box) yet impossible (8k entries
    // cover ≥8k samples > 8 mdat bytes); the fixed walk rejects the
    // count BEFORE materializing ~384 KiB of tuples per document
    val mdat = box("mdat", Array.fill[Byte](8)(0x41))
    val sttsEntries = Array.fill[Byte](8192 * 8)(0)
    val stscOk = full("stsc", be32(1) ++ be32(4) ++ be32(1), 1)
    val stszOk = full("stsz", be32(8) ++ be32(1), 0) // fixed 8, count 1
    val stcoOk = full("stco", be32(0), 1)
    def trak(stts: Array[Byte], stsc: Array[Byte]): Array[Byte] = {
      val tkhd = box("tkhd", Array.fill[Byte](4)(0) ++ be32(0) ++ be32(0) ++
        be32(1) ++ Array.fill[Byte](68)(0))
      val mdhd = box("mdhd", Array.fill[Byte](12)(0) ++ be32(1000) ++
        be32(40) ++ be32(0))
      box("trak", tkhd ++ box("mdia", mdhd ++
        box("minf", box("stbl", stts ++ stsc ++ stszOk ++ stcoOk))))
    }
    val hostileStts = mdat ++ box("moov",
      trak(full("stts", sttsEntries, 8192), stscOk))
    val hostileStsc = mdat ++ box("moov",
      trak(full("stts", be32(1) ++ be32(40), 1),
        full("stsc", Array.fill[Byte](8192 * 12)(0), 8192)))
    // and with NO mdat at all, a non-zero count is equally impossible
    val noMdat = box("moov", trak(full("stts", be32(1) ++ be32(40), 1), stscOk))
    val out = Multimodal.mp4SampleMap(
      Seq((1L, hostileStts), (2L, hostileStsc), (3L, noMdat))
        .toDF("id", "bin"), "id", "bin").collect()
    assert(out.isEmpty, s"hostile sample tables must yield zero rows, got ${out.length}")
  }
}

class TagSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag).toFile
    d.delete(); d.getAbsolutePath
  }

  test("tags pin an era by name: create, read, immutability, drop") {
    val root = freshRoot("vtag")
    VersionedTable.commit((0L until 10L).map(i => (i, i)).toDF("k", "v"), root)
    val pinned = VersionedTable.tag(spark, root, "era1")
    assert(pinned == 1L)
    VersionedTable.commit((10L until 30L).map(i => (i, i)).toDF("k", "v"),
      root, mode = "append")
    // the tag reads ITS era, whatever got committed after
    assert(VersionedTable.readTag(spark, root, "era1").count() == 10L)
    assert(VersionedTable.read(spark, root).count() == 30L)
    assert(VersionedTable.tags(spark, root) == Map("era1" -> 1L))
    // immutable: re-tagging the same name throws (first writer wins)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.tag(spark, root, "era1", 2L)
    }
    assert(e.getMessage.contains("immutable"), e.getMessage)
    // a purely numeric name would shadow VERSION AS OF
    intercept[IllegalArgumentException] {
      VersionedTable.tag(spark, root, "42")
    }
    // drop + re-point is the sanctioned move
    assert(VersionedTable.dropTag(spark, root, "era1"))
    assert(!VersionedTable.dropTag(spark, root, "era1"))
    VersionedTable.tag(spark, root, "era1", 2L)
    assert(VersionedTable.readTag(spark, root, "era1").count() == 30L)
  }

  test("vacuum refuses to retire a tagged era") {
    val root = freshRoot("vtagvac")
    VersionedTable.commit((0L until 64L).map(i => (i, i)).toDF("k", "v"), root)
    VersionedTable.tag(spark, root, "keepme") // pins v1
    // three overwrites push v1 far outside any retention window
    (0 until 3).foreach(i => VersionedTable.commit(
      (0L until 8L).map(j => (j + i * 100L, j)).toDF("k", "v"), root))
    VersionedTable.vacuum(spark, root, retainVersions = 1, graceMs = 0L)
    // the tagged era still reads in full — and so does the CHAIN from
    // the tag forward (round 15): streaming resume from the tag diffs
    // every intermediate version's manifest, so vacuum keeps the whole
    // v1..cur chain while the pin stands
    assert(VersionedTable.readTag(spark, root, "keepme").count() == 64L)
    assert(VersionedTable.read(spark, root, 2L).count() == 8L)
    // dropping the tag releases the chain to the NEXT vacuum
    VersionedTable.dropTag(spark, root, "keepme")
    VersionedTable.vacuum(spark, root, retainVersions = 1, graceMs = 0L)
    intercept[Exception] { VersionedTable.read(spark, root, 1L).collect() }
    intercept[Exception] { VersionedTable.read(spark, root, 2L).collect() }
  }

  test("pure-SQL surface: CALL graft.tag / drop_tag, VERSION AS OF 'name', vt_read('t@name')") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.tagt")
    spark.sql("CREATE TABLE graft.tagt AS SELECT id AS k FROM range(50)")
    val v = spark.sql("CALL graft.tag('tagt', 'v1-corpus')").head().getLong(0)
    assert(v == 2L, s"CTAS = empty v1 + insert v2, got $v")
    spark.sql("INSERT INTO graft.tagt SELECT id + 100 FROM range(25)")
    assert(spark.sql("SELECT count(*) FROM graft.tagt").head().getLong(0) == 75L)
    assert(spark.sql(
      "SELECT count(*) FROM graft.tagt VERSION AS OF 'v1-corpus'")
      .head().getLong(0) == 50L)
    assert(spark.sql("SELECT count(*) FROM vt_read('tagt@v1-corpus')")
      .head().getLong(0) == 50L)
    // discovery: a SQL-only client lists the pins before reading one
    assert(spark.sql("SELECT tag, version FROM vt_tags('tagt')").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("v1-corpus", 2L)))
    assert(spark.sql("CALL graft.drop_tag('tagt', 'v1-corpus')")
      .head().getBoolean(0))
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.tagt VERSION AS OF 'v1-corpus'").collect()
    }
    spark.sql("DROP TABLE graft.tagt")
  }
}

class DeepMaterializeSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag).toFile
    d.delete(); d.getAbsolutePath
  }
  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
  }

  test("materialize(allRetained) localizes the full history: pre-fork eras survive source drop") {
    val src = freshRoot("vdmsrc"); val dst = freshRoot("vdmdst")
    VersionedTable.commit(
      (0L until 256L).map(i => (i, i * 2L)).toDF("k", "v")
        .repartitionByRange(4, col("k")), src, statsCols = Seq("k"))
    VersionedTable.deleteWhereDv(spark, src, "k % 50 = 3")
    VersionedTable.shardManifest(spark, src, targetFilesPerShard = 2)
    VersionedTable.clone(spark, src, dst)
    val prefork = VersionedTable.read(spark, dst, 1L).collect().toSet
    // clone-local history AFTER the fork: v2 append, v3 DV delete —
    // v2's manifest still references source files and must localize too
    VersionedTable.commit(Seq((9000L, 1L)).toDF("k", "v"), dst, mode = "append")
    val v2rows = VersionedTable.read(spark, dst, 2L).collect().toSet
    VersionedTable.deleteWhereDv(spark, dst, "k = 0")
    val cur = VersionedTable.read(spark, dst).collect().toSet
    val v = VersionedTable.materialize(spark, dst, allRetained = true)
    assert(v == 4L, s"3 commits + materialize commit = v4, got $v")
    // EVERY retained manifest is now self-contained
    (1L to 4L).foreach { ver =>
      val snap = VersionedTable.snapshot(spark, dst, ver)
      assert(snap.files.forall(_.startsWith(dst)),
        s"v$ver still references foreign files after deep materialize")
    }
    rm(new java.io.File(src)) // the source dies WITHOUT any vacuum
    assert(VersionedTable.read(spark, dst, 1L).collect().toSet == prefork,
      "the pre-fork era must read row-equal after source drop")
    assert(VersionedTable.read(spark, dst, 2L).collect().toSet == v2rows)
    assert(VersionedTable.read(spark, dst).collect().toSet == cur)
    // and the change feed across the fork history still answers
    assert(VersionedTable.changesBetween(spark, dst, 1L, 2L)
      .filter("_change_type = 'insert'").count() == 1L)
  }

  test("shallow materialize still leaves old manifests foreign (the documented default)") {
    val src = freshRoot("vdm2src"); val dst = freshRoot("vdm2dst")
    VersionedTable.commit((0L until 32L).map(i => (i, i)).toDF("k", "v"), src)
    VersionedTable.clone(spark, src, dst)
    VersionedTable.commit(Seq((99L, 9L)).toDF("k", "v"), dst, mode = "append")
    VersionedTable.materialize(spark, dst) // default: current only
    assert(VersionedTable.snapshot(spark, dst, 1L).files
      .exists(!_.startsWith(dst)),
      "default materialize must not rewrite historic manifests")
  }
}

class GraftStreamSourceSpec extends SparkSpec {
  import graft.sources.VersionedTable

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def runAvailableNow(df: org.apache.spark.sql.DataFrame,
                              ckpt: String)
                             (sink: (org.apache.spark.sql.DataFrame, Long) => Unit): Unit = {
    val q = df.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(sink)
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive, "AvailableNow query must terminate")
    q.exception.foreach(throw _)
  }

  test("readStream.table: initial snapshot, then appends, exactly-once across a restart") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.st1")
    spark.sql("CREATE TABLE graft.st1 AS SELECT id AS k FROM range(20)")
    val ckpt = tmpDir("stckpt")
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Seq[Long])]()
    def sink(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      got.synchronized { got += ((id, b.collect().map(_.getLong(0)).toSeq)) }
    // RUN 1 — the initial snapshot
    runAvailableNow(
      spark.readStream.option("skipChangeCommits", "true").table("graft.st1"),
      ckpt)(sink)
    assert(got.flatMap(_._2).sorted == (0L until 20L),
      s"snapshot must deliver the full table once, got ${got.map(_._2.size)}")
    // between runs: an append (streams), a DV DELETE and a RESTORE
    // (data-change commits — skipped), then another append
    spark.sql("INSERT INTO graft.st1 SELECT id + 100 FROM range(5)")
    spark.sql("DELETE FROM graft.st1 WHERE k = 3")
    spark.sql("CALL graft.restore('st1', 2)") // back to the 20-row era
    spark.sql("INSERT INTO graft.st1 SELECT id + 200 FROM range(7)")
    // RUN 2 — same checkpoint: ONLY the two appends' rows, no snapshot
    // replay, no duplicate of anything from run 1
    val before = got.size
    runAvailableNow(
      spark.readStream.option("skipChangeCommits", "true").table("graft.st1"),
      ckpt)(sink)
    val newRows = got.drop(before).flatMap(_._2)
    assert(newRows.sorted ==
      ((100L until 105L) ++ (200L until 207L)).sorted,
      s"restart must deliver exactly the appends, got ${newRows.sorted}")
    // exactly-once overall: nothing delivered twice
    val all = got.flatMap(_._2)
    assert(all.size == all.distinct.size, "duplicate delivery detected")
    spark.sql("DROP TABLE graft.st1")
  }

  test("a data-change commit fails the stream loudly without skipChangeCommits") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.st2")
    spark.sql("CREATE TABLE graft.st2 AS SELECT id AS k FROM range(10)")
    val ckpt = tmpDir("stckpt2")
    runAvailableNow(spark.readStream.table("graft.st2"), ckpt)((_, _) => ())
    spark.sql("DELETE FROM graft.st2 WHERE k = 1") // DV growth
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runAvailableNow(spark.readStream.table("graft.st2"), ckpt)((_, _) => ())
    }
    val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
    assert(msg.contains("skipChangeCommits"),
      s"the failure must name the option: $msg")
    spark.sql("DROP TABLE graft.st2")
  }

  test("maxVersionsPerBatch paces delivery; startingVersion=latest skips the snapshot") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.st3")
    spark.sql("CREATE TABLE graft.st3 AS SELECT id AS k FROM range(4)")
    (0 until 3).foreach(i =>
      spark.sql(s"INSERT INTO graft.st3 SELECT id + ${10 * (i + 1)} FROM range(2)"))
    val ckpt = tmpDir("stckpt3")
    var batches = 0
    var rows = 0L
    runAvailableNow(
      spark.readStream.option("maxVersionsPerBatch", "1").table("graft.st3"),
      ckpt) { (b, _) => val n = b.count(); if (n > 0) { batches += 1; rows += n } }
    // snapshot batch (v5 era: all 10 rows) — deltas beyond it are
    // already inside the snapshot version
    assert(rows == 10L, s"expected all 10 rows, got $rows")
    // now three more appends pace out one version per micro-batch
    (0 until 3).foreach(i =>
      spark.sql(s"INSERT INTO graft.st3 SELECT id + ${100 * (i + 1)} FROM range(2)"))
    var deltaBatches = 0
    runAvailableNow(
      spark.readStream.option("maxVersionsPerBatch", "1").table("graft.st3"),
      ckpt) { (b, _) => if (b.count() > 0) deltaBatches += 1 }
    assert(deltaBatches == 3,
      s"3 appended versions at maxVersionsPerBatch=1 = 3 batches, got $deltaBatches")
    // startingVersion=latest: a fresh stream sees ONLY what comes next
    val ckpt2 = tmpDir("stckpt3b")
    var lateRows = Seq.empty[Long]
    runAvailableNow(
      spark.readStream.option("startingVersion", "latest").table("graft.st3"),
      ckpt2) { (b, _) => lateRows ++= b.collect().map(_.getLong(0)) }
    assert(lateRows.isEmpty, s"latest must skip history, got $lateRows")
    spark.sql("INSERT INTO graft.st3 SELECT id + 900 FROM range(3)")
    runAvailableNow(
      spark.readStream.option("startingVersion", "latest").table("graft.st3"),
      ckpt2) { (b, _) => lateRows ++= b.collect().map(_.getLong(0)) }
    assert(lateRows.sorted == (900L until 903L),
      s"only the post-start append streams, got ${lateRows.sorted}")
    spark.sql("DROP TABLE graft.st3")
  }

  test("composed: graft-to-graft streaming replication through versionedCommitSink") {
    SparkEntry.configure(spark)
    spark.sql("DROP TABLE IF EXISTS graft.srcrep")
    spark.sql("CREATE TABLE graft.srcrep AS SELECT id AS k, id * 2 AS v FROM range(50)")
    val dstRoot = tmpDir("streprep") + "/dst"
    val ckpt = tmpDir("stckpt4")
    def replicate(): Unit = {
      val q = spark.readStream.option("skipChangeCommits", "true")
        .table("graft.srcrep")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          if (id > VersionedTable.lastBatchId(b.sparkSession, dstRoot)) {
            VersionedTable.commit(b, dstRoot, mode = "append",
              meta = Map("batch" -> id.toString))
            ()
          } else ()
        }.start()
      q.awaitTermination(120000)
      q.exception.foreach(throw _)
    }
    replicate()
    assert(VersionedTable.read(spark, dstRoot).count() == 50L)
    spark.sql("INSERT INTO graft.srcrep SELECT id + 1000, id FROM range(8)")
    replicate()
    // the replica matches the source exactly — exactly-once riding the
    // checkpointed offsets AND the sink's #batch watermark
    val src = spark.sql("SELECT * FROM graft.srcrep").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dst = VersionedTable.read(spark, dstRoot).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dst == src, s"replica diverged: ${dst.size} vs ${src.size}")
    // replaying the LAST batch against the sink is a no-op (watermark)
    replicate()
    assert(VersionedTable.read(spark, dstRoot).count() == 58L)
    spark.sql("DROP TABLE graft.srcrep")
  }
}

class CttsElstSpec extends SparkSpec {
  import graft.operators.Multimodal
  import spark.implicits._

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def box(t: String, body: Array[Byte]): Array[Byte] =
    be32(8L + body.length) ++ t.getBytes ++ body
  private val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)

  // one 3-sample track (32/32/6 bytes, 40ms deltas) with optional
  // ctts and elst boxes, stco at `off`
  private def trakOf(off: Long, ctts: Array[Byte] = Array.empty,
                     edts: Array[Byte] = Array.empty,
                     sttsOverride: Array[Byte] = null): Array[Byte] = {
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++
      be32(1) ++ be32(0) ++ be32(120) ++ Array.fill[Byte](60)(0))
    val mdhd = box("mdhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(120) ++ be32(0))
    val stts = if (sttsOverride != null) sttsOverride
      else box("stts", be32(0) ++ be32(1) ++ be32(3) ++ be32(40))
    val stsc = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(4) ++ be32(1))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(3) ++
      be32(32) ++ be32(32) ++ be32(6))
    val stco = box("stco", be32(0) ++ be32(1) ++ be32(off))
    box("trak", tkhd ++ edts ++ box("mdia", mdhd ++ box("minf",
      box("stbl", stts ++ ctts ++ stsc ++ stsz ++ stco))))
  }

  private def fileOf(traks: Long => Seq[Array[Byte]]): Array[Byte] = {
    def assemble(off: Long): Array[Byte] = {
      val moov = box("moov", box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++
        be32(0) ++ be32(1000) ++ be32(120) ++ Array.fill[Byte](80)(0)) ++
        traks(off).reduce(_ ++ _))
      ftyp ++ moov ++ box("mdat", Array.tabulate[Byte](70)(i => (i + 1).toByte))
    }
    assemble(assemble(0L).length - 70L)
  }

  private def mapOf(bytes: Array[Byte]): Map[Long, (Long, Long)] =
    Multimodal.mp4SampleMap(Seq((1L, bytes)).toDF("id", "bin"), "id", "bin")
      .collect().map(r => r.sample_idx -> (r.dts_ms, r.pts_ms)).toMap

  test("ctts version 1 SIGNED offsets and an elst shift combine into pts") {
    // ctts v1: two runs — first sample -15, next two +30
    val ctts = box("ctts", Array[Byte](1, 0, 0, 0) ++ be32(2) ++
      be32(1) ++ be32(0xFFFFFFF1L) ++ be32(2) ++ be32(30)) // -15, +30
    val got = mapOf(fileOf(off => Seq(trakOf(off, ctts = ctts))))
    assert(got == Map(0L -> ((0L, -15L)), 1L -> ((40L, 70L)),
      2L -> ((80L, 110L))), s"signed ctts must shift pts: $got")
  }

  test("elst media_time shifts presentation; empty edits delay it") {
    // media_time=20 at rate 1.0: presentation starts 20 media units in
    val shift = box("edts", box("elst", be32(0) ++ be32(1) ++
      be32(120) ++ be32(20) ++ be32(0x00010000L)))
    val g1 = mapOf(fileOf(off => Seq(trakOf(off, edts = shift))))
    assert(g1 == Map(0L -> ((0L, -20L)), 1L -> ((40L, 20L)),
      2L -> ((80L, 60L))), s"elst shift: $g1")
    // an EMPTY edit (media_time = -1) of 100 movie units delays the
    // whole track (movie ts == media ts == 1000 here)
    val delay = box("edts", box("elst", be32(0) ++ be32(2) ++
      be32(100) ++ be32(0xFFFFFFFFL) ++ be32(0x00010000L) ++
      be32(120) ++ be32(0) ++ be32(0x00010000L)))
    val g2 = mapOf(fileOf(off => Seq(trakOf(off, edts = delay))))
    assert(g2 == Map(0L -> ((0L, 100L)), 1L -> ((40L, 140L)),
      2L -> ((80L, 180L))), s"empty-edit delay: $g2")
  }

  test("unsupported-but-valid elst shapes skip THE TRACK, not the document") {
    // track 1: a multi-segment edit (two non-empty entries) — beyond
    // the model, skipped; track 2 (plain) must still emit its rows
    val multi = box("edts", box("elst", be32(0) ++ be32(2) ++
      be32(60) ++ be32(0) ++ be32(0x00010000L) ++
      be32(60) ++ be32(0) ++ be32(0x00010000L)))
    def trak2(off: Long): Array[Byte] = {
      // same track with id 2 (patch tkhd track_id)
      val t = trakOf(off)
      val idx = t.indexOfSlice("tkhd".getBytes) + 4 + 12
      t.updated(idx + 3, 2.toByte)
    }
    val rows = Multimodal.mp4SampleMap(
      Seq((1L, fileOf(off => Seq(trakOf(off, edts = multi), trak2(off)))))
        .toDF("id", "bin"), "id", "bin")
      .collect()
    assert(rows.map(_.track_id).distinct.toSeq == Seq(2L),
      s"multi-segment-edit track skipped, plain track kept: ${rows.length}")
  }

  test("hostile ctts degrades the document to zero rows") {
    // count disagreement: ctts covers 2 samples, stsz says 3
    val short = box("ctts", be32(0) ++ be32(1) ++ be32(2) ++ be32(10))
    assert(mapOf(fileOf(off => Seq(trakOf(off, ctts = short)))).isEmpty)
    // box-bounded count exceeding mdat bytes (allocation amplification)
    val huge = box("ctts", be32(0) ++ be32(4096) ++
      Array.fill[Byte](4096 * 8)(0))
    assert(mapOf(fileOf(off => Seq(trakOf(off, ctts = huge)))).isEmpty)
    // a hostile UNSIGNED v0 offset that would overflow the ms multiply
    val wrap = box("ctts", be32(0) ++ be32(1) ++ be32(3) ++ be32(0xFFFFFFF0L))
    val g = mapOf(fileOf(off => Seq(trakOf(off, ctts = wrap))))
    // v0 offsets are unsigned: +4294967280 media units is bounded fine
    // (no overflow at ms conversion) — the map stays exact
    assert(g(0L) == ((0L, 4294967280L)), s"unsigned v0 ctts: $g")
  }
}

class ArrayElementMappingSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable
  import org.apache.spark.sql.types._

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("varr").toFile
    d.delete(); d.getAbsolutePath
  }

  private def dataFiles(root: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(root, "data"))
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSet
  }

  private def mk(root: String): Unit = {
    val df = (0L until 32L).map(i => (i, Seq((i, i * 10L), (i + 1, i * 20L))))
      .toDF("id", "pairs")
      .select(col("id"), expr(
        "transform(pairs, p -> named_struct('ts', p._1, 'amt', p._2))")
        .as("events"))
    VersionedTable.commit(df, root, statsCols = Seq("id"))
  }

  test("array-of-struct element rename/add/drop are metadata-only; eras time-travel") {
    val root = freshRoot()
    mk(root)
    val before = dataFiles(root)
    VersionedTable.renameColumn(spark, root, "events.element.amt", "amount")
    VersionedTable.addColumn(spark, root, "events.element.note", LongType)
    assert(dataFiles(root) == before,
      "element-field DDL must write ZERO data files")
    val cur = VersionedTable.read(spark, root)
    val est = cur.schema("events").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(est.fieldNames.toSeq == Seq("ts", "amount", "note"))
    // values ride the rename; the added field NULL-backfills per element
    val got = cur.selectExpr("id", "explode(events) AS e")
      .selectExpr("sum(e.amount)", "count(e.note)").head()
    assert(got.getLong(0) == (0L until 32L).map(i => i * 30L).sum)
    assert(got.getLong(1) == 0L, "added element field must be NULL on old files")
    // the pre-rename era answers under ITS element names
    val v1 = VersionedTable.read(spark, root, 1L)
      .selectExpr("explode(events) AS e").selectExpr("sum(e.amt)").head()
    assert(v1.getLong(0) == (0L until 32L).map(i => i * 30L).sum)
    // drop an element field: gone now, still present in the v1 era
    VersionedTable.dropColumn(spark, root, "events.element.ts")
    assert(VersionedTable.read(spark, root).schema("events").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("amount", "note"))
    assert(dataFiles(root) == before)
  }

  test("maps, non-struct elements, and the 'element' name stay precisely rejected") {
    val root = freshRoot()
    val df = (0L until 8L).map(i => (i, Seq(i, i + 1), Map("a" -> i)))
      .toDF("id", "nums", "m")
    VersionedTable.commit(df, root)
    // non-struct array element: no '.element.' hop to offer
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "nums.element.x", "y")
    }
    assert(e1.getMessage.contains("not a struct"), e1.getMessage)
    // maps are not addressable
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "m.key", "y")
    }
    assert(e2.getMessage.contains("not a struct"), e2.getMessage)
    // 'element' is a reserved path segment, not a legal field name
    val e3 = intercept[IllegalArgumentException] {
      VersionedTable.addColumn(spark, root, "element", LongType)
    }
    assert(e3.getMessage.contains("reserved"), e3.getMessage)
  }
}

class GraftCdcStreamSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def drain(root: String, ckpt: String,
                    opts: Map[String, String] = Map.empty)
      : Seq[(Long, String, Long)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    var r = spark.readStream.format("graft-cdc").option("table", root)
    opts.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load().writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(row =>
          (row.getLong(0), row.getString(row.length - 2),
            row.getLong(row.length - 1))) }
        ()
      }.start()
    q.awaitTermination(120000)
    q.exception.foreach(throw _)
    out.toSeq
  }

  test("the CDC stream is the per-version replay of the batch change feed") {
    val root = tmpDir("cdcstream") + "/t"
    VersionedTable.commit((0L until 20L).map(i => (i, i)).toDF("k", "v"), root)
    VersionedTable.commit((100L until 105L).map(i => (i, i)).toDF("k", "v"),
      root, mode = "append")
    VersionedTable.deleteWhereDv(spark, root, "k % 7 = 3")
    VersionedTable.restore(spark, root, 2L) // DV shrink: rows resurface
    VersionedTable.commit((200L until 203L).map(i => (i, i)).toDF("k", "v"),
      root, mode = "overwrite") // delete+insert pairs
    val cur = VersionedTable.currentVersion(spark, root)
    assert(cur == 5L)
    // streamed from the very beginning: version 1 diffs against the
    // empty pre-table state
    val got = drain(root, tmpDir("cdcck"),
      Map("startingVersion" -> "1", "maxVersionsPerBatch" -> "1"))
    // bag-equal to the batch change feed, version by version
    val want = (1L to cur).flatMap { v =>
      val changes =
        if (v == 1) VersionedTable.read(spark, root, 1L)
          .withColumn("_change_type",
            org.apache.spark.sql.functions.lit("insert"))
        else VersionedTable.changesBetween(spark, root, v - 1, v)
      changes.collect().map(r => (r.getLong(0), r.getString(2), v))
    }
    assert(got.sorted == want.sorted,
      s"CDC stream diverged from the batch feed:\n got ${got.sorted.take(8)}" +
        s"\nwant ${want.sorted.take(8)} (sizes ${got.size} vs ${want.size})")
    // spot semantics: the delete commit carries exactly the DV'd keys,
    // the restore resurfaces exactly them
    val dels = got.filter(t => t._3 == 3L)
    assert(dels.forall(_._2 == "delete") &&
      dels.map(_._1).sorted == Seq(3L, 10L, 17L, 101L))
    val resur = got.filter(t => t._3 == 4L)
    assert(resur.forall(_._2 == "insert") &&
      resur.map(_._1).sorted == Seq(3L, 10L, 17L, 101L))
  }

  test("CDC restart is exactly-once; snapshot start emits inserts at the pinned version") {
    val root = tmpDir("cdcstream2") + "/t"
    VersionedTable.commit((0L until 10L).map(i => (i, i)).toDF("k", "v"), root)
    val ckpt = tmpDir("cdcck2")
    val run1 = drain(root, ckpt) // default: snapshot of v1
    assert(run1.map(_._1).sorted == (0L until 10L) &&
      run1.forall(t => t._2 == "insert" && t._3 == 1L))
    VersionedTable.deleteWhereDv(spark, root, "k = 4")
    VersionedTable.commit(Seq((50L, 1L)).toDF("k", "v"), root, mode = "append")
    val run2 = drain(root, ckpt)
    assert(run2.sorted == Seq((4L, "delete", 2L), (50L, "insert", 3L)),
      s"restart must deliver exactly the two commits: $run2")
    // idle re-run: nothing
    assert(drain(root, ckpt).isEmpty)
  }
}

class TagStartStreamSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("startingVersion accepts a tag name: resume AFTER the pinned era") {
    val root = tmpDir("tagstart") + "/t"
    VersionedTable.commit((0L until 12L).map(i => (i, i)).toDF("k", "v"), root)
    VersionedTable.tag(spark, root, "processed-v1")
    VersionedTable.commit((100L until 104L).map(i => (i, i)).toDF("k", "v"),
      root, mode = "append")
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-cdc")
      .option("table", root).option("startingVersion", "processed-v1")
      .load().writeStream
      .option("checkpointLocation", tmpDir("tagck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(_.getLong(0)) }; ()
      }.start()
    q.awaitTermination(120000)
    q.exception.foreach(throw _)
    assert(out.sorted == (100L until 104L),
      s"a tag start must deliver only what landed AFTER the pin: ${out.sorted}")
    // an unknown tag fails with the available pins named
    val e = intercept[Exception] {
      spark.readStream.format("graft-cdc")
        .option("table", root).option("startingVersion", "nope")
        .load().writeStream
        .option("checkpointLocation", tmpDir("tagck2"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .start().awaitTermination(60000)
    }
    assert(e.toString.contains("processed-v1") ||
      Option(e.getCause).exists(_.toString.contains("processed-v1")),
      s"the failure should name the available tags: $e")
  }
}
