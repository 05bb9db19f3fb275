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
    // the tagged era still reads in full; untagged mid-history is gone
    assert(VersionedTable.readTag(spark, root, "keepme").count() == 64L)
    intercept[Exception] { VersionedTable.read(spark, root, 2L).collect() }
    // dropping the tag releases the era to the NEXT vacuum
    VersionedTable.dropTag(spark, root, "keepme")
    VersionedTable.vacuum(spark, root, retainVersions = 1, graceMs = 0L)
    intercept[Exception] { VersionedTable.read(spark, root, 1L).collect() }
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
