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
