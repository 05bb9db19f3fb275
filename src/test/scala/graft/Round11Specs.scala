package graft

import org.apache.spark.sql.functions._

/** Round-11 compound-predicate data skipping: on a z-order-clustered
  * sharded table, a two-column conjunctive prune must open STRICTLY
  * fewer shards AND files than either single-column prune — the
  * "partition date AND key range" scan every clustered 100-TB table
  * serves. Layout is exact by construction: 64×64 key grid in Morton
  * order → each of 256 files is one aligned 4×4 block, each of 16
  * shards one aligned 16×16 block, so per-column bounding boxes make
  * the expected open counts computable, not sampled. */
class CompoundPruneSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vconj").toFile
    d.delete(); d.getAbsolutePath
  }

  /** bit-interleave two 6-bit coords (a even bits, b odd bits) */
  private def morton(a: Int, b: Int): Long =
    (0 until 6).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1).toLong << (2 * i)) |
        (((b >> i) & 1).toLong << (2 * i + 1))
    }

  test("conjunctive prune opens strictly fewer shards AND files than either single-column prune") {
    val root = freshRoot()
    val rows = for (a <- 0 until 64; b <- 0 until 64)
      yield (a.toLong, b.toLong, morton(a, b), a.toLong * 64 + b)
    val df = rows.toDF("a", "b", "m", "v")
      // exact 4×4-block files: partition id = morton/16, laid out in
      // morton order so shardManifest's consecutive-16 grouping forms
      // aligned 16×16 shard blocks
      .repartitionByRange(256, col("m"))
      .sortWithinPartitions("m")
    // the cluster key LEADS statsCols: shardManifest's locality sort
    // keys on the first stats column, so leading with m preserves the
    // z-order (leading with a would re-slab the table by a and destroy
    // b's clustering — the footgun this ordering convention avoids)
    VersionedTable.commit(df, root, statsCols = Seq("m", "a", "b"))
    VersionedTable.shardManifest(spark, root, targetFilesPerShard = 16)

    val da = VersionedTable.prunedFilesDetail(spark, root,
      Seq(("a", "16", "31")), -1L)
    val db = VersionedTable.prunedFilesDetail(spark, root,
      Seq(("b", "32", "47")), -1L)
    val dab = VersionedTable.prunedFilesDetail(spark, root,
      Seq(("a", "16", "31"), ("b", "32", "47")), -1L)

    assert(da.shardsTotal == 16 && da.totalFiles == 256)
    // each single-column slab is 1/4 of one axis: ~4 of 16 shards,
    // ~64 of 256 files (repartitionByRange samples boundaries, so
    // allow one block of slack but keep the geometry meaningful)
    assert(da.shardsOpened >= 2 && da.shardsOpened <= 6, s"a-prune shards ${da.shardsOpened}")
    assert(db.shardsOpened >= 2 && db.shardsOpened <= 6, s"b-prune shards ${db.shardsOpened}")
    // the conjunction: ~1 shard (the 16×16 block at a-block 1 × b-block 2)
    assert(dab.shardsOpened < da.shardsOpened && dab.shardsOpened < db.shardsOpened,
      s"compound must beat both single prunes on shards: " +
        s"${dab.shardsOpened} vs a=${da.shardsOpened}, b=${db.shardsOpened}")
    assert(dab.kept.size < da.kept.size && dab.kept.size < db.kept.size,
      s"compound must beat both single prunes on files: " +
        s"${dab.kept.size} vs a=${da.kept.size}, b=${db.kept.size}")

    // exactness: the compound read returns exactly the conjunction's rows
    val got = VersionedTable.readRange(spark, root,
      Seq(("a", "16", "31"), ("b", "32", "47")), -1L)
      .select("v").as[Long].collect().sorted.toSeq
    val want = (for (a <- 16 to 31; b <- 32 to 47) yield a.toLong * 64 + b).sorted
    assert(got == want)
  }

  test("a conjunct without recorded stats stays conservative (no lost rows)") {
    val root = freshRoot()
    val df = (0L until 512L).toDF("k")
      .withColumn("u", col("k") * 7 % 512) // no stats recorded for u
      .repartitionByRange(8, col("k"))
    VersionedTable.commit(df, root, statsCols = Seq("k"))
    val d = VersionedTable.prunedFilesDetail(spark, root,
      Seq(("k", "0", "63"), ("u", "0", "10")), -1L)
    // k admits ~1 of 8 files; the stats-less u conjunct must not cut more
    assert(d.kept.size >= 1 && d.kept.size <= 2, s"kept ${d.kept.size}")
    val got = VersionedTable.readRange(spark, root,
      Seq(("k", "0", "63"), ("u", "0", "10")), -1L).count()
    val want = (0L until 512L).count(k => k <= 63 && (k * 7 % 512) <= 10)
    assert(got == want)
  }
}

/** Round-11 (advice): updateWhereDv evaluates every set expression
  * against the PRE-update row — SQL UPDATE semantics; a set expression
  * referencing another updated column must see the original value,
  * regardless of Map iteration order. */
class UpdatePreUpdateRowSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vupd").toFile
    d.delete(); d.getAbsolutePath
  }

  test("set expressions see the original row, not earlier assignments") {
    val root = freshRoot()
    // 5 set entries (Scala switches to hash-driven Map iteration at
    // 5+) with cross-references in BOTH directions (a reads b, b reads
    // a; d reads e, e reads d) — ANY assignment applied before another
    // that reads its column flips a value below.
    VersionedTable.commit(
      Seq((1L, 1L, 2L, 3L, 4L, 5L), (2L, 10L, 20L, 30L, 40L, 50L))
        .toDF("id", "a", "b", "c", "d", "e"), root)
    VersionedTable.updateWhereDv(spark, root, "id = 1", Map(
      "a" -> "b + c",   // pre: 2+3 = 5
      "b" -> "a * 10",  // pre: 1*10 = 10 (a already reassigned above)
      "c" -> "a + e",   // pre: 1+5 = 6
      "d" -> "e - b",   // pre: 5-2 = 3
      "e" -> "d + 100"  // pre: 4+100 = 104 (d already reassigned above)
    ))
    val r1 = VersionedTable.read(spark, root).filter(col("id") === 1).head()
    val got = Seq("a", "b", "c", "d", "e").map(c => r1.getAs[Long](c))
    assert(got == Seq(5L, 10L, 6L, 3L, 104L),
      s"every set expression must read the PRE-update row; got $got")
    val r2 = VersionedTable.read(spark, root).filter(col("id") === 2).head()
    assert(Seq("a", "b", "c", "d", "e").map(c => r2.getAs[Long](c)) ==
      Seq(10L, 20L, 30L, 40L, 50L), "untouched row must be unchanged")
  }
}

/** Round-11 (advice): sniffHeaders must treat hostile RIFF chunk sizes
  * (declared size near 0xFFFFFFFF) as chunk-not-found → 'unknown',
  * never an ArrayIndexOutOfBounds that fails the whole corpus scan. */
class HostileRiffSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Multimodal

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  test("declared chunk size near 0xFFFFFFFF comes back unknown, not a crash") {
    val hostile = "RIFF".getBytes ++ le32(0xFFFFFFF0L) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(0xFFFFFFF0L) ++ Array.fill[Byte](64)(0)
    // a second variant whose wrap would land the offset NEGATIVE
    val hostile2 = "RIFF".getBytes ++ le32(36L) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(0xFFFFFFFFL) ++ Array.fill[Byte](64)(0)
    val out = Multimodal.sniffHeaders(
      Seq(1L -> hostile, 2L -> hostile2).toDF("id", "bin"), "id", "bin")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unknown", 2L -> "unknown"))
  }

  test("a benign JUNK chunk before fmt still parses as wav") {
    val fmt = "fmt ".getBytes ++ le32(16) ++
      Array[Byte](1, 0, 2, 0) ++ le32(44100) ++ le32(176400) ++
      Array[Byte](4, 0, 16, 0)
    val data = "data".getBytes ++ le32(400) // 100 frames @ 2ch×16bit = 4 B/frame
    val wav = "RIFF".getBytes ++ le32(4 + 8 + 16 + 8 + 8) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(4) ++ Array.fill[Byte](4)(0) ++ fmt ++ data
    val r = Multimodal.sniffHeaders(Seq(3L -> wav).toDF("id", "bin"), "id", "bin")
      .collect().head
    assert((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ("wav", 100L, 44100L, 16L))
  }
}

/** Round-11 (advice): bloom builds emit an all-zero entry for files
  * whose indexed column is entirely null — exact (an equality probe
  * never matches null), the file is CUT from point lookups, and
  * incremental coverage converges so the no-op path actually fires. */
class BloomAllNullSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vbnull").toFile
    d.delete(); d.getAbsolutePath
  }

  test("all-null file gets a zero bitset, is pruned on probe, and incremental no-ops") {
    val root = freshRoot()
    VersionedTable.commit(
      (0L until 50L).toDF("k").withColumn("v", lit(null).cast("string"))
        .coalesce(1), root)
    VersionedTable.commit(
      (50L until 100L).toDF("k").withColumn("v", concat(lit("u"), col("k")))
        .coalesce(1), root, mode = "append")
    val v = VersionedTable.buildBloomIndex(spark, root, "v")
    val idxDir = s"$root/_index/bloom_v/v$v"
    val idx = spark.read.parquet(idxDir)
    assert(idx.count() == 2, "every scanned file needs an entry, all-null included")
    val zero = idx.filter(col("n_rows") === 0L).collect()
    assert(zero.length == 1, "exactly one all-null file")
    assert(zero.head.getSeq[Long](zero.head.fieldIndex("words")).forall(_ == 0L))

    // incremental with nothing new must be a true no-op: same version,
    // index bytes untouched
    val f = java.nio.file.Paths.get(idxDir)
    val before = java.nio.file.Files.list(f).toArray.map(_.toString).sorted.toSeq
    val mt = before.map(p => java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(p)).toMillis)
    val v2 = VersionedTable.buildBloomIndexIncremental(spark, root, "v")
    assert(v2 == v, "no-op must return the covered version")
    val after = java.nio.file.Files.list(f).toArray.map(_.toString).sorted.toSeq
    val mt2 = after.map(p => java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(p)).toMillis)
    assert(after == before && mt2 == mt, "no-op must not rewrite the index")

    // the probe: all-null file provably lacks every bit → opened == 1
    val (opened, statsKept, total) =
      VersionedTable.bloomPruneDetail(spark, root, "v", "u75")
    assert(total == 2 && statsKept >= 1 && opened == 1,
      s"opened=$opened statsKept=$statsKept total=$total")
    assert(VersionedTable.readEq(spark, root, "v", "u75")
      .select("k").as[Long].collect().toSeq == Seq(75L))
  }
}

/** Round-11: pure-Scala baseline gray JPEG — engine-deterministic
  * lossy decode (strict FP + StrictMath DCT basis), retiring the
  * round-10 same-JVM-only caveat. Pins: exact geometry, tight luma
  * fidelity, byte-stable encode (golden md5), ImageIO cross-decode
  * agreement (the stream is conformant JFIF, not a private format),
  * and m10's deviation bound with headroom. */
class GrayJpegSpec extends SparkSpec {
  import graft.operators.GrayJpeg

  private def raster(n: Int): Array[Byte] =
    Array.tabulate(n)(i => (32 + (i * 37 + i * i % 41) % 95).toByte)

  test("round trip: exact geometry, per-pixel error small, block-sum error tiny") {
    val w = 32; val h = 13 // non-multiple-of-8 height exercises padding
    val px = raster(w * h)
    val jpg = GrayJpeg.encode(px, w, h)
    val (dw, dh, out) = GrayJpeg.decode(jpg)
    assert((dw, dh) == (w, h))
    val maxErr = (0 until w * h).map(i => math.abs((px(i) & 0xFF) - (out(i) & 0xFF))).max
    assert(maxErr <= 48, s"per-pixel error $maxErr") // noisy blocks ring; sums matter
    val sumErr = math.abs(px.map(_ & 0xFF).map(_.toLong).sum -
      out.map(_ & 0xFF).map(_.toLong).sum)
    assert(sumErr <= w * h * 2, s"luma-sum deviation $sumErr over ${w * h} px")
  }

  test("encode is byte-deterministic and decode is a pure function (golden md5)") {
    val px = raster(32 * 9)
    val a = GrayJpeg.encode(px, 32, 9); val b = GrayJpeg.encode(px, 32, 9)
    assert(java.util.Arrays.equals(a, b))
    val d1 = GrayJpeg.decode(a)._3; val d2 = GrayJpeg.decode(b)._3
    assert(java.util.Arrays.equals(d1, d2))
    // golden pin: any JVM/platform must reproduce these digests
    // bit-exactly (strict FP is the JVM spec since Java 17; the DCT
    // basis comes from StrictMath/fdlibm)
    def md5(x: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(x)
        .map("%02x".format(_)).mkString
    val goldenEnc = GrayJpegGolden.encodedMd5
    val goldenDec = GrayJpegGolden.decodedMd5
    assert(md5(a) == goldenEnc, s"encoded stream drifted: ${md5(a)}")
    assert(md5(d1) == goldenDec, s"decoded raster drifted: ${md5(d1)}")
  }

  test("the stream is conformant JFIF: ImageIO decodes it with exact geometry and near-identical pixels") {
    val w = 32; val h = 11
    val px = raster(w * h)
    val jpg = GrayJpeg.encode(px, w, h)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img != null, "ImageIO rejected the stream")
    assert(img.getWidth == w && img.getHeight == h)
    val ours = GrayJpeg.decode(jpg)._3
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      // raw raster samples: getRGB would gamma-convert the linear
      // grayscale to sRGB (100 → 168) and mask the real comparison
      val luma = img.getRaster.getSample(x, y, 0)
      worst = math.max(worst, math.abs(luma - (ours(y * w + x) & 0xFF)))
    }
    // same coefficients, two IDCT implementations: off-by-rounding only
    assert(worst <= 2, s"ImageIO disagrees by $worst levels")
  }

  test("corrupt entropy data degrades to a jpeg_err row, never a job failure") {
    import spark.implicits._
    val px = raster(32 * 9)
    val good = GrayJpeg.encode(px, 32, 9)
    // keep the structural header (accepts() passes) but truncate the
    // entropy-coded scan mid-stream
    val corrupt = good.take(good.length - good.length / 3)
    val out = graft.operators.Multimodal.decode(
        Seq(1L -> good, 2L -> corrupt).toDF("id", "bin"), "id", "bin",
        nFeat = 2, codecs = Seq(graft.operators.GrayJpegCodec))
      .collect().map(m => m.id -> m.fmt).toMap
    assert(out(1L) == "jpeg" && out(2L) == "jpeg_err", s"$out")
  }

  test("decoder rejects what it cannot fully decode; truncation fails loudly") {
    // progressive/multi-component streams must throw, not mis-decode
    val px = raster(64)
    val jpg = GrayJpeg.encode(px, 8, 8)
    intercept[Exception] { GrayJpeg.decode(jpg.take(jpg.length / 2)) }
    intercept[Exception] { GrayJpeg.decode("nope".getBytes) }
    // single-block image decodes fine (smallest case)
    val (w1, h1, _) = GrayJpeg.decode(jpg)
    assert((w1, h1) == (8, 8))
    // 1x1 image (heavy padding)
    val tiny = GrayJpeg.encode(Array(100.toByte), 1, 1)
    val (tw, th, tp) = GrayJpeg.decode(tiny)
    assert((tw, th) == (1, 1) && math.abs((tp(0) & 0xFF) - 100) <= 3)
  }
}

/** Golden digests for [[GrayJpegSpec]] — regenerate ONLY with a
  * deliberate codec change (they ARE the cross-JVM determinism pin). */
object GrayJpegGolden {
  val encodedMd5 = "77d1555095a696632c6314522b451992"
  val decodedMd5 = "b4a54dbcaf837008eb18e334be0895db"
}

/** Round-11: hybrid retrieval front door — [[Retrieval.hybridTopK]]
  * must route its lexical arm to the capped, df-cut BM25 ranker
  * (plan-proven by the TopKAgg map-side partial), never the raw
  * shared-token ranking that survives only as the s17 oracle
  * baseline — the d2→d3 JaccardFrontDoorSpec pattern applied to
  * retrieval. */
class HybridFrontDoorSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Retrieval, Similarity}

  private def corpus = (0 until 40).map { i =>
    val mid = if (i % 2 == 0) " mid" else ""
    (i.toLong, s"stop$mid rare${i % 8} stop extra${i % 4}")
  }.toDF("doc_id", "text")

  private def vecArm = (for (q <- 0 until 3; r <- 1 to 5)
    yield (q.toLong, r, (q * 7 + r * 3).toLong % 40))
    .toDF("query_id", "rk", "neighbor_id")

  test("front-door plan carries the TopKAgg cap; the raw shared-token form does not") {
    val fused = Retrieval.hybridTopK(corpus, "doc_id", "text",
      corpus.filter(col("doc_id") < 3), vecArm, k = 5, cap = 7)
    val plan = fused.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkagg"),
      s"front door must route through the capped BM25 arm:\n${plan.take(3000)}")
    // contrast: the s17-style raw arm (uncapped shared-token join)
    // has no TopKAgg anywhere — the exact shape the front door avoids
    val tok = corpus.select(col("doc_id"),
        explode(expr("filter(split(text, ' '), x -> x != '')")).as("t"))
      .distinct()
    val raw = tok.filter(col("doc_id") < 3).withColumnRenamed("doc_id", "qid")
      .join(tok.withColumnRenamed("doc_id", "cid"), Seq("t"))
      .filter(col("qid") =!= col("cid"))
      .groupBy("qid", "cid").agg(count(lit(1)).as("n_shared"))
    assert(!raw.queryExecution.executedPlan.toString.contains("topkagg"))
  }

  test("front door equals the hand-composed capped arms exactly") {
    val q = corpus.filter(col("doc_id") < 3)
    val viaDoor = Retrieval.hybridTopK(corpus, "doc_id", "text", q, vecArm,
      k = 5, lexK = 10, maxDfPct = 90, cap = 7)
    val lex = Retrieval.bm25TopK(corpus, "doc_id", "text", q, k = 10,
        maxDfPct = 90, cap = 7)
      .select("query_id", "neighbor_id", "rk")
    val byHand = Similarity.rrfFuse(lex, vecArm, k = 5)
    assert(viaDoor.exceptAll(byHand).isEmpty && byHand.exceptAll(viaDoor).isEmpty)
    assert(viaDoor.count() > 0)
  }
}

/** Round-11: shard-keyed bloom entries — a point probe prunes SHARDS
  * (via per-shard OR-aggregated bitsets) before files, the driver
  * receives hit/uncovered keys instead of O(files) booleans, and the
  * cut stays exact (OR only adds bits — no false negatives). */
class BloomShardedProbeSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vbshard").toFile
    d.delete(); d.getAbsolutePath
  }

  test("probe opens a strict minority of shards AND files; append + incremental stay exact") {
    val root = freshRoot()
    val df = (0L until 4096L).toDF("k")
      .withColumn("v", concat(lit("u"), col("k")))
      .repartitionByRange(128, col("k"))
    VersionedTable.commit(df, root)
    VersionedTable.shardManifest(spark, root, targetFilesPerShard = 16)
    val v = VersionedTable.buildBloomIndex(spark, root, "v")

    val d = VersionedTable.bloomProbeDetail(spark, root, "v", "u1000")
    assert(d.totalFiles == 128 && d.shardsTotal == 8, s"$d")
    assert(d.shardsOpened * 2 < d.shardsTotal,
      s"probe must open a strict minority of shards: $d")
    assert(d.filesOpened >= 1 && d.filesOpened * 2 < d.totalFiles,
      s"probe must open a strict minority of files: $d")
    // zero false negatives across scattered probes
    for (x <- Seq(0L, 17L, 512L, 1111L, 2048L, 3000L, 4095L))
      assert(VersionedTable.readEq(spark, root, "v", s"u$x")
        .select("k").as[Long].collect().toSeq == Seq(x), s"missed u$x")
    assert(VersionedTable.readEq(spark, root, "v", "absent").count() == 0)

    // frontier append (inline, unsharded lines) + incremental build:
    // the new value is served from null-shard entries; shard
    // aggregates keep cutting for old values
    VersionedTable.commit(
      (4096L until 4160L).toDF("k").withColumn("v", concat(lit("u"), col("k")))
        .coalesce(2), root, mode = "append")
    val v2 = VersionedTable.buildBloomIndexIncremental(spark, root, "v")
    assert(v2 == v + 1)
    assert(VersionedTable.readEq(spark, root, "v", "u4100")
      .select("k").as[Long].collect().toSeq == Seq(4100L))
    val dNew = VersionedTable.bloomProbeDetail(spark, root, "v", "u4100")
    assert(dNew.shardsTotal == 8 && dNew.shardsOpened <= 1,
      s"appended value lives in frontier files, not shards: $dNew")
    assert(dNew.filesOpened <= 3, s"$dNew")
    val dOld = VersionedTable.bloomProbeDetail(spark, root, "v", "u1000")
    assert(dOld.shardsOpened * 2 < dOld.shardsTotal && dOld.filesOpened * 2 < dOld.totalFiles,
      s"shard cut must survive the incremental rebuild: $dOld")
    assert(VersionedTable.readEq(spark, root, "v", "u1000")
      .select("k").as[Long].collect().toSeq == Seq(1000L))
  }
}

/** Round-11: the remaining SQL table functions — vt_read_range
  * (compound conjunction through SQL), vt_read_asof, vt_detail —
  * each must match its DataFrame-API twin exactly, and bad arguments
  * must fail at analysis with a usable message. */
class VtTableFunctionSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtfn").toFile
    d.delete(); d.getAbsolutePath
  }

  test("vt_read_range conjunction, vt_read_asof, vt_detail match the API") {
    org.apache.spark.sql.graftbridge.GraftTableFunctions.install(spark)
    val root = freshRoot()
    val df = (0L until 512L).toDF("k").withColumn("day", col("k") % 8)
      .repartitionByRange(8, col("k"))
    VersionedTable.commit(df, root, statsCols = Seq("k", "day"))
    val tAfterV1 = System.currentTimeMillis()
    Thread.sleep(20)
    VersionedTable.commit(
      (512L until 600L).toDF("k").withColumn("day", col("k") % 8),
      root, mode = "append")

    // compound range through SQL == API
    val sqlRows = spark.sql(
      s"SELECT k FROM vt_read_range('$root', 'k', '100', '199', 'day', '3', '4')")
      .as[Long].collect().sorted.toSeq
    val apiRows = VersionedTable.readRange(spark, root,
        Seq(("k", "100", "199"), ("day", "3", "4")), -1L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(sqlRows == apiRows && sqlRows.nonEmpty)
    assert(sqlRows == (100L to 199L).filter(k => k % 8 == 3 || k % 8 == 4))

    // AS OF a timestamp between the commits sees only v1
    val asof = spark.sql(
      s"SELECT count(*) FROM vt_read_asof('$root', $tAfterV1)")
      .as[Long].head()
    assert(asof == 512L, s"as-of count $asof")

    // DESCRIBE DETAIL via SQL == API row
    val d1 = spark.sql(s"SELECT * FROM vt_detail('$root')").collect()
    val d2 = VersionedTable.describeDetail(spark, root).collect()
    assert(d1.map(_.toString).toSeq == d2.map(_.toString).toSeq)

    // bad arity fails at analysis with the function's own message
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM vt_read_range('$root', 'k', '1')").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("vt_read_range") || m.contains("arguments")),
      msgs(e).mkString(" | "))

    // round-12: the scaladoc's TIMESTAMP-STRING form works as written,
    // interpreted in the session zone
    val zone = java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
    val ts = java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(tAfterV1), zone)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val asofStr = spark.sql(
      s"SELECT count(*) FROM vt_read_asof('$root', '$ts')").as[Long].head()
    assert(asofStr == 512L, s"string-literal as-of count $asofStr at '$ts'")

    // and a non-numeric literal where an INTEGER is required fails with
    // the descriptive message, not a raw NumberFormatException
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM vt_read('$root', 'not-a-number')").collect()
    }
    assert(msgs(e2).exists(_.contains("integer literal")),
      msgs(e2).mkString(" | "))
  }
}

/** Round-11: the pure-SQL front door gets the same Catalyst
  * optimizations as the DataFrame API — q65c's metadata predicate,
  * written in a CTE, must reach the parquet scan as a pushed filter
  * (the KnnFilteredSpec gate applied to the SQL path). */
class SqlSurfacePushdownSpec extends SparkSpec {
  test("q65c's label predicate is pushed into the corpus scan via spark.sql") {
    org.apache.spark.sql.graftbridge.GraftFunctions.install(spark)
    graft.Tables.embeddings(spark, sfDir).createOrReplaceTempView("embeddings_sql")
    val out = spark.sql("""
      WITH q AS (SELECT vec_id AS qid, embedding AS qe
          FROM embeddings_sql WHERE vec_id < 5),
      c AS (SELECT vec_id, embedding FROM embeddings_sql WHERE label < 3),
      sc AS (SELECT qid, c.vec_id AS cid, vec_cosine(qe, c.embedding) AS cos
        FROM q JOIN c ON c.vec_id <> qid)
      SELECT qid, cid, cos FROM sc""")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(label,3)"),
      s"SQL-surface filter must reach the parquet scan:\n${plan.take(2500)}")
    assert(out.limit(5).count() > 0)
  }
}

/** Round-11: MMR rerank (s20) — the diversity trade must actually
  * bind: with a near-duplicate dominating the relevance order, MMR
  * demotes it in favor of a diverse candidate; λ=1.0 degrades to the
  * pure relevance order. */
class MmrSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Similarity

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f)),          // query
    (1L, Array(0.99f, 0.10f)),        // most relevant
    (2L, Array(0.99f, 0.11f)),        // near-dup of 1
    (3L, Array(0.70f, 0.70f))         // diverse
  ).toDF("vec_id", "embedding")

  test("diversity binds: the near-duplicate is demoted at low lambda") {
    val out = Similarity.mmrRerank(emb.filter(col("vec_id") > 0),
        emb.filter(col("vec_id") === 0), "vec_id", "embedding",
        nCand = 3, k = 2, lambdaTenths = 3)
      .orderBy("rk").collect().map(_.getLong(2)).toSeq
    assert(out == Seq(1L, 3L), s"expected the diverse pick second, got $out")
  }

  test("lambda = 1.0 degrades to the pure relevance order") {
    val out = Similarity.mmrRerank(emb.filter(col("vec_id") > 0),
        emb.filter(col("vec_id") === 0), "vec_id", "embedding",
        nCand = 3, k = 3, lambdaTenths = 10)
      .orderBy("rk").collect().map(_.getLong(2)).toSeq
    assert(out == Seq(1L, 2L, 3L), s"got $out")
  }

  test("ANN-fed rerank equals the brute front door on identical candidates") {
    val corpus = emb.filter(col("vec_id") > 0)
    val q = emb.filter(col("vec_id") === 0)
    // candidates from the brute tier = the same top-3 the front door uses
    val cands = Similarity.knnBrute(corpus, q, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id")
    val fed = Similarity.mmrRerankFrom(cands, corpus, q, "vec_id", "embedding",
        k = 2, lambdaTenths = 3)
      .orderBy("rk").collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    val door = Similarity.mmrRerank(corpus, q, "vec_id", "embedding",
        nCand = 3, k = 2, lambdaTenths = 3)
      .orderBy("rk").collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(fed.toSeq == door.toSeq, s"fed=${fed.toSeq} door=${door.toSeq}")
  }
}

/** Round-11: maximal matching (g24) — deterministic synchronous
  * rounds must yield a DISJOINT (no shared endpoints) and MAXIMAL
  * (every input edge touches a matched node) edge set. */
class MatchingSpec extends SparkSpec {
  import spark.implicits._
  import graft.graph.GraphOps

  private def check(edges: Seq[(Long, Long)], rounds: Int): Unit = {
    val df = edges.toDF("src", "dst")
    val m = GraphOps.maximalMatching(df, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ends = m.flatMap(p => Seq(p._1, p._2))
    assert(ends.length == ends.distinct.length,
      s"matching shares endpoints: ${m.toSeq}")
    val matchedNodes = ends.toSet
    val uncovered = edges
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .filter(e => e._1 != e._2)
      .filterNot(e => matchedNodes(e._1) || matchedNodes(e._2))
    assert(uncovered.isEmpty, s"non-maximal: $uncovered")
  }

  test("path graph") {
    check(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)), 8)
  }

  test("star graph (one edge max)") {
    check((2L to 20L).map(i => (1L, i)), 8)
  }

  test("pseudo-random graph converges within the round budget") {
    val edges = (0 until 2000).map { i =>
      val a = (i * 2654435761L) % 500
      val b = (i * 40503L + 7) % 500
      (a, b)
    }.filter(e => e._1 != e._2)
    check(edges, 12)
  }
}

/** Round-11 (advice): maximalIndependentSet's packed hash·2³¹+node
  * priority is only collision/overflow-free for node ∈ [0, 2³¹) — ids
  * outside that range must fail LOUDLY, not silently break the
  * unique-priority invariant. */
class MisNodeRangeGuardSpec extends SparkSpec {
  import spark.implicits._
  import graft.graph.GraphOps

  test("node id >= 2^31 fails loudly") {
    val edges = Seq((2147483648L, 1L)).toDF("src", "dst")
    val e = intercept[Exception] {
      GraphOps.maximalIndependentSet(edges, 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("outside [0, 2^31)")),
      s"expected the range guard, got: ${msgs(e).mkString(" | ")}")
  }

  test("valid ids still converge to a maximal independent set") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val st = GraphOps.maximalIndependentSet(edges, 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st.values.forall(s => s == "i" || s == "o"), s"unconverged: $st")
    // independence on the path 1-2-3-4
    assert(!(st(1L) == "i" && st(2L) == "i"))
    assert(!(st(2L) == "i" && st(3L) == "i"))
    assert(!(st(3L) == "i" && st(4L) == "i"))
    // maximality: every 'o' has an 'i' neighbor
    val nbr = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L, 4L), 4L -> Seq(3L))
    st.filter(_._2 == "o").keys.foreach(n =>
      assert(nbr(n).exists(st(_) == "i"), s"non-maximal at $n: $st"))
  }
}
