package graft

import org.apache.spark.sql.functions._

/** Round-10 specs: ADVICE fixes (TopKAgg NaN total order, Profiler
  * drift degenerate-input convention) and the round's new operators.
  */
class TopKAggNanSpec extends SparkSpec {

  test("TopKAgg orders NaN as largest (matches Spark desc sort) under any split") {
    val agg = graft.functions.TopKAgg(3)
    val nan = 0.0 / 0.0
    val rows = Seq((5.0, 2L), (nan, 7L), (7.0, 9L), (nan, 1L), (6.0, 8L))
    // Spark sorts NaN largest on desc; ties (both NaN) break by id asc.
    val expected = Seq((nan, 1L), (nan, 7L), (7.0, 9L))
    def same(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Boolean =
      a.size == b.size && a.zip(b).forall { case (x, y) =>
        java.lang.Double.compare(x._1, y._1) == 0 && x._2 == y._2
      }
    for (mask <- 0 until (1 << rows.size)) {
      val (a, b) = rows.zipWithIndex.partition { case (_, i) => (mask & (1 << i)) != 0 }
      val bufA = a.map(_._1).foldLeft(agg.zero)(agg.reduce)
      val bufB = b.map(_._1).foldLeft(agg.zero)(agg.reduce)
      val got = agg.finish(agg.merge(bufA, bufB))
      assert(same(got, expected), s"mask=$mask got=$got")
    }
  }

  test("TopKAgg NaN order agrees with the row_number window form") {
    import spark.implicits._
    val nan = 0.0 / 0.0
    val df = Seq(("g", 5.0, 2L), ("g", nan, 7L), ("g", 7.0, 9L), ("g", nan, 1L))
      .toDF("g", "v", "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(desc("v"), asc("id"))
    val windowIds = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).orderBy("rk")
      .select("id").as[Long].collect().toSeq
    val topk = udaf(graft.functions.TopKAgg(3))
    val aggIds = df.groupBy("g").agg(topk(col("v"), col("id")).as("top"))
      .select(explode(expr("transform(top, x -> x._2)")).as("id"))
      .as[Long].collect().toSeq
    assert(aggIds == windowIds, s"agg=$aggIds window=$windowIds")
  }
}

/** ADVICE r9: (1) a shallow clone's manifest must carry FULLY
  * QUALIFIED URIs (scheme kept — toUri.getPath would lose an
  * s3a://bucket or hdfs://nn authority); (2) a clone's deletion
  * vectors — and DVs recorded on the clone AFTER cloning — must
  * survive a later copy-on-write rewrite (merge/deleteWhere), which
  * compares dv lines against untouched files on the 3-part key. */
class CloneDvRewriteSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def newRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtdv").toFile
    d.delete(); d.getAbsolutePath
  }

  test("clone manifest PATHS keep the URI scheme (dv data keys stay join keys)") {
    val src = newRoot(); val dst = newRoot()
    VersionedTable.commit(
      (0 until 20).map(i => (i.toLong, i.toLong)).toDF("id", "v").repartition(2), src)
    VersionedTable.deleteWhereDv(spark, src, "id = 3")
    VersionedTable.clone(spark, src, dst)
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dst, "_manifests", "v1.manifest")),
      java.nio.charset.StandardCharsets.UTF_8)
    val refs = body.split("\n").filterNot(_.startsWith("#")).filter(_.nonEmpty)
    assert(refs.nonEmpty)
    for (l <- refs) {
      // every PATH the clone will OPEN must be scheme-qualified
      // (stripping to the path part would lose the bucket/namenode on
      // s3a://… sources); the dv line's DATA field is a JOIN KEY, not
      // a path — every consumer reduces it to the 3-segment form, so
      // the clone carries it verbatim in either form
      val p = if (l.startsWith("!dv\t")) l.split('\t')(2) else l.split('\t')(0)
      assert(p.startsWith("file:/"), s"clone path lost its scheme: $l")
    }
  }

  test("DVs recorded on a clone survive merge and deleteWhere rewrites") {
    val src = newRoot(); val dst = newRoot()
    // two files so the rewrite has an untouched file to carry
    VersionedTable.commit(
      (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
        .repartitionByRange(2, col("id")), src)
    VersionedTable.deleteWhereDv(spark, src, "id = 7") // source-era DV
    VersionedTable.clone(spark, src, dst)
    VersionedTable.deleteWhereDv(spark, dst, "id = 13") // clone-era DV
    def ids(root: String): Set[Long] =
      VersionedTable.read(spark, root).select("id").as[Long].collect().toSet
    assert(!ids(dst).contains(7L) && !ids(dst).contains(13L) && ids(dst).size == 98)
    // copy-on-write MERGE touching only the high-key file: both DV'd
    // rows live in files the merge carries untouched — before the
    // 3-part-key dvCarry fix their dv lines silently dropped and the
    // deleted rows resurrected
    VersionedTable.merge(Seq((99L, 999L)).toDF("id", "v"), dst, Seq("id"))
    assert(!ids(dst).contains(7L), "source-era DV resurrected by merge")
    assert(!ids(dst).contains(13L), "clone-era DV resurrected by merge")
    assert(ids(dst).size == 98 && VersionedTable.read(spark, dst)
      .filter("id = 99").select("v").as[Long].head() == 999L)
    // and a deleteWhere rewrite after that still carries them
    VersionedTable.deleteWhere(spark, dst, "id = 98")
    assert(!ids(dst).contains(7L) && !ids(dst).contains(13L) && ids(dst).size == 97)
    // the source never saw any of it
    assert(ids(src).size == 99 && !ids(src).contains(7L) && ids(src).contains(13L))
  }
}

/** Round-10 BM25 retrieval bounds: the df cutoff must remove
  * every-doc stopwords from candidate generation entirely, the
  * per-token cap must bound every posting list, and the cap must ride
  * the bounded-state TopKAgg — not a window sort of the hot token's
  * full posting list. */
class Bm25BoundsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Retrieval

  // 40 docs; "stop" is in EVERY doc (df = 100% > 90% cutoff), "mid"
  // in half, and each doc i has a rare token rare<i%8> (df = 5).
  private def corpus = (0 until 40).map { i =>
    val mid = if (i % 2 == 0) " mid" else ""
    (i.toLong, s"stop$mid rare${i % 8} stop extra${i % 4}")
  }.toDF("doc_id", "text")

  test("df cutoff drops every-doc stopwords; cap bounds every posting list") {
    val p = Retrieval.bm25Postings(corpus, "doc_id", "text", maxDfPct = 90, cap = 7)
      .cache()
    try {
      assert(p.filter(col("tok") === "stop").isEmpty,
        "a token above the df cutoff must generate no postings")
      val maxLen = p.groupBy("tok").count().agg(max("count")).as[Long].head()
      assert(maxLen <= 7, s"posting list exceeded cap: $maxLen")
      // mid (df=20) survives the cutoff and is capped 20 -> 7
      assert(p.filter(col("tok") === "mid").count() == 7)
      // rare tokens (df=5) pass through uncapped
      assert(p.filter(col("tok") === "rare0").count() == 5)
    } finally p.unpersist()
  }

  test("the cap is an ObjectHashAggregate, not a posting-list window sort") {
    val p = Retrieval.bm25Postings(corpus, "doc_id", "text", maxDfPct = 90, cap = 7)
    val plan = p.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected TopKAgg aggregate:\n$plan")
    assert(plan.contains("partial_topkagg"), s"expected map-side partials:\n$plan")
    assert(!plan.contains("Window"), s"cap must not be a window sort:\n$plan")
  }

  test("capped TopKAgg ranking equals the row_number window form when both bind") {
    val tf = corpus.select(col("doc_id"),
        explode(expr("filter(split(text, ' '), x -> x != '')")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // independent window-form reference of the SAME capped algorithm
    val dl = corpus.select(col("doc_id"),
        size(expr("filter(split(text, ' '), x -> x != '')")).as("dl"))
    val dfTok = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val glob = tf.agg(countDistinct("doc_id").as("n"), sum("tf").as("a"))
    val ref = tf.join(dl, "doc_id").join(dfTok, "tok").crossJoin(broadcast(glob))
      .filter(col("df") * 100 <= col("n") * 90)
      .withColumn("st", expr(
        "(((cast(n as decimal(38,0)) * 10000) div df) * tf * 22 * a) div " +
          "(10 * cast(a as decimal(38,0)) * tf + 3 * a + 9 * dl * n)"))
      .withColumn("prk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("tok").orderBy(desc("st"), asc("doc_id"))))
      .filter(col("prk") <= 7)
      .select(col("tok"), col("doc_id").as("doc"), col("st").as("score_term"))
    val got = Retrieval.bm25Postings(corpus, "doc_id", "text", maxDfPct = 90, cap = 7)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "TopKAgg capped postings must equal the window form")
  }

  test("per-query candidates never exceed |query tokens| x cap") {
    val q = corpus.filter(col("doc_id") < 3)
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", q, k = 100,
      maxDfPct = 90, cap = 7)
    // each query has <= 4 distinct tokens surviving the cutoff, cap 7
    val worst = out.groupBy("query_id").count().agg(max("count")).as[Long].head()
    assert(worst <= 4 * 7, s"candidate blowup: $worst")
  }
}

class DriftDegenerateSpec extends SparkSpec {
  import spark.implicits._

  test("drift against an empty snapshot yields 0-bp shares, never NULL") {
    val a = Seq(1L, 1L, 2L, 3L).toDF("v")
    val b = spark.emptyDataset[Long].toDF("v")
    val out = graft.operators.Profiler.drift(a, b, col("v")).cache()
    try {
      assert(out.filter(col("share_a_bp").isNull || col("share_b_bp").isNull
        || col("diff_bp").isNull || col("contrib").isNull).isEmpty,
        "degenerate drift must not emit NULL shares")
      // empty side: every share_b is 0; side a still sums to ~10000 bp
      assert(out.agg(sum("share_b_bp")).as[Long].head() == 0L)
      val sa = out.agg(sum("share_a_bp")).as[Long].head()
      assert(sa >= 9998L && sa <= 10000L, s"share_a sum $sa")
    } finally out.unpersist()
  }
}

/** Round-10 two-level manifest: shardManifest converts a thousand-file
  * flat manifest into @shard refs + immutable shard files; a selective
  * read must OPEN a strict minority of shards (the metadata win), and
  * every lifecycle operation (append, DV delete, restore, merge,
  * vacuum) must stay correct — with append/DV/restore carrying refs
  * VERBATIM (O(shards) root size) and merge expanding only the
  * touched shards. */
class ManifestShardSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vshard").toFile
    d.delete(); d.getAbsolutePath
  }

  private def manifestLineCount(root: String, v: Long): Int =
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(root, "_manifests", s"v$v.manifest")).size

  test("thousand-file table: selective read opens a strict minority of shards; all ops stay exact") {
    val root = freshRoot()
    // 1024 range-clustered files, 32 rows each, stats on k
    val df = (1L to 32768L).toDF("k").withColumn("val", col("k") * 3)
      .repartitionByRange(1024, col("k"))
    val v1 = VersionedTable.commit(df, root, statsCols = Seq("k"))
    val v2 = VersionedTable.shardManifest(spark, root, targetFilesPerShard = 16)
    assert(v2 == v1 + 1)

    // metadata-only: same rows, same file count, 64 shards in the root
    assert(VersionedTable.fileCount(spark, root) == 1024)
    val refs = VersionedTable.shardRefs(spark, root, v2)
    assert(refs.size == 64, s"expected 64 shards, got ${refs.size}")
    assert(refs.forall(_.nFiles == 16))
    assert(VersionedTable.rowCount(spark, root).contains(32768L),
      "sharded rowCount must answer from shard aggregates")
    assert(manifestLineCount(root, v2) < 100,
      "sharded root must be O(shards), not O(files)")
    assert(VersionedTable.read(spark, root).count() == 32768L)

    // the metadata win: k in [10000, 10500] spans ~2% of the key space
    val d = VersionedTable.prunedFilesDetail(spark, root, "k", "10000", "10500")
    assert(d.shardsTotal == 64 && d.totalFiles == 1024)
    assert(d.shardsOpened * 2 < d.shardsTotal,
      s"selective read must open a strict minority of shards: ${d.shardsOpened}/${d.shardsTotal}")
    assert(d.shardsOpened <= 3, s"range spans ~1 shard, opened ${d.shardsOpened}")
    assert(VersionedTable.readRange(spark, root, "k", "10000", "10500")
      .select("k").as[Long].collect().sorted.toSeq == (10000L to 10500L))

    // append carries refs verbatim: root grows by the new files only
    val v3 = VersionedTable.commit(
      Seq((40000L, 7L)).toDF("k", "val"), root, mode = "append")
    assert(VersionedTable.shardRefs(spark, root, v3).map(_.rel) == refs.map(_.rel),
      "append must carry @shard refs verbatim")
    assert(manifestLineCount(root, v3) < 100, "append must not expand shards")
    assert(VersionedTable.read(spark, root).count() == 32769L)

    // DV delete: refs verbatim, row gone, metadata rowCount exact
    val v4 = VersionedTable.deleteWhereDv(spark, root, "k = 10250")
    assert(VersionedTable.shardRefs(spark, root, v4).map(_.rel) == refs.map(_.rel))
    assert(manifestLineCount(root, v4) < 100, "DV delete must not expand shards")
    assert(VersionedTable.rowCount(spark, root).contains(32768L))
    assert(VersionedTable.readRange(spark, root, "k", "10000", "10500")
      .select("k").as[Long].collect().sorted.toSeq ==
      ((10000L to 10249L) ++ (10251L to 10500L)))

    // merge on one key: only the touched shard expands (63 refs stay)
    val v5 = VersionedTable.merge(Seq((5000L, 999L)).toDF("k", "val"), root, Seq("k"))
    val refs5 = VersionedTable.shardRefs(spark, root, v5)
    assert(refs5.size == 63, s"exactly one shard should inline, got ${refs5.size}")
    assert(VersionedTable.read(spark, root)
      .filter(col("k") === 5000L).select("val").as[Long].head() == 999L)
    // the deletion vector survived the merge (k=10250 still gone)
    assert(VersionedTable.read(spark, root).filter(col("k") === 10250L).isEmpty)
    // the inlined shard's untouched members kept their stats lines
    assert(VersionedTable.readRange(spark, root, "k", "10000", "10500")
      .count() == 500L)

    // restore to the sharded v2: refs verbatim, original rows back
    val v6 = VersionedTable.restore(spark, root, v2)
    assert(VersionedTable.shardRefs(spark, root, v6).map(_.rel) == refs.map(_.rel))
    assert(VersionedTable.read(spark, root).count() == 32768L)
    assert(VersionedTable.read(spark, root)
      .filter(col("k") === 5000L).select("val").as[Long].head() == 15000L)

    // vacuum: retained manifests keep their shard files; read survives
    VersionedTable.vacuum(spark, root, retainVersions = 1, graceMs = 0L)
    assert(VersionedTable.read(spark, root).count() == 32768L)
  }

  test("shard aggregates omit columns any member lacks; prune stays conservative") {
    val root = freshRoot()
    // v1 without stats, v2 append with stats, then shard: the mixed
    // shard must keep NO aggregate for k (a stat-less member could
    // hold any value), so every range opens it
    VersionedTable.commit((1L to 64L).toDF("k").repartitionByRange(4, col("k")), root)
    VersionedTable.commit((65L to 128L).toDF("k").repartitionByRange(4, col("k")),
      root, mode = "append", statsCols = Seq("k"))
    VersionedTable.shardManifest(spark, root, targetFilesPerShard = 8)
    val refs = VersionedTable.shardRefs(spark, root)
    assert(refs.exists(r => !r.stats.contains("k")),
      "a shard containing stat-less members must omit the column aggregate")
    // correctness first: every row reachable despite missing stats
    assert(VersionedTable.readRange(spark, root, "k", "1", "128").count() == 128L)
    assert(VersionedTable.rowCount(spark, root).isEmpty,
      "rowCount must stay honest when any member lacks #rows")
  }
}

/** Round-10 BPE training at vocabulary scale: the shipped train()
  * must (a) produce EXACTLY the merge sequence an independent
  * in-driver single-machine reference produces on the same corpus
  * (the classic hashmap pair-count/argmax/leftmost-greedy fold), and
  * (b) be invariant to the lineage-cut cadence (ckptEvery is plan
  * hygiene, never semantics). The wall-time-linearity record at
  * 8k merges rides scripts/bpe_scale.scala over the
  * make_bpe_corpus.py large-vocab corpus. */
class BpeReferenceSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Bpe

  // deterministic ASCII pseudo-words (md5-derived, like the corpus
  // generators): string order agrees byte-for-byte across the
  // reference's compareTo and Spark's UTF8String ordering
  private def h(s: String): BigInt =
    BigInt(1, java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(8))

  private val vocab: IndexedSeq[String] = (0 until 400).map { i =>
    val n = 5 + (h(s"w$i") % 6).toInt
    (0 until n).map(j => ('a' + (h(s"w$i c$j") % 26).toInt).toChar).mkString
  }

  private val docTexts: Seq[(Long, String)] = (0 until 200).map { d =>
    val words = (0 until 20).map { j =>
      val u = h(s"d$d p$j").toDouble / math.pow(2, 64)
      vocab(((u * u) * vocab.size).toInt)
    }
    (d.toLong, words.mkString(" "))
  }

  /** Single-machine reference BPE: pair counts over the distinct-word
    * table, argmax by (count DESC, a ASC, b ASC), leftmost
    * non-overlapping merge application. */
  private def refBpe(wordCnt: Seq[(String, Long)], n: Int): Seq[(String, String, Long)] = {
    var segs: Seq[(Array[String], Long)] =
      wordCnt.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var go = true
    while (out.size < n && go) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- segs; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + c
      }
      if (counts.isEmpty) go = false
      else {
        val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b, cnt))
        segs = segs.map { case (syms, c) =>
          val nb = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              nb += (a + b); i += 2
            } else { nb += syms(i); i += 1 }
          }
          (nb.toArray, c)
        }
      }
    }
    out.toSeq
  }

  test("train() merges match the single-machine reference exactly (200 merges)") {
    val docs = docTexts.toDF("doc_id", "text")
    val (merges, _) = Bpe.train(docs, "text", 200)
    val wc = docs.select(explode(expr("filter(split(text, ' '), x -> x != '')")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toSeq
    val ref = refBpe(wc, 200)
    assert(merges.size == ref.size, s"${merges.size} vs ref ${ref.size}")
    val got = merges.map(m => (m.a, m.b, m.cnt))
    val firstDiff = got.zip(ref).indexWhere { case (g, r) => g != r }
    assert(firstDiff == -1, s"merge #$firstDiff differs: " +
      (if (firstDiff >= 0) s"got ${got(firstDiff)}, ref ${ref(firstDiff)}" else ""))
  }

  test("lineage-cut cadence never changes the merges") {
    val docs = docTexts.toDF("doc_id", "text")
    val (a, segA) = Bpe.train(docs, "text", 60, ckptEvery = 7)
    val (b, segB) = Bpe.train(docs, "text", 60, ckptEvery = 1000000)
    assert(a == b, "ckptEvery changed the merge sequence")
    val sa = Bpe.pieceMap(segA).as[(String, String, Long)].collect().sorted.toSeq
    val sb = Bpe.pieceMap(segB).as[(String, String, Long)].collect().sorted.toSeq
    assert(sa == sb, "ckptEvery changed the final segmentation")
  }
}

/** Round-10 JPEG tier (round-11: the decode path is the pure-Scala
  * [[graft.operators.GrayJpegCodec]], which is deterministic across
  * JVMs by construction — strict FP + StrictMath DCT basis; see
  * GrayJpegSpec for the golden-digest cross-JVM pin and the ImageIO
  * conformance cross-check): decode determinism, exact geometry, and
  * the m10 deviation bound with headroom. */
class JpegDecodeSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{GrayJpegCodec, Multimodal}

  private def payloads = Seq(
    (1L, "hello jpeg world, a short ascii payload"),
    (2L, "x" * 500),
    (3L, ("the quick brown fox " * 40).trim),
    (4L, "a")
  ).toDF("doc_id", "text")
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("same-JVM decode is deterministic and geometry is exact") {
    val jp = Multimodal.encodeGrayJpeg(payloads, "doc_id", "payload", width = 32)
      .cache()
    try {
      def run() = Multimodal.decode(jp, "id", "jpg", nFeat = 4,
          codecs = Seq(GrayJpegCodec)).toDF()
        .select(col("id"), col("fmt"), col("width"), col("height"),
          col("featSums"))
        .as[(Long, String, Int, Int, Array[Long])].collect().sortBy(_._1)
      val a = run(); val b = run()
      assert(a.zip(b).forall { case (x, y) =>
        x._1 == y._1 && x._5.sameElements(y._5) },
        "same-JVM JPEG decode must be bit-deterministic")
      val lens = payloads.select(col("doc_id"), length(col("payload")).as("n"))
        .as[(Long, Int)].collect().toMap
      for ((id, fmt, w, h, _) <- a) {
        assert(fmt == "jpeg" && w == 32, s"doc $id: $fmt ${w}")
        assert(h == math.max((lens(id) + 31) / 32, 1), s"doc $id height $h")
      }
    } finally jp.unpersist()
  }

  test("decoded luma stays within the m10 deviation bound with headroom") {
    val jp = Multimodal.encodeGrayJpeg(payloads, "doc_id", "payload", width = 32)
    val dec = Multimodal.decode(jp, "id", "jpg", nFeat = 1,
        codecs = Seq(GrayJpegCodec)).toDF()
      .select(col("id").as("doc_id"),
        (col("width") * col("height")).cast("long").as("npx"),
        col("featSums")(0).as("luma"))
    val orig = Multimodal.decode(payloads, "doc_id", "payload", nFeat = 1).toDF()
      .select(col("id").as("doc_id"), col("featSums")(0).as("orig"))
    val worst = dec.join(orig, "doc_id")
      .select(expr("(abs(luma - orig) * 100) div npx").as("centilevels"))
      .agg(max("centilevels")).as[Long].head()
    // m10's bound is 16 levels/pixel = 1600 centilevels; require 4x
    // headroom here so oracle flips long before this spec does
    assert(worst <= 400, s"mean luma deviation $worst centilevels/pixel")
  }
}

/** Round-10 ANN store x table format: ivfAppendVtSink lands each
  * micro-batch as a VersionedTable append commit (cell-clustered,
  * cell stats), gaining snapshot isolation, time travel, exactly-once
  * replay, manifest pruning for cell probes, and OPTIMIZE — none of
  * which the bespoke batch-subdir store had. */
class IvfVtStoreSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable
  import graft.streaming.StreamingOps
  import graft.operators.Similarity

  private def vecs(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        (((i * 31 + j * 17) % 13) - 6).toFloat))
    }.toDF("vec_id", "embedding")

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("ivfvt").toFile
    d.delete(); d.getAbsolutePath
  }

  test("append commits, exactly-once replay, snapshot isolation, time travel") {
    val root = freshRoot()
    val base = vecs(0 until 200)
    StreamingOps.ivfAppendVtBatch(vecs(200 until 260), 0L,
      "vec_id", "embedding", base, root, nCells = 8, lloydIters = 0)
    val v1 = VersionedTable.currentVersion(spark, root)
    StreamingOps.ivfAppendVtBatch(vecs(260 until 300), 1L,
      "vec_id", "embedding", base, root, nCells = 8, lloydIters = 0)
    val v2 = VersionedTable.currentVersion(spark, root)
    assert(v2 == v1 + 1)
    val after2 = StreamingOps.readIvfVtStore(spark, root, "vec_id", "embedding")
    assert(after2.count() == 100)

    // exactly-once: replaying batch 1 must not move the table
    StreamingOps.ivfAppendVtBatch(vecs(260 until 300), 1L,
      "vec_id", "embedding", base, root, nCells = 8, lloydIters = 0)
    assert(VersionedTable.currentVersion(spark, root) == v2,
      "replayed batch must not commit")

    // snapshot isolation: a reader pinned BEFORE batch 2 lands never
    // sees batch 2's vectors, even queried after the commit
    val pinned = StreamingOps.readIvfVtStore(spark, root, "vec_id", "embedding", v1)
    StreamingOps.ivfAppendVtBatch(vecs(300 until 330), 2L,
      "vec_id", "embedding", base, root, nCells = 8, lloydIters = 0)
    assert(pinned.count() == 60, "pinned snapshot shifted under a concurrent append")
    assert(StreamingOps.readIvfVtStore(spark, root, "vec_id", "embedding")
      .count() == 130)

    // time travel = the index as of any batch; and the incremental
    // query path through the store equals a full rebuild (frozen
    // quantizer, lloydIters = 0 — the standing s12 identity)
    val q = base.filter(col("vec_id") < 3)
    val viaStore = Similarity.knnIvfIncremental(base,
      StreamingOps.readIvfVtStore(spark, root, "vec_id", "embedding"),
      q, "vec_id", "embedding", k = 5, lloydIters = 0)
    val rebuild = Similarity.knnIvf(base.unionByName(vecs(200 until 330)), q,
      "vec_id", "embedding", k = 5, lloydIters = 0)
    assert(viaStore.exceptAll(rebuild).isEmpty && rebuild.exceptAll(viaStore).isEmpty,
      "store-backed query differs from full rebuild")
  }

  test("cell stats prune the manifest for cell probes; OPTIMIZE keeps the store exact") {
    val root = freshRoot()
    val base = vecs(0 until 200)
    StreamingOps.ivfAppendVtBatch(vecs(200 until 600), 0L,
      "vec_id", "embedding", base, root, nCells = 8, lloydIters = 0)
    // a 1-cell probe must open a strict minority of the store's files
    val (kept, total) = VersionedTable.prunedFiles(spark, root, "cell", "2", "2")
    assert(total >= 4 && kept.size * 2 < total,
      s"cell probe touched ${kept.size}/$total files")
    val before = StreamingOps.readIvfVtStore(spark, root, "vec_id", "embedding")
      .as[(Long, Array[Float])].collect().map(_._1).sorted.toSeq
    VersionedTable.optimize(spark, root, Seq("cell"), nFiles = 4)
    val after = StreamingOps.readIvfVtStore(spark, root, "vec_id", "embedding")
      .as[(Long, Array[Float])].collect().map(_._1).sorted.toSeq
    assert(before == after, "OPTIMIZE changed the store's rows")
  }
}

/** Round-10 incremental compaction: compactSmall folds ONLY
  * under-sized files (found via the manifest's recorded #bytes — no
  * per-file listing), carries right-sized files verbatim, folds the
  * folded files' deletion vectors, and keeps untouched files' DVs —
  * including on a sharded manifest, where untouched shards carry as
  * refs. */
class CompactSmallSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtcs").toFile
    d.delete(); d.getAbsolutePath
  }

  test("folds only small files; big files and their DVs carry verbatim") {
    val root = freshRoot()
    // one big file (~10k rows), then five 10-row append frontiers
    VersionedTable.commit(
      (0L until 10000L).toDF("id").withColumn("v", col("id") * 2).coalesce(1), root)
    for (b <- 0 until 5)
      VersionedTable.commit(
        (20000L + b * 10 until 20010L + b * 10).toDF("id")
          .withColumn("v", col("id") * 2).coalesce(1), root, mode = "append")
    // DV on the big file and on a small file
    VersionedTable.deleteWhereDv(spark, root, "id = 5")      // big-file row
    VersionedTable.deleteWhereDv(spark, root, "id = 20021")  // small-file row
    val before = VersionedTable.snapshot(spark, root)
    val bigFile = before.files.minBy(identity) // c1-* sorts first
    assert(before.files.size == 6)

    val v = VersionedTable.compactSmall(spark, root,
      targetFileBytes = 10L * 1024 * 1024, minFileBytes = 64L * 1024)
    val after = VersionedTable.snapshot(spark, root)
    assert(v > before.version)
    assert(after.files.size == 2, s"expected big + 1 folded, got ${after.files.size}")
    assert(after.files.contains(bigFile), "big file must carry verbatim")
    val ids = VersionedTable.read(spark, root).select("id").as[Long].collect().toSet
    assert(ids.size == 10048 && !ids.contains(5L) && !ids.contains(20021L),
      "folded rows or carried DVs wrong")
    // the small file's DV folded into the rewrite; the big file's
    // DV line survived (resolving 5 again must still exclude it)
    assert(VersionedTable.dvEntries(spark, root).nonEmpty,
      "big file's dv line must survive the rewrite")

    // idempotence: nothing small remains, so the version must not move
    assert(VersionedTable.compactSmall(spark, root,
      targetFileBytes = 10L * 1024 * 1024, minFileBytes = 64L * 1024) == v)
  }

  test("on a sharded manifest, untouched shards carry as refs") {
    val root = freshRoot()
    VersionedTable.commit(
      (0L until 4096L).toDF("k").repartitionByRange(16, col("k")), root,
      statsCols = Seq("k"))
    VersionedTable.shardManifest(spark, root, targetFilesPerShard = 4)
    val refs = VersionedTable.shardRefs(spark, root)
    assert(refs.size == 4)
    for (b <- 0 until 3)
      VersionedTable.commit(Seq(100000L + b).toDF("k").coalesce(1), root,
        mode = "append")
    // the 16 sharded files must NOT fold, the three 1-row frontier
    // files must: pick the threshold between their measured sizes
    val shardedFiles = VersionedTable.snapshot(spark, root, 2).files.toSet
    def sz(p: String): Long = {
      val local = new java.net.URI(p).getPath
      java.nio.file.Files.size(java.nio.file.Paths.get(
        if (local == null || local.isEmpty) p else local))
    }
    val all = VersionedTable.snapshot(spark, root).files
    val keepMin = all.filter(shardedFiles).map(sz).min
    val foldMax = all.filterNot(shardedFiles).map(sz).max
    assert(foldMax < keepMin,
      s"test corpus sizes unusable: frontier $foldMax >= sharded $keepMin")
    val v = VersionedTable.compactSmall(spark, root,
      targetFileBytes = 10L * 1024 * 1024,
      minFileBytes = (foldMax + keepMin) / 2)
    val refsAfter = VersionedTable.shardRefs(spark, root, v)
    assert(refsAfter.map(_.rel) == refs.map(_.rel),
      "untouched shards must carry as verbatim refs")
    assert(VersionedTable.read(spark, root).count() == 4099)
    assert(VersionedTable.fileCount(spark, root) == 17,
      s"3 frontier files should fold to 1: ${VersionedTable.fileCount(spark, root)}")
  }
}

/** Round-10 merge-on-read UPDATE: one atomic commit records deletion
  * vectors for the matched rows and appends their updated versions —
  * zero data files rewritten, time travel sees the old values, and
  * compaction folds the vectors away. */
class UpdateDvSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtup").toFile
    d.delete(); d.getAbsolutePath
  }

  test("update applies sets, preserves history, folds under compaction") {
    val root = freshRoot()
    val v1 = VersionedTable.commit(
      (0L until 1000L).toDF("id").withColumn("price", col("id") * 10)
        .repartitionByRange(4, col("id")), root, statsCols = Seq("id"))
    val nFiles = VersionedTable.snapshot(spark, root).files.size

    val v2 = VersionedTable.updateWhereDv(spark, root, "id % 100 = 7",
      Map("price" -> "price * 2 + 1"))
    assert(v2 == v1 + 1)
    // no original data file was rewritten — only new files appended
    val files2 = VersionedTable.snapshot(spark, root).files
    assert(VersionedTable.snapshot(spark, root, v1).files.forall(files2.contains),
      "update must not rewrite existing files")
    assert(files2.size > nFiles)

    val cur = VersionedTable.read(spark, root)
    assert(cur.count() == 1000, "row count must not change")
    assert(cur.filter("id = 107").select("price").as[Long].head() == 107 * 10 * 2 + 1)
    assert(cur.filter("id = 108").select("price").as[Long].head() == 1080)
    assert(cur.filter("id % 100 = 7").count() == 10)

    // time travel: v1 still shows the pre-update values
    assert(VersionedTable.read(spark, root, v1)
      .filter("id = 107").select("price").as[Long].head() == 1070)

    // no match -> version does not move
    assert(VersionedTable.updateWhereDv(spark, root, "id = 99999",
      Map("price" -> "0")) == v2)

    // a second update on an already-updated row sees the UPDATED value
    VersionedTable.updateWhereDv(spark, root, "id = 107", Map("price" -> "price + 1"))
    assert(VersionedTable.read(spark, root)
      .filter("id = 107").select("price").as[Long].head() == 107 * 10 * 2 + 2)

    // compaction folds the vectors away, values stay
    VersionedTable.compact(spark, root)
    val afterC = VersionedTable.read(spark, root)
    assert(VersionedTable.dvEntries(spark, root).isEmpty, "compact must fold DVs")
    assert(afterC.count() == 1000 &&
      afterC.filter("id = 107").select("price").as[Long].head() == 107 * 10 * 2 + 2)
  }
}

/** Round-10 metadata-only commits x CDC: shardManifest changes the
  * manifest LAYOUT, not the data — a follow stream must deliver
  * nothing for it, and data commits after it must stream normally. */
class FollowShardedSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable
  import graft.streaming.StreamingOps.tableFollowBatch

  private def newRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtfs").toFile
    d.delete(); d.getAbsolutePath
  }

  test("shardManifest is invisible to the follow stream") {
    val root = newRoot(); val out = newRoot()
    VersionedTable.commit(
      (0 until 40).map(i => (i.toLong, i.toLong)).toDF("id", "v")
        .repartitionByRange(8, col("id")), root, statsCols = Seq("id"))
    tableFollowBatch(spark, root, out, 0L) // snapshot
    val before = spark.read.parquet(out).count()
    VersionedTable.shardManifest(spark, root, targetFilesPerShard = 2)
    tableFollowBatch(spark, root, out, 1L) // metadata-only: no delta
    assert(spark.read.parquet(out).count() == before,
      "a metadata-only commit must deliver no change rows")
    // and real changes after sharding still stream
    VersionedTable.commit(Seq((900L, 1L)).toDF("id", "v"), root, mode = "append")
    VersionedTable.deleteWhereDv(spark, root, "id = 5")
    tableFollowBatch(spark, root, out, 2L)
    val delta = spark.read.parquet(out).filter(col("batch") === 2)
      .select("_change_type", "id").as[(String, Long)].collect().toSet
    assert(delta == Set(("insert", 900L), ("delete", 5L)),
      s"post-shard changes wrong: $delta")
  }
}

/** Round-10 incremental BM25 index: appended documents score against
  * the standing index's FROZEN stats (the lexical analogue of the
  * ANN tiers' frozen quantizer), so incremental == rebuild holds
  * exactly under the same stats, per-segment caps still bind, and
  * never-seen tokens are conservatively skipped until a rebuild. */
class Bm25IncrementalSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Retrieval

  private def corpusOf(ids: Range) = ids.map { i =>
    val mid = if (i % 2 == 0) " mid" else ""
    (i.toLong, s"stop$mid rare${i % 8} stop extra${i % 4}")
  }.toDF("doc_id", "text")

  test("frozen-stats append == rebuild under the same stats; caps bind per segment") {
    val base = corpusOf(0 until 30)
    val batch = corpusOf(30 until 40)
    val stats = Retrieval.bm25StatsOf(base, "doc_id", "text")
    val inc = Retrieval.bm25AppendPostings(stats, batch, "doc_id", "text",
      maxDfPct = 90, cap = 7)
    // rebuild of the SAME batch against the SAME frozen stats
    val rebuilt = Retrieval.bm25PostingsWith(stats, batch, "doc_id", "text",
      maxDfPct = 90, cap = 7)
    assert(inc.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(inc).isEmpty)
    // per-segment caps: batch postings never exceed the cap
    val maxLen = inc.groupBy("tok").count()
      .agg(max("count")).as[Long].head()
    assert(maxLen <= 7, s"batch segment posting exceeded cap: $maxLen")
    // the full build routes through the same scoring: postings of the
    // base equal bm25Postings(base) exactly
    val full = Retrieval.bm25Postings(base, "doc_id", "text", maxDfPct = 90, cap = 7)
    val via = Retrieval.bm25PostingsWith(stats, base, "doc_id", "text",
      maxDfPct = 90, cap = 7)
    assert(full.exceptAll(via).isEmpty && via.exceptAll(full).isEmpty)
  }

  test("tokens unseen by the frozen stats are skipped until a rebuild") {
    val base = corpusOf(0 until 30)
    val stats = Retrieval.bm25StatsOf(base, "doc_id", "text")
    val novel = Seq((99L, "brandnewtoken rare1")).toDF("doc_id", "text")
    val inc = Retrieval.bm25AppendPostings(stats, novel, "doc_id", "text").cache()
    try {
      assert(inc.filter(col("tok") === "brandnewtoken").isEmpty,
        "a token with no frozen df must not be scored against unknown rarity")
      assert(inc.filter(col("tok") === "rare1").count() == 1,
        "known tokens of the new doc must index normally")
    } finally inc.unpersist()
  }
}

/** Round-10: cloning a SHARDED table must expand shard refs into
  * absolute file lines (a clone must not reference metadata the
  * source's manifest GC owns) and stay row- and DV-exact. */
class CloneShardedSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def newRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtclsh").toFile
    d.delete(); d.getAbsolutePath
  }

  test("clone of a sharded source KEEPS the two-level layout under its own root") {
    val src = newRoot(); val dst = newRoot()
    VersionedTable.commit(
      (0L until 512L).toDF("k").repartitionByRange(8, col("k")), src,
      statsCols = Seq("k"))
    VersionedTable.deleteWhereDv(spark, src, "k = 9")
    VersionedTable.shardManifest(spark, src, targetFilesPerShard = 2)
    assert(VersionedTable.shardRefs(spark, src).size == 4)
    VersionedTable.clone(spark, src, dst)
    // round 13: shard refs are REWRITTEN (absolutized members) under
    // the CLONE's own shards dir, not inlined — the root stays
    // O(shards) for a 10M-file source, the clone owns its shard
    // metadata (the source's vacuum GCs shard files on the source's
    // schedule), and shard-level pruning works from birth
    val refs = VersionedTable.shardRefs(spark, dst)
    assert(refs.size == 4, s"clone must keep the two-level layout: $refs")
    assert(refs.forall(_.rel.startsWith("_manifests/shards/clone1-")),
      s"clone shard files must live under the CLONE root: ${refs.map(_.rel)}")
    val d = VersionedTable.prunedFilesDetail(spark, dst, "k", "0", "63")
    assert(d.shardsTotal == 4 && d.shardsOpened == 1,
      s"shard-level pruning must work on the clone: $d")
    assert(VersionedTable.read(spark, dst).count() == 511)
    assert(VersionedTable.read(spark, dst).filter("k = 9").isEmpty,
      "source DV must pin into the clone")
    // the clone is independent: a later source commit never leaks in
    VersionedTable.commit(Seq(9999L).toDF("k"), src, mode = "append")
    assert(VersionedTable.read(spark, dst).count() == 511)
  }
}

/** Round-10: filtered ANN (s19) — the predicate must PRE-filter the
  * corpus side at the parquet scan (pushed filter), the probe join
  * must only ever see filtered candidates, and no emitted neighbor
  * may violate the predicate. */
class KnnFilteredSpec extends SparkSpec {

  test("s19: label predicate is pushed into the corpus scan; results honor it") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val out = graft.operators.Similarity.knnIvfFiltered(
      e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
      col("label") < 3, k = 10, lloydIters = 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(label,3)"),
      "filter must reach the parquet scan as a pushed filter")
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // every emitted neighbor satisfies the predicate (pre-filtering,
    // not top-k-then-filter)
    val okLabels = e.filter(col("label") < 3).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => okLabels(r.getLong(r.fieldIndex("neighbor_id")))))
    // under-fill is legitimate but bounded: per query at most k rows,
    // ranks contiguous from 1
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      val rks = rs.map(_.getInt(1)).sorted
      assert(rks.sameElements(1 to rks.length), s"query $q ranks $rks")
    }
  }
}

/** Round-10: header sniffing (m11) must be robust to payloads that
  * are not images at all, truncated mid-header, or JPEGs whose SOF is
  * behind multiple variable-length segments. */
class SniffHeadersSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Multimodal

  test("non-image, empty, and truncated payloads come back unknown") {
    val rows = Seq(
      1L -> "just some text".getBytes("UTF-8"),
      2L -> Array.empty[Byte],
      3L -> Array[Byte](0xFF.toByte, 0xD8.toByte), // bare SOI
      4L -> Array[Byte](0xFF.toByte, 0xD8.toByte, 0x00, 0x01, 0x02)) // garbage after SOI
    val out = Multimodal.sniffHeaders(rows.toDF("id", "bin"), "id", "bin")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unknown", 2L -> "unknown", 3L -> "unknown", 4L -> "unknown"))
  }

  test("JPEG SOF behind APPn/DQT segments parses; progressive SOF2 too") {
    // hand-build: SOI, APP0 (len 6), DQT (len 5), SOF2 3x5 image, SOS
    def seg(m: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, m.toByte,
        ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xFF).toByte) ++ payload
    val sof2 = seg(0xC2, Array[Byte](8, 0, 5, 0, 3, 1, 0x11, 0)) // p=8 h=5 w=3
    val jpeg = Array(0xFF.toByte, 0xD8.toByte) ++
      seg(0xE0, Array[Byte](1, 2, 3, 4)) ++ seg(0xDB, Array[Byte](9, 9, 9)) ++
      sof2 ++ Array(0xFF.toByte, 0xDA.toByte)
    val out = Multimodal.sniffHeaders(Seq(7L -> jpeg).toDF("id", "bin"), "id", "bin")
      .collect().head
    assert((out.getString(1), out.getLong(2), out.getLong(3), out.getLong(4)) ==
      ("jpeg", 3L, 5L, 8L))
  }
}

/** Round-10: streaming token-budget admission (budgetAdmitSink) —
  * cross-batch budget fill, replay exactly-once, and the one-batch ==
  * c10 batch-operator equivalence. */
class BudgetAdmitSinkSpec extends SparkSpec {
  import graft.streaming.StreamingOps
  import graft.operators.Corpus

  private def newDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("budadm").toFile
    d.delete(); d.getAbsolutePath
  }
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("doc_id", "src", "n_tokens", "cum_tokens")
      .collect().map(_.mkString("|")).sorted.toSeq

  test("one-batch stream equals the c10 batch operator exactly") {
    val docs = graft.Tables.documents(spark, sfDir)
    val store = newDir(); val out = newDir()
    StreamingOps.budgetAdmitBatch(docs, 0L, "doc_id", "text", "source",
      Map("src0" -> 300L), 700L, store, out)
    val streamed = spark.read.parquet(s"$out/batch=0")
    val batch = Corpus.tokenBudgetMix(docs, "doc_id", "text", "source",
      Map("src0" -> 300L), 700L)
    assert(canon(streamed) == canon(batch))
  }

  test("budgets fill across batches; replay is byte-equivalent; filled sources stop") {
    val docs = graft.Tables.documents(spark, sfDir).cache()
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    val store = newDir(); val out = newDir()
    val budget = 200L
    StreamingOps.budgetAdmitBatch(b0, 0L, "doc_id", "text", "source",
      Map.empty, budget, store, out)
    StreamingOps.budgetAdmitBatch(b1, 1L, "doc_id", "text", "source",
      Map.empty, budget, store, out)
    val all = spark.read.parquet(s"$out/batch=0", s"$out/batch=1")
    // per source: every admission was under budget BEFORE itself, and
    // the final fill reaches >= budget (enough mass exists per source)
    val perSrc = all.groupBy("src")
      .agg(sum("n_tokens").as("tot"), max("cum_tokens").as("mx"),
        sum((col("cum_tokens") - col("n_tokens") >= budget).cast("long")).as("over"))
      .collect()
    assert(perSrc.nonEmpty)
    perSrc.foreach { r =>
      assert(r.getLong(r.fieldIndex("over")) == 0, s"over-budget admission in $r")
      assert(r.getLong(r.fieldIndex("mx")) >= budget, s"under-filled source $r")
      assert(r.getLong(r.fieldIndex("mx")) == r.getLong(r.fieldIndex("tot")))
    }
    // a source filled in batch 0 admits nothing in batch 1
    val filled0 = spark.read.parquet(s"$out/batch=0")
      .groupBy("src").agg(max("cum_tokens").as("c"))
      .filter(col("c") >= budget).select("src")
    val leak = spark.read.parquet(s"$out/batch=1")
      .join(filled0, Seq("src")).count()
    assert(leak == 0, s"$leak admissions from already-filled sources")
    // replay batch 1: identical output (reads only strictly-prior state)
    val before = canon(spark.read.parquet(s"$out/batch=1"))
    StreamingOps.budgetAdmitBatch(b1, 1L, "doc_id", "text", "source",
      Map.empty, budget, store, out)
    assert(canon(spark.read.parquet(s"$out/batch=1")) == before)
    docs.unpersist()
  }
}

/** Round-10: bloom sidecar index — point-lookup file skipping where
  * min/max stats cannot prune (high-cardinality column scattered
  * across every file). Exactness over EVERY key (no false negatives),
  * a real prune ratio, DV composition, and unindexed-commit safety. */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def newRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtbloom").toFile
    d.delete(); d.getAbsolutePath
  }

  test("bloom prunes point lookups stats cannot; exact over every key; DVs compose") {
    val root = newRoot()
    // k clusters the files; v is high-cardinality and SCATTERED — every
    // file's [min, max] on v spans the domain, so stats keep everything
    // zero-padded so lexical order == numeric order: uniform values
    // make every file's [min, max] span most of the domain
    val df = spark.range(1024)
      .select(col("id").as("k"),
        concat(lit("u"), lpad(((col("id") * 2654435761L) % 1000003L).cast("string"),
          7, "0")).as("v"))
    VersionedTable.commit(df.repartitionByRange(16, col("k")), root,
      statsCols = Seq("k", "v"))
    VersionedTable.buildBloomIndex(spark, root, "v", bitsPerFile = 1 << 14)
    // stats keep a majority of files for a CENTRAL probe (a probe near
    // a domain extreme is exactly what min/max DOES prune); bloom
    // opens few
    val probeId = (0L until 64L).minBy(i =>
      math.abs((i * 2654435761L) % 1000003L - 500000L))
    val probe = "u" + "%07d".format((probeId * 2654435761L) % 1000003L)
    val (opened, statsKept, total) = VersionedTable.bloomPruneDetail(spark, root, "v", probe)
    assert(total == 16 && statsKept * 2 > total, s"scatter broken: $statsKept/$total")
    assert(opened * 4 <= statsKept, s"bloom opened $opened/$statsKept stats-kept files")
    // exactness: every key readable, right row, no false negatives
    val all = VersionedTable.read(spark, root).select("k", "v")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    for ((k, v) <- all.take(64)) {
      val got = VersionedTable.readEq(spark, root, "v", v)
        .select("k").collect().map(_.getLong(0)).toSet
      assert(got.contains(k), s"false negative for $v")
    }
    // a DV delete composes: the deleted row vanishes from readEq too
    val victim = all.head
    VersionedTable.deleteWhereDv(spark, root, s"k = ${victim._1}")
    assert(VersionedTable.readEq(spark, root, "v", victim._2)
      .filter(col("k") === victim._1).isEmpty, "DV ignored by readEq")
  }

  test("files committed after the build are conservatively kept") {
    val root = newRoot()
    val df = spark.range(256).select(col("id").as("k"),
      concat(lit("w"), col("id").cast("string")).as("v"))
    VersionedTable.commit(df.repartitionByRange(8, col("k")), root,
      statsCols = Seq("v"))
    VersionedTable.buildBloomIndex(spark, root, "v", bitsPerFile = 1 << 14)
    VersionedTable.commit(
      Seq((9999L, "wNEW")).toDF("k", "v"), root, mode = "append")
    // the new file has no index entry: the lookup must still find it
    val got = VersionedTable.readEq(spark, root, "v", "wNEW")
      .select("k").collect().map(_.getLong(0))
    assert(got.sameElements(Array(9999L)))
  }

  test("vacuum keeps only the newest bloom build per column; lookups survive") {
    val root = newRoot()
    val df = spark.range(128).select(col("id").as("k"),
      concat(lit("x"), col("id").cast("string")).as("v"))
    VersionedTable.commit(df.repartitionByRange(4, col("k")), root,
      statsCols = Seq("v"))
    VersionedTable.buildBloomIndex(spark, root, "v")
    VersionedTable.commit(Seq((500L, "x500")).toDF("k", "v"), root, mode = "append")
    VersionedTable.buildBloomIndex(spark, root, "v")
    VersionedTable.vacuum(spark, root, retainVersions = 2, graceMs = 0L)
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val builds = f.listStatus(
      new org.apache.hadoop.fs.Path(root, "_index/bloom_v")).map(_.getPath.getName)
    assert(builds.sameElements(Array("v2")), builds.mkString(","))
    assert(VersionedTable.readEq(spark, root, "v", "x77")
      .select("k").collect().map(_.getLong(0)).sameElements(Array(77L)))
  }
}

/** Round-10: AS OF TIMESTAMP time travel — resolution picks the
  * newest commit at-or-before the instant, ties break newest, and a
  * pre-retention timestamp fails loudly instead of resolving to v1. */
class AsOfTimestampSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  test("timestamp resolution tracks commit times; pre-history fails") {
    val root = {
      val d = java.nio.file.Files.createTempDirectory("vtasof").toFile
      d.delete(); d.getAbsolutePath
    }
    VersionedTable.commit(Seq(1L).toDF("k"), root)
    val t1 = System.currentTimeMillis()
    Thread.sleep(20)
    VersionedTable.commit(Seq(2L).toDF("k"), root, mode = "append")
    val t2 = System.currentTimeMillis()
    assert(VersionedTable.versionAsOf(spark, root, t1) == 1L)
    assert(VersionedTable.versionAsOf(spark, root, t2) == 2L)
    assert(VersionedTable.readAsOf(spark, root, t1).count() == 1)
    assert(VersionedTable.readAsOf(spark, root, t2).count() == 2)
    intercept[IllegalArgumentException] {
      VersionedTable.versionAsOf(spark, root, t1 - 1000000L)
    }
  }
}

/** Round-10: DESCRIBE DETAIL health audit — the census must track the
  * table through its lifecycle: small-file debt appears on fragmented
  * append, DV debt on merge-on-read delete, shard count after
  * shardManifest, and stats coverage distinguishes covered eras. */
class DescribeDetailSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  test("census tracks files, bytes, small files, DVs, shards, stats coverage") {
    val root = {
      val d = java.nio.file.Files.createTempDirectory("vtdetail").toFile
      d.delete(); d.getAbsolutePath
    }
    VersionedTable.commit(
      spark.range(1000).select(col("id").as("k")).repartitionByRange(4, col("k")),
      root, statsCols = Seq("k"))
    // an all-null file records no min/max for k — the uncovered case
    VersionedTable.commit(
      Seq(Option.empty[Long]).toDF("k"), root, mode = "append")
    VersionedTable.deleteWhereDv(spark, root, "k = 9")
    VersionedTable.shardManifest(spark, root, targetFilesPerShard = 2)
    val d = VersionedTable.describeDetail(spark, root).collect().head
    def g(n: String) = d.getLong(d.fieldIndex(n))
    assert(g("n_files") == 5, s"files ${g("n_files")}")
    assert(g("n_shards") >= 2)
    assert(g("n_small_files") == 5) // toy files are all tiny
    assert(g("files_with_bytes") == 5 && g("known_bytes") > 0)
    assert(g("n_dv") == 1)
    assert(d.getString(d.fieldIndex("stats_cols")) == "k")
    assert(g("files_with_stats") == 4, "the all-null file must not count as covered")
    assert(g("row_count") == 1000) // 1001 committed - 1 DV'd
  }
}

/** Round-10: maximal independent set (g23) — semantic certificate:
  * no undecided nodes at the fixed round budget, no edge inside the
  * set (independence), every excluded node has a set neighbor
  * (maximality). */
class MisSpec extends SparkSpec {
  import graft.graph.GraphOps

  private def certify(dir: String): Unit = {
    val e = graft.queries.GraphQueries.chainEdges(spark, dir, withSkip = true)
    val mis = GraphOps.maximalIndependentSet(e, rounds = 16).cache()
    try {
      assert(mis.filter(col("st") === "u").isEmpty, s"unconverged at $dir")
      val e2 = e.select("src", "dst")
        .union(e.select(col("dst").as("src"), col("src").as("dst")))
      val ins = mis.filter(col("st") === "i").select(col("node"))
      val inside = e2
        .join(ins.withColumnRenamed("node", "src"), "src")
        .join(ins.withColumnRenamed("node", "dst"), "dst").count()
      assert(inside == 0, s"$inside edges inside the set at $dir")
      val witnessless = mis.filter(col("st") === "o")
        .join(e2.join(ins.withColumnRenamed("node", "dst"), "dst")
          .select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
        .count()
      assert(witnessless == 0, s"$witnessless excluded nodes lack a set neighbor at $dir")
    } finally mis.unpersist()
  }

  test("independence + maximality + convergence at sf0.001")(certify(sfDir))
  test("independence + maximality + convergence at sf0.01")(
    certify("/root/testdata/sf0.01"))
}

/** Round-10: INCREMENTAL bloom maintenance — re-covering after an
  * append must scan only the appended files, carry live covered
  * entries verbatim, stay exact across eras, and no-op when covered. */
class BloomIncrementalSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  test("incremental build covers appends; lookups exact across eras; no-op when covered") {
    val root = {
      val d = java.nio.file.Files.createTempDirectory("vtbloominc").toFile
      d.delete(); d.getAbsolutePath
    }
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi)
      .select(col("id").as("k"), concat(lit("y"), col("id").cast("string")).as("v"))
    VersionedTable.commit(mk(0, 256).repartitionByRange(8, col("k")), root,
      statsCols = Seq("v"))
    VersionedTable.buildBloomIndex(spark, root, "v", bitsPerFile = 1 << 14)
    val v2 = VersionedTable.commit(mk(1000, 1128).repartitionByRange(4, col("k")),
      root, mode = "append")
    val built = VersionedTable.buildBloomIndexIncremental(spark, root, "v")
    assert(built == v2)
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dirs = f.listStatus(new org.apache.hadoop.fs.Path(root, "_index/bloom_v"))
      .map(_.getPath.getName).sorted
    assert(dirs.sameElements(Array("v1", s"v$v2")), dirs.mkString(","))
    // the new build covers all 12 files (8 carried + 4 fresh)
    val idx = spark.read.parquet(s"$root/_index/bloom_v/v$v2")
    assert(idx.count() == 12)
    // exact lookups from BOTH eras through the new build
    for (probe <- Seq("y7", "y255", "y1000", "y1127")) {
      val got = VersionedTable.readEq(spark, root, "v", probe)
        .select("v").collect().map(_.getString(0))
      assert(got.sameElements(Array(probe)), s"$probe -> ${got.mkString(",")}")
    }
    // and the old-era probe actually prunes (bloom does the work)
    val (opened, statsKept, total) = VersionedTable.bloomPruneDetail(spark, root, "v", "y7")
    assert(total == 12 && opened * 3 <= statsKept,
      s"opened $opened of $statsKept stats-kept / $total")
    // fully covered -> no-op (no new dir, same return)
    assert(VersionedTable.buildBloomIndexIncremental(spark, root, "v") == v2)
    assert(f.listStatus(new org.apache.hadoop.fs.Path(root, "_index/bloom_v"))
      .map(_.getPath.getName).sorted.sameElements(Array("v1", s"v$v2")))
  }
}

/** Round-10: BMP/WAV header sniffing agrees with the full codecs'
  * geometry on byte-identical payloads — the sniffer reads headers
  * only, the codec decodes; both must tell the same story. */
class SniffBmpWavSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators._

  private def leI(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def leS(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def bmp(w: Int, h: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val pix = h * stride
    Array[Byte]('B', 'M') ++ leI(54 + pix) ++ leI(0) ++ leI(54) ++
      leI(40) ++ leI(w) ++ leI(h) ++ leS(1) ++ leS(24) ++ leI(0) ++
      leI(pix) ++ leI(2835) ++ leI(2835) ++ leI(0) ++ leI(0) ++
      Array.fill[Byte](pix)(7)
  }
  private def wav(nSamples: Int, rate: Int): Array[Byte] = {
    val data = Array.fill[Byte](nSamples * 2)(1)
    Array[Byte]('R', 'I', 'F', 'F') ++ leI(36 + data.length) ++
      Array[Byte]('W', 'A', 'V', 'E') ++
      Array[Byte]('f', 'm', 't', ' ') ++ leI(16) ++ leS(1) ++ leS(1) ++
      leI(rate) ++ leI(rate * 2) ++ leS(2) ++ leS(16) ++
      Array[Byte]('d', 'a', 't', 'a') ++ leI(data.length) ++ data
  }

  test("sniffed BMP/WAV geometry equals the codecs' decoded geometry") {
    val payloads = Seq(1L -> bmp(5, 3), 2L -> wav(12, 8000))
    val sniffed = Multimodal.sniffHeaders(payloads.toDF("id", "bin"), "id", "bin")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(sniffed(1L) == ("bmp", 5L, 3L, 24L))
    assert(sniffed(2L) == ("wav", 12L, 8000L, 16L))
    val db = BmpCodec.decode(bmp(5, 3), 1)
    assert(sniffed(1L)._2 == db.width && sniffed(1L)._3 == db.height)
    val dw = WavCodec.decode(wav(12, 8000), 1)
    assert(sniffed(2L)._2 == dw.width && sniffed(2L)._3 == dw.height)
    // a RIFF that is not WAVE stays unknown
    val avi = wav(4, 8000); avi(8) = 'A'; avi(9) = 'V'; avi(10) = 'I'; avi(11) = ' '
    val u = Multimodal.sniffHeaders(Seq(3L -> avi).toDF("id", "bin"), "id", "bin")
      .collect().head
    assert(u.getString(1) == "unknown")
  }
}

/** Round-10: resize edge cases — empty payload, and a non-divisible
  * height where bottom blocks average over their REAL pixel count. */
class ResizeGraySpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Multimodal

  test("constant raster, partial bottom blocks, and empty payload are exact") {
    val const = Array.fill[Byte](192)(10) // 32x6 -> 8x2, every pv = 10
    val ramp = Array.tabulate[Byte](40)(i => if (i < 32) 100.toByte else 0) // 32x2: row0=100, row1: 8 real 0s + pad
    val rows = Seq(1L -> const, 2L -> ramp, 3L -> Array.empty[Byte])
    val out = Multimodal.resizeGray(rows.toDF("id", "bin"), "id", "bin")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 16 blocks of value 10: sum 160, pos sum 10 * (0+1+...+15) = 1200
    assert(out(1L) == (8L, 2L, 160L, 1200L))
    // 32x2 raster, oh = 1, blocks are 4 wide x 2 high (h=2): each block
    // sums 4 pixels of 100 (row 0) + row-1 values, div 8
    // blocks 0,1: row1 real zeros -> (400+0)/8 = 50
    // blocks 2..7: row1 pad (absent bytes) -> 400/8 = 50 as well
    assert(out(2L) == (8L, 1L, 8L * 50L, 50L * (0 to 7).sum))
    assert(out(3L) == (8L, 1L, 0L, 0L))
  }
}
