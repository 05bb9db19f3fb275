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

  test("clone manifest lines keep the URI scheme") {
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
      val p = if (l.startsWith("!dv\t")) l.split('\t')(1) else l.split('\t')(0)
      assert(p.startsWith("file:/"), s"clone line lost its scheme: $l")
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
