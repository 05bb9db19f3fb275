package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Round-8: the digest-keyed span-dedup exchange (the 100-TB wire
  * format — 16-byte 128-bit gram keys instead of k=40-char gram
  * text) is pinned equal to the text-keyed ground truth on a
  * clone-heavy corpus, and the incremental tier's "history always
  * wins" contract is pinned under a deliberately interleaved id
  * space (the case where full-run equivalence does NOT apply).
  */
class DigestSpanSpec extends SparkSpec {
  import spark.implicits._

  private val k = 40

  test("digest-keyed path == text-keyed path on a clone-heavy corpus") {
    // clone-heavy: every doc duplicated once under a shifted id, plus
    // cross-doc shared boilerplate via the natural sf corpus overlap
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    val n = base.agg(max("doc_id")).as[Long].head() + 1
    val corpus = base.unionByName(
      base.select((col("doc_id") + n).as("doc_id"), col("text")))
    val dig = Dedup.spanDedup(corpus, "doc_id", "text", k, keyByDigest = true)
    val txt = Dedup.spanDedup(corpus, "doc_id", "text", k, keyByDigest = false)
    assert(dig.exceptAll(txt).count() == 0L && txt.exceptAll(dig).count() == 0L)
  }

  test("incremental digest path == incremental text path") {
    val docs = Tables.documents(spark, sfDir)
    val mid = docs.agg(max("doc_id")).as[Long].head() / 2
    val h = docs.filter(col("doc_id") <= mid)
    val b = docs.filter(col("doc_id") > mid)
    val dig = Dedup.spanDedupIncremental(h, b, "doc_id", "text", k, keyByDigest = true)
    val txt = Dedup.spanDedupIncremental(h, b, "doc_id", "text", k, keyByDigest = false)
    assert(dig.exceptAll(txt).count() == 0L && txt.exceptAll(dig).count() == 0L)
  }

  test("history occurrences win regardless of doc_id order (interleaved ids)") {
    // the batch doc has a SMALLER id than the history doc carrying
    // the same text — full-run-over-union semantics would keep the
    // batch copy; the incremental contract keeps history's.
    val t = "0123456789" * 8 // 80 chars, > k
    val history = Seq(100L -> t).toDF("doc_id", "text")
    val batch = Seq(5L -> t).toDF("doc_id", "text")
    val out = Dedup.spanDedupIncremental(history, batch, "doc_id", "text", k)
      .select("doc_id", "clean_len").as[(Long, Long)].collect().toMap
    assert(out(5L) == 0L, "batch clone of a history doc must clean to empty even with a smaller id")
  }
}

/** Round-8 incremental ANN maintenance (the d7/d15/d20 incremental
  * gate applied to similarity): a vector batch appends to the
  * STANDING IVF index — frozen coarse quantizer, nearest-cell
  * assignment, zero base touches — instead of a rebuild.
  */
class IvfAppendSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sfDir)

  test("lloydIters=0: incremental search == full rebuild (seeds live in base)") {
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    val q = emb.filter(col("vec_id") < 5)
    val inc = Similarity.knnIvfIncremental(base, batch, q, "vec_id", "embedding",
      k = 10, lloydIters = 0)
    val full = Similarity.knnIvf(emb, q, "vec_id", "embedding", k = 10, lloydIters = 0)
    assert(inc.exceptAll(full).count() == 0L && full.exceptAll(inc).count() == 0L)
  }

  test("frozen-quantizer append: batch cells match a nearest-standing-cell recompute") {
    // the Lloyd-refined deployment posture: centroids trained on base
    // only; the appended assignment must equal an independent
    // nearest-cell recompute of the SAME batch against the SAME
    // frozen quantizer (idempotence / determinism of the append),
    // and appending must leave base assignments untouched.
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    val a1 = Similarity.ivfAppendCells(base, batch, "vec_id", "embedding", lloydIters = 2)
    val a2 = Similarity.ivfAppendCells(base, batch, "vec_id", "embedding", lloydIters = 2)
    assert(a1.exceptAll(a2).count() == 0L && a2.exceptAll(a1).count() == 0L)
    assert(a1.count() == batch.count(), "every batch vector must land in exactly one cell")
    // base assignments are a pure function of (base, quantizer) —
    // computing them before and 'after' the append is the same call;
    // the invariant worth pinning is that the append path never
    // reassigns a base id:
    val baseCells = Similarity.ivfAppendCells(base, base, "vec_id", "embedding", lloydIters = 2)
    assert(baseCells.join(a1, "vec_id").count() == 0L,
      "append output must contain batch ids only — no base reassignment rides the append")
  }
}

/** Round-8 cap observability: the d4/m4 bucket-cap recall trade and
  * d19's cell cap must be VISIBLE in operator output — nonzero
  * n_capped_buckets / n_dropped_rows / cell_capped when a cap binds,
  * zero otherwise — so a deployment can detect traded completeness
  * from the result table instead of a source comment.
  */
class CapObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("phash pairs report bound caps; uncapped runs report zero") {
    // 6 clone payloads: identical hashes → every band bucket holds 6
    // DISTINCT ids (no signature collapse for media payloads), so
    // maxBucket=2 binds in all 4 bands and drops 4 rows from each.
    val base = ("A" * 40) + ("z" * 40) + ("A" * 40)
    val docs = (1L to 6L).map(_ -> base).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val capped = graft.operators.Multimodal
      .perceptualHashPairs(docs, "doc_id", "payload", maxBucket = 2)
      .select("n_capped_buckets", "n_dropped_rows").distinct()
      .as[(Long, Long)].collect()
    assert(capped.toSeq == Seq((4L, 16L)),
      s"4 bands x (6-2) dropped rows expected, got ${capped.toSeq}")
    val uncapped = graft.operators.Multimodal
      .perceptualHashPairs(docs, "doc_id", "payload", maxBucket = 4096)
      .select("n_capped_buckets", "n_dropped_rows").distinct()
      .as[(Long, Long)].collect()
    assert(uncapped.toSeq == Seq((0L, 0L)))
  }

  test("semDedup marks every vector of an over-full cell as cell_capped") {
    val e = Tables.embeddings(spark, sfDir)
    val out = graft.operators.Similarity
      .semDedup(e, "vec_id", "embedding", threshold = 0.4, maxCell = 3)
    // cells larger than 3 exist at sf0.001 (500 vecs over 16 cells)
    val marked = out.filter(col("cell_capped") === 1).count()
    assert(marked > 0L, "over-full cells must be marked")
    // the marking must be exactly cell-size > maxCell, per cell
    val bad = out.groupBy("cell")
      .agg(count(lit(1)).as("n"), sum("cell_capped").as("m"))
      .filter(!((col("n") > 3 && col("m") === col("n")) ||
                (col("n") <= 3 && col("m") === 0L)))
      .count()
    assert(bad == 0L)
    val capless = graft.operators.Similarity
      .semDedup(e, "vec_id", "embedding", threshold = 0.4)
    assert(capless.filter(col("cell_capped") === 1).count() == 0L)
  }
}

/** Round-8 manifest-level data skipping: per-file min/max stats
  * recorded at commit make the manifest the SCAN PLAN — a selective
  * read opens one small manifest and touches only the files whose
  * recorded range admits the predicate. The step a Delta/Iceberg-
  * shaped format takes after snapshot isolation.
  */
class DataSkippingSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtab").toFile
    d.delete(); d.getAbsolutePath
  }

  test("selective scan touches a strict minority of files; rows exact") {
    val root = freshRoot()
    // range-clustered layout (the layout a stats column exists for):
    // 1..1000 across 10 range-partitioned files
    val df = (1L to 1000L).toDF("v").repartitionByRange(10, col("v"))
    VersionedTable.commit(df, root, statsCols = Seq("v"))
    val (kept, total) = VersionedTable.prunedFiles(spark, root, "v", "150", "250")
    assert(total == 10, s"expected 10 files, got $total")
    assert(kept.size * 2 < total, s"pruned scan must touch a strict minority: ${kept.size}/$total")
    val got = VersionedTable.readRange(spark, root, "v", "150", "250")
      .as[Long].collect().sorted.toSeq
    assert(got == (150L to 250L), "pruned read must return exactly the range rows")
  }

  test("numeric compare, not string compare: [9, 10] keeps both boundary files") {
    val root = freshRoot()
    VersionedTable.commit(Seq(9L, 10L).toDF("v").repartitionByRange(2, col("v")),
      root, statsCols = Seq("v"))
    val got = VersionedTable.readRange(spark, root, "v", "9", "10")
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(9L, 10L), s"string-ordered stats would drop 9: $got")
  }

  test("stats survive append, merge, and compaction; pre-stats files are kept conservatively") {
    val root = freshRoot()
    // v1: no stats (pre-stats era)
    VersionedTable.commit((1L to 100L).toDF("k").withColumn("val", col("k") * 2)
      .repartitionByRange(4, col("k")), root)
    // v2 append WITH stats: inherits + records
    VersionedTable.commit((101L to 200L).toDF("k").withColumn("val", col("k") * 2)
      .repartitionByRange(4, col("k")), root, mode = "append", statsCols = Seq("k"))
    val (kept2, total2) = VersionedTable.prunedFiles(spark, root, "k", "150", "160")
    // the 4 stat-less v1 files are conservatively kept; of the 4 v2
    // files only those covering 150..160 survive
    assert(total2 == 8 && kept2.size < 8 && kept2.size >= 4,
      s"expected v1 files kept + v2 pruned, got ${kept2.size}/$total2")
    assert(VersionedTable.readRange(spark, root, "k", "150", "160")
      .select("k").as[Long].collect().sorted.toSeq == (150L to 160L))
    // merge rewrites one key; untouched files keep their stats lines
    VersionedTable.merge(Seq((150L, 999L)).toDF("k", "val"), root, Seq("k"))
    val got = VersionedTable.readRange(spark, root, "k", "150", "160")
      .select("k", "val").as[(Long, Long)].collect().toMap
    assert(got(150L) == 999L && got(160L) == 320L)
    // statscols meta survives the merge commit, so a compact keeps
    // recording stats for its rewritten files
    VersionedTable.compact(spark, root, targetFileBytes = 1L)
    val stAfter = VersionedTable.fileStats(spark, root).stats
    assert(stAfter.nonEmpty && stAfter.values.forall(_.contains("k")),
      "compacted files must carry fresh k stats")
    assert(VersionedTable.readRange(spark, root, "k", "150", "160")
      .select("k", "val").as[(Long, Long)].collect().toMap.apply(150L) == 999L)
  }

  test("time travel reads the stats of its era and stays exact") {
    val root = freshRoot()
    val v1 = VersionedTable.commit((1L to 100L).toDF("v")
      .repartitionByRange(5, col("v")), root, statsCols = Seq("v"))
    VersionedTable.commit((1000L to 1100L).toDF("v")
      .repartitionByRange(5, col("v")), root, mode = "overwrite")
    assert(VersionedTable.readRange(spark, root, "v", "10", "20", v1)
      .as[Long].collect().sorted.toSeq == (10L to 20L))
    val (k1, t1) = VersionedTable.prunedFiles(spark, root, "v", "10", "20", v1)
    assert(t1 == 5 && k1.size < t1)
  }
}

/** Round-8 BPE at a raised merge count (the r7 verdict's scale seam):
  * the training loop no longer collects the per-round argmax to the
  * driver — it is cut executor-side and folded into the next round
  * as a 1-row broadcast — and 64 rounds are pinned against an
  * INDEPENDENT single-machine BPE reference (leftmost-greedy merge,
  * (count desc, a, b) argmax tie-break, the Bpe.scala contract).
  */
class BpeScaleSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE trainer over (word, cnt): per round, count all
    * adjacent symbol pairs weighted by cnt, pick (max cnt, then
    * lexicographic (a, b)), merge leftmost-greedily. */
  private def reference(words: Map[String, Long], nMerges: Int): Seq[(String, String, Long)] = {
    var segs: Map[List[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toList } { case (_, c) => c }(_ + _)
    val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    for (_ <- 1 to nMerges if segs.exists(_._1.size > 1)) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- segs; i <- 0 until syms.size - 1)
        pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val ((a, b), c) = pc.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      out += ((a, b, c))
      segs = segs.groupMapReduce { case (syms, _) =>
        val r = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms(i) == a && syms(i + 1) == b) { r += a + b; i += 2 }
          else { r += syms(i); i += 1 }
        }
        r.toList
      } { case (_, c) => c }(_ + _)
    }
    out.toList
  }

  test("64 trained merges match the independent reference") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val words = graft.operators.Bpe.wordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    val want = reference(words, 64)
    val (merges, _) = graft.operators.Bpe.train(docs, "text", nMerges = 64)
    val got = merges.map(m => (m.a, m.b, m.cnt))
    assert(got.size == want.size, s"${got.size} merges vs reference ${want.size}")
    for (((g, w), i) <- got.zip(want).zipWithIndex)
      assert(g == w, s"merge ${i + 1}: $g vs reference $w")
  }
}

/** Round-8 N-dimensional interleave layout: three filter dimensions
  * clustered by one 3-way Morton key — each single-dimension
  * predicate touches a strict minority of files (the property no
  * single-column sort can give more than one dimension), and the
  * n=2 key is bit-identical to the existing zorderKey.
  */
class InterleaveLayoutSpec extends SparkSpec {
  import graft.operators.Layout
  import graft.sources.Sinks
  import org.apache.spark.sql.functions._

  test("interleaveKey n=2 equals zorderKey bit-for-bit") {
    val df = spark.range(0, 2048)
      .select((col("id") % 37).as("a"), (col("id") % 53).as("b"))
    val bad = df.withColumn("z2", Layout.zorderKey(col("a"), col("b"), 8))
      .withColumn("zn", Layout.interleaveKey(Seq(col("a"), col("b")), 8))
      .filter(col("z2") =!= col("zn")).count()
    assert(bad == 0L)
  }

  test("3-D interleave: every single-dimension filter touches a strict minority of files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ileave").toString
    // full 32x32x32 grid, one row per cell, clustered into 64 files
    val grid = spark.range(0, 32 * 32 * 32)
      .select((col("id") % 32).as("x"), ((col("id") / 32) % 32).cast("long").as("y"),
        ((col("id") / 1024) % 32).cast("long").as("z"), col("id").as("payload"))
    Sinks.writeInterleaved(grid, s"$dir/w", Seq("x", "y", "z"), 5, 64)

    def filesTouched(cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(s"$dir/w").filter(cond)
        .select(input_file_name()).distinct().count()

    val total = spark.read.parquet(s"$dir/w")
      .select(input_file_name()).distinct().count()
    // range partitioning 64 span ids into 64 partitions occasionally
    // merges two ids (and leaves one partition empty — no file)
    assert(total >= 60L && total <= 64L, s"expected ~64 files, got $total")
    // each dim<4 fixes 3 high bits of its dimension, two of which
    // land above the file-range granularity -> ~1/4 of files (+
    // range-boundary slop); a 1-D sort could give this to ONE dim only
    for (d <- Seq("x", "y", "z")) {
      val t = filesTouched(col(d) < 4)
      assert(t <= 20, s"$d<4 touched $t of 64 files")
    }
    // the 3-D corner box is a near-contiguous curve range
    val box = filesTouched(col("x") < 8 && col("y") < 8 && col("z") < 8)
    assert(box <= 6, s"corner box touched $box of 64 files")
  }
}

/** Round-8 streaming span dedup: d18/d20 as a live pipeline — each
  * micro-batch probes the standing gram-DIGEST store (16-byte keys;
  * the sink never retains history text at all) and the emitted
  * profiles equal the batch operator's on the same splits.
  */
class SpanDedupSinkSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("micro-batch profiles equal batch spanDedup / spanDedupIncremental") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("spansink").toString
    val t = "0123456789" * 8
    val u = "abcdefghij" * 8
    val b1 = Seq((1L, t), (2L, t + " tail one"), (3L, u))
    val b2 = Seq((10L, t), (11L, u + " more"), (12L, "short"))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.spanDedupSink(
        in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/store", s"$dir/out", k = 40)
      .option("checkpointLocation", s"$dir/ckpt").start()
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(s"$dir/out").drop("batch")
    val want1 = graft.operators.Dedup.spanDedup(b1.toDF("doc_id", "text"), "doc_id", "text", 40)
    val want2 = graft.operators.Dedup.spanDedupIncremental(
      b1.toDF("doc_id", "text"), b2.toDF("doc_id", "text"), "doc_id", "text", 40)
    val want = want1.unionByName(want2)
    assert(got.exceptAll(want).count() == 0L && want.exceptAll(got).count() == 0L)
    // the store holds DIGEST structs only (plus the batch-address
    // partition column) — no text column anywhere
    val store = spark.read.parquet(s"$dir/store")
    assert(store.columns.toSet == Set("g", "batch"))
    assert(store.schema("g").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(store.count() == store.select("g").distinct().count(),
      "store must stay distinct across batches")
  }

  test("a replayed micro-batch probes the pre-batch index and rewrites itself") {
    val dir = java.nio.file.Files.createTempDirectory("spanreplay").toString
    val t = "0123456789" * 8
    val u = "abcdefghij" * 8
    val b1 = Seq((1L, t), (2L, u)).toDF("doc_id", "text")
    val b2 = Seq((10L, t), (11L, u + " more")).toDF("doc_id", "text")
    import graft.streaming.StreamingOps.spanDedupBatch
    spanDedupBatch(b1, 0L, "doc_id", "text", s"$dir/store", s"$dir/out", 40)
    spanDedupBatch(b2, 1L, "doc_id", "text", s"$dir/store", s"$dir/out", 40)
    val outBefore = spark.read.parquet(s"$dir/out").collect().toSet
    val storeBefore = spark.read.parquet(s"$dir/store").collect().toSet
    // crash-restart: batch 1's offset never committed, the batch replays
    spanDedupBatch(b2, 1L, "doc_id", "text", s"$dir/store", s"$dir/out", 40)
    val outAfter = spark.read.parquet(s"$dir/out").collect().toSet
    val storeAfter = spark.read.parquet(s"$dir/store").collect().toSet
    assert(outAfter == outBefore,
      "replay must rewrite its own profiles byte-equivalent, not mark itself duplicate")
    assert(storeAfter == storeBefore, "replay must not grow or mutate the store")
    // and the replayed profiles are the CORRECT ones: doc 10 is a full
    // clone of history (cleans to ~empty), doc 11 keeps its new tail
    val profiles = spark.read.parquet(s"$dir/out")
      .filter(col("batch") === 1)
      .select("doc_id", "clean_len").as[(Long, Long)].collect().toMap
    assert(profiles(10L) < 40L, s"history clone must clean away: ${profiles(10L)}")
    assert(profiles(11L) > 0L, s"novel tail must survive: ${profiles(11L)}")
  }
}

/** Round-8 composition: interleave-clustered layout + manifest file
  * stats = the table format's OPTIMIZE-ZORDER loop. Rows are
  * curve-sorted BEFORE commit, the manifest records per-file min/max
  * for every clustered dimension, and a selective read on ANY of the
  * three dimensions prunes files from the MANIFEST alone — no file
  * footers, no listing, no partition columns.
  */
class ClusteredTableSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable
  import graft.operators.Layout

  test("interleave-clustered commit with stats prunes on every dimension from the manifest") {
    val root = {
      val d = java.nio.file.Files.createTempDirectory("ctab").toFile
      d.delete(); d.getAbsolutePath
    }
    val grid = spark.range(0, 32 * 32 * 32)
      .select((col("id") % 32).as("x"), ((col("id") / 32) % 32).cast("long").as("y"),
        ((col("id") / 1024) % 32).cast("long").as("z"), col("id").as("payload"))
    // curve-sort into 64 aligned spans, then COMMIT the clustered
    // frame with stats on all three dimensions
    val span = math.max(1L, (1L << 15) / 64)
    val keyed = grid.withColumn("__z",
        Layout.interleaveKey(Seq(col("x"), col("y"), col("z")), 5))
      .withColumn("__fid", expr(s"__z div $span"))
    val clustered = keyed.repartitionByRange(64, col("__fid"))
      .sortWithinPartitions("__z").drop("__z", "__fid")
    VersionedTable.commit(clustered, root, statsCols = Seq("x", "y", "z"))

    for (d <- Seq("x", "y", "z")) {
      val (kept, total) = VersionedTable.prunedFiles(spark, root, d, "0", "3")
      assert(total >= 60, s"$d: expected ~64 files, got $total")
      assert(kept.size * 2 < total,
        s"$d<4 must prune to a strict minority from the manifest: ${kept.size}/$total")
      val got = VersionedTable.readRange(spark, root, d, "0", "3")
        .agg(count(lit(1))).as[Long].head()
      assert(got == 4L * 32 * 32, s"$d range rows wrong: $got")
    }
  }
}

/** The stats-prune comparator must follow the COLUMN's type order
  * (from the manifest schema), not guess from the literal: a
  * numeric-looking STRING column records string-ordered min/max
  * ("10" < "9"), and a numeric probe against those would skip files
  * that do contain matching rows. */
class StringStatsPruneSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  test("numeric-looking string column prunes in string order, rows exact") {
    val root = {
      val d = java.nio.file.Files.createTempDirectory("vtabs").toFile
      d.delete(); d.getAbsolutePath
    }
    val df = (1 to 12).map(_.toString).toDF("s").repartitionByRange(4, col("s"))
    VersionedTable.commit(df, root, statsCols = Seq("s"))
    val want = (1 to 12).map(_.toString).filter(v => v >= "1" && v <= "5").sorted
    val got = VersionedTable.readRange(spark, root, "s", "1", "5")
      .as[String].collect().sorted.toSeq
    assert(got == want, s"string-range read wrong: $got vs $want")
  }
}

/** Float stats that record NaN/Infinity (max() propagates NaN) must not
  * crash the manifest prune — unparsable stats are treated like missing
  * stats: the file is conservatively kept and the row filter decides. */
class NaNStatsPruneSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  test("NaN-stats file is kept, read succeeds, rows exact") {
    val root = {
      val d = java.nio.file.Files.createTempDirectory("vtnan").toFile
      d.delete(); d.getAbsolutePath
    }
    val df = Seq(1.0, 2.0, Double.NaN, 9.0).toDF("v").repartition(1)
    VersionedTable.commit(df, root, statsCols = Seq("v"))
    val (kept, total) = VersionedTable.prunedFiles(spark, root, "v", "0", "3")
    assert(kept.size == total, "unparsable stats must keep the file")
    val got = VersionedTable.readRange(spark, root, "v", "0", "3")
      .as[Double].collect().sorted.toSeq
    assert(got == Seq(1.0, 2.0), s"range rows wrong: $got")
  }
}

/** Empty/short-doc micro-batches must not poison the span-dedup sink:
  * a parquet dir with no part files (only _SUCCESS) would break the
  * next batch's store read. */
class SpanDedupSinkEdgeSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("an all-short first batch leaves the store readable for later batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("spanedge").toString
    val t = "0123456789" * 8
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.spanDedupSink(
        in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/store", s"$dir/out", k = 40)
      .option("checkpointLocation", s"$dir/ckpt").start()
    in.addData(1L -> "short", 2L -> "also short") // no 40-grams at all
    q.processAllAvailable()
    in.addData(10L -> t, 11L -> t)                // real batch follows
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out")
      .select("doc_id", "clean_len").as[(Long, Long)].collect().toMap
    assert(out(1L) == 5L && out(2L) == 10L, "short docs pass through untouched")
    // t is period-10, so ExactSubstr self-repetition keeps only the
    // first period of doc 10; its clone (doc 11) cleans to empty
    assert(out(10L) == 10L && out(11L) == 0L, "batch dedup intact after empty store round")
  }
}
