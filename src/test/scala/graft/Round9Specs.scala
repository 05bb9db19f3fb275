package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-9 MIPS scale tier: the norm-augmentation reduction must
  * actually RETRIEVE — recall@10 against [[Similarity.knnMips]]'s
  * brute inner-product truth, over a wider query set than the oracle
  * entry exercises. */
/** Round-9 merge-on-read deletes: a deletion-vector delete commits
  * ONLY a vector file + manifest — zero data rewrites — and every
  * read path subtracts the vectors; compaction folds them; time
  * travel sees each era's vectors; copy-on-write rewrites fold
  * touched files' vectors and carry untouched files'. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def newRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtdv").toFile
    d.delete(); d.getAbsolutePath
  }

  test("delete touches zero data files; reads, time travel, append, merge, compact all DV-correct") {
    val root = newRoot()
    val v1 = VersionedTable.commit(
      (0 until 100).map(i => (i.toLong, i.toLong * 10)).toDF("id", "v")
        .repartition(4), root)
    val files1 = VersionedTable.snapshot(spark, root, v1).files.toSet
    val v2 = VersionedTable.deleteWhereDv(spark, root, "id % 10 = 3")
    assert(v2 == v1 + 1)
    assert(VersionedTable.snapshot(spark, root, v2).files.toSet == files1,
      "DV delete must reference the SAME data files — zero rewrites")
    assert(VersionedTable.read(spark, root).count() == 90)
    assert(VersionedTable.read(spark, root).filter("id % 10 = 3").count() == 0)
    assert(VersionedTable.read(spark, root, v1).count() == 100,
      "time travel to the pre-delete era sees every row")
    val v3 = VersionedTable.deleteWhereDv(spark, root, "id % 10 = 4")
    assert(VersionedTable.read(spark, root).count() == 80)
    assert(VersionedTable.read(spark, root, v2).count() == 90,
      "each era sees exactly its own vectors")
    // no-match delete: no empty commit
    assert(VersionedTable.deleteWhereDv(spark, root, "id = 3") == v3,
      "re-deleting vectored rows must not commit")
    // append carries the vectors forward
    VersionedTable.commit(Seq((1003L, 1L)).toDF("id", "v"), root, mode = "append")
    assert(VersionedTable.read(spark, root).count() == 81)
    assert(VersionedTable.read(spark, root).filter("id = 3").count() == 0)
    // merge folds the touched file's vectors, carries the rest
    VersionedTable.merge(Seq((5L, 555L)).toDF("id", "v"), root, Seq("id"))
    val after = VersionedTable.read(spark, root)
    assert(after.count() == 81)
    assert(after.filter("id = 5").select("v").as[Long].head() == 555L)
    assert(after.filter("id % 10 = 3 AND id < 1000").count() == 0)
    assert(after.filter("id % 10 = 4").count() == 0)
    // compaction folds every remaining vector into plain data files
    VersionedTable.compact(spark, root)
    assert(VersionedTable.dvEntries(spark, root).isEmpty,
      "compaction must fold deletion vectors")
    assert(VersionedTable.read(spark, root).count() == 81)
  }

  test("readRange subtracts vectors and stats-prune stays conservative") {
    val root = newRoot()
    VersionedTable.commit(
      (0 until 64).map(i => (i.toLong, s"r$i")).toDF("k", "s")
        .repartitionByRange(4, col("k")), root, statsCols = Seq("k"))
    VersionedTable.deleteWhereDv(spark, root, "k >= 10 AND k < 14")
    val got = VersionedTable.readRange(spark, root, "k", "8", "15")
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(8L, 9L, 14L, 15L), s"range read wrong: $got")
  }
}

/** Round-9 change feed + optimize: file-granularity CDF between any
  * two versions (DV deltas as row-exact deletes), and one-call
  * OPTIMIZE = curve-clustered rewrite with stats on every cluster
  * column. */
class ChangeFeedOptimizeSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def newRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtcf").toFile
    d.delete(); d.getAbsolutePath
  }

  test("changesBetween: appends are inserts, DV growth is row-exact deletes") {
    val root = newRoot()
    val v1 = VersionedTable.commit(
      (0 until 50).map(i => (i.toLong, i.toLong)).toDF("id", "v").repartition(2), root)
    val v2 = VersionedTable.commit(
      (100 until 110).map(i => (i.toLong, 0L)).toDF("id", "v"), root, mode = "append")
    val v3 = VersionedTable.deleteWhereDv(spark, root, "id >= 40 AND id < 45")
    // v1 -> v2: pure insert of the appended rows
    val c12 = VersionedTable.changesBetween(spark, root, v1, v2)
      .select("_change_type", "id").as[(String, Long)].collect().toSet
    assert(c12 == (100L until 110L).map(("insert", _)).toSet, s"v1->v2: $c12")
    // v2 -> v3: DV growth only — exactly the five vectored rows, as deletes
    val c23 = VersionedTable.changesBetween(spark, root, v2, v3)
      .select("_change_type", "id").as[(String, Long)].collect().toSet
    assert(c23 == (40L until 45L).map(("delete", _)).toSet, s"v2->v3: $c23")
    // v1 -> v3 composes both
    val c13 = VersionedTable.changesBetween(spark, root, v1, v3)
      .select("_change_type", "id").as[(String, Long)].collect().toSet
    assert(c13 == ((100L until 110L).map(("insert", _)) ++
      (40L until 45L).map(("delete", _))).toSet, s"v1->v3: $c13")
  }

  test("optimize clusters + records stats: every dimension prunes, rows unchanged") {
    val root = newRoot()
    val side = 16
    VersionedTable.commit(
      spark.range(0, side.toLong * side * side).select(
        (col("id") % side).as("x"), ((col("id") / side) % side).cast("long").as("y"),
        ((col("id") / (side * side)) % side).cast("long").as("z"),
        col("id").as("payload")).repartition(8), root)
    val before = VersionedTable.read(spark, root).select("payload")
      .as[Long].collect().sorted.toSeq
    VersionedTable.optimize(spark, root, Seq("x", "y", "z"), bits = 4, nFiles = 32)
    for (d <- Seq("x", "y", "z")) {
      val (kept, total) = VersionedTable.prunedFiles(spark, root, d, "0", "3")
      assert(kept.size * 2 < total,
        s"$d in [0,3] must prune to a strict minority after optimize: ${kept.size}/$total")
    }
    val after = VersionedTable.read(spark, root).select("payload")
      .as[Long].collect().sorted.toSeq
    assert(after == before, "optimize must not change the row set")
  }
}

/** Round-9 metadata-only row counts + history: stats-tracked commits
  * answer count(*) from the manifest (DV subtraction included), and
  * the proof is physical — a data file can be REMOVED and the count
  * still answers. */
class RowCountHistorySpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def newRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtrc").toFile
    d.delete(); d.getAbsolutePath
  }

  test("rowCount answers from metadata alone, DV-aware; None without tracking") {
    val root = newRoot()
    VersionedTable.commit(
      (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "v").repartition(4),
      root, statsCols = Seq("id"))
    assert(VersionedTable.rowCount(spark, root).contains(100L))
    VersionedTable.deleteWhereDv(spark, root, "id < 7")
    assert(VersionedTable.rowCount(spark, root).contains(93L),
      "deletion vectors must subtract")
    // physical proof of metadata-only: remove one DATA file — the
    // count must still answer (a scan would now throw)
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val victim = VersionedTable.snapshot(spark, root).files.head
    assert(f.delete(new org.apache.hadoop.fs.Path(victim), false))
    assert(VersionedTable.rowCount(spark, root).contains(93L),
      "rowCount must not touch data files")
    // a table without stats tracking answers honestly
    val plain = newRoot()
    VersionedTable.commit(Seq((1L, 1L)).toDF("id", "v"), plain)
    assert(VersionedTable.rowCount(spark, plain).isEmpty)
  }

  test("describeHistory lists every retained version with meta and file counts") {
    val root = newRoot()
    VersionedTable.commit(
      (0 until 10).map(i => (i.toLong, i.toLong)).toDF("id", "v"), root)
    VersionedTable.commit(Seq((100L, 1L)).toDF("id", "v"), root,
      mode = "append", meta = Map("job" -> "nightly"))
    val h = VersionedTable.describeHistory(spark, root)
      .select("version", "n_files", "meta").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(h(1).getInt(1) > h(0).getInt(1), "append grows the file count")
    assert(h(1).getString(2).contains("job=nightly"))
  }
}

/** Round-9 table-follow stream: each committed version's changes are
  * delivered exactly once, replay-safe. */
class TableFollowSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable
  import graft.streaming.StreamingOps.tableFollowBatch

  private def newRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtfl").toFile
    d.delete(); d.getAbsolutePath
  }

  test("snapshot, appends, and DV deletes stream through exactly once") {
    val root = newRoot(); val out = newRoot()
    VersionedTable.commit(
      (0 until 20).map(i => (i.toLong, i.toLong)).toDF("id", "v"), root)
    tableFollowBatch(spark, root, out, 0L) // batch 0: full snapshot
    VersionedTable.commit(Seq((100L, 1L), (101L, 1L)).toDF("id", "v"),
      root, mode = "append")
    tableFollowBatch(spark, root, out, 1L) // batch 1: the append
    tableFollowBatch(spark, root, out, 2L) // no new version: no output
    VersionedTable.deleteWhereDv(spark, root, "id < 3")
    tableFollowBatch(spark, root, out, 3L) // batch 3: three deletes
    val got = spark.read.parquet(out).drop("batch")
      .select("_change_type", "id").as[(String, Long)].collect().toSet
    val want = (0L until 20L).map(("insert", _)).toSet ++
      Set(("insert", 100L), ("insert", 101L)) ++
      (0L until 3L).map(("delete", _)).toSet
    assert(got == want, s"stream delivered: $got")
    // crash-replay of batch 3 recomputes the same delta and overwrites
    val before = spark.read.parquet(out).collect().toSet
    tableFollowBatch(spark, root, out, 3L)
    assert(spark.read.parquet(out).collect().toSet == before,
      "replayed poll must leave the output byte-equivalent")
  }
}

/** Round-9 shallow CLONE + RESTORE: zero-copy snapshot clones pin
  * their source snapshot and commit independently; restore rolls the
  * current state back as a NEW commit, history intact. */
class CloneRestoreSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def newRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtcl").toFile
    d.delete(); d.getAbsolutePath
  }

  test("clone pins the snapshot (DVs included); commits independent; restore flips back") {
    val src = newRoot(); val dst = newRoot()
    VersionedTable.commit(
      (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "v").repartition(4), src)
    VersionedTable.deleteWhereDv(spark, src, "id % 10 = 0") // v2: 90 live
    VersionedTable.clone(spark, src, dst)
    def ids(root: String, version: Long = -1L): Set[Long] =
      VersionedTable.read(spark, root, version).select("id").as[Long].collect().toSet
    assert(ids(dst) == ids(src) && ids(dst).size == 90,
      "clone must read the source snapshot exactly, deletion vectors applied")
    // later source commits never affect the clone
    VersionedTable.commit(Seq((500L, 1L)).toDF("id", "v"), src, mode = "append") // v3
    assert(ids(dst).size == 90, "clone must stay pinned to its snapshot")
    // clone commits write under the clone only
    VersionedTable.commit(Seq((900L, 9L)).toDF("id", "v"), dst, mode = "append")
    assert(ids(dst).size == 91 && ids(src).size == 91 && !ids(src).contains(900L),
      "clone append must not leak into the source")
    assert(ids(dst).contains(900L))
    // restore the source to v1 (pre-delete): bad commits stay in history
    val rv = VersionedTable.restore(spark, src, 1L)
    assert(rv == 4L)
    assert(ids(src).size == 100, "restore must resurrect v1's contents")
    assert(ids(src, 3L).size == 91, "history before the restore stays readable")
    assert(ids(dst).size == 91, "restore on the source never touches the clone")
  }
}

/** Round-9 HTML extraction: the classifier must keep exactly the
  * content paragraphs (which reconstruct the original text) and
  * reject every boilerplate class wrapHtml plants. */
class ExtractTextSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Corpus

  test("content paragraphs reconstruct the text; nav/h1/link-spam/footer rejected") {
    val text = "the quick brown fox jumps over the lazy dog and runs " +
      "into the deep green forest while the sun sets on a calm evening"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = Corpus.extractText(
      Corpus.wrapHtml(docs, "doc_id", "text"), "doc_id", "html").collect()(0)
    assert(out.getAs[Long]("n_blocks") == 7L, "nav,h1,p,p,div,footer,tail")
    assert(out.getAs[Long]("n_good") == 2L, "exactly the two content paragraphs")
    assert(out.getAs[String]("main_text") == text,
      "good blocks must reconstruct the original text")
  }

  test("a pure link-farm page extracts nothing") {
    val html = """<html><body><div><a href="#">the best deals</a> """ +
      """<a href="#">click here for more of the offers</a></div></body></html>"""
    val out = Corpus.extractText(
      Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html").collect()(0)
    assert(out.getAs[Long]("n_good") == 0L)
    assert(out.getAs[String]("main_text") == "")
  }

  test("plain prose with no markup survives as one good block") {
    val text = "the report said that most of the results were stable " +
      "and the remaining work is planned for the next quarter"
    val out = Corpus.extractText(
      Seq((1L, text)).toDF("doc_id", "html"), "doc_id", "html").collect()(0)
    assert(out.getAs[Long]("n_good") == 1L)
    assert(out.getAs[String]("main_text") == text)
  }
}

/** Round-9 streaming ANN append sink: micro-batch appends against the
  * frozen standing quantizer must equal the batch incremental path on
  * the same splits, and a replayed batch must leave the store
  * byte-equivalent. */
class IvfAppendSinkSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import graft.streaming.StreamingOps

  test("micro-batch appends == batch knnIvfIncremental; replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivfsink").toString
    val e = Tables.embeddings(spark, sfDir)
    val base = e.filter(col("vec_id") < 400)
    val q = e.filter(col("vec_id") < 5)
    def rows(lo: Long, hi: Long): Seq[(Long, Seq[Float])] = e
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
    val in = MemoryStream[(Long, Seq[Float])]
    val sink = StreamingOps.ivfAppendSink(
      in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      base, s"$dir/store")
      .option("checkpointLocation", s"$dir/ckpt").start()
    in.addData(rows(400, 450): _*); sink.processAllAvailable()
    in.addData(rows(450, 500): _*); sink.processAllAvailable()
    sink.stop()
    val stored = StreamingOps.readIvfStore(spark, s"$dir/store", "vec_id", "embedding")
    assert(stored.count() == 100L, "both micro-batches landed")
    val viaStore = Similarity.knnIvfIncremental(base, stored, q,
      "vec_id", "embedding", k = 10)
    val direct = Similarity.knnIvfIncremental(base, e.filter(col("vec_id") >= 400), q,
      "vec_id", "embedding", k = 10)
    assert(viaStore.exceptAll(direct).count() == 0L &&
      direct.exceptAll(viaStore).count() == 0L,
      "querying base ∪ store must equal the batch incremental path")
    // crash-restart replay of batch 1 rewrites its own subdir only
    val before = spark.read.parquet(s"$dir/store").collect().toSet
    StreamingOps.ivfAppendBatch(rows(450, 500).toDF("vec_id", "embedding"), 1L,
      "vec_id", "embedding", base, s"$dir/store", 16, 0)
    val after = spark.read.parquet(s"$dir/store").collect().toSet
    assert(after == before, "replayed batch must leave the store byte-equivalent")
  }
}

/** Round-9 Hilbert layout: the 4-plus-dimension clustering curve.
  * Correctness = the defining curve properties (bijection +
  * Manhattan-adjacent consecutive cells — Morton has diagonal jumps);
  * value = the 4-D touched-file comparison vs Morton that motivated
  * it (ClusteredTableSpec's shape at n = 4). */
class HilbertLayoutSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Layout
  import graft.sources.VersionedTable

  test("hilbert key is a bijection and consecutive cells are Manhattan-adjacent") {
    val bits = 2; val side = 1 << bits
    val cells = for (x <- 0 until side; y <- 0 until side;
                     z <- 0 until side; w <- 0 until side)
      yield (x.toLong, y.toLong, z.toLong, w.toLong)
    val rows = cells.toDF("x", "y", "z", "w")
      .withColumn("h", Layout.hilbertKey(
        Seq(col("x"), col("y"), col("z"), col("w")), bits))
      .collect()
      .map(r => (r.getLong(4), (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(rows.map(_._1).toSet == (0L until 256L).toSet,
      "hilbert index must be a bijection onto [0, 16^2)")
    val byH = rows.sortBy(_._1).map(_._2)
    byH.sliding(2).foreach { case Array(a, b) =>
      val d = math.abs(a._1 - b._1) + math.abs(a._2 - b._2) +
        math.abs(a._3 - b._3) + math.abs(a._4 - b._4)
      assert(d == 1, s"curve jump between $a and $b")
    }
  }

  test("hilbert_index is on the SQL surface and matches Layout.hilbertKey") {
    org.apache.spark.sql.graftbridge.GraftFunctions.install(spark)
    val df = spark.range(0, 64).select((col("id") % 8).as("x"),
      (col("id") / 8).cast("long").as("y"))
    df.createOrReplaceTempView("hil_pts")
    val viaSql = spark.sql("SELECT x, y, hilbert_index(3, x, y) AS h FROM hil_pts")
    val viaCol = df.withColumn("h",
      Layout.hilbertKey(Seq(col("x"), col("y")), 3))
    assert(viaSql.exceptAll(viaCol).count() == 0 &&
      viaCol.exceptAll(viaSql).count() == 0,
      "SQL surface must match the Column API bit-for-bit")
  }

  test("4-D clustered commit: hilbert touches fewer stat-pruned files than morton") {
    val bits = 3; val side = 1 << bits // 8^4 = 4096 cells, 64 files
    val grid = spark.range(0, side.toLong * side * side * side).select(
      (col("id") % side).as("x"), ((col("id") / side) % side).cast("long").as("y"),
      ((col("id") / (side * side)) % side).cast("long").as("z"),
      ((col("id") / (side * side * side)) % side).cast("long").as("w"),
      col("id").as("payload"))
    val dims = Seq(col("x"), col("y"), col("z"), col("w"))
    val span = math.max(1L, (1L << (4 * bits)) / 64)
    def committed(key: org.apache.spark.sql.Column): String = {
      val root = { val d = java.nio.file.Files.createTempDirectory("hil").toFile
        d.delete(); d.getAbsolutePath }
      val keyed = grid.withColumn("__k", key).withColumn("__fid", expr(s"__k div $span"))
      VersionedTable.commit(
        keyed.repartitionByRange(64, col("__fid"))
          .sortWithinPartitions("__k").drop("__k", "__fid"),
        root, statsCols = Seq("x", "y", "z", "w"))
      root
    }
    val mRoot = committed(Layout.interleaveKey(dims, bits))
    val hRoot = committed(Layout.hilbertKey(dims, bits))
    var mTotal = 0; var hTotal = 0
    for (d <- Seq("x", "y", "z", "w")) {
      val (mk, mt) = VersionedTable.prunedFiles(spark, mRoot, d, "0", "1")
      val (hk, ht) = VersionedTable.prunedFiles(spark, hRoot, d, "0", "1")
      info(s"dim $d slab [0,1]: morton ${mk.size}/$mt, hilbert ${hk.size}/$ht")
      mTotal += mk.size; hTotal += hk.size
      // rows must stay exact through the pruned read on both layouts
      for (root <- Seq(mRoot, hRoot)) {
        val got = VersionedTable.readRange(spark, root, d, "0", "1")
          .agg(count(lit(1))).as[Long].head()
        assert(got == 2L * side * side * side, s"$root/$d rows: $got")
      }
    }
    info(s"total kept over 4 slab queries: morton $mTotal, hilbert $hTotal")
    assert(hTotal < mTotal,
      s"hilbert must touch fewer files than morton across the 4 dims: $hTotal vs $mTotal")
    // and the WORST dimension improves: morton's top-interleaved dims
    // prune well at the expense of the low-order dims (its 32/64 is no
    // prune at all — exactly the half the key's top bits fix); hilbert
    // spreads locality across all four (measured 22–28 vs 16–32)
    val mWorst = Seq("x", "y", "z", "w")
      .map(d => VersionedTable.prunedFiles(spark, mRoot, d, "0", "1")._1.size).max
    val hWorst = Seq("x", "y", "z", "w")
      .map(d => VersionedTable.prunedFiles(spark, hRoot, d, "0", "1")._1.size).max
    assert(hWorst < mWorst,
      s"hilbert worst-dimension touch must beat morton's: $hWorst vs $mWorst")
  }
}

/** Round-9 incremental IVF-PQ: with the quantizer frozen on the base
  * and a data-independent codebook, the O(batch) append must equal
  * the full rebuild bit-for-bit (the d15/d20 incremental gate,
  * applied to the PQ tier). */
class IvfPqIncrementalSpec extends SparkSpec {

  test("incremental append == full rebuild over base ∪ batch") {
    val e = Tables.embeddings(spark, sfDir)
    val base = e.filter(col("vec_id") < 400)
    val batch = e.filter(col("vec_id") >= 400)
    val q = e.filter(col("vec_id") < 5)
    val inc = Similarity.knnIvfPqIncremental(base, batch, q,
      "vec_id", "embedding", k = 10)
    val full = Similarity.knnIvfPq(e, q, "vec_id", "embedding",
      k = 10, lloydIters = 0)
    assert(inc.exceptAll(full).count() == 0L && full.exceptAll(inc).count() == 0L,
      "incremental and rebuild must emit identical rows")
  }
}

class MipsLshRecallSpec extends SparkSpec {

  test("augmented corpus vectors all reach (approximately) the max norm") {
    val e = Tables.embeddings(spark, sfDir)
    // every augmented corpus vector's squared norm must equal M² to
    // float precision — the property that makes cosine order = ip order
    val aug = Similarity.knnMipsLsh(e, e.filter(col("vec_id") < 1),
      "vec_id", "embedding", k = 1)
    assert(aug.count() >= 1L) // plumbing sanity; the norm property is
    // checked directly below via the same construction
    import spark.implicits._
    val norms = e.select(expr(
      "aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
      .as[Double].collect()
    val m2 = norms.max
    val augNorm = norms.map(n2 => n2 + {
      val a = math.sqrt(math.max(m2 - n2, 0.0)).toFloat.toDouble; a * a
    })
    augNorm.foreach(n2 =>
      assert(math.abs(n2 - m2) / m2 < 1e-5, s"aug norm $n2 vs $m2"))
  }

  test("magnitude ordering survives the reduction; the max-IP item is always retrieved") {
    import spark.implicits._
    val dims = 64
    val rnd = new scala.util.Random(42)
    def unit(): Array[Float] = {
      val v = Array.fill(dims)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    // 5 query directions; per direction three aligned corpus clones at
    // magnitudes 3.0 / 1.5 / 0.5 — identical COSINE (1.0) to the query,
    // so only an inner-product-aware index can order them — plus 200
    // sub-unit random distractors (recommendation-shaped data)
    val qdirs = (0 until 5).map(_ => unit())
    val qdf = qdirs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
    val corpus = Seq.newBuilder[(Long, Seq[Float])]
    for (i <- 0 until 5) {
      corpus += ((100L + i, qdirs(i).map(_ * 3.0f).toSeq))
      corpus += ((200L + i, qdirs(i).map(_ * 1.5f).toSeq))
      corpus += ((300L + i, qdirs(i).map(_ * 0.5f).toSeq))
    }
    for (j <- 0 until 200) {
      val v = unit(); val s = rnd.nextFloat()
      corpus += ((1000L + j, v.map(_ * s).toSeq))
    }
    val cdf = corpus.result().toDF("vec_id", "embedding")
    val truth = Similarity.knnMips(cdf, qdf, "vec_id", "embedding", k = 3)
      .select("query_id", "rk", "neighbor_id").as[(Long, Int, Long)].collect()
    val got = Similarity.knnMipsLsh(cdf, qdf, "vec_id", "embedding", k = 3)
      .select("query_id", "rk", "neighbor_id").as[(Long, Int, Long)].collect()
    // brute truth is the aligned family in magnitude order
    for (i <- 0L until 5L)
      assert(truth.filter(_._1 == i).sortBy(_._2).map(_._3).toSeq ==
        Seq(100L + i, 200L + i, 300L + i), s"brute MIPS truth wrong for q$i")
    // the max-IP item has augmented cosine 1.0 → identical buckets in
    // every table: it MUST be retrieved, and at rank 1, for every query
    for (i <- 0L until 5L)
      assert(got.filter(_._1 == i).minBy(_._2)._3 == 100L + i,
        s"q$i: max-IP neighbor not at rank 1")
    // among retrieved aligned clones, order must follow MAGNITUDE
    // (augmented-space cosine is monotone in ip for a fixed query)
    for (i <- 0L until 5L) {
      val fam = got.filter(g => g._1 == i && Set(100L + i, 200L + i, 300L + i)(g._3))
        .sortBy(_._2).map(_._3 / 100)
      assert(fam.toSeq == fam.toSeq.sorted,
        s"q$i: magnitude order broken: ${fam.toSeq}")
    }
    // overall recall@3 vs brute truth
    val hits = truth.map(t => (t._1, t._3)).toSet
      .intersect(got.map(g => (g._1, g._3)).toSet).size
    val recall = hits.toDouble / truth.length
    info(f"augmented-LSH MIPS recall@3 = $recall%.3f ($hits/${truth.length})")
    assert(recall >= 0.4, f"recall@3 $recall%.3f below floor")
    // MULTI-PROBE recovers more of the truth set from the SAME index
    val mp = Similarity.knnMipsLsh(cdf, qdf, "vec_id", "embedding", k = 3,
      multiProbe = 2)
      .select("query_id", "rk", "neighbor_id").as[(Long, Int, Long)].collect()
    val mpHits = truth.map(t => (t._1, t._3)).toSet
      .intersect(mp.map(g => (g._1, g._3)).toSet).size
    val mpRecall = mpHits.toDouble / truth.length
    info(f"multi-probe (2) recall@3 = $mpRecall%.3f ($mpHits/${truth.length})")
    assert(mpRecall >= recall, "multi-probe must never lose recall")
    assert(mpRecall >= 0.6, f"multi-probe recall@3 $mpRecall%.3f below floor")
  }
}
