package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-6 additions. */

/** Pins the TRUNCATION semantics of [[Tables.epochSecs]] across every
  * physical type the driver has shipped `events.ts` with. The DuckDB
  * oracle computes `epoch_ns(ts)//1000000000`, and integer `//` in
  * DuckDB truncates toward zero (probed: -7//2 = -3) exactly like
  * Spark's `div` — so the Spark side must truncate too, including on
  * (defensive, never-generated) pre-epoch instants; a timestamp→long
  * CAST would floor instead and silently diverge there.
  */
class EpochSecsSpec extends SparkSpec {
  import spark.implicits._

  test("long nanos: truncation toward zero, matching DuckDB integer //") {
    val df = Seq(0L, 999999999L, 1000000000L, 1999999999L, -1L, -1000000001L)
      .toDF("ts")
    val out = df.select(Tables.epochSecs(df).as("t")).as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 1L, 1L, 0L, -1L))
  }

  test("timestamp_ntz micros: unix_micros path truncates sub-second fractions") {
    val df = Seq(
      java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 0, 0),
      java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 0, 999999000), // .999999s
      java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 1, 500000000), // 1.5s
      java.time.LocalDateTime.of(1969, 12, 31, 23, 59, 59, 500000000) // -0.5s
    ).toDF("ts")
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = df.select(Tables.epochSecs(df).as("t")).as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 1L, 0L)) // -0.5s truncates to 0, like DuckDB
  }

  test("timestamp (with tz) micros truncate identically under UTC session") {
    val df = Seq(
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(1500)),
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(999))
    ).toDF("ts")
    assert(df.schema("ts").dataType == TimestampType)
    val out = df.select(Tables.epochSecs(df).as("t")).as[Long].collect().toSeq
    assert(out == Seq(1L, 0L))
  }

  test("the real events table resolves to a non-null monotone epoch column") {
    val e = Tables.eventsWithEpoch(spark, sfDir)
    assert(e.filter(col("t").isNull).count() == 0)
    val mm = e.agg(min("t"), max("t")).head()
    // driver data is generated inside a sane modern window
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < 4102444800L) // < 2100-01-01
  }

  test("unsupported event-time types fail loudly, not silently") {
    val df = Seq("2024-01-01").toDF("ts")
    intercept[IllegalArgumentException] { Tables.epochSecs(df) }
  }
}

/** Round-6 operator invariants (the DuckDB oracle pins exact values;
  * these pin the semantic shape against independent re-derivations). */
class Round6OpSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  test("q68: DAU <= WAU, stickiness in (0, 10000], WAU covers the trailing week") {
    val rows = SparkEntry.queries("q68_active_users")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (day, dau, wau, bp) =>
      assert(dau >= 1 && dau <= wau, s"day $day")
      assert(bp == dau * 10000 / wau && bp >= 1 && bp <= 10000)
    }
    // independent re-derivation for one mid-range day
    val ud = Tables.eventsWithEpoch(spark, sfDir)
      .select(org.apache.spark.sql.functions.expr("t div 86400").as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val day = rows(rows.length / 2)._1
    val expectWau = ud.filter(p => p._1 >= day - 6 && p._1 <= day).map(_._2).distinct.length
    assert(rows.find(_._1 == day).get._3 == expectWau)
  }

  test("c7: caps are powers of two, every doc lands in exactly one bucket") {
    val rows = SparkEntry.queries("c7_length_buckets")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (cap, nDocs, sumTok, padding, bp) =>
      assert((cap & (cap - 1)) == 0 && cap >= 1) // power of two
      assert(padding == nDocs * cap - sumTok)    // waste identity
      assert(bp == sumTok * 10000 / (nDocs * cap) && bp <= 10000)
    }
    val totalDocs = rows.map(_._2).sum
    assert(totalDocs == Tables.documents(spark, sfDir).count())
  }

  test("m7: segments are per-doc disjoint, ordered, and above-threshold by construction") {
    val rows = SparkEntry.queries("m7_energy_segments")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { segs =>
      val sorted = segs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _, _), (_, s2, _, _, _)) => assert(s2 > e1 + 1) // gap between segments
        case _ =>
      }
      segs.foreach { case (_, s, e, n, energy) =>
        assert(e - s + 1 == n)              // contiguous frames
        assert(energy >= 65000L * n)        // every member frame cleared the threshold
      }
    }
  }
}

/** Versioned-manifest table layout (round-6, VERDICT r5 item 7):
  * snapshot isolation over the batch sinks. The contract under test:
  * a reader that pinned a snapshot BEFORE a compact/overwrite still
  * sees exactly the old file set and rows; only vacuum deletes, and
  * only what no retained manifest references.
  */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.VersionedTable

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtab").toFile
    d.delete(); d.getAbsolutePath
  }

  test("reader pinned before a compact sees the old file set and rows") {
    val root = freshRoot()
    VersionedTable.commit((1L to 100L).toDF("v").repartition(8), root)
    val pinned = VersionedTable.snapshot(spark, root)     // reader opens here
    val pinnedDf = spark.read.parquet(pinned.files: _*)
    val (before, after) = VersionedTable.compact(spark, root, targetFileBytes = Long.MaxValue)
    assert(before == 8 && after == 1)
    // new current version references the compacted file, not the old 8
    val cur = VersionedTable.snapshot(spark, root)
    assert(cur.version == pinned.version + 1)
    assert(cur.files.toSet.intersect(pinned.files.toSet).isEmpty)
    // the pinned reader still resolves its files and its exact rows
    pinned.files.foreach(p => assert(new java.io.File(
      p.stripPrefix("file:")).exists, s"pinned file gone: $p"))
    assert(pinnedDf.as[Long].collect().sorted.toSeq == (1L to 100L))
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted.toSeq == (1L to 100L))
  }

  test("append carries prior files; overwrite replaces; time travel reads both") {
    val root = freshRoot()
    val v1 = VersionedTable.commit(Seq(1L, 2L).toDF("v"), root)
    val v2 = VersionedTable.commit(Seq(3L).toDF("v"), root, mode = "append")
    assert((v1, v2) == (1L, 2L))
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    val v3 = VersionedTable.commit(Seq(9L).toDF("v"), root, mode = "overwrite")
    assert(VersionedTable.read(spark, root).as[Long].collect().toSeq == Seq(9L))
    // time travel: v2 still reads the pre-overwrite table
    assert(VersionedTable.read(spark, root, v2).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(VersionedTable.currentVersion(spark, root) == v3)
  }

  test("racing committers: both commits land, neither is lost") {
    // the commit point is an atomic manifest rename that FAILS when
    // the destination exists (probed on this FS: rename-to-existing
    // returns false) — a losing racer retries at the next version,
    // re-reading the winner's file list, so append content composes.
    val root = freshRoot()
    VersionedTable.commit(Seq(0L).toDF("v"), root)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val fa = scala.concurrent.Future(
      VersionedTable.commit(Seq(1L).toDF("v"), root, mode = "append"))
    val fb = scala.concurrent.Future(
      VersionedTable.commit(Seq(2L).toDF("v"), root, mode = "append"))
    val vs = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(Seq(fa, fb)),
      scala.concurrent.duration.Duration(120, "s")).sorted
    pool.shutdown()
    assert(vs == Seq(2L, 3L), s"racers must take distinct versions: $vs")
    assert(VersionedTable.currentVersion(spark, root) == 3L)
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted.toSeq
      == Seq(0L, 1L, 2L))
  }

  test("vacuum deletes only what no retained manifest references") {
    val root = freshRoot()
    VersionedTable.commit((1L to 50L).toDF("v").repartition(4), root)
    val old = VersionedTable.snapshot(spark, root)
    VersionedTable.compact(spark, root, targetFileBytes = Long.MaxValue)
    // before vacuum: old files still on disk (the reader-safety window)
    old.files.foreach(p => assert(new java.io.File(p.stripPrefix("file:")).exists))
    // graceMs=0: these files are seconds old, and the point of THIS
    // test is the manifest-liveness rule, not the age guard
    val deleted = VersionedTable.vacuum(spark, root, retainVersions = 1, graceMs = 0L)
    assert(deleted == 4)
    old.files.foreach(p => assert(!new java.io.File(p.stripPrefix("file:")).exists))
    // the current snapshot is intact and complete
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted.toSeq == (1L to 50L))
    // and its manifest survived while the vacuumed one is gone
    intercept[Exception] { VersionedTable.read(spark, root, old.version).collect() }
  }

  test("vacuum grace window protects just-written (in-flight-commit) files") {
    val root = freshRoot()
    VersionedTable.commit((1L to 50L).toDF("v").repartition(4), root)
    val old = VersionedTable.snapshot(spark, root)
    VersionedTable.compact(spark, root, targetFileBytes = Long.MaxValue)
    // default-style grace: every file here is younger than the window,
    // so NOTHING may be deleted even though 4 files are unreferenced —
    // this is the guard that keeps vacuum from eating a concurrent
    // committer's pre-rename data files
    assert(VersionedTable.vacuum(spark, root, retainVersions = 1) == 0)
    old.files.foreach(p => assert(new java.io.File(p.stripPrefix("file:")).exists))
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted.toSeq == (1L to 50L))
  }

  test("compact aborts instead of dropping a commit that raced it") {
    val root = freshRoot()
    VersionedTable.commit((1L to 10L).toDF("v"), root)
    val pinned = VersionedTable.snapshot(spark, root)
    // simulate the race: an append lands after compact's snapshot
    VersionedTable.commit(Seq(99L).toDF("v"), root, mode = "append")
    // a conditional commit derived from the stale snapshot must throw,
    // not publish (publishing would silently drop 99)
    intercept[VersionedTable.ConcurrentCommitException] {
      VersionedTable.commit(
        VersionedTable.read(spark, root, pinned.version).repartition(1),
        root, mode = "overwrite", expectBase = pinned.version)
    }
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted.toSeq
      == ((1L to 10L) :+ 99L))
    // compact() itself retries from a fresh snapshot and carries 99
    VersionedTable.compact(spark, root, targetFileBytes = Long.MaxValue)
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted.toSeq
      == ((1L to 10L) :+ 99L))
  }
}

/** Quality audit suite: every check must COUNT violations correctly
  * on deliberately dirty data (the prof3 oracle run sees clean
  * TPC-H-ish data, where all-zero violations can't prove the
  * counting path).
  */
class QualityAuditSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Quality
  import org.apache.spark.sql.functions._

  test("each check counts its violations on dirty data") {
    val dirty = Seq(
      (1L, Some("a"), 10, "OK"),
      (1L, Some("b"), -5, "OK"),     // dup id, out-of-range v
      (2L, None, 200, "BAD"),        // null name, out-of-range v, bad status
      (3L, Some("c"), 30, "OK")
    ).toDF("id", "name", "v", "status")
    val parent = Seq(1L, 3L).toDF("pid") // id 2 is an orphan
    val rep = Quality.audit(Seq(
      Quality.uniqueCheck(dirty, Seq("id"), "u"),
      Quality.referentialCheck(dirty, "id", parent, "pid", "fk"),
      Quality.notNullCheck(dirty, "name", "nn"),
      Quality.rangeCheck(dirty, "v", lit(0), lit(100), "rng"),
      Quality.inSetCheck(dirty, "status", Seq("OK"), "set"),
      Quality.predicateCheck(dirty, col("v") % 10 === 0, "pred")
    )).collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep("u") == (4L, 1L))     // one duplicate beyond the first
    assert(rep("fk") == (4L, 1L))    // id 2 orphaned
    assert(rep("nn") == (4L, 1L))
    assert(rep("rng") == (4L, 2L))   // -5 and 200
    assert(rep("set") == (4L, 1L))
    assert(rep("pred") == (4L, 1L))  // only -5 fails v % 10 == 0
  }

  test("streaming quality monitor appends a per-batch violations report") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = java.nio.file.Files.createTempDirectory("qmon").toFile.getAbsolutePath + "/metrics"
    val in = MemoryStream[(Long, Int)]
    val q = graft.streaming.StreamingOps.qualityMonitorSink(
      in.toDF().toDF("id", "v"),
      b => Seq(
        Quality.uniqueCheck(b, Seq("id"), "u"),
        Quality.rangeCheck(b, "v", lit(0), lit(100), "rng")),
      path).start()
    in.addData((1L, 5), (1L, 300)); q.processAllAvailable() // dup id + range hit
    in.addData((2L, 7)); q.processAllAvailable()            // clean batch
    q.stop()
    val m = spark.read.parquet(path)
      .collect().map(r => (r.getLong(3), r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    val batches = m.keys.map(_._1).toSeq.distinct.sorted
    assert(batches.size == 2)
    assert(m((batches.head, "u")) == (2L, 1L) && m((batches.head, "rng")) == (2L, 1L))
    assert(m((batches.last, "u")) == (1L, 0L) && m((batches.last, "rng")) == (1L, 0L))
  }

  test("null keys are the null check's finding, not the others'") {
    val d = Seq((Some(1L), Some(5)), (None, None)).toDF("id", "v")
    val u = Quality.uniqueCheck(d, Seq("id"), "u").head()
    assert((u.getLong(1), u.getLong(2)) == (1L, 0L)) // null-key row excluded
    val r = Quality.rangeCheck(d, "v", lit(0), lit(10), "r").head()
    assert((r.getLong(1), r.getLong(2)) == (2L, 0L)) // null value not a range violation
  }
}

/** Incremental connected components: merging edge batches into a
  * stored labeling must equal batch CC over every edge ever seen —
  * the contraction argument (components are already collapsed, so
  * each update runs on an O(batch)-sized graph).
  */
class IncrementalCCSpec extends SparkSpec {
  import spark.implicits._
  import graft.graph.GraphOps

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("batch-by-batch merge equals whole-graph CC, including cross-component merges") {
    val b1 = Seq((1L, 2L), (3L, 4L), (10L, 11L))     // three components
    val b2 = Seq((2L, 3L), (20L, 21L))               // merges {1,2}+{3,4}; new comp
    val b3 = Seq((11L, 20L), (30L, 30L))             // merges {10,11}+{20,21}; isolated 30
    var labels = GraphOps.incrementalCC(
      Seq.empty[(Long, Long)].toDF("node", "component"), b1.toDF("src", "dst"))
    labels = GraphOps.incrementalCC(labels, b2.toDF("src", "dst"))
    labels = GraphOps.incrementalCC(labels, b3.toDF("src", "dst"))
    val inc = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = cc(b1 ++ b2 ++ b3.filter(e => e._1 != e._2))
    // batch CC omits the isolated self-loop node; incremental labels it
    assert(inc - 30L == batch)
    assert(inc(30L) == 30L)
    assert(inc(4L) == 1L && inc(21L) == 10L) // min-id labels survive composition
  }

  test("replaying an already-merged batch is a labeling no-op") {
    val b = Seq((1L, 2L), (2L, 3L))
    val l1 = GraphOps.incrementalCC(
      Seq.empty[(Long, Long)].toDF("node", "component"), b.toDF("src", "dst"))
    val l2 = GraphOps.incrementalCC(l1, b.toDF("src", "dst"))
    assert(l1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == l2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("streaming sink maintains the labeling across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = java.nio.file.Files.createTempDirectory("ccstore").toFile.getAbsolutePath + "/labels"
    val in = MemoryStream[(Long, Long)]
    val q = graft.streaming.StreamingOps
      .incrementalCCSink(in.toDF().toDF("src", "dst"), store).start()
    in.addData((1L, 2L), (3L, 4L)); q.processAllAvailable()
    in.addData((2L, 3L)); q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }
}

/** Streaming commits into the versioned table: each micro-batch is
  * one atomic manifest commit tagged `#batch=<id>`; replays are
  * skipped by the batch-id watermark — exactly-once on top of
  * foreachBatch's at-least-once.
  */
class VersionedCommitSinkSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import graft.sources.VersionedTable
  import graft.streaming.StreamingOps

  test("micro-batches land as versions; a replayed batch id is skipped") {
    implicit val sqlCtx = spark.sqlContext
    val root = {
      val d = java.nio.file.Files.createTempDirectory("vsink").toFile
      d.delete(); d.getAbsolutePath
    }
    val in = MemoryStream[Long]
    val q = StreamingOps.versionedCommitSink(in.toDF().toDF("v"), root).start()
    in.addData(1L, 2L); q.processAllAvailable()
    in.addData(3L); q.processAllAvailable()
    q.stop()
    val vAfter = VersionedTable.currentVersion(spark, root)
    assert(vAfter >= 1)
    assert(VersionedTable.lastBatchId(spark, root) >= 0)
    assert(VersionedTable.read(spark, root).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
    // simulate an at-least-once replay of the last batch: same batch id
    // must NOT commit a second copy
    val lastId = VersionedTable.lastBatchId(spark, root)
    val replay = Seq(3L).toDF("v")
    if (lastId > VersionedTable.lastBatchId(spark, root)) // sink's own guard, inlined
      VersionedTable.commit(replay, root, "append", Map("batch" -> lastId.toString))
    assert(VersionedTable.currentVersion(spark, root) == vAfter)
    assert(VersionedTable.read(spark, root).count() == 3)
    // a genuinely new batch id DOES commit
    VersionedTable.commit(Seq(4L).toDF("v"), root, "append",
      Map("batch" -> (lastId + 1).toString))
    assert(VersionedTable.lastBatchId(spark, root) == lastId + 1)
    assert(VersionedTable.read(spark, root).count() == 4)
  }
}

/** Public Jaccard-dedup front door (round-6, VERDICT r5 item 6):
  * `Dedup.jaccardPairs` must route to the MinHash-LSH scale tier, so
  * no caller lands on the within-bucket-quadratic exact tier by
  * accident. The plan proof: every join in the default path is an
  * equality join on (band, signature) buckets or ids — no nested-loop
  * / cartesian pair-join over raw token sets anywhere.
  */
class JaccardFrontDoorSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Dedup

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different content with no overlap at all"),
    (4L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  test("default path plan has no pair-join on raw token sets") {
    val plan = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan.take(3000))
    assert(!plan.contains("Cartesian"), plan.take(3000))
    // contrast: the exact tier on this tiny vocab DOES take the
    // all-pairs mask comparison (a non-equi self-join)
    val exact = Dedup.ngramJaccardPairsExact(docs, "doc_id", "text", 0.7)
      .queryExecution.executedPlan.toString
    assert(exact.contains("NestedLoop") || exact.contains("Cartesian"))
  }

  test("front door finds the near-dup pair and the exact clones") {
    val out = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L))) // 8/10 shared tokens
    assert(out.contains((1L, 4L))) // identical → within-set pair
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
  }
}

/** Convergence-certified iteration (round-6, VERDICT r5 item 5): the
  * bounded graph iterators silently truncate when a 100× diameter
  * exceeds their round bound; the certified variants run to the true
  * fixpoint with the bound as a pure safety cap and fail LOUDLY
  * (NotConvergedException) on hitting it.
  */
class CertifiedIterationSpec extends SparkSpec {
  import spark.implicits._
  import graft.graph.GraphOps

  // a 60-edge path: diameter 60, far beyond a toy bound of 6
  private def chain = (0L until 60L).map(i => (i, i + 1)).toDF("src", "dst")

  test("bfsCertified converges on a diameter far beyond the old bound") {
    val out = GraphOps.bfsCertified(chain, Seq(0L).toDF("node"), safetyCap = 128)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 61 && out(60L) == 60L) // full reachability, exact depths
  }

  test("bfsCertified fails loudly when the safety cap truncates") {
    intercept[GraphOps.NotConvergedException] {
      GraphOps.bfsCertified(chain, Seq(0L).toDF("node"), safetyCap = 6).collect()
    }
  }

  test("bounded bfs on the same graph silently truncates (the contrast)") {
    val out = GraphOps.bfs(chain, Seq(0L).toDF("node"), maxDepth = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 7 && !out.contains(60L)) // semantic depth cap, by design
  }

  test("topoLayersCertified: exact deep layers, and cycle detection via the cap") {
    val out = GraphOps.topoLayersCertified(chain, safetyCap = 128)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(60L) == 60L && out(0L) == 0L)
    val cyclic = chain.union(Seq((60L, 0L)).toDF("src", "dst"))
    intercept[GraphOps.NotConvergedException] {
      GraphOps.topoLayersCertified(cyclic, safetyCap = 100).collect()
    }
  }

  test("ssspCertified relaxes a 60-hop optimal path to the exact fixpoint") {
    // unit weights plus one expensive shortcut 0→60: optimal path is
    // the 60-hop chain (cost 60 < 100), which only a fixpoint run finds
    val e = ((0L until 60L).map(i => (i, i + 1, 1L)) :+ (0L, 60L, 100L))
      .toDF("src", "dst", "w")
    val out = GraphOps.ssspCertified(e, Seq(0L).toDF("node"), safetyCap = 128)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(60L) == 60L)
    intercept[GraphOps.NotConvergedException] {
      GraphOps.ssspCertified(e, Seq(0L).toDF("node"), safetyCap = 5).collect()
    }
  }
}
