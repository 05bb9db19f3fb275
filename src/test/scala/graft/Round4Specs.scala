package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphOps
import graft.operators.{Corpus, Dedup, Profiler, Snapshot}

/** Round-4 additions: fuzzy-dedup cluster table, CDC MERGE apply,
  * weighted corpus mixing, topological layering, table profiling.
  */
class FuzzyClustersSpec extends SparkSpec {
  import spark.implicits._

  test("transitive closure: A~B and B~C cluster together even when A and C differ more") {
    // B shares 19/20 tokens with both A and C, but A and C share only
    // 18/20 → jaccard(A,C) ≈ 0.857 is BELOW the 0.9 threshold while
    // A~B and B~C are above it. The cluster table must still put all
    // three in one component (keep_id = min id), which the pair
    // surface alone cannot express.
    val base = (1 to 20).map(i => s"w$i")
    val a = base.mkString(" ")                                // w1..w20
    val b = (base.tail :+ "x1").mkString(" ")                 // w2..w20, x1
    val c = (base.tail :+ "x2").mkString(" ")                 // w2..w20, x2
    val docs = Seq((10L, a), (20L, b), (30L, c)).toDF("doc_id", "text")
    val clusters = Dedup.fuzzyClusters(docs, "doc_id", "text",
      numHashes = 64, bands = 16, threshold = 0.9)
      .as[(Long, Long)].collect().toSet
    assert(clusters == Set((10L, 10L), (10L, 20L), (10L, 30L)))
  }

  test("singletons and exact clones: one row per doc, clones share min id") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "totally different words here"), (4L, "")).toDF("doc_id", "text")
    val out = Dedup.fuzzyClusters(docs, "doc_id", "text", 64, 16, 0.9)
      .as[(Long, Long)].collect().toSet
    // O(n) cluster table: exactly one row per document, tokenless doc
    // 4 survives as its own singleton
    assert(out == Set((1L, 1L), (1L, 2L), (3L, 3L), (4L, 4L)))
  }
}

class ApplyDiffSpec extends SparkSpec {
  import spark.implicits._

  test("applyDiff(old, diff(old, new)) == new for inserts, updates, deletes") {
    val old_ = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val new_ = Seq((2L, "b", 25.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "v") // 1 deleted, 2 updated, 4 inserted
    val d = Snapshot.diff(old_, new_, Seq("k"), Seq("name", "v"))
    val applied = Snapshot.applyDiff(old_, d, Seq("k"), Seq("name", "v"))
    assert(applied.as[(Long, String, Double)].collect().toSet ==
      new_.as[(Long, String, Double)].collect().toSet)
    // and the re-diff of the applied snapshot against new is empty
    assert(Snapshot.diff(applied, new_, Seq("k"), Seq("name", "v")).count() == 0L)
  }

  test("empty diff leaves the snapshot untouched") {
    val snap = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val d = Snapshot.diff(snap, snap, Seq("k"), Seq("v"))
    assert(d.count() == 0L)
    assert(Snapshot.applyDiff(snap, d, Seq("k"), Seq("v"))
      .as[(Long, Double)].collect().toSet == Set((1L, 1.0), (2L, 2.0)))
  }
}

class MixSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 100L).map(i =>
    (i, if (i <= 50) "big" else "rare")).toDF("id", "src")

  test("integer weights replicate exactly; zero weight drops the stratum") {
    val out = Corpus.mixSources(docs, "id", "src",
      Map("big" -> 0L, "rare" -> 20000L), defaultBp = 10000L)
    val byStr = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(!byStr.contains("big"))           // weight 0 → dropped entirely
    assert(byStr("rare") == 100L)            // 50 docs × exactly 2 epochs
    assert(out.filter(col("stratum") === "rare").groupBy("doc_id").count()
      .filter(col("count") =!= 2).count() == 0L)
  }

  test("fractional weight emits a deterministic intermediate fraction") {
    val run = () => Corpus.mixSources(docs, "id", "src",
      Map("big" -> 5000L), defaultBp = 10000L)
    val n = run().filter(col("stratum") === "big").count()
    assert(n > 5 && n < 45, s"~50% of 50 docs expected, got $n") // Bernoulli(0.5)
    // deterministic: byte-identical on re-run (task retries at scale)
    assert(run().collect().toSet == run().collect().toSet)
  }

  test("upsampled reps carry distinct repetition indices") {
    val reps = Corpus.mixSources(docs.filter(col("id") === 60), "id", "src",
      Map("rare" -> 30000L), defaultBp = 10000L)
      .select("rep").as[Long].collect().sorted
    assert(reps.sameElements(Array(1L, 2L, 3L)))
  }
}

class KnnPqSpec extends SparkSpec {
  import spark.implicits._

  test("PQ search emits k full-precision-ranked neighbors whose cosines match brute force") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 3)
    val pq = operators.Similarity.knnPq(e, q, "vec_id", "embedding", k = 5)
      .as[(Long, Int, Long, Double, Double)].collect()
    assert(pq.count(_._1 >= 0) == 15, "3 queries x k=5")
    // the rerank is full-precision: every emitted cosine must equal
    // the brute-force cosine of the same (query, neighbor) pair
    val brute = operators.Similarity.knnBrute(e, q, "vec_id", "embedding", k = 500)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    pq.foreach { case (qid, _, cid, cos, _) =>
      assert(brute((qid, cid)) == cos, s"($qid,$cid): $cos vs ${brute((qid, cid))}")
    }
    // per query, rk ordering follows exact cosine descending
    pq.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._4).sameElements(sorted.map(_._4).sortBy(-(_: Double))))
    }
  }

  test("PQ encode is deterministic: identical output across runs") {
    val e = Tables.embeddings(spark, sfDir)
    val run = () => operators.Similarity.knnPq(e, e.filter(col("vec_id") < 2),
      "vec_id", "embedding", k = 5).collect().toSet
    assert(run() == run())
  }
}

class TopoLayersSpec extends SparkSpec {
  import spark.implicits._

  test("layer = longest path ending at the node") {
    // diamond with a tail: 0→{1,2}→3→4, plus shortcut 0→3
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (0L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val layers = GraphOps.topoLayers(e, maxDepth = 8)
      .as[(Long, Long)].collect().toMap
    assert(layers == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("maxDepth bounds the rounds on a cyclic graph (termination guard)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val layers = GraphOps.topoLayers(e, maxDepth = 4)
      .as[(Long, Long)].collect().toMap
    // a cycle has no topological layering; the bound just stops the
    // relaxation — every label is ≤ maxDepth and the call terminates
    assert(layers.size == 3 && layers.values.forall(_ <= 4L))
  }
}

class UpsertPartitionsSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic partition overwrite touches only the changed partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val base = Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 1), (4L, "d", 2))
      .toDF("k", "v", "p")
    graft.sources.Sinks.upsertPartitions(base, dir, Seq("p"))
    def files(p: Int) = {
      val d = new java.io.File(s"$dir/p=$p")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toSet
    }
    val p1Before = files(1); val p2Before = files(2)
    // replace partition 0's contents only
    graft.sources.Sinks.upsertPartitions(
      Seq((1L, "a2", 0), (5L, "e", 0)).toDF("k", "v", "p"), dir, Seq("p"))
    assert(files(1) == p1Before, "untouched partition 1 was rewritten")
    assert(files(2) == p2Before, "untouched partition 2 was rewritten")
    val got = spark.read.parquet(dir).as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a2", 0), (5L, "e", 0), (3L, "c", 1), (4L, "d", 2)))
  }
}

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compact rewrites a fragmented dataset into few files, data intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    (1L to 1000L).toDF("x").repartition(50).write.parquet(dir)
    val (before, after) = graft.sources.Sinks.compact(spark, dir,
      targetFileBytes = 64L * 1024 * 1024)
    assert(before == 50, s"expected 50 input files, saw $before")
    assert(after <= 2, s"expected <=2 compacted files, saw $after")
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq
      == (1L to 1000L).toSeq)
    // no working directories left behind
    val parent = new java.io.File(dir).getParentFile
    assert(parent.listFiles().map(_.getName).toSet == Set("t"))
  }
}

class CorruptRecordIngestionSpec extends SparkSpec {
  import spark.implicits._

  test("malformed JSON rows land in the corrupt-record column, never fail the job") {
    // 100-TB ingestion posture: a handful of bad rows must not kill a
    // million-file load; they must be quarantined and countable.
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$dir/part.json"),
      """{"id": 1, "v": "ok"}
        |{"id": 2 BROKEN
        |{"id": 3, "v": "fine"}
        |""".stripMargin)
    val df = spark.read
      .schema("id LONG, v STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // corrupt-record column can't be queried alone unless materialized
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("_corrupt_record").isNull).select("id")
      .as[Long].collect().toSet == Set(1L, 3L))
    df.unpersist()
  }
}

class ShuffleHashHintSpec extends SparkSpec {

  test("SHUFFLE_HASH hint picks hash join over sort-merge for a mid-size build side") {
    // the 100-TB middle tier: a dimension too big to broadcast still
    // shouldn't pay two sorts — hash-build the smaller side per
    // shuffle partition
    val orders = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val plan = orders.join(cust.hint("SHUFFLE_HASH"),
        orders("o_custkey") === cust("c_custkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), "hint ignored: SMJ planned")
  }
}

class StreamingBackfillSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow + maxFilesPerTrigger drains a backlog in bounded batches, then stops") {
    // the 100-TB bootstrap posture: point the streaming pipeline at a
    // huge existing directory and let it catch up in bounded
    // micro-batches (no unbounded first batch), terminating when the
    // backlog is drained — same code path the live stream then uses.
    val dir = java.nio.file.Files.createTempDirectory("graft_backfill").toString
    val (src, ckpt) = (s"$dir/src", s"$dir/ckpt")
    (0 until 6).foreach { i =>
      Seq((i.toLong, s"doc$i")).toDF("id", "txt").write.mode("append").parquet(src)
    }
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .schema("id LONG, txt STRING")
      .option("maxFilesPerTrigger", 2)
      .parquet(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes += b.count(); ()
      }
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    assert(batchSizes.sum == 6L, s"rows lost/duplicated: $batchSizes")
    assert(batchSizes.length >= 3, s"backlog not bounded into batches: $batchSizes")
    assert(batchSizes.forall(_ <= 2L), s"a batch exceeded the file cap: $batchSizes")
  }
}

class StreamingCmsSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch CMS merge: whole-history estimates from constant state") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    val (store, ckpt) = (s"$dir/store", s"$dir/ckpt")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = graft.streaming.StreamingOps.cmsSink(
        in.toDF().toDF("txt"), "txt", 4, 1024, store)
      .option("checkpointLocation", ckpt).start()
    in.addData("hot hot warm", "hot cold1")
    q.processAllAvailable()
    in.addData("hot warm cold2")
    q.processAllAvailable()
    q.stop()
    val cells = spark.read.parquet(store)
      .as[(Int, Long, Long)].collect()
    // constant state: only touched cells persist, bounded by depth×width
    assert(cells.length <= 4 * 1024)
    // the sketch is LINEAR: each depth row's cells sum to the total
    // token count across ALL batches (8 tokens over 3 documents)
    val byJ = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byJ == Map(0 -> 8L, 1 -> 8L, 2 -> 8L, 3 -> 8L), byJ.toString)
    // point estimates from the merged store (min over depth rows)
    // reproduce the exact whole-history counts at this sketch size
    val (ca, cb) = operators.Dedup.minhashCoeffs(4)
    val P = operators.Dedup.MinhashP
    val cellMap = cells.map(c => (c._1, c._2) -> c._3).toMap
    def estimate(tok: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h0 = java.lang.Long.parseLong(md5.substring(0, 8), 16) % P
      (0 until 4).map(j => cellMap.getOrElse((j, (ca(j) * h0 + cb(j)) % P % 1024), 0L)).min
    }
    assert(estimate("hot") == 4L)
    assert(estimate("warm") == 2L)
    assert(estimate("cold1") == 1L)
    assert(estimate("never-seen") == 0L)
  }
}

class FixpointJobBudgetSpec extends SparkSpec {
  import spark.implicits._

  /** Same public status-tracker measurement as IterateJobBudgetSpec. */
  private def countJobs(body: => Unit): Int = {
    val group = s"fixpoint-budget-${System.nanoTime()}"
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setJobGroup(group, "count jobs")
    try body finally {
      spark.sparkContext.clearJobGroup()
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
    spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
  }

  test("iterateToFixpoint's convergence count rides the checkpoint job") {
    val init = (1L to 8L).toDF("x")
    var rounds = 0
    val fused = countJobs {
      graft.graph.GraphOps.iterateToFixpoint(init, maxRounds = 10) { df =>
        rounds += 1
        df.filter(col("x") > rounds * 2) // shrinks 3 rounds, then stable
      }.count()
    }
    // convergence at rounds 4 (8→6→4→2... wait for equality) — just
    // pin the job budget relative to the round count: one cut job per
    // round + initial cut + the final count(), with NO separate
    // count job per round (the pre-fusion structure cost 2/round)
    assert(fused <= rounds + 2, s"$fused jobs for $rounds rounds")
  }
}

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("nulls, distincts, and ranges per column in one pass") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("c")), (None, Some("a")))
      .toDF("num", "str")
    val p = Profiler.profile(df, Seq("num", "str"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("num") == ("num", 4L, 1L, 2L, "1", "2"))
    assert(p("str") == ("str", 4L, 1L, 2L, "a", "c"))
  }

  test("profile is a single aggregate job (no per-column rescan)") {
    val df = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val plan = Profiler.profile(df, Seq("o_orderkey", "o_custkey", "o_orderstatus"))
      .queryExecution.executedPlan.toString
    // one scan of the input: the three distincts ride one Expand
    assert("(?i)scan parquet".r.findAllIn(plan).size == 1, plan)
  }
}
