package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Round-3 additions: double-strand overlap construction and the
  * in-operator hot-anchor guard for degenerate (low-complexity) read
  * sets.
  */
class OverlapRCSpec extends SparkSpec {
  import spark.implicits._

  test("RC overlaps: a read overlapping another's reverse complement is found") {
    // rc(r2) = rc("AACCGGTT") = "AACCGGTT" is NOT what we want; build
    // explicitly: r1 ends with "CCGG"; rc(r2) starts with "CCGG" means
    // r2 ends with rc("CCGG") = "CCGG". Use asymmetric strings:
    // r1 = "AAAATTCCGG" (suffix CCGG), r2 with rc(r2) = "CCGGAAAA..."
    // → r2 = rc("CCGGAAAATT") = "AATTTTCCGG".
    val reads = Seq((2L, "AAAATTCCGG"), (4L, "AATTTTCCGG")).toDF("id", "seq")
    val e = GraphOps.overlapEdgesRC(reads, "id", "seq", 4, 4)
      .as[(Long, String, Long, String, Int)].collect().toSet
    // forward suffix of 2 is "CCGG"; '-' orientation of 4 is
    // rc("AATTTTCCGG") = "CCGGAAAATT", whose prefix is "CCGG" → edge
    // (2,+) → (4,-); and the mirror representation (4,+) → (2,-):
    // suffix of 4 is "CCGG", rc(2) = "CCGGAATTTT" starts with "CCGG".
    assert(e.contains((2L, "+", 4L, "-", 4)))
    assert(e.contains((4L, "+", 2L, "-", 4)))
    // no forward-forward edge: prefix of 4 is "AATT" ≠ "CCGG"
    assert(!e.contains((2L, "+", 4L, "+", 4)))
  }

  test("RC overlaps exclude self-pairs in every orientation combination") {
    // palindromic-ish read: rc("ACGT") = "ACGT" — still no self edges
    val reads = Seq((1L, "ACGTACGT")).toDF("id", "seq")
    assert(GraphOps.overlapEdgesRC(reads, "id", "seq", 4, 4).count() == 0L)
  }

  test("strand-flipped sliding windows reconnect across strands") {
    // windows of one 65-char string, stride 25, width 40 → w0, w1
    // overlap by 15; store w1 as its reverse complement (odd id).
    val text = "ACGTTGCAACGGTTCCAAGGTTTTCCCCGGGGAAAATTTTCCGGTTAACCGGTTAAGGCCTTAAG"
    val w0 = text.substring(0, 40)
    val w1 = text.substring(25, 65)
    def rc(s: String) = s.reverse.map {
      case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A'; case c => c
    }
    val reads = Seq((0L, w0), (1L, rc(w1))).toDF("id", "seq")
    val e = GraphOps.overlapEdgesRC(reads, "id", "seq", 13, 17)
      .as[(Long, String, Long, String, Int)].collect().toSet
    assert(e.contains((0L, "+", 1L, "-", 15))) // w0 suffix meets rc-strand w1 prefix
    assert(e.contains((1L, "+", 0L, "-", 15))) // the mirror representation
  }
}

class VecDotNullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def hof(a: String, b: String) =
    s"aggregate(zip_with($a, $b, (x, y) -> double(x) * double(y)), 0D, (s, x) -> s + x)"

  test("vec_dot matches the HOF idiom on ragged and null-containing arrays") {
    graft.SparkEntry.queries // force nothing; ensure registration below
    org.apache.spark.sql.graftbridge.GraftFunctions.install(spark)
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)), // equal lengths
      (Array(1f, 2f), Array(4f, 5f, 6f)),     // ragged → NULL
      (Array[Float](), Array[Float]())        // empty → 0.0
    ).toDF("a", "b")
    val rows = df.selectExpr(s"vec_dot(a, b) AS nat", s"${hof("a", "b")} AS hof")
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null disagreement: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), s"value disagreement: $r")
    }
    assert(rows(1).isNullAt(0), "ragged arrays must yield NULL")
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("vec_dot yields NULL on null elements, matching the HOF idiom") {
    val df = spark.sql(
      "SELECT CAST(array(1.0, NULL, 3.0) AS array<float>) AS a, " +
        "CAST(array(4.0, 5.0, 6.0) AS array<float>) AS b")
    val r = df.selectExpr("vec_dot(a, b) AS nat", s"${hof("a", "b")} AS hof").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}

class ExactDedupCollisionSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup groups by true content equality, not digest alone") {
    // No feasible xxhash64 collision to test directly; assert the
    // grouping CONTRACT instead: distinct contents never merge, equal
    // contents always do, and counts are exact.
    val docs = Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta"), (4L, "gamma"),
      (5L, "beta")).toDF("id", "content")
    val groups = graft.operators.Dedup.exact(docs, "id", "content")
      .as[(Long, Long)].collect().toSet
    assert(groups == Set((1L, 2L), (3L, 2L), (4L, 1L)))
    val clusters = graft.operators.Dedup.exactClusters(docs, "id", "content")
      .as[(Long, Long)].collect().toSet
    assert(clusters == Set((1L, 1L), (1L, 2L), (3L, 3L), (3L, 5L), (4L, 4L)))
  }
}

class CheckpointReleaseSpec extends SparkSpec {
  import spark.implicits._

  test("release deletes reliable checkpoint files; iterate holds ≤2 rounds of state") {
    import org.apache.spark.sql.graftbridge.CheckpointStats
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-release").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val cut = Ckpt.cut(Seq(1, 2, 3).toDF("x"))
      val file = CheckpointStats.checkpointFileOf(cut)
      assert(file.isDefined, "reliable path must be engaged")
      def exists(f: String) =
        new java.io.File(new java.net.URI(f).getPath).exists()
      assert(exists(file.get), "reliable checkpoint must write files")
      assert(cut.count() == 3L)
      Ckpt.release(cut)
      assert(!exists(file.get), "release must delete the checkpoint files")

      // an iterate() loop (5 shrinking rounds) releases every round
      // but the last: at most 2 rdd-* dirs may remain under the
      // session's checkpoint root (final round + the convergence
      // round's frame).
      val init = Seq((1L, 5L)).toDF("node", "steps")
      val out = graft.graph.GraphOps.iterate(init, maxRounds = 10) { cur =>
        cur.select(col("node"), (col("steps") - 1).as("steps"),
          (col("steps") > 1).cast("int").as("__changed"))
      }
      assert(out.as[(Long, Long)].head() == ((1L, 0L)))
      val uuidRoot = new java.io.File(new java.net.URI(file.get).getPath).getParentFile
      val rddDirs = Option(uuidRoot.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("rdd-"))
      assert(rddDirs.length <= 2,
        s"iterate must release prior rounds, found ${rddDirs.length} checkpoint dirs")
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
    }
  }
}

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join with zero exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    // saveAsTable writes under the session warehouse; use unique names
    val (ta, tb) = ("graft_bucket_a", "graft_bucket_b")
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.sources.Sinks.writeBucketed(
        spark.range(0, 10000).select(col("id").as("k"), (col("id") * 2).as("va")),
        ta, Seq("k"), buckets = 8)
      graft.sources.Sinks.writeBucketed(
        spark.range(0, 10000).select(col("id").as("k"), (col("id") * 3).as("vb")),
        tb, Seq("k"), buckets = 8)
      val joined = spark.table(ta).join(spark.table(tb), Seq("k"))
      assert(joined.count() == 10000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan:\n${plan.take(2500)}")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ta")
      spark.sql(s"DROP TABLE IF EXISTS $tb")
      saved match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}

class StreamingSinkDurabilitySpec extends SparkSpec {
  import spark.implicits._

  test("file sink + checkpoint: restart resumes exactly-once (no dupes, no gaps)") {
    val base = java.nio.file.Files.createTempDirectory("graft-stream-durable")
    val (in, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    new java.io.File(in).mkdirs()
    val schema = "id LONG, v LONG"

    def writeInput(name: String, ids: Range): Unit = {
      val tmp = s"$base/tmp-$name"
      ids.map(i => (i.toLong, i.toLong * 2)).toDF("id", "v")
        .coalesce(1).write.mode("overwrite").json(tmp)
      // atomically move the part file in, as a file-source producer would
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".json")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$in/$name.json"))
    }

    def runOnePass(): Unit = {
      val q = spark.readStream.schema(schema).json(in)
        .select(col("id"), (col("v") * 10).as("v10"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      q.stop()
    }

    writeInput("a", 0 until 50)
    runOnePass() // processes A, commits offsets + sink metadata, stops

    writeInput("b", 50 until 100)
    runOnePass() // a NEW query on the same checkpoint must resume after A

    val got = spark.read.parquet(out).select("id", "v10")
      .as[(Long, Long)].collect().sorted
    assert(got.length == 100, s"expected exactly 100 rows, got ${got.length}")
    assert(got.map(_._1).toSeq == (0L until 100L),
      "restart must neither duplicate nor drop rows")
    assert(got.forall { case (id, v10) => v10 == id * 20 })
  }
}

class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("un-salted fact-fact join splits a skewed partition under AQE") {
    // one hot key (0) carrying ~100k rows on the probe side; thresholds
    // lowered so the local-mode data qualifies as skewed.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact1 = spark.range(0, 120000)
        .select(when(col("id") % 6 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          concat(lit("payload-"), col("id")).as("p1"))
      val fact2 = spark.range(0, 50000)
        .select((col("id") % 20000).as("k"), concat(lit("x-"), col("id")).as("p2"))
      val joined = fact1.join(fact2, Seq("k"))
      // collect() executes THIS dataset's own query execution (count()
      // or a write would build a different one and leave joined's
      // adaptive plan unexecuted / non-final)
      assert(joined.collect().length > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must split the skewed partition; final plan:\n${finalPlan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

class HotAnchorCapSpec extends SparkSpec {
  import spark.implicits._

  test("low-complexity read set: anchor cap bounds candidate pairs") {
    // 200 identical poly-A reads — every anchor identical; uncapped
    // this is 200×199 pairs. Cap 10 keeps ≤10 rows per anchor bucket
    // per side, so the output is bounded by cap², independent of n.
    val reads = (1L to 200L).map(i => (i, "A" * 40)).toDF("id", "seq")
    val capped = GraphOps.overlapEdges(reads, "id", "seq", 13, 17, anchorCap = 10)
      .count()
    assert(capped > 0L, "cap must not destroy all candidates")
    assert(capped <= 100L, s"anchor cap must bound pairs, got $capped")
  }

  test("anchor cap never binds on diverse reads (same output as uncapped)") {
    // stride-25 windows of a seeded random ACGT string: consecutive
    // windows genuinely overlap by 15, and random 13-mer anchors never
    // collide across windows, so a small cap must not change anything.
    val rng = new scala.util.Random(42)
    val genome = Array.fill(540)("ACGT"(rng.nextInt(4))).mkString
    val reads = (0 to 20).map(i => (i.toLong, genome.substring(i * 25, i * 25 + 40)))
      .toDF("id", "seq")
    val capped = GraphOps.overlapEdges(reads, "id", "seq", 13, 17, anchorCap = 5)
      .as[(Long, Long, Int)].collect().toSet
    val uncapped = GraphOps.overlapEdges(reads, "id", "seq", 13, 17, anchorCap = 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(capped == uncapped)
    assert(uncapped.size >= 20, "consecutive windows must overlap")
  }
}

class RuntimeBloomFilterSpec extends SparkSpec {

  test("selective dim filter injects a runtime bloom filter into the fact scan side") {
    // The 100-TB posture for un-broadcastable semijoin shapes: Spark's
    // InjectRuntimeFilter builds a bloom filter from the filtered
    // creation side and pushes might_contain onto the probe side, so
    // the big scan discards non-matching rows BEFORE the shuffle.
    // Thresholds lowered so local-mode parquet qualifies.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = Tables.orders(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val lineitem = Tables.lineitem(spark, sfDir)
      val joined = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"runtime bloom filter must be injected; optimized plan:\n${optimized.take(3000)}")
      assert(joined.count() > 0L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
