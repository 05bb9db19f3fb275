package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.graph.GraphOps
import graft.operators.{Dedup, Similarity}
import graft.sources.SequenceSources

/** Round-2 additions: assembly-pipeline completion, dedup scale
  * guards, the shared iteration primitive's job budget, and
  * scale-safety of sources/checkpointing.
  */
class OverlapConstructionSpec extends SparkSpec {
  import spark.implicits._

  test("overlap edges: suffix/prefix match with max overlap kept") {
    val reads = Seq((1L, "XABCD"), (2L, "ABCDY"), (3L, "ZZZZZ")).toDF("id", "seq")
    val e = GraphOps.overlapEdges(reads, "id", "seq", minOverlap = 3, maxOverlap = 5)
      .as[(Long, Long, Int)].collect().toSet
    // suffix(1, 4) = "ABCD" = prefix(2, 4); no len-3 or len-5 match adds pairs
    assert(e == Set((1L, 2L, 4)))
  }

  test("overlap edges are directional and exclude self-pairs") {
    val reads = Seq((1L, "AAAATTTT"), (2L, "TTTTGGGG")).toDF("id", "seq")
    val e = GraphOps.overlapEdges(reads, "id", "seq", 4, 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(e == Set((1L, 2L, 4))) // GGGG suffix of 2 matches no prefix
  }
}

class ReductionPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")

  test("tip clip prunes a dead-end path to the depth bound") {
    // trunk 1→2→3→4→5→1 (cycle, never clipped) + tip 3→10→11→12
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L),
      (3L, 10L), (10L, 11L), (11L, 12L))
    val kept = GraphOps.tipClip(e, maxDepth = 5).as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L)))
    // a shallow bound keeps the upper part of the tip
    val kept1 = GraphOps.tipClip(e, maxDepth = 1).as[(Long, Long)].collect().toSet
    assert(kept1.contains(3L -> 10L) && !kept1.contains(11L -> 12L))
  }

  test("bubble removal drops the non-minimal arm, keeps the survivor") {
    val e = edges((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val kept = GraphOps.bubbleRemoval(e).as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L), (2L, 4L), (4L, 5L)))
  }

  test("unitig sequences concatenate members in chain order") {
    val e = edges((1L, 2L), (2L, 3L), (10L, 11L))
    val seqs = Seq((1L, "AAAB"), (2L, "ABCC"), (3L, "CCDD"),
      (10L, "GG"), (11L, "GT")).toDF("node", "seq")
    val out = GraphOps.unitigSequences(e, seqs)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((3L, "AAABABCCCCDD")))
    assert(out(10L) == ((2L, "GGGT")))
  }

  test("unitig sequences drop the overlap prefix of non-head members") {
    val e = edges((1L, 2L), (2L, 3L))
    val seqs = Seq((1L, "AAAB"), (2L, "ABCC"), (3L, "CCDD")).toDF("node", "seq")
    val out = GraphOps.unitigSequences(e, seqs, overlap = 2)
      .as[(Long, Long, String)].collect()
    assert(out.toSeq == Seq((1L, 3L, "AAABCCDD")))
  }

  test("reduce pipeline composes TR, tip clip, and bubble removal") {
    // skip edge 1→3 is transitively redundant; tips 4→10 and the
    // 7→8→9 tail die within depth 2; diamond 4→{5,6}→7 keeps arm 5
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 10L),
      (4L, 5L), (4L, 6L), (5L, 7L), (6L, 7L), (7L, 8L), (8L, 9L))
    val reduced = GraphOps.reducePipeline(e, tipDepth = 2)
      .as[(Long, Long)].collect().toSet
    assert(reduced == Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 7L)))
    val u = GraphOps.unitigs(GraphOps.reducePipeline(e, tipDepth = 2))
      .as[(Long, Long)].collect().toMap
    assert(u == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 7L -> 1L))
  }

  test("kcore peeling keeps the cycle, drops the tail") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val core = GraphOps.kcore(e, k = 2, maxRounds = 3)
      .as[(Long, Long)].collect().toSet
    assert(core == Set((1L, 2L), (2L, 3L), (3L, 1L)))
  }

  test("exact integer pagerank is symmetric on a cycle and reproducible") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 1L))
    val r1 = GraphOps.pagerankExact(e, iters = 5).as[(Long, Long)].collect().toMap
    assert(r1.values.toSet.size == 1, s"cycle ranks must be equal: $r1")
    assert(r1.values.sum <= 1000000000000L) // integer div only loses mass
    val r2 = GraphOps.pagerankExact(e, iters = 5).as[(Long, Long)].collect().toMap
    assert(r1 == r2)
  }
}

class DedupScaleSpec extends SparkSpec {
  import spark.implicits._

  test("capBuckets truncates hot buckets deterministically") {
    val rows = (1 to 100).map(i => ("hot", i.toLong)) :+ ("cold", 999L)
    val df = rows.toDF("bucket", "id")
    val capped = Dedup.capBuckets(df, Seq("bucket"), "id", maxBucket = 8)
    val byBucket = capped.groupBy("bucket").count().as[(String, Long)].collect().toMap
    assert(byBucket == Map("hot" -> 8L, "cold" -> 1L))
    // deterministic: smallest ids survive
    val ids = capped.filter($"bucket" === "hot").select("id").as[Long].collect().toSet
    assert(ids == (1 to 8).map(_.toLong).toSet)
  }

  test("minhash LSH survives a pathological near-identical corpus with a tiny cap") {
    // every doc shares 20 tokens and adds one unique -- all 60 sets
    // collide in (almost) every band: the degenerate-bucket case
    val common = (1 to 20).map(t => s"tok$t").mkString(" ")
    val docs = (1 to 60).map(i => (i.toLong, s"$common unique$i")).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 16, bands = 4, threshold = 0.85, maxBucket = 8)
      .as[(Long, Long, Double)].collect()
    // emitted pairs are verified true near-dups (Jaccard 20/22 ~ 0.909)
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._3 >= 0.85))
    assert(pairs.forall(p => p._1 < p._2))
    // and the cap bounds candidate volume: far fewer than the 1770
    // uncapped pairs ever get generated, let alone verified
    assert(pairs.length < 600, s"cap did not bound candidates: ${pairs.length}")
  }

  test("simhash banding with a cap still pairs identical sets") {
    val docs = ((1 to 40).map(i => (i.toLong, "the same exact text")) :+
      (99L, "totally different words here")).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3, maxBucket = 4)
      .select("a", "b", "hamming").as[(Long, Long, Long)].collect()
    // identical sets collapse via signature dedup BEFORE banding, so
    // the cap cannot lose them: all C(40,2) clone pairs survive
    assert(pairs.count(_._3 == 0L) == 40 * 39 / 2)
    assert(pairs.forall(p => p._1 != 99L && p._2 != 99L))
  }

  test("d2 prefix-filter path equals the bitmask all-pairs path") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma zeta"), (4L, "omega psi chi phi"),
      (5L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    def run(maxMaskSets: Long) =
      Dedup.ngramJaccardPairsExact(docs, "doc_id", "text", threshold = 0.6, maxMaskSets)
        .as[(Long, Long, Double)].collect().toSet
    // maxMaskSets = 0 forces the prefix-filter candidate path even
    // though the vocabulary fits in 64 bits
    assert(run(0) == run(8192))
  }

  test("exact cluster table maps every member to its min-id survivor") {
    val docs = Seq((5L, "x"), (2L, "x"), (9L, "x"), (7L, "y"), (1L, "z"))
      .toDF("doc_id", "text")
    val cl = Dedup.exactClusters(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(cl == Set((2L, 2L), (2L, 5L), (2L, 9L), (7L, 7L), (1L, 1L)))
  }

  test("LSH knn caps corpus buckets without losing the dominant neighbor") {
    val base = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    def jitter(seed: Int) = base.zipWithIndex.map { case (v, i) =>
      v + 0.001f * ((seed * 31 + i) % 7 - 3) }
    val corpus = (1 to 30).map(i => (i.toLong, jitter(i))).toDF("vec_id", "embedding")
    val queries = Seq((1000L, jitter(500))).toDF("vec_id", "embedding")
    val out = Similarity.knnLsh(corpus, queries, "vec_id", "embedding",
        k = 3, maxBucket = 5)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.length <= 3 && out.nonEmpty)
    assert(out.forall(_._4 > 0.99)) // all jitters of one base vector
  }
}

class IterateJobBudgetSpec extends SparkSpec {
  import spark.implicits._

  /** Count Spark ACTIONS issued while `body` runs, via job groups
    * (public status-tracker API — no private listener-bus access).
    * AQE is disabled for the measurement: with AQE on, every shuffle
    * stage materializes as its own "job", which would count plan
    * internals rather than the per-round action structure under test.
    */
  private def countJobs(body: => Unit): Int = {
    val group = s"job-budget-${System.nanoTime()}"
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setJobGroup(group, "count jobs")
    try body finally {
      spark.sparkContext.clearJobGroup()
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
    spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
  }

  test("iterate costs 2 jobs per round plus 1 for the initial cut") {
    val init = Seq(1L, 2L, 3L).toDF("x")
    var rounds = 0
    val jobs = countJobs {
      GraphOps.iterate(init, maxRounds = 10) { df =>
        rounds += 1
        df.withColumn("__changed", if (rounds < 3) lit(1) else lit(0))
      }.count()
    }
    assert(rounds == 3) // converges when __changed sums to 0
    // init cut + 3 x (round cut + fused convergence scan) + final count
    assert(jobs <= 1 + 2 * rounds + 1, s"job budget blown: $jobs jobs for $rounds rounds")
  }

  test("connected components stays within the per-round job budget") {
    val e = (1L to 32L).sliding(2).map(p => (p.head, p.last)).toSeq.toDF("src", "dst")
    val jobs = countJobs { GraphOps.connectedComponents(e).count() }
    // hash-to-min + pointer jumping: a 32-chain converges in ~10
    // rounds at exactly 2 jobs each (checkpoint + fused convergence
    // scan); budget = symmetrize cut + init cut + 10*2 + final count.
    // A separate convergence join+count job per round (3+/round) would
    // blow straight past this.
    assert(jobs <= 26, s"CC issued $jobs jobs — a separate convergence job is back")
  }
}

class FastqScaleSpec extends SparkSpec {
  import spark.implicits._

  test("FASTQ records that straddle partition boundaries are stitched") {
    val dir = Files.createTempDirectory("fastq").toFile
    val path = new java.io.File(dir, "reads.fastq").getAbsolutePath
    val n = 200
    val content = (1 to n).map { i =>
      s"@read$i\nACGT${"A" * (i % 7)}CGT\n+\nIIII${"J" * (i % 7)}III"
    }.mkString("", "\n", "\n")
    Files.write(Paths.get(path), content.getBytes("UTF-8"))
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "256")
      val df = SequenceSources.readFastq(spark, path)
      assert(df.rdd.getNumPartitions > 4, "file must split into many partitions")
      val rows = df.select("seq_id", "sequence", "quality")
        .as[(String, String, String)].collect()
      assert(rows.length == n)
      val byId = rows.map(r => r._1 -> ((r._2, r._3))).toMap
      (1 to n).foreach { i =>
        val (seq, qual) = byId(s"read$i")
        assert(seq == s"ACGT${"A" * (i % 7)}CGT", s"read$i sequence")
        assert(qual == s"IIII${"J" * (i % 7)}III", s"read$i quality")
      }
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }
}

class CkptPolicySpec extends SparkSpec {
  import spark.implicits._

  test("reliable checkpoint engages when the conf is set") {
    val dir = Files.createTempDirectory("ckpt").toFile.getAbsolutePath
    try {
      spark.conf.set("spark.graft.checkpointDir", dir)
      val out = Ckpt.cut(Seq(1, 2, 3).toDF("x"))
      assert(out.count() == 3)
      def files(p: java.io.File): Int =
        if (p.isDirectory) p.listFiles().map(files).sum else 1
      assert(files(new java.io.File(dir)) > 0, "no checkpoint files written")
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("falls back to localCheckpoint without the conf") {
    val out = Ckpt.cut(Seq(1, 2).toDF("x"))
    assert(out.count() == 2) // and no exception without any checkpoint dir
  }
}
