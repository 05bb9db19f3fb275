package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout
import graft.sources.Sinks

class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private def refInterleave(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum

  test("zorderKey matches the reference bit interleave") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L), (512L, 7L))
    val got = pts.toDF("a", "b")
      .withColumn("z", Layout.zorderKey(col("a"), col("b"), 10))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == refInterleave(a, b, 10), s"interleave($a, $b)")
    }
  }

  test("z-order clustering concentrates a 2-D box query into few files") {
    // 64×64 grid, 4 rows per cell. After z-order clustering into 16
    // files, an 8×8 corner box (a contiguous z-range) touches few
    // files; under a one-dimensional x-sort, the same box's rows
    // spread across every x-slice file that intersects x<8 — but a
    // filter on Y ALONE hits all 16 files, while z-order still prunes.
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val grid = spark.range(0, 64 * 64 * 4)
      .select((col("id") % 64).as("x"), ((col("id") / 64) % 64).cast("long").as("y"),
        col("id").as("payload"))
    Sinks.writeZordered(grid, s"$dir/z", "x", "y", 6, 16)
    Sinks.writeSorted(grid, s"$dir/x", Seq("x"), 16)

    def filesTouched(path: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(cond)
        .select(input_file_name()).distinct().count()

    val box = col("x") < 8 && col("y") < 8
    val zBox = filesTouched(s"$dir/z", box)
    assert(zBox <= 4, s"z-order box query touched $zBox of 16 files")

    // row-group/file stats only help when the data is clustered on the
    // filtered dimension: y-only predicate under x-sort reads rows
    // from every file, under z-order from a minority of files
    val yOnly = col("y") < 8
    val zY = filesTouched(s"$dir/z", yOnly)
    val xY = filesTouched(s"$dir/x", yOnly)
    assert(xY == 16L, s"x-sorted layout must spread y-rows over all files, got $xY")
    assert(zY <= 8, s"z-order must cluster y-rows into a minority of files, got $zY")
  }
}

class OrcRoundTripSpec extends SparkSpec {

  test("ORC write/read round-trips schema and values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val docs = Tables.documents(spark, sfDir).limit(100)
    docs.write.mode("overwrite").orc(s"$dir/docs")
    val back = spark.read.orc(s"$dir/docs")
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("TopKAgg insert/merge keep the (value desc, id asc) total order under any split") {
    val agg = graft.functions.TopKAgg(3)
    val rows = Seq((5.0, 2L), (5.0, 1L), (7.0, 9L), (1.0, 4L), (7.0, 3L), (6.0, 8L))
    val expected = Seq((7.0, 3L), (7.0, 9L), (6.0, 8L))
    // every 2-way split of the rows must merge to the same top-3
    for (mask <- 0 until (1 << rows.size)) {
      val (a, b) = rows.zipWithIndex.partition { case (_, i) => (mask & (1 << i)) != 0 }
      val bufA = a.map(_._1).foldLeft(agg.zero)(agg.reduce)
      val bufB = b.map(_._1).foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bufA, bufB)) == expected, s"mask=$mask")
    }
  }

  test("q39 plan aggregates with map-side partials, not a window sort") {
    val df = graft.SparkEntry.queries("q39_topk_agg")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
    assert(plan.contains("partial_topkagg"), s"expected map-side partial agg:\n$plan")
    assert(!plan.contains("Window"), s"top-k agg must not fall back to a window:\n$plan")
  }
}

class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  test("TopKAgg runs as a streaming aggregate with bounded per-group state") {
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Double, Long)]
    val topk = udaf(graft.functions.TopKAgg(2))
    val agg = in.toDF().toDF("g", "v", "id")
      .groupBy("g").agg(topk(col("v"), col("id")).as("top"))
    val q = agg.writeStream.format("memory").queryName("stk")
      .outputMode("complete").start()
    in.addData(("a", 5.0, 1L), ("a", 7.0, 2L), ("b", 1.0, 3L))
    q.processAllAvailable()
    in.addData(("a", 6.0, 4L), ("b", 9.0, 5L)) // 6.0 evicts 5.0 from a's top-2
    q.processAllAvailable()
    val got = spark.table("stk")
      .select(col("g"), expr("transform(top, x -> x._2)").as("ids"))
      .as[(String, Seq[Long])].collect().toMap
    q.stop()
    assert(got("a") == Seq(2L, 4L), s"got $got")
    assert(got("b") == Seq(5L, 3L), s"got $got")
  }
}

class EmbeddingLshPairsSpec extends SparkSpec {
  import spark.implicits._

  test("LSH pair dedup finds every true near-duplicate cluster member") {
    // 3 clusters of 4 near-identical vectors (tiny deterministic
    // perturbations, cosine ≈ 0.9999) + 20 random vectors: sign
    // projections are stable under small perturbations, so every
    // within-cluster pair must collide in at least one table.
    val rng = new scala.util.Random(7)
    val dims = 64
    def base() = Array.fill(dims)(rng.nextGaussian().toFloat)
    val clusters = (0 until 3).map(_ => base())
    val members = for {
      (c, ci) <- clusters.zipWithIndex
      j <- 0 until 4
    } yield ((ci * 4 + j).toLong, c.map(x => x + 0.001f * (j + 1)))
    val noise = (100 until 120).map(i => (i.toLong, base()))
    val df = (members ++ noise).toDF("vec_id", "embedding")
    val pairs = graft.operators.Similarity
      .embeddingLshPairs(df, "vec_id", "embedding", 0.99)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val expected = (for {
      ci <- 0 until 3; i <- 0 until 4; j <- (i + 1) until 4
    } yield ((ci * 4 + i).toLong, (ci * 4 + j).toLong)).toSet
    assert(pairs == expected,
      s"missed: ${expected -- pairs}; spurious: ${pairs -- expected}")
  }
}

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff emits insert/delete/update with null-safe comparison") {
    val prev = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, None), (4L, Some(40.0)))
      .toDF("k", "v")
    val next = Seq((2L, Some(25.0)), (3L, Some(30.0)), (4L, Some(40.0)), (5L, None))
      .toDF("k", "v")
    val got = graft.operators.Snapshot.diff(prev, next, Seq("k"), Seq("v"))
      .select("k", "action").as[(Long, String)].collect().toMap
    // 1 deleted, 2 value-changed, 3 NULL→30 (null-safe: update),
    // 4 unchanged (absent), 5 inserted with NULL value
    assert(got == Map(1L -> "delete", 2L -> "update", 3L -> "update", 5L -> "insert"))
  }
}

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  test("gapFill generates the per-key grid and forward-fills gaps") {
    // key A observes slots 100 and 103 (t = slot*10): grid 100..103,
    // 101/102 filled from 100; key B a single slot — no gaps.
    val df = Seq((1L, 1000L, 5.0), (1L, 1005L, 2.0), (1L, 1030L, 9.0),
      (2L, 555L, 1.0)).toDF("id", "ts", "value")
    val got = graft.operators.TimeSeries.gapFill(df, "id", "ts", "value", 10)
      .select("key", "slot", "v", "filled")
      .as[(Long, Long, Option[Double], Double)].collect().toSet
    assert(got == Set(
      (1L, 100L, Some(7.0), 7.0), // two observations summed in-slot
      (1L, 101L, None, 7.0),
      (1L, 102L, None, 7.0),
      (1L, 103L, Some(9.0), 9.0),
      (2L, 55L, Some(1.0), 1.0)))
  }
}

class AssemblyStatsSpec extends SparkSpec {
  import spark.implicits._

  test("N50 is the largest length whose desc-cumulative sum covers half the assembly") {
    // lengths 10,9,5,3,3 → total 30; cum desc: 10,19 → N50 = 9
    val contigs = Seq("a" * 10, "b" * 9, "c" * 5, "d" * 3, "e" * 3).toDF("seq")
    val row = graft.graph.GraphOps.assemblyStats(contigs, "seq")
      .as[(Long, Long, Long, Long)].head()
    assert(row == ((5L, 30L, 10L, 9L)))
  }

  test("single-contig assembly: N50 equals the contig length") {
    val row = graft.graph.GraphOps.assemblyStats(Seq("x" * 7).toDF("seq"), "seq")
      .as[(Long, Long, Long, Long)].head()
    assert(row == ((1L, 7L, 7L, 7L)))
  }
}

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("containment flags a short doc quoted in a long one where jaccard misses it") {
    val needle = "alpha beta gamma"
    val hay = needle + " " + (1 to 30).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, needle), (2L, hay)).toDF("id", "txt")
    val cont = graft.operators.Dedup.containmentPairs(df, "id", "txt", 0.99)
      .as[(Long, Long, Double)].collect().toSet
    assert(cont == Set((1L, 2L, 1.0)), s"got $cont") // directed: needle ⊂ hay only
    // symmetric jaccard = 3/33 — invisible to the d2 operator
    assert(graft.operators.Dedup.ngramJaccardPairsExact(df, "id", "txt", 0.5).count() == 0L)
  }

  test("identical docs are mutual containment 1.0, both directions") {
    val df = Seq((1L, "x y z"), (2L, "x y z")).toDF("id", "txt")
    val got = graft.operators.Dedup.containmentPairs(df, "id", "txt", 0.99)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }
}

class QualityTrimSpec extends SparkSpec {
  import spark.implicits._

  test("3' quality trim keeps through the last base meeting the threshold") {
    // phred: 'I' = 40, '#' = 2; minPhred 20 keeps up to the last 'I'
    val df = Seq(
      ("r1", "ACGTACGT", "IIII##I#"), // last good at pos 7
      ("r2", "ACGT", "####"),         // nothing qualifies → empty
      ("r3", "ACGT", "IIII")          // untouched
    ).toDF("seq_id", "sequence", "quality")
    val got = graft.sources.SequenceSources
      .trimLowQuality(df, "sequence", "quality", 20)
      .select("seq_id", "trimmed_seq", "trimmed_qual", "trimmed_length")
      .as[(String, String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("r1") == (("r1", "ACGTACG", "IIII##I", 7L)))
    assert(got("r2") == (("r2", "", "", 0L)))
    assert(got("r3") == (("r3", "ACGT", "IIII", 4L)))
  }
}

class ContainmentPrefixPathSpec extends SparkSpec {
  import spark.implicits._

  test("prefix-filter branch (vocab > 64): directed candidates + token-join verify") {
    // 70-token hay vocabulary → no 64-bit masks → prefix candidates
    // with the token-join verifier. needle ⊂ hay1 only.
    val hay1 = (1 to 70).map(i => s"tk$i").mkString(" ")
    val hay2 = (100 to 160).map(i => s"tk$i").mkString(" ")
    val needle = "tk1 tk2 tk3"
    val df = Seq((1L, needle), (2L, hay1), (3L, hay2)).toDF("id", "txt")
    val got = graft.operators.Dedup.containmentPairs(df, "id", "txt", 0.99)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0)), s"got $got")
  }

  test("prefix-filter branch finds partial containment at sub-1.0 thresholds") {
    val hay = (1 to 70).map(i => s"tk$i").mkString(" ")
    val needle = "tk1 tk2 tk3 zz1"                      // 3 of 4 in hay
    val df = Seq((1L, needle), (2L, hay)).toDF("id", "txt")
    val got = graft.operators.Dedup.containmentPairs(df, "id", "txt", 0.7)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 0.75)), s"got $got")
  }
}

class ContainmentBranchEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("containment: prefix-filter path equals the mask all-pairs path") {
    val rng = new scala.util.Random(11)
    val vocab = (1 to 40).map(i => s"v$i")
    val docs = (1L to 30L).map { id =>
      (id, rng.shuffle(vocab).take(3 + rng.nextInt(12)).mkString(" "))
    }.toDF("id", "txt")
    def run(maxMaskSets: Long) =
      graft.operators.Dedup.containmentPairs(docs, "id", "txt", 0.7, maxMaskSets)
        .as[(Long, Long, Double)].collect().toSet
    // maxMaskSets = 0 forces the directed prefix-filter candidate
    // path (popcount verify either way — the token-join verifier is
    // ContainmentPrefixPathSpec's >64-vocab case); default takes the
    // all-pairs mask path
    val prefix = run(0L)
    val masks = run(8192L)
    assert(prefix == masks, s"branch divergence: ${prefix.diff(masks)} / ${masks.diff(prefix)}")
    assert(masks.nonEmpty, "corpus must produce containment pairs for the test to bite")
  }
}
