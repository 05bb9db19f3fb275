package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, TextAnalysis}

/** Training-corpus preparation operators (Corpus.scala): chunking,
  * packing, incremental dedup, normalized dedup, decontamination,
  * rarity scoring. The sf parquet corpus has no cross-parity clones
  * and no punctuation, so these suites prove the discriminating
  * behavior on synthetic rows; the oracle gate proves engine parity
  * on the real tables.
  */
class ChunkPackSpec extends SparkSpec {
  import spark.implicits._

  test("chunks tile the document: stride w/o overlap reconstructs the text") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("id", "txt")
    val chunks = Corpus.chunk(df, "id", "txt", 4, 4).orderBy("chunk_id")
      .select("chunk_text").as[String].collect()
    assert(chunks.toSeq == Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
    assert(chunks.mkString(" ") == (1 to 10).map(i => s"t$i").mkString(" "))
  }

  test("overlapping chunks: every consecutive pair shares width-stride tokens") {
    val df = Seq((1L, (1 to 12).map(i => s"t$i").mkString(" "))).toDF("id", "txt")
    val rows = Corpus.chunk(df, "id", "txt", 6, 4).orderBy("chunk_id")
      .select("chunk_text", "n_tokens").as[(String, Long)].collect()
    rows.sliding(2).foreach { case Array((a, _), (b, _)) =>
      assert(a.split(" ").drop(4).sameElements(b.split(" ").take(2)),
        s"overlap mismatch between '$a' and '$b'")
    case _ => ()
    }
    // final partial window is kept, truncated
    assert(rows.last == (("t9 t10 t11 t12", 4L)))
  }

  test("empty-token documents yield one empty chunk, not a crash") {
    val df = Seq((1L, "")).toDF("id", "txt")
    val rows = Corpus.chunk(df, "id", "txt", 4, 4).collect()
    assert(rows.length == 1 && rows.head.getString(2) == "" && rows.head.getLong(3) == 0L)
  }

  test("packing assigns bins by concatenated-stream offset per shard") {
    // shard A: docs of 3,4,5 tokens with budget 6 →
    // starts 0,3,7 → bins 0,0,1; offsets 0,3,1
    val df = Seq(
      (1L, "a b c", "A"), (2L, "d e f g", "A"), (3L, "h i j k l", "A"),
      (9L, "x y", "B")).toDF("id", "txt", "src")
    val got = Corpus.pack(df, "id", "txt", "src", 6)
      .orderBy("source", "doc_id")
      .select("source", "doc_id", "bin", "bin_offset")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", 1L, 0L, 0L), ("A", 2L, 0L, 3L), ("A", 3L, 1L, 1L),
      ("B", 9L, 0L, 0L)))
  }

  test("packing never sorts globally: plan has no single-partition exchange") {
    val docs = Tables.documents(spark, sfDir)
    val plan = Corpus.pack(docs, "doc_id", "text", "source", 512)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global window in plan:\n$plan")
  }
}

class IncrementalNormalizedSpec extends SparkSpec {
  import spark.implicits._

  test("incremental dedup drops batch rows whose content the corpus already has") {
    val df = Seq(
      (0L, "the corpus doc"), (2L, "another corpus doc"), // corpus (even)
      (1L, "the corpus doc"),                             // dup of 0 → dropped
      (3L, "a genuinely new doc"),                        // survives
      (5L, "another corpus doc")                          // dup of 2 → dropped
    ).toDF("id", "txt")
    val got = Corpus.incrementalSurvivors(df, "id", "txt", col("id") % 2 === 1)
      .as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("incremental dedup does not dedup the batch against itself") {
    // two identical NEW rows, nothing in the corpus: both survive
    // (within-batch dedup is d1/d6's job; this operator is the
    // batch-vs-corpus membership filter)
    val df = Seq((1L, "same"), (3L, "same")).toDF("id", "txt")
    val got = Corpus.incrementalSurvivors(df, "id", "txt", col("id") % 2 === 1)
      .as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("normalized clusters fold case, punctuation, and whitespace variants") {
    val df = Seq(
      (10L, "Hello, World!"), (11L, "hello   world"), (12L, "HELLO WORLD."),
      (20L, "something else")).toDF("id", "txt")
    val got = Corpus.normalizedClusters(df, "id", "txt")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 10L), (10L, 11L), (10L, 12L), (20L, 20L)))
  }
}

class DecontaminateRaritySpec extends SparkSpec {
  import spark.implicits._

  test("decontamination flags train docs sharing an n-gram, counts distinct overlaps") {
    val df = Seq(
      (0L, "alpha beta gamma delta"),            // test doc (id%2==0 below)
      (1L, "x alpha beta gamma y"),              // shares 2 distinct trigrams? no — 1
      (3L, "alpha beta gamma delta epsilon"),    // shares 2 trigrams
      (5L, "nothing in common here")).toDF("id", "txt")
    val got = Corpus.decontaminate(df, "id", "txt", col("id") % 2 === 0, 3)
      .as[(Long, Long)].collect().toMap
    // test trigrams: "alpha beta gamma", "beta gamma delta"
    assert(got == Map(1L -> 1L, 3L -> 2L))
  }

  test("decontamination ignores docs shorter than the n-gram order") {
    val df = Seq((0L, "a b"), (1L, "a b")).toDF("id", "txt")
    assert(Corpus.decontaminate(df, "id", "txt", col("id") % 2 === 0, 3).count() == 0L)
  }

  test("rarity: a rare-token doc outscores a common-token doc of equal length") {
    val common = Seq.fill(5)("the").mkString(" ")
    val df = Seq(
      (1L, common), (2L, common), (3L, common),
      (4L, "zyx wvu tsr qpo nml")).toDF("id", "txt")
    val got = Corpus.rarityScores(df, "id", "txt").as[(Long, Long)].collect().toMap
    // "the" is rank 1 (15 instances) → docs 1-3 score 5 each; the five
    // singleton tokens rank 2..6 → doc 4 scores 2+3+4+5+6 = 20
    assert(got(1L) == 5L && got(4L) == 20L)
    assert(got(4L) > got(1L))
  }
}

class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  test("CMS estimates dominate true counts and rank the true heavy hitter first") {
    // skewed synthetic stream: "hot" 50×, "warm" 10×, 40 singletons
    val words = Seq.fill(50)("hot") ++ Seq.fill(10)("warm") ++
      (1 to 40).map(i => s"cold$i")
    val df = Seq(words.mkString(" ")).toDF("txt")
    val est = TextAnalysis.cmsHeavyHitters(df, "txt", 4, 1024, 100)
      .as[(String, Long)].collect()
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    est.foreach { case (tok, e) =>
      assert(e >= exact(tok), s"CMS must never underestimate: $tok $e < ${exact(tok)}")
    }
    assert(est.head == (("hot", 50L)))
    // 51 distinct tokens into 4×1024 cells: collisions possible but
    // the min-over-depth must keep every estimate within the sketch
    // guarantee ε·N = N/width ≈ 0.1 — i.e. exact here
    est.foreach { case (tok, e) => assert(e == exact(tok), s"$tok inflated: $e") }
  }
}

class StreamingIncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch dedup-against-all-history drops cross-batch and in-batch clones") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incdedup").toString
    val (store, out, ckpt) = (s"$dir/store", s"$dir/out", s"$dir/ckpt")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.incrementalDedupSink(
        in.toDF().toDF("id", "txt"), "id", "txt", store, out)
      .option("checkpointLocation", ckpt).start()
    in.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha")) // 3 clones 1 in-batch
    q.processAllAvailable()
    in.addData((4L, "beta"), (5L, "gamma"), (6L, "alpha")) // 4,6 seen in batch 1
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "alpha"), (2L, "beta"), (5L, "gamma")),
      s"survivors wrong: $got")
    // the store carries exactly one digest row per distinct content
    assert(spark.read.parquet(store).distinct().count() == 3L)
  }
}

class TokenizePackSpec extends SparkSpec {
  import spark.implicits._

  test("tokenize-pack: frequency-ranked ids in position order, stream-packed bins") {
    // freq: a×4 → id 1; b, c ×1 each → ids 2, 3 (count desc, token asc)
    val df = Seq((1L, "b a c a", "S"), (2L, "a a", "S")).toDF("id", "txt", "src")
    val got = Corpus.tokenizePack(df, "id", "txt", "src", 3).orderBy("doc_id")
      .select("doc_id", "bin", "bin_offset", "n_tokens", "ids_csv")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got(0) == ((1L, 0L, 0L, 4L, "2,1,3,1")))
    // doc 2 starts at token offset 4 of the shard stream: bin 1, offset 1
    assert(got(1) == ((2L, 1L, 1L, 2L, "1,1")))
  }
}
