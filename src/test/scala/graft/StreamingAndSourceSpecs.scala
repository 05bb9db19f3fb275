package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps
import graft.sources.SequenceSources

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "key", "value")
    val agg = StreamingOps.windowedCounts(df, "ts", "key", "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    in.addData((t(1), "a", 1.0), (t(2), "a", 2.0), (t(11), "a", 4.0), (t(3), "b", 8.0))
    q.processAllAvailable()
    val rows = spark.table("wc")
      .select("key", "cnt", "sum_value").as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set(("a", 2L, 3.0), ("a", 1L, 4.0), ("b", 1L, 8.0)))
  }

  test("stateful sessionization emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingOps.Ev]
    val sess = StreamingOps.sessionize(in.toDS(), gapSeconds = 100)
    val q = sess.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    in.addData(StreamingOps.Ev(1L, 10L, 1.0), StreamingOps.Ev(1L, 50L, 2.0))
    q.processAllAvailable()
    in.addData(StreamingOps.Ev(1L, 500L, 4.0)) // gap > 100 closes first session
    q.processAllAvailable()
    val rows = spark.table("sess")
      .select("user_id", "start", "end", "n_events", "sum_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set((1L, 10L, 50L, 2L, 3.0)))
  }

  test("stream-static enrich joins each batch against the dimension") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val stream = in.toDF().toDF("nid", "value")
    val dim = Seq((1L, "alpha"), (2L, "beta")).toDF("nid", "name")
    val q = StreamingOps.enrich(stream, dim, Seq("nid"))
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    in.addData((1L, 10.0), (2L, 20.0), (3L, 30.0)) // 3 has no dim row
    q.processAllAvailable()
    val rows = spark.table("enr").select("nid", "value", "name")
      .as[(Long, Double, String)].collect().toSet
    q.stop()
    assert(rows == Set((1L, 10.0, "alpha"), (2L, 20.0, "beta")))
  }

  test("stream-stream interval join pairs events within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    val imp = MemoryStream[(java.sql.Timestamp, Long)]
    val clk = MemoryStream[(java.sql.Timestamp, Long)]
    val impressions = imp.toDF().toDF("imp_ts", "imp_ad")
    val clicks = clk.toDF().toDF("clk_ts", "clk_ad")
    val joined = StreamingOps.joinStreams(
      impressions, "imp_ts", "10 minutes",
      clicks, "clk_ts", "10 minutes",
      expr("imp_ad = clk_ad AND clk_ts BETWEEN imp_ts AND imp_ts + INTERVAL 5 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    imp.addData((t(1), 7L), (t(1), 8L))
    clk.addData((t(3), 7L), (t(9), 8L)) // 8's click arrives past the 5-min bound
    q.processAllAvailable()
    val rows = spark.table("ssj").select("imp_ad").as[Long].collect().toSeq
    q.stop()
    assert(rows == Seq(7L))
  }

  test("streaming dedup suppresses duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val df = in.toDF().toDF("ts", "id")
    val q = StreamingOps.dedup(df, "ts", "10 minutes", Seq("id"))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    in.addData((ts, 1L), (ts, 1L), (ts, 2L))
    q.processAllAvailable()
    val n = spark.table("dd").count()
    q.stop()
    assert(n == 2)
  }
}

class SequenceSourceSpec extends SparkSpec {
  import spark.implicits._

  test("fasta reader handles wrapped sequences and descriptions") {
    val fa = Files.createTempFile("graft", ".fa")
    Files.writeString(fa,
      """>seq1 first sequence
        |ACGT
        |ACGT
        |>seq2
        |GGGGCCCC
        |""".stripMargin)
    val df = SequenceSources.readFasta(spark, fa.toString)
    val rows = df.select("seq_id", "description", "sequence", "length")
      .as[(String, String, String, Long)].collect().sortBy(_._1)
    assert(rows(0) == (("seq1", "first sequence", "ACGTACGT", 8L)))
    assert(rows(1) == (("seq2", "", "GGGGCCCC", 8L)))
  }

  test("fastq reader groups 4-line records") {
    val fq = Files.createTempFile("graft", ".fq")
    Files.writeString(fq,
      """@r1
        |ACGTACGT
        |+
        |FFFFFFFF
        |@r2
        |TTTT
        |+
        |!!!!
        |""".stripMargin)
    val rows = SequenceSources.readFastq(spark, fq.toString)
      .select("seq_id", "sequence", "quality", "length")
      .as[(String, String, String, Long)].collect().sortBy(_._1)
    assert(rows(0) == (("r1", "ACGTACGT", "FFFFFFFF", 8L)))
    assert(rows(1) == (("r2", "TTTT", "!!!!", 4L)))
  }

  test("reverse complement and gc content columns") {
    val df = Seq("ACGT", "GGCC").toDF("seq")
      .select(SequenceSources.reverseComplement(col("seq")).as("rc"),
        SequenceSources.gcContent(col("seq")).as("gc"))
      .as[(String, Double)].collect()
    assert(df(0) == (("ACGT", 0.5)))
    assert(df(1) == (("GGCC", 1.0)))
  }

  test("partitioned parquet sink prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val docs = Tables.documents(spark, sfDir)
    graft.sources.Sinks.writePartitioned(docs, s"$dir/bylang", Seq("lang"))
    val langs = new java.io.File(s"$dir/bylang").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(langs.forall(_.startsWith("lang=")), s"hive layout expected: $langs")
    assert(langs.size > 1)
    val back = spark.read.parquet(s"$dir/bylang").filter(col("lang") === "en")
    assert(back.count() == docs.filter(col("lang") === "en").count())
    // the lang filter must resolve to partition pruning, not a data filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(2000))
    assert(plan.contains("lang"), plan.take(2000))
  }

  test("sorted parquet sink clusters rows for row-group skipping") {
    val dir = Files.createTempDirectory("graft-sink2").toString
    val docs = Tables.documents(spark, sfDir)
    graft.sources.Sinks.writeSorted(docs, s"$dir/sorted", Seq("doc_id"), numFiles = 3)
    val back = spark.read.parquet(s"$dir/sorted")
    assert(back.count() == docs.count())
    // range-partitioned + sorted: every file holds a disjoint doc_id range
    import org.apache.spark.sql.functions.{min => fmin, max => fmax, input_file_name}
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(fmin("doc_id").as("lo"), fmax("doc_id").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(ranges.sliding(2).forall {
      case Array(a, b) => a._3 <= b._2
      case _ => true
    }, s"overlapping file ranges: ${ranges.map(r => (r._2, r._3)).toSeq}")
  }

  test("csv and json round-trip through graft writers") {
    val dir = Files.createTempDirectory("graft-io").toString
    val df = Tables.nation(spark, sfDir)
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    df.write.mode("overwrite").json(s"$dir/json")
    val c = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$dir/csv")
    val j = spark.read.json(s"$dir/json")
    assert(c.count() == df.count() && j.count() == df.count())
    assert(j.select("n_name").as[String].collect().toSet ==
      df.select("n_name").as[String].collect().toSet)
  }
}

class StreamingDepthSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("native session_window merges and closes gap sessions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "key", "value")
    val q = StreamingOps.sessionWindowAgg(df, "ts", "key", "5 minutes", "2 minutes")
      .writeStream.format("memory").queryName("sw").outputMode("append").start()
    in.addData((t(1), "a", 1.0), (t(3), "a", 2.0), (t(2), "b", 8.0))
    q.processAllAvailable()
    // advance the watermark far past the open sessions to close them
    in.addData((t(40), "z", 0.0))
    q.processAllAvailable()
    val rows = spark.table("sw").select("key", "n_events", "sum_value")
      .as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set(("a", 2L, 3.0), ("b", 1L, 8.0)))
  }

  test("sliding windows land each event in len/slide windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "key", "value")
    val q = StreamingOps.slidingCounts(df, "ts", "key", "10 minutes", "5 minutes", "5 minutes")
      .writeStream.format("memory").queryName("sl").outputMode("complete").start()
    in.addData((t(7), "a", 1.0))
    q.processAllAvailable()
    val rows = spark.table("sl").select("wstart", "cnt")
      .as[(java.sql.Timestamp, Long)].collect().toSet
    q.stop()
    // 00:07 falls in [00:00,00:10) and [00:05,00:15)
    assert(rows == Set((t(0), 1L), (t(5), 1L)))
  }

  test("dropDuplicatesWithinWatermark suppresses clones with different timestamps") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val df = in.toDF().toDF("ts", "id")
    val q = StreamingOps.dedupWithinWatermark(df, "ts", "10 minutes", Seq("id"))
      .writeStream.format("memory").queryName("ddw").outputMode("append").start()
    in.addData((t(1), 1L), (t(3), 1L), (t(2), 2L)) // same id, DIFFERENT ts
    q.processAllAvailable()
    val n = spark.table("ddw").count()
    q.stop()
    assert(n == 2) // keyed dedup on id+ts would have emitted 3
  }

  test("left-outer interval join emits unmatched rows with nulls after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val imp = MemoryStream[(java.sql.Timestamp, Long)]
    val clk = MemoryStream[(java.sql.Timestamp, Long)]
    val joined = StreamingOps.joinStreamsOuter(
      imp.toDF().toDF("imp_ts", "imp_ad"), "imp_ts", "5 minutes",
      clk.toDF().toDF("clk_ts", "clk_ad"), "clk_ts", "5 minutes",
      expr("imp_ad = clk_ad AND clk_ts BETWEEN imp_ts AND imp_ts + INTERVAL 5 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssjo")
      .outputMode("append").start()
    imp.addData((t(1), 7L), (t(1), 8L))
    clk.addData((t(3), 7L))
    q.processAllAvailable()
    // push both watermarks far ahead so ad 8's no-match is provable
    imp.addData((t(50), 99L)); clk.addData((t(50), 99L))
    q.processAllAvailable()
    val rows = spark.table("ssjo").select("imp_ad", "clk_ad")
      .as[(Long, Option[Long])].collect().toSet
    q.stop()
    assert(rows.contains((7L, Some(7L))))
    assert(rows.contains((8L, None)))
  }

  test("cdc merge sink: latest-wins upsert and delete converge the snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("cdcmerge").toString + "/store"
    val in = MemoryStream[(Long, String, Long, Boolean)]
    val df = in.toDF().toDF("k", "v", "seq", "del")
    val q = StreamingOps.cdcMergeSink(df, Seq("k"), "seq", "del", dir).start()
    in.addData((1L, "a1", 1L, false), (2L, "b1", 1L, false))
    q.processAllAvailable()
    in.addData((1L, "a2", 2L, false), (2L, "x", 2L, true), (3L, "c1", 1L, false))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(dir).select("k", "v")
      .as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a2"), (3L, "c1")))
  }
}

class SessionTimeoutAndBedSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("event-time timeout flushes the idle user's last session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingOps.TsEv]
    val q = StreamingOps.sessionizeWithTimeout(in.toDS(), gapSeconds = 120, "1 minute")
      .writeStream.format("memory").queryName("swt").outputMode("append").start()
    in.addData(StreamingOps.TsEv(1L, t(1), 1.0), StreamingOps.TsEv(1L, t(2), 2.0))
    q.processAllAvailable()
    // user 1 goes silent; only OTHER users' events advance the watermark
    in.addData(StreamingOps.TsEv(2L, t(30), 5.0))
    q.processAllAvailable()
    in.addData(StreamingOps.TsEv(2L, t(31), 6.0))
    q.processAllAvailable()
    val rows = spark.table("swt")
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect().toSet
    q.stop()
    // user 1's session was emitted by TIMEOUT, not by a later event
    assert(rows.contains((1L, 2L, 3.0)))
  }

  test("bed reader: header skipping, optional columns, span") {
    val bed = Files.createTempFile("graft", ".bed")
    Files.writeString(bed, Seq(
      "# comment line",
      "chr1\t100\t250\tpeak1\t7",
      "chr1\t300\t340\tpeak2\t2",
      "chr2\t0\t50").mkString("\n"))
    val df = SequenceSources.readBed(spark, bed.toString)
    val rows = df.select("chrom", "start", "end", "name", "span")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3)), r.getLong(4))).toSet
    assert(rows == Set(
      ("chr1", 100L, 250L, Some("peak1"), 150L),
      ("chr1", 300L, 340L, Some("peak2"), 40L),
      ("chr2", 0L, 50L, None, 50L)))
  }
}

class IdempotentBatchSinkSpec extends SparkSpec {
  import spark.implicits._

  test("replaying a batch id overwrites its partition instead of appending") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("idemsink").toString + "/out"
    val in = MemoryStream[(Long, String)]
    val df = in.toDF().toDF("id", "v")
    val q = StreamingOps.idempotentBatchSink(df, dir).start()
    in.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    in.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    val before = spark.read.parquet(dir).select("id", "v")
      .as[(Long, String)].collect().toSet
    assert(before == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // simulate an at-least-once REPLAY of batch 1: same data, same id
    // (restore the conf after — a leaked dynamic mode changes how the
    // shared session plans every later INSERT OVERWRITE)
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      Seq((3L, "c")).toDF("id", "v").withColumn("batch_id", lit(1L))
        .write.mode("overwrite").partitionBy("batch_id").parquet(dir)
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    val after = spark.read.parquet(dir).select("id", "v")
      .as[(Long, String)].collect().toSet
    assert(after == before) // no duplicate row appeared
    // and only the replayed partition was touched
    val parts = spark.read.parquet(dir).select("batch_id").distinct()
      .as[Long].collect().toSet
    assert(parts == Set(0L, 1L))
  }
}
