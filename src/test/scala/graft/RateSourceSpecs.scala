package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingOps

/** Round-8: the streaming pipelines driven from a NON-REPLAYABLE
  * source posture — Spark's rate source tracks progress as OFFSETS in
  * the checkpoint (the Kafka deployment shape), not as files. The
  * pins: a restarted query resumes from the committed offset with
  * exactly-once delivery (batch-id dedupe, contiguous value coverage,
  * zero gaps/dupes), and the as-of join holds its contract on rows it
  * emits from live two-branch stream input.
  *
  * Every wait loops on REAL progress (processedRowsPerSecond comes
  * from wall-clock batches), with generous caps for slow hosts.
  */
class RateSourceResumeSpec extends SparkSpec {
  import spark.implicits._

  private def awaitTrue(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val t0 = System.currentTimeMillis()
    while (!cond && System.currentTimeMillis() - t0 < timeoutMs) Thread.sleep(100)
    cond
  }

  test("restart resumes from checkpointed offsets: exactly-once, contiguous coverage") {
    val ckpt = Files.createTempDirectory("ratechk").toString
    // (batchId, values) per foreachBatch call, across BOTH runs; an
    // uncommitted batch replayed at restart reuses its batch id, so
    // batch-id dedupe is the exactly-once contract surface
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
    def startQuery() = spark.readStream.format("rate")
      .option("rowsPerSecond", 200).load()
      .select(col("value"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
        val vs = df.select("value").as[Long].collect()
        batches.synchronized { batches += bid -> vs }
        ()
      }
      .start()

    val q1 = startQuery()
    assert(awaitTrue(60000)(batches.synchronized(batches.map(_._2.length).sum) >= 100),
      "first run never processed data")
    q1.stop()
    val firstRunMax = batches.synchronized(
      batches.flatMap(_._2).foldLeft(-1L)(math.max))

    val q2 = startQuery()
    assert(awaitTrue(60000)(batches.synchronized(
        batches.flatMap(_._2).foldLeft(-1L)(math.max)) > firstRunMax),
      "restarted run never advanced past the first run's offsets")
    q2.stop()

    // exactly-once by batch id: keep one copy per id, then the values
    // must be EXACTLY 0..max — a re-delivered offset would duplicate,
    // a skipped offset would gap; either breaks contiguity
    val byId = batches.synchronized(batches.toList).groupBy(_._1)
      .map { case (bid, vs) =>
        // a replayed uncommitted batch must carry the same offsets
        assert(vs.map(_._2.toSet).distinct.size == 1,
          s"batch $bid replayed with different offsets")
        bid -> vs.head._2
      }
    val vals = byId.values.flatten.toSeq.sorted
    assert(vals.nonEmpty)
    assert(vals.distinct.size == vals.size, "duplicate values across restarts")
    assert(vals == (0L to vals.max), s"coverage not contiguous: ${vals.size} of ${vals.max + 1}")
  }

  test("as-of join over two rate-derived branches holds its contract live") {
    val ckpt = Files.createTempDirectory("rateasof").toString
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", 200).load()
    // left: every event; right: the even values only, so each left
    // event's as-of match is the latest even value at or before it
    val left = rate.select(col("timestamp").as("ts"), (col("value") % 4).as("key"),
      col("value").as("lval"))
    val right = rate.filter(col("value") % 2 === 0)
      .select(col("timestamp").as("ts"), (col("value") % 4).as("key"),
        col("value").as("rval"))
    val joined = StreamingOps.asofJoinStream(
      left, "ts", "key", right, "ts", "key", "rval",
      tolerance = "10 seconds", watermark = "2 seconds")
    val q = joined.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select(col("ts").cast("double").as("t"), col("key"),
            col("asof_ts").cast("double").as("at"), col("asof_value"))
          .as[(Double, Long, Double, Long)].collect()
          .map { case (t, k, at, v) => (math.round(t * 1000), k, math.round(at * 1000), v) }
        out.synchronized { out ++= rows }
        ()
      }
      .start()
    assert(awaitTrue(120000)(out.synchronized(out.nonEmpty)),
      "as-of join never emitted (watermark never closed a group)")
    q.stop()
    val rows = out.synchronized(out.toList)
    // the as-of contract on every emitted row: match at or before the
    // left event, key preserved (rval carries key via % identity:
    // rval % 4 == key because right only has even values whose
    // key IS value % 4)
    assert(rows.forall { case (t, _, at, _) => at <= t }, "asof_ts after event ts")
    assert(rows.forall { case (_, k, _, v) => v % 4 == k }, "key mismatch in matched value")
    assert(rows.forall { case (_, _, _, v) => v % 2 == 0 }, "non-right-side value matched")
  }
}
