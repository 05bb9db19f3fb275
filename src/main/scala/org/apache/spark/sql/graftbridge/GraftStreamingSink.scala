package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.sources.VersionedTable

/** The graft table as a first-class Structured Streaming SINK (round
  * 15): `df.writeStream.toTable("graft.t")` works end-to-end — the
  * write-side mirror of round 14's streaming source, closing the last
  * foreachBatch workaround (versionedCommitSink in StreamingOps).
  *
  * Shape (the public Delta/Iceberg streaming-sink design on this
  * layout):
  *
  *  - **Executors write, the driver publishes.** Each task's
  *    [[DataWriter]] streams its partition's rows straight into ONE
  *    parquet file under `data/e<epoch>-<runNonce>/` through the stock
  *    [[ParquetFileFormat]] OutputWriter — the same executor-side
  *    write path a batch insert uses; the driver never sees a row.
  *    At 1000 executors an epoch is a 1000-way parallel file write
  *    plus one manifest rename.
  *  - **Epoch = commit, exactly-once PER WRITER.** `commit(epochId,
  *    messages)` publishes exactly the committed tasks' files as one
  *    VersionedTable append commit carrying
  *    `#batch.<queryId>=<epochId>` (round 16: the watermark is keyed
  *    by Spark's checkpoint-stable queryId, the txn-appId of the
  *    public Delta idempotent-write design) — so a crash-replayed
  *    epoch of THIS query sees `epochId <= lastBatchId(queryId)`,
  *    drops its staged files and skips, while a fresh-checkpoint
  *    query (epochs restarting at 0) or a second concurrent writer
  *    lands every epoch: no dupes, no gaps, no cross-writer muting,
  *    and a reader never observes a half-epoch (snapshot isolation
  *    via the manifest rename).
  *  - **Failed/speculative tasks can't leak rows.** Only files named
  *    in the SUCCESSFUL tasks' commit messages are published;
  *    stragglers' orphans in the staging dir are never referenced and
  *    vacuum retires them.
  *  - **Complete mode** rides the same path with an overwrite commit
  *    per epoch (the builder's truncate()).
  *
  * Rows land under PHYSICAL column names (column mapping, captured at
  * run start); a rename/drop landing mid-run aborts the epoch commit
  * loudly rather than mixing physical-name eras — restart picks up
  * the new mapping. A table with a declared `clustering` layout gets
  * PRUNABLE EPOCHS: the write declares
  * [[RequiresDistributionAndOrdering]] (clustered distribution + sort
  * on the top-level cluster columns), so the engine shuffles+sorts
  * each micro-batch BEFORE the writers run and every epoch's files
  * are key-disjoint on the leading cluster column — stats-prunable at
  * birth, the streaming analogue of the batch path's interleave
  * routing (the full curve order still lands via OPTIMIZE). */
class GraftStreamingWrite(root: String, logicalSchema: StructType,
                          queryId: String, overwriteEachEpoch: Boolean)
    extends StreamingWrite {

  private def spark: SparkSession = SparkSession.active

  // a GENERATED ALWAYS identity table cannot accept a stream (epochs
  // can neither generate nor carry explicit ids) — fail at run start,
  // not per epoch (round 16)
  VersionedTable.rejectStrictIdentity(spark, root, "streaming write")

  // captured ONCE per run: the mapping the epoch files are written
  // under; the publish loop re-verifies it before every rename
  private val cm: Map[String, String] =
    VersionedTable.columnMapping(spark, root)
  private val physSchema: StructType =
    VersionedTable.physicalWriteSchema(cm, logicalSchema)

  // distinguishes this RUN's staging dirs from a restarted run's
  // replay of the same epoch (the replay stages fresh files, finds
  // the epoch already published, and drops them)
  private val runNonce: String = java.util.UUID.randomUUID.toString.take(8)

  // the PER-WRITER idempotence key (round 16): Spark's queryId is
  // stable across restarts of one checkpoint and fresh per new
  // checkpoint, exactly the txn-appId contract the watermark needs —
  // a fresh-checkpoint query (epochs restarting at 0) appends from
  // epoch 0 instead of being silently muted by a previous writer's
  // table-global watermark, and two concurrent writers each track
  // their own epochs. Sanitized defensively: the manifest meta line
  // is `#batch.<id>=<epoch>`.
  private val writerKey: String =
    Option(queryId).getOrElse("unknown")
      .replaceAll("[=\\n\\r\\t ]", "-")

  // table-DECLARED streaming behavior, read once per run like the
  // column mapping (round 16): `upsert_keys = 'k1,k2'` makes every
  // append epoch a keyed UPSERT — the landing shape of a watermarked
  // streaming aggregate in UPDATE output mode (each epoch re-emits
  // only its changed keys; the table converges to one row per key
  // without complete mode's whole-table rewrite). `autocompact = N`
  // folds a small-file compaction into the commit loop every N
  // epochs, bounding the one-file-per-task-per-epoch fragmentation of
  // a long-running stream.
  private val tableMeta0: Map[String, String] =
    VersionedTable.manifestMeta(spark, root)
  private val upsertKeys: Seq[String] = tableMeta0.get("upsert_keys").toSeq
    .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
  private val autoCompactEvery: Long = tableMeta0.get("autocompact")
    .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(0L)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    // prepareWrite configures the job conf exactly as a batch insert
    // would (write support class, schema, compression) — serialize
    // THAT conf to the executors, the FileFormatWriter recipe
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(
      spark, job, Map.empty, physSchema)
    GraftStreamingWriterFactory(root, runNonce, physSchema, factory,
      new SerializableConfiguration(job.getConfiguration))
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case m: GraftEpochFile if m.relPath != null => (m.relPath, m.bytes)
    }.toSeq.sortBy(_._1)
    val stagedDir = s"data/e$epochId-$runNonce"
    if (epochId <= VersionedTable.lastBatchId(spark, root, writerKey)) {
      // crash-replayed epoch: already published by a prior run of THIS
      // query — the replay's staged files must go, the table must not.
      // Another writer's (or a fresh checkpoint's predecessor's)
      // watermark never trips this guard: the comparison is against
      // this query's own `batch.<queryId>` entry.
      fsDelete(stagedDir)
    } else if (files.isEmpty && !overwriteEachEpoch) {
      fsDelete(stagedDir) // empty append epoch: no empty commits
    } else {
      // complete mode publishes even an EMPTY epoch: the result
      // legitimately shrank to zero rows, and keeping the previous
      // epoch's rows would serve stale data forever. The same
      // epoch-id guard re-runs INSIDE the OCC loop
      // (skipIfBatchAtLeast): a zombie driver racing a restarted run
      // cannot double-publish — whoever loses the manifest rename
      // re-reads the winner's watermark and skips
      if (upsertKeys.nonEmpty && !overwriteEachEpoch)
        VersionedTable.upsertStagedFiles(spark, root, files, logicalSchema,
          cm, upsertKeys,
          meta = Map(s"batch.$writerKey" -> epochId.toString),
          cleanupDirs = Seq(stagedDir),
          skipIfBatchAtLeast = Some((writerKey, epochId)))
      else
        VersionedTable.commitStagedFiles(spark, root, files, logicalSchema,
          cm, meta = Map(s"batch.$writerKey" -> epochId.toString),
          mode = if (overwriteEachEpoch) "overwrite" else "append",
          cleanupDirs = Seq(stagedDir),
          skipIfBatchAtLeast = Some((writerKey, epochId)))
      maybeAutoCompact(epochId)
    }
  }

  /** Every `autocompact` epochs, fold [[VersionedTable.compactSmall]]
    * into the commit loop — best-effort under the same OCC
    * protections as any maintenance commit: a lost race (another
    * writer landed first) skips this cadence and the next one
    * retries; readers pinned mid-compaction are unaffected (their
    * snapshot's files survive until vacuum), and the keyed epoch
    * watermarks carry through the compaction commit like any other
    * table property. */
  private def maybeAutoCompact(epochId: Long): Unit =
    if (autoCompactEvery > 0 &&
        epochId % autoCompactEvery == autoCompactEvery - 1) {
      try { VersionedTable.compactSmall(spark, root); () }
      catch { case _: VersionedTable.ConcurrentCommitException => () }
    }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    fsDelete(s"data/e$epochId-$runNonce")

  private def fsDelete(rel: String): Unit = {
    val p = new Path(root, rel)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(p, true)
    ()
  }

  override def toString: String = s"GraftStreamingWrite[$root]"
}

/** One committed task file: its table-relative path and byte size —
  * everything the driver needs to build the manifest line. `relPath`
  * is null for a task that saw no rows (no empty parquet files). */
case class GraftEpochFile(relPath: String, bytes: Long)
    extends WriterCommitMessage

/** Executor-side factory: opens the stock parquet OutputWriter lazily
  * (first row), so empty partitions stage nothing. File names carry
  * (partitionId, taskId) — task retries and speculative attempts get
  * distinct names, and only the committed attempt's name reaches the
  * driver. */
case class GraftStreamingWriterFactory(
    root: String, runNonce: String, physSchema: StructType,
    factory: OutputWriterFactory, conf: SerializableConfiguration)
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val relPath =
        f"data/e$epochId-$runNonce/part-$partitionId%05d-$taskId.parquet"
      private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = _
      private var rows = 0L

      private def open(): Unit = if (writer == null) {
        val hc = new org.apache.hadoop.conf.Configuration(conf.value)
        val attempt = new TaskAttemptID(
          new TaskID(new JobID(runNonce, (epochId & 0x7FFFFFFF).toInt),
            TaskType.MAP, partitionId), (taskId & 0x7FFFFFFF).toInt)
        writer = factory.newInstance(
          new Path(root, relPath).toString, physSchema,
          new TaskAttemptContextImpl(hc, attempt))
      }

      override def write(record: InternalRow): Unit = {
        open(); writer.write(record); rows += 1
      }

      override def commit(): WriterCommitMessage =
        if (writer == null) GraftEpochFile(null, 0L)
        else {
          writer.close()
          val p = new Path(root, relPath)
          val f = p.getFileSystem(conf.value)
          GraftEpochFile(relPath, f.getFileStatus(p).getLen)
        }

      override def abort(): Unit = if (writer != null) {
        writer.close()
        val p = new Path(root, relPath)
        p.getFileSystem(conf.value).delete(p, false)
        ()
      }

      override def close(): Unit = ()
    }
}
