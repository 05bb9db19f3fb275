package org.apache.spark.sql.graftbridge

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.sources.VersionedTable

/** The graft CHANGE FEED as a first-class Structured Streaming SOURCE
  * (round 14): `spark.readStream.table("graft.t")` works end-to-end —
  * no more hand-rolled poll loop (the r13 SqlChangeFeedPollSpec
  * workaround). The design is the public Delta/Iceberg streaming-
  * source shape on this layout:
  *
  *  - **Versions are the offsets.** An offset is `(version,
  *    snapshotDone)`; the engine checkpoints it, and
  *    [[GraftMicroBatchStream.planInputPartitions]] re-derives any
  *    batch purely from the immutable manifests — replay after a
  *    restart is exactly-once by construction.
  *  - **Initial snapshot, then deltas.** The first batch is the full
  *    snapshot of the version current at stream start; every later
  *    batch walks the per-version manifest diffs. `startingVersion`
  *    (a number, or `latest`) skips the snapshot and streams changes
  *    from that version on.
  *  - **Appends stream; data changes fail loudly.** A version that
  *    only ADDS files delivers those files' rows. A version that
  *    removes files or grows deletion vectors (DV DELETE, MERGE
  *    rewrite, OPTIMIZE, RESTORE) is a *data-change commit*: the
  *    stream fails with a precise message unless
  *    `skipChangeCommits=true` (the public Delta option and
  *    semantics), which skips those commits' row changes entirely.
  *  - **Rate limit.** `maxVersionsPerBatch` caps how many versions one
  *    micro-batch may span ([[SupportsAdmissionControl]]).
  *
  * Rows surface under the STREAM-START logical schema: physical names
  * are fixed at first commit (column mapping), so one physical read
  * schema addresses every era's files — a rename mid-stream simply
  * keeps serving the start-era names until the stream restarts;
  * columns added mid-stream appear after a restart. Scale posture:
  * planning is manifest-only (no data file is opened on the driver);
  * each snapshot/added file becomes one [[InputPartition]] read by
  * the stock vectorized parquet reader ([[ParquetFileFormat
  * .buildReaderWithPartitionValues]] — the same executor-side path a
  * batch scan uses), so a 10k-file initial snapshot is a 10k-task
  * distributed read, never a driver loop. The only driver
  * materialization is the snapshot version's deletion-vector position
  * lists (DV sizing is bounded by design — they are delete DIFFS, and
  * a compact/optimize folds them away). */
class GraftMicroBatchStream(root: String, streamSchema: StructType,
                            options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow: the run's END is fixed at start (everything
  // committed as of now, nothing later), while latestOffset still
  // paces batches toward it — implementing the interface OURSELVES
  // keeps maxVersionsPerBatch honored (the engine's generic wrapper
  // would jump straight to the target in one batch)
  @volatile private var availableNowCap: Long = Long.MaxValue

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = VersionedTable.currentVersion(spark, root)

  private def spark: SparkSession = SparkSession.active

  private val maxVersionsPerBatch: Long =
    Option(options.get("maxversionsperbatch")).map(_.toLong)
      .getOrElse(Long.MaxValue)
  require(maxVersionsPerBatch > 0,
    s"maxVersionsPerBatch must be positive, got $maxVersionsPerBatch")
  private val skipChangeCommits: Boolean =
    Option(options.get("skipchangecommits")).exists(_.toBoolean)

  // the physical read schema addresses every era's files (names are
  // fixed at first commit); rows line up POSITIONALLY with the
  // logical streamSchema. A schema-less legacy table reads its files
  // under the logical names directly.
  private val physSchema: StructType =
    VersionedTable.physicalReadSchema(spark, root).getOrElse(streamSchema)

  override def initialOffset(): Offset =
    GraftStreamShared.initialOffset(spark, root, options)

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-controlled entry")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    GraftStreamShared.nextOffset(spark, root,
      start.asInstanceOf[GraftStreamOffset], availableNowCap,
      maxVersionsPerBatch)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val e = end.asInstanceOf[GraftStreamOffset]
    if (!s.snapshotDone) {
      // the initial-snapshot batch: every live file of the pinned
      // version, with that era's deletion vectors applied
      require(e.snapshotDone && e.version == s.version,
        s"snapshot batch must close its own version: $s -> $e")
      val sizes = VersionedTable.fileSizes(spark, root, s.version)
      val skip = dvPositions(s.version)
      sizes.map { case (f, bytes) => GraftStreamPartition(f, bytes,
        skip.getOrElse(key3(f), Array.emptyLongArray))
      }.toArray[InputPartition]
    } else {
      // delta batches walk PER-VERSION diffs (not the net diff): a
      // MERGE's rewritten file must classify as a data change, which
      // only the per-commit granularity can see
      (s.version + 1 to e.version).toArray.flatMap { v =>
        // v == 1 diffs against the EMPTY pre-table state
        // (startingVersion=1 streams the first commit as inserts)
        val prevFiles = if (v == 1) Set.empty[String]
          else VersionedTable.snapshot(spark, root, v - 1).files.toSet
        val prevDv = if (v == 1) Set.empty[(String, String)]
          else VersionedTable.dvEntries(spark, root, v - 1).toSet
        val cur = VersionedTable.snapshot(spark, root, v)
        val added = cur.files.toSet -- prevFiles
        val removed = prevFiles -- cur.files.toSet
        val dvGrew = VersionedTable.dvEntries(spark, root, v).toSet != prevDv
        if (removed.nonEmpty || dvGrew) {
          if (!skipChangeCommits) throw new UnsupportedOperationException(
            s"graft stream at $root: version $v changed existing data " +
              s"(${removed.size} files removed" +
              (if (dvGrew) ", deletion vectors grew" else "") +
              "). Streaming delivers appends; set skipChangeCommits=true " +
              "to skip data-change commits, or use vt_changes() for CDC.")
          Seq.empty // the commit's row changes are skipped wholesale
        } else {
          // pure-append commit: fresh files carry no DV of their own
          // era, so the rows stream as-is
          val sizeOf = VersionedTable.fileSizes(spark, root, v).toMap
          added.toSeq.sorted.map(f => GraftStreamPartition(f,
            sizeOf.getOrElse(f, 0L), Array.emptyLongArray))
        }
      }.map(p => p: InputPartition)
    }
  }

  private def key3(p: String): String =
    p.split('/').takeRight(3).mkString("/")

  private def dvPositions(version: Long): Map[String, Array[Long]] =
    GraftStreamShared.dvPositions(spark, root, version)

  // built once per stream on the driver and serialized to executors —
  // the same reader function a batch FileSourceScanExec ships, so the
  // stream rides the stock (vectorized) parquet path
  private lazy val readerFn: PartitionedFile => Iterator[InternalRow] =
    GraftStreamShared.readerFn(spark, physSchema)

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftStreamReaderFactory(readerFn)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftStream[$root]"
}

/** Machinery both graft streams share — the append-only table stream
  * ([[GraftMicroBatchStream]]) and the CDC stream
  * ([[GraftCdcMicroBatchStream]], `format("graft-cdc")`). */
private[graftbridge] object GraftStreamShared {

  /** Where a stream starts: `startingVersion` = number (changes FROM
    * that version on, no snapshot) | 'latest' (only future changes) |
    * a NAMED TAG (changes AFTER the pinned era — "resume from the
    * corpus pin": the consumer processed up to the tag, the stream
    * delivers what landed since) | absent (full snapshot of the
    * current version, then deltas). */
  def initialOffset(spark: SparkSession, root: String,
                    options: CaseInsensitiveStringMap): GraftStreamOffset =
    Option(options.get("startingversion")) match {
      case Some(s) if s.equalsIgnoreCase("latest") =>
        GraftStreamOffset(VersionedTable.currentVersion(spark, root),
          snapshotDone = true)
      case Some(s) =>
        val v = scala.util.Try(s.toLong).toOption match {
          case Some(n) =>
            require(n >= 1, s"startingVersion must be >= 1, got $n")
            n - 1 // numeric start is INCLUSIVE of that version
          case None => scala.util.Try(
            VersionedTable.tagVersion(spark, root, s)).getOrElse(
            throw new IllegalArgumentException(
              s"startingVersion must be a version number, 'latest', or " +
                s"a tag name, got '$s' (tags: ${VersionedTable
                  .tags(spark, root).keys.toSeq.sorted.mkString(", ")})"))
          // a tag start is EXCLUSIVE: the pinned era was processed
        }
        GraftStreamOffset(v, snapshotDone = true)
      case None =>
        GraftStreamOffset(VersionedTable.currentVersion(spark, root),
          snapshotDone = false)
    }

  /** Admission control: the snapshot batch first, then at most
    * `maxVersions` versions per batch, never past `cap` (the
    * Trigger.AvailableNow target). */
  def nextOffset(spark: SparkSession, root: String, s: GraftStreamOffset,
                 cap: Long, maxVersions: Long): GraftStreamOffset =
    if (!s.snapshotDone) s.copy(snapshotDone = true)
    else {
      val cur = math.min(cap, VersionedTable.currentVersion(spark, root))
      // saturating add: the default reach is Long.MaxValue
      val reach = if (maxVersions > Long.MaxValue - s.version)
        Long.MaxValue else s.version + maxVersions
      val end = math.min(cur, reach)
      if (end <= s.version) s else GraftStreamOffset(end, snapshotDone = true)
    }

  /** Deletion-vector positions of `version`, grouped by 3-segment data
    * key. Driver-materialized and bounded: DVs are delete diffs,
    * folded away by compaction. */
  def dvPositions(spark: SparkSession, root: String,
                  version: Long): Map[String, Array[Long]] = {
    val rels = VersionedTable.dvEntries(spark, root, version)
      .map(_._2).distinct
    if (rels.isEmpty) Map.empty
    else spark.read.parquet(rels.map(r => new Path(root, r).toString): _*)
      .select("file", "pos").distinct().collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getLong(1)).sorted }
  }

  /** The serialized executor-side parquet reader — the same function a
    * batch FileSourceScanExec ships (vectorized underneath, rows out:
    * OPTION_RETURNING_BATCH=false keeps the per-row DV position filter
    * straightforward). */
  def readerFn(spark: SparkSession, physSchema: StructType)
      : PartitionedFile => Iterator[InternalRow] =
    new ParquetFileFormat().buildReaderWithPartitionValues(
      sparkSession = spark,
      dataSchema = physSchema,
      partitionSchema = new StructType(),
      requiredSchema = physSchema,
      filters = Seq.empty,
      options = Map(
        org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = spark.sessionState.newHadoopConf())

  /** Open one whole file through `fn`, flattening vectorized batches —
    * enumeration order IS `row_index` (no filters, no row-group
    * skipping), the identity every DV position filter keys on. */
  def openFile(fn: PartitionedFile => Iterator[InternalRow],
               path: String, size: Long): Iterator[InternalRow] = {
    val pf = PartitionedFile(InternalRow.empty,
      SparkPath.fromPathString(path), 0L, size, Array.empty, 0L, size,
      Map.empty[String, Any])
    fn(pf).asInstanceOf[Iterator[Any]].flatMap {
      case b: ColumnarBatch => b.rowIterator().asScala
      case r: InternalRow => Iterator.single(r)
    }
  }
}

/** `(version, snapshotDone)`: `snapshotDone = false` means the full
  * snapshot AT `version` has not been delivered yet; after it, offsets
  * advance by version only. */
case class GraftStreamOffset(version: Long, snapshotDone: Boolean)
    extends Offset {
  override def json: String =
    s"""{"version":$version,"snapshotDone":$snapshotDone}"""
}

object GraftStreamOffset {
  def fromJson(json: String): GraftStreamOffset = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = om.readTree(json)
    GraftStreamOffset(n.get("version").asLong(),
      n.get("snapshotDone").asBoolean())
  }
}

/** One data file of a batch (manifest-recorded size) plus the
  * positions its era's deletion vectors removed (non-empty only for
  * snapshot-batch files). */
case class GraftStreamPartition(filePath: String, fileSize: Long,
                                dvSkip: Array[Long])
    extends InputPartition

/** Executor-side reader: run the serialized parquet reader function,
  * flatten vectorized batches, and drop DV'd positions by the row's
  * index in the file (the whole file is read in order — no filters,
  * no row-group skipping — so enumeration order IS `row_index`, the
  * same identity the batch-side DV anti-join keys on). */
class GraftStreamReaderFactory(
    readerFn: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftStreamPartition]
    new PartitionReader[InternalRow] {
      private var opened: Iterator[InternalRow] = _
      private var current: InternalRow = _
      private var rowIdx = -1L

      private def it: Iterator[InternalRow] = {
        if (opened == null)
          opened = GraftStreamShared.openFile(readerFn, p.filePath, p.fileSize)
        opened
      }

      override def next(): Boolean = {
        while (it.hasNext) {
          current = it.next()
          rowIdx += 1
          if (p.dvSkip.isEmpty ||
              java.util.Arrays.binarySearch(p.dvSkip, rowIdx) < 0)
            return true
        }
        false
      }

      override def get(): InternalRow = current

      override def close(): Unit = ()
    }
  }
}
