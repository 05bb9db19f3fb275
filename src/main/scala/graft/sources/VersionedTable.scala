package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets

/** Versioned-manifest table layout — snapshot isolation for the batch
  * sinks, using the PUBLIC table-format concepts (a log of immutable
  * manifest files naming immutable data files; Iceberg/Delta papers
  * and docs describe the idea — no proprietary code or format here).
  *
  * Layout under the table root:
  * {{{
  *   <root>/data/c<version>-<nonce>/part-*.parquet   — immutable data files
  *   <root>/_manifests/v<version>.manifest            — one line per data file
  * }}}
  *
  * Invariants that give concurrent-reader safety:
  *  - data files are NEVER mutated or overwritten: every commit writes
  *    into a fresh `data/c…` directory;
  *  - a manifest is NEVER mutated: it is written to a temp name and
  *    atomically renamed into place (Hadoop `rename` fails if the
  *    destination exists, which doubles as optimistic concurrency —
  *    a losing concurrent committer retries at the next version);
  *  - a reader PINS a manifest at open time ([[snapshot]]) and builds
  *    its DataFrame from that explicit file list — a later commit,
  *    overwrite, or [[compact]] writes new files + a new manifest and
  *    touches nothing the pinned reader references;
  *  - only [[vacuum]] deletes data files, and only those unreferenced
  *    by the CURRENT manifest — run it after in-flight readers of old
  *    snapshots have drained (the retention window is operational
  *    policy, same as any table format).
  *
  * At 100 TB the manifest is the scan plan: a reader opens ONE small
  * file instead of listing millions of objects (object-store LIST is
  * the classic metadata bottleneck), and time travel / audit are free
  * (read any retained `v<N>`).
  */
object VersionedTable {

  /** A pinned view of the table: `version` and the exact files it
    * references (absolute path strings). */
  final case class Snapshot(version: Long, files: Seq[String])

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "_manifests")

  private val ManifestName = "v(\\d+)\\.manifest".r

  /** Latest committed version, or 0 when the table does not exist. */
  def currentVersion(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    val dir = manifestDir(root)
    if (!f.exists(dir)) 0L
    else f.listStatus(dir).flatMap(s => s.getPath.getName match {
      case ManifestName(v) => Some(v.toLong)
      case _ => None
    }).foldLeft(0L)(math.max)
  }

  /** Pin the given (or latest) version: read its manifest once and
    * return the immutable file list. Everything a reader does from
    * here on references exactly these files. */
  def snapshot(spark: SparkSession, root: String, version: Long = -1L): Snapshot = {
    val f = fs(spark, root)
    val v = if (version > 0) version else currentVersion(spark, root)
    require(v > 0, s"no committed version at $root")
    val mf = new Path(manifestDir(root), s"v$v.manifest")
    val in = f.open(mf)
    val body = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    Snapshot(v, body.split("\n").filter(l => l.nonEmpty && !l.startsWith("#"))
      .toSeq.map(rel => new Path(root, rel).toString))
  }

  /** Metadata header (`#key=value` lines) of the given (or latest)
    * manifest — e.g. the streaming sink's `batch` id. */
  def manifestMeta(spark: SparkSession, root: String, version: Long = -1L): Map[String, String] = {
    val f = fs(spark, root)
    val v = if (version > 0) version else currentVersion(spark, root)
    if (v <= 0) return Map.empty
    val in = f.open(new Path(manifestDir(root), s"v$v.manifest"))
    val body = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    body.split("\n").filter(_.startsWith("#")).flatMap { l =>
      l.drop(1).split("=", 2) match {
        case Array(k, v2) => Some(k -> v2)
        case _ => None
      }
    }.toMap
  }

  /** Highest streaming batch id recorded in the current manifest, or
    * −1 when none — the streaming sink's idempotence watermark. */
  def lastBatchId(spark: SparkSession, root: String): Long =
    manifestMeta(spark, root).get("batch").map(_.toLong).getOrElse(-1L)

  /** DataFrame over a pinned snapshot (latest by default). The plan's
    * scan is built from the explicit file list, so concurrent commits
    * and compactions cannot change — or break — what this reader sees. */
  def read(spark: SparkSession, root: String, version: Long = -1L): DataFrame = {
    val s = snapshot(spark, root, version)
    spark.read.parquet(s.files: _*)
  }

  /** Thrown when a commit requires the table to still be at a pinned
    * base version and another writer committed first — the caller
    * (e.g. [[compact]], [[merge]]) must re-read and retry or abort. */
  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  /** Write `df` as a new commit. `mode` "overwrite" makes the new
    * manifest reference only this commit's files; "append" makes it
    * reference the previous manifest's files plus this commit's.
    * Returns the committed version. Safe under concurrent committers:
    * the manifest rename is the commit point, losers retry.
    *
    * `expectBase >= 0` turns the blind retry into optimistic
    * concurrency control: the commit succeeds only if the table is
    * STILL at `expectBase` when the manifest rename wins — otherwise
    * the just-written data files are removed and
    * [[ConcurrentCommitException]] is thrown. Read-modify-write
    * callers (compaction, merge) need this: their output was derived
    * from a snapshot, and publishing it after an intervening commit
    * would silently drop that commit (lost update). */
  def commit(df: DataFrame, root: String, mode: String = "overwrite",
             meta: Map[String, String] = Map.empty,
             expectBase: Long = -1L): Long = {
    require(mode == "overwrite" || mode == "append", s"bad mode $mode")
    require(meta.forall { case (k, v) =>
      !k.contains("=") && !(k + v).exists(c => c == '\n' || c == '\r') },
      "meta keys/values must be line-safe")
    val spark = df.sparkSession
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    // unique, immutable data directory for this commit's files
    val nonce = java.util.UUID.randomUUID.toString.take(8)
    val base = currentVersion(spark, root)
    if (expectBase >= 0 && base != expectBase)
      throw new ConcurrentCommitException(
        s"table at $root moved to v$base (expected v$expectBase) before write")
    val dataDir = new Path(root, s"data/c${base + 1}-$nonce")
    df.write.parquet(dataDir.toString)
    val written = f.listStatus(dataDir)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => s"data/c${base + 1}-$nonce/${st.getPath.getName}").sorted
    // commit loop: build the manifest against the CURRENT version each
    // attempt, so an append that loses a race re-reads the winner's list
    var committed = -1L
    while (committed < 0) {
      val cur = currentVersion(spark, root)
      if (expectBase >= 0 && cur != expectBase) {
        // another writer won since our snapshot: abort, drop our files
        f.delete(dataDir, true)
        throw new ConcurrentCommitException(
          s"table at $root moved to v$cur (expected v$expectBase) at commit")
      }
      val carried =
        if (mode == "append" && cur > 0)
          snapshot(spark, root, cur).files.map(abs =>
            abs.stripPrefix(new Path(root).toString).stripPrefix("/"))
        else Seq.empty
      val lines = (meta.toSeq.sortBy(_._1).map { case (k, v2) => s"#$k=$v2" }
        ++ carried ++ written).mkString("", "\n", "\n")
      val tmp = new Path(manifestDir(root), s".v${cur + 1}-$nonce.tmp")
      val out = f.create(tmp, true)
      try out.write(lines.getBytes(StandardCharsets.UTF_8)) finally out.close()
      val target = new Path(manifestDir(root), s"v${cur + 1}.manifest")
      if (f.rename(tmp, target)) committed = cur + 1
      else f.delete(tmp, false) // lost the race — retry at the next version
    }
    committed
  }

  /** Manifest-aware compaction: rewrite the CURRENT snapshot into
    * ⌈bytes / targetFileBytes⌉ files, commit them as a new version,
    * and DELETE NOTHING — readers pinned to any earlier version keep
    * every file they reference until [[vacuum]]. Returns
    * (filesBefore, filesAfter). Contrast [[Sinks.compact]], whose
    * rename-swap assumes no concurrent reader holds the old listing.
    */
  def compact(spark: SparkSession, root: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              maxRetries: Int = 5): (Int, Int) = {
    // read-modify-write: the rewrite is derived from a pinned snapshot,
    // so the commit must be CONDITIONAL on that snapshot still being
    // current — otherwise an append that lands between the snapshot and
    // the manifest rename would be silently dropped (lost update). On
    // conflict the whole compaction re-snapshots and retries.
    var attempt = 0
    while (true) {
      val s = snapshot(spark, root)
      val totalBytes = {
        val f = fs(spark, root)
        s.files.map(p => f.getFileStatus(new Path(p)).getLen).sum
      }
      val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
      try {
        val v = commit(spark.read.parquet(s.files: _*).repartition(nFiles),
          root, mode = "overwrite", expectBase = s.version)
        return (s.files.size, snapshot(spark, root, v).files.size)
      } catch {
        case e: ConcurrentCommitException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    sys.error("unreachable")
  }

  /** Delete data files referenced by NO retained manifest, keeping the
    * newest `retainVersions` manifests (and every file they name).
    * Returns the number of data files deleted. The only deletion path
    * in the layout — everything else strictly adds.
    *
    * `graceMs` protects IN-FLIGHT COMMITS, not just old readers:
    * [[commit]] writes its data files BEFORE the manifest rename, so a
    * concurrent writer's fresh files are momentarily unreferenced by
    * any manifest — exactly what vacuum targets. Files younger than
    * the grace window are skipped (the modification-time guard the
    * public Delta/Iceberg vacuums use); the default comfortably
    * exceeds any write-to-rename gap. Tests pass 0 deliberately. */
  def vacuum(spark: SparkSession, root: String, retainVersions: Int = 1,
             graceMs: Long = 10L * 60 * 1000): Int = {
    val f = fs(spark, root)
    val cur = currentVersion(spark, root)
    require(cur > 0, s"no committed version at $root")
    val keepVs = ((cur - retainVersions + 1) max 1L) to cur
    // qualify through the filesystem: listStatus returns scheme-
    // qualified paths (file:/…), manifest resolution does not
    val live = keepVs.flatMap(v => snapshot(spark, root, v).files)
      .map(p => f.makeQualified(new Path(p)).toString).toSet
    val dataRoot = new Path(root, "data")
    if (!f.exists(dataRoot)) return 0
    val cutoff = System.currentTimeMillis() - graceMs
    var deleted = 0
    for (dir <- f.listStatus(dataRoot); st <- f.listStatus(dir.getPath)
         if st.getPath.getName.endsWith(".parquet")
         if st.getModificationTime <= cutoff
         if !live.contains(st.getPath.toString)) {
      if (f.delete(st.getPath, false)) deleted += 1
    }
    // drop manifests older than the retention window so time travel
    // can't resolve to files vacuum just removed
    for (st <- f.listStatus(manifestDir(root)))
      st.getPath.getName match {
        case ManifestName(v) if v.toLong < keepVs.head => f.delete(st.getPath, false)
        case _ => ()
      }
    // remove now-empty commit directories (cosmetic)
    for (dir <- f.listStatus(dataRoot) if f.listStatus(dir.getPath).isEmpty)
      f.delete(dir.getPath, false)
    deleted
  }
}
