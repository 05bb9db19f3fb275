package graft.sources

import org.apache.spark.sql.DataFrame

/** Batch sinks. Parquet is the system-of-record format; the helpers
  * here encode the layout decisions that matter at corpus scale.
  */
object Sinks {

  /** Hive-style partitioned parquet: one directory per partition
    * value, so readers prune entire partitions from the *path* —
    * a filter on the partition column never opens a single excluded
    * file. `maxRecordsPerFile` bounds individual file size (a skewed
    * partition value otherwise lands in one giant file); writers
    * shuffle-free append within each task's partition values.
    */
  /** Incremental partition upsert — the storage half of the CDC story
    * ([[graft.operators.Snapshot.applyDiff]] is the compute half):
    * write `changes` over an existing partitioned dataset rewriting
    * ONLY the partitions that appear in `changes` (dynamic partition
    * overwrite). Untouched partitions keep their exact files, so
    * refresh cost scales with the changed-partition count, not the
    * table size — at 100 TB that is the difference between rewriting
    * a day and rewriting the corpus. `changes` must carry complete
    * replacement contents for every partition it touches (pair with
    * applyDiff to build them from a CDC action batch).
    */
  def upsertPartitions(changes: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit = {
    val spark = changes.sparkSession
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try changes.write.mode("overwrite")
      .partitionBy(partitionCols: _*).parquet(path)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed parquet table: rows are hash-partitioned into `buckets`
    * files per partition by `bucketCols` AND sorted within each
    * bucket, registered in the session catalog (bucketBy requires
    * `saveAsTable` — bucket metadata lives in the catalog, not the
    * files). Two tables bucketed the same way join WITHOUT ANY
    * EXCHANGE: each task zips bucket i with bucket i — the
    * co-located-join layout for fact-fact joins that repeat at 100-TB
    * scale, where one write-time shuffle amortizes over every
    * downstream join. (Disable `spark.sql.sources.v2.bucketing` quirks
    * by matching bucket counts; Spark requires equal counts to elide
    * the shuffle.)
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Sorted-within-partitions parquet: rows arrive at the writer
    * ordered by `sortCols`, so parquet row-group min/max statistics
    * become selective — a point/range filter on those columns skips
    * whole row groups at scan time (the poor man's z-order for the
    * single-column case). One repartition shuffle on the sort key.
    */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  numFiles: Int): Unit =
    df.repartitionByRange(numFiles, sortCols.map(df.col): _*)
      .sortWithinPartitions(sortCols.map(df.col): _*)
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction — the standing operational task of any
    * long-lived 100-TB dataset: streaming appends, partition upserts,
    * and per-task writers accumulate files far below the efficient
    * scan size (each file costs a task, an open, a footer read).
    * Rewrites `path` into ⌈bytes / targetFileBytes⌉ files and swaps
    * the result in via two filesystem renames (write-aside then
    * swap — never a read-and-overwrite of the same path in one job;
    * the old data survives any crash before the final rename).
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(path)
    // the path's OWN filesystem — FileSystem.get(conf) resolves the
    // default FS and would mishandle a fully-qualified s3a://…/table
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val summary = fs.getContentSummary(p)
    val nFiles = math.max(1L, (summary.getLength + targetFileBytes - 1) / targetFileBytes).toInt
    val before = fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__precompact")
    // leftovers from a crashed prior compaction make the renames below
    // ambiguous (a stale __precompact would be deleted as if it were
    // this run's backup) — fail fast and let the operator inspect
    if (fs.exists(tmp) || fs.exists(old))
      throw new IllegalStateException(
        s"compact: leftover $tmp or $old from a prior run — resolve before compacting")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // two-rename swap, each result checked: the backup (`old`) is only
    // deleted after the swap-in verifiably succeeded, and a failed
    // swap-in restores the original path from the backup
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compact: rename $p -> $old failed")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // restore; best-effort — tmp still holds the rewrite
      throw new java.io.IOException(s"compact: rename $tmp -> $p failed; original restored")
    }
    fs.delete(old, true)
    val after = fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    (before, after)
  }

  /** Z-order-clustered parquet: rows range-partitioned and sorted by
    * the Morton interleave of two filter columns, so file and
    * row-group min/max stats stay selective for predicates on EITHER
    * column (the two-dimensional upgrade of [[writeSorted]]). One
    * range shuffle on the curve key; the key itself is dropped from
    * the files.
    */
  def writeZordered(df: DataFrame, path: String, colA: String, colB: String,
                    bits: Int, numFiles: Int): Unit = {
    val keyed = df.withColumn("__z",
      graft.operators.Layout.zorderKey(df.col(colA), df.col(colB), bits))
    keyed.repartitionByRange(numFiles, keyed.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** N-dimensional interleave-clustered parquet ([[writeZordered]]
    * generalized past 2 filter dimensions — date × tenant × region
    * is the canonical 3): rows range-partitioned and sorted by the
    * N-way Morton key, so file and row-group min/max stats stay
    * selective for a predicate on ANY of the clustered columns. One
    * range shuffle on the curve key; the key is dropped from the
    * files. */
  def writeInterleaved(df: DataFrame, path: String, cols: Seq[String],
                       bits: Int, numFiles: Int): Unit = {
    // explicit ALIGNED curve spans, not a sampled range partition:
    // RangePartitioner's sampled boundaries straddle curve bit
    // boundaries, spreading each selective bit-region across two
    // files (measured: a 1/4-of-files predicate touched 27/64 under
    // sampling, 16/64 aligned). Equal span ids can't split across
    // range partitions, so files == aligned curve ranges.
    val keyBits = bits * cols.size
    val span = math.max(1L, ((1L << keyBits) + numFiles - 1) / numFiles)
    val keyed = df.withColumn("__z",
      graft.operators.Layout.interleaveKey(cols.map(df.col), bits))
      .withColumn("__fid", org.apache.spark.sql.functions.expr(s"__z div $span"))
    keyed.repartitionByRange(numFiles, keyed.col("__fid"))
      .sortWithinPartitions("__z")
      .drop("__z", "__fid")
      .write.mode("overwrite").parquet(path)
  }
}
