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
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

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
}
