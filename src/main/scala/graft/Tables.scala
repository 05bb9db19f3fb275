package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-on-read loaders for the driver-generated parquet tables
  * (see TESTDATA.md). Keeping loads centralized lets specs assert
  * pushdown (`PushedFilters` / `ReadSchema`) against one code path.
  */
object Tables {

  /** Epoch-seconds Column for an event-time field, adaptive to the
    * physical type the data was generated with. The driver has shipped
    * `events.ts` both as int64 parquet NANOS (read as `long` under
    * `spark.sql.legacy.parquet.nanosAsLong`) and as `timestamp[us]`
    * (read as TIMESTAMP_NTZ). All branches TRUNCATE toward zero,
    * because that is what the DuckDB oracle's integer `//` does
    * (probed: -7//2 = -3) — `div` on the long nanos, and
    * `unix_micros div 1e6` (not a timestamp→long cast, which FLOORS)
    * on the timestamp types. Identical on the ≥-epoch data the driver
    * generates; EpochSecsSpec pins the sub-second and pre-epoch
    * behavior so a silent convention change trips a spec, not the
    * correctness gate. Session TZ is UTC (set by every entry point),
    * so the NTZ→TZ cast is identity on the wall-clock instant.
    */
  def epochSecs(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case LongType => expr(s"$c div 1000000000")
      case TimestampType | TimestampNTZType =>
        expr(s"unix_micros(CAST($c AS TIMESTAMP)) div 1000000")
      case other =>
        throw new IllegalArgumentException(
          s"unsupported event-time type $other for column $c")
    }

  /** events with an added `t` = floor(epoch seconds) column — the one
    * code path every time-family operator and spec goes through. */
  def eventsWithEpoch(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    e.withColumn("t", epochSecs(e))
  }
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // r17 (VERDICT r16 #9, measured on a 20-query subset first): every
  // spark.read.parquet() pays a driver footer-read JOB to infer the
  // schema, and the suite re-loads the same immutable test tables
  // hundreds of times (~2 loads × 246 queries × 3 bench passes). The
  // inferred schema of a static path is a constant — memoize it per
  // absolute path and hand it to the reader, which then skips the
  // inference job. METADATA only, never rows or results; the first
  // load of each path still infers from the real footers, so a
  // regenerated test set re-infers on a fresh JVM.
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val sc = schemaMemo.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(sc).parquet(path)
  }

  /** Parallelism floor for a COMPUTE-HEAVY per-row stage fed by a
    * small table (real codec encode/decode, quantizer encode): when
    * the table's on-disk bytes fit inside ONE scan split
    * (`spark.sql.files.maxPartitionBytes`), the scan is a single task
    * no matter how many cores the session has — a single-row-group
    * parquet file cannot be split finer — and the heavy per-row work
    * serializes on one core (measured: m8's PNG encode+decode ran
    * 2.8 s single-task at sf0.1 on local[32]). The floor is derived
    * from INPUT SIZE, never a constant: above one split the frame is
    * returned unchanged (zero-cost at any real scale, where the scan
    * already carries ≥ defaultParallelism tasks); below it, one
    * round-robin exchange of a sub-split (< 128 MB) table buys full-
    * width execution of everything downstream.
    */
  def spreadSmall(spark: SparkSession, dir: String, name: String,
                  df: DataFrame): DataFrame = {
    val bytes = try {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    } catch { case _: Throwable => Long.MaxValue } // unknown: assume big, no-op
    val split = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val par = spark.sparkContext.defaultParallelism
    if (bytes < split && par > 1) df.repartition(par) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
