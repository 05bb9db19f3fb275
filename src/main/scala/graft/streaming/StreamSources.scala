package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped streaming source adapter.
  *
  * Every pipeline's first line is a queue read; this environment has
  * no Kafka broker or connector jar, so the seam is made explicit
  * instead: a [[StreamSource]] yields a streaming DataFrame in the
  * KAFKA WIRE SCHEMA — `key binary, value binary, topic string,
  * partition int, offset long, ts timestamp` — and everything
  * downstream ([[StreamingOps]] transforms) binds to that schema, not
  * to a concrete source. Swapping the bundled rate/socket/file
  * implementations for [[KafkaSource]] is a constructor change, no
  * transform edits.
  *
  * Offsets are the source's native ordering handle where one exists
  * (rate: the generated sequence number; kafka: the partition offset);
  * sources with no native offset (socket lines, file rows) surface a
  * content hash as a correlation surrogate and say so — exactly-once
  * replay there rides the file-sink batch-id protocol
  * ([[StreamingOps.idempotentBatchSink]]), not offset arithmetic.
  */
trait StreamSource extends Serializable {
  def name: String

  /** Streaming DataFrame in the wire schema for one topic. */
  def load(spark: SparkSession, topic: String): DataFrame
}

object StreamSource {
  /** The wire schema all adapters emit — Kafka's record shape. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("ts", TimestampType)))

  /** Decode the wire `value` as UTF-8 text — the adapter-to-transform
    * bridge for text-payload topics. */
  def text(wire: DataFrame): DataFrame =
    wire.select(col("topic"), col("partition"), col("offset"), col("ts"),
      col("value").cast("string").as("text"))

  /** Decode a JSON `value` against `schema`, fields flattened next to
    * the wire metadata. A payload field named like a metadata column
    * (`ts`, `offset`, ...) wins — the event's own time is what
    * downstream watermarks should see, not the transport's. */
  def json(wire: DataFrame, schema: StructType): DataFrame = {
    val meta = Seq("topic", "partition", "offset", "ts")
      .filterNot(schema.fieldNames.contains)
    wire.select(meta.map(col) :+
        from_json(col("value").cast("string"), schema).as("r"): _*)
      .select(meta.map(col) :+ col("r.*"): _*)
  }
}

/** Synthetic load generator over Spark's built-in `rate` source: the
  * generated sequence number is the offset, round-robin partitions. */
case class RateSource(rowsPerSecond: Int = 100, partitions: Int = 4) extends StreamSource {
  val name = "rate"
  def load(spark: SparkSession, topic: String): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .select(lit(null).cast("binary").as("key"),
        col("value").cast("string").cast("binary").as("value"),
        lit(topic).as("topic"),
        pmod(col("value"), lit(partitions)).cast("int").as("partition"),
        col("value").as("offset"), col("timestamp").as("ts"))
}

/** Line-per-record TCP source (Spark's `socket` format, dev/debug
  * grade upstream too). No native offset: content hash surrogate. */
case class SocketSource(host: String, port: Int) extends StreamSource {
  val name = "socket"
  def load(spark: SparkSession, topic: String): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port.toString)
      .option("includeTimestamp", "true").load()
      .select(lit(null).cast("binary").as("key"),
        col("value").cast("binary").as("value"),
        lit(topic).as("topic"), lit(0).as("partition"),
        xxhash64(col("value")).as("offset"), col("timestamp").as("ts"))
}

/** Directory-watching file source: `topic` is a subdirectory of
  * `root`; files are text lines (one record per line, arrival mtime as
  * the timestamp is unavailable to the file source, so ingest time
  * stands in). Content-hash offset surrogate, see the trait note. */
case class FileLinesSource(root: String, maxFilesPerTrigger: Option[Int] = None)
    extends StreamSource {
  val name = "file"
  def load(spark: SparkSession, topic: String): DataFrame = {
    val r = spark.readStream.format("text")
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n.toString))
    r.load(s"$root/$topic")
      .select(lit(null).cast("binary").as("key"),
        col("value").cast("binary").as("value"),
        lit(topic).as("topic"), lit(0).as("partition"),
        xxhash64(col("value")).as("offset"),
        current_timestamp().as("ts"))
  }
}

/** The real thing, availability-gated: binds Spark's `kafka` format
  * (already the wire schema — the schema IS Kafka's) when the
  * spark-sql-kafka connector is on the classpath. `available` is false
  * in this environment; construction succeeds, `load` throws with a
  * clear message if called without the connector. */
case class KafkaSource(bootstrapServers: String,
                       startingOffsets: String = "latest") extends StreamSource {
  val name = "kafka"
  def load(spark: SparkSession, topic: String): DataFrame = {
    require(KafkaSource.available,
      "spark-sql-kafka connector not on the classpath; use RateSource/" +
        "FileLinesSource locally or add the connector jar")
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets).load()
      .select(col("key"), col("value"), col("topic"), col("partition"),
        col("offset"), col("timestamp").as("ts"))
  }
}

object KafkaSource {
  lazy val available: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }
}
