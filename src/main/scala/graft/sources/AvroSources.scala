package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro Object Container File source/sink built directly on the PUBLIC
  * `org.apache.avro` library (on Spark's runtime classpath; the
  * separate spark-avro datasource module is not, so this speaks the
  * wire format itself — same files, interchangeable with any Avro
  * tooling).
  *
  * Scale shape mirrors the parquet sinks: [[write]] emits one `.avro`
  * container per partition from the executors (no driver funnel), and
  * [[read]] parallelizes over container files — OCF blocks are
  * per-file sequential (Avro's unit of parallelism IS the file, the
  * standard layout for Avro-based ingest).
  *
  * Type surface: the flat exchange subset — long/int/double/float/
  * boolean/string/binary and arrays of them, nullable via
  * `union(null, T)` — enough for every driver table; nested structs
  * belong to parquet.
  */
object AvroSources {

  /** Spark → Avro schema (nullable fields become union(null, T)). */
  def avroSchema(st: StructType, name: String = "graft_record"): Schema = {
    val fields = st.fields.map { f =>
      val base = avroType(f.dataType, f.name)
      val t = if (f.nullable) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), base)) else base
      new Schema.Field(f.name, t, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def avroType(dt: DataType, fname: String): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case ArrayType(e, containsNull) =>
      val el = avroType(e, fname)
      Schema.createArray(if (containsNull) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), el)) else el)
    case other => throw new IllegalArgumentException(
      s"column $fname: $other is outside the Avro exchange subset")
  }

  /** Avro → Spark schema (unions with null unwrap to nullable). */
  def sparkSchema(s: Schema): StructType =
    StructType(s.getFields.asScala.map { f =>
      val (t, nullable) = unwrap(f.schema())
      StructField(f.name(), sparkType(t), nullable)
    }.toArray)

  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only union(null, T) supported: $s")
      (nonNull.head, nonNull.size < s.getTypes.size())
    } else (s, false)

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.LONG => LongType
    case Schema.Type.INT => IntegerType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.ARRAY =>
      val (el, n) = unwrap(s.getElementType)
      ArrayType(sparkType(el), containsNull = n)
    case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
  }

  /** Write `df` as one Avro container file per partition under `path`
    * (`part-NNNNN.avro`), executor-side — the parquet sink layout in
    * Avro clothing. */
  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = avroSchema(df.schema).toString
    val sparkSt = df.schema
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val conf = new org.apache.hadoop.conf.Configuration()
      val p = new Path(path, f"part-$idx%05d.avro")
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, out)
      try rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < sparkSt.length) {
          rec.put(i, toAvro(row.get(i), sparkSt(i).dataType))
          i += 1
        }
        w.append(rec)
      } finally w.close()
      Iterator.single(1)
    }.count()
    ()
  }

  private def toAvro(v: Any, dt: DataType): AnyRef = (v, dt) match {
    case (null, _) => null
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (s: scala.collection.Seq[_], ArrayType(et, _)) =>
      s.map(x => toAvro(x, et)).asJava
    case (x, _) => x.asInstanceOf[AnyRef]
  }

  /** Read every `.avro` container under `path` (or a single file).
    * `permissive = true` is the PERMISSIVE corrupt-record posture for
    * a CONTAINER: a file whose header/blocks are corrupt yields the
    * rows decoded before the corruption and is otherwise skipped;
    * strict mode (default) propagates the failure. One Spark partition
    * per container file. */
  def read(spark: SparkSession, path: String, permissive: Boolean = false): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq else Seq(fs.getFileStatus(p)))
        .map(_.getPath).filter(_.getName.endsWith(".avro")).map(_.toString).sorted
    require(files.nonEmpty, s"no .avro files under $path")
    // schema from the first container's header (one small driver read)
    val headerSchema = {
      val in = new FsInput(new Path(files.head), conf)
      val r = new DataFileReader(in, new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    }
    val st = sparkSchema(headerSchema)
    val schemaJson = headerSchema.toString
    val strict = !permissive
    val rows = spark.sparkContext.parallelize(files, files.size).flatMap { f =>
      val schema = new Schema.Parser().parse(schemaJson)
      val cfg = new org.apache.hadoop.conf.Configuration()
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      try {
        val rd = new DataFileReader(new FsInput(new Path(f), cfg),
          new GenericDatumReader[GenericRecord](schema))
        try while (rd.hasNext) {
          val rec = rd.next()
          out += Row.fromSeq(st.fields.indices.map(i => fromAvro(rec.get(i), st(i).dataType)))
        } finally rd.close()
      } catch {
        case e: Throwable if !strict => () // keep rows decoded so far
      }
      out
    }
    spark.createDataFrame(rows, st)
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      l.asScala.map(x => fromAvro(x, et)).toSeq
    case (x, _) => x
  }
}
