package graft

import org.apache.spark.sql.SparkSession

/** Dev-only smoke probe: can Spark 4.1 read every test table (notably
  * events.parquet with nanosecond timestamps)? */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("events", "documents", "embeddings").foreach { t =>
      val df = Tables.load(spark, dir, t)
      println(s"== $t rows=${df.count()}")
      df.printSchema()
      df.show(2, 60)
    }
    spark.stop()
  }
}
