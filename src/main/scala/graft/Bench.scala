package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: times every `SparkEntry.queries` entry at the
  * SF the driver points at and emits ONE machine-readable JSON line.
  *
  * Robustness contract (round-2 hardening):
  *  - each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) and
  *    records the MINIMUM — this host has documented 40-90s
  *    virtualization steal stalls, so an n=1 timing can be 20x off;
  *    min-over-k is the standard way to measure code speed under noise.
  *  - failures are NOT swallowed: a failed query records `-1`, is
  *    listed in `"failures"`, is printed to stderr with its message,
  *    and the process exits nonzero.
  *  - the JSON line goes to stdout AND to a file
  *    (`SPARK_GRAFT_BENCH_OUT`, default `/root/repo/bench_out.json`) —
  *    sbt's `[info]` log decoration corrupted the stdout line for the
  *    round-1 driver parse (`parsed: null`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") // spec: local[32]
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failures = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        val t = try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          None
        }
        finally {
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        }
        t
      }
      if (times.isEmpty) { failures ::= name; name -> -1.0 }
      else name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    val fs = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs_per_query":$runs,"failures":$fs}"""
    println(json)
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
