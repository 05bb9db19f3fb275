package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-only plan dumper for the optimization rounds: writes
  * `.explain("formatted")` output for the named queries (or all) to
  * `plans/<tag>/<query>_<suffix>.txt`. The judge reads these files to
  * check plan claims against the code; the bench never calls this.
  *
  * Usage: runMain graft.Explain <tag> <suffix> [q1,q2,...]
  *   e.g. runMain graft.Explain r16 before g15_scc,d12_dedup_funnel
  *
  * Note: iterative operators (graph fixpoints) drive their own actions
  * while the plan is CONSTRUCTED, so "the" plan of e.g. g15_scc is the
  * final assembly over checkpointed leaves; the per-round inner plan
  * shape is documented in OPTIMIZATION_r16.md instead.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val tag = args.lift(0).getOrElse("r16")
    val suffix = args.lift(1).getOrElse("before")
    val only = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graftbridge.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get(s"/root/repo/plans/$tag")
    Files.createDirectories(outDir)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    for ((name, fn) <- names) {
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
        println(s"[explain] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
