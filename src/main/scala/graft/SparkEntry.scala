package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every implemented operator has a `queries` entry; SQL-expressible
  * ones also carry a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  /** The driver has shipped events.parquet with `ts` as both int64
    * TIMESTAMP(NANOS) and timestamp[us]; this flag makes the NANOS
    * variant readable (as raw nanos longs) and is harmless for the
    * micros variant — [[Tables.epochSecs]] adapts to whichever type
    * the session actually reads. Runtime-settable, so any session the
    * driver hands us can be fixed up here. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the graft SQL catalog (CREATE/INSERT/MERGE/UPDATE/DELETE +
    // VERSION AS OF over VersionedTable roots) — catalog confs are
    // read lazily at first reference, so a runtime set works; the DML
    // rules themselves need GraftExtensions at session BUILD time
    // (Verify/Bench/tests all pass spark.sql.extensions)
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty)
      spark.conf.set("spark.sql.catalog.graft",
        classOf[org.apache.spark.sql.graftbridge.GraftCatalog].getName)
    org.apache.spark.sql.graftbridge.GraftFunctions.install(spark)
    org.apache.spark.sql.graftbridge.GraftTableFunctions.install(spark)
    spark
  }

  private val allQueries: Seq[Q] =
    queries_relational ++ queries_graph ++ queries_pipeline

  private def queries_relational = graft.queries.Relational.all
  private def queries_graph = graft.queries.GraphQueries.all
  private def queries_pipeline = graft.queries.PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val q5 = allQueries.find(_.name == "q5_multijoin").get
    q5.run(configure(spark), "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name ->
      ((s: SparkSession, dir: String) => q.run(configure(s), dir))).toMap

  /** Equivalent ANSI SQL runnable by DuckDB on the same parquet
    * tables; queries without an entry get the driver's rows-only check. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
