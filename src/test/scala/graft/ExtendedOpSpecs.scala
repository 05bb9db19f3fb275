package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Round-2 widening: BFS, grouping sets, deterministic arg-min/max,
  * PII scrubbing, repetition metrics, and the SQL function surface.
  */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  test("multi-source BFS takes min hop distance and respects the depth cap") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 3L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 10L).toDF("node")
    val out = GraphOps.bfs(e, seeds, maxDepth = 2)
      .as[(Long, Long)].collect().toMap
    // node 3 is 2 hops from seed 1 but 1 hop from seed 10 → min wins
    assert(out == Map(1L -> 0L, 10L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // node 5 is 3 hops from everything: beyond the cap, absent
    assert(!out.contains(5L))
  }

  test("BFS converges early when the frontier dies") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val out = GraphOps.bfs(e, Seq(1L).toDF("node"), maxDepth = 50)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L))
  }
}

class ExtendedQuerySpecs extends SparkSpec {
  import spark.implicits._

  private def byName(n: String) = SparkEntry.queries(n)

  test("q32 grouping sets covers both single-column slices plus the total") {
    val rows = byName("q32_grouping_sets")(spark, sfDir).collect()
    val stars = rows.count(r => r.getString(0) == "*" && r.getString(1) == "*")
    assert(stars == 1) // exactly one grand-total slot
    assert(rows.count(_.getString(0) != "*") > 0)
    assert(rows.count(_.getString(1) != "*") > 0)
  }

  test("q33 arg-max comparator breaks acctbal ties by custkey") {
    val df = Seq((1, 100L, 50.0), (1, 200L, 50.0), (1, 150L, 10.0))
      .toDF("c_nationkey", "c_custkey", "c_acctbal")
      .withColumn("ord",
        expr("CAST(round(c_acctbal * 100) AS BIGINT) * 100000000 + c_custkey"))
      .groupBy("c_nationkey")
      .agg(max_by(col("c_custkey"), col("ord")).as("richest"),
        min_by(col("c_custkey"), col("ord")).as("poorest"))
    val r = df.head()
    assert(r.getLong(1) == 200L) // tie at 50.0 → larger custkey
    assert(r.getLong(2) == 150L) // unique minimum
  }

  test("t7 scrubs every appended email and phone") {
    val out = byName("t7_pii_scrub")(spark, sfDir)
    assert(out.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).isEmpty)
    assert(out.filter(not(col("scrubbed").contains("<EMAIL> or call <PHONE>"))).isEmpty)
    assert(out.filter(col("scrubbed").rlike("@|555-[0-9]{4}")).isEmpty)
  }

  test("t8 repetition metrics are exact basis points") {
    val out = byName("t8_repetition")(spark, sfDir)
    assert(out.filter(col("ttr_bp") > 10000 || col("top_bp") > 10000).isEmpty)
    assert(out.filter(col("n_distinct") > col("total")).isEmpty)
    assert(out.count() > 0)
  }

  test("s4 SQL-surface kNN returns full top-5 lists per query") {
    val out = byName("s4_knn_sql")(spark, sfDir)
    val perQuery = out.groupBy("query_id").agg(count(lit(1)).as("n"),
      max("rk").as("maxrk")).collect()
    assert(perQuery.nonEmpty)
    assert(perQuery.forall(r => r.getLong(1) == 5L && r.getInt(2) == 5))
  }
}
