package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("query inventory matches SURVEY §2 counts") {
    assert(SparkEntry.queries.size == 164)
    // every query carries a DuckDB oracle — no rows-only checks left
    assert(SparkEntry.oracleSql.size == SparkEntry.queries.size)
  }
}

class PlanSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  test("q2 pushes filters and prunes columns at the parquet scan") {
    val plan = executed(SparkEntry.queries("q2_filter_project")(spark, sfDir))
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(p_size,10"), plan.take(2000))
    // projection should not drag p_type/p_size into the output schema scan
    assert(plan.contains("ReadSchema"), plan.take(2000))
  }

  test("q5 star join broadcasts the dimension tables") {
    val plan = executed(SparkEntry.queries("q5_multijoin")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("d5 cosine filter stays in codegen (no interpreted HOF)") {
    val plan = executed(SparkEntry.queries("d5_dedup_embedding")(spark, sfDir))
    assert(plan.contains("vec_dot"), plan.take(3000))
    assert(!plan.contains("aggregate(zip_with"), "interpreted HOF in hot path")
  }
}
