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

  test("query inventory matches SURVEY §2 checklist") {
    // Derive the inventory from SURVEY.md §2 instead of a hand-pinned
    // count (which went stale in round 5): every `queries` key must be
    // declared `[x]` in §2, and every §2 name shaped like a query key
    // must exist in `queries` — additions and removals on either side
    // fail loudly here.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val s2 = survey.split("\n## ").find(_.startsWith("§2")).get
    val declared = "(?m)^- \\[x\\] `([A-Za-z0-9_]+)`".r
      .findAllMatchIn(s2).map(_.group(1)).toSet
    val keys = SparkEntry.queries.keySet
    val undeclared = keys -- declared
    assert(undeclared.isEmpty, s"queries missing from SURVEY §2: $undeclared")
    val queryShaped = declared.filter(_.matches("(q|g|d|s|c|p|t|m|smp|prof)\\d.*"))
    val phantom = queryShaped -- keys
    assert(phantom.isEmpty, s"SURVEY §2 declares non-existent queries: $phantom")
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

  test("d18 span dedup: no cartesian/pair join anywhere in the plan") {
    val plan = executed(SparkEntry.queries("d18_span_dedup")(spark, sfDir))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("d18 gram exchange is digest-keyed: xxhash64 in the plan, never raw gram text") {
    val plan = executed(SparkEntry.queries("d18_span_dedup")(spark, sfDir))
    assert(plan.contains("xxhash64"), plan.take(3000))
  }

  test("s12 probes standing centroids by broadcast; no data-sized nested loop") {
    val plan = executed(SparkEntry.queries("s12_knn_incremental")(spark, sfDir))
    assert(plan.contains("BroadcastExchange"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("s5/s13 flat candidate cut is a bounded-state aggregate, never a full-corpus per-query window") {
    for (q <- Seq("s5_knn_pq", "s13_knn_sq")) {
      val plan = executed(SparkEntry.queries(q)(spark, sfDir))
      // the cut rides TopKAgg (ObjectHashAggregate, map-side partials)
      assert(plan.contains("ObjectHashAggregate"), s"$q: ${plan.take(2000)}")
      // exactly ONE window remains: the final rerank over ≤ rerank·k
      // candidates per query — the full-corpus ark window is gone
      val nWindows = plan.split("\\bWindow \\[").length - 1
      assert(nWindows == 1, s"$q: expected 1 bounded window, got $nWindows")
    }
  }

  test("round-9 additions: no cartesian/data-sized nested loop anywhere") {
    // s8b/s8c bucket-join their candidates; d21/t22/prof5/c9 are
    // aggregate/join pipelines — none may degrade to a cartesian or a
    // data-sized nested loop (the broadcast of a 1-row M2/totals frame
    // is the only nested-loop-shaped node allowed)
    for (q <- Seq("s8b_knn_mips_lsh", "s8c_knn_mips_multiprobe",
        "d21_url_dedup", "t22_rake_keywords", "prof5_drift", "c9_extract")) {
      val plan = executed(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(2000)}")
    }
  }

  test("t22 windows are per-document only; top phrase rides groupBy-max join-back") {
    val plan = executed(SparkEntry.queries("t22_rake_keywords")(spark, sfDir))
    // the per-doc segmentation window lives behind the materialized
    // phrase cut (0 visible) — the top-phrase stage must NOT add a
    // window over all phrases, and nothing may re-expand segmentation
    // per branch (this plan carried TEN window nodes pre-cut)
    val nWindows = plan.split("\\bWindow \\[").length - 1
    assert(nWindows <= 1, s"expected at most the per-doc segmentation window, got $nWindows")
  }

  test("d19/s11 pair generation is bucket-equi-joined, never nested-loop") {
    for (q <- Seq("d19_semdedup", "s11_knn_graph")) {
      val plan = executed(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(2000)}")
      // the only nested-loop allowed is the broadcast of the 16-row
      // centroid table (d19's assign stage); data-sized sides never
      assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin")
        || plan.contains("ShuffledHashJoin"), s"$q: ${plan.take(2000)}")
    }
  }
}
