package graft

import org.apache.spark.sql.functions._

/** Round-4 additions: cohort retention, moving-window anomaly flag,
  * skyline sweep. Each checked against an independent in-test
  * re-derivation (not the DuckDB oracle, which the driver runs
  * separately).
  */
class CohortRetentionSpec extends SparkSpec {

  test("cohort cells count distinct users, weeks_since from first activity") {
    val out = SparkEntry.queries("q49_cohort_retention")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // re-derive naively from the raw table
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000000000 div 604800").as("wk"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cohort = ev.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).min }
    val expected = ev.map { case (u, w) => (cohort(u), w - cohort(u), u) }
      .distinct.groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.size.toLong }
    assert(out == expected)
    // week 0 of every cohort contains the whole cohort by definition
    val sizes = cohort.groupBy(_._2).map { case (w, m) => w -> m.size.toLong }
    sizes.foreach { case (w, n) => assert(out((w, 0L)) == n) }
  }
}

class MovingWindowAnomalySpec extends SparkSpec {

  test("RANGE frame shrinks across calendar gaps; spike test is integral") {
    val rows = SparkEntry.queries("q50_moving_window_anomaly")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.values.foreach { rs =>
      val days = rs.map(_._2)
      rs.foreach { case (_, day, cnt, winSum, winN, hot) =>
        val inWin = rs.filter(r => r._2 >= day - 6 && r._2 <= day)
        assert(winN == inWin.length, s"win_n at day $day")
        assert(winSum == inWin.map(_._3).sum, s"win_sum at day $day")
        assert(hot == (if (cnt * winN > 2 * winSum) 1 else 0))
      }
      assert(days.distinct.length == days.length)
    }
  }
}

class SkylineSpec extends SparkSpec {

  test("sweep output equals the quadratic Pareto definition") {
    val out = SparkEntry.queries("q51_skyline")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000 && col("o_orderpriority") === "1-URGENT")
      .select(
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = cand.filter { case (d1, c1) =>
      !cand.exists { case (d2, c2) =>
        d2 >= d1 && c2 >= c1 && (d2 > d1 || c2 > c1)
      }
    }
    assert(out == expected)
    assert(out.nonEmpty)
    // skyline is an antichain: strictly increasing price as day falls
    val sorted = out.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, c1), (_, c2)) => assert(c1 > c2)
      case _ =>
    }
  }
}
