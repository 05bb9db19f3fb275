package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}
import graft.operators.Quantiles

/** Relational / OLAP core: SURVEY.md §2 q1–q28.
  *
  * Every query is a declarative DataFrame plan — Catalyst handles
  * pushdown / pruning / join selection; small dimension tables are
  * explicitly `broadcast()`ed so the star joins never shuffle the fact
  * table on a dim key. Numeric output conventions (rounding, BIGINT
  * casts, epoch-second timestamps) are documented on [[graft.Q]].
  */
object Relational {

  /** events with `t` = floor(epoch seconds); schema-adaptive — see
    * [[Tables.epochSecs]] (the testdata has shipped `ts` as both int64
    * nanos and timestamp[us]). */
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.eventsWithEpoch(s, d)

  /** DuckDB mirror of `ev`: `epoch_ns` is exact for both int64-nanos
    * and TIMESTAMP physical types; `//` floor-divides like the Spark
    * side. */
  private val evSql =
    "SELECT *, epoch_ns(ts)//1000000000 AS t FROM events"

  val all: Seq[Q] = Seq(

    Q("q1_agg",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(expr("l_extendedprice*(1-l_discount)")), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |round(sum(l_quantity),2) AS sum_qty,
             |round(sum(l_extendedprice),2) AS sum_base,
             |round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
             |round(avg(l_quantity),4) AS avg_qty,
             |CAST(count(*) AS BIGINT) AS cnt
             |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    Q("q1b_agg_cents",
      // q1's pricing summary in EXACT INTEGER cents (round 7) — the
      // formulation that stays bit-identical at ANY scale: the 100×
      // sweep showed q1's double SUMs drift in the last rounded cent
      // at 60M addends (order-of-accumulation), the known limit of
      // float aggregation; per-row integer quantization before the
      // sum removes the float entirely (q70's revenue pattern).
      // disc_price sums price_cents × (100−disc_pct) — exact ×10⁴
      // units; avg as integer basis points of a unit.
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(expr("CAST(round(l_quantity*100) AS BIGINT)")).as("sum_qty_x100"),
          sum(expr("CAST(round(l_extendedprice*100) AS BIGINT)")).as("sum_base_cents"),
          sum(expr("CAST(round(l_extendedprice*100) AS BIGINT) * CAST(round((1-l_discount)*100) AS BIGINT)"))
            .as("sum_disc_x10000"),
          count(lit(1)).as("cnt"))
        .withColumn("avg_qty_bp", expr("sum_qty_x100 * 100 div cnt"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_x100,
             |CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             |CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
             |  * CAST(round((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_x10000,
             |CAST(count(*) AS BIGINT) AS cnt,
             |CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) * 100
             |  // CAST(count(*) AS BIGINT) AS avg_qty_bp
             |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    Q("q2_filter_project",
      (s, d) => Tables.part(s, d)
        .filter(col("p_size").between(10, 20) && col("p_type").isin("SMALL", "PROMO"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_retailprice"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_brand, p_retailprice FROM part
             |WHERE p_size BETWEEN 10 AND 20 AND p_type IN ('SMALL','PROMO')
             |ORDER BY p_partkey""".stripMargin)),

    Q("q3_join_agg",
      (s, d) => Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(round(sum(expr("l_extendedprice*(1-l_discount)")), 2).as("revenue"))
        .orderBy(desc("revenue"), asc("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
             |FROM customer JOIN orders ON c_custkey=o_custkey
             |JOIN lineitem ON o_orderkey=l_orderkey
             |WHERE c_mktsegment='BUILDING'
             |GROUP BY 1 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    Q("q4_semijoin",
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") > 45),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |  WHERE l_orderkey=o_orderkey AND l_quantity > 45)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q5_multijoin",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1999-01-01"),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(expr("l_extendedprice*(1-l_discount)")), 2).as("revenue"))
        .orderBy("n_name"),
      Some("""SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
             |FROM customer JOIN orders ON c_custkey=o_custkey
             |JOIN lineitem ON o_orderkey=l_orderkey
             |JOIN supplier ON l_suppkey=s_suppkey AND s_nationkey=c_nationkey
             |JOIN nation ON c_nationkey=n_nationkey
             |JOIN region ON n_regionkey=r_regionkey
             |WHERE r_name='ASIA' AND o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1999-01-01'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q6_scan_agg",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01"
          && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(expr("l_extendedprice*l_discount")), 2).as("revenue")),
      Some("""SELECT round(sum(l_extendedprice*l_discount),2) AS revenue FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    Q("q7_antijoin",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderdate") >= "2001-01-01"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("c_nationkey"),
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
             |CAST(count(*) AS BIGINT) AS cnt FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey
             |  AND o_orderdate >= TIMESTAMP '2001-01-01')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q8_distinct_agg",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             |CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
             |CAST(count(*) AS BIGINT) AS cnt
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q8b_approx_distinct",
      // The 100-TB tier of q8: HyperLogLog++ instead of exact
      // distinct (no per-key state, one pass, mergeable sketches).
      // Engines' sketches differ by construction, so the oracle
      // cannot match the estimate itself; instead the query emits the
      // exact count AND whether the estimate landed within the
      // documented ε (rsd 2% → assert |apx−exact| ≤ 5%·exact). The
      // oracle supplies the exact counts and expects the bound to
      // hold everywhere — an estimate drifting out of tolerance fails
      // the hash compare.
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct("l_partkey", 0.02).as("apx"),
          countDistinct("l_partkey").as("n_exact"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("apx") - col("n_exact")) <= col("n_exact") * 0.05).as("within_eps"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
             |true AS within_eps
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q35_ntile_lag",
      // window-navigation coverage: ntile bucketing + lag/lead offsets
      // in one pass over the per-customer order history
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
        Tables.orders(s, d).filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            ntile(4).over(w).as("quartile"),
            round(col("o_totalprice") - coalesce(lag("o_totalprice", 1).over(w), lit(0.0)), 2)
              .as("delta_prev"),
            coalesce(lead("o_orderkey", 1).over(w), lit(-1L)).as("next_key"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |CAST(ntile(4) OVER w AS INT) AS quartile,
             |round(o_totalprice - coalesce(lag(o_totalprice, 1) OVER w, 0.0), 2) AS delta_prev,
             |coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_key
             |FROM orders WHERE o_custkey < 100
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    Q("q9_window_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
        val wp = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
        Tables.orders(s, d).filter(col("o_custkey") < 50)
          .select(col("o_custkey"), col("o_orderkey"),
            row_number().over(w).as("rn"),
            rank().over(wp).as("price_rank"),
            round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
              .as("run_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS rn,
             |CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_rank,
             |round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run_total
             |FROM orders WHERE o_custkey < 50
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    Q("q10_topk_pergroup",
      (s, d) => {
        val w = Window.partitionBy("p_brand").orderBy(desc("p_retailprice"), asc("p_partkey"))
        Tables.part(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("p_brand", "rk", "p_partkey", "p_retailprice")
          .orderBy("p_brand", "rk")
      },
      Some("""SELECT p_brand, CAST(rk AS INT) AS rk, p_partkey, p_retailprice FROM (
             |  SELECT p_brand, p_partkey, p_retailprice,
             |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
             |  FROM part) WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin)),

    Q("q11_rollup",
      (s, d) => {
        // DataFrame rollup + orderBy on the grouping column trips the
        // ambiguous-self-join check (the Expand duplicates the
        // attribute), so route this one through the SQL front end.
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .select("n_name", "c_acctbal")
          .createOrReplaceTempView("q11_base")
        s.sql("""SELECT n_name, round(sum(c_acctbal),2) AS sum_bal,
                |count(*) AS cnt FROM q11_base
                |GROUP BY ROLLUP(n_name) ORDER BY n_name ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT n_name, round(sum(c_acctbal),2) AS sum_bal,
             |CAST(count(*) AS BIGINT) AS cnt
             |FROM customer JOIN nation ON c_nationkey=n_nationkey
             |GROUP BY ROLLUP(n_name) ORDER BY n_name NULLS FIRST""".stripMargin)),

    Q("q12_case_agg",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_totalprice") > 300000, 1L).otherwise(0L)).as("n_high"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             |CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
             |CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q13_scalar_subquery",
      (s, d) => {
        val c = Tables.customer(s, d)
        c.join(broadcast(c.agg(avg("c_acctbal").as("avg_bal"))))
          .filter(col("c_acctbal") > col("avg_bal") * 1.8)
          .select("c_custkey", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) * 1.8
             |ORDER BY c_custkey""".stripMargin)),

    Q("q14_union_all",
      (s, d) => Tables.orders(s, d).filter(col("o_totalprice") > 480000)
        .select(lit("order").as("kind"), col("o_totalprice").as("amount"))
        .unionAll(Tables.lineitem(s, d).filter(col("l_extendedprice") > 100000)
          .select(lit("line").as("kind"), col("l_extendedprice").as("amount")))
        .groupBy("kind")
        .agg(count(lit(1)).as("cnt"), round(sum("amount"), 2).as("total"))
        .orderBy("kind"),
      Some("""SELECT kind, CAST(count(*) AS BIGINT) AS cnt, round(sum(amount),2) AS total
             |FROM (
             |  SELECT 'order' AS kind, o_totalprice AS amount FROM orders WHERE o_totalprice > 480000
             |  UNION ALL
             |  SELECT 'line' AS kind, l_extendedprice AS amount FROM lineitem WHERE l_extendedprice > 100000
             |) GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q15_having",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_suppkey")
        .agg(round(sum("l_quantity"), 2).as("total_qty"))
        .filter(col("total_qty") > 500)
        .orderBy("l_suppkey"),
      Some("""SELECT l_suppkey, round(sum(l_quantity),2) AS total_qty FROM lineitem
             |GROUP BY 1 HAVING round(sum(l_quantity),2) > 500 ORDER BY 1""".stripMargin)),

    Q("q16_sort_limit",
      (s, d) => Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(20),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    Q("q17_correlated_exists",
      (s, d) => {
        val c = Tables.customer(s, d)
        val natAvg = c.groupBy("c_nationkey").agg(avg("c_acctbal").as("nat_avg"))
        c.join(broadcast(natAvg), Seq("c_nationkey"))
          .filter(col("c_acctbal") > col("nat_avg") * 1.9)
          .select("c_custkey", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer c1
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
             |  WHERE c2.c_nationkey = c1.c_nationkey) * 1.9
             |ORDER BY c_custkey""".stripMargin)),

    Q("q18_pivot",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum("o_totalprice"), 2))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |round(sum(CASE WHEN o_orderstatus='F' THEN o_totalprice END),2) AS "F",
             |round(sum(CASE WHEN o_orderstatus='O' THEN o_totalprice END),2) AS "O",
             |round(sum(CASE WHEN o_orderstatus='P' THEN o_totalprice END),2) AS "P"
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q19_json",
      (s, d) => Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .orderBy("k_bucket"),
      Some("""SELECT CAST(json_extract_string(props,'$.k') AS BIGINT) % 10 AS k_bucket,
             |CAST(count(*) AS BIGINT) AS cnt, round(sum(value),2) AS sum_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q20_datetime",
      (s, d) => Tables.orders(s, d)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("month"),
      Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             |CAST(count(*) AS BIGINT) AS cnt, round(sum(o_totalprice),2) AS total
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q21_string_funcs",
      (s, d) => Tables.customer(s, d)
        .filter(col("c_name").like("%5%"))
        .select(col("c_custkey"),
          upper(substring(col("c_name"), 1, 10)).as("uname"),
          concat(col("c_mktsegment"), lit("-"), col("c_nationkey").cast("string")).as("seg_nat"),
          length(col("c_name")).cast("long").as("name_len"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, upper(substr(c_name,1,10)) AS uname,
             |c_mktsegment || '-' || CAST(c_nationkey AS VARCHAR) AS seg_nat,
             |CAST(length(c_name) AS BIGINT) AS name_len
             |FROM customer WHERE c_name LIKE '%5%' ORDER BY c_custkey""".stripMargin)),

    Q("q22_percentile",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |round(quantile_cont(l_extendedprice, 0.5),4) AS p50,
             |round(quantile_cont(l_extendedprice, 0.9),4) AS p90,
             |round(quantile_cont(l_extendedprice, 0.99),4) AS p99
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q22b_approx_percentile",
      // The 100-TB tier of q22: GK-sketch approximate percentiles
      // (bounded memory, mergeable) instead of exact. The estimate is
      // sketch-specific, so the oracle checks a rank-error bound
      // instead of the value: approx p50 must land between the exact
      // p45 and p55 (rank ε = 0.05 ≫ the sketch's configured 1/1000).
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("apx"),
          expr("percentile(l_extendedprice, 0.45)").as("lo"),
          expr("percentile(l_extendedprice, 0.55)").as("hi"))
        .select(col("l_returnflag"),
          (col("apx") >= col("lo") && col("apx") <= col("hi")).as("within_rank_eps"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, true AS within_rank_eps
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q23_windowed_time_agg",
      (s, d) => ev(s, d)
        .groupBy(window(timestamp_seconds(col("t")), "1 hour"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("hour_t"), col("cnt"), col("sum_value"))
        .orderBy("hour_t"),
      Some(s"""SELECT t - t % 3600 AS hour_t, CAST(count(*) AS BIGINT) AS cnt,
              |round(sum(value),2) AS sum_value
              |FROM ($evSql) GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q24_sessionize",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("t", "event_id")
        ev(s, d)
          .withColumn("pt", lag("t", 1).over(w))
          .withColumn("brk", when(col("pt").isNull || col("t") - col("pt") > 1800, 1L).otherwise(0L))
          .withColumn("sid", sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sid")
          .agg(count(lit(1)).as("n_events"), (max("t") - min("t")).as("duration_s"))
          .orderBy("user_id", "sid")
      },
      Some(s"""WITH e AS ($evSql),
              |l AS (SELECT user_id, event_id, t,
              |  lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS pt FROM e),
              |b AS (SELECT *, CASE WHEN pt IS NULL OR t - pt > 1800 THEN 1 ELSE 0 END AS brk FROM l),
              |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM b)
              |SELECT user_id, CAST(sid AS BIGINT) AS sid, CAST(count(*) AS BIGINT) AS n_events,
              |CAST(max(t)-min(t) AS BIGINT) AS duration_s
              |FROM g GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    Q("q25_asof_join",
      (s, d) => {
        val e = ev(s, d)
        graft.operators.AsofJoin(
          left = e.filter(col("event_type") === "purchase")
            .select("event_id", "user_id", "t"),
          right = e.filter(col("event_type") === "signup")
            .select(col("user_id"), col("t").as("rt"), col("event_id").as("signup_id")),
          key = "user_id", leftTime = "t", rightTime = "rt")
          .select("event_id", "user_id", "signup_id")
          .orderBy("event_id")
      },
      Some(s"""WITH e AS ($evSql)
              |SELECT p.event_id, p.user_id,
              |  (SELECT s.event_id FROM e s
              |   WHERE s.event_type='signup' AND s.user_id=p.user_id AND s.t <= p.t
              |   ORDER BY s.t DESC, s.event_id DESC LIMIT 1) AS signup_id
              |FROM e p WHERE p.event_type='purchase' ORDER BY p.event_id""".stripMargin)),

    Q("q74_asof_nearest",
      // Nearest-either-direction as-of (round 10) — completes the
      // merge_asof family (q25 backward, q53 forward+tolerance):
      // min |Δt|, exact cross-side ties resolve BACKWARD (the
      // causally safe, already-observed row), same-time ties to the
      // greatest payload. One exchange, two in-partition window
      // sorts, per-row choose (AsofJoin.nearest).
      (s, d) => {
        val e = ev(s, d)
        graft.operators.AsofJoin.nearest(
          left = e.filter(col("event_type") === "purchase")
            .select("event_id", "user_id", "t"),
          right = e.filter(col("event_type") === "signup")
            .select(col("user_id"), col("t").as("rt"), col("event_id").as("signup_id")),
          key = "user_id", leftTime = "t", rightTime = "rt")
          .select("event_id", "user_id", "signup_id", "asof_gap")
          .orderBy("event_id")
      },
      Some(s"""WITH e AS ($evSql)
              |SELECT p.event_id, p.user_id,
              |  (SELECT s.event_id FROM e s
              |   WHERE s.event_type='signup' AND s.user_id=p.user_id
              |   ORDER BY abs(s.t - p.t),
              |     CASE WHEN s.t <= p.t THEN 0 ELSE 1 END, s.event_id DESC
              |   LIMIT 1) AS signup_id,
              |  (SELECT CAST(abs(s.t - p.t) AS BIGINT) FROM e s
              |   WHERE s.event_type='signup' AND s.user_id=p.user_id
              |   ORDER BY abs(s.t - p.t),
              |     CASE WHEN s.t <= p.t THEN 0 ELSE 1 END, s.event_id DESC
              |   LIMIT 1) AS asof_gap
              |FROM e p WHERE p.event_type='purchase' ORDER BY p.event_id""".stripMargin)),

    Q("q26_range_join",
      (s, d) => graft.operators.RangeJoin.joinPointInRange(
        left = Tables.events(s, d)
          .select(col("event_type"), (col("value") * 50).as("lo"), (col("value") * 50 + 100).as("hi")),
        right = Tables.orders(s, d).select(col("o_totalprice").as("p")),
        lo = "lo", hi = "hi", point = "p", bucketWidth = 1000.0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), round(sum("p"), 2).as("sum_price"))
        .orderBy("event_type"),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
             |round(sum(o_totalprice),2) AS sum_price
             |FROM events JOIN orders
             |  ON o_totalprice BETWEEN value*50 AND value*50+100
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q27_cube",
      (s, d) => Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
             |round(sum(o_totalprice),2) AS total
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    Q("q28_funnel",
      (s, d) => {
        val e = ev(s, d)
        val sgn = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("t").as("signup_t"))
        val clk = e.filter(col("event_type") === "click")
          .join(sgn, Seq("user_id")).filter(col("t") > col("signup_t"))
          .groupBy("user_id").agg(min("t").as("click_t"), min("signup_t").as("signup_t"))
        val pur = e.filter(col("event_type") === "purchase")
          .join(clk, Seq("user_id")).filter(col("t") > col("click_t"))
          .groupBy("user_id").agg(min("t").as("purchase_t"),
            min("signup_t").as("signup_t"), min("click_t").as("click_t"))
        pur.select("user_id", "signup_t", "click_t", "purchase_t").orderBy("user_id")
      },
      Some(s"""WITH e AS ($evSql),
              |sgn AS (SELECT user_id, min(t) AS signup_t FROM e WHERE event_type='signup' GROUP BY 1),
              |clk AS (SELECT e.user_id, min(e.t) AS click_t, min(sgn.signup_t) AS signup_t
              |  FROM e JOIN sgn ON e.user_id=sgn.user_id
              |  WHERE e.event_type='click' AND e.t > sgn.signup_t GROUP BY 1),
              |pur AS (SELECT e.user_id, min(e.t) AS purchase_t, min(clk.signup_t) AS signup_t,
              |  min(clk.click_t) AS click_t
              |  FROM e JOIN clk ON e.user_id=clk.user_id
              |  WHERE e.event_type='purchase' AND e.t > clk.click_t GROUP BY 1)
              |SELECT user_id, signup_t, click_t, purchase_t FROM pur ORDER BY user_id""".stripMargin)),

    Q("q29_setops",
      // INTERSECT / EXCEPT: customer retention between consecutive
      // years. Spark plans both as joins over the distinct key sets —
      // one shuffle each on o_custkey, no materialized intermediate.
      (s, d) => {
        val o = Tables.orders(s, d)
        def yr(y: Int) = o
          .filter(col("o_orderdate") >= s"$y-01-01" && col("o_orderdate") < s"${y + 1}-01-01")
          .select("o_custkey")
        yr(1995).intersect(yr(1996)).withColumn("status", lit("retained"))
          .union(yr(1995).except(yr(1996)).withColumn("status", lit("churned")))
          .orderBy("o_custkey")
      },
      Some("""WITH y95 AS (SELECT o_custkey FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
             |y96 AS (SELECT o_custkey FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
             |SELECT o_custkey, 'retained' AS status
             |FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
             |UNION ALL
             |SELECT o_custkey, 'churned' AS status
             |FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
             |ORDER BY o_custkey""".stripMargin)),

    Q("q30_salted_join",
      // Skew-hardening pattern, exercised end-to-end: salt the fact
      // side S ways (deterministic l_linenumber % S — any uniform
      // per-row value works), replicate the broadcast dim side S ways,
      // partially aggregate per (key, salt), then merge. A hot supplier
      // key spreads over S reducers instead of one; the oracle is the
      // plain unsalted join, proving salting never changes results.
      (s, d) => {
        val S = 8
        val li = Tables.lineitem(s, d)
          .withColumn("salt", (col("l_linenumber") % S).cast("int"))
        val sup = Tables.supplier(s, d).select("s_suppkey", "s_name")
          .withColumn("s_salt", explode(expr(s"sequence(0, ${S - 1})")))
        // revenue in exact integer units (price cents × discount
        // percent points): the two-level salted sum is then bit-equal
        // to ANY summation order on ANY engine — float partial sums
        // wobble in the last bit exactly when salting reorders them
        li.join(broadcast(sup),
            col("l_suppkey") === col("s_suppkey") && col("salt") === col("s_salt"))
          .groupBy("s_suppkey", "s_name", "salt")
          .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT) * " +
            "(100 - CAST(round(l_discount * 100) AS BIGINT))")).as("rev_units"),
            count(lit(1)).as("n"))
          .groupBy("s_suppkey", "s_name")
          .agg(round(sum("rev_units") / 10000.0, 2).as("revenue"), sum("n").as("n_items"))
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name,
             |round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
             |  (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0, 2)
             |  AS revenue,
             |CAST(count(*) AS BIGINT) AS n_items
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    Q("q31_range_frame",
      // Value-based (RANGE) window frame: per customer, revenue of all
      // orders within the trailing 30 days of each order — peers at
      // the same day all see the same frame (vs ROWS frames, q9/q24).
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("days")
          .rangeBetween(-30, Window.currentRow)
        Tables.orders(s, d)
          .withColumn("days", datediff(col("o_orderdate"), lit("1995-01-01")))
          .withColumn("trailing_30d", round(sum("o_totalprice").over(w), 2))
          .select(col("o_orderkey"), col("o_custkey"), col("trailing_30d"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |round(sum(o_totalprice) OVER (
             |  PARTITION BY o_custkey
             |  ORDER BY datediff('day', TIMESTAMP '1995-01-01', o_orderdate)
             |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS trailing_30d
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("q32_grouping_sets",
      // GROUPING SETS — the general form behind rollup (q11) and cube
      // (q27): two independent single-column groupings plus the grand
      // total in one pass. Flags never being NULL makes the '*'
      // coalesce a safe slot marker on both engines.
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
        s.sql("""SELECT coalesce(l_returnflag, '*') AS rf,
                |  coalesce(l_linestatus, '*') AS ls,
                |  count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
                |FROM lineitem_gs
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                |ORDER BY rf, ls""".stripMargin)
      },
      Some("""SELECT coalesce(l_returnflag, '*') AS rf,
             |  coalesce(l_linestatus, '*') AS ls,
             |  CAST(count(*) AS BIGINT) AS cnt, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY rf, ls""".stripMargin)),

    Q("q33_argminmax",
      // arg-max/arg-min per group with a deterministic comparator:
      // (acctbal, custkey) packed into one exact integer (cents ×
      // 10^8 + key) — ties on acctbal resolve to the larger/smaller
      // custkey on both engines (bare max_by/arg_max leave ties
      // engine-defined, and DuckDB arg_max takes no composite key).
      (s, d) => Tables.customer(s, d)
        .withColumn("ord",
          expr("CAST(round(c_acctbal * 100) AS BIGINT) * 100000000 + c_custkey"))
        .groupBy("c_nationkey")
        .agg(
          max_by(col("c_custkey"), col("ord")).as("richest"),
          min_by(col("c_custkey"), col("ord")).as("poorest"),
          round(max("c_acctbal"), 2).as("max_bal"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey,
             |  arg_max(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) * 100000000 + c_custkey) AS richest,
             |  arg_min(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) * 100000000 + c_custkey) AS poorest,
             |  round(max(c_acctbal), 2) AS max_bal
             |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q34_array_ops",
      // array-function pipeline (split → filter → distinct → sort →
      // slice → join) kept fully inside whole-stage codegen — the
      // per-document token vocabulary fingerprint.
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          expr("array_join(slice(array_sort(array_distinct(" +
            "filter(split(text, ' '), x -> x <> ''))), 1, 5), ' ')").as("first5"),
          expr("size(array_distinct(filter(split(text, ' '), x -> x <> '')))")
            .as("n_distinct"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  array_to_string(list_sort(list_distinct(
             |    list_filter(string_split(text, ' '), x -> x <> '')))[1:5], ' ') AS first5,
             |  CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS INT)
             |    AS n_distinct
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("q36_multi_distinct",
      // Several COUNT(DISTINCT) over different columns in one
      // aggregate — Catalyst plans this with Expand (one stream per
      // distinct column) feeding a shared hash aggregate; the shuffle
      // carries (group, expand-tag, value) partials, never raw rows
      // twice.
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part,
             |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_supp,
             |  CAST(count(*) AS BIGINT) AS cnt
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q37_unpivot",
      // Wide→long reshaping via Dataset.unpivot (Spark's UNPIVOT) —
      // narrow (each row expands in place, no shuffle before the
      // output sort).
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          round(col("p_retailprice"), 2).as("retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
          "metric", "value")
        .orderBy("p_partkey", "metric"),
      Some("""SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
             |FROM part
             |UNION ALL
             |SELECT p_partkey, 'retailprice' AS metric, round(p_retailprice, 2) AS value
             |FROM part
             |ORDER BY p_partkey, metric""".stripMargin)),

    Q("q38_zorder",
      // Morton (z-order) curve key over two filter dimensions — the
      // layout primitive behind Sinks.writeZordered (two-dimensional
      // file/row-group clustering). Key arithmetic is pure codegen'd
      // integer ops; the oracle evaluates the same interleave in
      // div/mod form.
      (s, d) => {
        val keyed = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_partkey") % 1024).as("px"), (col("l_suppkey") % 1024).as("sx"))
        keyed.withColumn("z", graft.operators.Layout.zorderKey(col("px"), col("sx"), 10))
          .orderBy("z", "l_orderkey", "l_linenumber")
          .limit(20)
          .select("l_orderkey", "l_linenumber", "px", "sx", "z")
      },
      Some(s"""SELECT l_orderkey, l_linenumber, px, sx,
              |  ${graft.operators.Layout.zorderSql("px", "sx", 10, "//")} AS z
              |FROM (SELECT l_orderkey, l_linenumber,
              |        l_partkey % 1024 AS px, l_suppkey % 1024 AS sx
              |      FROM lineitem)
              |ORDER BY z, l_orderkey, l_linenumber LIMIT 20""".stripMargin)),

    Q("q39_topk_agg",
      // q10's top-k-per-group semantics through the typed TopKAgg
      // Aggregator instead of a window: the aggregate keeps ≤ k pairs
      // per group per partition (ObjectHashAggregate with map-side
      // partials), so shuffle volume and state are bounded by
      // k·groups — the 100-TB form of top-k, where the window variant
      // sorts every group row through the exchange. The oracle is the
      // window form: both must produce identical rows.
      (s, d) => {
        val topk = udaf(graft.functions.TopKAgg(5))
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(topk(round(col("l_extendedprice"), 2), col("l_orderkey")).as("top"))
          .select(col("l_returnflag"), posexplode(col("top")))
          .select(col("l_returnflag"), (col("pos") + 1).cast("int").as("rk"),
            col("col._1").as("price"), col("col._2").as("l_orderkey"))
          .orderBy("l_returnflag", "rk")
      },
      Some("""SELECT l_returnflag, rk, price, l_orderkey FROM (
             |  SELECT l_returnflag, round(l_extendedprice, 2) AS price, l_orderkey,
             |    CAST(row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY round(l_extendedprice, 2) DESC, l_orderkey) AS INT) AS rk
             |  FROM lineitem)
             |WHERE rk <= 5 ORDER BY l_returnflag, rk""".stripMargin)),

    Q("q40_full_outer",
      // FULL OUTER join with null-producing rows on BOTH sides:
      // high-balance customers vs big urgent orders — customers
      // without qualifying orders and orders whose customer misses
      // the balance cut both survive with nulls. Sort-merge shape
      // (full outer can't broadcast); COALESCE keys keep the output
      // deterministic.
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
          .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"))
        val o = Tables.orders(s, d)
          .filter(col("o_totalprice") > 350000 && col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("bal"), col("o_orderkey"), col("price"))
          .orderBy(col("custkey"), col("o_orderkey"))
      },
      Some("""SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
             |  c.bal, o.o_orderkey, o.price
             |FROM (SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer
             |      WHERE c_acctbal > 9000) c
             |FULL OUTER JOIN (SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
             |      FROM orders
             |      WHERE o_totalprice > 350000 AND o_orderpriority = '1-URGENT') o
             |ON c.c_custkey = o.o_custkey
             |ORDER BY custkey, o_orderkey""".stripMargin)),

    Q("q41_cdc_diff",
      // Batch CDC via Snapshot.diff: two derived snapshots of the
      // customer dimension (every 5th key missing from old = inserts,
      // every 7th missing from new = deletes, every 3rd balance
      // bumped = updates); emit one row per changed key with the
      // MERGE action and old/new values. Sort-merge full-outer;
      // unchanged keys filtered before the output exchange.
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"))
        val prev = c.filter(col("c_custkey") % 5 =!= 0)
        val next = c.filter(col("c_custkey") % 7 =!= 0)
          .withColumn("bal", when(col("c_custkey") % 3 === 0,
            round(col("bal") + 100, 2)).otherwise(col("bal")))
        graft.operators.Snapshot.diff(prev, next, Seq("c_custkey"), Seq("bal"))
          .orderBy("c_custkey")
      },
      Some("""SELECT * FROM (
             |  SELECT coalesce(n.c_custkey, o.c_custkey) AS c_custkey,
             |    CASE WHEN o.c_custkey IS NULL THEN 'insert'
             |         WHEN n.c_custkey IS NULL THEN 'delete'
             |         WHEN o.bal IS DISTINCT FROM n.bal THEN 'update'
             |         ELSE 'unchanged' END AS action,
             |    o.bal AS old_bal, n.bal AS new_bal
             |  FROM (SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer
             |        WHERE c_custkey % 5 <> 0) o
             |  FULL OUTER JOIN (
             |    SELECT c_custkey,
             |      CASE WHEN c_custkey % 3 = 0 THEN round(round(c_acctbal, 2) + 100, 2)
             |           ELSE round(c_acctbal, 2) END AS bal
             |    FROM customer WHERE c_custkey % 7 <> 0) n
             |  ON o.c_custkey = n.c_custkey)
             |WHERE action <> 'unchanged' ORDER BY c_custkey""".stripMargin)),

    Q("q42_histogram",
      // Equal-width histogram with a capped tail bucket — the
      // profiling primitive; one hash aggregate, map-side partials.
      (s, d) => Tables.orders(s, d)
        .select(least(floor(col("o_totalprice") / 50000), lit(9))
          .cast("long").as("bucket"), col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("bucket"),
      Some("""SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
             |  CAST(count(*) AS BIGINT) AS cnt,
             |  round(sum(o_totalprice), 2) AS sum_price
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q42b_histogram_cents",
      // q42 with the revenue column in EXACT INTEGER cents (round 7,
      // q1b's pattern): the 100× sweep caught q42's double SUM
      // drifting in the last rounded cent at 15M addends; per-row
      // quantization before the sum is bit-identical at any scale.
      (s, d) => Tables.orders(s, d)
        .select(least(floor(col("o_totalprice") / 50000), lit(9))
          .cast("long").as("bucket"), col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"),
          sum(expr("CAST(round(o_totalprice*100) AS BIGINT)")).as("sum_price_cents"))
        .orderBy("bucket"),
      Some("""SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
             |  CAST(count(*) AS BIGINT) AS cnt,
             |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q43_gapfill",
      // Time-series regularization (TimeSeries.gapFill): hourly grid
      // per user from its own span, observations joined back,
      // forward-fill via last(ignoreNulls) over an ordered per-key
      // window. Parallelism = key count; no global sort.
      (s, d) => graft.operators.TimeSeries.gapFill(
          ev(s, d).filter(col("user_id") < 10), "user_id", "t", "value", 3600)
        .orderBy("key", "slot"),
      Some(s"""WITH e AS ($evSql),
              |obs AS (SELECT user_id AS key, t // 3600 AS slot,
              |    round(sum(value), 2) AS v
              |  FROM e WHERE user_id < 10 GROUP BY 1, 2),
              |grid AS (SELECT key, unnest(generate_series(lo, hi)) AS slot
              |  FROM (SELECT key, min(slot) AS lo, max(slot) AS hi FROM obs GROUP BY 1)),
              |j AS (SELECT g.key, g.slot, obs.v
              |  FROM grid g LEFT JOIN obs ON obs.key = g.key AND obs.slot = g.slot)
              |SELECT key, slot, v,
              |  last_value(v IGNORE NULLS) OVER (PARTITION BY key ORDER BY slot
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
              |FROM j ORDER BY key, slot""".stripMargin)),

    Q("q44_distribution_rank",
      // Distribution window functions: percent_rank and cume_dist per
      // nation over a unique ordering (bal, custkey) — both are pure
      // integer-rank arithmetic divided once, so the doubles are
      // bit-identical on any engine.
      (s, d) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("bal"), col("c_custkey"))
        Tables.customer(s, d)
          .filter(col("c_nationkey") < 5)
          .select(col("c_nationkey"), col("c_custkey"),
            round(col("c_acctbal"), 2).as("bal"))
          .withColumn("pr", round(percent_rank().over(w), 6))
          .withColumn("cd", round(cume_dist().over(w), 6))
          .orderBy("c_nationkey", "bal", "c_custkey")
      },
      Some("""SELECT c_nationkey, c_custkey, bal,
             |  round(percent_rank() OVER w, 6) AS pr,
             |  round(cume_dist() OVER w, 6) AS cd
             |FROM (SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS bal
             |      FROM customer WHERE c_nationkey < 5)
             |WINDOW w AS (PARTITION BY c_nationkey ORDER BY bal, c_custkey)
             |ORDER BY c_nationkey, bal, c_custkey""".stripMargin)),

    Q("q45_merge_upsert",
      // MERGE (apply CDC): Snapshot.applyDiff replays q41's action
      // table onto the old snapshot — deletes vanish, updates take new
      // values, inserts appear. The oracle derives the NEW snapshot
      // directly, so the hash compare pins the round-trip law
      // applyDiff(old, diff(old, new)) == new exactly.
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"))
        val prev = c.filter(col("c_custkey") % 5 =!= 0)
        val next = c.filter(col("c_custkey") % 7 =!= 0)
          .withColumn("bal", when(col("c_custkey") % 3 === 0,
            round(col("bal") + 100, 2)).otherwise(col("bal")))
        graft.operators.Snapshot.applyDiff(prev,
          graft.operators.Snapshot.diff(prev, next, Seq("c_custkey"), Seq("bal")),
          Seq("c_custkey"), Seq("bal"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN c_custkey % 3 = 0 THEN round(round(c_acctbal, 2) + 100, 2)
             |       ELSE round(c_acctbal, 2) END AS bal
             |FROM customer WHERE c_custkey % 7 <> 0
             |ORDER BY c_custkey""".stripMargin)),

    Q("q46_lateral_explode",
      // Nest → unnest round trip (LATERAL VIEW posexplode): per-order
      // sorted quantity array, positional explode of the first three
      // — the array-collect side stays one hash aggregate, the
      // explode is narrow.
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 50 === 0)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_quantity").cast("long"))).as("qs"))
        .select(col("l_orderkey"), posexplode(col("qs")))
        .filter(col("pos") < 3)
        .select(col("l_orderkey"), (col("pos") + 1).cast("long").as("pos"),
          col("col").as("qty"))
        .orderBy("l_orderkey", "pos"),
      Some("""SELECT l_orderkey, i AS pos, qs[CAST(i AS INT)] AS qty FROM (
             |  SELECT l_orderkey, list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
             |  FROM lineitem WHERE l_orderkey % 50 = 0 GROUP BY 1),
             |  unnest(generate_series(1, least(len(qs), 3))) AS t(i)
             |ORDER BY l_orderkey, pos""".stripMargin)),

    Q("q47_window_nav",
      // Frame-navigation window functions over the full partition
      // frame: first / last / second order per customer alongside
      // every row — one window pass, deterministic (date, key)
      // ordering.
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, d).filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            first("o_orderkey").over(w).as("first_key"),
            last("o_orderkey").over(w).as("last_key"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  first_value(o_orderkey) OVER w AS first_key,
             |  last_value(o_orderkey) OVER w AS last_key,
             |  nth_value(o_orderkey, 2) OVER w AS second_key
             |FROM orders WHERE o_custkey < 100
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    Q("q48_setops_all",
      // Multiset set operations (INTERSECT ALL / EXCEPT ALL) — q29's
      // bag-semantics complement: per-customer order MULTIPLICITY is
      // preserved (a customer with 3 orders in '95 and 1 in '96 keeps
      // 1 'both' + 2 'only95' rows). Output grouped to counts — the
      // deterministic surface of a multiset.
      (s, d) => {
        val o = Tables.orders(s, d)
        def yr(y: Int) = o
          .filter(col("o_orderdate") >= s"$y-01-01" && col("o_orderdate") < s"${y + 1}-01-01")
          .select("o_custkey")
        yr(1995).intersectAll(yr(1996)).withColumn("status", lit("both"))
          .union(yr(1995).exceptAll(yr(1996)).withColumn("status", lit("only95")))
          .groupBy("o_custkey", "status").agg(count(lit(1)).as("n"))
          .orderBy("o_custkey", "status")
      },
      Some("""WITH y95 AS (SELECT o_custkey FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
             |y96 AS (SELECT o_custkey FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
             |i AS (SELECT o_custkey FROM y95 INTERSECT ALL SELECT o_custkey FROM y96),
             |x AS (SELECT o_custkey FROM y95 EXCEPT ALL SELECT o_custkey FROM y96)
             |SELECT o_custkey, status, n FROM (
             |  SELECT o_custkey, 'both' AS status, CAST(count(*) AS BIGINT) AS n
             |  FROM i GROUP BY 1
             |  UNION ALL
             |  SELECT o_custkey, 'only95' AS status, CAST(count(*) AS BIGINT) AS n
             |  FROM x GROUP BY 1)
             |ORDER BY o_custkey, status""".stripMargin)),

    Q("q49_cohort_retention",
      // Cohort retention over the events stream: cohort = the user's
      // first-activity week, cell (cohort, weeks_since) = distinct
      // users still active that many weeks later. The cohort table is
      // a per-user aggregate of the SAME frame joined back on
      // user_id — both sides arrive hash-partitioned on user_id so
      // the join reuses the aggregation's exchange; no broadcast
      // needed (the cohort side is one row per user and grows with
      // the corpus). All-integer week arithmetic.
      (s, d) => {
        val w = ev(s, d).select(col("user_id"), expr("t div 604800").as("wk"))
        // min-over-partition instead of aggregate+self-join: ONE
        // exchange on user_id carries both the cohort derivation and
        // the event rows (the join formulation shuffles twice and
        // scans twice)
        val cohort = min("wk").over(Window.partitionBy("user_id"))
        w.withColumn("cohort_wk", cohort)
          .groupBy(col("cohort_wk"),
            (col("wk") - col("cohort_wk")).as("weeks_since"))
          .agg(countDistinct("user_id").as("active_users"))
          .orderBy("cohort_wk", "weeks_since")
      },
      Some(s"""WITH e AS ($evSql),
              |w AS (SELECT user_id, t//604800 AS wk FROM e),
              |c AS (SELECT user_id, min(wk) AS cohort_wk FROM w GROUP BY 1)
              |SELECT c.cohort_wk, w.wk - c.cohort_wk AS weeks_since,
              |  CAST(count(DISTINCT w.user_id) AS BIGINT) AS active_users
              |FROM w JOIN c ON w.user_id = c.user_id
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("q50_moving_window_anomaly",
      // Trailing moving-window anomaly flag on per-user daily event
      // counts: a 7-day RANGE frame (value-based, so calendar gaps
      // shrink the window rather than stretching it) and an
      // all-integer spike test cnt·|W| > 2·Σ(W) — no float ratio, so
      // the flag is bit-stable on any engine and any partial-agg
      // order. One shuffle to daily counts, then a per-user window;
      // parallelism is the user count.
      (s, d) => {
        val daily = ev(s, d).filter(col("user_id") < 100)
          .select(col("user_id"), expr("t div 86400").as("day"))
          .groupBy("user_id", "day").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("user_id").orderBy("day").rangeBetween(-6, 0)
        daily
          .withColumn("win_sum", sum("cnt").over(w))
          .withColumn("win_n", count(lit(1)).over(w))
          .withColumn("hot",
            (col("cnt") * col("win_n") > col("win_sum") * 2).cast("int"))
          .orderBy("user_id", "day")
      },
      Some(s"""WITH e AS ($evSql),
              |d AS (SELECT user_id, t//86400 AS day,
              |    CAST(count(*) AS BIGINT) AS cnt
              |  FROM e WHERE user_id < 100 GROUP BY 1, 2)
              |SELECT user_id, day, cnt,
              |  CAST(sum(cnt) OVER w AS BIGINT) AS win_sum,
              |  CAST(count(*) OVER w AS BIGINT) AS win_n,
              |  CAST(CASE WHEN cnt * (count(*) OVER w) > 2 * (sum(cnt) OVER w)
              |       THEN 1 ELSE 0 END AS INT) AS hot
              |FROM d
              |WINDOW w AS (PARTITION BY user_id ORDER BY day
              |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
              |ORDER BY user_id, day""".stripMargin)),

    Q("q51_skyline",
      // 2-D skyline (Pareto frontier) of high-value urgent orders:
      // points (order day, price cents) not dominated by any other
      // point that is ≥ in both dimensions and > in one. Spark side
      // is the O(n log n) sweep — sort days DESCENDING, a point
      // survives iff its price exceeds the running max over strictly
      // later days (RANGE frame to -1) and is its own day's max.
      // The oracle is the QUADRATIC NOT-EXISTS definition, so the
      // sweep's correctness is checked against the spec itself, not
      // a mirror of the algorithm. Exact integer cents throughout.
      // Scale: the raw candidate set first collapses to one max per
      // day (map-side-combine aggregate, fully parallel), so the
      // single-partition sweep window only ever sees
      // calendar-day-many rows — bounded by the horizon, not the
      // data volume.
      (s, d) => {
        val dayMax = Tables.orders(s, d)
          .filter(col("o_totalprice") > 400000 && col("o_orderpriority") === "1-URGENT")
          .select(
            datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
              .cast("long").as("day"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
          .groupBy("day").agg(max("cents").as("cents"))
        val later = Window.orderBy(col("day").desc)
          .rangeBetween(Window.unboundedPreceding, -1)
        dayMax
          .withColumn("max_later", max("cents").over(later))
          .filter(col("cents") > coalesce(col("max_later"), lit(-1L)))
          .select("day", "cents")
          .orderBy("day")
      },
      Some("""WITH c AS (SELECT DISTINCT
             |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders
             |  WHERE o_totalprice > 400000 AND o_orderpriority = '1-URGENT')
             |SELECT day, cents FROM c p
             |WHERE NOT EXISTS (SELECT 1 FROM c q
             |  WHERE q.day >= p.day AND q.cents >= p.cents
             |    AND (q.day > p.day OR q.cents > p.cents))
             |ORDER BY day""".stripMargin)),

    Q("q53_asof_forward_tolerance",
      // Direction+tolerance as-of (pandas merge_asof(direction=
      // 'forward', tolerance=1d)): for each signup, the EARLIEST
      // purchase by the same user within one day — conversion-time
      // attribution. Same single-shuffle union+window shape as q25's
      // backward as-of (the time axis is negated, the window pass is
      // direction-agnostic); matches beyond tolerance null out AFTER
      // the nearest-match selection, exactly merge_asof. Tie-break
      // at equal times = greatest payload, mirrored in the oracle's
      // ORDER BY t ASC, event_id DESC.
      (s, d) => {
        val e = ev(s, d)
        graft.operators.AsofJoin.directed(
          left = e.filter(col("event_type") === "signup")
            .select("event_id", "user_id", "t"),
          right = e.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("t").as("rt"), col("event_id").as("purchase_id")),
          key = "user_id", leftTime = "t", rightTime = "rt",
          forward = true, tolerance = Some(86400L))
          .select("event_id", "user_id", "purchase_id", "asof_gap")
          .orderBy("event_id")
      },
      Some(s"""WITH e AS ($evSql),
              |s AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'signup'),
              |m AS (SELECT sid, purchase_id, gap FROM (
              |    SELECT s.event_id AS sid, p.event_id AS purchase_id,
              |      p.t - s.t AS gap,
              |      row_number() OVER (PARTITION BY s.event_id
              |        ORDER BY p.t ASC, p.event_id DESC) AS rk
              |    FROM s JOIN e p ON p.event_type = 'purchase'
              |      AND p.user_id = s.user_id AND p.t >= s.t)
              |  WHERE rk = 1)
              |SELECT s.event_id, s.user_id,
              |  CASE WHEN m.gap <= 86400 THEN m.purchase_id END AS purchase_id,
              |  CASE WHEN m.gap <= 86400 THEN m.gap END AS asof_gap
              |FROM s LEFT JOIN m ON m.sid = s.event_id
              |ORDER BY s.event_id""".stripMargin)),

    Q("q52_incremental_agg",
      // Incremental AGGREGATE maintenance (materialized-view CDC):
      // the per-nation (count, sum-of-cents) aggregate of the q41
      // snapshot pair is maintained from the PREVIOUS aggregate plus
      // the Snapshot.diff action table — every diff row becomes a
      // delete-side and/or insert-side delta, folded in by
      // Snapshot.mergeAggDeltas (union + re-aggregate, one exchange
      // sized by |groups| + |changes|, never the base table). The
      // oracle RECOMPUTES the aggregate from the new snapshot
      // directly — incremental ≡ recompute is the invariant under
      // test, not a mirror.
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
        val prev = c.filter(col("c_custkey") % 5 =!= 0)
        val next = c.filter(col("c_custkey") % 7 =!= 0)
          .withColumn("cents", when(col("c_custkey") % 3 === 0,
            col("cents") + 10000L).otherwise(col("cents")))
        val prevAgg = prev.groupBy("c_nationkey")
          .agg(count(lit(1)).as("n"), sum("cents").as("s"))
        val diff = graft.operators.Snapshot.diff(prev, next,
          Seq("c_custkey"), Seq("c_nationkey", "cents"))
        val deltas = diff.filter(col("action").isin("delete", "update"))
          .select(col("old_c_nationkey").as("c_nationkey"),
            lit(-1L).as("n"), (-col("old_cents")).as("s"))
          .unionByName(diff.filter(col("action").isin("insert", "update"))
            .select(col("new_c_nationkey").as("c_nationkey"),
              lit(1L).as("n"), col("new_cents").as("s")))
        graft.operators.Snapshot.mergeAggDeltas(prevAgg, deltas,
            Seq("c_nationkey"), "n", Seq("s"))
          .orderBy("c_nationkey")
      },
      Some("""WITH next AS (SELECT c_custkey, c_nationkey,
             |    CASE WHEN c_custkey % 3 = 0
             |         THEN CAST(round(c_acctbal * 100) AS BIGINT) + 10000
             |         ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS cents
             |  FROM customer WHERE c_custkey % 7 <> 0)
             |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(cents) AS BIGINT) AS s
             |FROM next GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q54_interval_coalesce",
      // Interval coalescing (gaps-and-islands): each event opens a
      // [t, t+900] interval; overlapping intervals per user merge
      // into islands. The island id is a running SUM of new-island
      // flags, where a flag compares the interval start against the
      // running MAX of all previous ends — two stacked window
      // passes over ONE per-user exchange, the canonical distributed
      // formulation (no self-join, no recursion). All integer.
      (s, d) => {
        val iv = ev(s, d).filter(col("user_id") < 40)
          .select(col("user_id"), col("t").as("s"), (col("t") + 900L).as("e"))
          .distinct()
        val wOrd = Window.partitionBy("user_id").orderBy("s", "e")
        val prevMaxEnd = max("e").over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
        val flagged = iv.withColumn("new_island",
          (col("s") > coalesce(prevMaxEnd, lit(-1L))).cast("long"))
        flagged.withColumn("island", sum("new_island").over(
            wOrd.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "island")
          .agg(min("s").as("start"), max("e").as("end"), count(lit(1)).as("n_merged"))
          .select("user_id", "start", "end", "n_merged")
          .orderBy("user_id", "start")
      },
      Some(s"""WITH e AS ($evSql),
              |iv AS (SELECT DISTINCT user_id, t AS s, t + 900 AS e
              |  FROM e WHERE user_id < 40),
              |f AS (SELECT user_id, s, e,
              |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY user_id ORDER BY s, e
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              |      THEN 1 ELSE 0 END AS new_island
              |  FROM iv),
              |g AS (SELECT user_id, s, e,
              |    sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
              |  FROM f)
              |SELECT user_id, min(s) AS start, max(e) AS "end",
              |  CAST(count(*) AS BIGINT) AS n_merged
              |FROM g GROUP BY user_id, island
              |ORDER BY user_id, start""".stripMargin)),

    Q("q55_streaks",
      // Longest consecutive-day activity streak per user — the
      // day − dense_rank constant-difference trick: within a user,
      // consecutive days share (day − rank), so streaks fall out of
      // one more groupBy. Two shuffles total (daily distinct + the
      // streak rollup rides the same user partitioning). Tie-break:
      // the earliest longest streak.
      (s, d) => {
        val daily = ev(s, d).filter(col("user_id") < 100)
          .select(col("user_id"), expr("t div 86400").as("day")).distinct()
        val rk = row_number().over(Window.partitionBy("user_id").orderBy("day"))
        val streaks = daily.withColumn("grp", col("day") - rk)
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"), min("day").as("start_day"))
        streaks.withColumn("best", row_number().over(
            Window.partitionBy("user_id").orderBy(col("len").desc, col("start_day"))))
          .filter(col("best") === 1)
          .select("user_id", "len", "start_day")
          .orderBy("user_id")
      },
      Some(s"""WITH e AS ($evSql),
              |daily AS (SELECT DISTINCT user_id, t // 86400 AS day
              |  FROM e WHERE user_id < 100),
              |g AS (SELECT user_id, day,
              |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
              |  FROM daily),
              |st AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
              |    min(day) AS start_day
              |  FROM g GROUP BY 1, 2),
              |r AS (SELECT user_id, len, start_day,
              |    row_number() OVER (PARTITION BY user_id
              |      ORDER BY len DESC, start_day) AS best
              |  FROM st)
              |SELECT user_id, len, start_day FROM r WHERE best = 1
              |ORDER BY user_id""".stripMargin)),

    Q("q56_string_agg",
      // Ordered string aggregation (LISTAGG/STRING_AGG): per-nation
      // market segments as one sorted comma-joined string. Sorting
      // INSIDE the aggregate (sort_array before joining) makes the
      // result order-insensitive to partial-aggregation order — the
      // only way a distributed listagg is deterministic.
      (s, d) => Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segs"),
          countDistinct("c_mktsegment").as("n_segs"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey,
             |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segs,
             |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segs
             |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q57_equidepth_histogram",
      // Equi-DEPTH histogram (quantile binning) — q42's equal-width
      // complement, the profiling primitive behind range partitioning
      // choices: exact ntile(8) over integer cents via the
      // Quantiles stats pass (sampled bounds → bucketed rank →
      // tile arithmetic) — no global single-task window anywhere in
      // the plan, bit-identical to the ntile oracle.
      (s, d) => Quantiles.ntileByStats(
          Tables.orders(s, d)
            .select(col("o_orderkey"),
              expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents")),
          8, Seq(col("cents"), col("o_orderkey")), "bin")
        .groupBy("bin")
        .agg(count(lit(1)).as("cnt"), min("cents").as("lo"), max("cents").as("hi"))
        .orderBy("bin"),
      Some("""WITH b AS (SELECT o_orderkey,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders),
             |n AS (SELECT cents,
             |    CAST(ntile(8) OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS bin
             |  FROM b)
             |SELECT bin, CAST(count(*) AS BIGINT) AS cnt,
             |  min(cents) AS lo, max(cents) AS hi
             |FROM n GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q58_sequence_gaps",
      // Sequence-gap detection (data-quality audit): ranges of
      // missing o_orderkey values, found with one lead() pass over
      // the sorted key stream — no generate_series over the domain
      // (which would be the data-scale anti-pattern at 100 TB).
      // Audited stream: urgent orders only, whose keys are sparse in
      // the full domain — the filter is the realistic shape (audit a
      // partition/tenant's keys), and it guarantees real gaps at
      // every SF. The lead() runs inside range buckets with one
      // boundary value exchanged per bucket (Quantiles
      // .partitionedLead) — no global sort at any scale.
      (s, d) => Quantiles.partitionedLead(
          Tables.orders(s, d)
            .filter(col("o_orderpriority") === "1-URGENT")
            .select("o_orderkey"),
          "o_orderkey", "nxt")
          .filter(col("nxt") > col("o_orderkey") + 1)
          .select((col("o_orderkey") + 1).as("gap_start"),
            (col("nxt") - 1).as("gap_end"),
            (col("nxt") - col("o_orderkey") - 1).as("n_missing"))
          .orderBy("gap_start"),
      Some("""WITH s AS (SELECT o_orderkey,
             |    lead(o_orderkey, 1) OVER (ORDER BY o_orderkey) AS nxt
             |  FROM orders WHERE o_orderpriority = '1-URGENT')
             |SELECT o_orderkey + 1 AS gap_start, nxt - 1 AS gap_end,
             |  nxt - o_orderkey - 1 AS n_missing
             |FROM s WHERE nxt > o_orderkey + 1
             |ORDER BY gap_start""".stripMargin)),

    Q("q59_attribution",
      // Multi-touch attribution: every purchase splits 10000 basis
      // points of credit EQUALLY across the user's click/view touches
      // in the preceding 24h (integer division, remainder to the
      // LATEST touch so credit sums exactly to 10000 per converted
      // purchase), then credit rolls up per touch type. Range join on
      // the user key + time window, credit arithmetic all-integer.
      (s, d) => {
        val e = ev(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"), col("t").as("pt"))
        val touches = e.filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), col("event_type").as("touch"),
            col("event_id").as("tid"), col("t").as("tt"))
        val joined = purchases.join(touches, Seq("user_id"))
          .filter(col("tt") <= col("pt") && col("tt") > col("pt") - 86400L)
        val w = Window.partitionBy("pid")
        val ranked = joined
          .withColumn("n_touch", count(lit(1)).over(w))
          .withColumn("latest", row_number().over(
            w.orderBy(col("tt").desc, col("tid").desc)))
        ranked
          .withColumn("credit",
            expr("10000 div n_touch") +
              when(col("latest") === 1, expr("10000 % n_touch")).otherwise(0L))
          .groupBy("touch")
          .agg(sum("credit").as("credit_bp"), countDistinct("pid").as("n_purchases"))
          .orderBy("touch")
      },
      Some(s"""WITH e AS ($evSql),
              |p AS (SELECT user_id, event_id AS pid, t AS pt FROM e
              |  WHERE event_type = 'purchase'),
              |tc AS (SELECT user_id, event_type AS touch, event_id AS tid, t AS tt
              |  FROM e WHERE event_type IN ('click', 'view')),
              |j AS (SELECT p.pid, tc.touch, tc.tid, tc.tt FROM p JOIN tc USING (user_id)
              |  WHERE tc.tt <= p.pt AND tc.tt > p.pt - 86400),
              |r AS (SELECT pid, touch,
              |    count(*) OVER (PARTITION BY pid) AS n_touch,
              |    row_number() OVER (PARTITION BY pid ORDER BY tt DESC, tid DESC) AS latest
              |  FROM j)
              |SELECT touch,
              |  CAST(sum(10000 // n_touch
              |    + CASE WHEN latest = 1 THEN 10000 % n_touch ELSE 0 END) AS BIGINT)
              |    AS credit_bp,
              |  CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases
              |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q60_group_share",
      // Group share of a global total (the TPC-H Q11 pattern):
      // nations whose customers hold ≥ 4.2% of worldwide account
      // balance, in exact integer cents. The global total is a
      // one-row aggregate CROSS-joined (broadcast) into the per-group
      // aggregate — never a correlated per-row subquery; the
      // share test multiplies through (bal·10⁴ ≥ 420·total) so no
      // division or float enters the predicate.
      (s, d) => {
        val cents = Tables.customer(s, d).select(col("c_nationkey"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
        val perNation = cents.groupBy("c_nationkey").agg(sum("cents").as("bal"))
        val total = cents.agg(sum("cents").as("total"))
        perNation.crossJoin(broadcast(total))
          .filter(col("bal") * 10000 >= col("total") * 420)
          .withColumn("share_bp", expr("bal * 10000 div total"))
          .select("c_nationkey", "bal", "share_bp")
          .orderBy("c_nationkey")
      },
      Some("""WITH c AS (SELECT c_nationkey,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
             |pn AS (SELECT c_nationkey, CAST(sum(cents) AS BIGINT) AS bal
             |  FROM c GROUP BY 1),
             |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM c)
             |SELECT c_nationkey, bal, bal * 10000 // total AS share_bp
             |FROM pn, t WHERE bal * 10000 >= total * 420
             |ORDER BY c_nationkey""".stripMargin)),

    Q("q61_concentration",
      // Revenue concentration: what share of total order value the
      // top-decile customers hold — the Pareto/inequality audit.
      // Per-customer totals, decile cut by the Quantiles stats pass
      // (descending = negated revenue, unique tie-break), exact
      // integer cents, one final one-row rollup; the share leaves
      // integer space only in the last projection.
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .select(col("o_custkey"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
          .groupBy("o_custkey").agg(sum("cents").as("rev"))
        Quantiles.ntileByStats(perCust, 10,
            Seq(-col("rev"), col("o_custkey")), "decile")
          .agg(
            sum(when(col("decile") === 1, col("rev")).otherwise(0L)).as("top_rev"),
            sum("rev").as("total_rev"),
            sum(when(col("decile") === 1, 1L).otherwise(0L)).as("n_top"),
            count(lit(1)).as("n_cust"))
          .withColumn("top_share_bp", expr("top_rev * 10000 div total_rev"))
      },
      Some("""WITH pc AS (SELECT o_custkey,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
             |  FROM orders GROUP BY 1),
             |d AS (SELECT rev, ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
             |  FROM pc)
             |SELECT CAST(sum(CASE WHEN decile = 1 THEN rev ELSE 0 END) AS BIGINT) AS top_rev,
             |  CAST(sum(rev) AS BIGINT) AS total_rev,
             |  CAST(sum(CASE WHEN decile = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
             |  CAST(count(*) AS BIGINT) AS n_cust,
             |  CAST(sum(CASE WHEN decile = 1 THEN rev ELSE 0 END) AS BIGINT) * 10000
             |    // CAST(sum(rev) AS BIGINT) AS top_share_bp
             |FROM d""".stripMargin)),

    Q("q62_mode",
      // Per-group MODE with a deterministic tie-break (smallest value
      // wins) — mode() builtins leave ties engine-defined, so the
      // portable form is argmax over counted values: count per
      // (group, value), then one window pass ordered (count DESC,
      // value ASC). Two exchanges, both keyed.
      (s, d) => {
        val counted = Tables.customer(s, d)
          .groupBy("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("cnt").desc, col("c_mktsegment"))
        counted.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("c_nationkey"), col("c_mktsegment").as("mode_seg"), col("cnt"))
          .orderBy("c_nationkey")
      },
      Some("""WITH c AS (SELECT c_nationkey, c_mktsegment,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM customer GROUP BY 1, 2),
             |r AS (SELECT *, row_number() OVER (PARTITION BY c_nationkey
             |    ORDER BY cnt DESC, c_mktsegment) AS rn FROM c)
             |SELECT c_nationkey, c_mktsegment AS mode_seg, cnt
             |FROM r WHERE rn = 1 ORDER BY c_nationkey""".stripMargin)),

    Q("q63_transition_matrix",
      // First-order behavior transitions (the Markov-chain builder):
      // per user, each event's type paired with the NEXT event's type
      // by time (event_id tie-break), counted into the
      // from→to matrix with integer row-share basis points. One
      // per-user window pass + one matrix-sized aggregate.
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("t", "event_id")
        val trans = ev(s, d)
          .select(col("user_id"), col("event_id"), col("t"), col("event_type"))
          .withColumn("next_type", lead("event_type", 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        trans.withColumn("row_bp",
            expr("n * 10000 div sum(n) OVER (PARTITION BY from_type)"))
          .orderBy("from_type", "to_type")
      },
      Some(s"""WITH e AS ($evSql),
              |t AS (SELECT event_type,
              |    lead(event_type, 1) OVER (PARTITION BY user_id
              |      ORDER BY t, event_id) AS next_type
              |  FROM e),
              |m AS (SELECT event_type AS from_type, next_type AS to_type,
              |    CAST(count(*) AS BIGINT) AS n
              |  FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2)
              |SELECT from_type, to_type, n,
              |  n * 10000 // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_bp
              |FROM m ORDER BY from_type, to_type""".stripMargin)),

    Q("q64_decile_transition",
      // Rank-migration matrix: each customer's revenue DECILE in 1995
      // vs 1996, counted into a from→to mobility matrix — the
      // year-over-year "who moved up" audit. Two unique-ordered
      // decile cuts (Quantiles stats pass — exact ntile, no global
      // window) joined on the customer key; only customers active
      // both years transition.
      (s, d) => {
        def decile(y: Int) = Quantiles.ntileByStats(
            Tables.orders(s, d)
              .filter(col("o_orderdate") >= s"$y-01-01" && col("o_orderdate") < s"${y + 1}-01-01")
              .select(col("o_custkey"),
                expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
              .groupBy("o_custkey").agg(sum("cents").as("rev")),
            10, Seq(-col("rev"), col("o_custkey")), "dec")
          .select("o_custkey", "dec")
        decile(1995).withColumnRenamed("dec", "dec_from")
          .join(decile(1996).withColumnRenamed("dec", "dec_to"), "o_custkey")
          .groupBy("dec_from", "dec_to").agg(count(lit(1)).as("n"))
          .orderBy("dec_from", "dec_to")
      },
      Some("""WITH d95 AS (SELECT o_custkey,
             |    CAST(ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS BIGINT) AS dec_from
             |  FROM (SELECT o_custkey,
             |      sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
             |    FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
             |      AND o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1)),
             |d96 AS (SELECT o_custkey,
             |    CAST(ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS BIGINT) AS dec_to
             |  FROM (SELECT o_custkey,
             |      sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
             |    FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |      AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1))
             |SELECT dec_from, dec_to, CAST(count(*) AS BIGINT) AS n
             |FROM d95 JOIN d96 USING (o_custkey)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("q65_sql_surface",
      // The PURE-SQL front door: the same engine driven entirely
      // through spark.sql over registered temp views — a multi-CTE
      // analytical query (filter → join → window → aggregate) with
      // zero DataFrame-API calls after view registration. Proves a
      // SQL-only client of the library gets the same Catalyst plans
      // (and the oracle is, for once, almost the same text).
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_sql")
        Tables.customer(s, d).createOrReplaceTempView("customer_sql")
        s.sql("""
          WITH big AS (
            SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders_sql WHERE o_orderpriority = '1-URGENT'),
          pc AS (
            SELECT o_custkey, sum(cents) AS rev, count(*) AS n_orders
            FROM big GROUP BY o_custkey),
          rk AS (
            SELECT c.c_nationkey, pc.rev, pc.n_orders,
              row_number() OVER (PARTITION BY c.c_nationkey
                ORDER BY pc.rev DESC, pc.o_custkey) AS r
            FROM pc JOIN customer_sql c ON c.c_custkey = pc.o_custkey)
          SELECT c_nationkey, sum(rev) AS top3_rev, sum(n_orders) AS top3_orders
          FROM rk WHERE r <= 3 GROUP BY c_nationkey ORDER BY c_nationkey""")
      },
      Some("""WITH big AS (
             |  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders WHERE o_orderpriority = '1-URGENT'),
             |pc AS (
             |  SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS rev,
             |    CAST(count(*) AS BIGINT) AS n_orders
             |  FROM big GROUP BY o_custkey),
             |rk AS (
             |  SELECT c.c_nationkey, pc.rev, pc.n_orders,
             |    row_number() OVER (PARTITION BY c.c_nationkey
             |      ORDER BY pc.rev DESC, pc.o_custkey) AS r
             |  FROM pc JOIN customer c ON c.c_custkey = pc.o_custkey)
             |SELECT c_nationkey, CAST(sum(rev) AS BIGINT) AS top3_rev,
             |  CAST(sum(n_orders) AS BIGINT) AS top3_orders
             |FROM rk WHERE r <= 3 GROUP BY c_nationkey
             |ORDER BY c_nationkey""".stripMargin)),

    Q("q66_scd2",
      // Slowly-changing-dimension TYPE 2 construction: turn a keyed
      // change log (here: each customer's orders as value-change
      // events) into a versioned history table with half-open
      // validity intervals — valid_from = the change time,
      // valid_to = the NEXT change time (NULL while current),
      // is_current flagged. One per-key lead() window over the
      // change log; the as-of join (q25/q53) is the lookup side of
      // this same pattern. Consecutive same-valued changes collapse
      // first (true SCD2 never versions a non-change).
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("t", "k")
        val chg = Tables.orders(s, d)
          .filter(col("o_custkey") < 200)
          .select(col("o_custkey"), col("o_orderkey").as("k"),
            datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
              .cast("long").as("t"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("val"))
          .withColumn("prev_val", lag("val", 1).over(w))
          .filter(col("prev_val").isNull || col("prev_val") =!= col("val"))
        chg
          .withColumn("valid_to", lead("t", 1).over(w))
          .select(col("o_custkey"), col("val"),
            col("t").as("valid_from"), col("valid_to"),
            col("valid_to").isNull.cast("int").as("is_current"))
          .orderBy("o_custkey", "valid_from", "val")
      },
      Some("""WITH chg AS (SELECT * FROM (
             |    SELECT o_custkey, o_orderkey AS k,
             |      date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS t,
             |      CAST(round(o_totalprice * 100) AS BIGINT) AS val,
             |      lag(CAST(round(o_totalprice * 100) AS BIGINT), 1)
             |        OVER (PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)), o_orderkey)
             |        AS prev_val
             |    FROM orders WHERE o_custkey < 200)
             |  WHERE prev_val IS NULL OR prev_val <> val)
             |SELECT o_custkey, val, t AS valid_from,
             |  lead(t, 1) OVER (PARTITION BY o_custkey ORDER BY t, k) AS valid_to,
             |  CAST(CASE WHEN lead(t, 1) OVER (PARTITION BY o_custkey ORDER BY t, k)
             |       IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
             |FROM chg ORDER BY o_custkey, valid_from, val""".stripMargin)),

    Q("prof1_column_profile",
      // One-pass table profiling (Profiler.profile): null counts,
      // distinct cardinality, min/max per column in a single
      // aggregate job (Expand-planned distincts, map-side partials).
      // The price column is profiled in exact integer cents — float
      // min/max stringify engine-specifically.
      (s, d) => graft.operators.Profiler.profile(
          Tables.orders(s, d).select(
            col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_orderpriority"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("o_price_cents")),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
            "o_date", "o_price_cents"))
        .orderBy("col_name"),
      Some("""WITH b AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
             |    strftime(o_orderdate, '%Y-%m-%d') AS o_date,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS o_price_cents
             |  FROM orders),
             |p AS (
             |  SELECT 'o_orderkey' AS col_name, count(o_orderkey) AS nn,
             |    count(DISTINCT o_orderkey) AS nd,
             |    CAST(min(o_orderkey) AS VARCHAR) AS min_val,
             |    CAST(max(o_orderkey) AS VARCHAR) AS max_val FROM b
             |  UNION ALL
             |  SELECT 'o_custkey', count(o_custkey), count(DISTINCT o_custkey),
             |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM b
             |  UNION ALL
             |  SELECT 'o_orderstatus', count(o_orderstatus), count(DISTINCT o_orderstatus),
             |    min(o_orderstatus), max(o_orderstatus) FROM b
             |  UNION ALL
             |  SELECT 'o_orderpriority', count(o_orderpriority), count(DISTINCT o_orderpriority),
             |    min(o_orderpriority), max(o_orderpriority) FROM b
             |  UNION ALL
             |  SELECT 'o_date', count(o_date), count(DISTINCT o_date),
             |    min(o_date), max(o_date) FROM b
             |  UNION ALL
             |  SELECT 'o_price_cents', count(o_price_cents), count(DISTINCT o_price_cents),
             |    CAST(min(o_price_cents) AS VARCHAR), CAST(max(o_price_cents) AS VARCHAR) FROM b)
             |SELECT col_name, (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_rows,
             |  (SELECT count(*) FROM b) - nn AS n_nulls,
             |  CAST(nd AS BIGINT) AS n_distinct, min_val, max_val
             |FROM p ORDER BY col_name""".stripMargin)),

    Q("q67_weighted_median",
      // Exact weighted median per group (price cents weighted by
      // quantity): per-(group, value) weight rollup, PARTITIONED
      // cumulative window (group-local, no global sort), min value
      // with 2·cum ≥ total. Integers end to end.
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
          col("l_quantity").cast("long").as("w"))
        val byP = li.groupBy("flag", "cents").agg(sum("w").as("wsum"))
        val cum = byP.withColumn("cum", sum("wsum").over(
          Window.partitionBy("flag").orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val tot = byP.groupBy("flag").agg(sum("wsum").as("tot"))
        cum.join(tot, Seq("flag"))
          .filter(col("cum") * 2 >= col("tot"))
          .groupBy("flag").agg(min("cents").as("wmedian_cents"))
          .orderBy("flag")
      },
      Some("""WITH b AS (SELECT l_returnflag AS flag,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             |    CAST(l_quantity AS BIGINT) AS w FROM lineitem),
             |g AS (SELECT flag, cents, CAST(sum(w) AS BIGINT) AS wsum FROM b GROUP BY 1, 2),
             |c AS (SELECT flag, cents, CAST(sum(wsum) OVER (PARTITION BY flag
             |    ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM g),
             |t AS (SELECT flag, CAST(sum(wsum) AS BIGINT) AS tot FROM g GROUP BY 1)
             |SELECT c.flag, CAST(min(cents) AS BIGINT) AS wmedian_cents
             |FROM c JOIN t USING (flag) WHERE cum * 2 >= tot
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("prof2_catalog_profile",
      // Catalog-level dataset manifest: one row per table with row
      // count plus key/category distinct cardinalities — the
      // data-engineering "datasheet" read before planning a join
      // graph. Six independent map-side-combined aggregates unioned;
      // each is Expand-planned like prof1.
      (s, d) => {
        def row(t: DataFrame, name: String, key: String, cat: String) =
          t.agg(count(lit(1)).as("n_rows"),
              countDistinct(col(key)).as("key_distinct"),
              countDistinct(col(cat)).as("cat_distinct"))
            .withColumn("table_name", lit(name))
        Seq(
          row(Tables.region(s, d), "region", "r_regionkey", "r_name"),
          row(Tables.nation(s, d), "nation", "n_nationkey", "n_name"),
          row(Tables.customer(s, d), "customer", "c_custkey", "c_mktsegment"),
          row(Tables.supplier(s, d), "supplier", "s_suppkey", "s_nationkey"),
          row(Tables.part(s, d), "part", "p_partkey", "p_brand"),
          row(Tables.orders(s, d), "orders", "o_orderkey", "o_orderpriority"))
          .reduce(_ unionByName _)
          .select("table_name", "n_rows", "key_distinct", "cat_distinct")
          .orderBy("table_name")
      },
      Some("""SELECT * FROM (
             |  SELECT 'region' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
             |    CAST(count(DISTINCT r_regionkey) AS BIGINT) AS key_distinct,
             |    CAST(count(DISTINCT r_name) AS BIGINT) AS cat_distinct FROM region
             |  UNION ALL
             |  SELECT 'nation', CAST(count(*) AS BIGINT), CAST(count(DISTINCT n_nationkey) AS BIGINT),
             |    CAST(count(DISTINCT n_name) AS BIGINT) FROM nation
             |  UNION ALL
             |  SELECT 'customer', CAST(count(*) AS BIGINT), CAST(count(DISTINCT c_custkey) AS BIGINT),
             |    CAST(count(DISTINCT c_mktsegment) AS BIGINT) FROM customer
             |  UNION ALL
             |  SELECT 'supplier', CAST(count(*) AS BIGINT), CAST(count(DISTINCT s_suppkey) AS BIGINT),
             |    CAST(count(DISTINCT s_nationkey) AS BIGINT) FROM supplier
             |  UNION ALL
             |  SELECT 'part', CAST(count(*) AS BIGINT), CAST(count(DISTINCT p_partkey) AS BIGINT),
             |    CAST(count(DISTINCT p_brand) AS BIGINT) FROM part
             |  UNION ALL
             |  SELECT 'orders', CAST(count(*) AS BIGINT), CAST(count(DISTINCT o_orderkey) AS BIGINT),
             |    CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders)
             |ORDER BY table_name""".stripMargin)),

    Q("q68_active_users",
      // Rolling-distinct engagement (DAU / WAU / stickiness) — the
      // canonical product-analytics rollup. Distinct-over-a-range has
      // no window form; the scale-correct plan SPREADS each (day,
      // user) membership to the ≤7 cover days and counts per cover
      // day: one exchange over 7 × |daily actives| rows, partitioned
      // by day — never a per-day rescan of the event log and no
      // global structure. Stickiness is exact-integer basis points
      // (dau·10⁴ div wau), hash-stable on any engine.
      (s, d) => {
        val ud = ev(s, d)
          .select(expr("t div 86400").as("day"), col("user_id")).distinct()
        val days = ud.select("day").distinct()
        val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
        val wau = ud
          .select(explode(expr("sequence(day, day + 6)")).as("cday"), col("user_id"))
          .distinct()
          .join(days.withColumnRenamed("day", "cday"), Seq("cday"), "left_semi")
          .groupBy(col("cday").as("day")).agg(count(lit(1)).as("wau"))
        dau.join(wau, Seq("day"))
          .select(col("day"), col("dau"), col("wau"),
            expr("dau * 10000 div wau").as("stickiness_bp"))
          .orderBy("day")
      },
      Some("""WITH e AS (SELECT *, epoch_ns(ts)//1000000000 AS t FROM events),
             |ud AS (SELECT DISTINCT t // 86400 AS day, user_id FROM e),
             |days AS (SELECT DISTINCT day FROM ud),
             |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
             |wau AS (SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
             |  FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day GROUP BY 1)
             |SELECT dau.day, dau, wau,
             |  CAST(dau * 10000 // wau AS BIGINT) AS stickiness_bp
             |FROM dau JOIN wau ON dau.day = wau.day ORDER BY 1""".stripMargin)),

    Q("q71_fulfillment_latency",
      // Cross-table latency distribution — order→ship days per
      // priority with EXACT integer disc-percentiles (p50/p90 = the
      // smallest day whose cumulative count clears the threshold),
      // computed from the (priority, days) COUNTS table: the window
      // runs over the tiny latency domain, never the joined fact rows
      // (q67's weighted-median pattern), so the per-priority
      // "ordering" costs nothing at any scale.
      (s, d) => {
        val lat = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderpriority").as("prio"),
            datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("days"))
        val byDay = lat.groupBy("prio", "days").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("prio").orderBy("days")
        val cum = byDay.withColumn("cum", sum("cnt").over(w))
        val tot = byDay.groupBy("prio").agg(sum("cnt").as("n"))
        cum.join(tot, Seq("prio"))
          .groupBy("prio")
          .agg(first("n").as("n_items"),
            min("days").as("min_days"),
            max("days").as("max_days"),
            min(when(col("cum") * 2 >= col("n"), col("days"))).as("p50_days"),
            min(when(col("cum") * 10 >= col("n") * 9, col("days"))).as("p90_days"))
          .orderBy("prio")
      },
      Some("""WITH lat AS (SELECT o_orderpriority AS prio,
             |    CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS days
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |bd AS (SELECT prio, days, CAST(count(*) AS BIGINT) AS cnt
             |  FROM lat GROUP BY 1, 2),
             |cm AS (SELECT prio, days, cnt,
             |    sum(cnt) OVER (PARTITION BY prio ORDER BY days) AS cum FROM bd),
             |tt AS (SELECT prio, CAST(sum(cnt) AS BIGINT) AS n FROM bd GROUP BY 1)
             |SELECT cm.prio, CAST(min(n) AS BIGINT) AS n_items,
             |  CAST(min(days) AS BIGINT) AS min_days,
             |  CAST(max(days) AS BIGINT) AS max_days,
             |  CAST(min(CASE WHEN cum * 2 >= n THEN days END) AS BIGINT) AS p50_days,
             |  CAST(min(CASE WHEN cum * 10 >= n * 9 THEN days END) AS BIGINT) AS p90_days
             |FROM cm JOIN tt ON cm.prio = tt.prio GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("prof3_quality_audit",
      // Data-quality expectation suite (graft.operators.Quality) —
      // uniqueness, referential integrity, nullability, range, set
      // membership, and a business predicate, each ONE exact-integer
      // aggregate (FK checks anti-join on the key columns only),
      // unioned into the per-rule violations report a production
      // table publishes next to itself.
      (s, d) => {
        import graft.operators.Quality
        val orders = Tables.orders(s, d)
        val customer = Tables.customer(s, d)
        val lineitem = Tables.lineitem(s, d)
        Quality.audit(Seq(
          Quality.uniqueCheck(orders, Seq("o_orderkey"), "unique_orders_orderkey"),
          Quality.referentialCheck(orders, "o_custkey", customer, "c_custkey",
            "fk_orders_custkey"),
          Quality.referentialCheck(lineitem, "l_orderkey", orders, "o_orderkey",
            "fk_lineitem_orderkey"),
          Quality.notNullCheck(customer, "c_name", "notnull_customer_name"),
          Quality.rangeCheck(lineitem, "l_quantity", lit(1), lit(50),
            "range_lineitem_quantity"),
          Quality.inSetCheck(orders, "o_orderstatus", Seq("O", "F", "P"),
            "inset_orders_status"),
          Quality.predicateCheck(lineitem,
            expr("l_extendedprice * (1 - l_discount) > 0"),
            "pred_lineitem_positive_charge")))
      },
      Some("""SELECT * FROM (
             |  SELECT 'unique_orders_orderkey' AS rule,
             |    CAST(count(*) AS BIGINT) AS n_checked,
             |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
             |  FROM orders WHERE o_orderkey IS NOT NULL
             |  UNION ALL
             |  SELECT 'fk_orders_custkey', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             |    ON o.o_custkey = c.c_custkey
             |  UNION ALL
             |  SELECT 'fk_lineitem_orderkey', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN o2.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o2
             |    ON l.l_orderkey = o2.o_orderkey
             |  UNION ALL
             |  SELECT 'notnull_customer_name', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM customer
             |  UNION ALL
             |  SELECT 'range_lineitem_quantity', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN l_quantity IS NOT NULL
             |      AND l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'inset_orders_status', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
             |      AND o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM orders
             |  UNION ALL
             |  SELECT 'pred_lineitem_positive_charge', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN NOT (l_extendedprice * (1 - l_discount) > 0)
             |      THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM lineitem)
             |ORDER BY rule""".stripMargin)),

    Q("prof4_join_skew",
      // Join-key skew profile (round 7) — the read a 100-TB join
      // planner runs before choosing salt counts / AQE skew
      // thresholds / broadcast sides: top-10 heaviest l_partkey
      // values with exact-integer row share (bp) and skew factor
      // (×100 of the mean per-key count). One map-side-combined
      // groupBy + a distributed TakeOrdered — deliberately NO global
      // row_number over all distinct keys (Profiler.keySkew).
      (s, d) => graft.operators.Profiler.keySkew(
          Tables.lineitem(s, d), "l_partkey", topN = 10)
        .orderBy("rank"),
      Some("""WITH c AS (SELECT l_partkey AS key, count(*) AS cnt
             |    FROM lineitem GROUP BY 1),
             |g AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
             |    CAST(count(*) AS BIGINT) AS n_keys FROM c),
             |t AS (SELECT key, cnt,
             |    row_number() OVER (ORDER BY cnt DESC, key) AS rank FROM c)
             |SELECT t.key, CAST(t.cnt AS BIGINT) AS cnt,
             |  CAST(t.rank AS INT) AS rank,
             |  t.cnt * 10000 // g.total AS share_bp,
             |  t.cnt * 100 * g.n_keys // g.total AS skew_x100
             |FROM t, g WHERE t.rank <= 10 ORDER BY t.rank""".stripMargin)),

    Q("prof5_drift",
      // Snapshot DRIFT profile (round 9) — the check a training
      // pipeline runs before mixing a fresh crawl in: two snapshots
      // (orderkey parity stands in for old/new dumps), q42's stable
      // price binning, per-bucket share in exact integer bp, the
      // delta, and its squared contribution (Σ = L2 drift score;
      // deliberately not ln-PSI — libm log bits differ across
      // engines, squared-bp is all-integer and oracle-exact). Two
      // map-side aggregates + a 1-row totals broadcast.
      (s, d) => {
        val o = Tables.orders(s, d)
        val bucket = least(floor(col("o_totalprice") / 50000), lit(9))
          .cast("long")
        graft.operators.Profiler.drift(
          o.filter(col("o_orderkey") % 2 === 0),
          o.filter(col("o_orderkey") % 2 === 1),
          bucket).orderBy("bucket")
      },
      Some("""WITH ca AS (SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
             |    CAST(count(*) AS BIGINT) AS cnt_a FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
             |cb AS (SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
             |    CAST(count(*) AS BIGINT) AS cnt_b FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1),
             |j AS (SELECT coalesce(ca.bucket, cb.bucket) AS bucket,
             |    coalesce(cnt_a, 0) AS cnt_a, coalesce(cnt_b, 0) AS cnt_b
             |  FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket),
             |g AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS tot_a,
             |    CAST(sum(cnt_b) AS BIGINT) AS tot_b FROM j)
             |SELECT bucket, cnt_a, cnt_b,
             |  cnt_a * 10000 // tot_a AS share_a_bp,
             |  cnt_b * 10000 // tot_b AS share_b_bp,
             |  cnt_a * 10000 // tot_a - cnt_b * 10000 // tot_b AS diff_bp,
             |  (cnt_a * 10000 // tot_a - cnt_b * 10000 // tot_b)
             |    * (cnt_a * 10000 // tot_a - cnt_b * 10000 // tot_b) AS contrib
             |FROM j, g ORDER BY bucket""".stripMargin)),

    Q("prof6_json_profile",
      // SEMI-STRUCTURED schema census (round 10) — the pass a
      // pipeline runs over event logs before promoting JSON fields
      // to typed columns: per KEY, presence, fill rate (integer bp),
      // distinct values, and integer/boolean parse counts. The
      // heterogeneous document is derived in-query from typed event
      // columns (key set varies by event_type — the realistic log
      // shape the uniform synthetic props lacks); both engines build
      // and parse the identical JSON.
      (s, d) => {
        val j = Tables.events(s, d).select(expr(
          """concat('{"uid":', CAST(user_id AS STRING),
            |  CASE WHEN event_type = 'click'
            |    THEN concat(',"page":"p', CAST(user_id % 7 AS STRING), '"')
            |    ELSE '' END,
            |  CASE WHEN value > 50 THEN ',"hot":true' ELSE '' END,
            |  '}')""".stripMargin).as("j"))
        graft.operators.Profiler.jsonProfile(j, "j").orderBy("key")
      },
      Some("""WITH b AS (SELECT '{"uid":' || CAST(user_id AS VARCHAR)
             |    || CASE WHEN event_type = 'click'
             |         THEN ',"page":"p' || CAST(user_id % 7 AS VARCHAR) || '"'
             |         ELSE '' END
             |    || CASE WHEN value > 50 THEN ',"hot":true' ELSE '' END
             |    || '}' AS j FROM events),
             |kv AS (SELECT unnest(json_keys(j)) AS key, j FROM b),
             |v AS (SELECT key, json_extract_string(j, '$.' || key) AS val FROM kv)
             |SELECT key, CAST(count(*) AS BIGINT) AS n_present,
             |  CAST(count(*) * 10000 // (SELECT count(*) FROM b) AS BIGINT) AS fill_bp,
             |  CAST(sum(CASE WHEN regexp_matches(val, '^-?[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_integer,
             |  CAST(sum(CASE WHEN val IN ('true', 'false') THEN 1 ELSE 0 END) AS BIGINT) AS n_boolean,
             |  CAST(count(DISTINCT val) AS BIGINT) AS n_distinct
             |FROM v GROUP BY key ORDER BY key""".stripMargin)),

    Q("prof7_embedding_profile",
      // EMBEDDING-column census (round 11) — per-dimension count,
      // exact min/max, integer-scaled element sum (floor(v·10⁴):
      // float sums are accumulation-order-defined, integer sums are
      // exact on any engine), and zero count (dead-dimension
      // detector). The profile an ANN build runs first; output
      // bounded by dimensionality, never corpus size
      // (Profiler.embeddingProfile).
      (s, d) => graft.operators.Profiler.embeddingProfile(
          Tables.embeddings(s, d), "embedding")
        .orderBy("dim"),
      Some("""WITH x AS (SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
             |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i))
             |SELECT CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n,
             |  min(v) AS min_v, max(v) AS max_v,
             |  CAST(sum(CAST(floor(v * 10000) AS BIGINT)) AS BIGINT) AS sum_e4,
             |  CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
             |FROM x GROUP BY 1 ORDER BY dim""".stripMargin)),

    Q("prof8_corr_profile",
      // PAIRWISE-correlation sufficient statistics (round 11;
      // Profiler.corrStats): per (returnflag, column pair), exact
      // BIGINT n/Σx/Σy/Σxy/Σx²/Σy² over integer-scaled price
      // (dollars), discount (bp) and quantity — the mergeable
      // profile a feature pipeline persists; Pearson r is derived
      // by the reader. One map-side aggregate for all pairs.
      (s, d) => graft.operators.Profiler.corrStats(
          Tables.lineitem(s, d).select(col("l_returnflag"),
            expr("CAST(round(l_extendedprice) AS BIGINT)").as("price_d"),
            expr("CAST(round(l_discount * 10000) AS BIGINT)").as("disc_bp"),
            col("l_quantity").cast("long").as("qty")),
          "l_returnflag", Seq("price_d", "disc_bp", "qty"))
        .orderBy("l_returnflag", "col_x", "col_y"),
      Some("""WITH b AS (SELECT l_returnflag,
             |    CAST(round(l_extendedprice) AS BIGINT) AS price_d,
             |    CAST(round(l_discount * 10000) AS BIGINT) AS disc_bp,
             |    CAST(l_quantity AS BIGINT) AS qty
             |  FROM lineitem),
             |g AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(price_d) AS BIGINT) AS s_p, CAST(sum(disc_bp) AS BIGINT) AS s_d,
             |    CAST(sum(qty) AS BIGINT) AS s_q,
             |    CAST(sum(price_d * price_d) AS BIGINT) AS q_p,
             |    CAST(sum(disc_bp * disc_bp) AS BIGINT) AS q_d,
             |    CAST(sum(qty * qty) AS BIGINT) AS q_q,
             |    CAST(sum(price_d * disc_bp) AS BIGINT) AS p_pd,
             |    CAST(sum(price_d * qty) AS BIGINT) AS p_pq,
             |    CAST(sum(disc_bp * qty) AS BIGINT) AS p_dq
             |  FROM b GROUP BY 1)
             |SELECT l_returnflag, 'price_d' AS col_x, 'disc_bp' AS col_y,
             |  n, s_p AS sum_x, s_d AS sum_y, p_pd AS sum_xy, q_p AS sum_x2, q_d AS sum_y2
             |FROM g
             |UNION ALL
             |SELECT l_returnflag, 'price_d', 'qty', n, s_p, s_q, p_pq, q_p, q_q FROM g
             |UNION ALL
             |SELECT l_returnflag, 'disc_bp', 'qty', n, s_d, s_q, p_dq, q_d, q_q FROM g
             |ORDER BY l_returnflag, col_x, col_y""".stripMargin)),

    Q("q69_cumulative_reach",
      // Monotone reach curve — cumulative distinct users ever seen,
      // by hour: distinct-over-a-GROWING-range collapses to "first
      // activity hour per user" (one aggregate over users) + a running
      // sum over the hours-sized series — the window never touches the
      // event log, so the "global" cumulative order is free at any
      // scale (q68's rolling-window complement).
      (s, d) => {
        val firstHour = ev(s, d)
          .groupBy("user_id").agg(min(expr("t div 3600")).as("hour"))
        val perHour = firstHour.groupBy("hour").agg(count(lit(1)).as("new_users"))
        val w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        perHour.withColumn("cum_users", sum("new_users").over(w))
          .select(col("hour"), col("new_users"), col("cum_users"))
          .orderBy("hour")
      },
      Some("""WITH e AS (SELECT *, epoch_ns(ts)//1000000000 AS t FROM events),
             |fh AS (SELECT user_id, min(t // 3600) AS hour FROM e GROUP BY 1),
             |ph AS (SELECT hour, CAST(count(*) AS BIGINT) AS new_users FROM fh GROUP BY 1)
             |SELECT hour, new_users,
             |  CAST(sum(new_users) OVER (ORDER BY hour
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
             |FROM ph ORDER BY hour""".stripMargin)),

    Q("q70_wow_change",
      // Period-over-period reporting — the BI staple: monthly order
      // revenue in exact cents, previous period via lag, delta in
      // integer basis points (cur−prev)·10⁴ div prev. One map-side-
      // combined aggregate to a months-sized series, then a window
      // over that TINY series — the window never sees the fact table,
      // so "global" ordering costs nothing at any scale.
      (s, d) => {
        val monthly = Tables.orders(s, d)
          .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_cents"))
        val w = Window.orderBy("month")
        monthly
          .withColumn("prev_cents", lag("rev_cents", 1).over(w))
          // deltas go NEGATIVE: both Spark's `div` and DuckDB's `//`
          // truncate toward zero on integers (probed: -7//2 = -3), so
          // plain div is hash-exact — no floor correction
          .select(col("month"), col("rev_cents"), col("prev_cents"),
            expr("CASE WHEN prev_cents IS NULL THEN NULL " +
              "ELSE (rev_cents - prev_cents) * 10000 div prev_cents END").as("delta_bp"))
          .orderBy("month")
      },
      Some("""WITH m AS (SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
             |  FROM orders GROUP BY 1),
             |l AS (SELECT month, rev_cents,
             |    lag(rev_cents) OVER (ORDER BY month) AS prev_cents FROM m)
             |SELECT month, rev_cents, prev_cents,
             |  CAST(CASE WHEN prev_cents IS NULL THEN NULL
             |    ELSE (rev_cents - prev_cents) * 10000 // prev_cents END AS BIGINT) AS delta_bp
             |FROM l ORDER BY month""".stripMargin)),

    Q("q72_rolling_distinct",
      // q68 generalized to an ARBITRARY window length (28-day actives
      // here — the product-analytics MAU): Engagement
      // .rollingDistinctExact spreads each (day, user) membership to
      // its 28 cover days and counts per cover day. Exact, linear in
      // window length (the documented q68 trade); the sketch tier
      // below (q72b) is the 100-TB path whose merge cost is window-
      // independent.
      (s, d) => {
        val ud = ev(s, d)
          .select(expr("t div 86400").as("day"), col("user_id"))
        graft.operators.Engagement.rollingDistinctExact(ud, 28)
          .select(col("day"), col("active").as("active_28d"))
          .orderBy("day")
      },
      Some("""WITH e AS (SELECT *, epoch_ns(ts)//1000000000 AS t FROM events),
             |ud AS (SELECT DISTINCT t // 86400 AS day, user_id FROM e),
             |days AS (SELECT DISTINCT day FROM ud)
             |SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS active_28d
             |FROM days d JOIN ud u ON u.day BETWEEN d.day - 27 AND d.day
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q72b_rolling_distinct_hll",
      // The 100-TB tier of q72: per-day HLL sketch partials merged
      // over the trailing 28 days (Engagement.rollingDistinctHll) —
      // the window exchange carries |days|×28 few-KB sketch rows,
      // INDEPENDENT of user cardinality, and the per-day partials are
      // the materialization a deployed pipeline persists (any window
      // length answerable later without rescanning events). Sketch
      // binaries are engine-defined, so the oracle follows q8b's
      // pattern: emit the exact count and whether the estimate landed
      // within the documented ε (lgK 14 → rsd ≈ 0.8%; assert ≤ 5%).
      (s, d) => {
        val ud = ev(s, d)
          .select(expr("t div 86400").as("day"), col("user_id"))
        val est = graft.operators.Engagement.rollingDistinctHll(ud, 28)
        val exact = graft.operators.Engagement.rollingDistinctExact(ud, 28)
        est.join(exact, Seq("day"))
          .select(col("day"), col("active").as("n_exact"),
            (abs(col("active_est") - col("active")) <= col("active") * 0.05)
              .as("within_eps"))
          .orderBy("day")
      },
      Some("""WITH e AS (SELECT *, epoch_ns(ts)//1000000000 AS t FROM events),
             |ud AS (SELECT DISTINCT t // 86400 AS day, user_id FROM e),
             |days AS (SELECT DISTINCT day FROM ud)
             |SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_exact,
             |  true AS within_eps
             |FROM days d JOIN ud u ON u.day BETWEEN d.day - 27 AND d.day
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("q73_ewma",
      // EXACT integer EWMA (round 7; α=1/2, depth 32): per-row cent
      // quantization + power-of-two decay keeps the whole smoothing
      // signal in BIGINT — dyadic arithmetic, so unlike a double-αⁿ
      // window it cannot drift with accumulation order at ANY scale
      // (the q1b lesson applied to a window aggregate). One per-user
      // ordered window pass, ties total-ordered on event_id
      // (TimeSeries.ewmaExact); the oracle unrolls the same 32 lag
      // slots programmatically.
      (s, d) => graft.operators.TimeSeries.ewmaExact(
          ev(s, d).filter(col("user_id") < 50),
          "user_id", "t", "event_id", "value", depth = 32)
        .orderBy("user_id", "t", "event_id"),
      Some {
        val terms = (0 until 32).map(k =>
          s"coalesce(lag(cv, $k, 0) OVER (PARTITION BY user_id ORDER BY t, event_id), 0) * ${1L << (31 - k)}"
        ).mkString("\n  + ")
        s"""WITH e AS ($evSql),
           |q AS (SELECT user_id, t, event_id,
           |    CAST(round(value*100) AS BIGINT) AS cv
           |  FROM e WHERE user_id < 50)
           |SELECT user_id, t, event_id,
           |  CAST($terms AS BIGINT) AS ewma_x2p32
           |FROM q ORDER BY user_id, t, event_id""".stripMargin
      })
  )
}
