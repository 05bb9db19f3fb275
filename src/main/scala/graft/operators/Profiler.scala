package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality pass every ingestion pipeline
  * runs before trusting a new drop: per-column null counts, distinct
  * cardinality, and min/max ranges.
  *
  * Scale shape: ONE aggregate job over the table computes every
  * column's statistics together (the multiple COUNT(DISTINCT)s are
  * Expand-planned with map-side partials — q36's shape — so the
  * shuffle carries per-partition partials, never raw rows), and the
  * resulting single wide row unpivots in place. Profiling a 100-TB
  * table is exactly one pass regardless of how many columns are
  * profiled. For cardinalities where exact distinct is too hot,
  * swap `countDistinct` for `approx_count_distinct` (the q8b tier).
  */
object Profiler {

  /** Per-column profile of `cols`: (col_name, n_rows, n_nulls,
    * n_distinct, min_val, max_val), min/max rendered as strings so
    * heterogeneous column types share one output schema. Callers
    * should pre-cast float columns to an exact type (decimal/cents)
    * — float-to-string rendering is engine-specific.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Join-key skew profile: the planning read a 100-TB join runs
    * BEFORE choosing its strategy (salt? AQE skew-join? broadcast?).
    * Top-`topN` heaviest keys of `keyCol` with exact-integer share
    * (basis points of all rows) and skew factor (×100 of the mean
    * per-key count) — q30's salting threshold and the AQE
    * skewedPartitionFactor both key off exactly this ratio.
    *
    * Scale shape: one map-side-combined groupBy on the key, then a
    * distributed TakeOrdered for the top-N — deliberately NOT a
    * global row_number window, which would funnel every distinct key
    * through one task; the rank window runs over the `topN` surviving
    * rows only. The 1-row global aggregate joins in by broadcast.
    */
  /** EMBEDDING-column profile — the vector-quality census a pipeline
    * runs before building an ANN index over 100 TB of embeddings:
    * one row per DIMENSION with count, exact min/max, an
    * integer-scaled element sum (Σ floor(v·10⁴) — float sums are
    * accumulation-order-defined, integer sums are not, so the mean
    * signal stays oracle-exact), and the zero count (the
    * dead-dimension / truncated-write detector). One posexplode +
    * one map-side-combined aggregate; output is bounded by the
    * dimensionality, never the corpus. Ragged vectors surface as
    * per-dim `n` differences — the cheapest possible schema check. */
  def embeddingProfile(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("dim").agg(
        count(lit(1)).as("n"),
        min(col("v").cast("double")).as("min_v"),
        max(col("v").cast("double")).as("max_v"),
        sum(expr("CAST(floor(CAST(v AS DOUBLE) * 10000) AS BIGINT)")).as("sum_e4"),
        sum((col("v") === 0.0f).cast("long")).as("n_zero"))
      .withColumn("dim", col("dim").cast("long"))

  /** PAIRWISE-correlation sufficient statistics over pre-scaled
    * INTEGER columns — the numeric-relationship census a feature
    * pipeline stores (what a profiler actually persists; Pearson r
    * itself is a derived float the reader computes): per (key,
    * col_x, col_y) pair, n, Σx, Σy, Σxy, Σx², Σy² — all exact BIGINT
    * sums, so the profile is bit-identical on any engine and two
    * profiles MERGE by addition (the distributed-profiler property
    * floats lack). One map-side-combined aggregate for all pairs;
    * the caller scales values so Σx² stays under 2⁶³ at its row
    * count (the integer-scaling contract t9/q1b use). Rows with a
    * NULL in ANY profiled column are dropped up front, so `n` counts
    * exactly the rows the sums saw — otherwise the (n, Σ) sufficient
    * statistics are mutually inconsistent and derived r is wrong. */
  def corrStats(df: DataFrame, keyCol: String, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val complete = df.na.drop("any", cols)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(sum(col(c)).as(s"__s_$c"), sum(col(c) * col(c)).as(s"__q_$c"))
    } ++ pairs.map { case (a, b) =>
      sum(col(a) * col(b)).as(s"__p_${a}_$b")
    }
    val wide = complete.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    val entries = pairs.map { case (a, b) =>
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        col("__n").as("n"),
        col(s"__s_$a").as("sum_x"), col(s"__s_$b").as("sum_y"),
        col(s"__p_${a}_$b").as("sum_xy"),
        col(s"__q_$a").as("sum_x2"), col(s"__q_$b").as("sum_y2"))
    }
    wide.select(col(keyCol), explode(array(entries: _*)).as("p"))
      .select(col(keyCol), col("p.*"))
  }

  /** SEMI-STRUCTURED profile of a JSON string column — the schema
    * census a pipeline runs over event logs before promoting fields
    * to real columns: one row per KEY with presence count, fill rate
    * (integer bp of all rows), distinct-value cardinality, and how
    * many values parse as integer / boolean (the promote-to-typed
    * signal). One explode + one aggregate; at 100 TB the key space
    * (not the row count) bounds the output. Malformed JSON rows
    * contribute no keys (from_json null-safe), visible as fill
    * shortfall. */
  def jsonProfile(df: DataFrame, jsonCol: String): DataFrame = {
    val kv = df.select(explode(from_json(col(jsonCol),
      org.apache.spark.sql.types.DataTypes.createMapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))).as(Seq("key", "val")))
    kv.groupBy("key").agg(
        count(lit(1)).as("n_present"),
        sum(col("val").rlike("^-?[0-9]+$").cast("long")).as("n_integer"),
        sum(col("val").isin("true", "false").cast("long")).as("n_boolean"),
        countDistinct("val").as("n_distinct"))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("__t"))))
      .withColumn("fill_bp", expr("n_present * 10000 div __t"))
      .select("key", "n_present", "fill_bp", "n_integer", "n_boolean",
        "n_distinct")
  }

  def keySkew(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val cnts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val glob = cnts.agg(sum("cnt").as("total"), count(lit(1)).as("n_keys"))
    val top = cnts.orderBy(desc("cnt"), asc("key")).limit(topN)
    top
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(desc("cnt"), asc("key"))))
      .crossJoin(broadcast(glob))
      .select(col("key"), col("cnt"), col("rank"),
        // DECIMAL(38,0) intermediates: cnt*100*n_keys in BIGINT
        // overflows 2^63 once cnt~1e8 meets n_keys~1e9 (the 100-TB
        // posture this profiler exists for) and silently wraps;
        // decimal holds to 1e38 and the integral-divide result is
        // bit-identical wherever BIGINT didn't overflow.
        expr("cast((cast(cnt as decimal(38,0)) * 10000) div total as bigint)")
          .as("share_bp"),
        expr("cast((cast(cnt as decimal(38,0)) * 100 * n_keys) div total as bigint)")
          .as("skew_x100"))
  }

  /** Distribution DRIFT between two snapshots of the same table (old
    * crawl vs new crawl, last week vs this week) — the check a
    * training-data pipeline runs before mixing a fresh dump in: both
    * sides bucketed by the same expression, per-bucket share in exact
    * integer basis points, the share delta, and its squared
    * contribution (Σ contrib = the L2 drift score — deliberately NOT
    * the ln-based PSI, whose libm log bits differ across engines;
    * the squared-bp form is all-integer, hence oracle-exact at any
    * scale). Two map-side-combined aggregates to bucket-sized frames
    * + a 1-row broadcast of the totals — no shuffle beyond the
    * groupBys, cost O(rows) regardless of drift. Decimal
    * intermediates for the same 2⁶³-overflow reason as [[keySkew]].
    */
  def drift(a: DataFrame, b: DataFrame, bucket: Column): DataFrame = {
    val ca = a.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("cnt_a"))
    val cb = b.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("cnt_b"))
    val joined = ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val glob = joined.agg(sum("cnt_a").as("tot_a"), sum("cnt_b").as("tot_b"))
    // Degenerate-comparison convention: an EMPTY snapshot (tot = 0 or
    // NULL from an empty join) yields share 0 bp for that side rather
    // than a silent NULL share/diff/contrib — the drift score then
    // reads as "everything on the other side moved", which is the
    // honest answer for comparing against nothing.
    joined.crossJoin(broadcast(glob))
      .select(col("bucket"), col("cnt_a"), col("cnt_b"),
        expr("case when coalesce(tot_a, 0L) = 0L then 0L else " +
          "cast((cast(cnt_a as decimal(38,0)) * 10000) div tot_a as bigint) end")
          .as("share_a_bp"),
        expr("case when coalesce(tot_b, 0L) = 0L then 0L else " +
          "cast((cast(cnt_b as decimal(38,0)) * 10000) div tot_b as bigint) end")
          .as("share_b_bp"))
      .withColumn("diff_bp", col("share_a_bp") - col("share_b_bp"))
      .withColumn("contrib", col("diff_bp") * col("diff_bp"))
  }
}
