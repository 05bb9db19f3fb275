package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling-distinct engagement (DAU / WAU / MAU / N-day actives) for
  * ARBITRARY window lengths.
  *
  * Distinct-over-a-range has no window-function form, so there are two
  * scale postures:
  *
  *  - [[rollingDistinctExact]]: spread each (day, user) membership to
  *    its `windowDays` cover days and count per cover day. EXACT, but
  *    the exchange carries `windowDays × |daily actives|` rows — fine
  *    for 7-day stickiness, 90× row expansion for a quarter window.
  *    Retained as the oracle path and for small windows.
  *
  *  - [[rollingDistinctHll]]: the 100-TB plan. ONE pass over the events
  *    builds a per-day HLL sketch (Spark 4's Apache DataSketches
  *    `hll_sketch_agg`); the window merge then spreads SKETCHES, not
  *    users — `windowDays × |days|` rows of a few KB each, independent
  *    of user cardinality, so a 90-day window costs the same exchange
  *    as a 7-day one. Sketch merge is lossless (union of HLL registers,
  *    pinned by SketchRollupSpec), so the windowed estimate equals the
  *    single-pass estimate over the window's raw rows; the estimate
  *    itself carries HLL's documented relative error (~1.04/√2^lgK).
  *    Per-day sketches are also the right MATERIALIZATION: persist
  *    them once and answer any window length later without rescanning
  *    the event log.
  */
object Engagement {

  /** Exact N-day rolling distinct users. `userDays` must have columns
    * (`day`: long, `user_id`) — pre-distincting is done here. Output:
    * (`day`, `active`) for each day observed in the input, counting
    * distinct users active in [day − windowDays + 1, day]. */
  def rollingDistinctExact(userDays: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val ud = userDays.select("day", "user_id").distinct()
    val days = ud.select("day").distinct()
    ud.select(explode(expr(s"sequence(day, day + ${windowDays - 1})")).as("day"),
        col("user_id"))
      .distinct()
      // only days that actually occur report (no phantom trailing days)
      .join(days, Seq("day"), "left_semi")
      .groupBy("day").agg(count(lit(1)).as("active"))
  }

  /** Per-day HLL sketch partials — the materialization unit. One
    * shuffle of the deduped (day, user) pairs, output is |days| rows
    * each holding a binary sketch. `lgConfigK` 14 → rsd ≈ 0.8%. */
  def dailySketches(userDays: DataFrame, lgConfigK: Int = 14): DataFrame =
    userDays.select("day", "user_id")
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id"), lit(lgConfigK)).as("sk"))

  /** N-day rolling distinct estimate from per-day sketches: spread each
    * day's sketch to its cover days and merge per cover day. The only
    * exchange after the per-day partials carries `windowDays × |days|`
    * sketch rows — user-cardinality-independent. Output: (`day`,
    * `active_est`). */
  def rollingDistinctHll(userDays: DataFrame, windowDays: Int,
                         lgConfigK: Int = 14): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val perDay = dailySketches(userDays, lgConfigK)
    val days = userDays.select("day").distinct()
    perDay
      .select(explode(expr(s"sequence(day, day + ${windowDays - 1})")).as("day"),
        col("sk"))
      .join(days, Seq("day"), "left_semi")
      .groupBy("day")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("active_est"))
  }
}
