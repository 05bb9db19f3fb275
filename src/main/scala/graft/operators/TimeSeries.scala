package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream
  * onto a fixed grid per key and forward-fill gaps — the step before
  * any windowed model sees sensor/metric data. The grid is generated
  * per key from its own [min, max] span (`sequence` — narrow, no
  * shuffle beyond the per-key agg), observations join back on
  * (key, slot), and the fill is one ordered window per key:
  * `last(value, ignoreNulls)` over preceding rows. Parallelism is the
  * key count; no global sort anywhere.
  */
object TimeSeries {

  /** @param df        input events
    * @param keyCol    series key
    * @param tsCol     epoch-seconds column
    * @param valCol    numeric observation
    * @param slotSecs  grid resolution in seconds
    * @return (key, slot, v, filled): `v` = the slot's own aggregate
    *         (sum, 2-rounded) or null for gap slots; `filled` = v
    *         forward-filled from the latest earlier observation.
    */
  /** EXACT exponentially-weighted moving average (α = 1/2) — the
    * classic smoothing signal, made bit-reproducible on any engine by
    * staying INTEGER end-to-end: observations quantize to cents per
    * row, the decay coefficients are powers of two, and the truncated
    * recurrence y_t = Σ_{k<depth} cents_{t−k}·2^(depth−1−k) emits the
    * EWMA scaled by 2^depth as a plain BIGINT — dyadic arithmetic, so
    * there is no float rounding to drift and no accumulation-order
    * sensitivity (the q1b lesson applied to a WINDOW aggregate; a
    * double-αⁿ formulation would be engine-order-dependent exactly
    * like q1's sums at 100×). Truncation at `depth` drops mass below
    * 2^-depth — beneath the quantization floor for depth ≥ 17.
    *
    * Scale shape: one per-key ordered window pass evaluating `depth`
    * lag slots — parallelism = series count, state per row = depth
    * longs, no global sort. Ties in `tsCol` break on `idCol`, so the
    * series order (and thus the value) is total on any engine.
    */
  def ewmaExact(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                valCol: String, depth: Int = 32): DataFrame = {
    // cents ≤ 2^20 by contract keeps Σ cents·2^(depth-1) < 2^63 for
    // depth ≤ 42; 32 covers far below any quantized signal floor
    require(depth >= 1 && depth <= 42, s"depth out of range: $depth")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val cents = expr(s"CAST(round($valCol*100) AS BIGINT)")
    val y = (0 until depth)
      .map(k => lag(cents, k, 0L).over(w) * lit(1L << (depth - 1 - k)))
      .reduce(_ + _)
    df.select(col(keyCol), col(tsCol), col(idCol),
      y.as(s"ewma_x2p$depth"))
  }

  def gapFill(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              slotSecs: Long): DataFrame = {
    require(slotSecs >= 1, "slotSecs must be positive")
    val obs = df.select(col(keyCol).as("key"),
        expr(s"$tsCol div $slotSecs").as("slot"), col(valCol).as("__v"))
      .groupBy("key", "slot").agg(round(sum("__v"), 2).as("v"))
    val grid = obs.groupBy("key")
      .agg(min("slot").as("__lo"), max("slot").as("__hi"))
      .select(col("key"), explode(expr("sequence(__lo, __hi)")).as("slot"))
    val w = Window.partitionBy("key").orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "slot"), "left")
      .withColumn("filled", last("v", ignoreNulls = true).over(w))
  }
}
