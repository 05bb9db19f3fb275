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
