package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scalable as-of ("latest right row at or before the left row's time")
  * join.
  *
  * Shape: tag + union both sides, hash-partition by `key`, one
  * per-partition sort, one window pass carrying the right payload
  * forward with `last(ignoreNulls)`. This is the merge-asof pattern —
  * a single shuffle on the key, no per-row subquery, no range
  * cross-product — so it survives fact×fact sizes at 100 TB (contrast
  * with a windowless broadcast-and-filter, which is O(L×R) per key).
  *
  * Semantics: for each left row, the right row with the greatest
  * `(rightTime, payload)` such that `rightTime <= leftTime`; NULLs when
  * no such row. Payload struct ordering (rightTime first) makes the
  * winner deterministic when several right rows share a timestamp.
  */
object AsofJoin {
  def apply(left: DataFrame, right: DataFrame,
            key: String, leftTime: String, rightTime: String): DataFrame = {
    val payloadCols = right.columns.filterNot(_ == key).toSeq
    val payload = struct((rightTime +: payloadCols.filterNot(_ == rightTime))
      .map(c => col(c)): _*)

    val r = right.select(col(key), col(rightTime).cast("long").as("__time"),
      payload.as("__rp"), lit(1).as("__isR"))
    val l = left.select(col(key), col(leftTime).cast("long").as("__time"),
      lit(null).cast(r.schema("__rp").dataType).as("__rp"), lit(0).as("__isR"),
      struct(left.columns.map(col): _*).as("__lrow"))

    val unioned = l.unionByName(r.withColumn("__lrow",
      lit(null).cast(l.schema("__lrow").dataType)), allowMissingColumns = false)

    // Right rows sort before left rows at equal time so an equal-time
    // right row is visible to the left row (<= semantics).
    val w = Window.partitionBy(key)
      .orderBy(col("__time").asc, col("__isR").desc, col("__rp").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__m", last("__rp", ignoreNulls = true).over(w))
      .filter(col("__isR") === 0)

    val leftCols = left.columns.map(c => col(s"__lrow.$c").as(c)).toSeq
    val rightCols = payloadCols.map(c => col(s"__m.$c").as(c))
    matched.select(leftCols ++ rightCols: _*)
  }
}
