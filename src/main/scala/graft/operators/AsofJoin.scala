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

  /** Direction- and tolerance-generalized as-of join (the pandas
    * `merge_asof(direction=, tolerance=)` surface) with the SAME
    * single-shuffle union+window shape as [[apply]]:
    *
    *  - `forward = false`: latest right row with rightTime <=
    *    leftTime (backward — [[apply]]'s semantics);
    *  - `forward = true`: earliest right row with rightTime >=
    *    leftTime, implemented by negating the time axis — the one
    *    window pass is direction-agnostic;
    *  - `tolerance`: matches farther than this many time units away
    *    null out (applied AFTER the match: nearest-row semantics,
    *    not nearest-within-window — exactly merge_asof).
    *
    * Tie-break at the boundary time is the greatest payload struct in
    * both directions (deterministic on any engine; mirror in SQL
    * with `ORDER BY t DESC/ASC, payload DESC LIMIT 1`).
    */
  def directed(left: DataFrame, right: DataFrame,
               key: String, leftTime: String, rightTime: String,
               forward: Boolean, tolerance: Option[Long] = None): DataFrame = {
    val f = if (forward) -1L else 1L
    val payloadCols = right.columns.filterNot(_ == key).toSeq
    val payload = struct((rightTime +: payloadCols.filterNot(_ == rightTime))
      .map(c => col(c)): _*)

    val r = right.select(col(key), (col(rightTime).cast("long") * f).as("__time"),
      payload.as("__rp"), lit(1).as("__isR"))
    val l = left.select(col(key), (col(leftTime).cast("long") * f).as("__time"),
      lit(null).cast(r.schema("__rp").dataType).as("__rp"), lit(0).as("__isR"),
      struct(left.columns.map(col): _*).as("__lrow"))

    val unioned = l.unionByName(r.withColumn("__lrow",
      lit(null).cast(l.schema("__lrow").dataType)), allowMissingColumns = false)

    val w = Window.partitionBy(key)
      .orderBy(col("__time").asc, col("__isR").desc, col("__rp").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__m", last("__rp", ignoreNulls = true).over(w))
      .filter(col("__isR") === 0)

    val lt = col(s"__lrow.$leftTime").cast("long")
    val rt = col(s"__m.$rightTime").cast("long")
    val gap = if (forward) rt - lt else lt - rt
    val ok = tolerance
      .map(tol => col("__m").isNotNull && gap <= tol)
      .getOrElse(col("__m").isNotNull)

    val leftCols = left.columns.map(c => col(s"__lrow.$c").as(c)).toSeq
    val rightCols = payloadCols.map(c => when(ok, col(s"__m.$c")).as(c))
    matched.select((leftCols ++ rightCols :+ when(ok, gap).as("asof_gap")): _*)
  }

  /** Nearest-either-direction as-of join (pandas
    * `merge_asof(direction='nearest')`) — the remaining member of
    * the family ([[apply]] is backward, [[directed]] adds forward +
    * tolerance): each left row takes the right row minimizing
    * |rightTime − leftTime|; an exact distance tie between a
    * backward and a forward match resolves BACKWARD (the already-
    * observed row — the causally safe choice, and pandas's);
    * same-time right rows tie-break to the greatest payload struct,
    * [[directed]]'s convention. Same single-shuffle union shape: one
    * exchange on the key, two in-partition window sorts (backward
    * suffix + forward suffix), a per-row choose. `tolerance` nulls
    * matches farther than that many time units AFTER the choice —
    * nearest-row semantics, exactly merge_asof. */
  def nearest(left: DataFrame, right: DataFrame,
              key: String, leftTime: String, rightTime: String,
              tolerance: Option[Long] = None): DataFrame = {
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
    val wb = Window.partitionBy(key)
      .orderBy(col("__time").asc, col("__isR").desc, col("__rp").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(key)
      .orderBy(col("__time").desc, col("__isR").desc, col("__rp").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = unioned
      .withColumn("__b", last("__rp", ignoreNulls = true).over(wb))
      .withColumn("__f", last("__rp", ignoreNulls = true).over(wf))
      .filter(col("__isR") === 0)
    val db = col("__time") - col(s"__b.$rightTime").cast("long")
    val dfw = col(s"__f.$rightTime").cast("long") - col("__time")
    val useB = col("__f").isNull || (col("__b").isNotNull && db <= dfw)
    val chosen = when(useB, col("__b")).otherwise(col("__f"))
    val dist = when(useB, db).otherwise(dfw)
    val ok = tolerance
      .map(tol => chosen.isNotNull && dist <= tol)
      .getOrElse(chosen.isNotNull)
    val leftCols = left.columns.map(c => col(s"__lrow.$c").as(c)).toSeq
    val rightCols = payloadCols.map(c =>
      when(ok, chosen.getField(c)).as(c))
    m.select((leftCols ++ rightCols :+ when(ok, dist).as("asof_gap")): _*)
  }
}
