package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the batch CDC primitive: given two keyed snapshots
  * of a dimension, emit one row per changed key with the action a
  * MERGE would take (`insert` / `delete` / `update`) and the old/new
  * values of every compared column. Full-outer join on the key
  * (sort-merge — neither snapshot side is assumed broadcastable);
  * null-safe comparison so NULL→value and value→NULL count as
  * updates. Unchanged keys are filtered before the output exchange.
  */
object Snapshot {

  def diff(oldDf: DataFrame, newDf: DataFrame,
           keys: Seq[String], compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val o = oldDf.select((keys ++ compare).map(col): _*).withColumn("__o", lit(1))
    val n = newDf.select((keys ++ compare).map(col): _*).withColumn("__n", lit(1))
    val joined = o.as("o").join(n.as("n"),
      keys.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _), "full_outer")
    val changed =
      if (compare.isEmpty) lit(false)
      else compare.map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    val action = when(col("o.__o").isNull, "insert")
      .when(col("n.__n").isNull, "delete")
      .when(changed, "update")
      .otherwise("unchanged")
    joined.select(
      keys.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++
        Seq(action.as("action")) ++
        compare.flatMap(c =>
          Seq(col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c"))): _*)
      .filter(col("action") =!= "unchanged")
  }

  /** MERGE — apply a [[diff]]-shaped action table onto a base
    * snapshot, producing the next snapshot: `delete` rows vanish,
    * `update` rows take their new values, `insert` rows appear.
    * `applyDiff(old, diff(old, new)) == new` by construction (the
    * round-trip the q45 oracle pins).
    *
    * Scale shape: one anti-join of the base against the diff's keys
    * (both hash-partition on the key — no broadcast assumption; a
    * CDC batch can be arbitrarily large) plus a union with the
    * surviving new-value rows. The base never rewrites rows whose
    * keys the diff doesn't touch — the MERGE contract that makes
    * incremental snapshot maintenance O(changes), not O(table).
    */
  def applyDiff(base: DataFrame, diff: DataFrame,
                keys: Seq[String], compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val untouched = base.select((keys ++ compare).map(col): _*)
      .join(diff.select(keys.map(col): _*), keys, "left_anti")
    val upserts = diff.filter(col("action") =!= "delete")
      .select(keys.map(col) ++ compare.map(c => col(s"new_$c").as(c)): _*)
    untouched.unionByName(upserts)
  }

  /** Incremental AGGREGATE maintenance — the materialized-view form
    * of CDC: fold (count, sum) DELTA rows into a previous aggregate
    * table without touching the base data. Union + re-aggregate on
    * the group key: one exchange sized by |agg table| + |delta|,
    * never by the underlying fact table — recompute cost is
    * O(changes + groups), the whole point of keeping the aggregate
    * incremental at 100 TB. Groups whose count reaches zero vanish
    * (the delete-last-row case); count and sum columns must be the
    * linear (summable) kind — avg/percentile need their linear
    * decompositions maintained instead.
    */
  def mergeAggDeltas(prevAgg: DataFrame, deltas: DataFrame,
                     keys: Seq[String], cntCol: String,
                     sumCols: Seq[String]): DataFrame =
    prevAgg.select((keys ++ (cntCol +: sumCols)).map(col): _*)
      .unionByName(deltas.select((keys ++ (cntCol +: sumCols)).map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(cntCol).as(cntCol),
        sumCols.map(c => sum(c).as(c)): _*)
      .filter(col(cntCol) > 0)
}
