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
}
