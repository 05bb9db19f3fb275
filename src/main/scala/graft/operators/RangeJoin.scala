package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketed) range join: match left intervals `[lo, hi]` with
  * right points `point`.
  *
  * A naive inequality join degenerates to a broadcast-nested-loop —
  * O(L×R) — which is fatal at scale. Instead both sides are mapped to
  * integer buckets of `bucketWidth` (left intervals explode to the
  * buckets they overlap, right points to exactly one), the join runs as
  * an equi hash join on the bucket id, and the precise range predicate
  * filters within buckets. Each matching pair lands in exactly one
  * bucket (the point's), so no post-dedup is needed. Explode factor is
  * `ceil(span/width)+1` per left row — pick `bucketWidth` on the order
  * of the interval span.
  */
object RangeJoin {
  def joinPointInRange(left: DataFrame, right: DataFrame,
                       lo: String, hi: String, point: String,
                       bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__b",
      explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long"))))
    val rb = right.withColumn("__b", floor(col(point) / bucketWidth).cast("long"))
    lb.join(rb, Seq("__b"))
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("__b", lo, hi)
  }
}
