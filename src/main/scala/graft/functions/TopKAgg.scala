package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state per-group top-k as a typed [[Aggregator]] — the
  * scale-preferred alternative to `row_number().over(Window)` for
  * top-k-per-group: the window form sorts EVERY group row through the
  * exchange, while an aggregate keeps at most k (value, id) pairs per
  * group per partition and merges — map-side partial aggregation
  * bounds both shuffle volume and executor state by k·groups,
  * independent of row count. Ordering is (value DESC, id ASC), a
  * total order, so results are deterministic on any engine.
  *
  * Register with `functions.udaf(TopKAgg(k))` for the Column/SQL
  * surface; the output is the ordered (value, id) list — explode it
  * for the row form.
  */
case class TopKAgg(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, "k must be positive")

  /** Total order: value DESC (NaN ordered largest, matching Spark's
    * `desc` sort semantics — raw `>`/`==` would make NaN compare false
    * both ways and leave insertion-order nondeterminism), then id ASC. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  /** Insert preserving (value desc, id asc) order, capped at k.
    * Buffers are ≤ k+1 elements, so linear insertion is fine. */
  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size >= k && better(buf.last, x)) buf
    else {
      val (front, back) = buf.span(better(_, x))
      (front :+ x) ++ back.take(k - front.size - 1)
    }
  }

  def zero: Seq[(Double, Long)] = Vector.empty

  def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, row)

  def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
