package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sqrt

/** Column-API surface for graft's native vector expressions.
  *
  * Lives under `org.apache.spark.sql` so it can use the classic
  * module's `private[sql]` Column↔Expression bridge — the supported
  * alternative (SparkSessionExtensions function injection) can't reach
  * sessions the harness constructs before our code runs.
  */
object VectorFunctions {
  private def toExpr(c: Column) =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Dot product of two `array<float>` columns (double). */
  def vec_dot(a: Column, b: Column): Column = toCol(FloatVecDot(toExpr(a), toExpr(b)))

  /** L2 norm of an `array<float>` column (double). */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Cosine similarity of two `array<float>` columns, given
    * precomputed norms (keeps the norm calculation out of the
    * pairwise hot loop). */
  def vec_cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    vec_dot(a, b) / (normA * normB)

  /** n-dimensional Hilbert-curve index of the low `bits` bits of each
    * long column — see [[HilbertIndex]]. */
  def hilbert_index(bits: Int, cols: Column*): Column =
    toCol(HilbertIndex(cols.map(toExpr), bits))

  /** Unicode NFC normalization — see [[NfcNormalize]]. */
  def nfc(s: Column): Column = toCol(NfcNormalize(toExpr(s)))
}
