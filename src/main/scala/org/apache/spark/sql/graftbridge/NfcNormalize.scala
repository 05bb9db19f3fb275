package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the canonical-
  * composition pass every text pipeline runs BEFORE hashing or
  * dedup: `e` + COMBINING ACUTE (U+0065 U+0301) and the precomposed
  * `é` (U+00E9) are the same text to a human and different bytes to
  * xxhash64, so un-normalized corpora under-deduplicate. Spark ships
  * no normalizer; this native expression wraps the JVM's
  * `java.text.Normalizer` (the Unicode-standard NFC, byte-identical
  * to any conforming implementation — DuckDB's `nfc_normalize`
  * replays it in the oracle) and participates in codegen through one
  * static helper call.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "org.apache.spark.sql.graftbridge.NfcNormalize"
    defineCodeGen(ctx, ev, c => s"$helper.nfc($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Fast path: already-NFC input (the overwhelmingly common case —
    * `Normalizer.isNormalized` is a cheap scan) returns the input
    * UTF8String without re-encoding. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
