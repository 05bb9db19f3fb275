package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Dot product over two `array<float>` columns, accumulated in double.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) are
  * CodegenFallback — every element access goes through an interpreted
  * expression tree with per-row closure dispatch, which made the
  * all-pairs cosine stage ~600µs/pair. This native expression
  * participates in whole-stage codegen as a tight primitive loop over
  * the underlying `ArrayData` (no boxing, no allocation), restoring
  * O(dims) work per pair at JIT speed. Semantics match
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0D, +)`
  * exactly — sequential accumulation in double, AND the HOF idiom's
  * null semantics: `zip_with` null-pads the shorter array and any
  * null element turns the whole sum null, so this expression returns
  * NULL on unequal lengths or any null element. That exactness is
  * what lets [[VecDotRewrite]] substitute it into arbitrary user SQL.
  * DuckDB's `list_dot_product` over `DOUBLE[]` casts stays
  * bit-identical on the non-null path.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullable: Boolean = true

  private def elemsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // The element null check is emitted only when an input's element
      // type is actually nullable, keeping the hot path a pure FMA loop.
      val nullCheck =
        if (elemsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
