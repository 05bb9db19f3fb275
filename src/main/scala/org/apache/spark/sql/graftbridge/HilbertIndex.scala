package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** n-dimensional Hilbert-curve index of the low `bits` bits of each
  * child (all longs) — the 4-plus-dimension clustering key where
  * Morton interleave ([[graft.operators.Layout.interleaveKey]])
  * degrades: consecutive Hilbert positions are ALWAYS adjacent cells
  * (Manhattan distance 1, no diagonal jumps), so a contiguous key
  * span covers a compact spatial blob in every dimension, while a
  * Morton span at n ≥ 4 strides across the low-order dimensions.
  *
  * Algorithm: the public-domain Skilling transform (John Skilling,
  * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004) —
  * coords → transpose form via bit exchange/Gray steps, then MSB-first
  * bit interleave into one long. Pure integer ops, evaluated through
  * one static helper call from whole-stage codegen (the loop is
  * data-dependent across bit planes, unlike Morton's free-form bit
  * scatter, so it is a helper call rather than inline expression
  * algebra).
  */
case class HilbertIndex(children: Seq[Expression], bits: Int)
    extends Expression with ExpectsInputTypes {

  require(children.size >= 2, "hilbert_index needs at least 2 dimensions")
  require(bits >= 1 && bits * children.size <= 62,
    s"bits*dims must fit a long: $bits*${children.size}")

  override def inputTypes: Seq[AbstractDataType] = Seq.fill(children.size)(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertIndex.hilbertTransform(xs, bits)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val xs = ctx.freshName("xs")
    // companion-object static forwarder on the case class
    val helper = "org.apache.spark.sql.graftbridge.HilbertIndex"
    val loads = evals.zipWithIndex.map { case (e, i) =>
      s"""${e.code}
         |if (${e.isNull}) { ${ev.isNull} = true; } else { $xs[$i] = ${e.value}; }"""
        .stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long ${ev.value} = 0L;
        |long[] $xs = new long[${children.size}];
        |$loads
        |if (!${ev.isNull}) { ${ev.value} = $helper.hilbertTransform($xs, $bits); }
        """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object HilbertIndex {
  /** Skilling AxesToTranspose + MSB-first interleave. Mutates and
    * masks `x` in place; returns the Hilbert index. */
  def hilbertTransform(x: Array[Long], bits: Int): Long = {
    val n = x.length
    val mask = (1L << bits) - 1
    var i = 0
    while (i < n) { x(i) &= mask; i += 1 }
    val m = 1L << (bits - 1)
    // inverse undo: exchange/invert low bit-planes under each Q plane
    var q = m
    while (q > 1) {
      val p = q - 1
      var j = 0
      while (j < n) {
        if ((x(j) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(j)) & p; x(0) ^= t; x(j) ^= t }
        j += 1
      }
      q >>= 1
    }
    // Gray encode
    var j = 1
    while (j < n) { x(j) ^= x(j - 1); j += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    j = 0
    while (j < n) { x(j) ^= t; j += 1 }
    // transpose → index: X[0]'s bit is most significant in each plane
    var h = 0L
    var qi = bits - 1
    while (qi >= 0) {
      var d = 0
      while (d < n) { h = (h << 1) | ((x(d) >>> qi) & 1L); d += 1 }
      qi -= 1
    }
    h
  }
}
