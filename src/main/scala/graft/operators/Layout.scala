package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout keys. Sorting by a space-filling
  * curve (Morton / z-order) clusters rows that are close in BOTH key
  * dimensions into the same files and row groups, so parquet min/max
  * statistics stay selective for predicates on EITHER column — the
  * standard layout answer when one table serves several filter
  * columns at 100-TB scale and single-column range sorting
  * (Sinks.writeSorted) can only favor one of them.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * longs: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Pure codegen'd integer ops — stays inside whole-stage codegen.
    */
  def zorderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .plus(shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** N-dimensional Morton interleave of the low `bits` bits of each
    * column: bit i of dimension j lands at position i·n + j — the
    * 3-plus-filter-dimension layout (date × tenant × region) the 2-D
    * [[zorderKey]] can't serve. Same pure codegen'd integer ops;
    * bits·n must fit a non-negative long. [[zorderKey]] is the n=2
    * special case (argument order preserved: a = dimension 0). */
  def interleaveKey(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "interleave needs at least 2 dimensions")
    require(bits >= 1 && bits * n <= 62, s"bits*dims must fit a long: $bits*$n")
    (for (i <- 0 until bits; (c, j) <- cols.zipWithIndex) yield
      shiftleft(shiftrightunsigned(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    ).reduce(_ + _)
  }

  /** n-dimensional HILBERT-curve key of the low `bits` bits of each
    * column — the 4-plus-dimension clustering curve. Morton locality
    * degrades past ~3 dims: a contiguous Morton key span fixes only
    * the top interleaved bit-planes, so at n = 4 a 64-file span
    * constrains each dimension's single top bit and STRIDES across
    * everything below it (diagonal jumps), while consecutive Hilbert
    * positions are always Manhattan-adjacent cells — a key span is a
    * compact blob, and per-file min/max stats stay selective on
    * EVERY dimension. Native expression (Skilling transform,
    * [[org.apache.spark.sql.graftbridge.HilbertIndex]]); same
    * non-negative-input contract as [[interleaveKey]]. */
  def hilbertKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "hilbert needs at least 2 dimensions")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits*dims must fit a long: $bits*${cols.size}")
    org.apache.spark.sql.graftbridge.VectorFunctions
      .hilbert_index(bits, cols.map(_.cast("long")): _*)
  }

  /** SQL mirror of [[zorderKey]] in div/mod arithmetic (no engine-
    * specific bit operators): `intDiv` is `div` for Spark SQL, `//`
    * for DuckDB. */
  def zorderSql(a: String, b: String, bits: Int, intDiv: String): String = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      val p = 1L << i
      s"((($a) $intDiv $p) % 2) * ${1L << (2 * i)} + ((($b) $intDiv $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")
  }
}
