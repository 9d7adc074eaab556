package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-layout helpers: space-filling-curve keys for multi-dimensional
  * data clustering. Sorting (or range-partitioning) a table by a Z-order
  * key co-locates rows that are close in BOTH dimensions, so min/max
  * file statistics prune 2-D box predicates — the classic layout trick
  * for 100 TB fact tables queried by (customer, date)-style boxes, where
  * a single-column sort only ever prunes one of the two.
  */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` bits of two non-negative
    * long columns: bit i of x lands at position 2i, bit i of y at 2i+1.
    * Pure codegen'd bit arithmetic — no UDF, no shuffle.
    */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits)
      .map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }
      .reduce(_ + _)
      .cast("long")

  /** DuckDB twin of [[zorder2]] for oracle strings. Fully parenthesized:
    * DuckDB gives `+` higher precedence than `<<` (C-style), so the naive
    * `a << 2*i + b` parses as `a << (2*i + b)`.
    */
  def sqlZorder2(x: String, y: String, bits: Int = 16): String =
    s"""CAST(list_sum(list_transform(range(0, $bits),
       |    i -> (((($x) >> i) & 1) << (2*i)) + (((($y) >> i) & 1) << (2*i+1))
       |  )) AS BIGINT)""".stripMargin

  /** Driver-side Hilbert index (xy→d) at the given order (grid side
    * 2^order). The standard iterative quadrant-rotation walk — Hilbert
    * keys preserve locality strictly better than Morton (no Z-shaped
    * jumps across the midline), which tightens min/max file-statistic
    * boxes when range-partitioning a 100 TB table by the key.
    */
  def hilbertIndex(order: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s: Long = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** [[hilbertIndex]] as a codegen'd column expression: the level loop is
    * unrolled at plan-build time into pure bit arithmetic (no UDF, no
    * shuffle). Each level rewrites (x, y) through a `when` rotation, so
    * the expression tree grows ~3× per level — fine for the catalog-key
    * orders (≤ 8); a deeper curve would move to a native Expression with
    * a real loop, exactly like CosineSimExpr.
    */
  def hilbert2(x0: Column, y0: Column, order: Int): Column = {
    require(order >= 1 && order <= 8, s"hilbert2 expression unroll supports order 1..8, got $order")
    var x = x0.cast("long"); var y = y0.cast("long"); var d = lit(0L)
    var s: Long = 1L << (order - 1)
    while (s > 0) {
      val rx = when(x.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      d = d + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)
      // flip-then-swap: newx = flipped old y, newy = flipped old x
      val nx = when(ry === 0, when(rx === 1, lit(s - 1) - y).otherwise(y)).otherwise(x)
      val ny = when(ry === 0, when(rx === 1, lit(s - 1) - x).otherwise(x)).otherwise(y)
      x = nx; y = ny
      s >>= 1
    }
    d
  }

  /** The full xy→d table at `order` as a flat array (`x * side + y`),
    * for oracle SQL (spliced as a DuckDB list literal) and for parity
    * tests of [[hilbert2]].
    */
  def hilbertTable(order: Int): Array[Long] = {
    val side = 1 << order
    Array.tabulate(side * side)(i => hilbertIndex(order, (i / side).toLong, (i % side).toLong))
  }
}
