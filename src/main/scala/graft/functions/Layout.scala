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
}
