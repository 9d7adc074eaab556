package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Native Catalyst [[Generator]] — the UDTF leg of the extension surface
  * (Expression / Aggregator / Rule / Strategy / Generator). A custom
  * generator plans as a `Generate` node exactly like `explode`, so the
  * row fan-out happens inside the executor pipeline with no intermediate
  * array materialization: `explode(sequence(...))` + per-row arithmetic
  * would allocate the boundary array per row; this emits segments
  * straight from the loop.
  *
  * `graft_hour_split(start_us, end_us)`: splits a half-open interval
  * [start_us, end_us) in epoch microseconds at hour boundaries, emitting
  * one row per touched hour — (hour_us = hour start epoch-µs,
  * overlap_us = microseconds of the interval inside that hour). Pure
  * integer arithmetic, deterministic output order (ascending hours).
  */
case class HourSplitGenerator(start: Expression, end: Expression)
    extends Generator
    with CodegenFallback {

  private val HourUs = 3600000000L

  override def children: Seq[Expression] = Seq(start, end)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_hour_split(start_us, end_us) takes two BIGINT epoch-µs arguments")

  override def elementSchema: StructType = StructType(
    Seq(StructField("hour_us", LongType, nullable = false), StructField("overlap_us", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s0v = start.eval(input)
    val e0v = end.eval(input)
    if (s0v == null || e0v == null) Nil
    else {
      val s0 = s0v.asInstanceOf[Long]
      val e0 = e0v.asInstanceOf[Long]
      if (e0 <= s0) Nil
      else {
        val h0 = Math.floorDiv(s0, HourUs)
        val h1 = Math.floorDiv(e0 - 1, HourUs)
        (h0 to h1).map { h =>
          val lo = math.max(s0, h * HourUs)
          val hi = math.min(e0, (h + 1) * HourUs)
          InternalRow(h * HourUs, hi - lo)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HourSplitGenerator =
    copy(start = newChildren(0), end = newChildren(1))
}
