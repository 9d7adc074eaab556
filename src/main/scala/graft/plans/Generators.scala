package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Native Catalyst [[CollectionGenerator]] — the UDTF leg of the extension
  * surface (Expression / Aggregator / Rule / Strategy / Generator). A
  * custom generator plans as a `Generate` node exactly like `explode`;
  * implementing the COLLECTION flavor (with `doGenCode` via the same
  * static-call pattern as [[StringSimExprs]]) keeps the node inside
  * whole-stage codegen: GenerateExec inlines the array traversal in
  * generated code instead of boxing through an eval'd iterator — so the
  * fan-out does not split the codegen span the way a CodegenFallback
  * generator would.
  *
  * `graft_hour_split(start_us, end_us)`: splits a half-open interval
  * [start_us, end_us) in epoch microseconds at hour boundaries, emitting
  * one row per touched hour — (hour_us = hour start epoch-µs,
  * overlap_us = microseconds of the interval inside that hour). Pure
  * integer arithmetic, deterministic output order (ascending hours).
  */
case class HourSplitGenerator(start: Expression, end: Expression) extends CollectionGenerator {

  override def children: Seq[Expression] = Seq(start, end)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_hour_split(start_us, end_us) takes two BIGINT epoch-µs arguments")

  override def elementSchema: StructType = StructType(
    Seq(StructField("hour_us", LongType, nullable = false), StructField("overlap_us", LongType, nullable = false)))

  /** Rows are structs inlined into the output (like `inline`), no
    * position column (unlike `posexplode`).
    */
  override def inline: Boolean = true
  override def position: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  /** Interpreted path returns ROWS (the Generator contract); the codegen
    * path below returns the COLLECTION (the CollectionGenerator
    * contract GenerateExec's generated loop consumes).
    */
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s0v = start.eval(input)
    val e0v = end.eval(input)
    if (s0v == null || e0v == null) Nil
    else {
      val arr = HourSplitGenerator.split(s0v.asInstanceOf[Long], e0v.asInstanceOf[Long])
      (0 until arr.numElements()).map(i => arr.getStruct(i, 2))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sCode = start.genCode(ctx)
    val eCode = end.genCode(ctx)
    val empty = classOf[GenericArrayData].getName
    val block =
      code"""
        ${sCode.code}
        ${eCode.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (${sCode.isNull} || ${eCode.isNull}) {
          ${ev.value} = new $empty(new Object[0]);
        } else {
          ${ev.value} = graft.plans.HourSplitGenerator.split(${sCode.value}, ${eCode.value});
        }
      """
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HourSplitGenerator =
    copy(start = newChildren(0), end = newChildren(1))
}

object HourSplitGenerator {
  private val HourUs = 3600000000L

  /** Static kernel shared by eval and generated code (the StringSim
    * static-call codegen pattern): one allocation for the result array,
    * pure integer arithmetic.
    */
  def split(s0: Long, e0: Long): ArrayData = {
    if (e0 <= s0) return new GenericArrayData(Array.empty[Any])
    val h0 = Math.floorDiv(s0, HourUs)
    val h1 = Math.floorDiv(e0 - 1, HourUs)
    val out = new Array[Any]((h1 - h0 + 1).toInt)
    var h = h0
    var i = 0
    while (h <= h1) {
      val lo = math.max(s0, h * HourUs)
      val hi = math.min(e0, (h + 1) * HourUs)
      out(i) = InternalRow(h * HourUs, hi - lo)
      h += 1
      i += 1
    }
    new GenericArrayData(out)
  }
}
