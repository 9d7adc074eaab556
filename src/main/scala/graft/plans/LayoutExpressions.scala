package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** k-dimensional Hilbert key as a native Catalyst expression.
  *
  * Why an Expression and not the [[graft.functions.Layout.hilbert2]]-style
  * `when`-tree unroll: Skilling's transform rewrites coordinate 0 once per
  * (level, dimension) pair, so an unrolled expression tree grows
  * exponentially in k·order, while this generates ONE static call into the
  * shared loop ([[graft.functions.Layout.hilbertIndexInPlace]]) over a
  * per-task scratch buffer — no allocation per row, stays inside
  * whole-stage codegen. Interpreted eval and codegen share the exact same
  * loop, so results are bit-identical across modes.
  */
case class HilbertNExpr(coords: Seq[Expression], order: Int) extends Expression {

  require(coords.length >= 2, s"hilbert_n needs at least 2 coordinates, got ${coords.length}")
  require(
    order >= 1 && order * coords.length <= 63,
    s"hilbert_n(${coords.length} dims, order $order) overflows a long")

  override def children: Seq[Expression] = coords
  override def dataType: DataType = LongType
  override def nullable: Boolean = coords.exists(_.nullable)
  override def prettyName: String = "hilbert_n"

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](coords.length)
    var i = 0
    while (i < coords.length) {
      val v = coords(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    graft.functions.Layout.hilbertIndexInPlace(order, xs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = coords.map(_.genCode(ctx))
    // one scratch buffer per generated class instance — hilbertIndexInPlace
    // mutates it, which is the point (zero per-row allocation)
    val xs = ctx.addMutableState(
      "long[]",
      "hilbertScratch",
      v => s"$v = new long[${coords.length}];")
    val nullCheck =
      if (nullable) evals.map(_.isNull).mkString(" || ") else "false"
    val fill = evals.zipWithIndex
      .map { case (e, i) => s"$xs[$i] = ${e.value};" }
      .mkString("\n")
    ev.copy(code = code"""
      |${evals.map(_.code).reduce(_ + _)}
      |boolean ${ev.isNull} = $nullCheck;
      |long ${ev.value} = -1L;
      |if (!${ev.isNull}) {
      |  $fill
      |  ${ev.value} = graft.functions.Layout$$.MODULE$$.hilbertIndexInPlace($order, $xs);
      |}
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(coords = newChildren)
}

object LayoutExpressions {

  /** [[HilbertNExpr]] over k columns (cast to long first — partition-ish
    * key columns arrive as int/date ordinals).
    */
  def hilbertN(cols: Seq[Column], order: Int): Column =
    Bridge.column(HilbertNExpr(cols.map(c => Bridge.expression(c.cast("long"))), order))
}
