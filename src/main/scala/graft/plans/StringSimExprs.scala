package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro-Winkler string similarity as native expressions — the
  * fuzzy-matching primitive Spark doesn't ship (it has only levenshtein);
  * entity-resolution joins need the length-normalized family. Semantics
  * are DUCKDB-PARITY by construction (the oracle's
  * `jaro_similarity` / `jaro_winkler_similarity`), verified value-for-
  * value in tests:
  *  - either side empty → 0.0 (including both empty);
  *  - match window = max(|a|,|b|)/2 − 1, floored at 0;
  *  - transpositions = half the matched-but-out-of-sequence count;
  *  - Winkler boost only when jaro > 0.7, prefix capped at 4, p = 0.1.
  *
  * The generated code calls the static scorer (the same pattern Spark's
  * own `levenshtein` uses via UTF8String) — one method call per row, no
  * boxing, stays inside whole-stage codegen.
  */
object StringSim {

  /** DuckDB-parity Jaro similarity. */
  def jaro(aU: UTF8String, bU: UTF8String): Double = {
    val a = aU.toString
    val b = bU.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val win = math.max(0, math.max(la, lb) / 2 - 1)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - win)
      val hi = math.min(lb - 1, i + win)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && b.charAt(j) == a.charAt(i)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatched = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) mismatched += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - mismatched / 2.0) / md) / 3.0
  }

  /** DuckDB-parity Jaro-Winkler: boost only above 0.7, prefix ≤ 4. */
  def jaroWinkler(aU: UTF8String, bU: UTF8String): Double = {
    val j = jaro(aU, bU)
    if (j <= 0.7) return j
    val a = aU.toString
    val b = bU.toString
    val maxP = math.min(4, math.min(a.length, b.length))
    var l = 0
    while (l < maxP && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

abstract class StringSimExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  protected def scorer: String // static method name on StringSim

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    if (scorer == "jaro") StringSim.jaro(x, y) else StringSim.jaroWinkler(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.plans.StringSim.$scorer($a, $b);")
}

case class JaroSimExpr(left: Expression, right: Expression) extends StringSimExpr {
  override def prettyName: String = "jaro_sim"
  override protected def scorer: String = "jaro"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class JaroWinklerSimExpr(left: Expression, right: Expression) extends StringSimExpr {
  override def prettyName: String = "jaro_winkler_sim"
  override protected def scorer: String = "jaroWinkler"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringSimExprs {
  def jaro(a: Column, b: Column): Column =
    Bridge.column(JaroSimExpr(Bridge.expression(a), Bridge.expression(b)))
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerSimExpr(Bridge.expression(a), Bridge.expression(b)))
}
