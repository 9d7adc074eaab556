package graft.tools
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(2)
    val p = spark.sessionState.sqlParser
    val sql = "SELECT category, count(*) AS n, sum(n * wt) AS nw FROM snapcat.ev JOIN snapcat.dim d ON ev.event_type = d.et WHERE n > 0 GROUP BY category"
    val plan = p.parsePlan(sql)
    println("=== plan ===")
    println(plan.treeString)
    import org.apache.spark.sql.catalyst.plans.logical._
    plan foreach {
      case a: Aggregate =>
        a.groupingExpressions.foreach(g => println(s"group: ${g.getClass.getSimpleName} sql=${g.sql} origin=${g.origin.startIndex}/${g.origin.stopIndex}"))
        a.aggregateExpressions.foreach(e => println(s"agg: ${e.getClass.getSimpleName} sql=${e.sql} origin=${e.origin.startIndex}/${e.origin.stopIndex}"))
      case _ =>
    }
    spark.stop()
  }
}
