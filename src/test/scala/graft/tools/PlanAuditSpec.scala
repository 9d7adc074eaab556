package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class PlanAuditSpec extends SparkSpec {

  test("audit sees pushed filters and pruned read schema on a filtered projection") {
    val df = Tables
      .lineitem(spark, sf)
      .filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"), col("l_quantity"))
    val rep = PlanAudit.audit(df)
    assert(rep.scans.nonEmpty)
    val scan = rep.scans.head
    assert(scan.pushedFilters.exists(_.contains("l_quantity")), scan.toString)
    assert(scan.readColumns.toSet == Set("l_orderkey", "l_quantity"), scan.toString)
    assert(rep.unfilteredScans.isEmpty)
    assert(rep.scaleHazards.isEmpty, rep.summary)
  }

  test("audit flags a cartesian product and an unpartitioned window as scale hazards") {
    import org.apache.spark.sql.expressions.Window
    val n = Tables.nation(spark, sf)
    val bad = n
      .crossJoin(Tables.region(spark, sf).hint("shuffle_replicate_nl"))
      .withColumn("rk", row_number().over(Window.orderBy(col("n_nationkey"))))
    val rep = PlanAudit.audit(bad)
    assert(rep.cartesianProducts >= 1, rep.summary)
    assert(rep.unpartitionedWindows.nonEmpty, rep.summary)
    assert(rep.scaleHazards.size >= 2, rep.summary)
  }

  test("audit classifies join strategies (broadcast vs sort-merge)") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val bc = PlanAudit.audit(o.join(broadcast(c), o("o_custkey") === c("c_custkey")))
    assert(bc.joins.exists(_.strategy == "broadcast-hash"), bc.summary)
    val smj = PlanAudit.audit(
      o.hint("merge").join(c.hint("merge"), o("o_custkey") === c("c_custkey")))
    assert(smj.joins.exists(_.strategy == "sort-merge"), smj.summary)
    assert(smj.shuffles >= 1, smj.summary)
  }

  test("registered flagship queries audit clean (the CI-gate usage shape)") {
    // the house claim — no registered query carries a structural scale
    // hazard — asserted through the public API on a representative set
    Seq("q01_pricing_summary", "q11_join4_revenue_by_nation_year", "q172_rfm_segments")
      .foreach { name =>
        val rep = PlanAudit.audit(graft.SparkEntry.queries(name)(spark, sf))
        assert(rep.scaleHazards.isEmpty, s"$name: ${rep.summary}")
      }
  }

  test("codegen coverage is visible (spans counted, breaks listed)") {
    // under AQE, codegen collapse happens per query stage at execution
    // time — materialize first, then audit the final shapes
    val df = Tables.lineitem(spark, sf).groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
    df.collect()
    val rep = PlanAudit.audit(df)
    assert(rep.codegenSpans >= 1, rep.summary)
  }
}
