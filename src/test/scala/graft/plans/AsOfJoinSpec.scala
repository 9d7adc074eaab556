package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeSeriesOps

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("native as-of join matches the window-based implementation on the fixture") {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, sf)
    val errors = ev.filter($"event_type" === "error").select("event_id", "user_id", "ts")
    val purchases = ev
      .filter($"event_type" === "purchase")
      .select($"user_id".as("p_uid"), $"ts".as("p_ts"), $"event_id".as("p_eid"), $"value".as("pv"))

    val native = AsOfJoin
      .join(errors, purchases, "user_id", "p_uid", "ts", "p_ts", "p_eid")
      .select($"event_id", coalesce($"pv", lit(-1.0)).as("pv"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

    val windowed = TimeSeriesOps
      .asOfJoin(
        errors,
        ev.filter($"event_type" === "purchase").select("user_id", "ts", "event_id", "value"),
        "user_id",
        "ts",
        "ts",
        "event_id",
        Map("value" -> "pv"))
      .select($"event_id", coalesce($"pv", lit(-1.0)).as("pv"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

    assert(native == windowed)
    assert(native.nonEmpty)
  }

  test("equal-timestamp right row qualifies; max tie wins; no match gives null") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 08:00:00")), // before any purchase -> null
      (3L, 200L, ts("2024-01-01 12:00:00"))) // other key
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 10:00:00"), 5L, 50.0),
      (100L, ts("2024-01-01 10:00:00"), 7L, 70.0),
      (100L, ts("2024-01-01 09:00:00"), 3L, 30.0),
      (200L, ts("2024-01-01 11:00:00"), 9L, 90.0))
      .toDF("p_uid", "p_ts", "p_eid", "pv")
    val out = AsOfJoin
      .join(left, right, "user_id", "p_uid", "ts", "p_ts", "p_eid")
      .select($"event_id", $"pv")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1L).contains(70.0)) // equal-ts, max tie
    assert(out(2L).isEmpty) // no earlier purchase
    assert(out(3L).contains(90.0))
  }

  test("physical plan is the custom exec over sorted hash-clustered children") {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, sf)
    val errors = ev.filter($"event_type" === "error").select("event_id", "user_id", "ts")
    val purchases = ev
      .filter($"event_type" === "purchase")
      .select($"user_id".as("p_uid"), $"ts".as("p_ts"), $"event_id".as("p_eid"), $"value".as("pv"))
    val df = AsOfJoin.join(errors, purchases, "user_id", "p_uid", "ts", "p_ts", "p_eid")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // the custom exec node
    assert(plan.contains("Exchange hashpartitioning"), plan) // clustered children
    assert(plan.contains("Sort ["), plan) // sorted merge input
    assert(plan.contains("PushedFilters: [IsNotNull(event_type)"), plan) // scan pushdown survives
    assert(!plan.contains("WindowExec"), plan) // no window fallback
  }

  test("PruneAsOfJoinColumns pushes a Project into both children and reaches the scan ReadSchema") {
    import spark.implicits._
    // use the raw parquet table (not the pre-projected frames): the rule's
    // job is exactly to prune a WIDE child a caller passed whole
    val ev = graft.core.Tables.events(spark, sf)
    val errors = ev.filter($"event_type" === "error")
    val purchases = ev
      .filter($"event_type" === "purchase")
      .select(
        $"user_id".as("p_uid"), $"ts".as("p_ts"), $"event_id".as("p_eid"),
        $"value".as("pv"), $"props".as("p_props"), $"event_type".as("p_type"))
    val joined = AsOfJoin
      .join(errors, purchases, "user_id", "p_uid", "ts", "p_ts", "p_eid")
      .select($"event_id", $"pv") // references 2 of the 12 output columns
    val optimized = joined.queryExecution.optimizedPlan.toString
    // the node's children must be pruned projections, not full outputs
    assert(!optimized.contains("p_props"), optimized)
    val physical = joined.queryExecution.executedPlan.toString
    // pruning must fold into the parquet scan: no props/value noise on the
    // left read schema, no props on the right
    assert(!physical.contains("p_props"), physical)
    // and the results are identical to the unpruned evaluation
    val got = joined.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val want = AsOfJoin
      .join(errors, purchases, "user_id", "p_uid", "ts", "p_ts", "p_eid")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("pv"))) None else Some(r.getAs[Double]("pv"))))
      .toMap
    assert(got == want)
  }

  test("exec reports SQL metrics: every left row emitted, match count exact") {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, sf)
    val errors = ev.filter($"event_type" === "error").select("event_id", "user_id", "ts")
    val purchases = ev
      .filter($"event_type" === "purchase")
      .select($"user_id".as("p_uid"), $"ts".as("p_ts"), $"event_id".as("p_eid"), $"value".as("pv"))
    val joined = AsOfJoin.join(errors, purchases, "user_id", "p_uid", "ts", "p_ts", "p_eid")
    val rows = joined.collect()
    // AQE wraps materialized stages (incl. the result stage) in
    // QueryStageExec leaves — collect() does not descend into them
    def find(p: org.apache.spark.sql.execution.SparkPlan): Option[AsOfJoinExec] = p match {
      case e: AsOfJoinExec => Some(e)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(q.plan)
      case other => other.children.view.flatMap(find).headOption
    }
    val exec = find(joined.queryExecution.executedPlan)
      .getOrElse(fail("AsOfJoinExec not in executed plan"))
    assert(exec.metrics("numOutputRows").value == rows.length.toLong)
    val wantMatched = rows.count(!_.isNullAt(rows.head.fieldIndex("p_eid"))).toLong
    assert(exec.metrics("numMatched").value == wantMatched)
    assert(wantMatched > 0 && wantMatched <= rows.length)
  }
}
