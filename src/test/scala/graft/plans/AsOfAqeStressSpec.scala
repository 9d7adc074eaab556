package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE-interaction stress: the native as-of join's zipPartitions contract
  * requires both children to keep identical partitioning — adaptive
  * coalescing must not desynchronize them. Runs at sf0.1 (enough rows for
  * AQE to want coalescing) and cross-checks the window-based formulation.
  */
class AsOfAqeStressSpec extends SparkSpec {

  test("native as-of equals window form at sf0.1 under AQE") {
    import spark.implicits._
    val big = "/root/testdata/sf0.1"
    val ev = graft.core.Tables.events(spark, big)
    val errors = ev.filter($"event_type" === "error").select("event_id", "user_id", "ts")
    val purchases4 = ev
      .filter($"event_type" === "purchase")
      .select($"user_id".as("p_uid"), $"ts".as("p_ts"), $"event_id".as("p_eid"), $"value".as("pv"))

    val native = AsOfJoin
      .join(errors, purchases4, "user_id", "p_uid", "ts", "p_ts", "p_eid")
      .select($"event_id", coalesce($"pv", lit(-1.0)).as("pv"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

    val windowed = graft.operators.TimeSeriesOps
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

    assert(native.size == windowed.size)
    assert(native == windowed)
  }
}
