package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the re-aggregatable HLL distinct: per-bucket and merged
  * estimates bounded against exact, and merge-order invariance (the
  * property that makes sketches safe to pre-aggregate).
  */
class SketchesSpec extends SparkSpec {

  private lazy val events = graft.core.Tables.events(spark, sf)

  test("per-bucket estimates are within HLL error of exact") {
    val daily = Sketches
      .distinctSketchPerBucket(events, date_trunc("day", col("ts")), "user_id")
      .withColumn("est", hll_sketch_estimate(col("sketch")))
      .collect()
    assert(daily.nonEmpty)
    daily.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct")
      val est = r.getAs[Long]("est")
      assert(math.abs(est - exact).toDouble <= math.max(2.0, 0.05 * exact),
        s"bucket ${r.get(0)}: est $est vs exact $exact")
    }
  }

  test("merged sketch estimate matches global exact distinct within error") {
    val daily = Sketches.distinctSketchPerBucket(events, date_trunc("day", col("ts")), "user_id")
    val merged = Sketches.mergedDistinctEstimate(daily)
    val exact = events.agg(countDistinct(col("user_id"))).head.getLong(0)
    assert(math.abs(merged - exact).toDouble <= math.max(2.0, 0.05 * exact), s"$merged vs $exact")
  }

  test("merging is bucket-partition invariant: day-sketches and week-sketches agree") {
    val byDay = Sketches.distinctSketchPerBucket(events, date_trunc("day", col("ts")), "user_id")
    val byWeek = Sketches.distinctSketchPerBucket(events, date_trunc("week", col("ts")), "user_id")
    val a = Sketches.mergedDistinctEstimate(byDay)
    val b = Sketches.mergedDistinctEstimate(byWeek)
    // same underlying key set — estimates must agree within combined error
    assert(math.abs(a - b).toDouble <= math.max(2.0, 0.05 * math.max(a, b)), s"$a vs $b")
  }
}
