package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AggregatorsSpec extends SparkSpec {

  test("WeightedMean equals the column-form sum(vw)/sum(w)") {
    import spark.implicits._
    val df = Seq((1L, 10.0, 2.0), (1L, 20.0, 1.0), (2L, 5.0, 4.0)).toDF("k", "v", "w")
    val wmean = udaf(new Aggregators.WeightedMean())
    val got = df.groupBy($"k").agg(wmean($"v", $"w").as("m")).orderBy($"k").collect().map(_.getDouble(1))
    assert(got.toSeq == Seq((10.0 * 2 + 20.0) / 3.0, 5.0))
  }

  test("WeightedMean of empty weights is 0") {
    import spark.implicits._
    val df = Seq((1L, 10.0, 0.0)).toDF("k", "v", "w")
    val wmean = udaf(new Aggregators.WeightedMean())
    assert(df.groupBy($"k").agg(wmean($"v", $"w")).head.getDouble(1) == 0.0)
  }

  test("LastWrite picks max (ts, tie) regardless of order") {
    import spark.implicits._
    val rows = Seq(
      Aggregators.Stamped(5L, 1L, "a"),
      Aggregators.Stamped(7L, 0L, "b"),
      Aggregators.Stamped(7L, 2L, "c"),
      Aggregators.Stamped(3L, 9L, "d"))
    val lw = udaf(new Aggregators.LastWrite(), org.apache.spark.sql.Encoders.product[Aggregators.Stamped])
    val df = rows.toDF()
    val got = df
      .agg(lw($"ts", $"tie", $"value").as("last"))
      .head
      .getString(0)
    assert(got == "c")
  }
}
