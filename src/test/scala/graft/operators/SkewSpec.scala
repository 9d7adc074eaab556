package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain join's result on skewed data") {
    import spark.implicits._
    // heavy skew: 90% of rows share one key
    val large = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i.toDouble)).toDF("k", "v")
    val small = (0L to 99L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = Skew.saltedJoin(large, small, "k", 8).groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(
      plain.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        salted.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("saltedAgg equals direct aggregation") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i % 3L, 1.0)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("v")).orderBy("k").collect().map(_.getDouble(1))
    val salted = Skew
      .saltedAgg(df, "k", 16, sum, "v", sum)
      .orderBy("k")
      .collect()
      .map(_.getDouble(1))
    assert(direct.toSeq == salted.toSeq)
  }
}
