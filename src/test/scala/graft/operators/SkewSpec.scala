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

  test("salting spreads the hot key: max shuffle-partition share collapses") {
    import spark.implicits._
    // 90% of rows on key 7 — the pathological shape
    val large = (1 to 20000)
      .map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i.toDouble))
      .toDF("k", "v")
    val parts = 16
    def maxPartitionFraction(df: org.apache.spark.sql.DataFrame, keys: Seq[org.apache.spark.sql.Column]): Double = {
      val sizes = df
        .repartition(parts, keys: _*)
        .rdd
        .mapPartitions(it => Iterator(it.size))
        .collect()
      sizes.max.toDouble / sizes.sum
    }
    // unsalted: the hot key's partition carries >= 90% of all rows
    val plainFrac = maxPartitionFraction(large, Seq(col("k")))
    assert(plainFrac >= 0.9, s"fixture not skewed enough: $plainFrac")
    // salted on (k, salt): the hot key spreads over `buckets` partitions;
    // no partition may hold more than ~2x its fair share of the hot key
    val buckets = 8
    val salted = large.withColumn("__salt", (rand(seed = 42) * buckets).cast("int"))
    val saltedFrac = maxPartitionFraction(salted, Seq(col("k"), col("__salt")))
    assert(saltedFrac <= 2.0 * 0.9 / buckets + 0.1, s"salt did not spread the hot key: $saltedFrac")
  }

  test("q77 registered salted join matches the plain join and plans the dim as broadcast") {
    val q = graft.queries.Extended.q77(spark, sf)
    val plain = {
      import org.apache.spark.sql.functions._
      val fact = graft.core.Tables
        .lineitem(spark, sf)
        .select(
          when(col("l_orderkey") % 10 < 9, lit(0L)).otherwise(col("l_orderkey") % 97).as("hk"),
          col("l_extendedprice"))
      val dim = spark
        .range(0, 97)
        .select(col("id").as("hk"), concat(lit("seg_"), (col("id") % 7).cast("string")).as("segment"))
      fact
        .join(dim, Seq("hk"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), graft.core.Det.r2(sum(col("l_extendedprice"))).as("rev"))
    }
    assert(q.exceptAll(plain).count() == 0 && plain.exceptAll(q).count() == 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
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
