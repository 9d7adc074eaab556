package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed sort-rank must be value-identical to the window form it
  * replaces — it exists purely so the plan scales (range partitions + per-
  * partition offsets instead of a one-reducer global sort).
  */
class RanksSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    // keys with heavy ties (the hard case: ties must split by the
    // tiebreaker, never by partition placement), several partitions
    (1 to 997).map(i => (i.toLong, (i % 13).toLong)).toDF("id", "v").repartition(7)
  }

  test("globalRowNumber equals row_number over the same total order (asc and desc)") {
    for (asc <- Seq(true, false)) {
      val ord = if (asc) Seq(col("v").asc, col("id").asc) else Seq(col("v").desc, col("id").asc)
      val want = df
        .withColumn("r", row_number().over(Window.orderBy(ord: _*)).cast("long"))
        .select("id", "r")
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      // partitions = 5 exercises the counts + offset-join path; 1 exercises
      // the single-partition fast path (no counts job, rank = local rank)
      for (parts <- Seq(5, 1)) {
        val got = Ranks
          .globalRowNumber(df, ord, "r", partitions = parts)
          .select("id", "r")
          .collect()
          .map(r => r.getLong(0) -> r.getLong(1))
          .toMap
        assert(got == want, s"asc=$asc parts=$parts")
      }
    }
  }

  test("ntileOfRank reproduces NTILE bucket sizes exactly, including the remainder tiles") {
    import spark.implicits._
    for (n <- Seq(3L, 5L, 997L, 1000L); k <- Seq(4, 5)) {
      val ranks = (1L to n).toDF("r")
      val got = ranks
        .select(col("r"), Ranks.ntileOfRank(col("r"), n, k).as("t"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      val want = ranks
        .select(col("r"), ntile(k).over(Window.orderBy(col("r"))).cast("long").as("t"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("globalRowNumber plans no partition-less Window") {
    val plan = Ranks
      .globalRowNumber(df, Seq(col("v").asc, col("id").asc), "r")
      .queryExecution
      .optimizedPlan
    val globalWindows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, s"unpartitioned Window:\n$plan")
  }
}
