package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-mitigation evidence harness: times the same hot-key join three
  * ways — plain shuffle join with AQE off, AQE skew-split, and
  * [[graft.operators.Skew.saltedJoin]] — on a synthetic 90%-one-key
  * dataset. Broadcast is disabled so the dim side cannot sidestep the
  * shuffle (at 100 TB the dim that matters often can't broadcast either).
  * Prints one JSON line; measured numbers are documented in
  * [[graft.operators.Skew]]'s scaladoc.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "20000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def fact = spark
      .range(rows)
      .select(
        when(col("id") % 10 < 9, lit(0L)).otherwise(col("id") % 9973).as("k"),
        (col("id") % 1000).cast("double").as("v"))
    def dim = spark
      .range(9973)
      .select(col("id").as("k"), concat(lit("seg_"), (col("id") % 7).cast("string")).as("segment"))

    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("segment").agg(sum("v")).count()

    def time(label: String)(f: => Long): (String, Double) = {
      val t0 = System.nanoTime()
      f
      (label, (System.nanoTime() - t0) / 1e9)
    }

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.range(1 << 20).selectExpr("sum(id)").collect() // warm up

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plain = time("plain_no_aqe")(agg(fact.join(dim, Seq("k"))))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val aqe = time("aqe_skew_split")(agg(fact.join(dim, Seq("k"))))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val salted = time("salted_16")(agg(graft.operators.Skew.saltedJoin(fact, dim, "k", 16)))

    spark.stop()
    val r = Seq(plain, aqe, salted)
      .map { case (l, t) => s""""$l":${BigDecimal(t).setScale(2, BigDecimal.RoundingMode.HALF_UP)}""" }
      .mkString("{", ",", "}")
    println(s"""{"rows":$rows,"times_sec":$r}""")
  }
}
