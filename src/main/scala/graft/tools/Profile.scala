package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for operator iteration (not part of the driver
  * contract): times labeled sub-pipelines so shuffle-stage costs are
  * attributable. Run: `sbt "runMain graft.tools.Profile <sfDir>"`.
  */
object Profile {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()

    val docs = graft.core.Tables.documents(spark, d)
    import graft.functions.Text
    import graft.llm.Dedup

    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      t("scan+tokenize+shingle+explode") {
        Dedup.explodedShinglesAll(docs, "doc_id", "text", 3).count()
      }
      t("…+hash60") {
        Dedup.explodedShinglesAll(docs, "doc_id", "text", 3)
          .select(col("doc_id"), Text.hash60(col("shingle")).as("h")).groupBy().max("h").collect()
      }
      val sh = t("…+distinct (materialize persist)") {
        val s0 = Dedup.explodedShinglesAll(docs, "doc_id", "text", 3)
          .select(col("doc_id"), Text.hash60(col("shingle")).as("__h"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        s0.count()
        s0
      }
      t("self-join + pair agg (from persist)") {
        val a = sh.select(col("doc_id").as("a_id"), col("__h"))
        val b = sh.select(col("doc_id").as("b_id"), col("__h"))
        a.join(b, Seq("__h")).filter(col("a_id") < col("b_id"))
          .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter")).count()
      }
      t("full q24") {
        graft.queries.TextQueries.q24(spark, d).count()
      }
      spark.catalog.clearCache()
      t("full q24 uncached-fresh") {
        graft.queries.TextQueries.q24(spark, d).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
