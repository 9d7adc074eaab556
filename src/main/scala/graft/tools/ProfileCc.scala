package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileCc {
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
    val t0 = System.nanoTime()
    val edges = graft.llm.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.2).select("a_id","b_id")
    val ec = edges.persist().count()
    println(f"[cc] edges: $ec rows in ${(System.nanoTime()-t0)/1e9}%.2f s")
    // replicate the loop with per-round timing
    val fwd = edges.select(col("a_id").as("src"), col("b_id").as("dst"))
    val und = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst"))).persist()
    var labels = und.select(col("src").as("id")).distinct().withColumn("label", col("id")).persist()
    var prevSum = labels.agg(sum(col("label"))).head.getLong(0)
    println(f"[cc] nodes: ${labels.count()}")
    var converged = false
    var round = 0
    while (!converged) {
      round += 1
      val r0 = System.nanoTime()
      val next = und.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
        .unionByName(labels)
        .groupBy(col("id")).agg(min(col("label")).as("label")).persist()
      val nextSum = next.agg(sum(col("label"))).head.getLong(0)
      println(f"[cc] round $round: ${(System.nanoTime()-r0)/1e9}%.2f s (sum $nextSum)")
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
    }
    spark.stop()
  }
}
