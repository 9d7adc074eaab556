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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    (1 to 2).foreach { round =>
      println(s"== pass $round ==")
      val edges = t("jaccard edges") {
        val e = graft.llm.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.2).select("a_id", "b_id")
        e.persist(); e.count(); e
      }
      // inline replica of connectedComponents with per-phase timing
      val fwd = edges.select(col("a_id").as("src"), col("b_id").as("dst"))
      val raw = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst"))).persist(mem)
      val edgeRows = t("raw count")(raw.count())
      val width = spark.sessionState.conf.numShufflePartitions
      val parts = math.max(1L, math.min(width.toLong, edgeRows / 1000000L + 1L)).toInt
      val und = raw.repartition(parts, col("src")).persist(mem)
      t("repartition+persist")(und.count())
      raw.unpersist()
      var labels = und.groupBy(col("src").as("id"))
        .agg(min(least(col("src"), col("dst"))).as("label"))
        .repartition(parts, col("id"))
        .persist(mem)
      var prevSum = t("seed labels")(labels.agg(sum(col("label"))).head.getLong(0))
      var converged = false
      var r = 0
      while (!converged) {
        r += 1
        val next = und.join(labels, col("src") === col("id"))
          .select(col("dst").as("id"), col("label"))
          .unionByName(labels)
          .repartition(parts, col("id"))
          .groupBy(col("id")).agg(min(col("label")).as("label"))
          .persist(mem)
        val nextSum = t(s"round $r")(next.agg(sum(col("label"))).head.getLong(0))
        converged = nextSum == prevSum
        prevSum = nextSum
        labels.unpersist()
        labels = next
      }
      und.unpersist(); labels.unpersist(); edges.unpersist()
    }
    spark.stop()
  }
}
