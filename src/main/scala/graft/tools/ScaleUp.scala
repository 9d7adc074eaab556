package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a k×-scale replica of a fixture dir for SCALE measurement
  * (VERDICT r6 #4: "the 100-TB claims are argued from plan shape; measure
  * them"). Not a correctness fixture — the oracle gate stays on the
  * driver-generated dirs; this exists so the expensive-tail queries can be
  * timed at 10× and their sf0.1→sf1 wall-time ratio recorded in
  * BASELINE.md.
  *
  * Replication preserves each table's distributional shape instead of
  * duplicating rows verbatim:
  *  - facts get copy-shifted primary keys (ids never collide across
  *    copies);
  *  - `events.user_id` is kept, so per-user series grow 10× (the harsh
  *    direction for as-of/sessionize state);
  *  - `documents.text` is word-salted per copy (every shingle differs), so
  *    near-dup GROUP sizes stay constant while the corpus grows 10× — the
  *    honest scaling for MinHash/LSH (verbatim copies would inflate dup
  *    clusters and measure a different, quadratic problem);
  *  - `embeddings.embedding` gets per-copy deterministic jitter, so ANN
  *    bucket occupancy scales without exact-duplicate vectors.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [dstDir] [k] [tables]
  * `tables` (comma-separated, optional) restricts the build — the MV
  * curvature pass needs only a 100× `events`, not 60 M lineitem rows.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    def wanted(t: String): Boolean = only.forall(_.contains(t))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")

    // broadcast-sized dimensions: copy verbatim
    Seq("region", "nation", "customer", "supplier", "part").filter(wanted).foreach { t =>
      write(read(t), t, 1)
    }

    /** Union k copies, applying `shift(copyIndex)` to each. */
    def replicate(base: DataFrame, variant: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(c => variant(base, c)).reduce(_.unionByName(_))

    if (wanted("orders") || wanted("lineitem")) {
      val orders = read("orders")
      val orderShift = orders.agg(max("o_orderkey")).head.getLong(0) + 1L
      if (wanted("orders")) write(
        replicate(orders, (df, c) => df.withColumn("o_orderkey", col("o_orderkey") + lit(c * orderShift))),
        "orders",
        32)

      if (wanted("lineitem")) {
        val lineitem = read("lineitem")
        write(
          replicate(lineitem, (df, c) => df.withColumn("l_orderkey", col("l_orderkey") + lit(c * orderShift))),
          "lineitem",
          64)
      }
    }

    if (wanted("events")) {
    val events = read("events")
    val eventShift = events.agg(max("event_id")).head.getLong(0) + 1L
    write(
      // user_id kept: per-user series grow k× (state-size stress)
      replicate(events, (df, c) => df.withColumn("event_id", col("event_id") + lit(c * eventShift))),
      "events",
      32)
    }

    if (wanted("documents")) {
    val docs = read("documents")
    val docShift = docs.agg(max("doc_id")).head.getLong(0) + 1L
    write(
      replicate(
        docs,
        (df, c) =>
          if (c == 0) df
          else {
            val salted = array_join(
              transform(split(col("text"), " "), w => concat(w, lit(s"§$c"))),
              " ")
            df.withColumn("doc_id", col("doc_id") + lit(c * docShift))
              .withColumn("text", salted)
              .withColumn("n_chars", length(col("text")).cast("long"))
          }),
      "documents",
      32)
    }

    if (wanted("embeddings")) {
    val emb = read("embeddings")
    val vecShift = emb.agg(max("vec_id")).head.getLong(0) + 1L
    write(
      replicate(
        emb,
        (df, c) =>
          if (c == 0) df
          else
            df.withColumn("vec_id", col("vec_id") + lit(c * vecShift))
              .withColumn(
                "embedding",
                transform(
                  col("embedding"),
                  (x, i) => (x + lit(0.01f) * sin(col("vec_id") * 7 + i + lit(c))).cast("float")))),
      "embeddings",
      16)
    }

    val counts = Seq("lineitem", "orders", "events", "documents", "embeddings")
      .filter(wanted)
      .map(t => s"$t=${spark.read.parquet(s"$dst/$t.parquet").count()}")
    println(s"scaled $src -> $dst (k=$k): ${counts.mkString(", ")}")
    spark.stop()
  }
}
