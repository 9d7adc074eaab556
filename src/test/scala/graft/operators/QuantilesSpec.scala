package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {

  import spark.implicits._

  test("exact quantiles equal sorted-sequence indexing, including ties and p=1.0") {
    // values with heavy ties and a non-trivial order
    val vals = (1 to 997).map(i => ((i * 7919) % 100).toLong)
    val df = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val n = vals.length.toLong
    val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = Quantiles
      .exact(df, "v", Seq(col("v").asc, col("id").asc), ps, n, partitions = 4)
      .collect()
      .map(r => r.getAs[Long]("p_pct") -> r.getAs[Long]("v"))
      .toMap
    val sorted = vals.sorted
    ps.foreach { p =>
      val want = sorted((Quantiles.rankOf(p, n) - 1).toInt)
      assert(got(math.round(p * 100)) == want, s"p=$p")
    }
  }

  test("two fractions sharing a rank both surface; single-row frame works") {
    val df = Seq((42L, 0L)).toDF("v", "id")
    val got = Quantiles
      .exact(df, "v", Seq(col("v").asc, col("id").asc), Seq(0.5, 1.0), n = 1L)
      .collect()
      .map(r => (r.getAs[Long]("p_pct"), r.getAs[Long]("v")))
    assert(got.toSeq == Seq((50L, 42L), (100L, 42L)))
  }

  test("rankOf matches ceil(p*n) with the boundary epsilon") {
    assert(Quantiles.rankOf(0.25, 100) == 25L)
    assert(Quantiles.rankOf(0.5, 101) == 51L)
    assert(Quantiles.rankOf(1.0, 7) == 7L)
    assert(Quantiles.rankOf(0.001, 5) == 1L)
  }

  test("grouped quantiles equal per-group sorted-sequence indexing") {
    val rows = for {
      g <- Seq("a", "bb", "c")
      i <- 1 to (g.length * 400 + 37) // uneven group sizes
    } yield (g, ((i * 7919) % 251).toLong, i.toLong)
    val df = rows.toDF("g", "v", "id")
    val ps = Seq(0.25, 0.5, 0.9, 1.0)
    val got = Quantiles
      .exactGrouped(df, "g", "v", Seq(col("g").asc, col("v").asc, col("id").asc), ps, partitions = 5)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("p_pct")) -> r.getAs[Long]("v"))
      .toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      ps.foreach { p =>
        val want = sorted((Quantiles.rankOf(p, grp.size.toLong) - 1).toInt)
        assert(got((g, math.round(p * 100))) == want, s"group $g p=$p")
      }
    }
  }

  test("grouped quantiles: a NULL group key is a legal group, not an NPE") {
    val df = Seq(
      (Option("a"), 1L, 1L),
      (Option.empty[String], 5L, 2L),
      (Option.empty[String], 7L, 3L),
      (Option("a"), 3L, 4L)).toDF("g", "v", "id")
    val got = Quantiles
      .exactGrouped(df, "g", "v", Seq(col("g").asc, col("v").asc, col("id").asc), Seq(0.5, 1.0))
      .collect()
      .map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0), r.getAs[Long]("p_pct"), r.getAs[Long]("v")))
      .toSet
    assert(got == Set(
      ("<null>", 50L, 5L), ("<null>", 100L, 7L),
      ("a", 50L, 1L), ("a", 100L, 3L)))
  }

  test("200k groups (numeric keys): no stage returns a #groups-sized result to the driver") {
    // per-user/per-series quantiles at scale: group count far beyond what a
    // driver-side count array tolerates. The operator must keep every
    // #groups-sized intermediate distributed — the only driver fetches are
    // partition-count metadata (the Ranks offsets) and task-status overhead.
    val nGroups = 200000L
    val perGroup = 5L
    val df = spark
      .range(nGroups * perGroup)
      .select(
        (col("id") % nGroups).as("g"),
        (col("id") * 7919 % 1000).as("v"),
        col("id"))
    val stageBytes = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val events = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        events.incrementAndGet()
        if (te.taskMetrics != null)
          stageBytes
            .computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.AtomicLong(0L))
            .addAndGet(te.taskMetrics.resultSize)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val caches = scala.collection.mutable.ListBuffer.empty[org.apache.spark.sql.DataFrame]
      val res = Quantiles.exactGrouped(
        df, "g", "v", Seq(col("g").asc, col("v").asc, col("id").asc), Seq(0.5, 1.0),
        partitions = 8, cleanup = caches)
      assert(res.count() == nGroups * 2)
      // spot-check two groups against the closed form
      Seq(123L, 199987L).foreach { g =>
        val vals = (0L until perGroup).map(k => (g + k * nGroups) * 7919 % 1000).sorted
        val got = res
          .filter(col("g") === g)
          .collect()
          .map(r => r.getAs[Long]("p_pct") -> r.getAs[Long]("v"))
          .toMap
        assert(got(50L) == vals((Quantiles.rankOf(0.5, perGroup) - 1).toInt), s"group $g p50")
        assert(got(100L) == vals(perGroup.toInt - 1), s"group $g p100")
      }
      caches.foreach(_.unpersist(false))
      // drain the async listener bus: poll until no new task events land
      var last = -1L
      var spins = 0
      while (events.get() != last && spins < 40) { last = events.get(); Thread.sleep(250); spins += 1 }
      import scala.jdk.CollectionConverters._
      val worst = stageBytes.asScala.map { case (sid, b) => sid -> b.get() }.maxBy(_._2)
      // a 200k-group driver collect serializes >10 MB; metadata + task-
      // status overhead stays well under this bound
      assert(
        worst._2 < 4L * 1024 * 1024,
        s"stage ${worst._1} shipped ${worst._2} bytes to the driver — a #groups-sized collect is back")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("multi-partition path agrees with single-partition path") {
    val vals = (1 to 2000).map(i => ((i * 104729) % 997).toLong)
    val df = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val ps = Seq(0.1, 0.5, 0.9)
    def run(parts: Int) = Quantiles
      .exact(df, "v", Seq(col("v").asc, col("id").asc), ps, vals.length.toLong, partitions = parts)
      .collect()
      .map(r => (r.getAs[Long]("p_pct"), r.getAs[Long]("v")))
      .toSeq
    assert(run(1) == run(7))
  }
}
