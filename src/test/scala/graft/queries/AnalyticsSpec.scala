package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.Layout

/** Operator-law checks for the behavioral-analytics / layout queries
  * (q86–q89, q93); the engine-vs-oracle hash check runs in Verify.
  */
class AnalyticsSpec extends SparkSpec {

  test("q86 pairs share the blocking noun and respect the distance bound") {
    val r = Analytics.q86(spark, sf).collect()
    r.foreach { row =>
      val a = row.getAs[String]("a_name")
      val b = row.getAs[String]("b_name")
      assert(a < b)
      assert(a.split(" ")(1) == b.split(" ")(1), "pair crosses blocks")
      assert(row.getAs[Long]("dist") >= 1 && row.getAs[Long]("dist") <= 2)
    }
  }

  test("q87 stage timestamps are ordered and conversion windows hold") {
    val r = Analytics.q87(spark, sf).collect()
    assert(r.nonEmpty)
    val twoH = 2L * 3600 * 1000
    val dayMs = 24L * 3600 * 1000
    r.foreach { row =>
      val stage = row.getAs[Long]("stage")
      val tv = Option(row.getAs[Timestamp]("t_view"))
      val tc = Option(row.getAs[Timestamp]("t_click"))
      val tp = Option(row.getAs[Timestamp]("t_purchase"))
      assert(tv.isDefined == (stage >= 1))
      assert(tc.isDefined == (stage >= 2))
      assert(tp.isDefined == (stage >= 3))
      for (v <- tv; c <- tc) {
        assert(c.getTime > v.getTime && c.getTime <= v.getTime + twoH)
      }
      for (c <- tc; p <- tp) {
        assert(p.getTime > c.getTime && p.getTime <= c.getTime + dayMs)
      }
    }
  }

  test("q88 week-0 activity equals cohort size and later weeks never exceed it") {
    val rows = Analytics.q88(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[Timestamp]("cohort"))
    byCohort.foreach { case (_, rs) =>
      val m = rs.map(r => r.getAs[Long]("week_offset") -> r.getAs[Long]("n_active")).toMap
      // signup day itself is an active day, so offset 0 is the full cohort
      assert(m.contains(0L))
      m.foreach { case (_, n) => assert(n <= m(0L)) }
    }
  }

  test("q89 anomalies all exceed the threshold with enough history") {
    val r = Analytics.q89(spark, sf).collect()
    r.foreach { row =>
      assert(math.abs(row.getAs[Double]("z")) > 2.0)
    }
  }

  test("q93/zorder2 interleaves bits exactly (scala reference)") {
    def ref(x: Long, y: Long): Long = {
      var v = 0L
      var i = 0
      while (i < 16) {
        v |= ((x >> i) & 1L) << (2 * i)
        v |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      v
    }
    import spark.implicits._
    val probe = Seq((0L, 0L), (1L, 0L), (0L, 1L), (12345L, 19723L), (65535L, 65535L))
    val got = probe.toDF("x", "y").select(Layout.zorder2(col("x"), col("y")).as("z")).collect()
    probe.zip(got).foreach { case ((x, y), row) =>
      assert(row.getAs[Long]("z") == ref(x, y), s"zorder2($x,$y)")
    }
  }

  test("zorder-sorted buckets have better 2-D locality than key-sorted buckets") {
    // The locality win requires dimensions of comparable bit width — on
    // skewed-cardinality dims (150 custkeys × 30 days) the raw interleave
    // degenerates toward a single-dim sort, which is why production z-order
    // implementations rank-normalize each dimension first. The law is
    // asserted on a uniform grid where both dims carry 8 significant bits.
    import spark.implicits._
    val grid = (0 until 4096).map { i =>
      val x = (i * 2654435761L) & 255L // Knuth-hash spread, deterministic
      val y = (i * 40503L + 17L) & 255L
      (x, y)
    }
    val o = grid
      .toDF("x", "y")
      .withColumn("z", Layout.zorder2(col("x"), col("y"), bits = 8))
      .collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"), r.getAs[Long]("z")))
    val nb = 16
    // The pruning metric that matters: how many "files" (buckets of the
    // sorted layout, each carrying min/max stats) a 2-D box predicate has
    // to read. Total bucket area is identical for slices and quadrants on
    // a uniform grid — overlap with box queries is where z-order wins.
    def bboxes(sorted: Array[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] = {
      val per = math.max(1, sorted.length / nb)
      sorted
        .grouped(per)
        .map { g =>
          val xs = g.map(_._1); val ys = g.map(_._2)
          (xs.min, xs.max, ys.min, ys.max)
        }
        .toSeq
    }
    val boxes = for (bx <- 0 until 4; by <- 0 until 4)
      yield (bx * 64L, bx * 64L + 63L, by * 64L, by * 64L + 63L) // 64x64 probe boxes
    def touched(bb: Seq[(Long, Long, Long, Long)]): Int =
      boxes.map { case (x0, x1, y0, y1) =>
        bb.count { case (bx0, bx1, by0, by1) => bx0 <= x1 && x0 <= bx1 && by0 <= y1 && y0 <= by1 }
      }.sum
    // key-sorted stand-in: sort by x only (single-dimension clustering)
    val byX = touched(bboxes(o.sortBy(t => (t._1, t._2))))
    val byZ = touched(bboxes(o.sortBy(_._3)))
    // measured: 36 vs 64 (quadrant-ish buckets blur at 4096 points; exact
    // quadrants would give 16) — assert a comfortable margin, not the ideal
    assert(
      byZ * 4 <= byX * 3,
      s"z-order layout should touch materially fewer files for box queries: z=$byZ vs x-sort=$byX")
  }

  test("q108 histogram: per-type counts conserve, buckets bounded, edges ordered") {
    val ev = Tables.events(spark, sf)
    val perType = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hist = Analytics.q108(spark, sf).collect()
    val sums = hist.groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(_.getAs[Long]("cnt")).sum).toMap
    perType.foreach { case (t, n) => assert(sums(t) == n, s"type $t: ${sums(t)} != $n") }
    hist.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 9)
      assert(r.getAs[Double]("bucket_lo") < r.getAs[Double]("bucket_hi"))
    }
    // the 5-row bounds side must broadcast, not sort-merge
    val plan = Analytics.q108(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q109 markov rows: probabilities normalize per source state") {
    val m = Analytics.q109(spark, sf).collect()
    assert(m.nonEmpty)
    m.groupBy(_.getAs[String]("from_type")).foreach { case (t, rows) =>
      val total = rows.map(_.getAs[Double]("p")).sum
      // each p is r6-rounded: the sum can be off by at most 5e-7 per row
      assert(math.abs(total - 1.0) <= 5e-7 * rows.length + 1e-9, s"$t: sum(p) = $total")
    }
    // transition count conserves: sum(cnt) = total events - one per (user, session)
    val total = m.map(_.getAs[Long]("cnt")).sum
    val sess = graft.operators.TimeSeriesOps
      .sessionize(Tables.events(spark, sf), "user_id", "ts", "event_id", 30)
      .groupBy(col("user_id"), col("session_id")).count().collect()
    assert(total == sess.map(_.getAs[Long]("count") - 1).sum, "transition conservation")
  }

  test("q112 ACF: one row per (type, lag 1..3), coefficients in [-1, 1]") {
    val r = Analytics.q112(spark, sf).collect()
    assert(r.nonEmpty)
    val types = r.map(_.getAs[String]("event_type")).distinct
    types.foreach { t =>
      val lags = r.filter(_.getAs[String]("event_type") == t).map(_.getAs[Long]("lag_k")).sorted
      assert(lags.toSeq == Seq(1L, 2L, 3L), s"$t lags: ${lags.mkString(",")}")
    }
    r.foreach(row => assert(math.abs(row.getAs[Double]("acf")) <= 1.0 + 1e-6))
  }

  test("q113 xcorr: full upper-triangle matrix, coefficients in [-1, 1]") {
    val r = Analytics.q113(spark, sf).collect()
    val types = Tables.events(spark, sf).select(col("event_type")).distinct().collect().map(_.getString(0))
    assert(r.length == types.length * (types.length - 1) / 2, s"got ${r.length} pairs")
    r.foreach { row =>
      assert(row.getAs[String]("type_a") < row.getAs[String]("type_b"))
      assert(math.abs(row.getAs[Double]("xcorr")) <= 1.0 + 1e-6)
      assert(row.getAs[Long]("n_hours") > 0)
    }
  }
}
