package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesOpsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOfJoin matches a brute-force oracle on the fixture events") {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, sf)
    val errors = ev.filter($"event_type" === "error").select("event_id", "user_id", "ts")
    val purchases = ev
      .filter($"event_type" === "purchase")
      .select("user_id", "ts", "event_id", "value")

    val got = TimeSeriesOps
      .asOfJoin(errors, purchases, "user_id", "ts", "ts", "event_id", Map("value" -> "pv"))
      .select($"event_id", $"pv")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    // brute force on the driver (test-only; fixture is tiny)
    val ps = purchases.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val es = errors.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    es.foreach { case (eid, uid, t) =>
      val want = ps
        .filter(p => p._1 == uid && !p._2.after(t))
        .sortBy(p => (p._2.getTime, p._3))
        .lastOption
        .map(_._4)
      assert(got(eid) == want, s"event $eid")
    }
  }

  test("asOfJoin: right row at exactly left ts qualifies; latest tie wins") {
    import spark.implicits._
    val left = Seq((1L, 100L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 10:00:00"), 5L, 50.0),
      (100L, ts("2024-01-01 10:00:00"), 7L, 70.0), // same ts, higher tie → wins
      (100L, ts("2024-01-01 09:00:00"), 3L, 30.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeriesOps
      .asOfJoin(left, right, "user_id", "ts", "ts", "event_id", Map("value" -> "pv"))
      .select("pv")
      .collect()
    assert(out.head.getDouble(0) == 70.0)
  }

  test("asOfJoinTimeSplit equals plain asOfJoin on a hot series with bucket-spanning gaps") {
    import spark.implicits._
    // 90% of trades on series 0; quotes sparse enough that many time
    // buckets hold NO quote (the carry-in correctness case) — seeded LCG
    // so the fixture is deterministic
    def lcg(s: Long): Long = s * 6364136223846793005L + 1442695040888963407L
    var st = 42L
    def next(n: Int): Int = { st = lcg(st); math.floorMod(st, n.toLong).toInt }
    val trades = (1 to 4000).map { i =>
      val k = if (next(10) < 9) 0L else (1L + next(5))
      (i.toLong, k, next(100000).toLong)
    }
    val quotes = (1 to 120).map { j =>
      val k = if (next(10) < 9) 0L else (1L + next(5))
      // cluster quotes into the low half so the high-ts buckets are empty
      (k, next(50000).toLong, j.toLong, next(1000).toDouble)
    }
    val l = trades.toDF("trade_id", "series", "t")
    val r = quotes.toDF("series", "t", "qid", "px")
    // no-match rows canon as None, NOT NaN: scala unboxes number pairs and
    // NaN == NaN is false, which makes set equality silently fail on rows
    // that actually agree
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"trade_id", $"px")
      .collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getDouble(1))))
      .toSet
    def diff(a: Set[(Long, Option[Double])], b: Set[(Long, Option[Double])]): String =
      s"only-split=${(a -- b).toSeq.sortBy(_._1).take(8)} only-plain=${(b -- a).toSeq.sortBy(_._1).take(8)}"
    val plain = canon(TimeSeriesOps.asOfJoin(l, r, "series", "t", "t", "qid", Map("px" -> "px")))
    val split = canon(TimeSeriesOps.asOfJoinTimeSplit(l, r, "series", "t", "t", "qid", Map("px" -> "px"), 8))
    assert(split == plain, diff(split, plain))
    // and with buckets ≫ quotes, so nearly every bucket rides its carry row
    val split64 = canon(TimeSeriesOps.asOfJoinTimeSplit(l, r, "series", "t", "t", "qid", Map("px" -> "px"), 64))
    assert(split64 == plain, diff(split64, plain))
  }

  test("asOfJoinForward matches a brute-force oracle on the fixture events") {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, sf)
    val errors = ev.filter($"event_type" === "error").select("event_id", "user_id", "ts")
    val purchases = ev
      .filter($"event_type" === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val got = TimeSeriesOps
      .asOfJoinForward(errors, purchases, "user_id", "ts", "ts", "event_id", Map("value" -> "pv"))
      .select($"event_id", $"pv")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val ps = purchases.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val es = errors.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    es.foreach { case (eid, uid, t) =>
      val want = ps
        .filter(p => p._1 == uid && !p._2.before(t))
        .sortBy(p => (p._2.getTime, p._3))
        .headOption
        .map(_._4)
      assert(got(eid) == want, s"event $eid")
    }
  }

  test("asOfJoinForward: right row at exactly left ts qualifies; lowest tie wins") {
    import spark.implicits._
    val left = Seq((1L, 100L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 10:00:00"), 7L, 70.0),
      (100L, ts("2024-01-01 10:00:00"), 5L, 50.0), // same ts, lower tie → wins
      (100L, ts("2024-01-01 11:00:00"), 3L, 30.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeriesOps
      .asOfJoinForward(left, right, "user_id", "ts", "ts", "event_id", Map("value" -> "pv"))
      .select("pv")
      .collect()
    assert(out.head.getDouble(0) == 50.0)
  }

  test("asOfJoinWithin: infinite tolerance equals plain as-of; stale matches null out") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts("2024-01-01 09:30:00"), 3L, 30.0))
      .toDF("user_id", "ts", "event_id", "value")
    // 1h tolerance: event 1 (30 min stale) keeps the match, event 2 (2.5h) loses it
    val got = TimeSeriesOps
      .asOfJoinWithin(left, right, "user_id", "ts", "ts", "event_id", Map("value" -> "pv"), 3600L)
      .orderBy("event_id")
      .select("pv")
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(30.0), None))
    // huge tolerance degenerates to the unbounded as-of on the fixture
    val ev = graft.core.Tables.events(spark, sf)
    val errors = ev.filter($"event_type" === "error").select("event_id", "user_id", "ts")
    val purchases = ev.filter($"event_type" === "purchase").select("user_id", "ts", "event_id", "value")
    val a = TimeSeriesOps
      .asOfJoin(errors, purchases, "user_id", "ts", "ts", "event_id", Map("value" -> "pv"))
      .select("event_id", "pv")
    val b = TimeSeriesOps
      .asOfJoinWithin(errors, purchases, "user_id", "ts", "ts", "event_id", Map("value" -> "pv"), Int.MaxValue.toLong)
      .select("event_id", "pv")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("asOfJoinWithin preserves a caller mapping of the right timestamp column") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts("2024-01-01 09:30:00"), 3L, 30.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeriesOps
      .asOfJoinWithin(
        left, right, "user_id", "ts", "ts", "event_id",
        Map("value" -> "pv", "ts" -> "match_time"), 3600L)
      .orderBy("event_id")
      .select("pv", "match_time")
      .collect()
    // fresh row keeps both carried columns; stale row nulls both
    assert(got(0).getDouble(0) == 30.0 && got(0).getTimestamp(1) == ts("2024-01-01 09:30:00"))
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
  }

  test("gapFillDaily emits every day in each key's span") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 05:00:00"), 1.0),
      (1L, ts("2024-01-04 05:00:00"), 2.0), // gap: Jan 2, Jan 3 missing
      (2L, ts("2024-02-01 00:00:00"), 3.0))
      .toDF("user_id", "ts", "value")
    val out = TimeSeriesOps
      .gapFillDaily(df, "user_id", "ts", Seq(count(lit(1)).as("n")))
      .orderBy("user_id", "day")
      .collect()
    assert(out.length == 5) // 4 days for user 1, 1 day for user 2
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.count(_.isNullAt(2)) == 2) // two zero-filled days
  }

  test("interpolated gap-fill: midpoint of a 2-day gap is the value midpoint") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 12:00:00"), 10.0),
      (1L, ts("2024-01-04 12:00:00"), 40.0)) // Jan 2, 3 missing
      .toDF("user_id", "ts", "value")
    val out = TimeSeriesOps
      .gapFillInterpolateDaily(df, "user_id", "ts", max(col("value")))
      .orderBy("day")
      .select("v_interp")
      .collect()
      .map(_.getDouble(0))
    assert(out.toSeq == Seq(10.0, 20.0, 30.0, 40.0))
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:29:00"), 2L), // 29 min — same session
      (1L, ts("2024-01-01 11:00:00"), 3L), // 31 min — new session
      (1L, ts("2024-01-01 11:30:00"), 4L)) // exactly 30 min — same session
      .toDF("user_id", "ts", "event_id")
    val out = TimeSeriesOps
      .sessionize(df, "user_id", "ts", "event_id", 30)
      .orderBy("event_id")
      .select("session_id")
      .collect()
      .map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 1L, 2L, 2L))
  }

  test("topKPerGroup returns exactly k rows per group in rank order") {
    val out = TimeSeriesOps
      .topKPerGroup(
        graft.core.Tables.orders(spark, sf),
        Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        3)
      .groupBy("o_orderpriority")
      .count()
      .collect()
    assert(out.forall(_.getLong(1) == 3L))
  }

  test("delta: first row per key is value - 0") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 1L, 5.0), (1L, ts("2024-01-01 11:00:00"), 2L, 3.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeriesOps
      .delta(df, "user_id", "ts", "event_id", "value", "dv")
      .orderBy("event_id")
      .select("dv")
      .collect()
      .map(_.getDouble(0))
    assert(out.toSeq == Seq(5.0, -2.0))
  }
}
