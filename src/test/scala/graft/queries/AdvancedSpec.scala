package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Layout

/** Laws for the round-5 operators (the oracle gate checks exact values;
  * these pin the algebraic properties that make the operators correct
  * BY CONSTRUCTION, so a refactor that keeps hashes green but breaks a
  * law still fails).
  */
class AdvancedSpec extends SparkSpec {

  test("hilbert2 expression reproduces the driver-side curve on every cell (order 4)") {
    import spark.implicits._
    val table = Layout.hilbertTable(4)
    val cells = (0 until 256).map(i => (i.toLong / 16, i.toLong % 16))
    val got = cells
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.hilbert2(col("x"), col("y"), 4).as("h"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    cells.foreach { case (x, y) =>
      assert(got((x, y)) == table((x * 16 + y).toInt), s"hilbert($x,$y)")
    }
  }

  test("hilbert curve walks adjacent cells (|Δx|+|Δy| = 1 between consecutive keys) — z-order does not") {
    val table = Layout.hilbertTable(4)
    val byD = table.zipWithIndex.sortBy(_._1).map { case (_, i) => (i / 16, i % 16) }
    byD.sliding(2).foreach { case Array((x0, y0), (x1, y1)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1, s"jump at ($x0,$y0)->($x1,$y1)")
    }
    // contrast: the Morton walk has at least one non-adjacent jump
    def morton(x: Int, y: Int): Long =
      (0 until 4).map(i => (((x >> i) & 1).toLong << (2 * i)) | (((y >> i) & 1).toLong << (2 * i + 1))).sum
    val zWalk = (for (x <- 0 until 16; y <- 0 until 16) yield (x, y)).sortBy { case (x, y) => morton(x, y) }
    val zJumps = zWalk.sliding(2).count { case Seq((x0, y0), (x1, y1)) =>
      math.abs(x1 - x0) + math.abs(y1 - y0) > 1
    }
    assert(zJumps > 0)
  }

  test("q136 count-min estimates dominate exact counts (overestimate law)") {
    val rows = Advanced.q136(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_n"), r.toString)
    }
  }

  test("q134 interval union: covered time bounded by event count and at least one interval") {
    val perUser = graft.core.Tables
      .events(spark, sf)
      .groupBy("user_id")
      .count()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val rows = Advanced.q134(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val covered = r.getAs[Long]("covered_us")
      assert(covered >= 600000000L, s"user $u below one interval")
      assert(covered <= perUser(u) * 600000000L, s"user $u exceeds event-count bound")
      assert(r.getAs[Long]("n_intervals") >= 1L)
    }
  }

  test("q139 motif counts: every view-click-purchase contains a view-click") {
    val rows = Advanced.q139(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_view_click") >= r.getAs[Long]("n_view_click_purchase"), r.toString)
    }
  }

  test("q140 equi-depth buckets partition each type exactly and bounds are ordered") {
    val rows = Advanced.q140(spark, sf).collect()
    val counts = graft.core.Tables
      .events(spark, sf)
      .groupBy("event_type")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum == counts(t), s"type $t row conservation")
      assert(rs.length == math.min(10, counts(t)).toInt)
      rs.sortBy(_.getAs[Long]("bucket")).sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("hi") <= b.getAs[Double]("hi") + 1e-9, s"type $t bucket order")
        case _ => ()
      }
    }
    rows.foreach(r => assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
  }

  test("q136 plans the vocabulary top-20 as TakeOrderedAndProject (no full-vocab single-partition window)") {
    val plan = Advanced.q136(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q141 interpolation lies between the neighboring purchase values (or is a boundary copy)") {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, sf)
    val p = ev
      .filter($"event_type" === "purchase")
      .groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val rows = Advanced.q141(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val v = r.getAs[Double]("interp_value")
      p.get(u) match {
        case None => assert(v == -1.0, s"user $u has no purchases")
        case Some((lo, hi)) => assert(v >= lo - 1e-6 && v <= hi + 1e-6, s"user $u: $v outside [$lo,$hi]")
      }
    }
  }

  test("q142 triangle counts: total is divisible by 3 and each node is bounded by C(deg,2)") {
    val rows = Advanced.q142(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_triangles")).sum
    assert(total % 3 == 0, s"each triangle must appear at exactly 3 nodes (total $total)")
    if (rows.nonEmpty) assert(rows.forall(_.getAs[Long]("n_triangles") >= 1))
  }

  test("q143 merged partials equal a flat recompute (the incremental-maintenance law)") {
    import spark.implicits._
    val flat = graft.core.Tables
      .events(spark, sf)
      .select(
        $"event_type",
        to_date($"ts").as("day"),
        expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n_events"), sum($"vm").as("sv_milli"))
      .orderBy($"event_type", $"day")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3)))
    val merged = Advanced
      .q143(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3)))
    assert(merged.toSeq == flat.toSeq)
  }

  test("q144 sliding distinct dominates the daily distinct and respects the 7-day union bound") {
    import spark.implicits._
    val daily = graft.core.Tables
      .events(spark, sf)
      .select(to_date($"ts").as("day"), $"user_id")
      .distinct()
      .groupBy("day")
      .count()
      .collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))
      .toMap
    val rows = Advanced.q144(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getDate(0)
      val v = r.getAs[Long]("users_7d")
      val day = d.toLocalDate
      val window = (0 to 6).map(k => daily.getOrElse(day.minusDays(k.toLong).toString, 0L))
      assert(v >= window.max, s"$day: $v < max daily ${window.max}")
      assert(v <= window.sum, s"$day: $v > 7-day union bound ${window.sum}")
    }
  }

  test("q145 merged-HLL estimates track q144's exact sliding distinct within the sketch envelope") {
    val exact = Advanced
      .q144(spark, sf)
      .collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("users_7d"))
      .toMap
    val est = Advanced.q145(spark, sf).collect()
    assert(est.nonEmpty && est.length == exact.size)
    est.foreach { r =>
      val d = r.getDate(0).toString
      val e = r.getAs[Double]("users_7d_hll")
      val x = exact(d).toDouble
      // m=256 → 6.5% stderr; linear counting dominates at these counts.
      // 20% is ~3 sigma of the worst regime.
      assert(math.abs(e - x) <= math.max(3.0, 0.2 * x), s"$d: est $e vs exact $x")
    }
  }

  test("q146 prefix filtering loses no pairs: equals full shared-shingle blocking at the same threshold") {
    val viaPrefix = Advanced
      .q146(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val viaBlocking = graft.llm.Dedup
      .jaccardPairs(graft.core.Tables.documents(spark, sf), "doc_id", "text", 3, 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(viaPrefix == viaBlocking)
    assert(viaPrefix.nonEmpty, "fixture should contain at least one 0.8-jaccard pair")
  }

  test("q134 plans exactly one hash shuffle (windows and rollups reuse the user_id partitioning)") {
    val plan = Advanced.q134(spark, sf).queryExecution.executedPlan.toString
    val hashExchanges = "hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1, s"expected 1 hashpartitioning exchange, plan:\n$plan")
  }

  test("q142 and q135 plan without cartesian products; q135 broadcasts the query slices") {
    val p142 = Advanced.q142(spark, sf).queryExecution.executedPlan.toString
    assert(!p142.contains("CartesianProduct"), p142)
    val p135 = Advanced.q135(spark, sf).queryExecution.executedPlan.toString
    assert(!p135.contains("CartesianProduct"), p135)
    assert(p135.contains("BroadcastExchange") || p135.contains("BroadcastNestedLoop"), p135)
  }

  test("q148 stationary vector stays a near-distribution (mass within integer-rounding drift)") {
    val rows = Advanced.q148(spark, sf).collect()
    assert(rows.nonEmpty)
    val mass = rows.map(_.getAs[Long]("pi_i")).sum
    // each of 3 iterations can drift at most ±(nstates/2) micro-units
    assert(math.abs(mass - 1000000L) <= 3L * rows.length, s"mass $mass")
    rows.foreach(r => assert(r.getAs[Long]("pi_i") >= 0L))
  }

  test("q149 weighted median matches a driver-side brute force per type") {
    import spark.implicits._
    val data = graft.core.Tables
      .events(spark, sf)
      .select($"event_type", $"value", $"event_id", dayofmonth($"ts").cast("long").as("wt"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    val want = data.groupBy(_._1).map { case (t, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val tot = sorted.map(_._4).sum
      var cum = 0L
      val first = sorted.find { r => cum += r._4; cum * 2 >= tot }.get
      t -> first._2
    }
    val got = Advanced
      .q149(spark, sf)
      .collect()
      .map(r => r.getString(0) -> r.getAs[Double]("weighted_median"))
      .toMap
    want.foreach { case (t, v) =>
      assert(math.abs(got(t) - v) < 1e-6, s"$t: ${got(t)} vs $v")
    }
  }

  test("q150 streaks: longest <= active days, and brute-force agreement per user") {
    import spark.implicits._
    val days = graft.core.Tables
      .events(spark, sf)
      .select($"user_id", to_date($"ts").as("day"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val want = days.groupBy(_._1).map { case (u, ds) =>
      val sorted = ds.map(_._2).distinct.sorted
      var best = 1L; var cur = 1L
      sorted.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          if (pair(1).toEpochDay == pair(0).toEpochDay + 1) { cur += 1; best = math.max(best, cur) }
          else cur = 1
        }
      }
      u -> (best, sorted.length.toLong)
    }
    val got = Advanced
      .q150(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("longest_streak"), r.getAs[Long]("n_active_days")))
      .toMap
    assert(got == want)
  }

  test("observe() metrics ride the q143 action — no second pass over the data") {
    val obs = org.apache.spark.sql.Observation("mv_metrics")
    val out = Advanced
      .q143(spark, sf)
      .observe(obs, count(lit(1)).as("rows"), sum(col("n_events")).as("events"))
      .collect()
    val events = graft.core.Tables.events(spark, sf).count()
    assert(obs.get("rows") == out.length.toLong)
    assert(obs.get("events") == events, "merged MV must conserve every source event")
  }

  test("q135 maxsim returns a full top-10 per query in strict rank order") {
    val rows = Advanced.q135(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      assert(rs.length == 10, s"qid $q")
      val byRk = rs.sortBy(_.getAs[Long]("rk"))
      byRk.sliding(2).foreach {
        case Array(a, b) =>
          val sa = a.getAs[Double]("maxsim"); val sb = b.getAs[Double]("maxsim")
          assert(
            sa > sb || (sa == sb && a.getAs[Long]("vec_id") < b.getAs[Long]("vec_id")),
            s"qid $q rank order")
        case _ => ()
      }
    }
  }
}
