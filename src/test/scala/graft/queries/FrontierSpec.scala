package graft.queries

import graft.SparkSpec
import graft.core.Tables

/** Laws for the round-5 Frontier operators. The oracle gate checks exact
  * values at sf0.01; these pin the algebraic properties at sf0.001 so a
  * refactor that drifts semantics fails fast locally.
  */
class FrontierSpec extends SparkSpec {

  test("q155 skyline = exact brute-force dominance set") {
    val got = Frontier
      .q155(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Double]("price"), r.getAs[Long]("size")))
      .toSet
    val all = Tables
      .part(spark, sf)
      .selectExpr("p_partkey", "p_retailprice", "CAST(p_size AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def dominated(a: (Long, Double, Long)): Boolean =
      all.exists(b => (b._2 < a._2 && b._3 >= a._3) || (b._2 <= a._2 && b._3 > a._3))
    val want = all.filterNot(dominated).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q156 spearman matches row-level average-rank Pearson (brute force)") {
    val rows = Tables
      .lineitem(spark, sf)
      .selectExpr("l_returnflag", "l_quantity", "l_discount")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def avgRanks(xs: Seq[Double]): Map[Double, Double] = {
      val sorted = xs.sorted
      xs.distinct.map { v =>
        val lo = sorted.indexWhere(_ == v) + 1
        val hi = sorted.lastIndexWhere(_ == v) + 1
        v -> (lo + hi) / 2.0
      }.toMap
    }
    val want = rows.groupBy(_._1).map { case (flag, rs) =>
      val rx = avgRanks(rs.map(_._2).toSeq)
      val ry = avgRanks(rs.map(_._3).toSeq)
      val xs = rs.map(r => rx(r._2))
      val ys = rs.map(r => ry(r._3))
      val n = rs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val den = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum) *
        math.sqrt(ys.map(y => (y - my) * (y - my)).sum)
      flag -> num / den
    }
    Frontier.q156(spark, sf).collect().foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val rho = r.getAs[Double]("spearman_rho")
      assert(math.abs(rho - want(flag)) < 1e-5, s"$flag: $rho vs ${want(flag)}")
      assert(rho >= -1.0 && rho <= 1.0)
    }
  }

  test("q158 HLL overlap estimates track exact set algebra within sketch error") {
    import spark.implicits._
    val byType = Tables
      .events(spark, sf)
      .selectExpr("event_type", "user_id")
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getLong(1)).toSet }
    Frontier.q158(spark, sf).collect().foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val exactU = (byType(a) ++ byType(b)).size.toDouble
      val exactI = (byType(a) & byType(b)).size.toDouble
      val estU = r.getAs[Double]("est_union")
      val estI = r.getAs[Double]("est_inter")
      // 256 registers → σ ≈ 6.5%; allow 4σ on the union, union-additive
      // error on the intersection (inclusion-exclusion compounds 3 sketches)
      assert(math.abs(estU - exactU) <= 0.26 * exactU + 1, s"$a-$b union $estU vs $exactU")
      assert(math.abs(estI - exactI) <= 0.26 * exactU + 1, s"$a-$b inter $estI vs $exactI")
      assert(estU >= math.max(r.getAs[Double]("est_a"), r.getAs[Double]("est_b")) - 1e-9)
    }
  }

  test("q159 bootstrap band brackets its own mean and tracks the exact mean") {
    val exact = Tables
      .events(spark, sf)
      .selectExpr("event_type", "value")
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getDouble(1)).sum / rs.length }
    val rows = Frontier.q159(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (lo, m, hi) = (r.getAs[Double]("boot_lo"), r.getAs[Double]("boot_mean"), r.getAs[Double]("boot_hi"))
      assert(lo <= m && m <= hi, s"$t band")
      // Poisson-bootstrap mean is consistent: 16 replicas on n≥100 rows
      // land within a few σ/√n of the exact mean
      assert(math.abs(m - exact(t)) <= 0.25 * exact(t) + 1, s"$t mean $m vs ${exact(t)}")
      assert(lo < hi, s"$t: degenerate band")
    }
  }

  test("q160 plan carries the injected runtime bloom filter on the fact side") {
    val df = Frontier.q160(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    assert(plan.contains("bloom_filter_agg"), plan.take(2000))
    // and the filtered join result is still exact
    val got = df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val want = Tables
      .lineitem(spark, sf)
      .join(
        Tables.orders(spark, sf).filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT"),
        org.apache.spark.sql.functions.col("l_orderkey") === org.apache.spark.sql.functions.col("o_orderkey"))
      .groupBy("l_returnflag")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got == want)
  }

  test("q161 plans the native generator and conserves every event's 10 minutes") {
    val df = Frontier.q161(spark, sf)
    // the Generate node prints the generator class, lowercased — and must
    // carry the whole-stage-codegen star (the CollectionGenerator +
    // static-call doGenCode path, not a CodegenFallback iterator)
    df.collect() // materialize so AQE finalizes the plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("hoursplitgenerator"), plan.take(1200))
    assert("""\*\(\d+\) Generate hoursplitgenerator""".r.findFirstIn(plan).isDefined,
      s"Generate not inside WholeStageCodegen:\n${plan.take(1200)}")
    val totalUs = df.collect().map(_.getAs[Long]("covered_us")).sum
    val nEvents = Tables.events(spark, sf).count()
    assert(totalUs == nEvents * 600000000L, s"$totalUs vs ${nEvents * 600000000L}")
    // bounded fan-out: a 10-minute interval touches at most 2 hours
    val nSegs = df.collect().map(_.getAs[Long]("n_segments")).sum
    assert(nSegs <= 2 * nEvents && nSegs >= nEvents)
  }

  test("q162 downsample keeps one real point per bucket and pins the endpoints") {
    import org.apache.spark.sql.functions.col
    val raw = Tables
      .events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) AS t")
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).sorted }
    val got = Frontier.q162(spark, sf).collect().groupBy(_.getString(0))
    got.foreach { case (tpe, rows) =>
      val ts = rows.map(_.getAs[Long]("ts_us")).sorted
      val expect = (raw(tpe).length + 99) / 100
      assert(ts.length == expect, s"$tpe: ${ts.length} picks for ${raw(tpe).length} points")
      assert(ts.head == raw(tpe).head, s"$tpe first endpoint")
      assert(ts.last == raw(tpe).last, s"$tpe last endpoint")
      // every pick is a real input timestamp
      val inSet = raw(tpe).toSet
      ts.foreach(t => assert(inSet.contains(t)))
    }
  }

  test("q163 increase equals the sequential counter replay") {
    val series = Tables
      .events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) AS t", "CAST(floor(value*1000000.0+0.5) AS LONG) AS vu")
      .collect()
      .groupBy(_.getString(0))
    val got = Frontier
      .q163(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date]("day").toString) -> (r.getAs[Long]("increase_u"), r.getAs[Long]("n_resets")))
      .toMap
    series.foreach { case (tpe, rows) =>
      val ordered = rows.map(r => (r.getLong(1), r.getLong(2))).sorted
      var prev = Option.empty[Long]
      val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
      ordered.foreach { case (t, vu) =>
        val day = java.time.Instant.ofEpochMilli(t / 1000).atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
        val (inc, rst) = prev match {
          case None => (0L, 0L)
          case Some(p) if vu >= p => (vu - p, 0L)
          case Some(_) => (vu, 1L)
        }
        val (ai, ar) = acc.getOrElse(day, (0L, 0L))
        acc(day) = (ai + inc, ar + rst)
        prev = Some(vu)
      }
      acc.foreach { case (day, want) =>
        assert(got((tpe, day)) == want, s"$tpe $day: ${got((tpe, day))} vs $want")
      }
    }
  }

  test("q164 quantiles are monotone in q and bracketed by their buckets") {
    val rows = Frontier.q164(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val byQ = rs.map(r => r.getAs[Long]("q_pct") -> r.getAs[Double]("quantile")).toMap
      assert(byQ(50L) <= byQ(90L) && byQ(90L) <= byQ(99L), s"$tpe monotone: $byQ")
      byQ.values.foreach(v => assert(v >= 0.0 && v <= 500.0, s"$tpe bounds"))
    }
  }

  test("q165 recall equals the brute-force list intersection and stays in [0,1]") {
    val exact = VectorQueries
      .q32(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val approx = VectorQueries
      .q34(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    Frontier.q165(spark, sf).collect().foreach { r =>
      val q = r.getAs[Long]("qid")
      val hit = r.getAs[Long]("n_hit")
      assert(hit == (exact(q) & approx.getOrElse(q, Set.empty)).size.toLong, s"qid $q")
      val rec = r.getAs[Double]("recall_at_10")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("q166 z-statistic matches the textbook formula on the exact counts") {
    val r = Frontier.q166(spark, sf).collect().head
    val (n0, c0, n1, c1) =
      (r.getAs[Long]("n0"), r.getAs[Long]("c0"), r.getAs[Long]("n1"), r.getAs[Long]("c1"))
    assert(n0 > 0 && n1 > 0)
    if (c0 + c1 > 0 && c0 + c1 < n0 + n1) {
      val (p0, p1) = (c0.toDouble / n0, c1.toDouble / n1)
      val pp = (c0 + c1).toDouble / (n0 + n1)
      val want = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1.0 / n0 + 1.0 / n1))
      assert(math.abs(r.getAs[Double]("z") - want) < 1e-5)
    }
  }

  test("q167 attribution conserves total purchase revenue") {
    val rows = Frontier.q167(spark, sf).collect()
    val attributed = rows.map(_.getAs[Long]("revenue_u")).sum
    val nPurch = rows.map(_.getAs[Long]("n_purchases")).sum
    val want = Tables
      .events(spark, sf)
      .selectExpr("CAST(floor(value*1000000.0+0.5) AS LONG) AS vu", "event_type")
      .collect()
      .filter(_.getString(1) == "purchase")
    assert(attributed == want.map(_.getLong(0)).sum, "every purchase micro-unit lands in exactly one channel")
    assert(nPurch == want.length.toLong)
    // channels are real event types or 'direct'
    val types = Set("view", "click", "error", "signup", "direct")
    rows.foreach(r => assert(types.contains(r.getAs[String]("channel"))))
  }

  test("q168 top-k plans as a bounded aggregate — no window, no per-group sort") {
    val df = Frontier.q168(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("WindowGroupLimit"), plan.take(1500))
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan.take(1500))
    // ranks are 1..3, values descending within each user
    df.collect().groupBy(_.getLong(0)).foreach { case (u, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rk"))
      assert(byRank.map(_.getAs[Long]("rk")).toSeq == (1L to byRank.length))
      val vs = byRank.map(_.getAs[Long]("vu")).toSeq
      assert(vs == vs.sorted(Ordering[Long].reverse), s"user $u not descending: $vs")
    }
  }

  test("q169 dq report is internally consistent on the clean fixture") {
    val m = Frontier
      .q169(spark, sf)
      .collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Long]("violations"))
      .toMap
    val l = Tables.lineitem(spark, sf)
    assert(m("row_count") == l.count())
    // the synthetic fixture is referentially clean and fully populated…
    Seq("null_orderkey", "null_quantity", "nonpositive_quantity",
      "discount_out_of_range", "negative_price", "orphan_orderkey")
      .foreach(c => assert(m(c) == 0L, s"$c = ${m(c)}"))
    // …but (l_orderkey, l_linenumber) genuinely repeats in it — the report
    // must agree with an independent computation, not with wishful zero
    val wantDup = l.count() -
      l.selectExpr("l_orderkey", "l_linenumber").distinct().count()
    assert(m("duplicate_pk") == wantDup, s"duplicate_pk ${m("duplicate_pk")} vs $wantDup")
    assert(wantDup > 0, "fixture is known to carry duplicate (orderkey, linenumber) pairs")
  }

  test("q172 segments partition the user base into balanced quintile cells") {
    val rows = Frontier.q172(spark, sf).collect()
    val totalUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == totalUsers, "every user lands in exactly one segment")
    rows.foreach { r =>
      Seq("rq", "fq", "mq").foreach(c => assert((1L to 5L).contains(r.getAs[Long](c))))
    }
    // each dimension's quintiles are balanced to within one user
    val perR = rows.groupBy(_.getAs[Long]("rq")).view.mapValues(_.map(_.getAs[Long]("n_users")).sum)
    assert(perR.values.max - perR.values.min <= 1, s"unbalanced recency quintiles: $perR")
  }

  test("q172 plans no partition-less Window (quintiles come from the distributed sort-rank)") {
    // a Window with an empty partition spec funnels every row through one
    // reducer — the whole point of the Ranks rewrite is that none survives
    val plan = Frontier.q172(spark, sf).queryExecution.optimizedPlan
    val globalWindows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, s"unpartitioned Window in q172 plan:\n$plan")
  }

  test("q173 survival curves are monotone non-increasing and equal the sequential product") {
    val rows = Frontier
      .q173(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("variant"), r.getAs[Long]("life"), r.getAs[Long]("n_at_risk"), r.getAs[Long]("d"), r.getAs[Double]("survival")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (v, rs) =>
      val ordered = rs.sortBy(_._2)
      var s = 1.0
      var prev = 1.0
      ordered.foreach { case (_, life, n, d, got) =>
        assert(d > 0 && d <= n)
        s *= 1.0 - d.toDouble / n
        assert(math.abs(got - s) < 1e-5, s"variant $v life $life: $got vs $s")
        assert(got <= prev + 1e-9, s"variant $v survival not monotone at $life")
        prev = got
      }
    }
  }

  test("q174 sax strings cover every hourly segment with a balanced-ish alphabet") {
    val rows = Frontier.q174(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sax = r.getAs[String]("sax")
      assert(sax.length.toLong == r.getAs[Long]("n_segments"))
      assert(sax.forall("abcd".contains(_)))
      // z-normalized quantization against N(0,1) breakpoints: every
      // quartile symbol appears in a month-long series unless the series
      // is pathologically flat
      assert(sax.distinct.length >= 2, s"degenerate alphabet: $sax")
    }
  }

  test("q175 backtest MAEs match a sequential walk-forward replay") {
    val daily = Tables
      .events(spark, sf)
      .selectExpr(
        "event_type",
        "CAST(ts AS DATE) AS day",
        "CAST(floor(value*1000000.0+0.5) AS LONG) AS vu")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.sum("vu").as("vu"))
      .collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date](1).toString, r.getAs[Long](2)))
      .groupBy(_._1)
    val got = Frontier
      .q175(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getAs[String]("method")) -> ((r.getAs[Long]("n_evals"), r.getAs[Double]("mae"))))
      .toMap
    daily.foreach { case (tpe, rs) =>
      val series = rs.sortBy(_._2).map(_._3)
      val aes = scala.collection.mutable.Map("naive" -> List.empty[Long], "seasonal" -> List.empty[Long], "ma7" -> List.empty[Long])
      series.indices.foreach { i =>
        if (i >= 7) { // full history for every forecaster
          aes("naive") = math.abs(series(i) - series(i - 1)) :: aes("naive")
          aes("seasonal") = math.abs(series(i) - series(i - 7)) :: aes("seasonal")
          val ma = math.floor(series.slice(i - 7, i).sum.toDouble / 7 + 0.5).toLong
          aes("ma7") = math.abs(series(i) - ma) :: aes("ma7")
        }
      }
      aes.foreach { case (m, list) =>
        val (n, mae) = got((tpe, m))
        assert(n == list.length.toLong, s"$tpe/$m n")
        val want = list.sum.toDouble / list.length / 1e6
        assert(math.abs(mae - want) < 1e-5, s"$tpe/$m: $mae vs $want")
      }
    }
  }

  test("q176 hard negatives match a brute-force contrastive mining replay") {
    val vecs = Tables
      .embeddings(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray, r.getAs[Int]("label")))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      a.indices.foreach { i => d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e4 + 0.5) / 1e4
    }
    val got = Frontier.q176(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val (_, qe, qlab) = vecs.find(_._1 == qid).get
      def best(sameLabel: Boolean): (Long, Double) =
        vecs
          .filter(v => v._1 != qid && (v._3 == qlab) == sameLabel)
          .map(v => (v._1, cos(qe, v._2)))
          .maxBy { case (id, s) => (s, -id) }
      val (pid, psim) = best(sameLabel = true)
      val (nid, nsim) = best(sameLabel = false)
      assert(r.getAs[Long]("pos_id") == pid && r.getAs[Double]("pos_sim") == psim, s"qid $qid pos")
      assert(r.getAs[Long]("neg_id") == nid && r.getAs[Double]("neg_sim") == nsim, s"qid $qid neg")
    }
  }

  test("q171 episode report agrees with a sequential scan of the q157 series") {
    val per = Frontier
      .q157(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString, r.getAs[Boolean]("drift"), r.getAs[Long]("cusum")))
    val want = per.groupBy(_._1).map { case (et, series) =>
      val ordered = series.sortBy(_._2)
      val driftDays = ordered.count(_._3).toLong
      val episodes = ordered
        .foldLeft((0L, false)) { case ((eps, prev), (_, _, d, _)) =>
          (if (d && !prev) eps + 1 else eps, d)
        }
        ._1
      val firstDay = ordered.collectFirst { case (_, day, true, _) => day }
      (et, (driftDays, episodes, firstDay, ordered.map(_._4).max))
    }
    val got = Frontier
      .q171(spark, sf)
      .collect()
      .map { r =>
        val fd = Option(r.getAs[java.sql.Date]("first_drift_day")).map(_.toString)
        (r.getAs[String]("event_type"),
          (r.getAs[Long]("drift_days"), r.getAs[Long]("episodes"), fd, r.getAs[Long]("max_cusum")))
      }
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (et, w) => assert(got(et) == w, s"series $et: got ${got(et)} want $w") }
  }

  test("q157 closed-form cusum equals the sequential recursion") {
    val rows = Frontier
      .q157(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("n"), r.getAs[Long]("cusum")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, series) =>
      val ordered = series.sortBy(_._2)
      val d = ordered.length.toLong
      val nn = ordered.map(_._3).sum
      var st = 0L
      ordered.foreach { case (_, _, n, gotCusum) =>
        // recursion on the same 10·D-scaled integer deviations
        st = math.max(0L, st + (10L * d * n - 11L * nn))
        assert(gotCusum == st, s"cusum mismatch: got $gotCusum want $st")
      }
    }
  }
}
