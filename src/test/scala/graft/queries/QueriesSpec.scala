package graft.queries

import graft.SparkSpec

class QueriesSpec extends SparkSpec {

  test("from-scratch HLL and native approx_count_distinct both land near exact (q48)") {
    import org.apache.spark.sql.functions._
    val hll = Extended
      .q48(spark, sf)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    val native = graft.core.Tables
      .lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val exact = graft.core.Tables
      .lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    exact.foreach { case (k, n) =>
      // m=256 registers → standard error 1.04/sqrt(256) = 6.5%; allow 3σ
      assert(math.abs(hll(k) - n) / n < 0.20, s"$k: hll ${hll(k)} vs exact $n")
      assert(math.abs(native(k) - n).toDouble / n < 0.05, s"$k: native ${native(k)} vs exact $n")
    }
  }

  test("sampled and GK-sketch percentiles both land near exact (q71 vs q41)") {
    import org.apache.spark.sql.functions._
    // q71 = deterministic 20% hash-sample + exact interpolation; GK picks a
    // real element (no interpolation). Both bounded vs q41's exact values
    // on the p90 scale without masking real bugs. The sampling law runs at
    // sf0.01 — per-type sample counts at sf0.001 (tens of rows) put even a
    // correct estimator's tail noise above any meaningful bound.
    val sf01 = "/root/testdata/sf0.01"
    val sampled = Extended
      .q71(spark, sf01)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val gk = graft.core.Tables
      .events(spark, sf)
      .groupBy(col("event_type"))
      .agg(
        expr("approx_percentile(value, 0.5, 10000)").as("ap50"),
        expr("approx_percentile(value, 0.9, 10000)").as("ap90"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // quantile-space bound: the sampled p-th quantile must land between the
    // exact (p-8%) and (p+8%) quantiles — the statistically correct law for
    // an order-statistic estimator (value-space bounds depend on the local
    // density, which is tiny in this fixture's exponential-ish tail).
    // ~400 sampled rows/type → SE ≈ sqrt(.25/400) = 2.5%, so ±8% ≈ 3σ.
    val bounds = graft.core.Tables
      .events(spark, sf01)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.42)").as("lo50"), expr("percentile(value, 0.58)").as("hi50"),
        expr("percentile(value, 0.82)").as("lo90"), expr("percentile(value, 0.98)").as("hi90"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    bounds.foreach { case (t, (lo50, hi50, lo90, hi90)) =>
      val (s50, s90) = sampled(t)
      assert(s50 >= lo50 && s50 <= hi50, s"$t sampled p50 $s50 outside exact [$lo50,$hi50]")
      assert(s90 >= lo90 && s90 <= hi90, s"$t sampled p90 $s90 outside exact [$lo90,$hi90]")
    }
    Extended.q41(spark, sf).collect().foreach { r =>
      val (g50, g90) = gk(r.getString(0))
      val span = math.max(1e-9, math.abs(r.getDouble(2))) // p90 as the scale
      assert(math.abs(g50 - r.getDouble(1)) / span < 0.03, s"${r.getString(0)} gk p50: $g50 vs ${r.getDouble(1)}")
      assert(math.abs(g90 - r.getDouble(2)) / span < 0.03, s"${r.getString(0)} gk p90: $g90 vs ${r.getDouble(2)}")
    }
  }

  test("flagship entry() returns non-empty aggregated output") {
    val rows = graft.SparkEntry.entry(spark).collect()
    assert(rows.length > 0)
    assert(rows.forall(_.getLong(2) > 0)) // n_orders
  }

  test("filters and projections reach the parquet scan (q02 pushdown)") {
    val plan = Relational.q02(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus), IsNotNull(o_totalprice), EqualTo(o_orderstatus,F)"), plan)
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>"), plan)
  }

  test("small dimensions broadcast in the star join (q03)") {
    val plan = Relational.q03(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("ranked top-k plans as WindowGroupLimit, not a global sort (q04)") {
    val plan = Relational.q04(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("minhash signatures are shuffle-free: map-only until the output sort (q25)") {
    val plan = TextQueries.q25(spark, sf).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // signatures are row-local arithmetic; only the presentation orderBy
    // may exchange
    assert(exchanges.length <= 1, plan.toString)
    assert(!plan.toString.contains("HashAggregate"), plan.toString)
  }

  test("heavy hitters plan as TakeOrderedAndProject, not a global sort (q84)") {
    val plan = Corpus.q84(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("GlobalLimit"), plan)
  }

  test("mixture rebalance broadcasts stratum stats — no sort-merge join (q92)") {
    val plan = Corpus.q92(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("PII scrub is a single narrow pipeline — no shuffle before the output sort (q83)") {
    val plan = Corpus.q83(spark, sf).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the only exchange allowed is the presentation orderBy's range partition
    assert(exchanges.length <= 1, plan.toString)
  }

  test("correlated scalar subquery decorrelates into an aggregate-join (q75)") {
    val qe = Extended.q75(spark, sf).queryExecution
    val optimized = qe.optimizedPlan.toString
    // decorrelation rewrites the per-row subquery away entirely
    assert(!optimized.contains("scalar-subquery"), s"subquery survived optimization:\n$optimized")
    assert(optimized.contains("Aggregate"), optimized)
    // and the result is non-degenerate
    val rows = Extended.q75(spark, sf).collect()
    assert(rows.length == 2 && rows.forall(_.getLong(2) > 0))
  }

  test("EXISTS + NOT EXISTS decorrelate into semi and anti joins (q120)") {
    val qe = Extended.q120(spark, sf).queryExecution
    val optimized = qe.optimizedPlan.toString
    assert(!optimized.contains("exists-subquery"), s"subquery survived optimization:\n$optimized")
    assert(optimized.contains("LeftSemi"), optimized)
    assert(optimized.contains("LeftAnti"), optimized)
  }

  test("nested IN with correlated HAVING decorrelates fully (q121)") {
    val optimized = Extended.q121(spark, sf).queryExecution.optimizedPlan.toString
    assert(
      !optimized.contains("scalar-subquery") && !optimized.contains("list-subquery"),
      s"subquery survived optimization:\n$optimized")
  }

  test("scalar udf surface works but the native form matches it (prefer codegen)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a Scala closure UDF — supported, but breaks whole-stage codegen;
    // the library keeps them out of hot paths (cf. functions.Text/Vectors)
    val tokCount = udf((s: String) => s.toLowerCase.split(" ").count(_.nonEmpty))
    val docs = graft.core.Tables.documents(spark, sf)
    val viaUdf = docs.select($"doc_id", tokCount($"text").cast("long").as("n")).orderBy("doc_id").collect()
    val native = docs
      .select($"doc_id", size(graft.functions.Text.tokens($"text")).cast("long").as("n"))
      .orderBy("doc_id")
      .collect()
    assert(viaUdf.map(_.getLong(1)).toSeq == native.map(_.getLong(1)).toSeq)
  }

  test("every registered query has a distinct, non-empty result at sf0.001") {
    val qs = graft.SparkEntry.queries
    assert(qs.size >= 48)
    // oracles reference only registered queries
    graft.SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"orphan oracle $k"))
  }

  test("q107 SCD2 intervals tile each user's timeline: no gaps, one open, values change") {
    val rows = EventQueries.q107(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, ivs) =>
      // already sorted by valid_from (query orderBy); exactly one open interval
      assert(ivs.count(_.isNullAt(ivs.head.fieldIndex("valid_to"))) == 1, s"user $uid open intervals")
      assert(ivs.last.isNullAt(ivs.last.fieldIndex("valid_to")), s"user $uid: open interval not last")
      ivs.sliding(2).foreach {
        case Array(a, b) =>
          // each interval closes exactly where the next opens (no gap/overlap)
          assert(
            a.getAs[java.sql.Timestamp]("valid_to") == b.getAs[java.sql.Timestamp]("valid_from"),
            s"user $uid: gap or overlap")
          // a new interval only opens on a changed value
          assert(a.getAs[Double]("value") != b.getAs[Double]("value"), s"user $uid: no-op interval")
        case _ => ()
      }
      assert(ivs.forall(r => r.getAs[Boolean]("is_current") == r.isNullAt(r.fieldIndex("valid_to"))))
    }
    // both windows hash on user_id: the plan needs exactly ONE hash exchange
    val plan = EventQueries.q107(spark, sf).queryExecution.executedPlan.toString
    val hashEx = "hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected one shared user_id exchange, got $hashEx:\n$plan")
  }

  test("round-4 plan shapes: q124 stays narrow, q126 aggregates once, q130 is a hash join") {
    // q124 scoring is row-local: no hash shuffle may appear before the
    // output sort (the only exchanges are the scan spread + range sort)
    val p124 = Corpus.q124(spark, sf).queryExecution.executedPlan.toString
    assert(!p124.contains("hashpartitioning"), p124)
    // q126's manifest is one map-side-combined aggregate on 64 shard keys
    val p126 = Corpus.q126(spark, sf).queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(p126).length == 1, p126)
    // q130's interval containment must ride the user_id equi-join (hash or
    // sort-merge with the range condition as join filter), never a
    // nested-loop cross product
    val p130 = EventQueries.q130(spark, sf).queryExecution.executedPlan.toString
    assert(!p130.contains("BroadcastNestedLoopJoin"), p130)
    assert(p130.contains("HashJoin") || p130.contains("SortMergeJoin"), p130)
  }

  test("q130 point-in-time join agrees with the native as-of operator and preserves fact rows") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ev = graft.core.Tables.events(spark, sf)
    val facts = ev.filter(col("event_type") === "click")
    val pit = EventQueries.q130(spark, sf).collect()
    assert(pit.length == facts.count(), "left join must preserve fact cardinality")
    assert(pit.map(_.getLong(0)).distinct.length == pit.length, "one row per fact (intervals tile)")
    // same semantics through the native as-of operator over the SCD2
    // change points: latest change with ts <= fact ts, per user
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      .withColumn("prev", lag(col("value"), 1).over(w))
      .filter(col("prev").isNull || col("value") =!= col("prev"))
      .select(col("user_id").as("r_uid"), col("ts").as("r_ts"), col("value").as("r_val"), col("event_id").as("r_eid"))
    val asof = graft.plans.AsOfJoin
      .join(
        facts.select(col("user_id"), col("event_id"), col("ts")),
        changes,
        "user_id", "r_uid", "ts", "r_ts", "r_eid")
      .select(col("event_id"), col("r_val"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    pit.foreach { r =>
      val got = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      assert(asof(r.getLong(0)) == got, s"as-of vs interval mismatch for fact ${r.getLong(0)}")
    }
  }
}
