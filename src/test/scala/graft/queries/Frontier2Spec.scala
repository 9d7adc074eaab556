package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Laws for the round-6 Frontier2 operators (exact values gate at sf0.01;
  * these pin algebraic properties at sf0.001).
  */
class Frontier2Spec extends SparkSpec {

  test("q180 ORC round-trip report equals the same report computed from parquet directly") {
    val viaOrc = Frontier2.q180(spark, sf).collect().map(_.toSeq).toSeq
    val direct = Tables
      .events(spark, sf)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long")).as("sum_vu"),
        min(unix_micros(col("ts"))).as("min_ts_us"),
        max(unix_micros(col("ts"))).as("max_ts_us"),
        sum(graft.functions.Text.hash60(col("props")) % lit(1000000007L)).as("props_h"),
        sum(col("event_id")).as("sum_ids"))
      .orderBy(col("event_type"))
      .collect()
      .map(_.toSeq)
      .toSeq
    assert(viaOrc == direct)
    assert(viaOrc.size == 5)
  }

  test("q181 matches a brute-force double-precision quantization audit") {
    val rows = Tables
      .embeddings(spark, sf)
      .select(col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val per = rows.map { case (label, x) =>
      val s = math.max(x.map(math.abs).max, 1e-30)
      val q = x.map(v => math.floor(v / s * 127.0 + 0.5).toLong)
      val xu = x.map(v => math.floor(v * 1000000.0 + 0.5).toLong)
      val dot = xu.zip(q).map { case (a, b) => a * b }.sum
      val xn = xu.map(a => a * a).sum
      val qn = q.map(a => a * a).sum
      val cos = dot.toDouble / math.max(math.sqrt(xn.toDouble) * math.sqrt(qn.toDouble), 1e-30)
      (label, math.floor(cos * 1000000.0 + 0.5).toLong)
    }
    val want = per
      .groupBy(_._1)
      .map { case (label, xs) =>
        val cs = xs.map(_._2)
        (label, cs.length.toLong, cs.sum, cs.min,
          math.floor(cs.sum.toDouble / cs.length + 0.5).toLong)
      }
      .toSeq
      .sortBy(_._1)
    val got = Frontier2
      .q181(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == want)
    // int8 with a per-vector scale loses < 1% cosine on this corpus
    assert(got.forall(_._4 > 990000L))
  }

  test("q182 report is monotone in k and classes partition the user population") {
    val got = Frontier2
      .q182(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.map(_._1) == Seq(2L, 5L, 10L, 25L))
    // class count is k-independent; below-counts are nondecreasing in k
    assert(got.map(_._2).distinct.size == 1)
    assert(got.map(_._3) == got.map(_._3).sorted)
    assert(got.map(_._4) == got.map(_._4).sorted)
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    // at k = 25 every class below 25 is counted; users_below never exceeds the population
    assert(got.last._4 <= nUsers)
  }

  test("q183 direction is unit-norm (snap tolerance) and aligns with a double-precision power iteration") {
    val got = Frontier2.q183(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._1).toSeq == (0L until 64L))
    val v = got.map(_._2.toDouble / 1e6)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"norm=$norm")
    // brute-force double-precision power iteration from the same v0
    val xs = Tables
      .embeddings(spark, sf)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    var bf = Array.fill(64)(0.125)
    for (_ <- 1 to 3) {
      val w = Array.fill(64)(0.0)
      xs.foreach { x =>
        val dot = x.zip(bf).map { case (a, b) => a * b }.sum
        for (i <- 0 until 64) w(i) += x(i) * dot
      }
      val n = math.max(math.sqrt(w.map(x => x * x).sum), 1e-30)
      bf = w.map(_ / n)
    }
    val cosine = v.zip(bf).map { case (a, b) => a * b }.sum
    assert(math.abs(cosine) > 0.999, s"cos(graft, brute)=$cosine")
  }

  test("q183 iteration shape: direction broadcasts; corpus⋈dots is exchange- and sort-free") {
    // q183/q186 now run their iterations eagerly (the direction is a
    // collected model parameter), so the returned frame is a literal —
    // assert the per-iteration join shape on the same construction the
    // loop uses: corpus hash-partitioned by vec_id, per-vector aggregate
    // joined with the SHUFFLE_HASH hint.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val xu = (1 to 1000)
      .flatMap(vid => (0 until 8).map(p => (vid.toLong, p, (vid * p).toLong)))
      .toDF("vec_id", "pos", "xu")
      .repartition(col("vec_id"))
    val v = (0 until 8).map(p => (p, 125000L)).toDF("pos", "v6")
    val dots = xu
      .join(broadcast(v), Seq("pos"))
      .groupBy(col("vec_id"))
      .agg(sum(col("xu") * col("v6")).as("dot_m"))
    val w = xu.join(dots.hint("shuffle_hash"), Seq("vec_id")).groupBy(col("pos")).agg(sum(col("xu") * col("dot_m")))
    val plan = w.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan) // the direction side
    assert(plan.contains("ShuffledHashJoin"), plan) // corpus⋈dots: hash, not SMJ
    // the back-projection join inserts NO sort (SMJ would) and NO new
    // exchange on the corpus side beyond the single vec_id repartition
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q186 components are near-unit-norm, pairwise near-orthogonal, and c1 equals q183") {
    val rows = Frontier2.q186(spark, sf).collect()
    assert(rows.length == 3 * 64)
    val comps: Map[Long, Array[Double]] = rows
      .groupBy(_.getAs[Long]("component"))
      .map { case (c, rs) =>
        c -> rs.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("loading_u").toDouble / 1e6)
      }
    // unit norm up to snap tolerance
    comps.foreach { case (c, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"component $c norm $n")
    }
    // deflation law: 3-iteration estimates are near-orthogonal (exact
    // orthogonality needs full convergence; the residual alignment is
    // bounded by the power-iteration error)
    for (a <- 1 to 3; b <- (a + 1) to 3) {
      val cos = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(cos) < 0.05, s"cos(v$a, v$b) = $cos")
    }
    // component 1 IS q183's direction (identical integer path)
    val q183v = Frontier2
      .q183(spark, sf)
      .collect()
      .sortBy(_.getAs[Long]("pos"))
      .map(_.getAs[Long]("loading_u"))
    assert(q183v.sameElements(comps(1L).map(x => math.round(x * 1e6))))
  }
}
