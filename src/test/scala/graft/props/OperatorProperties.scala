package graft.props

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

/** Property tests for operator laws (SURVEY §5.2 layer 2): as-of join vs a
  * brute-force oracle, sessionize's gap law, and dedup conservation — over
  * ScalaCheck-generated inputs rather than the fixtures.
  */
object OperatorProperties extends Properties("graft.operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = graft.core.GraftSession.local(cores = 4, appName = "props")

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private case class Ev(id: Long, user: Long, offsetSec: Long, value: Double)

  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(
      n,
      for {
        user <- Gen.choose(0L, 3L)
        off <- Gen.choose(0L, 7200L)
        v <- Gen.choose(0, 10000).map(_ / 100.0)
      } yield (user, off, v))
  } yield evs.zipWithIndex.map { case ((u, o, v), i) => Ev(i.toLong, u, o, v) }

  private def toDf(evs: List[Ev]) = {
    import spark.implicits._
    evs
      .map(e => (e.id, e.user, new Timestamp(base + e.offsetSec * 1000L), e.value))
      .toDF("event_id", "user_id", "ts", "value")
  }

  property("asOfJoin equals brute force") = forAll(genEvents, genEvents) { (ls, rs) =>
    val left = toDf(ls)
    val right = toDf(rs).select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val got = graft.operators.TimeSeriesOps
      .asOfJoin(left.select("event_id", "user_id", "ts"), right, "user_id", "ts", "ts", "event_id", Map("value" -> "pv"))
      .select("event_id", "pv")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    ls.forall { e =>
      val want = rs
        .filter(p => p.user == e.user && p.offsetSec <= e.offsetSec)
        .sortBy(p => (p.offsetSec, p.id))
        .lastOption
        .map(_.value)
      got(e.id) == want
    }
  }

  property("sessionize: sessions per user = 1 + gaps > threshold") = forAll(genEvents) { evs =>
    evs.isEmpty || {
      val gapMin = 10
      val out = graft.operators.TimeSeriesOps
        .sessionize(toDf(evs), "user_id", "ts", "event_id", gapMin)
        .groupBy("user_id")
        .agg(max("session_id").as("n_sessions"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      evs.groupBy(_.user).forall { case (u, es) =>
        val sorted = es.sortBy(e => (e.offsetSec, e.id)).map(_.offsetSec)
        val gaps = sorted.zip(sorted.tail).count { case (a, b) => b - a > gapMin * 60L }
        out(u) == gaps + 1L
      }
    }
  }

  property("gap-fill interpolation stays within the series' value envelope") = forAll(genEvents) { evs =>
    evs.isEmpty || {
      import org.apache.spark.sql.functions._
      val out = graft.operators.TimeSeriesOps
        .gapFillInterpolateDaily(toDf(evs), "user_id", "ts", max(col("value")))
        .collect()
      val bounds = evs.groupBy(_.user).map { case (u, es) =>
        // interpolation happens on the DAILY MAX series, so the envelope is
        // over per-day maxima (== per-user max/min of those maxima)
        val daily = es.groupBy(_.offsetSec / 86400L).map(_._2.map(_.value).max)
        u -> (daily.min, daily.max)
      }
      out.forall { r =>
        val (lo, hi) = bounds(r.getLong(0))
        val v = r.getDouble(3)
        v >= lo - 1e-9 && v <= hi + 1e-9
      }
    }
  }

  property("topKPerGroup returns min(k, group size) rows per group, rank-consecutive") = forAll(genEvents) { evs =>
    evs.isEmpty || {
      import org.apache.spark.sql.functions._
      val sizes = evs.groupBy(_.user).map { case (u, es) => u -> math.min(3, es.size) }
      val byUser = graft.operators.TimeSeriesOps
        .topKPerGroup(toDf(evs), Seq("user_id"), Seq(col("value").desc, col("event_id").asc), 3)
        .select(col("user_id"), col("rk"))
        .collect()
        .groupBy(_.getLong(0))
      sizes.forall { case (u, n) =>
        byUser(u).map(_.getInt(1)).sorted.toSeq == (1 to n)
      }
    }
  }

  property("exact dedup conserves rows and is idempotent") = forAll(
    Gen.listOf(Gen.oneOf("alpha beta", "gamma delta", "epsilon", "zeta eta theta"))) { texts =>
    if (texts.isEmpty) Prop.passed
    else {
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val d = graft.llm.Dedup.exact(df, "doc_id", "text")
      val conserved = d.agg(sum("dup_cnt")).head.getLong(0) == texts.length
      val distinctCnt = d.count() == texts.distinct.length
      Prop(conserved && distinctCnt)
    }
  }

  property("two-level packing prefix equals the single-window reference") = forAll(
    Gen.chooseNum(1, 80),
    Gen.chooseNum(1L, 7L),
    Gen.chooseNum(8L, 64L)) { (nDocs: Int, nStrata: Long, capacity: Long) =>
    import spark.implicits._
    // ids deliberately sparse/shuffled so block boundaries don't align with strata
    val rows = (0 until nDocs).map { i =>
      val id = i.toLong * 3 + (i % 5)
      (id, s"s${id % nStrata}", 1L + (id * 7) % 23)
    }
    val df = rows.toDF("doc_id", "source", "n_tok")
    val got = graft.operators.Packing
      .tokenBudgetPack(df, "doc_id", "source", "n_tok", capacity, blockSize = 8L)
      .select("doc_id", "pack_id")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // reference: plain per-stratum running sum
    val want = rows
      .groupBy(_._2)
      .flatMap { case (_, rs) =>
        var before = 0L
        rs.sortBy(_._1).map { case (id, _, t) =>
          val p = before / capacity
          before += t
          id -> p
        }
      }
    Prop(got == want)
  }
}
