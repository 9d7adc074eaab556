package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators (`Aggregator[IN, BUF, OUT]`) — the idiomatic
  * Spark surface for aggregation logic the built-ins lack. Registered as
  * untyped UDAFs via `functions.udaf` where a query needs them as Columns.
  *
  * Both aggregators here are algebraic (commutative monoid buffers), so
  * Catalyst runs them partial+final with map-side combine — same shuffle
  * shape as a built-in sum.
  */
object Aggregators {

  /** Weighted mean: Σvw/Σw with empty→0. The workhorse behind
    * time-weighted averages (weight = holding duration of each point).
    */
  class WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) = {
      val (v, w) = in
      // null weights arrive as NaN-free 0-contributions upstream; a missing
      // lead() duration is filtered before the aggregator sees it
      (b._1 + v * w, b._2 + w)
    }
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 > 0) r._1 / r._2 else 0.0
    override def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Last-write-wins merge: keeps the value with the max (ts, tie) — the
    * reference's upsert semantics (`internal/storage/hot.go:50-60`) as an
    * associative aggregate, usable for streaming state compaction.
    */
  case class Stamped(ts: Long, tie: Long, value: String)
  class LastWrite extends Aggregator[Stamped, Stamped, String] {
    override def zero: Stamped = Stamped(Long.MinValue, Long.MinValue, null)
    override def reduce(b: Stamped, in: Stamped): Stamped = merge(b, in)
    override def merge(a: Stamped, b: Stamped): Stamped =
      if (b.ts > a.ts || (b.ts == a.ts && b.tie > a.tie)) b else a
    override def finish(r: Stamped): String = r.value
    override def bufferEncoder: Encoder[Stamped] = Encoders.product[Stamped]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
