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

  /** Misra–Gries heavy-hitters summary with k counters: any item whose true
    * frequency exceeds N/(k+1) is guaranteed present in the summary, and
    * every reported count is within N/(k+1) of the truth. The buffer is a
    * bounded map (≤ k entries), so per-partition state is O(k) regardless
    * of vocabulary size — the scale path when the exact q84 aggregation's
    * key space (the full vocabulary) is itself the bottleneck.
    *
    * The merge is the mergeable-summaries construction (Agarwal et al.,
    * "Mergeable Summaries", PODS'12): add counts, then subtract the
    * (k+1)-largest count from every entry and drop the non-positives —
    * associative up to the error bound, which is what the guarantee needs.
    */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], x: String): Map[String, Long] = {
      val b2 = b.updated(x, b.getOrElse(x, 0L) + 1L)
      if (b2.size <= k) b2
      else {
        // k+1 distinct keys: decrement all, drop zeros (classic MG step)
        b2.map { case (t, c) => t -> (c - 1L) }.filter(_._2 > 0L)
      }
    }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (acc, (t, c)) => acc.updated(t, acc.getOrElse(t, 0L) + c) }
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-largest
        sum.map { case (t, c) => t -> (c - cut) }.filter(_._2 > 0L)
      }
    }
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }

  /** Bounded top-k: keeps the k largest (v, id) pairs, v descending with
    * ascending-id tie-break. The buffer is a sorted list of ≤ k entries,
    * so per-group aggregation state is O(k) REGARDLESS of group size and
    * the aggregate is map-side combinable — the scale-safe alternative to
    * rank-window top-k (which sorts every group's full row set) and to
    * collect_list-then-slice (whose buffer is the whole group: the q68
    * postings trap). Insert is O(k) per row, merge is a bounded sorted
    * merge — a commutative, associative, idempotent-under-order monoid,
    * so Catalyst runs it partial+final like a built-in sum.
    */
  case class TopItem(v: Long, id: Long)
  case class TopBuf(items: List[TopItem])
  class TopK(k: Int) extends Aggregator[TopItem, TopBuf, Seq[TopItem]] {
    private def better(a: TopItem, b: TopItem): Boolean =
      a.v > b.v || (a.v == b.v && a.id < b.id)
    private def insert(items: List[TopItem], x: TopItem): List[TopItem] = {
      val (pre, post) = items.span(better(_, x))
      val merged = pre ::: (x :: post)
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }
    override def zero: TopBuf = TopBuf(Nil)
    override def reduce(b: TopBuf, x: TopItem): TopBuf =
      if (b.items.lengthCompare(k) == 0 && better(b.items.last, x) && b.items.last != x) b
      else TopBuf(insert(b.items, x))
    override def merge(a: TopBuf, b: TopBuf): TopBuf =
      TopBuf(b.items.foldLeft(a.items)(insert))
    override def finish(r: TopBuf): Seq[TopItem] = r.items
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[Seq[TopItem]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopItem]]()
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
