package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed quantiles — the scale-safe form of
  * `quantile_disc` / `percentile`.
  *
  * Spark's exact `percentile` aggregate collects every value per group
  * into one aggregation buffer (fine per-group, fatal for a GLOBAL
  * quantile over billions of rows), and `approx_percentile` trades away
  * exactness. The distributed-exact form reuses the [[Ranks]] machinery:
  * range-partition on (value, tiebreaker), rank locally, add partition
  * offsets, and keep ONLY the rows whose global rank hits the requested
  * quantile ranks — `⌈p·n⌉` for the discrete quantile at fraction p. Every
  * step is parallel; the only driver-side data is the per-partition count
  * metadata and the |ps| result rows.
  *
  * Determinism: `order` must be a total order whose FIRST column is the
  * quantile value; ties broken by the remaining columns do not affect the
  * returned value (equal values are interchangeable at a rank boundary)
  * but keep ranks reproducible cross-run and cross-engine.
  */
object Quantiles {

  /** The discrete quantile rank: smallest rank whose prefix covers
    * fraction p of n rows (`⌈p·n⌉`, floored at 1).
    */
  def rankOf(p: Double, n: Long): Long =
    math.max(1L, math.ceil(p * n - 1e-9).toLong)

  /** Returns one row per requested fraction: (p_pct, value) where value
    * is `valueCol` of the row at global rank ⌈p·n⌉ under `order`.
    *
    * `n` is the caller-supplied exact row count (a parquet-metadata count
    * for unfiltered scans — don't pay a full pass when the footer already
    * knows). Cached intermediates created by the internal rank are
    * appended to `cleanup` exactly as [[Ranks.globalRowNumber]] does.
    */
  def exact(
      df: DataFrame,
      valueCol: String,
      order: Seq[Column],
      ps: Seq[Double],
      n: Long,
      partitions: Int = 0,
      cleanup: scala.collection.mutable.Buffer[DataFrame] = null): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0), "fractions must be in (0, 1]")
    val wanted: Map[Long, Seq[Double]] =
      ps.groupBy(p => rankOf(p, n))
    val hits = Ranks
      .globalRowNumber(df, order, "__r", partitions, cleanup)
      .filter(col("__r").isin(wanted.keys.toSeq: _*))
      .select(col("__r"), col(valueCol))
    // one result row per fraction, even when two fractions share a rank
    val expand = wanted.toSeq.flatMap { case (r, fracs) => fracs.map(p => (r, math.round(p * 100))) }
    val spark = df.sparkSession
    import spark.implicits._
    hits
      .join(broadcast(expand.toDF("__r", "p_pct")), Seq("__r"))
      .select(col("p_pct"), col(valueCol))
      .orderBy(col("p_pct"))
  }

  /** Per-group exact discrete quantiles from ONE stacked sort-rank,
    * group-count-UNBOUNDED: no per-group state ever reaches the driver.
    *
    * `order` must lead with `groupCol` ascending, so each group occupies a
    * contiguous global-rank block; the group's quantile ranks are then
    * just blockOffset + ⌈p·n_g⌉. Both block quantities come from ONE keyed
    * aggregation over the ranked frame that STAYS distributed — the offset
    * is `min(rank) − 1` (contiguity makes the prefix sum unnecessary) and
    * the size is `count(*)` — and the |groups|·|ps|-row target-rank table
    * joins back on the globally-unique rank. Scale: the data-side cost is
    * exactly [[exact]]'s one range shuffle plus one #groups-sized hash agg
    * and a rank-keyed join Spark broadcasts when the group count is small
    * and shuffles when it is not; per-USER/per-SERIES quantiles over
    * millions of groups never funnel through the driver (the earlier form
    * collected a per-group count array and sorted it single-threaded).
    * Any orderable group type works, null group keys included — group
    * identity only ever feeds `groupBy` and rides along the ranked rows;
    * nothing compares keys outside the engine.
    */
  def exactGrouped(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      order: Seq[Column],
      ps: Seq[Double],
      partitions: Int = 0,
      cleanup: scala.collection.mutable.Buffer[DataFrame] = null): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0), "fractions must be in (0, 1]")
    val ranked = Ranks.globalRowNumber(df, order, "__r", partitions, cleanup)
    // one row per (group, fraction): the group's global target rank. The
    // rankOf arithmetic is replayed in Column form: ⌈p·n − ε⌉ floored at 1.
    val targets = ranked
      .groupBy(col(groupCol))
      .agg((min(col("__r")) - lit(1L)).as("__off"), count(lit(1)).as("__n"))
      .select(
        explode(array(ps.map { p =>
          struct(
            (col("__off") +
              greatest(lit(1L), ceil(lit(p) * col("__n") - lit(1e-9)).cast("long"))).as("__r"),
            lit(math.round(p * 100)).as("p_pct"))
        }: _*)).as("__t"))
      .select(col("__t.__r").as("__r"), col("__t.p_pct").as("p_pct"))
    // ranks are globally unique (disjoint contiguous blocks), so the join
    // key is the rank alone; the group column rides along on the ranked
    // side — no key comparison, so nulls and any data type are fine
    ranked
      .join(targets, Seq("__r"))
      .select(col(groupCol), col("p_pct"), col(valueCol))
      .orderBy(col(groupCol), col("p_pct"))
  }
}
