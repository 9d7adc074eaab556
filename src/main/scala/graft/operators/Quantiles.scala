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

  /** Per-group exact discrete quantiles from ONE stacked sort-rank.
    *
    * `order` must lead with `groupCol` ascending, so each group occupies a
    * contiguous global-rank block; the group's quantile ranks are then
    * just blockOffset + ⌈p·n_g⌉, and a single broadcast join against the
    * (|groups|·|ps|)-row boundary table picks the result rows. Scale: the
    * data-side cost is exactly [[exact]]'s one range shuffle; per-group
    * counts are a keyed aggregation collected to the driver (bounded by
    * the number of GROUPS, not rows — the same driver-size class as a
    * k-means centroid set). String group keys only (offsets must follow
    * the range partitioner's UTF-8 binary order, see
    * [[graft.sources.kv.KvKeyRange.u8cmp]]).
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
    val counts = df
      .groupBy(col(groupCol))
      .count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      // Spark's string asc IS UTF-8 binary order; Scala's default String
      // ordering is UTF-16 — diverges on supplementary-plane keys
      .sortWith((a, b) => graft.sources.kv.KvKeyRange.u8cmp(a._1, b._1) < 0)
    val offsets = counts.scanLeft(0L) { case (acc, (_, n)) => acc + n }
    // global quantile ranks are unique across groups (disjoint blocks), so
    // the join key is the rank alone; the group column rides along
    val wanted = counts.zip(offsets).flatMap { case ((_, n), off) =>
      ps.map(p => (off + rankOf(p, n), math.round(p * 100)))
    }
    val spark = df.sparkSession
    import spark.implicits._
    Ranks
      .globalRowNumber(df, order, "__r", partitions, cleanup)
      .join(broadcast(wanted.toSeq.toDF("__r", "p_pct")), Seq("__r"))
      .select(col(groupCol), col("p_pct"), col(valueCol))
      .orderBy(col(groupCol), col("p_pct"))
  }
}
