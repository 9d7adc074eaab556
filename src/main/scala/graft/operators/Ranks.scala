package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global ranking without a single-partition sort.
  *
  * `Window.orderBy(...)` with no partition key funnels the whole frame
  * through ONE reducer — the classic scale-killer (fine at thousands of
  * rows, fatal at billions). The scalable form is the distributed
  * sort-rank: range-partition on the sort key so partition i holds keys
  * strictly below partition i+1, rank locally, then add per-partition
  * offsets (a prefix sum over ONE tiny count-per-partition row set — pure
  * metadata, like a file listing). Every per-row step stays parallel; the
  * only driver-side data is `numPartitions` longs.
  *
  * Determinism: callers must pass a TOTAL order (include a unique
  * tiebreaker column). Range partitioner sampling only moves partition
  * BOUNDARIES; ranks derive from the actual sorted data, so the result is
  * independent of where the cuts land.
  */
object Ranks {

  /** Adds `rankCol` = 1-based global row_number under `order` (must be a
    * total order) using range partitioning + per-partition offsets. Local
    * ranks are decoded from `monotonically_increasing_id()` over the
    * range-sorted partitions — no Window at all, so exactly ONE wide
    * shuffle (the range partition) runs per call.
    */
  /** Optional `cleanup`: the internal range-shuffled persist is appended so
    * the caller can `unpersist` it once the ranking has been consumed —
    * `persist` pins blocks in the CacheManager until explicitly released
    * (unlike localCheckpoint blocks, which the ContextCleaner reclaims on
    * GC), so a caller that drops the handle would leak MEMORY_AND_DISK
    * blocks per call across a long session.
    */
  def globalRowNumber(
      df: DataFrame,
      order: Seq[Column],
      rankCol: String,
      partitions: Int = 0,
      cleanup: scala.collection.mutable.Buffer[DataFrame] = null): DataFrame = {
    val spark = df.sparkSession
    val n =
      if (partitions > 0) partitions
      else
        // conf values like "auto" must not throw — fall back to the
        // frame's own physical partition count
        scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions").toInt).toOption
          .filter(_ > 0)
          .getOrElse(df.rdd.getNumPartitions.max(1))
    // After repartitionByRange + sortWithinPartitions, each row's
    // monotonically_increasing_id() IS (partitionId << 33) | indexInPartition
    // assigned in iterator (= sorted) order — so the local rank and the
    // partition id both come for free from one narrow projection, with NO
    // Window and therefore no second hash shuffle + re-sort after the range
    // shuffle. Bound: < 2^33 (8.5B) rows per range partition.
    val sorted = df
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
    val pidOf = shiftright(col("__mid"), 33).cast("int")
    val lrankOf = col("__mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L)
    if (n == 1) {
      // single range partition (caller sized it to a small frame): the only
      // offset is 0, so the counts job, the cache, and the offset join all
      // vanish — one shuffle, one consumer, rank = local rank
      sorted.withColumn(rankCol, lrankOf.cast("long")).drop("__mid")
    } else {
      // consumed twice (counts + rank projection): cache the range shuffle
      // so the second consumer doesn't recompute it — and so __mid can't
      // shift. persist (not eager localCheckpoint): the counts action below
      // materializes it, saving one full extra job, and lineage survives
      // executor loss (recompute is deterministic: seeded range sampling
      // over a total order).
      val ranged = sorted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (cleanup != null) cleanup += ranged
      // per-partition counts → prefix offsets (numPartitions longs; metadata)
      val counts = ranged
        .groupBy(pidOf.as("__pid"))
        .count()
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)))
        .sortBy(_._1)
      val offsets: Seq[(Int, Long)] = counts
        .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
        .sliding(2)
        .collect { case Array((_, off), (pid, _)) => (pid, off) }
        .toSeq
      // apply offsets via a broadcast hash join against the tiny (pid, offset)
      // frame — O(1) per row. The old fold of when/otherwise built an
      // O(numPartitions)-deep expression tree: linear per-row cost and a
      // codegen 64KB method-split hazard at high partition counts.
      import spark.implicits._
      val offDf = broadcast(offsets.toDF("__pid", "__off"))
      ranged
        .withColumn("__pid", pidOf)
        .join(offDf, Seq("__pid"), "left")
        .withColumn(rankCol, (lrankOf + coalesce(col("__off"), lit(0L))).cast("long"))
        .drop("__pid", "__mid", "__off")
    }
  }

  /** SQL-standard `ntile(k)` tile for 1-based `rank` out of `total` rows,
    * as pure integer arithmetic: the first `total % k` tiles take
    * `total/k + 1` rows, the rest `total/k` — exactly Spark's and
    * DuckDB's NTILE. Encoded as comparisons against the k−1 precomputed
    * tile boundaries (scalars), so no division runs per row.
    */
  def ntileOfRank(rank: Column, total: Long, k: Int): Column = {
    val q = total / k
    val rem = total % k
    val sizes = (1 to k).map(i => if (i <= rem) q + 1 else q)
    val bounds = sizes.scanLeft(0L)(_ + _).tail.dropRight(1)
    bounds.foldLeft(lit(1L)) { (acc, b) => acc + (rank > b).cast("long") }
  }
}
