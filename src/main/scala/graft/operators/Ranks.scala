package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * total order) using range partitioning + per-partition offsets. The
    * local rank window is partitioned by `spark_partition_id()` — never a
    * global Window.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], rankCol: String, partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      // consumed twice (counts + local ranks): pin the range shuffle so the
      // second consumer doesn't recompute it — and so __pid can't shift
      .localCheckpoint()
    // local ranks: Window partitioned by the physical partition id — each
    // group is one range partition, sorted; no global sort anywhere
    val local = ranged.withColumn(
      "__lrank",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(order: _*)))
    // per-partition counts → prefix offsets (numPartitions longs; metadata)
    val counts = ranged
      .groupBy(col("__pid"))
      .count()
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = counts
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
      .sliding(2)
      .collect { case Array((_, off), (pid, _)) => (pid, off) }
      .toMap
    val offCol = offsets.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(acc)
    }
    local
      .withColumn(rankCol, (col("__lrank") + offCol).cast("long"))
      .drop("__pid", "__lrank")
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
