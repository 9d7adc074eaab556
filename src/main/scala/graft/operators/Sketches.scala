package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-aggregatable distinct counting with DataSketches HLL.
  *
  * The 100 TB pattern exact distinct cannot express: build a compact
  * sketch per partition bucket ONCE (e.g. per day at ingest), persist the
  * sketches (bytes, not ids), and answer any coarser-grain distinct
  * question later by merging sketches — no rescan of the raw data, no
  * giant distinct shuffle. `countDistinct` over a year of days re-shuffles
  * every id; `hll_union_agg` over 365 sketch rows is driver-trivial.
  */
object Sketches {

  /** One HLL sketch (+ exact count for auditability at test scale) per
    * bucket of `bucketExpr`. At production scale the exact column is
    * dropped — it exists so tests can bound the sketch error.
    */
  def distinctSketchPerBucket(df: DataFrame, bucketExpr: Column, keyCol: String): DataFrame =
    df.groupBy(bucketExpr.as("bucket"))
      .agg(
        hll_sketch_agg(col(keyCol)).as("sketch"),
        countDistinct(col(keyCol)).as("exact_distinct"))

  /** Merge bucket sketches to a single distinct estimate — the roll-up
    * query that never touches raw data.
    */
  def mergedDistinctEstimate(sketches: DataFrame): Long =
    sketches
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
      .head()
      .getLong(0)
}
