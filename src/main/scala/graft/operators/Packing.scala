package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing: assign each document to a fixed-budget
  * training pack, filled in id order within its stratum —
  * `pack_id = floor(tokens_before_this_doc / capacity)`.
  *
  * The cumulative sum is a DISTRIBUTED two-level prefix sum, not one
  * window over the whole stratum (which would put an entire source —
  * possibly most of a 100 TB corpus — on a single reducer): docs are
  * blocked by id range, block totals get a per-stratum running sum (one
  * row per block — tiny), and each doc's global prefix is its block's
  * base plus a within-block cumulative sum whose window partition is
  * bounded by the block size. Addition is associative, so the
  * decomposition is exact and a plain stratum-wide-window oracle matches.
  */
object Packing {

  def tokenBudgetPack(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      tokCol: String,
      capacity: Long,
      blockSize: Long = 64L): DataFrame = {
    require(capacity > 0 && blockSize > 0)
    val wBlocks = Window
      .partitionBy(col(strataCol))
      .orderBy(col("__block"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wInBlock = Window
      .partitionBy(col(strataCol), col("__block"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = df.withColumn("__block", (col(idCol) / blockSize).cast("long"))
    val blockBase = t
      .groupBy(col(strataCol), col("__block"))
      .agg(sum(col(tokCol)).as("__btot"))
      .withColumn("__base", coalesce(sum(col("__btot")).over(wBlocks), lit(0L)))
      .select(col(strataCol), col("__block"), col("__base"))
    t.join(blockBase, Seq(strataCol, "__block"))
      .withColumn("__before", col("__base") + coalesce(sum(col(tokCol)).over(wInBlock), lit(0L)))
      .withColumn("pack_id", floor(col("__before") / capacity.toDouble).cast("long"))
      .drop("__block", "__base", "__before")
  }
}
