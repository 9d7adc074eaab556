package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Det
import graft.functions.Vectors

/** Approximate & exact nearest-neighbor search over embedding columns.
  *
  * Brute force is the correctness baseline (and is already the right
  * answer when the query set is small: broadcast the queries, stream the
  * corpus — no shuffle of the corpus at all). The LSH variant is the scale
  * path for large query sets: both sides bucket by hyperplane signature,
  * the join key is the bucket, and only intra-bucket pairs are scored.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector. `queries` is expected to
    * be small (it is broadcast); the corpus is never shuffled — the join is
    * a broadcast nested loop, the per-partition top-k is a window with
    * rank-limit pushdown.
    *
    * Similarity is rounded (fixed-point) *before* ranking so ranking is
    * stable under FP reassociation; ties break on vec_id.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id"), col("embedding"))
    val scored = c
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("sim", Det.r4(Vectors.cosine(col("qe"), col("embedding"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rk"))
  }

  /** All near-duplicate pairs (cosine ≥ threshold) within coarse blocks.
    * `blockCol` is the inverted-file (IVF-style) cell id: here any coarse
    * assignment works — a clustering label, an LSH bucket
    * ([[graft.functions.Vectors.lshBucket]]), or a category column. Only
    * intra-block pairs are scored, so the shuffle is a hash partition on
    * the block id and cost is Σ|block|² instead of n².
    */
  def nearDupPairsBlocked(emb: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    val a = emb.select(col(blockCol).as("blk"), col("vec_id").as("a_id"), col("embedding").as("ae"))
    val b = emb.select(col(blockCol).as("blk"), col("vec_id").as("b_id"), col("embedding").as("be"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", Det.r4(Vectors.cosine(col("ae"), col("be"))))
      .filter(col("sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
  }

  /** ANN top-k via random-hyperplane LSH: corpus and queries bucketed by
    * signature; candidates are same-bucket pairs; rank within candidates.
    * Recall is tunable by `planes` (fewer planes → bigger buckets → higher
    * recall, more compute). Multi-probe (flipping one bit) would raise
    * recall at equal bucket size — left for a later round.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, planes: Int, dims: Int): DataFrame = {
    val q = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("bucket", Vectors.lshBucket(col("qe"), planes, dims))
    val c = corpus
      .select(col("vec_id"), col("embedding"))
      .withColumn("bucket", Vectors.lshBucket(col("embedding"), planes, dims))
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", Det.r4(Vectors.cosine(col("qe"), col("embedding"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rk"))
  }
}
