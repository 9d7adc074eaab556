package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.Similarity

/** Embedding similarity-search registry over `embeddings`
  * (ArrayType(FloatType), 64 dims).
  *
  * The oracle computes dot/norm sums in double via unnest — both engines
  * accumulate 64 exact float-products; fixed-point rounding at 4 digits
  * absorbs any reassociation delta (≪ 1e-10) before ranking, so ranks are
  * identical too.
  */
object VectorQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Brute-force cosine top-10 for query vectors vec_id < 5 (broadcast
    * queries; corpus never shuffles).
    */
  def q32(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity
      .cosineTopK(emb.filter(col("vec_id") < 5), emb, 10)
      .orderBy(col("qid"), col("rk"))
  }

  val q32Sql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      |p AS (SELECT q.qid, e.vec_id, q.qe, e.embedding AS ve
      |      FROM q, embeddings e WHERE e.vec_id <> q.qid),
      |acc AS (
      |  SELECT qid, vec_id,
      |    sum(CAST(qe[i] AS DOUBLE) * ve[i]) AS dotp,
      |    sum(CAST(qe[i] AS DOUBLE) * qe[i]) AS qn,
      |    sum(CAST(ve[i] AS DOUBLE) * ve[i]) AS vn
      |  FROM p, LATERAL (SELECT unnest(range(1, 65)) AS i) t
      |  GROUP BY qid, vec_id),
      |sims AS (
      |  SELECT qid, vec_id, floor(dotp / (sqrt(qn) * sqrt(vn)) * 10000 + 0.5) / 10000 AS sim
      |  FROM acc),
      |rked AS (
      |  SELECT qid, vec_id, sim,
      |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rk
      |  FROM sims)
      |SELECT qid, vec_id, sim, rk FROM rked WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  /** Near-duplicate pairs within coarse blocks (IVF-style cells — here the
    * `label` column; at scale a kmeans/LSH assignment). Cost Σ|cell|², not n².
    */
  def q33(s: SparkSession, d: String): DataFrame =
    Similarity
      .nearDupPairsBlocked(Tables.embeddings(s, d), "label", 0.35)
      .orderBy(col("a_id"), col("b_id"))

  val q33Sql: String =
    """WITH p AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.embedding AS ae, b.embedding AS be
      |  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id),
      |acc AS (
      |  SELECT a_id, b_id,
      |    sum(CAST(ae[i] AS DOUBLE) * be[i]) AS dotp,
      |    sum(CAST(ae[i] AS DOUBLE) * ae[i]) AS an,
      |    sum(CAST(be[i] AS DOUBLE) * be[i]) AS bn
      |  FROM p, LATERAL (SELECT unnest(range(1, 65)) AS i) t
      |  GROUP BY a_id, b_id),
      |sims AS (
      |  SELECT a_id, b_id, floor(dotp / (sqrt(an) * sqrt(bn)) * 10000 + 0.5) / 10000 AS sim
      |  FROM acc)
      |SELECT a_id, b_id, sim FROM sims WHERE sim >= 0.35 ORDER BY a_id, b_id""".stripMargin

  /** ANN top-k via random-hyperplane LSH buckets. Oracle-checked: the
    * hyperplane weights are a deterministic integer mix of (plane, dim)
    * (see [[graft.functions.Vectors.lshBucketComposed]]), so DuckDB can
    * recompute the exact buckets in SQL — approximate ≠ nondeterministic.
    * (Projection signs are FP-robust: |proj| is O(10³) while cross-engine
    * summation-order noise is O(10⁻¹²).)
    */
  def q34(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity
      .lshTopK(emb.filter(col("vec_id") < 5), emb, 10, planes = 4, dims = 64)
      .orderBy(col("qid"), col("rk"))
  }

  val q34Sql: String =
    """WITH proj AS (
      |  SELECT vec_id, p,
      |    sum(CAST(embedding[i+1] AS DOUBLE) * (((1103515245*(p*64+i)+12345) % 65536) - 32768)) AS proj
      |  FROM embeddings,
      |    LATERAL (SELECT unnest(range(0, 4)) AS p) pp,
      |    LATERAL (SELECT unnest(range(0, 64)) AS i) ii
      |  GROUP BY vec_id, p),
      |buck AS (
      |  SELECT vec_id, CAST(sum(CASE WHEN proj > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM proj GROUP BY vec_id),
      |q AS (SELECT e.vec_id AS qid, e.embedding AS qe, b.bucket
      |      FROM embeddings e JOIN buck b USING (vec_id) WHERE e.vec_id < 5),
      |c AS (SELECT e.vec_id, e.embedding AS ve, b.bucket
      |      FROM embeddings e JOIN buck b USING (vec_id)),
      |p2 AS (SELECT q.qid, c.vec_id, q.qe, c.ve
      |       FROM q JOIN c ON q.bucket = c.bucket AND c.vec_id <> q.qid),
      |acc AS (
      |  SELECT qid, vec_id,
      |    sum(CAST(qe[i] AS DOUBLE) * ve[i]) AS dotp,
      |    sum(CAST(qe[i] AS DOUBLE) * qe[i]) AS qn,
      |    sum(CAST(ve[i] AS DOUBLE) * ve[i]) AS vn
      |  FROM p2, LATERAL (SELECT unnest(range(1, 65)) AS i) t
      |  GROUP BY qid, vec_id),
      |sims AS (
      |  SELECT qid, vec_id, floor(dotp / (sqrt(qn) * sqrt(vn)) * 10000 + 0.5) / 10000 AS sim
      |  FROM acc),
      |rked AS (
      |  SELECT qid, vec_id, sim,
      |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rk
      |  FROM sims)
      |SELECT qid, vec_id, sim, rk FROM rked WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  /** IVF search end-to-end: train 8 coarse cells (2 Lloyd iterations),
    * probe 3 per query. Approximate — validated against brute-force recall
    * in ScalaTest; rows-only for the driver.
    */
  def q49(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val centroids = Similarity.ivfTrain(emb, k = 8, iters = 2)
    Similarity
      .ivfTopK(emb.filter(col("vec_id") < 5), emb, centroids, topK = 10, nprobe = 3)
      .orderBy(col("qid"), col("rk"))
  }

  /** Per-label embedding centroid, element-wise, via posexplode →
    * (label, pos) average — the same 100 TB shape as IVF's centroid
    * update: two bounded shuffles, never a whole-vector collect. Output
    * is one row per (label, pos) so the oracle compares scalars.
    */
  def q63(s: SparkSession, d: String): DataFrame =
    Tables
      .embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(graft.core.Det.r6(avg(col("v").cast("double"))).as("c"), count(lit(1)).as("n_vecs"))
      .withColumn("pos", col("pos").cast("long"))
      .orderBy(col("label"), col("pos"))

  val q63Sql: String =
    s"""SELECT label, CAST(i - 1 AS BIGINT) AS pos,
       |  ${graft.core.Det.sqlR("avg(CAST(embedding[i] AS DOUBLE))", 6)} AS c,
       |  count(*) AS n_vecs
       |FROM embeddings, LATERAL (SELECT unnest(range(1, 65)) AS i) t
       |GROUP BY label, pos ORDER BY label, pos""".stripMargin

  val queries: Map[String, Q] = Map(
    "q63_label_centroids" -> (q63 _),
    "q32_cosine_topk" -> (q32 _),
    "q33_embedding_neardup_blocked" -> (q33 _),
    "q34_ann_lsh_topk" -> (q34 _),
    "q49_ivf_topk" -> (q49 _))

  val oracles: Map[String, String] = Map(
    "q63_label_centroids" -> q63Sql,
    "q32_cosine_topk" -> q32Sql,
    "q33_embedding_neardup_blocked" -> q33Sql,
    "q34_ann_lsh_topk" -> q34Sql)
}
