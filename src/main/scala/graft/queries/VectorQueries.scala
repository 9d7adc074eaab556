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
    * probe 3 per query. Fully oracle-checked: every cross-engine float
    * divergence point (assignment argmax input, per-element centroid mean,
    * probe ranking) is snapped to 6 decimals on both sides, so the bounded
    * training loop unrolls into deterministic SQL CTEs — approximate
    * search ≠ nondeterministic search.
    */
  def q49(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val centroids = Similarity.ivfTrain(emb, k = 8, iters = 2)
    Similarity
      .ivfTopK(emb.filter(col("vec_id") < 5), emb, centroids, topK = 10, nprobe = 3)
      .orderBy(col("qid"), col("rk"))
  }

  /** The 2 Lloyd iterations of [[q49]] unrolled as SQL CTEs, through the
    * corpus cell assignment (`cells`): seed → (assign → re-center) ×2 →
    * assign. ONE source of truth shared by q49 (which adds probe → score →
    * rank) and q98 (which adds within-cell pair scoring) — the training
    * trajectories can never drift apart between the two oracles. Mirrors
    * [[graft.llm.Similarity.ivfTrain]]/[[graft.llm.Similarity.assignCells]]
    * stage for stage, with the identical r6 snapping.
    */
  /** Same trajectory, parameterized by the TRAINING subset (`et`): q193
    * trains on the pre-append corpus but assigns/searches the union —
    * exactly [[graft.llm.Similarity.ivfAppend]]'s frozen-centroid
    * semantics. `trainWhere` = TRUE reproduces the classic full-corpus
    * form used by q49/q98.
    */
  private def ivfCellsCteOn(trainWhere: String): String = {
    def r6(e: String): String = graft.core.Det.sqlR(e, 6)
    // one Lloyd iteration: sims vs c{t-1} → argmax cell → element-wise mean
    def iter(t: Int): String =
      s"""cn$t AS (SELECT cid, sum(v * v) AS cn FROM c${t - 1} GROUP BY cid),
         |dp$t AS (
         |  SELECT et.vec_id, c.cid, sum(CAST(et.embedding[c.i] AS DOUBLE) * c.v) AS dotp
         |  FROM et, c${t - 1} c GROUP BY et.vec_id, c.cid),
         |sim$t AS (
         |  SELECT d.vec_id, d.cid, ${r6("d.dotp / (sqrt(n.en) * sqrt(cn.cn))")} AS sim
         |  FROM dp$t d JOIN nrm n ON n.vec_id = d.vec_id JOIN cn$t cn ON cn.cid = d.cid),
         |a$t AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
         |    FROM sim$t) s WHERE rn = 1),
         |c$t AS (
         |  SELECT a.cell AS cid, i, ${r6("avg(CAST(e.embedding[i] AS DOUBLE))")} AS v
         |  FROM a$t a JOIN e ON e.vec_id = a.vec_id,
         |       LATERAL (SELECT unnest(range(1, 65)) AS i) t$t
         |  GROUP BY a.cell, i)""".stripMargin
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       |et AS (SELECT vec_id, embedding FROM e WHERE $trainWhere),
       |nrm AS (
       |  SELECT vec_id, sum(CAST(embedding[i] AS DOUBLE) * embedding[i]) AS en
       |  FROM e, LATERAL (SELECT unnest(range(1, 65)) AS i) tn GROUP BY vec_id),
       |seed AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
       |         vec_id AS svid
       |  FROM et ORDER BY vec_id LIMIT 8),
       |c0 AS (
       |  SELECT s.cid, i, CAST(e.embedding[i] AS DOUBLE) AS v
       |  FROM seed s JOIN e ON e.vec_id = s.svid,
       |       LATERAL (SELECT unnest(range(1, 65)) AS i) t0),
       |${iter(1)},
       |${iter(2)},
       |-- search phase against the trained (c2) centroids: sims for ALL
       |-- vectors (the union, not just the training set) serve both the
       |-- corpus assignment and the query probes
       |cn3 AS (SELECT cid, sum(v * v) AS cn FROM c2 GROUP BY cid),
       |dp3 AS (
       |  SELECT e.vec_id, c.cid, sum(CAST(e.embedding[c.i] AS DOUBLE) * c.v) AS dotp
       |  FROM e, c2 c GROUP BY e.vec_id, c.cid),
       |sim3 AS (
       |  SELECT d.vec_id, d.cid, ${r6("d.dotp / (sqrt(n.en) * sqrt(cn.cn))")} AS sim
       |  FROM dp3 d JOIN nrm n ON n.vec_id = d.vec_id JOIN cn3 cn ON cn.cid = d.cid),
       |cells AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
       |    FROM sim3) s WHERE rn = 1)""".stripMargin
  }

  private val ivfCellsCte: String = ivfCellsCteOn("TRUE")

  /** The probe → candidate → score → rank tail shared by q49 and q193 —
    * identical search semantics over whichever cell structure the CTE
    * prefix built.
    */
  private val ivfSearchTail: String =
    s"""probes AS (
       |  SELECT vec_id AS qid, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
       |    FROM sim3 WHERE vec_id < 5) s WHERE rn <= 3),
       |cand AS (
       |  SELECT p.qid, m.vec_id
       |  FROM probes p JOIN cells m ON m.cell = p.cell
       |  WHERE m.vec_id <> p.qid),
       |acc AS (
       |  SELECT c.qid, c.vec_id,
       |    sum(CAST(q.embedding[i] AS DOUBLE) * v.embedding[i]) AS dotp
       |  FROM cand c JOIN e q ON q.vec_id = c.qid JOIN e v ON v.vec_id = c.vec_id,
       |       LATERAL (SELECT unnest(range(1, 65)) AS i) tt
       |  GROUP BY c.qid, c.vec_id),
       |sims AS (
       |  SELECT a.qid, a.vec_id,
       |    ${graft.core.Det.sqlR("a.dotp / (sqrt(nq.en) * sqrt(nv.en))", 4)} AS sim
       |  FROM acc a JOIN nrm nq ON nq.vec_id = a.qid JOIN nrm nv ON nv.vec_id = a.vec_id),
       |rked AS (
       |  SELECT qid, vec_id, sim,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rk
       |  FROM sims)
       |SELECT qid, vec_id, sim, rk FROM rked WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  val q49Sql: String =
    s"""WITH $ivfCellsCte,
       |$ivfSearchTail""".stripMargin

  /** Incremental IVF maintenance, oracle-proved: centroids train on the
    * PRE-APPEND corpus only (vec_id % 5 ≠ 0), the appended slice is
    * encoded against those FROZEN centroids
    * ([[graft.llm.Similarity.ivfAppend]]) and searched together with the
    * old index. The ORACLE trains on the same subset but assigns and
    * searches the UNION directly — so the hash match proves
    * append-then-search ≡ retrain-free search over the union, the
    * property that makes continuous embedding ingest safe without
    * retraining. Drift accounting for the same append lives in
    * [[graft.llm.Similarity.ivfDriftReport]] (law-tested in
    * SimilaritySpec: growth sums to the slice, drift is the mean-sim
    * gap). At 100 TB: appending a day's vectors costs one broadcast
    * assignment pass over the slice; the existing index never recomputes,
    * never shuffles.
    */
  def q193(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val slice = emb.filter(col("vec_id") % 5 === 0)
    val centroids = Similarity.ivfTrain(old, k = 8, iters = 2)
    val appended = Similarity.ivfAppend(Similarity.ivfIndex(old, centroids), slice, centroids)
    Similarity
      .ivfTopKIndexed(emb.filter(col("vec_id") < 5), appended, centroids, topK = 10, nprobe = 3)
      .orderBy(col("qid"), col("rk"))
  }

  val q193Sql: String =
    s"""WITH ${ivfCellsCteOn("vec_id % 5 <> 0")},
       |$ivfSearchTail""".stripMargin

  /** SemDeDup: semantic dedup inside learned embedding clusters. The IVF
    * coarse quantizer (identical training to q49) provides the blocking —
    * within each cell, pairs above cosine 0.35 mark the higher-id member
    * dropped (greedy keep-lowest, deterministic). The cluster assignment
    * IS the shuffle key, so pair scoring is Σ|cell|², never n² — the
    * SemDeDup recipe (Abbas et al., 2023) as a Spark plan.
    */
  def q98(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val centroids = Similarity.ivfTrain(emb, k = 8, iters = 2)
    val cells = Similarity.assignCells(emb, centroids)
    val withCell = emb.join(cells, Seq("vec_id"))
    val dropped = Similarity
      .nearDupPairsBlocked(withCell, "cell", 0.35)
      .select(col("b_id").as("vec_id"))
      .distinct()
      .withColumn("flag", lit(1L))
    cells
      .join(dropped, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        col("cell").cast("long").as("cell"),
        coalesce(col("flag"), lit(0L)).as("dropped"))
      .orderBy(col("vec_id"))
  }

  val q98Sql: String =
    s"""WITH $ivfCellsCte,
       |pr AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM cells ca JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
       |  JOIN e a ON a.vec_id = ca.vec_id JOIN e b ON b.vec_id = cb.vec_id),
       |acc2 AS (
       |  SELECT p.a_id, p.b_id,
       |    sum(CAST(a.embedding[i] AS DOUBLE) * b.embedding[i]) AS dotp
       |  FROM pr p JOIN e a ON a.vec_id = p.a_id JOIN e b ON b.vec_id = p.b_id,
       |       LATERAL (SELECT unnest(range(1, 65)) AS i) ti
       |  GROUP BY p.a_id, p.b_id),
       |sims2 AS (
       |  SELECT a_id, b_id,
       |    ${graft.core.Det.sqlR("acc2.dotp / (sqrt(na.en) * sqrt(nb.en))", 4)} AS sim
       |  FROM acc2 JOIN nrm na ON na.vec_id = a_id JOIN nrm nb ON nb.vec_id = b_id),
       |dropped AS (SELECT DISTINCT b_id FROM sims2 WHERE sim >= 0.35)
       |SELECT c.vec_id, c.cell,
       |  CAST(CASE WHEN d.b_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS dropped
       |FROM cells c LEFT JOIN dropped d ON d.b_id = c.vec_id
       |ORDER BY c.vec_id""".stripMargin

  /** Int8-quantized cosine top-10: the 4×-compressed scale path of q32.
    * Quantization (per-vector scale, floor(x+0.5) snap) and all dot/norm
    * sums are integer-exact on both engines; only the final normalization
    * is float, r4-snapped. Cross-engine determinism is therefore stronger
    * than q32's, despite being "approximate" relative to full precision.
    */
  def q79(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity
      .quantizedCosineTopK(emb.filter(col("vec_id") < 5), emb, 10)
      .orderBy(col("qid"), col("rk"))
  }

  val q79Sql: String =
    """WITH sc AS (
      |  SELECT vec_id,
      |    greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS s
      |  FROM embeddings),
      |qv AS (
      |  SELECT e.vec_id,
      |    list_transform(e.embedding,
      |                   x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / sc.s + 0.5) AS BIGINT)) AS v
      |  FROM embeddings e JOIN sc ON sc.vec_id = e.vec_id),
      |p AS (
      |  SELECT a.vec_id AS qid, b.vec_id, a.v AS qa, b.v AS qb
      |  FROM qv a JOIN qv b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
      |acc AS (
      |  SELECT qid, vec_id,
      |    sum(qa[i] * qb[i]) AS dotp,
      |    sum(qa[i] * qa[i]) AS qn,
      |    sum(qb[i] * qb[i]) AS vn
      |  FROM p, LATERAL (SELECT unnest(range(1, 65)) AS i) t
      |  GROUP BY qid, vec_id),
      |sims AS (
      |  SELECT qid, vec_id,
      |    floor(CAST(dotp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(vn AS DOUBLE))) * 10000 + 0.5) / 10000 AS sim
      |  FROM acc),
      |rked AS (
      |  SELECT qid, vec_id, sim,
      |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS BIGINT) AS rk
      |  FROM sims)
      |SELECT qid, vec_id, sim, rk FROM rked WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

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

  /** Product-quantization ADC top-10: the compression-based ANN path the
    * IVF (q49) and LSH (q34) variants don't cover. 4 subspaces × 16 dims,
    * 16 codes each — the corpus collapses to 4 small codes per vector
    * (64× smaller search-time state), queries carry a broadcast M×K
    * distance table, and ranking is by asymmetric distance. Training is
    * one Lloyd step from first-k seeds with the q49 determinism recipe
    * (r6-snapped assignment distances and re-centered means), so the full
    * trajectory — codebook, codes, distance tables, ranks — replays in
    * DuckDB SQL.
    */
  def q110(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // the codebook (≤ 64 rows) feeds TWO broadcasts (corpus encoding and
    // the query distance tables) — materialize the training subtree once
    val codebook = Similarity
      .pqTrain(emb, mCount = 4, subDim = 16, k = 16)
      .localCheckpoint() // model-sized; cuts the training lineage for both broadcasts
    Similarity
      .pqTopK(emb.filter(col("vec_id") < 5), emb, codebook, mCount = 4, subDim = 16, k = 10)
      .orderBy(col("qid"), col("rk"))
  }

  /** The PQ training + encoding chain (codebook → corpus codes `pqcodes`,
    * all-vector distance tables `d1`) as CTEs, WITHOUT the `e` base (so it
    * composes after [[ivfCellsCte]], which also needs `e`). Shared by q110
    * (pure PQ/ADC) and q129 (IVF-PQ) — one training trajectory, two
    * oracles that can never drift.
    */
  private val pqCtes: String = {
    def r6(e: String): String = graft.core.Det.sqlR(e, 6)
    s"""sd AS (
       |  SELECT vec_id, m, i, CAST(embedding[m * 16 + i] AS DOUBLE) AS x
       |  FROM e, LATERAL (SELECT unnest(range(0, 4)) AS m) tm,
       |       LATERAL (SELECT unnest(range(1, 17)) AS i) ti),
       |pqseed AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, vec_id AS svid
       |  FROM e ORDER BY vec_id LIMIT 16),
       |pqc0 AS (SELECT s.cid, d.m, d.i, d.x AS v FROM pqseed s JOIN sd d ON d.vec_id = s.svid),
       |d0 AS (
       |  SELECT d.vec_id, d.m, c.cid, ${r6("sum((d.x - c.v) * (d.x - c.v))")} AS d2
       |  FROM sd d JOIN pqc0 c ON c.m = d.m AND c.i = d.i
       |  GROUP BY d.vec_id, d.m, c.cid),
       |a0 AS (
       |  SELECT vec_id, m, cid AS code FROM (
       |    SELECT vec_id, m, cid,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
       |    FROM d0) s WHERE rn = 1),
       |pqc1 AS (
       |  SELECT d.m, a.code AS cid, d.i, ${r6("avg(d.x)")} AS v
       |  FROM a0 a JOIN sd d ON d.vec_id = a.vec_id AND d.m = a.m
       |  GROUP BY d.m, a.code, d.i),
       |d1 AS (
       |  SELECT d.vec_id, d.m, c.cid, ${r6("sum((d.x - c.v) * (d.x - c.v))")} AS d2
       |  FROM sd d JOIN pqc1 c ON c.m = d.m AND c.i = d.i
       |  GROUP BY d.vec_id, d.m, c.cid),
       |pqcodes AS (
       |  SELECT vec_id, m, cid AS code FROM (
       |    SELECT vec_id, m, cid,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
       |    FROM d1) s WHERE rn = 1)""".stripMargin
  }

  val q110Sql: String = {
    def r6(e: String): String = graft.core.Det.sqlR(e, 6)
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |$pqCtes,
       |adc AS (
       |  SELECT t.vec_id AS qid, k.vec_id, ${r6("sum(t.d2)")} AS ad
       |  FROM pqcodes k JOIN d1 t ON t.m = k.m AND t.cid = k.code
       |  WHERE t.vec_id < 5 AND k.vec_id <> t.vec_id
       |  GROUP BY qid, k.vec_id),
       |rked AS (
       |  SELECT qid, vec_id, ad,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY ad, vec_id) AS BIGINT) AS rk
       |  FROM adc)
       |SELECT qid, vec_id, ad, rk FROM rked WHERE rk <= 10 ORDER BY qid, rk""".stripMargin
  }

  /** IVF-PQ combined search (q129): coarse cells from q49's training CTEs
    * gate the candidates; PQ/ADC from q110's chain ranks them. Both
    * trainings replay deterministically, so even the two-level ANN stack
    * is hash-checked against the oracle.
    */
  def q129(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val centroids = Similarity.ivfTrain(emb, k = 8, iters = 2)
    val codebook = Similarity
      .pqTrain(emb, mCount = 4, subDim = 16, k = 16)
      .localCheckpoint() // model-sized; cuts the training lineage for both broadcasts
    Similarity
      .ivfPqTopK(
        emb.filter(col("vec_id") < 5),
        emb,
        centroids,
        codebook,
        mCount = 4,
        subDim = 16,
        topK = 10,
        nprobe = 3)
      .orderBy(col("qid"), col("rk"))
  }

  val q129Sql: String = {
    def r6(e: String): String = graft.core.Det.sqlR(e, 6)
    s"""WITH $ivfCellsCte,
       |$pqCtes,
       |probes AS (
       |  SELECT vec_id AS qid, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
       |    FROM sim3 WHERE vec_id < 5) s WHERE rn <= 3),
       |cand AS (
       |  SELECT p.qid, m.vec_id
       |  FROM probes p JOIN cells m ON m.cell = p.cell
       |  WHERE m.vec_id <> p.qid),
       |adc AS (
       |  SELECT c.qid, c.vec_id, ${r6("sum(t.d2)")} AS ad
       |  FROM cand c
       |  JOIN pqcodes k ON k.vec_id = c.vec_id
       |  JOIN d1 t ON t.vec_id = c.qid AND t.m = k.m AND t.cid = k.code
       |  GROUP BY c.qid, c.vec_id),
       |rked AS (
       |  SELECT qid, vec_id, ad,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY ad, vec_id) AS BIGINT) AS rk
       |  FROM adc)
       |SELECT qid, vec_id, ad, rk FROM rked WHERE rk <= 10 ORDER BY qid, rk""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q63_label_centroids" -> (q63 _),
    "q32_cosine_topk" -> (q32 _),
    "q33_embedding_neardup_blocked" -> (q33 _),
    "q34_ann_lsh_topk" -> (q34 _),
    "q49_ivf_topk" -> (q49 _),
    "q98_semdedup" -> (q98 _),
    "q79_int8_cosine_topk" -> (q79 _),
    "q110_pq_adc_topk" -> (q110 _),
    "q129_ivfpq_topk" -> (q129 _),
    "q193_ivf_append" -> (q193 _))

  val oracles: Map[String, String] = Map(
    "q63_label_centroids" -> q63Sql,
    "q32_cosine_topk" -> q32Sql,
    "q33_embedding_neardup_blocked" -> q33Sql,
    "q34_ann_lsh_topk" -> q34Sql,
    "q49_ivf_topk" -> q49Sql,
    "q98_semdedup" -> q98Sql,
    "q79_int8_cosine_topk" -> q79Sql,
    "q110_pq_adc_topk" -> q110Sql,
    "q129_ivfpq_topk" -> q129Sql,
    "q193_ivf_append" -> q193Sql)
}
