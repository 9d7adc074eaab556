package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}
import graft.functions.{Layout, Text}
import graft.llm.Similarity
import graft.operators.TimeSeriesOps

/** Round-5 operator additions: forward as-of, interval algebra, ColBERT
  * maxsim retrieval, count-min sketch, Hilbert layout keys, Zipf fits,
  * session motif mining, equi-depth histograms. Same contract as every
  * other registry module — each query has a DuckDB oracle twin and a
  * 100 TB shuffle story in its Scaladoc.
  */
object Advanced {
  private type Q = (SparkSession, String) => DataFrame
  private val sqlToks = Text.sqlToks

  // -- q133: forward as-of join ----------------------------------------

  /** Forward as-of: each error event picks up the value of the user's
    * NEXT purchase at-or-after its timestamp — the other half of the
    * as-of pair (backward = q18); interpolation and time-to-event
    * features need both directions. Same scale shape as q18: one hash
    * shuffle on user_id, a per-key sort, zero range explosion.
    */
  def q133(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase").select("user_id", "ts", "event_id", "value")
    TimeSeriesOps
      .asOfJoinForward(errors, purchases, "user_id", "ts", "ts", "event_id", Map("value" -> "pv"))
      .select(col("event_id"), col("user_id"), col("ts"), coalesce(col("pv"), lit(-1.0)).as("next_purchase_value"))
      .orderBy(col("event_id"))
  }

  val q133Sql: String =
    """SELECT e.event_id, e.user_id, e.ts,
      |  coalesce((SELECT p.value FROM events p
      |            WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts >= e.ts
      |            ORDER BY p.ts ASC, p.event_id ASC LIMIT 1), -1.0) AS next_purchase_value
      |FROM events e WHERE e.event_type = 'error' ORDER BY e.event_id""".stripMargin

  // -- q134: interval union (coverage) ---------------------------------

  /** Interval algebra: each event opens a 10-minute activity interval;
    * per user, merge overlaps (sweep: island starts where start exceeds
    * the running max of prior ends) and report interval count + covered
    * time. All arithmetic is integer microseconds — exact on both
    * engines. One shuffle on user_id; the sweep is two windows inside
    * that partitioning, state O(1) per row.
    */
  def q134(s: SparkSession, d: String): DataFrame = {
    val iv = Tables
      .events(s, d)
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("s0"),
        (unix_micros(col("ts")) + lit(600000000L)).as("e0"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("s0"), col("e0"))
    val marked = iv
      .withColumn("pmax", max(col("e0")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk", when(col("pmax").isNull || col("s0") > col("pmax"), 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s0")).as("is0"), max(col("e0")).as("ie0"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"), sum(col("ie0") - col("is0")).as("covered_us"))
      .orderBy(col("user_id"))
  }

  val q134Sql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) AS s0, epoch_us(ts) + 600000000 AS e0 FROM events),
      |m AS (
      |  SELECT user_id, s0, e0,
      |    max(e0) OVER (PARTITION BY user_id ORDER BY s0, e0
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM iv),
      |b AS (SELECT user_id, s0, e0, CASE WHEN pmax IS NULL OR s0 > pmax THEN 1 ELSE 0 END AS brk FROM m),
      |g AS (
      |  SELECT user_id, s0, e0,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY s0, e0
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM b),
      |i AS (SELECT user_id, island, min(s0) AS is0, max(e0) AS ie0 FROM g GROUP BY user_id, island)
      |SELECT user_id, count(*) AS n_intervals, CAST(sum(ie0 - is0) AS BIGINT) AS covered_us
      |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin

  // -- q135: ColBERT-style maxsim late-interaction retrieval ------------

  /** Multi-vector (late-interaction) retrieval: each vector's 4 subspace
    * slices act as its token vectors; score(q, d) = Σ over query slices
    * of the max cosine against any doc slice (the ColBERT MaxSim law).
    * Per-slice sims are snapped to integer 1e-4 units BEFORE the
    * max/sum, so ranking is exact-integer on both engines. Scale shape:
    * the 20 query slices broadcast; the corpus's 4n slices never
    * shuffle; max and sum are map-side-combined hash aggs.
    */
  def q135(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val sv = Similarity.subvectors(emb, 4, 16)
    val qsv = Similarity
      .subvectors(emb.filter(col("vec_id") < 5), 4, 16)
      .select(col("vec_id").as("qid"), col("m").as("qm"), col("sv").as("qv"))
    val scored = sv
      .join(broadcast(qsv), col("vec_id") =!= col("qid"))
      .withColumn(
        "sim_i",
        floor(graft.functions.Vectors.cosine(col("qv"), col("sv")) * 10000 + 0.5).cast("long"))
      .groupBy(col("qid"), col("vec_id"), col("qm"))
      .agg(max(col("sim_i")).as("best_i"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("best_i")).as("score_i"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score_i").desc, col("vec_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
      .select(col("qid"), col("vec_id"), (col("score_i").cast("double") / 10000.0).as("maxsim"), col("rk"))
      .orderBy(col("qid"), col("rk"))
  }

  val q135Sql: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |sd AS (
      |  SELECT vec_id, m, i, CAST(embedding[CAST(m * 16 + i AS INT)] AS DOUBLE) AS x
      |  FROM e, LATERAL (SELECT unnest(range(0, 4)) AS m) tm,
      |       LATERAL (SELECT unnest(range(1, 17)) AS i) ti),
      |acc AS (
      |  SELECT q.vec_id AS qid, q.m AS qm, c.vec_id, c.m AS dm,
      |    sum(q.x * c.x) AS dotp, sum(q.x * q.x) AS qn, sum(c.x * c.x) AS vn
      |  FROM sd q JOIN sd c ON c.i = q.i AND c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 5
      |  GROUP BY qid, qm, c.vec_id, dm),
      |sims AS (
      |  SELECT qid, vec_id, qm,
      |    CAST(floor(dotp / (sqrt(qn) * sqrt(vn)) * 10000 + 0.5) AS BIGINT) AS sim_i
      |  FROM acc),
      |best AS (SELECT qid, vec_id, qm, max(sim_i) AS best_i FROM sims GROUP BY qid, vec_id, qm),
      |sc AS (SELECT qid, vec_id, CAST(sum(best_i) AS BIGINT) AS score_i FROM best GROUP BY qid, vec_id),
      |rked AS (
      |  SELECT qid, vec_id, score_i,
      |    CAST(row_number() OVER (PARTITION BY qid ORDER BY score_i DESC, vec_id) AS BIGINT) AS rk
      |  FROM sc)
      |SELECT qid, vec_id, CAST(score_i AS DOUBLE) / 10000.0 AS maxsim, rk
      |FROM rked WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  // -- q136: count-min sketch heavy hitters -----------------------------

  /** Count-min sketch term frequencies (depth 4 × width 512, portable
    * md5-derived row hashes) with the exact count alongside: the top-20
    * readout demonstrates the overestimate law (cms_est ≥ exact_n,
    * asserted in tests) while staying hash-checkable — every count is an
    * integer. Scale shape: the sketch IS the groupBy(j, bucket) — 2048
    * cells regardless of corpus size; vocabulary → cell is a map-side
    * projection. The estimate join is against those 2048 broadcast-sized
    * cells.
    */
  def q136(s: SparkSession, d: String): DataFrame = {
    val depth = 4
    val width = 512
    val tf = Tables
      .documents(s, d)
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
    val rows = tf
      .select(
        col("tok"),
        col("n"),
        explode(array((0 until depth).map(j =>
          struct(
            lit(j.toLong).as("j"),
            pmod(Text.hash60(concat(lit(j.toString), lit(":"), col("tok"))), lit(width.toLong)).as("b"))): _*))
          .as("p"))
      .select(col("tok"), col("n"), col("p.j").as("j"), col("p.b").as("b"))
    val cms = rows.groupBy(col("j"), col("b")).agg(sum(col("n")).as("cnt"))
    val est = rows
      .join(broadcast(cms), Seq("j", "b"))
      .groupBy(col("tok"))
      .agg(min(col("cnt")).as("cms_est"), max(col("n")).as("exact_n"))
    // top-20 BEFORE ranking: plans as TakeOrderedAndProject (per-partition
    // heads + merge), so no single-partition window ever sees the full
    // vocabulary; row_number then ranks just the 20 survivors (q69 shape)
    est
      .orderBy(col("cms_est").desc, col("tok"))
      .limit(20)
      .withColumn(
        "rk",
        row_number().over(Window.orderBy(col("cms_est").desc, col("tok"))).cast("long"))
      .select(col("tok"), col("cms_est"), col("exact_n"), col("rk"))
      .orderBy(col("rk"))
  }

  val q136Sql: String =
    s"""WITH tf AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest($sqlToks) AS tok FROM documents) u GROUP BY tok),
       |rows_ AS (
       |  SELECT tok, n, j, ${Text.sqlHash60("CAST(j AS VARCHAR) || ':' || tok")} % 512 AS b
       |  FROM tf, LATERAL (SELECT unnest(range(0, 4)) AS j) t),
       |cms AS (SELECT j, b, CAST(sum(n) AS BIGINT) AS cnt FROM rows_ GROUP BY j, b),
       |est AS (
       |  SELECT r.tok, min(c.cnt) AS cms_est, max(r.n) AS exact_n
       |  FROM rows_ r JOIN cms c ON c.j = r.j AND c.b = r.b GROUP BY r.tok),
       |rked AS (
       |  SELECT tok, cms_est, exact_n,
       |    CAST(row_number() OVER (ORDER BY cms_est DESC, tok) AS BIGINT) AS rk
       |  FROM est)
       |SELECT tok, cms_est, exact_n, rk FROM rked WHERE rk <= 20 ORDER BY rk""".stripMargin

  // -- q137: Hilbert-curve layout key -----------------------------------

  /** Hilbert space-filling-curve key over (customer, order-day) — the
    * locality-tighter sibling of q93's Z-order key (no Z-jumps across
    * the midline, so range-partitioning by the key yields tighter
    * min/max file-statistic boxes for 2-D box predicates). Pure unrolled
    * bit arithmetic ([[graft.functions.Layout.hilbert2]]), no UDF; the
    * oracle replays the identical curve from the driver-generated xy→d
    * table.
    */
  def q137(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        (col("o_custkey") % 16).as("hx"),
        (datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01"))).cast("long") % 16).as("hy"))
      .withColumn("hkey", Layout.hilbert2(col("hx"), col("hy"), 4))
      .orderBy(col("o_orderkey"))

  val q137Sql: String = {
    val table = Layout.hilbertTable(4).mkString(", ")
    s"""SELECT o_orderkey, hx, hy,
       |  CAST(([$table])[CAST(hx * 16 + hy + 1 AS INT)] AS BIGINT) AS hkey
       |FROM (
       |  SELECT o_orderkey, o_custkey % 16 AS hx,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 16 AS hy
       |  FROM orders) t
       |ORDER BY o_orderkey""".stripMargin
  }

  // -- q138: Zipf rank-frequency fit per source -------------------------

  /** Zipf's-law fit per source: regress ln(freq) on ln(rank) over the
    * source's token vocabulary; the slope is the Zipf exponent (≈ −1 for
    * natural text — a corpus-health diagnostic: synthetic/boilerplate
    * text bends it). Per-term logs are snapped to integer micro-units
    * before the moment sums (the q116 discipline: DECIMAL(38,0)/HUGEINT
    * integer sums are aggregation-order-proof), so the fit hash-matches
    * cross-engine. Two shuffles: (source, tok) count, then the per-source
    * moment agg; the rank window rides the second shuffle's partitioning.
    */
  def q138(s: SparkSession, d: String): DataFrame = {
    val tf = Tables
      .documents(s, d)
      .select(col("source"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("source")).orderBy(col("n").desc, col("tok"))
    val xy = tf
      .withColumn("rnk", row_number().over(w))
      .select(
        col("source"),
        floor(log(col("rnk").cast("double")) * 1e6 + 0.5).cast("long").as("xl"),
        floor(log(col("n").cast("double")) * 1e6 + 0.5).cast("long").as("yl"))
    val d38 = "decimal(38,0)"
    val agg = xy
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_terms"),
        sum(col("xl").cast(d38)).as("sx"),
        sum(col("yl").cast(d38)).as("sy"),
        sum((col("xl") * col("xl")).cast(d38)).as("sxx"),
        sum((col("yl") * col("yl")).cast(d38)).as("syy"),
        sum((col("xl") * col("yl")).cast(d38)).as("sxy"))
    val n = col("n_terms").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    agg
      .select(
        col("source"),
        col("n_terms"),
        Det.r6(num / den).as("zipf_slope"),
        Det.r6((num * num) / (den * (n * syy - sy * sy))).as("r2"))
      .orderBy(col("source"))
  }

  val q138Sql: String =
    s"""WITH tf AS (
       |  SELECT source, tok, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT source, unnest($sqlToks) AS tok FROM documents) u GROUP BY source, tok),
       |rk AS (
       |  SELECT source, n, row_number() OVER (PARTITION BY source ORDER BY n DESC, tok) AS rnk FROM tf),
       |xy AS (
       |  SELECT source,
       |    CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS xl,
       |    CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS yl
       |  FROM rk),
       |agg AS (
       |  SELECT source, count(*) AS n_terms,
       |    CAST(sum(xl) AS DOUBLE) AS sx, CAST(sum(yl) AS DOUBLE) AS sy,
       |    CAST(sum(xl * xl) AS DOUBLE) AS sxx, CAST(sum(yl * yl) AS DOUBLE) AS syy,
       |    CAST(sum(xl * yl) AS DOUBLE) AS sxy
       |  FROM xy GROUP BY source)
       |SELECT source, n_terms,
       |  ${Det.sqlR("(n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx)", 6)} AS zipf_slope,
       |  ${Det.sqlR("((n_terms * sxy - sx * sy) * (n_terms * sxy - sx * sy)) / ((n_terms * sxx - sx * sx) * (n_terms * syy - sy * sy))", 6)} AS r2
       |FROM agg ORDER BY source""".stripMargin

  // -- q139: session motif mining ---------------------------------------

  /** Behavioral motif counts: sessionize (30-min gaps), render each
    * session as its event-initial string (the five event types have
    * distinct initials), and count view→click and view→click→purchase
    * motifs by non-overlapping substring occurrence — MATCH_RECOGNIZE-
    * style sequence analytics without a dedicated operator. The session
    * string is bounded by the watermark/gap construction; counting is
    * length arithmetic, exact on both engines. One shuffle on user_id.
    */
  def q139(s: SparkSession, d: String): DataFrame = {
    val sess = TimeSeriesOps
      .sessionize(Tables.events(s, d), "user_id", "ts", "event_id", 30)
      .withColumn("ini", substring(col("event_type"), 1, 1))
    val strs = sess
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(ts, event_id, ini))), p -> p.ini), '')")
          .as("seq"))
    strs
      .select(
        col("user_id"),
        expr("(length(seq) - length(replace(seq, 'vc', ''))) div 2").as("vc"),
        expr("(length(seq) - length(replace(seq, 'vcp', ''))) div 3").as("vcp"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("vc")).as("n_view_click"),
        sum(col("vcp")).as("n_view_click_purchase"))
      .orderBy(col("user_id"))
  }

  val q139Sql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS ini,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |f AS (
      |  SELECT user_id, ts, event_id, ini,
      |    CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END AS brk
      |  FROM e),
      |g AS (
      |  SELECT user_id, ts, event_id, ini,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM f),
      |strs AS (
      |  SELECT user_id, session_id, string_agg(ini, '' ORDER BY ts, event_id) AS seq
      |  FROM g GROUP BY user_id, session_id),
      |cnt AS (
      |  SELECT user_id,
      |    (length(seq) - length(replace(seq, 'vc', ''))) // 2 AS vc,
      |    (length(seq) - length(replace(seq, 'vcp', ''))) // 3 AS vcp
      |  FROM strs)
      |SELECT user_id, count(*) AS n_sessions,
      |  CAST(sum(vc) AS BIGINT) AS n_view_click,
      |  CAST(sum(vcp) AS BIGINT) AS n_view_click_purchase
      |FROM cnt GROUP BY user_id ORDER BY user_id""".stripMargin

  // -- q140: equi-depth histogram ---------------------------------------

  /** Equi-depth (equal-count) histogram of value per event type via
    * ntile over a total order — the quantile-bucketed complement of
    * q108's equi-width bins (optimizer statistics and drift monitors
    * want both). Exact form: one sort per type partition; the 100 TB
    * variant seeds bucket BOUNDARIES from a sampled quantile sketch
    * (q71) and bucket-assigns map-side — the readout schema is the same.
    */
  def q140(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    Tables
      .events(s, d)
      .withColumn("bucket", ntile(10).over(w).cast("long"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"), Det.r6(min(col("value"))).as("lo"), Det.r6(max(col("value"))).as("hi"))
      .orderBy(col("event_type"), col("bucket"))
  }

  val q140Sql: String =
    s"""WITH t AS (
       |  SELECT event_type, value,
       |    ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS bucket
       |  FROM events)
       |SELECT event_type, CAST(bucket AS BIGINT) AS bucket, count(*) AS n,
       |  ${Det.sqlR("min(value)", 6)} AS lo, ${Det.sqlR("max(value)", 6)} AS hi
       |FROM t GROUP BY event_type, bucket ORDER BY event_type, bucket""".stripMargin

  // -- q141: interpolated as-of (both directions) -----------------------

  /** Linear interpolation between the previous and next purchase at each
    * error event — the backward (q18) and forward (q133) as-of joins
    * COMPOSED: the forward pass runs on the backward pass's output (the
    * union-window operator preserves left-side columns, so chaining is
    * free) and the interpolation weight is integer-microsecond exact.
    * Still one shuffle shape per direction on user_id. Boundary law:
    * before the first purchase → next value; after the last → previous;
    * no purchases → -1.
    */
  def q141(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase").select("user_id", "ts", "event_id", "value")
    val back = TimeSeriesOps
      .asOfJoin(errors, purchases, "user_id", "ts", "ts", "event_id", Map("value" -> "pv", "ts" -> "pt"))
    val both = TimeSeriesOps
      .asOfJoinForward(back, purchases, "user_id", "ts", "ts", "event_id", Map("value" -> "nv", "ts" -> "nt"))
    val w = (unix_micros(col("ts")) - unix_micros(col("pt"))).cast("double") /
      (unix_micros(col("nt")) - unix_micros(col("pt"))).cast("double")
    both
      .select(
        col("event_id"),
        col("user_id"),
        col("ts"),
        coalesce(
          Det.r6(
            when(col("pt").isNull && col("nt").isNull, lit(null))
              .when(col("pt").isNull, col("nv"))
              .when(col("nt").isNull, col("pv"))
              .when(unix_micros(col("nt")) === unix_micros(col("pt")), col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) * w)),
          lit(-1.0)).as("interp_value"))
      .orderBy(col("event_id"))
  }

  val q141Sql: String = {
    val interp =
      """CASE WHEN pt IS NULL AND nt IS NULL THEN NULL
        |       WHEN pt IS NULL THEN nv
        |       WHEN nt IS NULL THEN pv
        |       WHEN epoch_us(nt) = epoch_us(pt) THEN pv
        |       ELSE pv + (nv - pv) * (CAST(epoch_us(ts) - epoch_us(pt) AS DOUBLE) / (epoch_us(nt) - epoch_us(pt)))
        |  END""".stripMargin
    s"""WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
       |b AS (
       |  SELECT e.event_id, e.user_id, e.ts,
       |    (SELECT p.value FROM events p WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
       |       AND p.ts <= e.ts ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS pv,
       |    (SELECT p.ts FROM events p WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
       |       AND p.ts <= e.ts ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS pt,
       |    (SELECT p.value FROM events p WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
       |       AND p.ts >= e.ts ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS nv,
       |    (SELECT p.ts FROM events p WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
       |       AND p.ts >= e.ts ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS nt
       |  FROM e)
       |SELECT event_id, user_id, ts,
       |  coalesce(${Det.sqlR(interp, 6)}, -1.0) AS interp_value
       |FROM b ORDER BY event_id""".stripMargin
  }

  // -- q142: triangle counting on the near-dup graph --------------------

  /** Triangle counting over the simhash near-dup graph (same-lang pairs
    * at Hamming ≤ 1): the DEGREE-ORDERED oriented-edge-join algorithm —
    * orient every edge from its (degree, id)-smaller endpoint, build
    * wedges only from out-neighbors, close with the (consistently
    * oriented) third edge. Orientation bounds wedge volume by O(m^1.5)
    * instead of Σ deg² — the difference between tractable and not on a
    * power-law graph (measured here: the naive Σ deg² form at a looser
    * threshold took 59 s at sf0.1; this shape is ~2 s). Triangle density
    * distinguishes boilerplate families (dense cliques) from chance
    * collisions (isolated edges) — a dedup-QA readout connected
    * components can't give. Each triangle is enumerated exactly once:
    * its (deg, id)-minimum vertex is the unique wedge apex.
    */
  def q142(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val sig = graft.llm.Dedup
      .simhash(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = sig.select(col("lang"), col("doc_id").as("a_id"), col("simhash").as("sa"))
    val b = sig.select(col("lang"), col("doc_id").as("b_id"), col("simhash").as("sb"))
    // the edge list feeds degree counting + three join consumers —
    // checkpoint it (id pairs only)
    val edges = a
      .join(b, Seq("lang"))
      .filter(col("a_id") < col("b_id"))
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 1)
      .select(col("a_id").as("a"), col("b_id").as("b"))
      .localCheckpoint()
    val deg = edges
      .select(col("a").as("id"))
      .unionByName(edges.select(col("b").as("id")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("dg"))
    val oriented = edges
      .join(deg.select(col("id").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("dg").as("db")), Seq("b"))
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .localCheckpoint()
    val wedges = oriented
      .join(
        oriented.select(col("u"), col("v").as("w"), col("dv").as("dw")),
        Seq("u"))
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
    val tri = wedges.join(oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
    tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("doc_id"))
  }

  val q142Sql: String =
    s"""WITH ${TextQueries.sqlSimhashSig},
       |sigl AS (
       |  SELECT sig.doc_id, sig.simhash, d.lang
       |  FROM sig JOIN documents d ON d.doc_id = sig.doc_id),
       |e AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b
       |  FROM sigl a JOIN sigl b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 1),
       |tri AS (
       |  SELECT e1.a, e1.b, e2.b AS c
       |  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       |x AS (SELECT unnest([a, b, c]) AS doc_id FROM tri)
       |SELECT doc_id, count(*) AS n_triangles FROM x GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -- q143: incremental materialized-view maintenance -------------------

  /** Incremental aggregate maintenance: the daily per-type rollup is kept
    * as a merge of PARTIAL aggregates — a base segment (days ≤ 20) and a
    * delta segment (days > 20) aggregated independently, then merged by
    * summing the commutative-monoid state (count, integer milli-unit
    * value sum). The oracle aggregates the WHOLE table flat — passing
    * hash-check proves merge(partial(base), partial(delta)) ≡
    * recompute(all), the law every incremental pipeline (stream
    * compaction, backfill, late-data upsert) rests on. Integer state
    * makes the proof exact, not approximate.
    */
  def q143(s: SparkSession, d: String): DataFrame = {
    val ev = Tables
      .events(s, d)
      .select(
        col("event_type"),
        to_date(col("ts")).as("day"),
        expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), sum(col("vm")).as("sv"))
    val base = partial(ev.filter(dayofmonth(col("day")) <= 20))
    val delta = partial(ev.filter(dayofmonth(col("day")) > 20))
    base
      .unionByName(delta)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n")).as("n_events"), sum(col("sv")).as("sv_milli"))
      .orderBy(col("event_type"), col("day"))
  }

  val q143Sql: String =
    """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sv_milli
      |FROM events GROUP BY event_type, day ORDER BY event_type, day""".stripMargin

  // -- q144: sliding 7-day distinct users --------------------------------

  /** Trailing-7-day distinct active users per day — the windowed
    * COUNT(DISTINCT) no engine can compute incrementally from daily
    * counts (distinct doesn't compose). The scalable shape: collapse to
    * distinct (day, user) pairs first, replicate each pair into the ≤ 7
    * window-ends it serves (bounded ×7 amplification — this replaces an
    * unbounded range self-join), and distinct-count per window end. Two
    * hash shuffles total, both on bounded keys.
    */
  def q144(s: SparkSession, d: String): DataFrame = {
    val du = Tables
      .events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val maxDay = du.agg(max(col("day")).as("max_day"))
    du.select(col("day"), col("user_id"), explode(sequence(lit(0), lit(6))).as("k"))
      .select(date_add(col("day"), col("k")).as("wend"), col("user_id"))
      .crossJoin(broadcast(maxDay))
      .filter(col("wend") <= col("max_day"))
      .groupBy(col("wend"))
      .agg(countDistinct(col("user_id")).as("users_7d"))
      .orderBy(col("wend"))
  }

  val q144Sql: String =
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |w AS (
      |  SELECT day + CAST(k AS INT) AS wend, user_id
      |  FROM du, LATERAL (SELECT unnest(range(0, 7)) AS k) t),
      |mx AS (SELECT max(day) AS max_day FROM du)
      |SELECT wend, count(DISTINCT user_id) AS users_7d
      |FROM w, mx WHERE wend <= max_day
      |GROUP BY wend ORDER BY wend""".stripMargin

  // -- q145: sliding-window HLL (sketch MERGE) ---------------------------

  /** Trailing-7-day distinct users per day estimated by MERGING daily
    * HyperLogLog registers (q48's portable register math over user_id) —
    * the property that makes sketches matter at 100 TB: yesterday's
    * registers never get recomputed, a window is a bucket-wise max of 7
    * daily register sets (256 longs/day, CONSTANT in corpus size),
    * where the exact form (q144) must re-touch every (day, user) pair.
    * Register extraction is integer/string-domain md5 arithmetic, so
    * even the estimates hash-match the oracle. Law vs q144's exact
    * counts: tested within the HLL error envelope in AdvancedSpec.
    */
  /** The per-day HLL register table (day, bucket, r) over user_id — the
    * mergeable state q145 windows over (exposed for the streaming twin,
    * which max-merges the identical registers through foreachBatch).
    */
  private[graft] def dailyHllRegisters(s: SparkSession, d: String): DataFrame = {
    val hex = md5(col("user_id").cast("string"))
    val stripped = ltrim(substring(hex, 1, 13), "0")
    val firstDigit = substring(stripped, 1, 1)
    val bits = when(firstDigit.isin("8", "9", "a", "b", "c", "d", "e", "f"), 4)
      .when(firstDigit.isin("4", "5", "6", "7"), 3)
      .when(firstDigit.isin("2", "3"), 2)
      .otherwise(1)
    val rho = when(length(stripped) === 0, lit(53))
      .otherwise(lit(4) * (lit(13) - length(stripped)) + (lit(4) - bits) + lit(1))
    Tables
      .events(s, d)
      .select(
        to_date(col("ts")).as("day"),
        conv(substring(hex, 14, 2), 16, 10).cast("int").as("bucket"),
        rho.as("rho"))
      .groupBy(col("day"), col("bucket"))
      .agg(max(col("rho")).as("r"))
  }

  /** q48's estimate readout over a merged register frame (key, bucket, r). */
  private[graft] def hllEstimate(merged: DataFrame, keyCol: String, outCol: String): DataFrame = {
    val m = 256
    val alphaM2 = 0.7213 / (1 + 1.079 / m) * m * m
    val two53 = 9007199254740992L // 2^53
    val raw = lit(alphaM2) /
      ((col("sp") + (lit(m.toLong) - col("nz")) * lit(two53)).cast("double") / lit(two53.toDouble))
    merged
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("nz"),
        sum(expr("CAST(power(2.0, 53 - r) AS BIGINT)")).as("sp"))
      .select(
        col(keyCol),
        Det.r4(
          when(raw <= lit(2.5 * m) && col("nz") < lit(m.toLong),
            lit(m.toDouble) * log(lit(m.toDouble) / (lit(m.toLong) - col("nz"))))
            .otherwise(raw)).as(outCol),
        col("nz").as("buckets_used"))
      .orderBy(col(keyCol))
  }

  def q145(s: SparkSession, d: String): DataFrame = {
    val daily = dailyHllRegisters(s, d)
    val maxDay = daily.agg(max(col("day")).as("max_day"))
    // sketch merge: replicate each day's ≤256 registers into the ≤7
    // windows they serve, take the bucket-wise max per window end
    val merged = daily
      .select(col("day"), col("bucket"), col("r"), explode(sequence(lit(0), lit(6))).as("k"))
      .select(date_add(col("day"), col("k")).as("wend"), col("bucket"), col("r"))
      .crossJoin(broadcast(maxDay))
      .filter(col("wend") <= col("max_day"))
      .groupBy(col("wend"), col("bucket"))
      .agg(max(col("r")).as("r"))
    hllEstimate(merged, "wend", "users_7d_hll")
  }

  val q145Sql: String = {
    val alphaM2 = (0.7213 / (1 + 1.079 / 256) * 256 * 256).toString
    val hex = "md5(CAST(user_id AS VARCHAR))"
    val raw = s"$alphaM2 / (CAST(sp + (256 - nz) * 9007199254740992 AS DOUBLE) / 9007199254740992.0)"
    s"""WITH rows_h AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    CAST(('0x' || substr($hex, 14, 2)) AS BIGINT) AS bucket,
       |    ltrim(substr($hex, 1, 13), '0') AS stripped
       |  FROM events),
       |daily AS (
       |  SELECT day, bucket,
       |    max(CASE WHEN length(stripped) = 0 THEN 53
       |        ELSE 4 * (13 - length(stripped))
       |          + (4 - (CASE WHEN substr(stripped, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 4
       |                       WHEN substr(stripped, 1, 1) IN ('4','5','6','7') THEN 3
       |                       WHEN substr(stripped, 1, 1) IN ('2','3') THEN 2
       |                       ELSE 1 END)) + 1 END) AS r
       |  FROM rows_h GROUP BY day, bucket),
       |mx AS (SELECT max(day) AS max_day FROM daily),
       |merged AS (
       |  SELECT day + CAST(k AS INT) AS wend, bucket, max(r) AS r
       |  FROM daily, LATERAL (SELECT unnest(range(0, 7)) AS k) t, mx
       |  WHERE day + CAST(k AS INT) <= max_day
       |  GROUP BY wend, bucket),
       |grp AS (
       |  SELECT wend, count(*) AS nz,
       |    sum(CAST(power(2.0, 53 - r) AS BIGINT)) AS sp
       |  FROM merged GROUP BY wend)
       |SELECT wend,
       |  ${Det.sqlR(s"CASE WHEN $raw <= 640.0 AND nz < 256 THEN 256.0 * ln(256.0 / (256 - nz)) ELSE $raw END", 4)} AS users_7d_hll,
       |  nz AS buckets_used
       |FROM grp ORDER BY wend""".stripMargin
  }

  // -- q146: prefix-filtered similarity join ------------------------------

  /** Jaccard ≥ 0.8 pair join via prefix filtering
    * ([[graft.llm.Dedup.jaccardPairsPrefix]]): candidates come only from
    * collisions within each document's (|S| − ⌈t·|S|⌉ + 1)-element
    * prefix under the global rarest-first (ascending-df) order — at the
    * standard dedup threshold only ~20% of the shingle stream (the rare
    * tail) enters the candidate join, with zero false negatives by the
    * All-Pairs prefix lemma (measured on the fixture: 134k prefix rows →
    * 119k candidates → 256 verified pairs at sf0.1, where shared-shingle
    * blocking feeds 1.13M grouped pairs). The oracle is the plain shared-shingle
    * blocking at the same threshold: hash-equality across the two plans
    * IS the completeness proof on this corpus.
    */
  def q146(s: SparkSession, d: String): DataFrame =
    graft.llm.Dedup
      .jaccardPairsPrefix(Tables.documents(s, d), "doc_id", "text", 3, 0.8)
      .orderBy(col("a_id"), col("b_id"))

  val q146Sql: String =
    s"""WITH ${TextQueries.sqlShingleCte},
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY a_id, b_id)
       |SELECT a_id, b_id, CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard,
       |  CAST(inter AS DOUBLE) / least(sa.n, sb.n) AS containment
       |FROM pairs JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
       |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
       |ORDER BY a_id, b_id""".stripMargin

  // -- q147: Jaro-Winkler fuzzy top-3 -----------------------------------

  /** Entity-resolution scoring with the native Jaro-Winkler expression
    * ([[graft.plans.StringSimExprs]]): top-3 most similar part names for
    * each of the first 50 parts. Spark has no built-in JW — this is the
    * codegen'd native-Expression path (one static call per row, whole-
    * stage compatible), and the DuckDB oracle's own
    * `jaro_winkler_similarity` doubles as an independent implementation
    * check: r6 hash-equality across engines means the two scorers agree
    * value-for-value on every compared pair. Scale shape: the 50 probes
    * broadcast; the part table streams (cosine-top-k pattern, corpus
    * never shuffled); similarity snaps BEFORE ranking so ties break
    * identically.
    */
  def q147(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d).select(col("p_partkey"), col("p_name"))
    val probes = parts
      .filter(col("p_partkey") <= 50)
      .select(col("p_partkey").as("qkey"), col("p_name").as("qname"))
    val scored = parts
      .join(broadcast(probes), col("p_partkey") =!= col("qkey"))
      .withColumn("jw", Det.r6(graft.plans.StringSimExprs.jaroWinkler(col("qname"), col("p_name"))))
    val w = Window.partitionBy(col("qkey")).orderBy(col("jw").desc, col("p_partkey"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("qkey"), col("p_partkey"), col("jw"), col("rk"))
      .orderBy(col("qkey"), col("rk"))
  }

  val q147Sql: String =
    s"""WITH probes AS (SELECT p_partkey AS qkey, p_name AS qname FROM part WHERE p_partkey <= 50),
       |s AS (
       |  SELECT q.qkey, p.p_partkey,
       |    ${Det.sqlR("jaro_winkler_similarity(q.qname, p.p_name)", 6)} AS jw
       |  FROM probes q, part p WHERE p.p_partkey <> q.qkey),
       |rked AS (
       |  SELECT qkey, p_partkey, jw,
       |    CAST(row_number() OVER (PARTITION BY qkey ORDER BY jw DESC, p_partkey) AS BIGINT) AS rk
       |  FROM s)
       |SELECT qkey, p_partkey, jw, rk FROM rked WHERE rk <= 3 ORDER BY qkey, rk""".stripMargin

  // -- q148: Markov stationary distribution (power iteration) -----------

  /** Stationary distribution of the session-transition Markov chain
    * (q109's matrix): three power-iteration steps from the uniform
    * vector, ENTIRELY in integer micro-units — probabilities are
    * floor-snapped to 1e-6 once (an exact double op both engines share),
    * then every step is Σ(πᵢ·pᵢ) followed by one integer
    * divide-with-rounding, so the trajectory is bit-reproducible with no
    * float accumulation anywhere. The chain is 5 states; each step is a
    * broadcast-sized join — the same shape at any corpus scale because
    * the matrix aggregates first.
    */
  def q148(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("session_id")).orderBy(col("ts"), col("event_id"))
    val trans = TimeSeriesOps
      .sessionize(Tables.events(s, d), "user_id", "ts", "event_id", 30)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val pInt = trans
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(col("from_type"))))
      .select(
        col("from_type"),
        col("to_type"),
        floor(col("cnt") * lit(1000000.0) / col("tot") + 0.5).cast("long").as("p_i"))
    val states = trans
      .select(col("from_type").as("state"))
      .unionByName(trans.select(col("to_type").as("state")))
      .distinct()
    var pi = states
      .crossJoin(broadcast(states.agg(count(lit(1)).as("nst"))))
      .select(col("state"), expr("1000000 div nst").cast("long").as("pi_i"))
    (1 to 3).foreach { _ =>
      pi = pi
        .join(pInt, pi("state") === pInt("from_type"))
        .groupBy(col("to_type").as("state"))
        .agg(expr("(sum(pi_i * p_i) + 500000) div 1000000").cast("long").as("pi_i"))
    }
    pi.select(col("state"), col("pi_i"), (col("pi_i") / lit(1000000.0)).as("pi"))
      .orderBy(col("state"))
  }

  val q148Sql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |f AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END AS brk
      |  FROM e),
      |g AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM f),
      |t AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS to_type
      |  FROM g),
      |cm AS (SELECT from_type, to_type, count(*) AS cnt FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |pm AS (
      |  SELECT from_type, to_type,
      |    CAST(floor(cnt * 1000000.0 / sum(cnt) OVER (PARTITION BY from_type) + 0.5) AS BIGINT) AS p_i
      |  FROM cm),
      |states AS (SELECT DISTINCT state FROM (SELECT from_type AS state FROM cm UNION SELECT to_type FROM cm) u),
      |pi0 AS (SELECT state, 1000000 // nst AS pi_i FROM states, (SELECT count(*) AS nst FROM states) n),
      |it1 AS (SELECT p.to_type AS state, (sum(pi.pi_i * p.p_i) + 500000) // 1000000 AS pi_i
      |        FROM pi0 pi JOIN pm p ON p.from_type = pi.state GROUP BY p.to_type),
      |it2 AS (SELECT p.to_type AS state, (sum(pi.pi_i * p.p_i) + 500000) // 1000000 AS pi_i
      |        FROM it1 pi JOIN pm p ON p.from_type = pi.state GROUP BY p.to_type),
      |it3 AS (SELECT p.to_type AS state, (sum(pi.pi_i * p.p_i) + 500000) // 1000000 AS pi_i
      |        FROM it2 pi JOIN pm p ON p.from_type = pi.state GROUP BY p.to_type)
      |SELECT state, CAST(pi_i AS BIGINT) AS pi_i, CAST(pi_i AS DOUBLE) / 1000000.0 AS pi
      |FROM it3 ORDER BY state""".stripMargin

  // -- q149: weighted median -------------------------------------------

  /** Weighted median of value per event type (weight = day-of-month, a
    * recency stand-in): the smallest value whose cumulative weight
    * reaches half the total, under the (value, event_id) total order.
    * The built-in percentile family can't take weights; the windowed
    * cumulative-sum form is the standard distributed shape — one hash
    * shuffle on the group key, integer weights so the threshold test is
    * exact. Qualifying rows are a suffix of the order, so min(value)
    * over them IS the first crossing.
    */
  def q149(s: SparkSession, d: String): DataFrame = {
    val base = Tables
      .events(s, d)
      .select(
        col("event_type"),
        col("value"),
        col("event_id"),
        dayofmonth(col("ts")).cast("long").as("wt"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    base
      .withColumn("cumw", sum(col("wt")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("totw", sum(col("wt")).over(Window.partitionBy(col("event_type"))))
      .filter(col("cumw") * 2 >= col("totw"))
      .groupBy(col("event_type"))
      .agg(max(col("totw")).as("total_weight"), Det.r6(min(col("value"))).as("weighted_median"))
      .orderBy(col("event_type"))
  }

  val q149Sql: String =
    s"""WITH base AS (
       |  SELECT event_type, value, event_id, CAST(day(ts) AS BIGINT) AS wt FROM events),
       |c AS (
       |  SELECT event_type, value, wt,
       |    sum(wt) OVER (PARTITION BY event_type ORDER BY value, event_id
       |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
       |    sum(wt) OVER (PARTITION BY event_type) AS totw
       |  FROM base)
       |SELECT event_type, CAST(max(totw) AS BIGINT) AS total_weight,
       |  ${Det.sqlR("min(value)", 6)} AS weighted_median
       |FROM c WHERE cumw * 2 >= totw
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  // -- q150: longest consecutive-day streak -----------------------------

  /** Longest run of consecutive active days per user — gaps-and-islands
    * via the date-minus-rank trick (`day − row_number` is constant
    * exactly within a consecutive run). Engagement-streak analytics with
    * one shuffle on user_id; the distinct (user, day) collapse first
    * bounds everything downstream by active-days, not events.
    */
  def q150(s: SparkSession, d: String): DataFrame = {
    val du = Tables
      .events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    du.withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"), sum(col("len")).as("n_active_days"))
      .orderBy(col("user_id"))
  }

  val q150Sql: String =
    """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |i AS (
      |  SELECT user_id, day,
      |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS grp
      |  FROM du),
      |runs AS (SELECT user_id, grp, count(*) AS len FROM i GROUP BY user_id, grp)
      |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
      |  CAST(sum(len) AS BIGINT) AS n_active_days
      |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin

  // -- q151: PMI collocations -------------------------------------------

  /** Pointwise-mutual-information collocation mining: top-20 adjacent
    * word pairs by PMI = ln((c_ab/Nb) / ((c_a/Nu)(c_b/Nu))) with minimum
    * support 5 — the multiword-expression detector corpus curation uses
    * to protect collocations from token-level ops. All counts are exact
    * integers; PMI is a per-row deterministic function of them (a sum of
    * logs), snapped r6 BEFORE ranking. Shuffles: one per count table,
    * totals ride one-row broadcasts; the global top-20 is
    * TakeOrderedAndProject.
    */
  def q151(s: SparkSession, d: String): DataFrame = {
    val toks = Tables
      .documents(s, d)
      .select(Text.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
    val uni = toks
      .select(explode(col("w")).as("t"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("c"))
    val bi = toks
      .select(
        explode(expr(
          "transform(sequence(0, size(w) - 2), i -> struct(element_at(w, i + 1) AS a, element_at(w, i + 2) AS b))"))
          .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    val nu = uni.agg(sum(col("c")).as("nu"))
    val nb = Tables
      .documents(s, d)
      .select(Text.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .agg(sum(size(col("w")) - 1).cast("long").as("nb"))
    val pmi = log(col("c_ab").cast("double")) - log(col("nb").cast("double")) -
      log(col("ca").cast("double")) - log(col("cb").cast("double")) +
      lit(2.0) * log(col("nu").cast("double"))
    val scored = bi
      .join(uni.select(col("t").as("a"), col("c").as("ca")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("c").as("cb")), Seq("b"))
      .crossJoin(broadcast(nu))
      .crossJoin(broadcast(nb))
      .select(col("a"), col("b"), col("c_ab"), Det.r6(pmi).as("pmi"))
    scored
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(20)
      .withColumn(
        "rk",
        row_number().over(Window.orderBy(col("pmi").desc, col("a"), col("b"))).cast("long"))
      .orderBy(col("rk"))
  }

  val q151Sql: String =
    s"""WITH d AS (SELECT $sqlToks AS w FROM documents),
       |dd AS (SELECT w FROM d WHERE len(w) >= 2),
       |uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c
       |        FROM (SELECT unnest(w) AS t FROM dd) u GROUP BY t),
       |bi AS (
       |  SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM (
       |    SELECT w[CAST(i AS INT)] AS a, w[CAST(i + 1 AS INT)] AS b
       |    FROM dd, LATERAL (SELECT unnest(range(1, len(w))) AS i) t) p
       |  GROUP BY a, b HAVING count(*) >= 5),
       |nu AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM uni),
       |nb AS (SELECT CAST(sum(len(w) - 1) AS BIGINT) AS nb FROM dd),
       |scored AS (
       |  SELECT bi.a, bi.b, bi.c_ab,
       |    ${Det.sqlR(
        "ln(CAST(c_ab AS DOUBLE)) - ln(CAST(nb.nb AS DOUBLE)) - ln(CAST(ua.c AS DOUBLE)) - ln(CAST(ub.c AS DOUBLE)) + 2.0 * ln(CAST(nu.nu AS DOUBLE))",
        6)} AS pmi
       |  FROM bi JOIN uni ua ON ua.t = bi.a JOIN uni ub ON ub.t = bi.b, nu, nb),
       |rked AS (
       |  SELECT a, b, c_ab, pmi,
       |    CAST(row_number() OVER (ORDER BY pmi DESC, a, b) AS BIGINT) AS rk
       |  FROM scored)
       |SELECT a, b, c_ab, pmi, rk FROM rked WHERE rk <= 20 ORDER BY rk""".stripMargin

  // -- q152: language-ID confusion matrix --------------------------------

  /** Confusion matrix of the q28 marker-lexicon language detector against
    * the labeled `lang` column, with per-cell recall (row-normalized) and
    * precision (column-normalized) fractions — the QA readout that turns
    * a classifier query into a monitored pipeline stage. Composes q28's
    * predictor verbatim, so detector and audit can never drift. Matrix
    * cells are a 5×5 aggregate; both normalizations ride windows over
    * that tiny frame.
    */
  def q152(s: SparkSession, d: String): DataFrame = {
    val cm = TextQueries
      .q28(s, d)
      .groupBy(col("actual_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    cm.select(
      col("actual_lang"),
      col("pred_lang"),
      col("n"),
      Det.r6(col("n").cast("double") / sum(col("n")).over(Window.partitionBy(col("actual_lang"))))
        .as("frac_of_actual"),
      Det.r6(col("n").cast("double") / sum(col("n")).over(Window.partitionBy(col("pred_lang"))))
        .as("frac_of_pred"))
      .orderBy(col("actual_lang"), col("pred_lang"))
  }

  val q152Sql: String =
    s"""WITH p AS (SELECT actual_lang, pred_lang FROM (${TextQueries.q28Sql.replace("\n", "\n  ")}) z),
       |cm AS (SELECT actual_lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2)
       |SELECT actual_lang, pred_lang, n,
       |  ${Det.sqlR("CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY actual_lang)", 6)} AS frac_of_actual,
       |  ${Det.sqlR("CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY pred_lang)", 6)} AS frac_of_pred
       |FROM cm ORDER BY actual_lang, pred_lang""".stripMargin

  // -- q153: VARIANT semi-structured extraction --------------------------

  /** Semi-structured analytics through Spark 4's VARIANT type:
    * `parse_json` once into the binary variant encoding, then typed
    * `variant_get` path extraction — the open-schema path that keeps
    * JSON shredding OUT of the scan schema (vs q10's `get_json_object`
    * string walk and q50's rigid `from_json` map). At 100 TB variant's
    * binary form is the difference between decoding JSON text per access
    * and per ROW. Aggregates are integer-exact; the oracle reads the
    * same paths with DuckDB's JSON extraction.
    */
  def q153(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .select(
        col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
        expr("variant_get(parse_json(props), '$.missing', 'bigint')").as("miss"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        countDistinct(col("k")).as("distinct_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(col("miss")).as("n_missing_path"))
      .orderBy(col("event_type"))

  val q153Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS distinct_k,
      |  CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
      |  CAST(count(CAST(json_extract(props, '$.missing') AS BIGINT)) AS BIGINT) AS n_missing_path
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -- q154: reciprocal-rank fusion --------------------------------------

  /** Hybrid-retrieval rank fusion: RRF-merge the exact cosine top-10
    * (q32) with the multi-probe LSH top-10 (q34) per query — the
    * standard way production search combines rankers without score
    * calibration. Contributions are snapped to integer nano-units
    * (floor(1e9/(60+rank))), so the fused score is an exact integer sum
    * over however many systems ranked the candidate (full outer on the
    * rank lists — a candidate one system missed simply contributes 0).
    * Both inputs are verified queries; fusion adds one tiny-frame join.
    */
  def q154(s: SparkSession, d: String): DataFrame = {
    def contrib(rk: Column): Column =
      when(rk.isNull, lit(0L)).otherwise(floor(lit(1.0e9) / (lit(60) + rk) + 0.5).cast("long"))
    val a = VectorQueries.q32(s, d).select(col("qid"), col("vec_id"), col("rk").as("rk_exact"))
    val b = VectorQueries.q34(s, d).select(col("qid"), col("vec_id"), col("rk").as("rk_lsh"))
    val fused = a
      .join(b, Seq("qid", "vec_id"), "full_outer")
      .select(
        col("qid"),
        col("vec_id"),
        (contrib(col("rk_exact")) + contrib(col("rk_lsh"))).as("rrf_i"),
        col("rk_exact"),
        col("rk_lsh"))
    val w = Window.partitionBy(col("qid")).orderBy(col("rrf_i").desc, col("vec_id"))
    fused
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
      .select(col("qid"), col("vec_id"), col("rrf_i"), col("rk"))
      .orderBy(col("qid"), col("rk"))
  }

  val q154Sql: String = {
    def derived(sql: String) = "(" + sql.replace("\n", "\n  ") + ")"
    s"""WITH a AS (SELECT qid, vec_id, rk AS rk_exact FROM ${derived(VectorQueries.q32Sql)} za),
       |b AS (SELECT qid, vec_id, rk AS rk_lsh FROM ${derived(VectorQueries.q34Sql)} zb),
       |fused AS (
       |  SELECT coalesce(a.qid, b.qid) AS qid, coalesce(a.vec_id, b.vec_id) AS vec_id,
       |    CAST(coalesce(CAST(floor(1e9 / (60 + a.rk_exact) + 0.5) AS BIGINT), 0)
       |       + coalesce(CAST(floor(1e9 / (60 + b.rk_lsh) + 0.5) AS BIGINT), 0) AS BIGINT) AS rrf_i
       |  FROM a FULL OUTER JOIN b ON a.qid = b.qid AND a.vec_id = b.vec_id),
       |rked AS (
       |  SELECT qid, vec_id, rrf_i,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf_i DESC, vec_id) AS BIGINT) AS rk
       |  FROM fused)
       |SELECT qid, vec_id, rrf_i, rk FROM rked WHERE rk <= 10 ORDER BY qid, rk""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q154_rrf_fusion" -> (q154 _),
    "q153_variant_extract" -> (q153 _),
    "q151_pmi_collocations" -> (q151 _),
    "q152_langid_confusion" -> (q152 _),
    "q148_markov_stationary" -> (q148 _),
    "q149_weighted_median" -> (q149 _),
    "q150_longest_streak" -> (q150 _),
    "q147_jaro_winkler_topk" -> (q147 _),
    "q145_sliding_hll" -> (q145 _),
    "q146_prefix_filter_join" -> (q146 _),
    "q141_interp_asof" -> (q141 _),
    "q142_triangle_count" -> (q142 _),
    "q143_incremental_mv" -> (q143 _),
    "q144_sliding_distinct" -> (q144 _),
    "q133_asof_join_forward" -> (q133 _),
    "q134_interval_union" -> (q134 _),
    "q135_maxsim_multivector" -> (q135 _),
    "q136_cms_heavy_hitters" -> (q136 _),
    "q137_hilbert_key" -> (q137 _),
    "q138_zipf_fit" -> (q138 _),
    "q139_session_motifs" -> (q139 _),
    "q140_equidepth_histogram" -> (q140 _))

  val oracles: Map[String, String] = Map(
    "q154_rrf_fusion" -> q154Sql,
    "q153_variant_extract" -> q153Sql,
    "q151_pmi_collocations" -> q151Sql,
    "q152_langid_confusion" -> q152Sql,
    "q148_markov_stationary" -> q148Sql,
    "q149_weighted_median" -> q149Sql,
    "q150_longest_streak" -> q150Sql,
    "q147_jaro_winkler_topk" -> q147Sql,
    "q145_sliding_hll" -> q145Sql,
    "q146_prefix_filter_join" -> q146Sql,
    "q141_interp_asof" -> q141Sql,
    "q142_triangle_count" -> q142Sql,
    "q143_incremental_mv" -> q143Sql,
    "q144_sliding_distinct" -> q144Sql,
    "q133_asof_join_forward" -> q133Sql,
    "q134_interval_union" -> q134Sql,
    "q135_maxsim_multivector" -> q135Sql,
    "q136_cms_heavy_hitters" -> q136Sql,
    "q137_hilbert_key" -> q137Sql,
    "q138_zipf_fit" -> q138Sql,
    "q139_session_motifs" -> q139Sql,
    "q140_equidepth_histogram" -> q140Sql)
}
