package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}
import graft.functions.Layout

/** Behavioral-analytics query registry over `events` plus layout/fuzzy
  * operators over the relational tables: funnel conversion, retention
  * cohorts, trailing-window anomaly detection, blocked fuzzy matching,
  * and Z-order clustering keys.
  */
object Analytics {

  type Q = (SparkSession, String) => DataFrame

  // -- q86: blocked fuzzy self-join (edit distance) --------------------

  /** Fuzzy name matching: distinct part names within Levenshtein distance
    * ≤ 2, blocked on the name's second token. Blocking IS the scale
    * design — the quadratic comparison runs only inside each block
    * (shuffle key = noun), exactly like the LSH band join; an unblocked
    * edit-distance join would be the all-pairs cross product. The oracle
    * verifies the blocked semantics (same blocking rule on both sides).
    */
  def q86(s: SparkSession, d: String): DataFrame = {
    val t = Tables
      .part(s, d)
      .select(col("p_name"))
      .distinct()
      .withColumn("noun", element_at(split(col("p_name"), " "), 2))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = t.select(col("noun"), col("p_name").as("a_name"))
    val b = t.select(col("noun"), col("p_name").as("b_name"))
    a.join(b, Seq("noun"))
      .filter(col("a_name") < col("b_name"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")).cast("long"))
      .filter(col("dist") <= 2)
      .select(col("a_name"), col("b_name"), col("dist"))
      .orderBy(col("a_name"), col("b_name"))
  }

  val q86Sql: String =
    """WITH names AS (SELECT DISTINCT p_name FROM part),
      |t AS (SELECT p_name, string_split(p_name, ' ')[2] AS noun FROM names)
      |SELECT a.p_name AS a_name, b.p_name AS b_name,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM t a JOIN t b ON a.noun = b.noun AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY a_name, b_name""".stripMargin

  // -- q87: funnel conversion ------------------------------------------

  /** Three-stage funnel with conversion windows: first view → first click
    * within 2 h → first purchase within 24 h of that click. Every stage is
    * a conditional min-aggregate keyed on user_id; all four joins hash on
    * the same key, so the plan is one exchange reused across stages — at
    * 100 TB a user's history never leaves its partition.
    */
  def q87(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val users = e.select(col("user_id")).distinct()
    val v = e
      .filter(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t_view"))
    val c = e
      .filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t_view") && col("ts") <= col("t_view") + expr("INTERVAL 2 HOURS"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t_click"))
    val p = e
      .filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t_click") && col("ts") <= col("t_click") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t_purchase"))
    users
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .withColumn(
        "stage",
        when(col("t_purchase").isNotNull, 3L)
          .when(col("t_click").isNotNull, 2L)
          .when(col("t_view").isNotNull, 1L)
          .otherwise(0L))
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"), col("stage"))
      .orderBy(col("user_id"))
  }

  val q87Sql: String =
    """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events WHERE event_type='view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e JOIN v ON v.user_id=e.user_id
      |      WHERE e.event_type='click' AND e.ts > v.t_view AND e.ts <= v.t_view + INTERVAL 2 HOUR GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e JOIN c ON c.user_id=e.user_id
      |      WHERE e.event_type='purchase' AND e.ts > c.t_click AND e.ts <= c.t_click + INTERVAL 24 HOUR GROUP BY e.user_id)
      |SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
      |  CAST(CASE WHEN p.user_id IS NOT NULL THEN 3 WHEN c.user_id IS NOT NULL THEN 2
      |       WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
      |FROM (SELECT DISTINCT user_id FROM events) u
      |LEFT JOIN v USING (user_id) LEFT JOIN c ON c.user_id=u.user_id LEFT JOIN p ON p.user_id=u.user_id
      |ORDER BY user_id""".stripMargin

  // -- q88: retention cohorts ------------------------------------------

  /** Weekly retention by signup cohort: cohort = day of the user's first
    * signup event; a user is active in week k if any post-signup event
    * falls k calendar weeks after the cohort day. The (user, day) distinct
    * bounds state per user at one row per active day; cohort arithmetic is
    * integer day math — no float divergence anywhere.
    */
  def q88(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val f = e
      .filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(date_trunc("day", min(col("ts"))).as("cohort"))
    e.join(f, Seq("user_id"))
      .filter(col("ts") >= col("cohort"))
      .select(col("user_id"), col("cohort"), date_trunc("day", col("ts")).as("d"))
      .distinct()
      .groupBy(
        col("cohort"),
        (datediff(col("d"), col("cohort")) / lit(7)).cast("long").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  val q88Sql: String =
    """WITH f AS (SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort
      |           FROM events WHERE event_type='signup' GROUP BY user_id),
      |a AS (SELECT DISTINCT e.user_id, f.cohort, CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS d
      |      FROM events e JOIN f USING (user_id) WHERE e.ts >= f.cohort)
      |SELECT cohort, CAST(date_diff('day', cohort, d) // 7 AS BIGINT) AS week_offset,
      |  count(DISTINCT user_id) AS n_active
      |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- q89: trailing-window anomaly detection --------------------------

  /** Per-series z-score anomalies: each event scored against the mean and
    * variance of its user's previous ≤19 values (current row excluded);
    * flagged when |z| > 2 with ≥10 points of history. Mean/variance come
    * from explicit sum/sum² frame aggregates (not `stddev`, whose
    * single-pass formula differs across engines); z is Det-rounded at the
    * divergence point. One hash shuffle on the series key.
    */
  def q89(s: SparkSession, d: String): DataFrame = {
    val fr = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-19, -1)
    Tables
      .events(s, d)
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        col("value"),
        count(col("value")).over(fr).as("n"),
        sum(col("value")).over(fr).as("s"),
        sum(col("value") * col("value")).over(fr).as("s2"))
      .filter(col("n") >= 10)
      .withColumn(
        "z",
        (col("value") - col("s") / col("n")) /
          sqrt(greatest((col("s2") - col("s") * col("s") / col("n")) / (col("n") - 1), lit(1e-12))))
      .filter(abs(col("z")) > 2)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"), Det.r4(col("z")).as("z"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  val q89Sql: String =
    s"""WITH w AS (
       |  SELECT user_id, ts, event_id, value,
       |    count(value) OVER fr AS n, sum(value) OVER fr AS s, sum(value*value) OVER fr AS s2
       |  FROM events
       |  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING)),
       |z AS (
       |  SELECT user_id, ts, event_id, value,
       |    (value - s/n) / sqrt(greatest((s2 - s*s/n)/(n-1), 1e-12)) AS z
       |  FROM w WHERE n >= 10)
       |SELECT user_id, ts, event_id, value, ${Det.sqlR("z", 4)} AS z
       |FROM z WHERE abs(z) > 2 ORDER BY user_id, ts, event_id""".stripMargin

  // -- q93: Z-order clustering key -------------------------------------

  /** Z-order (Morton) key over (customer, order-day): the layout key that
    * makes min/max file stats prune 2-D box predicates on a 100 TB fact
    * table. Pure bit arithmetic in whole-stage codegen; the locality law
    * (z-sorted buckets have narrow spans in BOTH dimensions) is asserted
    * in LayoutSpec.
    */
  def q93(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        Layout
          .zorder2(
            col("o_custkey") % 65536,
            datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01"))).cast("long"))
          .as("zval"))
      .orderBy(col("o_orderkey"))

  val q93Sql: String = {
    val z = Layout.sqlZorder2(
      "o_custkey % 65536",
      "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))")
    s"""SELECT o_orderkey, $z AS zval
       |FROM orders ORDER BY o_orderkey""".stripMargin
  }

  // -- q108: fixed-width value histograms per group ---------------------

  /** Equi-width histogram of `value` per event type: 10 buckets spanning
    * the type's own [min, max], top bucket closed. Bounds are a 5-row
    * aggregate broadcast back onto the stream, so the corpus pays one
    * map-side bucket assignment and one (type, bucket) hash aggregate —
    * histogram construction stays two shuffles at any scale. Bucket
    * arithmetic is raw-IEEE on the parquet doubles (floor of an exact
    * expression), identical on both engines; only the reported bucket
    * EDGES are Det-rounded for display.
    */
  def q108(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val bounds = ev
      .groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .withColumn(
        "bucket",
        least(floor((col("value") - col("lo")) / (col("hi") - col("lo")) * 10.0), lit(9.0)).cast("long"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("cnt"), min(col("lo")).as("lo"), min(col("hi")).as("hi"))
      .select(
        col("event_type"),
        col("bucket"),
        col("cnt"),
        Det.r6(col("lo") + col("bucket") * (col("hi") - col("lo")) / 10.0).as("bucket_lo"),
        Det.r6(col("lo") + (col("bucket") + 1) * (col("hi") - col("lo")) / 10.0).as("bucket_hi"))
      .orderBy(col("event_type"), col("bucket"))
  }

  val q108Sql: String =
    s"""WITH b AS (SELECT event_type, min(value) AS lo, max(value) AS hi FROM events GROUP BY event_type),
       |k AS (
       |  SELECT e.event_type,
       |    CAST(least(floor((e.value - b.lo) / (b.hi - b.lo) * 10.0), 9.0) AS BIGINT) AS bucket,
       |    b.lo, b.hi
       |  FROM events e JOIN b USING (event_type))
       |SELECT event_type, bucket, count(*) AS cnt,
       |  ${Det.sqlR("min(lo) + bucket * (min(hi) - min(lo)) / 10.0", 6)} AS bucket_lo,
       |  ${Det.sqlR("min(lo) + (bucket + 1) * (min(hi) - min(lo)) / 10.0", 6)} AS bucket_hi
       |FROM k GROUP BY event_type, bucket ORDER BY event_type, bucket""".stripMargin

  // -- q109: session-path Markov transition matrix -----------------------

  /** Clickstream path analysis: first-order Markov transition matrix over
    * event types, transitions counted WITHIN 30-minute sessions (the q20
    * sessionization) so unrelated visits never chain. The transition
    * count and the per-source normalization both hash on small keys
    * (event-type pairs — vocabulary-sized); the only corpus-sized work is
    * the per-user session window, one exchange on user_id.
    */
  def q109(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = graft.operators.TimeSeriesOps
      .sessionize(Tables.events(s, d), "user_id", "ts", "event_id", 30)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
    trans
      .withColumn("p", Det.r6(col("cnt") / sum(col("cnt")).over(Window.partitionBy(col("from_type")))))
      .orderBy(col("from_type"), col("to_type"))
  }

  val q109Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |f AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END AS brk
       |  FROM e),
       |g AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM f),
       |t AS (
       |  SELECT event_type AS from_type,
       |    lead(event_type) OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS to_type
       |  FROM g),
       |c AS (SELECT from_type, to_type, count(*) AS cnt FROM t WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
       |SELECT from_type, to_type, cnt,
       |  ${Det.sqlR("cnt / (sum(cnt) OVER (PARTITION BY from_type))", 6)} AS p
       |FROM c ORDER BY from_type, to_type""".stripMargin

  // -- q112: autocorrelation function (lag 1..3) ------------------------

  /** Per-series autocorrelation at lags 1–3 over the hourly mean-value
    * series — the classic TSDB seasonality probe (a strong lag-24 ACF is
    * daily periodicity). The hourly means are r6-snapped so both engines
    * correlate identical series; Pearson terms are plain sums over the
    * lag-aligned pairs (one window per event_type, then one hash agg —
    * the series, never the raw events, is what the window sorts).
    */
  def q112(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables
      .events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(Det.r6(avg(col("value"))).as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val lags = (1 to 3).map(k => lag(col("y"), k).over(w).as(s"l$k"))
    val stacked = hourly
      .select(col("event_type") +: col("y") +: lags: _*)
      .select(
        col("event_type"),
        col("y"),
        explode(array((1 to 3).map(k =>
          struct(lit(k.toLong).as("k"), col(s"l$k").as("yl"))): _*)).as("p"))
      .select(col("event_type"), col("p.k").as("lag_k"), col("y"), col("p.yl").as("yl"))
      .filter(col("yl").isNotNull)
    stacked
      .groupBy(col("event_type"), col("lag_k"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("sx"),
        sum(col("yl")).as("sy"),
        sum(col("y") * col("y")).as("sxx"),
        sum(col("yl") * col("yl")).as("syy"),
        sum(col("y") * col("yl")).as("sxy"))
      .select(
        col("event_type"),
        col("lag_k"),
        col("n"),
        Det.r6(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt(
              (col("n") * col("sxx") - col("sx") * col("sx")) *
                (col("n") * col("syy") - col("sy") * col("sy")))).as("acf"))
      .orderBy(col("event_type"), col("lag_k"))
  }

  val q112Sql: String =
    s"""WITH hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h,
       |    ${Det.sqlR("avg(value)", 6)} AS y
       |  FROM events GROUP BY event_type, h),
       |lagged AS (
       |  SELECT event_type, y,
       |    lag(y, 1) OVER w AS l1, lag(y, 2) OVER w AS l2, lag(y, 3) OVER w AS l3
       |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY h)),
       |stacked AS (
       |  SELECT event_type, CAST(k AS BIGINT) AS lag_k, y,
       |    CASE k WHEN 1 THEN l1 WHEN 2 THEN l2 ELSE l3 END AS yl
       |  FROM lagged, LATERAL (SELECT unnest(range(1, 4)) AS k) t),
       |agg AS (
       |  SELECT event_type, lag_k, count(*) AS n,
       |    sum(y) AS sx, sum(yl) AS sy,
       |    sum(y * y) AS sxx, sum(yl * yl) AS syy, sum(y * yl) AS sxy
       |  FROM stacked WHERE yl IS NOT NULL GROUP BY event_type, lag_k)
       |SELECT event_type, lag_k, n,
       |  ${Det.sqlR("(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))", 6)} AS acf
       |FROM agg ORDER BY event_type, lag_k""".stripMargin

  // -- q113: cross-series correlation matrix ----------------------------

  /** Pearson correlation between every pair of event-type activity series
    * (hourly event counts joined on the hour) — "which signals move
    * together", the TSDB cross-series deliverable. All Pearson terms are
    * integer counts summed exactly (cast to double only for the final
    * ratio), so the only float op is the r6-snapped result: cross-engine
    * determinism is exact. The join key is the hour; series count is the
    * type cardinality, so the matrix is dimension-sized.
    */
  def q113(s: SparkSession, d: String): DataFrame = {
    val hc = Tables
      .events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
    val a = hc.select(col("event_type").as("type_a"), col("h"), col("c").as("ca"))
    val b = hc.select(col("event_type").as("type_b"), col("h"), col("c").as("cb"))
    a.join(b, Seq("h"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("ca")).cast("double").as("sa"),
        sum(col("cb")).cast("double").as("sb"),
        sum(col("ca") * col("ca")).cast("double").as("saa"),
        sum(col("cb") * col("cb")).cast("double").as("sbb"),
        sum(col("ca") * col("cb")).cast("double").as("sab"))
      .select(
        col("type_a"),
        col("type_b"),
        col("n_hours"),
        Det.r6(
          (col("n_hours") * col("sab") - col("sa") * col("sb")) /
            sqrt(
              (col("n_hours") * col("saa") - col("sa") * col("sa")) *
                (col("n_hours") * col("sbb") - col("sb") * col("sb")))).as("xcorr"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val q113Sql: String =
    s"""WITH hc AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
       |  FROM events GROUP BY event_type, h),
       |agg AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_hours,
       |    CAST(sum(a.c) AS DOUBLE) AS sa, CAST(sum(b.c) AS DOUBLE) AS sb,
       |    CAST(sum(a.c * a.c) AS DOUBLE) AS saa, CAST(sum(b.c * b.c) AS DOUBLE) AS sbb,
       |    CAST(sum(a.c * b.c) AS DOUBLE) AS sab
       |  FROM hc a JOIN hc b ON a.h = b.h AND a.event_type < b.event_type
       |  GROUP BY type_a, type_b)
       |SELECT type_a, type_b, n_hours,
       |  ${Det.sqlR("(n_hours * sab - sa * sb) / sqrt((n_hours * saa - sa * sa) * (n_hours * sbb - sb * sb))", 6)} AS xcorr
       |FROM agg ORDER BY type_a, type_b""".stripMargin

  // -- q115: exact percentile bands per series ---------------------------

  /** Exact p50/p90/p99 value bands per event type — the latency-band
    * readout every TSDB dashboard draws. Spark's `percentile` and DuckDB's
    * `quantile_cont` share the (n−1)·p linear-interpolation definition, so
    * the exact (sort-based) form is cross-engine checkable where the GK
    * sketch (q71) is tolerance-only. One hash agg; the per-group sort is
    * the aggregation buffer, never a global sort.
    */
  def q115(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(value, array(0.5D, 0.9D, 0.99D))").as("pcts"))
      .select(
        col("event_type"),
        col("n"),
        Det.r6(element_at(col("pcts"), 1)).as("p50"),
        Det.r6(element_at(col("pcts"), 2)).as("p90"),
        Det.r6(element_at(col("pcts"), 3)).as("p99"))
      .orderBy(col("event_type"))

  val q115Sql: String =
    s"""SELECT event_type, count(*) AS n,
       |  ${Det.sqlR("quantile_cont(value, 0.5)", 6)} AS p50,
       |  ${Det.sqlR("quantile_cont(value, 0.9)", 6)} AS p90,
       |  ${Det.sqlR("quantile_cont(value, 0.99)", 6)} AS p99
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -- q116: per-series OLS trend ----------------------------------------

  /** Ordinary-least-squares trend per event-type series: value regressed
    * on hours-since-series-start. Slope/intercept/R² from five moment
    * sums — the closed form distributes as one hash agg with map-side
    * partials (the moment-sketch shape that holds at 100 TB; no window,
    * no sort). Determinism is by construction, not accumulation luck: x
    * is an integer HOUR INDEX, y integer MILLI-UNITS (floor-snap, an
    * exact double op both engines share), and all five moments sum in
    * the integer domain — DECIMAL(38,0) in Spark, HUGEINT in DuckDB —
    * so cross-partition aggregation order provably cannot perturb them
    * (the q127 discipline). Only the final closed-form stats run in
    * double, as the same deterministic function of identical exact
    * integers on both engines, then snap r6.
    */
  def q116(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
    val xy = Tables
      .events(s, d)
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("t0", min(col("us")).over(w))
      .select(
        col("event_type"),
        expr("(us - t0) div 3600000000").as("xh"), // hour index, BIGINT
        expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("ym")) // milli-units
    val d38 = "decimal(38,0)"
    val agg = xy
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("xh").cast(d38)).as("sx"),
        sum(col("ym").cast(d38)).as("sy"),
        sum((col("xh") * col("xh")).cast(d38)).as("sxx"),
        sum((col("ym") * col("ym")).cast(d38)).as("syy"),
        sum((col("xh") * col("ym")).cast(d38)).as("sxy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    agg
      .select(
        col("event_type"),
        col("n"),
        Det.r6(num / den / lit(1000.0)).as("slope_per_hour"),
        Det.r6((sy - num / den * sx) / n / lit(1000.0)).as("intercept"),
        Det.r6((num * num) / (den * (n * syy - sy * sy))).as("r2"))
      .orderBy(col("event_type"))
  }

  val q116Sql: String =
    s"""WITH xy AS (
       |  SELECT event_type,
       |    (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY event_type)) // 3600000000 AS xh,
       |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS ym
       |  FROM events),
       |agg AS (
       |  SELECT event_type, count(*) AS n,
       |    CAST(sum(xh) AS DOUBLE) AS sx, CAST(sum(ym) AS DOUBLE) AS sy,
       |    CAST(sum(xh * xh) AS DOUBLE) AS sxx, CAST(sum(ym * ym) AS DOUBLE) AS syy,
       |    CAST(sum(xh * ym) AS DOUBLE) AS sxy
       |  FROM xy GROUP BY event_type)
       |SELECT event_type, n,
       |  ${Det.sqlR("(n * sxy - sx * sy) / (n * sxx - sx * sx) / 1000", 6)} AS slope_per_hour,
       |  ${Det.sqlR("(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n / 1000", 6)} AS intercept,
       |  ${Det.sqlR("((n * sxy - sx * sy) * (n * sxy - sx * sy)) / ((n * sxx - sx * sx) * (n * syy - sy * sy))", 6)} AS r2
       |FROM agg ORDER BY event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q112_acf" -> (q112 _),
    "q113_xcorr_matrix" -> (q113 _),
    "q115_value_bands" -> (q115 _),
    "q116_trend_ols" -> (q116 _),
    "q108_value_histogram" -> (q108 _),
    "q109_markov_transitions" -> (q109 _),
    "q86_fuzzy_name_match" -> (q86 _),
    "q87_funnel" -> (q87 _),
    "q88_retention_cohorts" -> (q88 _),
    "q89_anomaly_zscore" -> (q89 _),
    "q93_zorder_key" -> (q93 _))

  val oracles: Map[String, String] = Map(
    "q112_acf" -> q112Sql,
    "q113_xcorr_matrix" -> q113Sql,
    "q115_value_bands" -> q115Sql,
    "q116_trend_ols" -> q116Sql,
    "q108_value_histogram" -> q108Sql,
    "q109_markov_transitions" -> q109Sql,
    "q86_fuzzy_name_match" -> q86Sql,
    "q87_funnel" -> q87Sql,
    "q88_retention_cohorts" -> q88Sql,
    "q89_anomaly_zscore" -> q89Sql,
    "q93_zorder_key" -> q93Sql)
}
