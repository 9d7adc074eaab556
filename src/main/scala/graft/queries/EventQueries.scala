package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}
import graft.operators.TimeSeriesOps

/** Time-series query registry over the `events` table — the reference's
  * stated destiny ("(soon to be timeseries) database", reference
  * `README.md:3`) realized: downsampling, running aggregates, deltas,
  * as-of joins, gap-fill, sessionization, last-write-wins compaction.
  *
  * All windows partition by `user_id` (the series key) and order by
  * `(ts, event_id)` — a total order, so every output is deterministic.
  * One hash shuffle on the series key per query; at 100 TB the same plan
  * holds with events parquet partitioned by date and bucketed by user.
  */
object EventQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Tumbling-hour downsample per event type. */
  def q13(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.r2(sum(col("value"))).as("sv"))
      .orderBy(col("h"), col("event_type"))

  val q13Sql: String =
    s"""SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
       |  ${Det.sqlR("sum(value)", 2)} AS sv
       |FROM events GROUP BY h, event_type ORDER BY h, event_type""".stripMargin

  /** Daily per-user downsample with a derived average. The average is a
    * function of the already-rounded sum, so both engines divide identical
    * doubles (see Det's determinism contract).
    */
  def q14(s: SparkSession, d: String): DataFrame =
    TimeSeriesOps
      .downsample(
        Tables.events(s, d),
        "ts",
        "day",
        Seq("user_id"),
        Seq(count(lit(1)).as("n"), Det.r2(sum(col("value"))).as("sv")))
      .withColumn("avg_v", Det.r6(col("sv") / col("n")))
      .select(col("user_id"), col("bucket"), col("n"), col("sv"), col("avg_v"))
      .orderBy(col("user_id"), col("bucket"))

  val q14Sql: String = {
    val sv = Det.sqlR("sum(value)", 2)
    s"""SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, count(*) AS n,
       |  $sv AS sv, ${Det.sqlR(s"$sv / count(*)", 6)} AS avg_v
       |FROM events GROUP BY bucket, user_id ORDER BY user_id, bucket""".stripMargin
  }

  /** Per-user running sum (rows-frame cumulative). */
  def q15(s: SparkSession, d: String): DataFrame =
    TimeSeriesOps
      .runningAgg(Tables.events(s, d), "user_id", "ts", "event_id", sum(_), "value", "rsum")
      .select(col("user_id"), col("ts"), col("event_id"), Det.r2(col("rsum")).as("rsum"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))

  val q15Sql: String =
    s"""SELECT user_id, ts, event_id,
       |  ${Det.sqlR(
        "sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
        2)} AS rsum
       |FROM events ORDER BY user_id, ts, event_id""".stripMargin

  /** Per-user delta vs previous event (lag). */
  def q16(s: SparkSession, d: String): DataFrame =
    TimeSeriesOps
      .delta(Tables.events(s, d), "user_id", "ts", "event_id", "value", "dv")
      .select(col("user_id"), col("ts"), col("event_id"), Det.r2(col("dv")).as("dv"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))

  val q16Sql: String =
    s"""SELECT user_id, ts, event_id,
       |  ${Det.sqlR("value - lag(value, 1, 0.0) OVER (PARTITION BY user_id ORDER BY ts, event_id)", 2)} AS dv
       |FROM events ORDER BY user_id, ts, event_id""".stripMargin

  /** Top-5 events by value per type (ranked window, ties on event_id). */
  def q17(s: SparkSession, d: String): DataFrame =
    TimeSeriesOps
      .topKPerGroup(Tables.events(s, d), Seq("event_type"), Seq(col("value").desc, col("event_id").asc), 5)
      .select(col("event_type"), col("rk").cast("long").as("rk"), col("event_id"), col("value"))
      .orderBy(col("event_type"), col("rk"))

  val q17Sql: String =
    """SELECT event_type, CAST(rk AS BIGINT) AS rk, event_id, value FROM (
      |  SELECT event_type, event_id, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
      |  FROM events) t WHERE rk <= 5 ORDER BY event_type, rk""".stripMargin

  /** As-of join: each error event picks up the latest purchase value of the
    * same user at-or-before its timestamp (union + last-over-window — one
    * shuffle on user_id, no range blowup; see TimeSeriesOps.asOfJoin).
    */
  def q18(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase").select("user_id", "ts", "event_id", "value")
    TimeSeriesOps
      .asOfJoin(errors, purchases, "user_id", "ts", "ts", "event_id", Map("value" -> "pv"))
      .select(col("event_id"), col("user_id"), col("ts"), coalesce(col("pv"), lit(-1.0)).as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  val q18Sql: String =
    """SELECT e.event_id, e.user_id, e.ts,
      |  coalesce((SELECT p.value FROM events p
      |            WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts
      |            ORDER BY p.ts DESC, p.event_id DESC LIMIT 1), -1.0) AS last_purchase_value
      |FROM events e WHERE e.event_type = 'error' ORDER BY e.event_id""".stripMargin

  /** As-of join bounded by staleness: each error event gets the user's
    * last purchase value only if that purchase is at most 1 hour old —
    * the freshness-gated enrichment every TSDB needs (stale sensor reads
    * must not leak into features).
    */
  def q66(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase").select("user_id", "ts", "event_id", "value")
    TimeSeriesOps
      .asOfJoinWithin(errors, purchases, "user_id", "ts", "ts", "event_id", Map("value" -> "pv"), 3600L)
      .select(col("event_id"), col("user_id"), col("ts"), coalesce(col("pv"), lit(-1.0)).as("fresh_purchase_value"))
      .orderBy(col("event_id"))
  }

  val q66Sql: String =
    """SELECT e.event_id, e.user_id, e.ts,
      |  coalesce((SELECT p.value FROM events p
      |            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
      |              AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 1 HOUR
      |            ORDER BY p.ts DESC, p.event_id DESC LIMIT 1), -1.0) AS fresh_purchase_value
      |FROM events e WHERE e.event_type = 'error' ORDER BY e.event_id""".stripMargin

  /** Gap-fill: dense (user, day) scaffold over each user's active span,
    * zero-filled (sequence+explode stays on executors).
    */
  def q19(s: SparkSession, d: String): DataFrame =
    TimeSeriesOps
      .gapFillDaily(
        Tables.events(s, d),
        "user_id",
        "ts",
        Seq(count(lit(1)).as("n0"), Det.r2(sum(col("value"))).as("sv0")))
      .select(
        col("user_id"),
        col("day"),
        coalesce(col("n0"), lit(0L)).as("n_events"),
        coalesce(col("sv0"), lit(0.0)).as("sum_value"))
      .orderBy(col("user_id"), col("day"))

  val q19Sql: String =
    s"""WITH daily AS (
       |  SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n0,
       |    ${Det.sqlR("sum(value)", 2)} AS sv0
       |  FROM events GROUP BY user_id, day),
       |spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
       |scaffold AS (
       |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM spans)
       |SELECT s.user_id, s.day, coalesce(dl.n0, 0) AS n_events, coalesce(dl.sv0, 0.0) AS sum_value
       |FROM scaffold s LEFT JOIN daily dl ON s.user_id = dl.user_id AND s.day = dl.day
       |ORDER BY s.user_id, s.day""".stripMargin

  /** Sessionize with a 30-minute inactivity gap, then per-session rollup. */
  def q20(s: SparkSession, d: String): DataFrame =
    TimeSeriesOps
      .sessionize(Tables.events(s, d), "user_id", "ts", "event_id", 30)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      .orderBy(col("user_id"), col("session_id"))

  val q20Sql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |f AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END AS brk
      |  FROM e),
      |g AS (
      |  SELECT user_id, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM f)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
      |  min(ts) AS t0, max(ts) AS t1
      |FROM g GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** Last-write-wins compaction per key — the KV upsert semantic of the
    * reference (`internal/storage/hot.go:50-60`) as a distributed query.
    */
  def q21(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    Tables
      .events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("value").as("last_value"), col("ts").as("last_ts"))
      .orderBy(col("user_id"))
  }

  val q21Sql: String =
    """SELECT user_id, value AS last_value, ts AS last_ts FROM (
      |  SELECT user_id, value, ts,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Point lookup through the KV view of a dimension table — the
    * reference's `ReadKey` (`engine.go:139-173`) as a pushed-down scan.
    */
  def q22(s: SparkSession, d: String): DataFrame =
    Tables
      .nation(s, d)
      .select(col("n_name").as("key"), col("n_nationkey").cast("string").as("value"))
      .filter(col("key") === "NATION_7")

  val q22Sql: String =
    """SELECT n_name AS key, CAST(n_nationkey AS VARCHAR) AS value
      |FROM nation WHERE n_name = 'NATION_7'""".stripMargin

  /** Rate of change per user: Δvalue/Δseconds between consecutive events
    * (both deltas from the same lag window — identical doubles on both
    * engines, so the quotient is deterministic).
    */
  def q52(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables
      .events(s, d)
      .withColumn("dv", col("value") - lag(col("value"), 1).over(w))
      .withColumn("dt_s", (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))) / 1000000.0)
      .filter(col("dv").isNotNull && col("dt_s") > 0.0)
      .select(col("user_id"), col("event_id"), Det.r6(col("dv") / col("dt_s")).as("rate"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q52Sql: String =
    s"""WITH w AS (
       |  SELECT user_id, event_id,
       |    value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv,
       |    (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) / 1000000.0 AS dt_s
       |  FROM events)
       |SELECT user_id, event_id, ${Det.sqlR("dv / dt_s", 6)} AS rate
       |FROM w WHERE dv IS NOT NULL AND dt_s > 0.0 ORDER BY user_id, event_id""".stripMargin

  /** OHLC downsample per (user, day): open/close via ranked windows
    * (deterministic ties on event_id), high/low/volume via plain
    * aggregation — the classic financial-TSDB rollup.
    */
  def q53(s: SparkSession, d: String): DataFrame = {
    val dayCol = date_trunc("day", col("ts"))
    val asc = Window.partitionBy(col("user_id"), dayCol).orderBy(col("ts"), col("event_id"))
    val desc = Window.partitionBy(col("user_id"), dayCol).orderBy(col("ts").desc, col("event_id").desc)
    Tables
      .events(s, d)
      .withColumn("day", dayCol)
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy(col("user_id"), col("day"))
      .agg(
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("volume"))
      .orderBy(col("user_id"), col("day"))
  }

  val q53Sql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value,
      |    row_number() OVER (PARTITION BY user_id, date_trunc('day', ts) ORDER BY ts, event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY user_id, date_trunc('day', ts) ORDER BY ts DESC, event_id DESC) AS rn_d
      |  FROM events)
      |SELECT user_id, day,
      |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
      |  max(value) AS high, min(value) AS low,
      |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
      |  count(*) AS volume
      |FROM e GROUP BY user_id, day ORDER BY user_id, day""".stripMargin

  /** Gap-fill with linear interpolation over the daily max series: missing
    * days get prev + (next-prev)·elapsed/gap; boundary gaps carry the edge
    * value. (Daily max keeps the series value FP-exact on both engines.)
    */
  def q54(s: SparkSession, d: String): DataFrame =
    TimeSeriesOps
      .gapFillInterpolateDaily(Tables.events(s, d), "user_id", "ts", max(col("value")))
      .select(
        col("user_id"),
        col("day"),
        coalesce(col("v"), lit(-1.0)).as("v_raw"),
        Det.r6(col("v_interp")).as("v_interp"))
      .orderBy(col("user_id"), col("day"))

  val q54Sql: String =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, max(value) AS v
       |  FROM events GROUP BY user_id, day),
       |spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
       |scaffold AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM spans),
       |j AS (SELECT s.user_id, s.day, dl.v
       |      FROM scaffold s LEFT JOIN daily dl ON s.user_id = dl.user_id AND s.day = dl.day),
       |f AS (SELECT user_id, day, v,
       |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
       |  last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
       |  first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
       |  first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
       |  FROM j)
       |SELECT user_id, day, coalesce(v, -1.0) AS v_raw,
       |  ${Det.sqlR(
        """CASE WHEN v IS NOT NULL THEN v
          |       WHEN pv IS NULL THEN nv
          |       WHEN nv IS NULL THEN pv
          |       ELSE pv + (nv - pv) * CAST(epoch_us(day) - epoch_us(pd) AS DOUBLE) / CAST(epoch_us(nd) - epoch_us(pd) AS DOUBLE)
          |  END""".stripMargin,
        6)} AS v_interp
       |FROM f ORDER BY user_id, day""".stripMargin

  /** Final EWMA (α=0.2) per user — a sequential recurrence expressed as a
    * deterministic left fold over the time-ordered value array
    * (`aggregate` HOF in Spark, `list_reduce` in DuckDB; both seed with the
    * first element and apply 0.2·v + 0.8·acc in identical order). Per-key
    * arrays are bounded by series length — the same per-key-state budget
    * any stateful TSDB op carries.
    */
  def q57(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy(col("user_id"))
      .agg(
        expr("transform(array_sort(collect_list(struct(ts, event_id, value))), p -> p.value)").as("vals"),
        count(lit(1)).as("n"))
      .withColumn(
        "ewma",
        Det.r6(expr("aggregate(slice(vals, 2, size(vals) - 1), vals[0], (acc, v) -> 0.2D * v + 0.8D * acc)")))
      .select(col("user_id"), col("n"), col("ewma"))
      .orderBy(col("user_id"))

  val q57Sql: String =
    s"""SELECT user_id, count(*) AS n,
       |  ${Det.sqlR(
        "list_reduce(list(value ORDER BY ts, event_id), (acc, v) -> 0.2::DOUBLE * v + 0.8::DOUBLE * acc)",
        6)} AS ewma
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // -- q122: Holt double-exponential smoothing (level + trend) ----------

  /** Holt's linear-trend smoothing per user series (α = 0.2, β = 0.1):
    * the 2-component recursion l_t = αv + (1−α)(l+b), b_t = β(l_t−l) +
    * (1−β)b folded sequentially with a STRUCT accumulator — q57's
    * deterministic-fold technique generalized from a scalar to a state
    * vector (Spark `aggregate` with named_struct ↔ DuckDB `list_reduce`
    * over structs, identical arithmetic shape so the trajectories agree
    * bit-for-bit before the r6 snap). Output includes the one-step
    * forecast l+b — the TSDB "where is this series heading" readout.
    * Per-user state is the user's own history, the same bound as q57.
    */
  def q122(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy(col("user_id"))
      .agg(
        expr("transform(array_sort(collect_list(struct(ts, event_id, value))), p -> p.value)").as("vals"),
        count(lit(1)).as("n"))
      .withColumn(
        "hw",
        expr(
          """aggregate(
            |  slice(vals, 2, size(vals) - 1),
            |  named_struct('l', vals[0], 'b', CAST(0.0 AS DOUBLE)),
            |  (acc, v) -> named_struct(
            |    'l', 0.2D * v + 0.8D * (acc.l + acc.b),
            |    'b', 0.1D * ((0.2D * v + 0.8D * (acc.l + acc.b)) - acc.l) + 0.9D * acc.b))""".stripMargin))
      .select(
        col("user_id"),
        col("n"),
        Det.r6(col("hw.l")).as("level"),
        Det.r6(col("hw.b")).as("trend"),
        Det.r6(col("hw.l") + col("hw.b")).as("forecast_1"))
      .orderBy(col("user_id"))

  /** Oracle note: the accumulator is a 2-element LIST, not a struct —
    * DuckDB's list_reduce builds a struct accumulator field-by-field, so a
    * 'b' expression referencing acc.l would see the already-updated level
    * (verified empirically); list construction is atomic.
    */
  val q122Sql: String =
    s"""WITH f AS (
       |  SELECT user_id, count(*) AS n,
       |    list_reduce(
       |      list_transform(list(value ORDER BY ts, event_id),
       |                     x -> [CAST(x AS DOUBLE), 0.0::DOUBLE]),
       |      (acc, v) -> [0.2::DOUBLE * v[1] + 0.8::DOUBLE * (acc[1] + acc[2]),
       |                   0.1::DOUBLE * ((0.2::DOUBLE * v[1] + 0.8::DOUBLE * (acc[1] + acc[2])) - acc[1])
       |                   + 0.9::DOUBLE * acc[2]]) AS hw
       |  FROM events GROUP BY user_id)
       |SELECT user_id, n,
       |  ${Det.sqlR("hw[1]", 6)} AS level,
       |  ${Det.sqlR("hw[2]", 6)} AS trend,
       |  ${Det.sqlR("hw[1] + hw[2]", 6)} AS forecast_1
       |FROM f ORDER BY user_id""".stripMargin

  /** Hour-of-day seasonal decomposition per event type: the hourly mean
    * series (q112's base) folded onto the 24-hour clock — seasonal
    * component = mean over days per (type, hour-of-day), residual spread =
    * stddev around it. After the r6 snap the hourly means are EXACT
    * multiples of 1e-6, so all cross-day sums run on integers (micro-unit
    * BIGINTs; Spark's ANSI sum would error loudly on overflow, headroom
    * ~1e4× the fixture's value scale) and only the final ratio/sqrt touch
    * floats — aggregation order cannot move the output. Two hash shuffles
    * (hourly, then 24-row clock) at any corpus size.
    */
  def q127(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(Det.r6(avg(col("value"))).as("y"))
      .select(
        col("event_type"),
        hour(col("h")).cast("long").as("hod"),
        floor(col("y") * lit(1000000.0) + lit(0.5)).cast("long").as("yi"))
      .groupBy(col("event_type"), col("hod"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("yi")).as("sx"),
        sum(col("yi") * col("yi")).as("sxx"))
      .select(
        col("event_type"),
        col("hod"),
        col("n_days"),
        Det.r6(col("sx").cast("double") / (col("n_days") * lit(1000000.0))).as("seasonal"),
        Det.r6(
          when(
            col("n_days") > 1,
            sqrt(
              (col("sxx").cast("double") - col("sx").cast("double") * col("sx") / col("n_days")) /
                (col("n_days") - 1)) / lit(1000000.0))
            .otherwise(lit(0.0))).as("resid_sd"))
      .orderBy(col("event_type"), col("hod"))

  val q127Sql: String =
    s"""WITH hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h, ${Det.sqlR("avg(value)", 6)} AS y
       |  FROM events GROUP BY event_type, date_trunc('hour', ts)),
       |mu AS (
       |  SELECT event_type, CAST(EXTRACT(hour FROM h) AS BIGINT) AS hod,
       |    CAST(floor(y * 1000000.0 + 0.5) AS BIGINT) AS yi
       |  FROM hourly),
       |ag AS (
       |  SELECT event_type, hod, count(*) AS n_days,
       |    CAST(sum(yi) AS BIGINT) AS sx, CAST(sum(yi * yi) AS BIGINT) AS sxx
       |  FROM mu GROUP BY event_type, hod)
       |SELECT event_type, hod, n_days,
       |  ${Det.sqlR("CAST(sx AS DOUBLE) / (n_days * 1000000.0)", 6)} AS seasonal,
       |  ${Det.sqlR(
        "CASE WHEN n_days > 1 THEN sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n_days) / (n_days - 1)) / 1000000.0 ELSE 0.0 END",
        6)} AS resid_sd
       |FROM ag ORDER BY event_type, hod""".stripMargin

  /** Period-over-period user reconciliation via FULL OUTER join: activity
    * in the first half of the month against the second half — retained /
    * churned / appeared per user. Both aggregates hash on user_id, so the
    * outer join is co-partitioned with its inputs (one exchange each side,
    * reused); the date predicates push to the scan. The one §2.2 join
    * shape (full outer) the registry didn't yet name as a query.
    */
  def q128(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val split = lit("2024-01-16 00:00:00").cast("timestamp")
    val a = ev.filter(col("ts") < split).groupBy(col("user_id")).agg(count(lit(1)).as("n_first"))
    val b = ev.filter(col("ts") >= split).groupBy(col("user_id")).agg(count(lit(1)).as("n_second"))
    a.join(b, Seq("user_id"), "full_outer")
      .select(
        col("user_id"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("n_second"), lit(0L)).as("n_second"),
        when(col("n_second").isNull, lit("churned"))
          .when(col("n_first").isNull, lit("appeared"))
          .otherwise(lit("retained")).as("status"))
      .orderBy(col("user_id"))
  }

  val q128Sql: String =
    s"""WITH a AS (
       |  SELECT user_id, count(*) AS n_first FROM events
       |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY user_id),
       |b AS (
       |  SELECT user_id, count(*) AS n_second FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY user_id)
       |SELECT coalesce(a.user_id, b.user_id) AS user_id,
       |  coalesce(a.n_first, 0) AS n_first,
       |  coalesce(b.n_second, 0) AS n_second,
       |  CASE WHEN b.user_id IS NULL THEN 'churned'
       |       WHEN a.user_id IS NULL THEN 'appeared'
       |       ELSE 'retained' END AS status
       |FROM a FULL JOIN b ON a.user_id = b.user_id
       |ORDER BY user_id""".stripMargin

  /** Grouped statistical aggregates: sample stddev/variance, covariance
    * and Pearson correlation per event type — one hash shuffle with
    * map-side partials (Spark merges per-partition moment sketches, the
    * same shape that holds at 100 TB). Rounded at 4 digits: both engines
    * accumulate moments in double with different merge orders; the noise
    * is ~1e-9 relative, far inside the rounding margin.
    */
  def q65(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        Det.r4(avg(col("value"))).as("mean_v"),
        Det.r4(stddev_samp(col("value"))).as("sd_v"),
        Det.r4(var_samp(col("value"))).as("var_v"),
        Det.r4(covar_samp(col("value"), col("user_id").cast("double"))).as("cov_vu"),
        Det.r4(corr(col("value"), col("user_id").cast("double"))).as("corr_vu"),
        Det.r2(min(col("value"))).as("min_v"),
        Det.r2(max(col("value"))).as("max_v"))
      .orderBy(col("event_type"))

  val q65Sql: String =
    s"""SELECT event_type, count(*) AS n,
       |  ${Det.sqlR("avg(value)", 4)} AS mean_v,
       |  ${Det.sqlR("stddev_samp(value)", 4)} AS sd_v,
       |  ${Det.sqlR("var_samp(value)", 4)} AS var_v,
       |  ${Det.sqlR("covar_samp(value, CAST(user_id AS DOUBLE))", 4)} AS cov_vu,
       |  ${Det.sqlR("corr(value, CAST(user_id AS DOUBLE))", 4)} AS corr_vu,
       |  ${Det.sqlR("min(value)", 2)} AS min_v,
       |  ${Det.sqlR("max(value)", 2)} AS max_v
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -- q76: partition pruning over a day-partitioned events layout ------

  /** Day-partitioned copy of `events` under java.io.tmpdir, written once
    * per (JVM, sf dir). This is the layout investment a 100 TB events
    * table ships with (one directory per day); queries carrying a day
    * predicate then read only the matching directories — pruning happens
    * at planning/file-listing time, before any I/O.
    */
  def eventsByDay(s: SparkSession, d: String): DataFrame = {
    val safe = d.replaceAll("[^A-Za-z0-9._-]", "_")
    val target = s"${System.getProperty("java.io.tmpdir")}/graft_events_by_day/$safe"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(target, "_SUCCESS"))) {
      graft.sources.Sources.writeParquet(
        Tables.events(s, d).withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
        target,
        Seq("day"))
    }
    s.read.parquet(target)
  }

  /** Day-ranged aggregate over the partitioned layout. The day predicate
    * must land in the scan's PartitionFilters (plan-asserted in
    * SourcesSpec): 3 of 30 day directories are listed, the other 27 are
    * never opened.
    */
  def q76(s: SparkSession, d: String): DataFrame =
    eventsByDay(s, d)
      .filter(col("day") >= "2024-01-10" && col("day") <= "2024-01-12")
      .groupBy(col("day").cast("string").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.r2(sum(col("value"))).as("sv"))
      .orderBy(col("day"), col("event_type"))

  val q76Sql: String =
    s"""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       |  CAST(count(*) AS BIGINT) AS n, ${Det.sqlR("sum(value)", 2)} AS sv
       |FROM events
       |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-13 00:00:00'
       |GROUP BY day, event_type ORDER BY day, event_type""".stripMargin

  // -- q82: distribution-rank window family ----------------------------

  /** ntile / percent_rank / cume_dist per event_type over value — the
    * distribution-rank window functions (row_number/rank/lag/lead live in
    * q04/q15–q17). Ties broken by event_id so ranks are total-order
    * deterministic on both engines; percent_rank/cume_dist are exact
    * rationals (k/n) in double, identical cross-engine, r6-snapped anyway.
    *
    * Scale note: exact distribution ranks REQUIRE the partition's total
    * order — that is their semantics, in every engine; there is no bounded
    * equivalent with identical output (unlike q68's postings cap). When a
    * partition is corpus-sized, the right tool is the mergeable sketch
    * path (q41 exact percentiles at test scale, q71 GK approx at 100 TB),
    * not this operator.
    */
  def q82(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    Tables
      .events(s, d)
      .select(
        col("event_id"),
        col("event_type"),
        ntile(4).over(w).cast("long").as("quartile"),
        Det.r6(percent_rank().over(w)).as("pr"),
        Det.r6(cume_dist().over(w)).as("cd"))
      .orderBy(col("event_id"))
  }

  val q82Sql: String =
    s"""SELECT event_id, event_type,
       |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       |  ${Det.sqlR("percent_rank() OVER w", 6)} AS pr,
       |  ${Det.sqlR("cume_dist() OVER w", 6)} AS cd
       |FROM events
       |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
       |ORDER BY event_id""".stripMargin

  // -- q107: SCD2 temporal dimension build ------------------------------

  /** Slowly-changing-dimension (type 2) build: compact each user's
    * purchase-value updates into validity intervals [valid_from, valid_to)
    * — consecutive identical values extend the open interval instead of
    * opening a new one, the latest interval stays open (valid_to NULL,
    * is_current true). The warehouse-side temporal table every
    * batch-ingested dimension needs; both windows hash on user_id, so the
    * change-detection lag and the interval-closing lead share ONE
    * exchange, and state per user is its update count, never the corpus.
    */
  def q107(s: SparkSession, d: String): DataFrame = {
    // (ts, event_id) tiebreak: duplicate (user_id, ts) purchases would
    // otherwise make change-detection/interval-close order nondeterministic.
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables
      .events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      .withColumn("prev", lag(col("value"), 1).over(w))
      .filter(col("prev").isNull || col("value") =!= col("prev"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(
        col("user_id"),
        col("ts").as("valid_from"),
        col("valid_to"),
        col("value"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  val q107Sql: String =
    """WITH u AS (SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, value, event_id,
      |             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |      FROM u),
      |ch AS (SELECT user_id, ts, value, event_id FROM c WHERE prev IS NULL OR value <> prev)
      |SELECT user_id, ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  value,
      |  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
      |FROM ch ORDER BY user_id, valid_from""".stripMargin

  // -- q130: point-in-time (feature-store) join against the SCD2 dim ----

  /** Point-in-time correctness join — THE training-data operator that
    * prevents feature leakage: every click event is enriched with the
    * purchase-derived feature value that was valid AT ITS TIMESTAMP, via
    * interval containment against q107's SCD2 dimension (never the
    * current value, never a future one). Because the SCD2 intervals tile
    * each user's timeline disjointly (law-tested on q107), each fact row
    * matches at most one interval, so the left join preserves fact
    * cardinality. Plan shape: both sides hash on user_id (one SMJ
    * exchange each), the containment predicate evaluates inside the
    * join — per-user interval lists are dimension-sized, never
    * corpus-sized. The same semantics as the native as-of join (q44), in
    * the interval form warehouses materialize.
    */
  /** The SCD2 feature dimension q130 joins against — extracted so the
    * streaming twin ([[graft.streaming.Streaming.pointInTimeEnrich]]) and
    * the batch query can never drift on interval semantics.
    */
  def scd2FeatureDim(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      .withColumn("prev", lag(col("value"), 1).over(w))
      .filter(col("prev").isNull || col("value") =!= col("prev"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(
        col("user_id").as("du"),
        col("ts").as("valid_from"),
        col("valid_to"),
        col("value").as("feature_value"))
  }

  def q130(s: SparkSession, d: String): DataFrame = {
    val dim = scd2FeatureDim(Tables.events(s, d))
    val fact = Tables
      .events(s, d)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    fact
      .join(
        dim,
        fact("user_id") === dim("du") &&
          dim("valid_from") <= fact("ts") &&
          (dim("valid_to").isNull || fact("ts") < dim("valid_to")),
        "left")
      .select(col("event_id"), col("user_id"), col("ts"), col("feature_value"))
      .orderBy(col("event_id"))
  }

  val q130Sql: String =
    """WITH u AS (SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, value, event_id,
      |             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |      FROM u),
      |ch AS (SELECT user_id, ts, value, event_id FROM c WHERE prev IS NULL OR value <> prev),
      |dim AS (
      |  SELECT user_id AS du, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |    value AS feature_value
      |  FROM ch),
      |f AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click')
      |SELECT f.event_id, f.user_id, f.ts, d.feature_value
      |FROM f LEFT JOIN dim d
      |  ON d.du = f.user_id AND d.valid_from <= f.ts
      |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
      |ORDER BY event_id""".stripMargin

  // -- q111: CDC changelog compaction → current snapshot ----------------

  /** Change-data-capture apply: the event stream as a changelog
    * (purchase = upsert of the user's value, error = delete tombstone),
    * compacted to the current snapshot — the MERGE-into-latest-state
    * every warehouse ingest ends with. One window per user ordered by
    * (ts, event_id): the latest op decides existence, and its value is
    * the state. Per-user state during compaction is one row (a
    * WindowGroupLimit-able rank-1 filter), never the user's history.
    */
  def q111(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables
      .events(s, d)
      .filter(col("event_type").isin("purchase", "error"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("as_of"), col("value"))
      .orderBy(col("user_id"))
  }

  val q111Sql: String =
    """WITH ops AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE event_type IN ('purchase', 'error'))
      |SELECT user_id, ts AS as_of, value
      |FROM ops WHERE rn = 1 AND event_type = 'purchase'
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q122_holt_trend" -> (q122 _),
    "q127_seasonal_decomposition" -> (q127 _),
    "q128_fullouter_churn" -> (q128 _),
    "q130_point_in_time_join" -> (q130 _),
    "q111_cdc_snapshot" -> (q111 _),
    "q107_scd2_intervals" -> (q107 _),
    "q82_rank_distribution" -> (q82 _),
    "q76_partition_pruned_days" -> (q76 _),
    "q65_grouped_stats" -> (q65 _),
    "q66_asof_within" -> (q66 _),
    "q52_rate_of_change" -> (q52 _),
    "q54_gapfill_interpolate" -> (q54 _),
    "q57_ewma" -> (q57 _),
    "q53_ohlc_downsample" -> (q53 _),
    "q13_hourly_downsample" -> (q13 _),
    "q14_daily_user_downsample" -> (q14 _),
    "q15_running_sum" -> (q15 _),
    "q16_delta" -> (q16 _),
    "q17_topk_events_per_type" -> (q17 _),
    "q18_asof_join" -> (q18 _),
    "q19_gapfill_daily" -> (q19 _),
    "q20_sessionize" -> (q20 _),
    "q21_kv_last_write_wins" -> (q21 _),
    "q22_kv_point_lookup" -> (q22 _))

  val oracles: Map[String, String] = Map(
    "q122_holt_trend" -> q122Sql,
    "q127_seasonal_decomposition" -> q127Sql,
    "q128_fullouter_churn" -> q128Sql,
    "q130_point_in_time_join" -> q130Sql,
    "q111_cdc_snapshot" -> q111Sql,
    "q107_scd2_intervals" -> q107Sql,
    "q82_rank_distribution" -> q82Sql,
    "q76_partition_pruned_days" -> q76Sql,
    "q65_grouped_stats" -> q65Sql,
    "q66_asof_within" -> q66Sql,
    "q52_rate_of_change" -> q52Sql,
    "q54_gapfill_interpolate" -> q54Sql,
    "q57_ewma" -> q57Sql,
    "q53_ohlc_downsample" -> q53Sql,
    "q13_hourly_downsample" -> q13Sql,
    "q14_daily_user_downsample" -> q14Sql,
    "q15_running_sum" -> q15Sql,
    "q16_delta" -> q16Sql,
    "q17_topk_events_per_type" -> q17Sql,
    "q18_asof_join" -> q18Sql,
    "q19_gapfill_daily" -> q19Sql,
    "q20_sessionize" -> q20Sql,
    "q21_kv_last_write_wins" -> q21Sql,
    "q22_kv_point_lookup" -> q22Sql)
}
