package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}
import graft.functions.Aggregators

/** Second-wave operator coverage: cube, intersect, distinct aggregation,
  * typed custom aggregators, banded range joins, percentiles, and the
  * remaining dimension tables (part, supplier).
  */
object Extended {

  type Q = (SparkSession, String) => DataFrame

  /** CUBE over two order dimensions (all four grouping sets). */
  def q36(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), Det.r2(sum(col("o_totalprice"))).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        col("cnt"),
        col("sum_price"))
      .orderBy(col("st"), col("pri"))

  val q36Sql: String =
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS st, coalesce(o_orderpriority, 'ALL') AS pri,
       |  count(*) AS cnt, ${Det.sqlR("sum(o_totalprice)", 2)} AS sum_price
       |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY st, pri""".stripMargin

  /** INTERSECT (distinct): nations having both customers and suppliers. */
  def q37(s: SparkSession, d: String): DataFrame =
    Tables
      .customer(s, d)
      .select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  val q37Sql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin

  /** Multi-column distinct aggregation (expand-based two-phase plan). */
  def q38(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  val q38Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Time-weighted average value per user via the typed [[Aggregators.WeightedMean]]
    * (udaf-wrapped): weight = seconds until the next event of the same user;
    * the last event of each user carries no weight.
    */
  def q39(s: SparkSession, d: String): DataFrame = {
    val wmean = udaf(new Aggregators.WeightedMean())
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables
      .events(s, d)
      .withColumn("dt", (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts"))) / 1000000.0)
      .filter(col("dt").isNotNull)
      .groupBy(col("user_id"))
      .agg(Det.r6(wmean(col("value"), col("dt"))).as("twa"))
      .orderBy(col("user_id"))
  }

  val q39Sql: String =
    s"""WITH w AS (
       |  SELECT user_id, value,
       |    (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - epoch_us(ts)) / 1000000.0 AS dt
       |  FROM events)
       |SELECT user_id,
       |  ${Det.sqlR("CASE WHEN sum(dt) > 0 THEN sum(value*dt)/sum(dt) ELSE 0.0 END", 6)} AS twa
       |FROM w WHERE dt IS NOT NULL GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Range join, banded: purchases in the hour before each error event.
    * Instead of an O(n·m) theta join, both sides bucket by hour and join on
    * (user, bucket) over the two candidate buckets — the standard interval-
    * join decomposition that stays an equi-join (hash shuffle) at any scale.
    */
  def q40(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val err = ev
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("u"), col("ts").as("ets"))
      .withColumn("eh", expr("unix_micros(ets) div 3600000000"))
      .withColumn("ph", explode(array(col("eh") - 1, col("eh"))))
    val pur = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("u"), col("ts").as("pts"))
      .withColumn("ph", expr("unix_micros(pts) div 3600000000"))
    err
      .join(pur, Seq("u", "ph"), "left")
      .withColumn(
        "hit",
        col("pts").isNotNull &&
          col("pts") > col("ets") - expr("interval 1 hour") && col("pts") <= col("ets"))
      .groupBy(col("event_id"))
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("n_purch"))
      .orderBy(col("event_id"))
  }

  val q40Sql: String =
    """SELECT e.event_id,
      |  (SELECT count(*) FROM events p
      |   WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
      |     AND p.ts > e.ts - INTERVAL 1 HOUR AND p.ts <= e.ts) AS n_purch
      |FROM events e WHERE e.event_type = 'error' ORDER BY e.event_id""".stripMargin

  /** Exact interpolated percentiles per event type (median + p90). */
  def q41(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy(col("event_type"))
      .agg(
        Det.r6(expr("percentile(value, 0.5)")).as("p50"),
        Det.r6(expr("percentile(value, 0.9)")).as("p90"),
        count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))

  val q41Sql: String =
    s"""SELECT event_type,
       |  ${Det.sqlR("quantile_cont(value, 0.5)", 6)} AS p50,
       |  ${Det.sqlR("quantile_cont(value, 0.9)", 6)} AS p90,
       |  count(*) AS cnt
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Approximate percentiles by deterministic uniform sampling: keep the
    * rows whose 60-bit event_id hash lands in 1-of-5 residue classes (a
    * 20% sample with no RNG and no shuffle — the filter is a scan-level
    * predicate), then exact interpolated percentiles on the sample. This
    * is the classic sampling estimator for quantiles: at 100 TB the sample
    * rate drops with corpus size while the per-group sort stays bounded,
    * and unlike GK/t-digest the whole pipeline is SQL-expressible, so the
    * DuckDB oracle replays it end to end. The GK sketch
    * (`approx_percentile`) remains law-tested in `QueriesSpec` as the
    * alternative bounded-memory path.
    */
  def q71(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .filter(pmod(graft.functions.Text.hash60(col("event_id").cast("string")), lit(5)) === 0)
      .groupBy(col("event_type"))
      .agg(
        Det.r6(expr("percentile(value, 0.5)")).as("sp50"),
        Det.r6(expr("percentile(value, 0.9)")).as("sp90"),
        count(lit(1)).as("sample_cnt"))
      .orderBy(col("event_type"))

  val q71Sql: String =
    s"""SELECT event_type,
       |  ${Det.sqlR("quantile_cont(value, 0.5)", 6)} AS sp50,
       |  ${Det.sqlR("quantile_cont(value, 0.9)", 6)} AS sp90,
       |  count(*) AS sample_cnt
       |FROM events
       |WHERE ${graft.functions.Text.sqlHash60("CAST(event_id AS VARCHAR)")} % 5 = 0
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Fact ⋈ part dimension: revenue by brand (AQE picks broadcast while the
    * dimension fits, shuffled hash beyond).
    */
  def q42(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        Det.r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"),
        Det.r2(sum(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("cnt"))
      .orderBy(col("p_brand"))
  }

  val q42Sql: String =
    s"""SELECT p_brand, ${Det.sqlR("sum(l_extendedprice*(1-l_discount))", 4)} AS revenue,
       |  ${Det.sqlR("sum(l_quantity)", 2)} AS sum_qty, count(*) AS cnt
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Supplier stats per nation with a post-aggregation filter (HAVING). */
  def q43(s: SparkSession, d: String): DataFrame = {
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    sup
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_supp"),
        Det.r2(sum(col("s_acctbal"))).as("sum_bal"),
        Det.r2(min(col("s_acctbal"))).as("min_bal"),
        Det.r2(max(col("s_acctbal"))).as("max_bal"))
      .filter(col("n_supp") > 1)
      .orderBy(col("n_name"))
  }

  val q43Sql: String =
    s"""SELECT n_name, count(*) AS n_supp, ${Det.sqlR("sum(s_acctbal)", 2)} AS sum_bal,
       |  ${Det.sqlR("min(s_acctbal)", 2)} AS min_bal, ${Det.sqlR("max(s_acctbal)", 2)} AS max_bal
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY n_name HAVING count(*) > 1 ORDER BY n_name""".stripMargin

  /** Same as-of semantics as q18, but through the native Catalyst operator
    * ([[graft.plans.AsOfJoin]]: custom LogicalPlan + Strategy + sort-merge
    * exec) instead of the union+window formulation — both must match the
    * identical oracle.
    */
  def q44(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_uid"),
        col("ts").as("p_ts"),
        col("event_id").as("p_eid"),
        col("value").as("pv"))
    graft.plans.AsOfJoin
      .join(errors, purchases, "user_id", "p_uid", "ts", "p_ts", "p_eid")
      .select(
        col("event_id"),
        col("user_id"),
        col("ts"),
        coalesce(col("pv"), lit(-1.0)).as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** UNION ALL + per-branch tagging across two dimension tables. */
  def q45(s: SparkSession, d: String): DataFrame =
    Tables
      .customer(s, d)
      .select(col("c_nationkey").cast("long").as("nationkey"), lit("customer").as("kind"))
      .unionByName(
        Tables.supplier(s, d).select(col("s_nationkey").cast("long").as("nationkey"), lit("supplier").as("kind")))
      .groupBy(col("nationkey"), col("kind"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"), col("kind"))

  val q45Sql: String =
    """SELECT nationkey, kind, count(*) AS n FROM (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, 'customer' AS kind FROM customer
      |  UNION ALL
      |  SELECT CAST(s_nationkey AS BIGINT) AS nationkey, 'supplier' AS kind FROM supplier) t
      |GROUP BY nationkey, kind ORDER BY nationkey, kind""".stripMargin

  /** Wider string-function coverage (trim/pad/replace/reverse/instr). */
  def q46(s: SparkSession, d: String): DataFrame =
    Tables
      .part(s, d)
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "a", "@").as("masked"),
        lpad(col("p_brand"), 12, "_").as("padded"),
        trim(col("p_type")).as("trimmed"),
        reverse(col("p_brand")).as("revd"),
        instr(col("p_name"), "e").cast("long").as("epos"),
        substring_index(col("p_type"), " ", 1).as("first_word"),
        repeat(col("p_brand"), 2).as("doubled"))
      .orderBy(col("p_partkey"))

  val q46Sql: String =
    """SELECT p_partkey,
      |  regexp_replace(p_name, 'a', '@', 'g') AS masked,
      |  lpad(p_brand, 12, '_') AS padded,
      |  trim(p_type) AS trimmed,
      |  reverse(p_brand) AS revd,
      |  CAST(strpos(p_name, 'e') AS BIGINT) AS epos,
      |  split_part(p_type, ' ', 1) AS first_word,
      |  repeat(p_brand, 2) AS doubled
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Range-frame moving window (trailing 1 hour per user) + rank functions
    * — RANGE frames over an epoch-micros ordering work identically on both
    * engines.
    */
  def q47(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("em"))
    val hourFrame = byUser.rangeBetween(-3600000000L, 0L)
    val rankW = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    Tables
      .events(s, d)
      .withColumn("em", unix_micros(col("ts")))
      .withColumn("mv_sum", Det.r2(sum(col("value")).over(hourFrame)))
      .withColumn("mv_n", count(lit(1)).over(hourFrame))
      .withColumn("rk", rank().over(rankW).cast("long"))
      .select(col("user_id"), col("event_id"), col("mv_sum"), col("mv_n"), col("rk"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q47Sql: String =
    s"""WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS em FROM events)
       |SELECT user_id, event_id,
       |  ${Det.sqlR(
        "sum(value) OVER (PARTITION BY user_id ORDER BY em RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)",
        2)} AS mv_sum,
       |  count(*) OVER (PARTITION BY user_id ORDER BY em RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS mv_n,
       |  CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rk
       |FROM e ORDER BY user_id, event_id""".stripMargin

  /** HyperLogLog cardinality from scratch, oracle-checked. The md5-derived
    * 60-bit hash splits into an 8-bit register index (last 2 hex chars)
    * and a 52-bit pattern (first 13 hex chars); rho (leading-zero run + 1)
    * is read off the HEX STRING (strip leading '0' chars, classify the
    * first nonzero digit) — zero floating-point in the register path, so
    * Spark and DuckDB agree bit-for-bit where `floor(log2(w))` could
    * misround across libm implementations. Register sums run in the
    * INTEGER domain (sum of 2^(53-rho) ≤ 2^61) so aggregation order can't
    * perturb the estimate. Scale story = the real HLL one: per-group state
    * is 256 registers regardless of input size, partials merge by max, and
    * both aggregations are map-side combinable. `approx_count_distinct`
    * (Spark's native HLL++) stays law-tested in `QueriesSpec`.
    */
  def q48(s: SparkSession, d: String): DataFrame = {
    val m = 256
    val alphaM2 = 0.7213 / (1 + 1.079 / m) * m * m // spliced as one literal in both engines
    val two53 = 9007199254740992L // 2^53
    val hex = md5(col("l_partkey").cast("string"))
    val stripped = ltrim(substring(hex, 1, 13), "0")
    val firstDigit = substring(stripped, 1, 1)
    val bits = when(firstDigit.isin("8", "9", "a", "b", "c", "d", "e", "f"), 4)
      .when(firstDigit.isin("4", "5", "6", "7"), 3)
      .when(firstDigit.isin("2", "3"), 2)
      .otherwise(1)
    val rho = when(length(stripped) === 0, lit(53))
      .otherwise(lit(4) * (lit(13) - length(stripped)) + (lit(4) - bits) + lit(1))
    Tables
      .lineitem(s, d)
      .select(
        col("l_returnflag"),
        conv(substring(hex, 14, 2), 16, 10).cast("int").as("bucket"),
        rho.as("rho"))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(max(col("rho")).as("r"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("nz"),
        sum(expr("CAST(power(2.0, 53 - r) AS BIGINT)")).as("sp"))
      .select(
        col("l_returnflag"),
        Det.r4(
          when(
            lit(alphaM2) / ((col("sp") + (lit(m.toLong) - col("nz")) * lit(two53)).cast("double") / lit(two53.toDouble)) <= lit(2.5 * m)
              && col("nz") < lit(m.toLong),
            lit(m.toDouble) * log(lit(m.toDouble) / (lit(m.toLong) - col("nz"))))
            .otherwise(
              lit(alphaM2) / ((col("sp") + (lit(m.toLong) - col("nz")) * lit(two53)).cast("double") / lit(two53.toDouble))))
          .as("hll_parts"),
        col("nz").as("buckets_used"))
      .orderBy(col("l_returnflag"))
  }

  val q48Sql: String = {
    val alphaM2 = (0.7213 / (1 + 1.079 / 256) * 256 * 256).toString
    val hex = "md5(CAST(l_partkey AS VARCHAR))"
    val raw = s"$alphaM2 / (CAST(sp + (256 - nz) * 9007199254740992 AS DOUBLE) / 9007199254740992.0)"
    s"""WITH rows_h AS (
       |  SELECT l_returnflag,
       |    CAST(('0x' || substr($hex, 14, 2)) AS BIGINT) AS bucket,
       |    ltrim(substr($hex, 1, 13), '0') AS stripped
       |  FROM lineitem),
       |regs AS (
       |  SELECT l_returnflag, bucket,
       |    max(CASE WHEN length(stripped) = 0 THEN 53
       |        ELSE 4 * (13 - length(stripped))
       |          + (4 - (CASE WHEN substr(stripped, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 4
       |                       WHEN substr(stripped, 1, 1) IN ('4','5','6','7') THEN 3
       |                       WHEN substr(stripped, 1, 1) IN ('2','3') THEN 2
       |                       ELSE 1 END)) + 1 END) AS r
       |  FROM rows_h GROUP BY l_returnflag, bucket),
       |grp AS (
       |  SELECT l_returnflag, count(*) AS nz,
       |    sum(CAST(power(2.0, 53 - r) AS BIGINT)) AS sp
       |  FROM regs GROUP BY l_returnflag)
       |SELECT l_returnflag,
       |  ${Det.sqlR(s"CASE WHEN $raw <= 640.0 AND nz < 256 THEN 256.0 * ln(256.0 / (256 - nz)) ELSE $raw END", 4)} AS hll_parts,
       |  nz AS buckets_used
       |FROM grp ORDER BY l_returnflag""".stripMargin
  }

  /** Map/JSON surface: parse props into a typed map, expose keys,
    * cardinality, and a looked-up value (stringified columns keep the
    * cross-engine schema simple).
    */
  def q50(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .select(
        col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")).as("m"))
      .select(
        col("event_id"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("keys"),
        size(col("m")).cast("long").as("n_keys"),
        element_at(col("m"), "k").as("k_val"))
      .orderBy(col("event_id"))

  val q50Sql: String =
    """SELECT event_id,
      |  array_to_string(list_sort(json_keys(props)), ',') AS keys,
      |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
      |FROM events ORDER BY event_id""".stripMargin

  /** Array aggregation: sorted distinct collection per group (collect_set
    * is order-nondeterministic — the sort restores a total order for the
    * oracle). The array is stringified for the compare: the driver's
    * hash-compare can't hash list cells (numpy arrays are unhashable), so
    * both engines emit the canonical comma-joined form.
    */
  def q51(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy(col("event_type"))
      .agg(
        concat_ws(",", array_sort(collect_set(col("user_id").cast("string")))).as("users"),
        size(collect_set(col("user_id"))).cast("long").as("n_users"))
      .orderBy(col("event_type"))

  val q51Sql: String =
    """SELECT event_type,
      |  array_to_string(list_sort(list(DISTINCT CAST(user_id AS VARCHAR))), ',') AS users,
      |  CAST(len(list(DISTINCT user_id)) AS BIGINT) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Pivot: one column per event type (explicit value list keeps the
    * output schema static — mandatory at scale, where an inferred pivot
    * would scan for distinct values first).
    */
  def q55(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = Tables
      .events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .count()
    types
      .foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy(col("user_id"))
  }

  val q55Sql: String =
    """SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'click') AS click,
      |  count(*) FILTER (WHERE event_type = 'error') AS error,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** The SQL interface, verified end-to-end: this exact string executes on
    * BOTH engines — Spark runs it over the [[graft.core.Catalog]] temp
    * views, DuckDB runs it as the oracle. One dialect-portable text, two
    * engines, one hash.
    */
  val q61SharedSql: String =
    """WITH daily AS (
      |  SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n,
      |    floor(sum(value)*100+0.5)/100 AS sv
      |  FROM events GROUP BY user_id, date_trunc('day', ts))
      |SELECT user_id, CAST(count(*) AS BIGINT) AS active_days,
      |  floor(sum(sv)*100+0.5)/100 AS total,
      |  CAST(max(n) AS BIGINT) AS busiest_day_events
      |FROM daily GROUP BY user_id ORDER BY user_id""".stripMargin

  def q61(s: SparkSession, d: String): DataFrame = {
    graft.core.Catalog.registerAll(s, d)
    s.sql(q61SharedSql)
  }

  /** TPC-H Q17-style correlated SCALAR subquery (per-part average-quantity
    * threshold), dialect-portable and run verbatim on both engines.
    * Exercises Catalyst's decorrelation: the optimizer must rewrite the
    * per-row subquery into an aggregate-then-join — plan-asserted in
    * QueriesSpec (no ScalarSubquery survives optimization; a naive
    * engine would re-run the inner aggregate per probe row, which at
    * 100 TB is a full lineitem scan per lineitem row).
    *
    * Determinism: l_quantity is integral so avg() is exact in double on
    * both engines (no summation-order sensitivity below the comparison);
    * the revenue sum is 2-decimal data rounded portably at r2.
    */
  val q75SharedSql: String =
    """SELECT p.p_brand,
      |  floor(sum(l.l_extendedprice)*100+0.5)/100 AS small_qty_revenue,
      |  CAST(count(*) AS BIGINT) AS n_small
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand IN ('Brand#12', 'Brand#23')
      |  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
      |                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin

  def q75(s: SparkSession, d: String): DataFrame = {
    graft.core.Catalog.registerAll(s, d)
    s.sql(q75SharedSql)
  }

  /** TPC-H Q21-shape: correlated EXISTS + NOT EXISTS against the same
    * fact table (sole-blame suppliers — the only supplier with a returned
    * line in a multi-supplier 'F' order). Exercises Catalyst's rewrite of
    * both subqueries into left-semi and left-anti joins on the
    * correlation key (plan-asserted in QueriesSpec): a naive engine would
    * rescan lineitem per probe row; the decorrelated plan is two hash
    * joins on l_orderkey. Counts only — no float anywhere.
    */
  val q120SharedSql: String =
    """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s.s_name""".stripMargin

  def q120(s: SparkSession, d: String): DataFrame = {
    graft.core.Catalog.registerAll(s, d)
    s.sql(q120SharedSql)
  }

  /** TPC-H Q20-shape: nested IN chains with a correlated scalar aggregate
    * in the HAVING clause (suppliers concentrating >50% of a tracked
    * part's shipped quantity). Three levels of decorrelation in one
    * query; l_quantity is integral so every sum is exact — no rounding
    * anywhere.
    */
  val q121SharedSql: String =
    """SELECT s.s_name
      |FROM supplier s
      |WHERE s.s_suppkey IN (
      |  SELECT l.l_suppkey FROM lineitem l
      |  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%green%')
      |  GROUP BY l.l_suppkey, l.l_partkey
      |  HAVING sum(l.l_quantity) > (
      |    SELECT 0.5 * sum(l2.l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = l.l_partkey))
      |ORDER BY s.s_name""".stripMargin

  def q121(s: SparkSession, d: String): DataFrame = {
    graft.core.Catalog.registerAll(s, d)
    s.sql(q121SharedSql)
  }

  /** Salted hot-key join, oracle-checked. The fact side gets a synthetic
    * pathological key (90% of lineitem collapses onto hk=0 — the shape AQE
    * skew-split alone can't always save when one logical key exceeds an
    * executor); [[graft.operators.Skew.saltedJoin]] spreads it over 16
    * salt buckets. The salt changes the DISTRIBUTION, never the result, so
    * the oracle is the plain join — correctness of the mitigation is
    * exactly "salted == unsalted", verified by hash. Partition-balance
    * evidence lives in SkewSpec; numbers in [[graft.operators.Skew]] docs.
    */
  def q77(s: SparkSession, d: String): DataFrame = {
    val fact = Tables
      .lineitem(s, d)
      .select(
        when(col("l_orderkey") % 10 < 9, lit(0L))
          .otherwise(col("l_orderkey") % 97)
          .as("hk"),
        col("l_extendedprice"))
    val dim = s
      .range(0, 97)
      .select(col("id").as("hk"), concat(lit("seg_"), (col("id") % 7).cast("string")).as("segment"))
    graft.operators.Skew
      .saltedJoin(fact, dim, "hk", buckets = 16)
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), Det.r2(sum(col("l_extendedprice"))).as("rev"))
      .orderBy(col("segment"))
  }

  val q77Sql: String =
    s"""WITH fact AS (
       |  SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0 ELSE l_orderkey % 97 END AS hk,
       |         l_extendedprice
       |  FROM lineitem),
       |dim AS (
       |  SELECT i AS hk, 'seg_' || CAST(i % 7 AS VARCHAR) AS segment
       |  FROM (SELECT unnest(range(0, 97)) AS i))
       |SELECT segment, CAST(count(*) AS BIGINT) AS n,
       |  ${Det.sqlR("sum(l_extendedprice)", 2)} AS rev
       |FROM fact JOIN dim USING (hk)
       |GROUP BY segment ORDER BY segment""".stripMargin

  /** Explicit GROUPING SETS (the general form rollup/cube specialize),
    * dialect-portable shared SQL with grouping() disambiguating the
    * all-rows stratum from a genuine NULL group.
    */
  val q80SharedSql: String =
    """SELECT
      |  CASE WHEN grouping(event_type) = 0 THEN event_type ELSE 'ALL' END AS etype,
      |  CASE WHEN grouping(ub) = 0 THEN CAST(ub AS STRING) ELSE 'ALL' END AS user_bucket,
      |  CAST(count(*) AS BIGINT) AS n,
      |  floor(sum(value)*100+0.5)/100 AS sv
      |FROM (SELECT event_type, user_id % 10 AS ub, value FROM events) t
      |GROUP BY GROUPING SETS ((event_type), (ub), ())
      |ORDER BY etype, user_bucket""".stripMargin

  def q80(s: SparkSession, d: String): DataFrame = {
    graft.core.Catalog.registerAll(s, d)
    s.sql(q80SharedSql)
  }

  /** Unpivot (melt): wide measure columns → long (measure, value) rows via
    * the native `unpivot` operator (generates a Expand node — one pass,
    * no self-union of four scans), then per-measure aggregates.
    */
  def q95(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure",
        "v")
      .groupBy(col("measure"))
      .agg(
        count(lit(1)).as("n"),
        Det.r2(sum(col("v"))).as("sv"),
        Det.r6(min(col("v"))).as("mn"),
        Det.r6(max(col("v"))).as("mx"))
      .orderBy(col("measure"))

  val q95Sql: String =
    s"""WITH long AS (
       |  SELECT l_orderkey, l_linenumber, measure, v
       |  FROM lineitem
       |  UNPIVOT (v FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax)))
       |SELECT measure, count(*) AS n,
       |  ${Det.sqlR("sum(v)", 2)} AS sv,
       |  ${Det.sqlR("min(v)", 6)} AS mn,
       |  ${Det.sqlR("max(v)", 6)} AS mx
       |FROM long GROUP BY measure ORDER BY measure""".stripMargin

  val queries: Map[String, Q] = Map(
    "q95_unpivot_measures" -> (q95 _),
    "q77_skew_salted_join" -> (q77 _),
    "q80_grouping_sets" -> (q80 _),
    "q44_asof_join_native" -> (q44 _),
    "q50_map_json_functions" -> (q50 _),
    "q51_array_agg" -> (q51 _),
    "q55_pivot" -> (q55 _),
    "q61_shared_sql" -> (q61 _),
    "q75_correlated_scalar_subquery" -> (q75 _),
    "q120_multi_exists_decorrelation" -> (q120 _),
    "q121_nested_in_having" -> (q121 _),
    "q45_union_all_tagged" -> (q45 _),
    "q46_string_functions" -> (q46 _),
    "q47_range_frame_window" -> (q47 _),
    "q48_hll_count_distinct" -> (q48 _),
    "q36_cube_orders" -> (q36 _),
    "q37_intersect_nations" -> (q37 _),
    "q38_distinct_agg" -> (q38 _),
    "q39_time_weighted_avg" -> (q39 _),
    "q40_range_join_purchases" -> (q40 _),
    "q41_percentiles" -> (q41 _),
    "q71_sampled_percentiles" -> (q71 _),
    "q42_brand_revenue" -> (q42 _),
    "q43_supplier_stats" -> (q43 _))

  val oracles: Map[String, String] = Map(
    "q95_unpivot_measures" -> q95Sql,
    "q77_skew_salted_join" -> q77Sql,
    "q80_grouping_sets" -> q80SharedSql,
    "q44_asof_join_native" -> EventQueries.q18Sql,
    "q50_map_json_functions" -> q50Sql,
    "q51_array_agg" -> q51Sql,
    "q55_pivot" -> q55Sql,
    "q61_shared_sql" -> q61SharedSql,
    "q75_correlated_scalar_subquery" -> q75SharedSql,
    "q120_multi_exists_decorrelation" -> q120SharedSql,
    "q121_nested_in_having" -> q121SharedSql,
    "q45_union_all_tagged" -> q45Sql,
    "q46_string_functions" -> q46Sql,
    "q47_range_frame_window" -> q47Sql,
    "q36_cube_orders" -> q36Sql,
    "q37_intersect_nations" -> q37Sql,
    "q38_distinct_agg" -> q38Sql,
    "q39_time_weighted_avg" -> q39Sql,
    "q40_range_join_purchases" -> q40Sql,
    "q41_percentiles" -> q41Sql,
    "q48_hll_count_distinct" -> q48Sql,
    "q71_sampled_percentiles" -> q71Sql,
    "q42_brand_revenue" -> q42Sql,
    "q43_supplier_stats" -> q43Sql)
}
