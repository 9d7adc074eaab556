package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}
import graft.operators.TimeSeriesOps

/** Relational query registry (scan/filter/project/join/agg/window/setop
  * surface from SURVEY.md §2.2), each with its DuckDB oracle twin.
  *
  * Determinism contract shared by every query here (BASELINE.md):
  * explicit total-order `orderBy`, every computed column aliased
  * identically in Spark and SQL, doubles passed through [[Det.r]] only
  * when the true value's decimal width requires it.
  *
  * Scale notes are per-query; the common one: group-bys shuffle once on
  * the grouping key with map-side partial aggregation (Catalyst default),
  * and small dimensions (nation 25 rows, region 5) are broadcast
  * explicitly so the fact-table join never shuffles the fact side.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style pricing summary: full lineitem scan with one shuffle
    * of (flag,status) partials — 6 groups, trivially skew-free.
    */
  def q01(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.r2(sum(col("l_quantity"))).as("sum_qty"),
        Det.r2(sum(col("l_extendedprice"))).as("sum_base"),
        Det.r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Det.sqlR("sum(l_quantity)", 2)} AS sum_qty,
       |  ${Det.sqlR("sum(l_extendedprice)", 2)} AS sum_base,
       |  ${Det.sqlR("sum(l_extendedprice*(1-l_discount))", 4)} AS sum_disc,
       |  count(*) AS cnt
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filter + narrow projection: the predicate and the 2-column read both
    * reach the parquet scan (PushedFilters / ReadSchema).
    */
  def q02(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  val q02Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0 ORDER BY o_orderkey""".stripMargin

  /** Star join: fact(orders) ⋈ customer shuffles on custkey; nation and
    * region broadcast (25 / 5 rows — at 100 TB these stay kilobytes).
    */
  def q03(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(Det.r2(sum(col("o_totalprice"))).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q03Sql: String =
    s"""SELECT r_name, n_name, ${Det.sqlR("sum(o_totalprice)", 2)} AS revenue, count(*) AS n_orders
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Top-k per group via ranked window — Spark plans a WindowGroupLimit
    * (per-partition top-k, no global sort).
    */
  def q04(s: SparkSession, d: String): DataFrame =
    TimeSeriesOps
      .topKPerGroup(
        Tables.orders(s, d),
        Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        3)
      .select(col("o_orderpriority"), col("rk").cast("long").as("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))

  val q04Sql: String =
    """SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin

  /** Anti join (NOT EXISTS): customers with no orders. */
  def q05(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q05Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Semi join (EXISTS): customers holding an open order. */
  def q06(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val q06Sql: String =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** Rollup (hierarchical grouping sets); nulls coalesced to 'ALL' so both
    * engines order identically.
    */
  def q07(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(Det.r2(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"),
        col("cnt"))
      .orderBy(col("rf"), col("ls"))

  val q07Sql: String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
       |  ${Det.sqlR("sum(l_quantity)", 2)} AS sum_qty, count(*) AS cnt
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls""".stripMargin

  /** Set op: EXCEPT (distinct) — nations with customers but no suppliers. */
  def q08(s: SparkSession, d: String): DataFrame =
    Tables
      .customer(s, d)
      .select(col("c_nationkey").as("nationkey"))
      .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  val q08Sql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin

  /** Scalar function coverage: date parts, string ops, modulo, sqrt.
    * Derived integers cast to BIGINT on both sides (Spark year() is int32,
    * DuckDB's is int64 — the cast removes the schema mismatch).
    */
  def q09(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        upper(substring(col("o_orderpriority"), 1, 1)).as("pfx"),
        length(col("o_orderstatus")).cast("long").as("slen"),
        (col("o_orderkey") % 7).as("k7"),
        Det.r4(sqrt(col("o_totalprice"))).as("sqrt_price"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tag"))
      .orderBy(col("o_orderkey"))

  val q09Sql: String =
    s"""SELECT o_orderkey,
       |  CAST(year(o_orderdate) AS BIGINT) AS y,
       |  CAST(month(o_orderdate) AS BIGINT) AS m,
       |  CAST(day(o_orderdate) AS BIGINT) AS dom,
       |  upper(substr(o_orderpriority, 1, 1)) AS pfx,
       |  CAST(length(o_orderstatus) AS BIGINT) AS slen,
       |  o_orderkey % 7 AS k7,
       |  ${Det.sqlR("sqrt(o_totalprice)", 4)} AS sqrt_price,
       |  o_orderstatus || '-' || o_orderpriority AS tag
       |FROM orders ORDER BY o_orderkey""".stripMargin

  /** JSON extraction from the events.props payload column. */
  def q10(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy(col("event_id"))

  val q10Sql: String =
    """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  /** 4-table join: lineitem is PRE-AGGREGATED to one row per orderkey
    * before it meets orders (aggregate pushed through the join — Catalyst
    * doesn't do this rewrite itself), so the big join's probe side shrinks
    * from |lineitem| to |orders| rows and the shuffled payload is
    * (orderkey, rev, cnt) instead of wide lineitem rows. At 100 TB this is
    * the difference between shuffling the fact table and shuffling one
    * row per order. Exact under r4: per-order partial sums reassociate the
    * same 4-decimal-exact products (FP drift ~1e-9 ≪ the 1e-4 snap).
    * orders ⋈ customer on custkey, nation broadcast.
    */
  def q11(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val lAgg = l
      .groupBy(col("l_orderkey"))
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("__rev"),
        count(lit(1)).as("__cnt"))
    lAgg.join(o, col("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("y"))
      .agg(Det.r4(sum(col("__rev"))).as("revenue"), sum(col("__cnt")).as("cnt"))
      .orderBy(col("n_name"), col("y"))
  }

  val q11Sql: String =
    s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS y,
       |  ${Det.sqlR("sum(l_extendedprice*(1-l_discount))", 4)} AS revenue, count(*) AS cnt
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name, y ORDER BY n_name, y""".stripMargin

  /** TPC-H Q4 pattern: correlated EXISTS with an inequality — planned as a
    * semi join, so lineitem is never aggregated, only probed.
    */
  def q12(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q12Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> (q01 _),
    "q02_filter_project" -> (q02 _),
    "q03_star_join_revenue" -> (q03 _),
    "q04_topk_per_priority" -> (q04 _),
    "q05_anti_join_no_orders" -> (q05 _),
    "q06_semi_join_open_orders" -> (q06 _),
    "q07_rollup_lineitem" -> (q07 _),
    "q08_except_nations" -> (q08 _),
    "q09_scalar_functions" -> (q09 _),
    "q10_json_extract" -> (q10 _),
    "q11_join4_revenue_by_nation_year" -> (q11 _),
    "q12_exists_late_ship" -> (q12 _))

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_star_join_revenue" -> q03Sql,
    "q04_topk_per_priority" -> q04Sql,
    "q05_anti_join_no_orders" -> q05Sql,
    "q06_semi_join_open_orders" -> q06Sql,
    "q07_rollup_lineitem" -> q07Sql,
    "q08_except_nations" -> q08Sql,
    "q09_scalar_functions" -> q09Sql,
    "q10_json_extract" -> q10Sql,
    "q11_join4_revenue_by_nation_year" -> q11Sql,
    "q12_exists_late_ship" -> q12Sql)
}
