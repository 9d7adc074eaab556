package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}

/** Round-5 additions: skyline (Pareto frontier), exact grouped Spearman
  * rank correlation, CUSUM changepoint detection. Same contract as every
  * other registry module — each query has a DuckDB oracle twin and a
  * 100 TB shuffle story in its Scaladoc.
  */
object Frontier {
  private type Q = (SparkSession, String) => DataFrame

  // -- q155: skyline / Pareto frontier ---------------------------------

  /** 2-D skyline over part (minimize price, maximize size): a part is on
    * the frontier iff no other part is cheaper-or-equal AND
    * bigger-or-equal with at least one strict. The naive form is an
    * O(n²) self-join (exactly what the oracle runs); the engine instead
    * decomposes by dominance geometry so no row ever meets another row:
    *   1. per-price best size (hash agg — same-price smaller sizes are
    *      dominated by the same-price max),
    *   2. price-band partials: per-band max of best (tiny: one row per
    *      band), prefix-maxed over strictly-lower bands — the only
    *      global ordering, over #bands rows, broadcast back,
    *   3. in-band window (bounded partitions): a price survives iff its
    *      best strictly exceeds every strictly-cheaper price's best —
    *      checked against the in-band running max and the lower-band
    *      prefix,
    *   4. semi-join survivors back to part to emit all tied frontier
    *      rows.
    * Total cost: two hash shuffles + bounded windows; dominance never
    * materializes a pair. The skyline itself is small by nature (it's a
    * maxima set), so the join-back broadcasts.
    */
  def q155(s: SparkSession, d: String): DataFrame = {
    val p = Tables
      .part(s, d)
      .select(col("p_partkey"), col("p_retailprice").as("price"), col("p_size").cast("long").as("size"))
    val best = p
      .groupBy(col("price"))
      .agg(max(col("size")).as("best"))
      .withColumn("band", floor(col("price") / lit(10.0)).cast("long"))
    val bandMax = best.groupBy(col("band")).agg(max(col("best")).as("bmax"))
    // single-partition window is over one row PER BAND (tiny by design)
    val wB = Window.orderBy(col("band")).rowsBetween(Window.unboundedPreceding, -1)
    val lowerMax = bandMax.withColumn("lower_max", max(col("bmax")).over(wB)).drop("bmax")
    val wIn = Window.partitionBy(col("band")).orderBy(col("price")).rowsBetween(Window.unboundedPreceding, -1)
    val surv = best
      .withColumn("in_max", max(col("best")).over(wIn))
      .join(broadcast(lowerMax), Seq("band"))
      .filter(
        (col("in_max").isNull || col("best") > col("in_max")) &&
          (col("lower_max").isNull || col("best") > col("lower_max")))
      .select(col("price").as("sk_price"), col("best").as("sk_size"))
    p.join(broadcast(surv), p("price") === col("sk_price") && p("size") === col("sk_size"))
      .select(col("p_partkey"), col("price"), col("size"))
      .orderBy(col("p_partkey"))
  }

  val q155Sql: String =
    """SELECT a.p_partkey, a.p_retailprice AS price, CAST(a.p_size AS BIGINT) AS size
      |FROM part a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part b
      |  WHERE (b.p_retailprice < a.p_retailprice AND b.p_size >= a.p_size)
      |     OR (b.p_retailprice <= a.p_retailprice AND b.p_size > a.p_size))
      |ORDER BY a.p_partkey""".stripMargin

  // -- q156: exact grouped Spearman rank correlation --------------------

  /** Spearman rank correlation between l_quantity and l_discount per
    * l_returnflag, with textbook tie handling (Pearson over average
    * ranks). The scale design never ranks row-by-row: both variables are
    * low-cardinality, so ranks are assigned on the VALUE DISTRIBUTION
    * (≤50 quantities × ≤11 discounts per group) — one bounded hash agg
    * to (flag, qty, disc) cells, two windows over tiny per-group value
    * tables, broadcast back to cells. Average ranks are kept in integer
    * half-units (ar2 = 2·minrank + ties − 1), every moment is an exact
    * integer sum weighted by cell counts, and the final combination runs
    * in DECIMAL(38,0) (HUGEINT on the oracle side) so no engine's
    * aggregation order can perturb a bit before the single r6-snapped
    * division.
    */
  def q156(s: SparkSession, d: String): DataFrame = {
    val cells = Tables
      .lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"), col("l_quantity").as("qty"), col("l_discount").as("disc"))
      .agg(count(lit(1)).as("c"))
    def ranks(dim: String, out: String): DataFrame = {
      val w = Window
        .partitionBy(col("flag"))
        .orderBy(col(dim))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells
        .groupBy(col("flag"), col(dim))
        .agg(sum(col("c")).as("cn"))
        .withColumn("cum", sum(col("cn")).over(w))
        .select(col("flag"), col(dim), (lit(2) * col("cum") - col("cn") + lit(1)).as(out))
    }
    val xr = ranks("qty", "ar2x")
    val yr = ranks("disc", "ar2y")
    val dec = "decimal(38,0)"
    val m = cells
      .join(broadcast(xr), Seq("flag", "qty"))
      .join(broadcast(yr), Seq("flag", "disc"))
      .groupBy(col("flag"))
      .agg(
        sum(col("c")).as("n"),
        sum(col("c") * col("ar2x")).as("sx"),
        sum(col("c") * col("ar2y")).as("sy"),
        sum(col("c") * col("ar2x") * col("ar2x")).as("sxx"),
        sum(col("c") * col("ar2y") * col("ar2y")).as("syy"),
        sum(col("c") * col("ar2x") * col("ar2y")).as("sxy"))
    m.select(
        col("flag").as("l_returnflag"),
        col("n"),
        Det
          .r6(
            (col("n").cast(dec) * col("sxy").cast(dec) - col("sx").cast(dec) * col("sy").cast(dec))
              .cast("double") /
              (sqrt((col("n").cast(dec) * col("sxx").cast(dec) - col("sx").cast(dec) * col("sx").cast(dec)).cast("double")) *
                sqrt((col("n").cast(dec) * col("syy").cast(dec) - col("sy").cast(dec) * col("sy").cast(dec)).cast("double"))))
          .as("spearman_rho"))
      .orderBy(col("l_returnflag"))
  }

  val q156Sql: String = {
    val num = "CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy"
    val dx = "CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx"
    val dy = "CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy"
    s"""WITH cells AS (
       |  SELECT l_returnflag AS flag, l_quantity AS qty, l_discount AS disc, count(*) AS c
       |  FROM lineitem GROUP BY 1, 2, 3),
       |xr AS (
       |  SELECT flag, qty, 2*cum - cn + 1 AS ar2x FROM (
       |    SELECT flag, qty, cn,
       |      sum(cn) OVER (PARTITION BY flag ORDER BY qty
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |    FROM (SELECT flag, qty, sum(c) AS cn FROM cells GROUP BY 1, 2) g) z),
       |yr AS (
       |  SELECT flag, disc, 2*cum - cn + 1 AS ar2y FROM (
       |    SELECT flag, disc, cn,
       |      sum(cn) OVER (PARTITION BY flag ORDER BY disc
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |    FROM (SELECT flag, disc, sum(c) AS cn FROM cells GROUP BY 1, 2) g) z),
       |m AS (
       |  SELECT cells.flag, sum(c) AS n,
       |    sum(c*ar2x) AS sx, sum(c*ar2y) AS sy,
       |    sum(c*ar2x*ar2x) AS sxx, sum(c*ar2y*ar2y) AS syy,
       |    sum(c*ar2x*ar2y) AS sxy
       |  FROM cells
       |  JOIN xr ON cells.flag = xr.flag AND cells.qty = xr.qty
       |  JOIN yr ON cells.flag = yr.flag AND cells.disc = yr.disc
       |  GROUP BY cells.flag)
       |SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n,
       |  ${Det.sqlR(s"CAST($num AS DOUBLE) / (sqrt(CAST($dx AS DOUBLE)) * sqrt(CAST($dy AS DOUBLE)))", 6)} AS spearman_rho
       |FROM m ORDER BY l_returnflag""".stripMargin
  }

  // -- q157: CUSUM changepoint detection --------------------------------

  /** Upward CUSUM drift detection on daily event counts per type. The
    * textbook recursion s_t = max(0, s_{t-1} + (x_t − μ − k)) is
    * inherently sequential; the engine uses its closed form
    * s_t = prefix_t − min(0, min_{j≤t} prefix_j) — a prefix sum plus a
    * running min, two windows inside one hash partitioning by series.
    * All state is integer: deviations are cross-multiplied by 10·D
    * (slack k = μ/10), so dev = 10·D·n_t − 11·N exactly, and the alarm
    * threshold h = 2μ compares s > 20·N without ever forming a mean.
    * Per-series windows hash-partition by event_type; no global sort.
    */
  def q157(s: SparkSession, d: String): DataFrame = {
    val daily = Tables
      .events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy(col("event_type"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val stats = daily
      .withColumn("dd", count(lit(1)).over(wAll))
      .withColumn("nn", sum(col("n")).over(wAll))
      .withColumn("dev", lit(10) * col("dd") * col("n") - lit(11) * col("nn"))
      .withColumn("prefix", sum(col("dev")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("runmin", min(col("prefix")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cusum", col("prefix") - least(lit(0L), col("runmin")))
    stats
      .select(
        col("event_type"),
        col("day"),
        col("n"),
        col("cusum"),
        (col("cusum") > lit(20) * col("nn")).as("drift"))
      .orderBy(col("event_type"), col("day"))
  }

  val q157Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, day, n,
      |    count(*) OVER (PARTITION BY event_type) AS dd,
      |    sum(n) OVER (PARTITION BY event_type) AS nn
      |  FROM daily),
      |px AS (
      |  SELECT event_type, day, n, nn,
      |    sum(10*dd*n - 11*nn) OVER (PARTITION BY event_type ORDER BY day
      |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
      |  FROM st),
      |pf AS (
      |  SELECT event_type, day, n, nn, prefix,
      |    min(prefix) OVER (PARTITION BY event_type ORDER BY day
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin
      |  FROM px)
      |SELECT event_type, day, n,
      |  CAST(prefix - least(0, runmin) AS BIGINT) AS cusum,
      |  (prefix - least(0, runmin)) > 20*nn AS drift
      |FROM pf ORDER BY event_type, day""".stripMargin

  val queries: Map[String, Q] = Map(
    "q155_skyline_frontier" -> (q155 _),
    "q156_spearman_corr" -> (q156 _),
    "q157_cusum_changepoint" -> (q157 _))

  val oracles: Map[String, String] = Map(
    "q155_skyline_frontier" -> q155Sql,
    "q156_spearman_corr" -> q156Sql,
    "q157_cusum_changepoint" -> q157Sql)
}
