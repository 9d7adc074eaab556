package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over event tables — the analytics the reference
  * *intended* to grow into (reference `README.md:3` "(soon to be
  * timeseries) database") expressed as declarative Spark plans so Catalyst
  * owns pushdown, partial aggregation, and shuffle placement.
  *
  * Scale notes: every operator here shuffles at most once, on the series
  * key (`keyCol`), which is exactly the partitioning a 1000-executor run
  * needs; window functions run within those partitions with no further
  * exchange. Nothing collects to the driver.
  */
object TimeSeriesOps {

  /** Tumbling-window downsample: one row per (key, bucket) with aggregates.
    * `date_trunc` keeps the bucket a plain timestamp (joinable, oracle-
    * friendly), unlike `window()`'s struct column.
    */
  def downsample(df: DataFrame, tsCol: String, unit: String, keyCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    val bucket = date_trunc(unit, col(tsCol)).as("bucket")
    df.groupBy(bucket +: keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-key running aggregate ordered by (ts, tieCol) — e.g. a running sum.
    * The tie column makes the frame a total order (determinism for oracles).
    */
  def runningAgg(df: DataFrame, keyCol: String, tsCol: String, tieCol: String, agg: Column => Column, valueCol: String, as: String): DataFrame = {
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, agg(col(valueCol)).over(w))
  }

  /** Per-key delta between consecutive points (rate/derivative building
    * block). First point's delta is 0 by definition here.
    */
  def delta(df: DataFrame, keyCol: String, tsCol: String, tieCol: String, valueCol: String, as: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn(as, col(valueCol) - lag(col(valueCol), 1, 0.0).over(w))
  }

  /** Top-k rows per group by `orderCols` (must be a total order). A window
    * row_number + filter: Catalyst plans this as a per-partition sort with
    * rank-limit pushdown (WindowGroupLimit) — no global sort.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column], k: Int, as: String = "rk"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(as, row_number().over(w)).filter(col(as) <= k)
  }

  /** As-of join: for each left row, the latest right row with
    * `rightTs <= leftTs` and equal key. Implemented as union + last-over-
    * window — one shuffle on the key, linear in rows, no range explosion;
    * this is the scalable form of the classic TSDB as-of
    * (a per-key sorted merge at 100 TB, planned by Spark as a single
    * hash-partition + sort).
    *
    * Tie semantics: a right row at exactly leftTs qualifies. Among right
    * rows with equal ts, the one with the highest `rightTie` wins.
    *
    * @param valueCols right columns to carry (renamed as given)
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      rightTie: String,
      valueCols: Map[String, String]): DataFrame =
    asOfJoinImpl(left, right, keyCol, leftTs, rightTs, rightTie, valueCols, forward = false)

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `rightTs >= leftTs` and equal key — the mirror of [[asOfJoin]]
    * (interpolation and "next reading" enrichment need both directions).
    * Among right rows with equal ts, the LOWEST `rightTie` wins. Same
    * scale shape: one hash shuffle on the key, a per-key sort, no range
    * explosion — the window just walks the time axis in reverse.
    */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      rightTie: String,
      valueCols: Map[String, String]): DataFrame =
    asOfJoinImpl(left, right, keyCol, leftTs, rightTs, rightTie, valueCols, forward = true)

  private def asOfJoinImpl(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      rightTie: String,
      valueCols: Map[String, String],
      forward: Boolean): DataFrame = {
    // On the reversed axis the left sentinel must sort before every real
    // tie the same way MaxValue does on the forward axis.
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(if (forward) Long.MinValue else Long.MaxValue))
    // All carried values travel in ONE struct: a struct row is non-null even
    // when every field is null, so `last(ignoreNulls)` skips exactly the
    // left rows (whose __pack is null from the union) and never skips a
    // matched right row that happens to carry a null value — the per-column
    // form would fall back to an older row there, diverging from the native
    // operator (graft.plans.AsOfJoinExec) which attaches the matched row
    // verbatim, nulls included.
    val packed = struct(valueCols.toSeq.map { case (from, to) => col(from).as(to) }: _*)
    val rTagged = right
      .select(col(keyCol), col(rightTs).as("__ts"), col(rightTie).cast("long").as("__tie"), packed.as("__pack"))
      .withColumn("__side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // Order right rows (side=0) before left rows (side=1) at equal ts so an
    // equal-ts right row is visible to the left row. Backward walks time
    // ascending (last right at-or-before wins, highest tie last); forward
    // walks it descending (last right at-or-after in that order = the
    // earliest one, ties descending so the lowest tie lands last).
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(
        (if (forward) Seq(col("__ts").desc, col("__side"), col("__tie").desc)
         else Seq(col("__ts"), col("__side"), col("__tie"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__m", last(col("__pack"), ignoreNulls = true).over(w))
    val extracted = valueCols.values.foldLeft(filled) { (d, to) =>
      d.withColumn(to, col("__m").getField(to))
    }
    extracted
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__tie", "__pack", "__m")
  }

  /** Time-split as-of join — the skew mitigation for a HOT SERIES. Both
    * [[asOfJoin]] and the native `AsOfJoinExec` hash-partition on the
    * series key, so one series carrying most of the points is one hot
    * partition no matter how large the cluster. This variant additionally
    * splits the TIME axis into `numBuckets` ranges (bounds from one
    * map-side min/max over the left) and runs the as-of within
    * (key, bucket) — parallelism keys × buckets. Correctness across the
    * cuts needs a carry-in: a left row early in a bucket may match a right
    * row from an earlier bucket, so the latest right row BEFORE each
    * bucket is derived on a per-(key, bucket) side frame (an aggregate of
    * the right plus a window over ≤ buckets rows per key — never the data
    * rows) and injected as one synthetic right row per left-occupied
    * bucket. Delegates to [[asOfJoin]] on the composite (key, bucket) key,
    * so tie semantics are identical by construction.
    *
    * Ts columns must cast to BIGINT (epoch numbers; convert timestamps
    * first). Exactness bound: |ts − min| must stay under 2^53 (bucket ids
    * route through one double division).
    *
    * Measured ([[graft.tools.AsOfSkewBench]]: 20M trades / 1M quotes, 90%
    * on one series, local[32]): native AsOfJoinExec 56.3 s, window form
    * 64.6 s, this operator with 32 buckets 15.6 s — identical matched-row
    * counts across all three.
    */
  def asOfJoinTimeSplit(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      rightTie: String,
      valueCols: Map[String, String],
      numBuckets: Int): DataFrame = {
    if (numBuckets <= 1) return asOfJoin(left, right, keyCol, leftTs, rightTs, rightTie, valueCols)
    val bounds = left.agg(min(col(leftTs).cast("long")), max(col(leftTs).cast("long"))).head()
    if (bounds.isNullAt(0)) return asOfJoin(left, right, keyCol, leftTs, rightTs, rightTie, valueCols)
    val lo = bounds.getLong(0)
    val width = math.max(1L, (bounds.getLong(1) - lo) / numBuckets + 1)
    def bucketOf(c: Column): Column = least(
      greatest(floor((c.cast("long") - lit(lo)).cast("double") / lit(width.toDouble)).cast("long"), lit(0L)),
      lit(numBuckets - 1L))
    // latest right row per (key, right-bucket), packed so one max carries
    // (ts, tie, values) atomically
    val packed = struct(valueCols.keys.toSeq.map(col): _*)
    val best = right
      .groupBy(col(keyCol), bucketOf(col(rightTs)).as("__b"))
      .agg(max(struct(col(rightTs).cast("long").as("_ts"), col(rightTie).cast("long").as("_tie"), packed.as("_p"))).as("__best"))
    // carry-in for bucket b = latest right row in any bucket < b; only
    // buckets that contain left rows need one
    val needed = left.select(col(keyCol), bucketOf(col(leftTs)).as("__b")).distinct()
    val wc = Window
      .partitionBy(col(keyCol))
      .orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = needed
      .join(best, Seq(keyCol, "__b"), "full_outer")
      .withColumn("__carry", max(col("__best")).over(wc))
      .join(needed, Seq(keyCol, "__b"), "semi")
      .filter(col("__carry").isNotNull)
      .select(
        Seq(col(keyCol), col("__b"), col("__carry._ts").cast(right.schema(rightTs).dataType).as(rightTs), col("__carry._tie").as(rightTie)) ++
          valueCols.keys.toSeq.map(f => col(s"__carry._p.$f").as(f)): _*)
    val rightAll = right
      .select(Seq(col(keyCol), bucketOf(col(rightTs)).as("__b"), col(rightTs), col(rightTie).cast("long").as(rightTie)) ++
        valueCols.keys.toSeq.map(col): _*)
      .unionByName(carry)
      .withColumn("__ck", struct(col(keyCol), col("__b")))
    val leftB = left
      .withColumn("__b", bucketOf(col(leftTs)))
      .withColumn("__ck", struct(col(keyCol), col("__b")))
    asOfJoin(leftB, rightAll.drop(keyCol), "__ck", leftTs, rightTs, rightTie, valueCols)
      .drop("__ck", "__b")
  }

  /** As-of join with a staleness bound: like [[asOfJoin]], but a match
    * older than `toleranceSec` is treated as no match (all carried values
    * null). The classic TSDB "join latest sensor reading, but only if
    * fresh". Same single shuffle: the tolerance is a post-window filter,
    * not a range-join blowup. Latest-within-tolerance equals
    * latest-overall-if-fresh, because any other candidate is older still.
    */
  def asOfJoinWithin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      rightTie: String,
      valueCols: Map[String, String],
      toleranceSec: Long): DataFrame = {
    require(!valueCols.valuesIterator.contains("__match_ts"), "reserved name __match_ts")
    // A caller-supplied mapping for rightTs must not be lost to the internal
    // __match_ts copy: route the internal copy through its own key and
    // restore the caller's output column from it after the join.
    val callerTsOut = valueCols.get(rightTs)
    val joined = asOfJoin(
      left, right, keyCol, leftTs, rightTs, rightTie,
      (valueCols - rightTs) + (rightTs -> "__match_ts"))
    val restored = callerTsOut.fold(joined)(out => joined.withColumn(out, col("__match_ts")))
    // timestamp→double = epoch seconds with microsecond fraction (exact)
    val stale = col("__match_ts").isNull ||
      (col(leftTs).cast("double") - col("__match_ts").cast("double")) > toleranceSec.toDouble
    valueCols.values
      .foldLeft(restored)((d, to) => d.withColumn(to, when(stale, lit(null)).otherwise(col(to))))
      .drop("__match_ts")
  }

  /** Gap-fill: produce one row per (key, day) over each key's [min,max] day
    * span, zero-filling days with no data. `sequence` + explode stays
    * distributed (per-key span expansion on executors, no driver loop).
    */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String, aggs: Seq[Column]): DataFrame = {
    val daily = df
      .withColumn("day", date_trunc("day", col(tsCol)))
      .groupBy(col(keyCol), col("day"))
      .agg(aggs.head, aggs.tail: _*)
    val spans = daily.groupBy(col(keyCol)).agg(min("day").as("d0"), max("day").as("d1"))
    val scaffold = spans.select(
      col(keyCol),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    scaffold.join(daily, Seq(keyCol, "day"), "left")
  }

  /** Gap-fill with linear interpolation: dense daily scaffold per key, and
    * days without data get `prev + (next-prev) * elapsed/gap` from the
    * nearest real observations on both sides (ends stay at the boundary
    * value). One shuffle on the key; the carry-forward/backward passes are
    * windows inside that partitioning.
    */
  def gapFillInterpolateDaily(df: DataFrame, keyCol: String, tsCol: String, valueAgg: Column): DataFrame = {
    val filled = gapFillDaily(df, keyCol, tsCol, Seq(valueAgg.as("v")))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    val fwd = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    filled
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("pd", last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(fwd))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(bwd))
      .withColumn("nd", first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(bwd))
      .withColumn(
        "v_interp",
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(
            col("pv") + (col("nv") - col("pv")) *
              (unix_micros(col("day")) - unix_micros(col("pd"))).cast("double") /
              (unix_micros(col("nd")) - unix_micros(col("pd"))).cast("double")))
      .select(col(keyCol), col("day"), col("v"), col("v_interp"))
  }

  /** Sessionize: new session when the gap to the previous event of the same
    * key exceeds `gapMinutes`. Two window passes, one shuffle.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, tieCol: String, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // gap measured in exact microseconds — cast("long") would truncate to
    // seconds and disagree with sub-second timestamps near the threshold
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn(
        "__new",
        when(
          col("__prev").isNull ||
            unix_micros(col(tsCol)) - unix_micros(col("__prev")) > gapMinutes * 60000000L,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }
}
