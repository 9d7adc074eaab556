package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.core.Event

class StreamingSpec extends SparkSpec {

  private def stagedEventsDir(): String = {
    val dir = Files.createTempDirectory("evstream")
    Files.copy(
      Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-0.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  /** Streaming twin of [[graft.core.Tables.events]]'s normalization: the
    * file-source needs an explicit schema, so probe the parquet's physical
    * `ts` type batch-side first (long nanos in older fixture generations,
    * plain micros TIMESTAMP_NTZ in current ones) and normalize to
    * session-TZ TimestampType either way.
    */
  private def streamEvents(dir: String): org.apache.spark.sql.DataFrame = {
    val phys = spark.read.parquet(dir).schema("ts").dataType
    phys match {
      case org.apache.spark.sql.types.LongType =>
        spark.readStream
          .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
          .parquet(dir)
          .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        spark.readStream
          .schema("event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, value DOUBLE, props STRING")
          .parquet(dir)
          .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ =>
        spark.readStream
          .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
          .parquet(dir)
    }
  }

  test("file-source stream: windowed counts equal the batch answer") {
    import spark.implicits._
    val dir = stagedEventsDir()
    // stream side — nanos were written by the generator; read via the long
    // column then convert, same as the batch path
    val raw = streamEvents(dir)
    val agg = Streaming.windowedCounts(raw, "1 hour", "10 minutes")
    val got = Streaming
      .runToMemory(spark, agg, "win_counts", OutputMode.Complete())
      .selectExpr("window.start AS h", "event_type", "n")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // batch oracle
    val want = graft.core.Tables
      .events(spark, sf)
      .selectExpr("date_trunc('hour', ts) AS h", "event_type")
      .groupBy("h", "event_type")
      .count()
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == want)
  }

  test("stateful last-value state matches batch last-write-wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.core.Tables.events(spark, sf).as[Event].collect().toSeq
    val (batch1, batch2) = events.splitAt(events.length / 2)

    val stream = MemoryStream[Event]
    val q = Streaming
      .lastValueState(stream.toDS())
      .writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName("last_vals")
      .start()
    stream.addData(batch1)
    q.processAllAvailable()
    stream.addData(batch2)
    q.processAllAvailable()
    q.stop()

    val got = spark
      .table("last_vals")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.last("last_value").as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    val want = events
      .groupBy(_.user_id)
      .map { case (u, es) => u -> es.maxBy(e => (e.ts.getTime, e.event_id)).value }
    assert(got == want)
  }

  test("streaming dedup within watermark: duplicates dropped, state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, v: Double) =
      Event(id, java.sql.Timestamp.valueOf(t), 1L, "click", v, "{}")

    val stream = MemoryStream[Event]
    val q = Streaming
      .dedupWithinWatermark(stream.toDF(), "event_id", "10 minutes")
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName("dedup_stream")
      .start()
    // same-batch duplicates and a cross-batch replay of id 1
    stream.addData(ev(1, "2026-01-01 10:00:00", 1.0), ev(1, "2026-01-01 10:00:00", 1.0), ev(2, "2026-01-01 10:01:00", 2.0))
    q.processAllAvailable()
    stream.addData(ev(1, "2026-01-01 10:02:00", 9.0), ev(3, "2026-01-01 10:03:00", 3.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_stream").select("event_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // id 1 survives once with its FIRST value; the replay was suppressed
    assert(got == Map(1L -> 1.0, 2L -> 2.0, 3L -> 3.0))
  }

  test("late data beyond the watermark is dropped from append-mode windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, v: Double) =
      Event(id, java.sql.Timestamp.valueOf(t), 1L, "click", v, "{}")

    val stream = MemoryStream[Event]
    val agg = Streaming.windowedCounts(stream.toDF(), "10 minutes", "10 minutes")
    val q = agg.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory")
      .queryName("late_test")
      .start()
    // batch 1: events up to 10:40 -> watermark becomes 10:30
    stream.addData(ev(1, "2024-01-01 10:05:00", 1.0), ev(2, "2024-01-01 10:40:00", 1.0))
    q.processAllAvailable()
    // batch 2: a row at 10:07 (before watermark 10:30) must be DROPPED;
    // advance event time far so all windows close and emit
    stream.addData(ev(3, "2024-01-01 10:07:00", 99.0), ev(4, "2024-01-01 12:00:00", 1.0))
    q.processAllAvailable()
    stream.addData(ev(5, "2024-01-01 14:00:00", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark
      .table("late_test")
      .selectExpr("window.start AS s", "n", "sv")
      .collect()
      .map(r => r.getTimestamp(0).toString -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // 10:00 window contains ONLY event 1 — the late event 3 (v=99) was dropped
    assert(rows("2024-01-01 10:00:00.0") == ((1L, 1.0)), rows.toString)
  }

  test("sliding windows emit one row per overlapping window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val agg = Streaming.slidingCounts(stream.toDF(), "10 minutes", "5 minutes", "10 minutes")
    val q = agg.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .format("memory")
      .queryName("slide_test")
      .start()
    stream.addData(Event(1, java.sql.Timestamp.valueOf("2024-01-01 10:07:00"), 1L, "click", 1.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val starts = spark.table("slide_test").selectExpr("window.start AS s").collect().map(_.getTimestamp(0).toString).sorted
    // a point at 10:07 belongs to the 10:00 and 10:05 sliding windows
    assert(starts.toSeq == Seq("2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0"))
  }

  test("durable ingest: streaming parquet sink with checkpoint resumes cleanly") {
    import org.apache.spark.sql.functions._
    val srcDir = stagedEventsDir()
    val outDir = Files.createTempDirectory("evsink").toString
    val raw = streamEvents(srcDir)
    val q = raw.writeStream
      .format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    val written = spark.read.parquet(s"$outDir/data")
    assert(written.count() == graft.core.Tables.events(spark, sf).count())
    // restart against the same checkpoint: no reprocessing, no duplication
    val q2 = raw.writeStream
      .format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/ckpt")
      .start()
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(s"$outDir/data").count() == written.count())
  }

  test("streaming CDC into a snapshot-versioned table: pinned reader immune to later merges; final state equals batch recompute") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.{Snapshots, Sources}
    val root = Files.createTempDirectory("snapstream").toString + "/t"
    // base table: per-(day, user) event counts from the first half
    val ev = graft.core.Tables
      .events(spark, sf)
      .selectExpr("CAST(to_date(ts) AS STRING) AS day", "user_id", "event_id")
      .as[(String, Long, Long)]
      .collect()
      .toSeq
      .sortBy(_._3)
    val (baseRows, deltaRows) = ev.splitAt(ev.size / 2)
    def stats(rows: Seq[(String, Long, Long)]) = rows
      .groupBy(r => (r._1, r._2))
      .map { case ((day, uid), rs) => (day, uid, rs.size.toLong) }
      .toSeq
      .toDF("day", "user_id", "n")
    Sources.writeParquet(stats(baseRows).repartition(col("day")), root, Seq("day"))
    val v1 = Snapshots.commit(spark, root)
    val v1Total = Snapshots.readSnapshot(spark, root, v1).agg(sum("n")).head.getLong(0)
    // stream the delta through foreachBatch; each micro-batch MERGEs the
    // re-aggregated affected pairs and commits a new manifest version
    val stream = MemoryStream[(String, Long, Long)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Long, Long)]]
    val q = stream
      .toDS()
      .toDF("day", "user_id", "event_id")
      .writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        seen.synchronized { seen += rows }
        val touched = seen.synchronized { seen.flatten.toSeq } // cumulative replay-safe delta
        val affectedPairs = touched.map(t => (t._1, t._2)).toSet
        val merged = stats(baseRows.filter(r => affectedPairs((r._1, r._2))) ++ touched)
        Sources.mergeIntoPartitioned(spark, root, merged.repartition(col("day")), "day", Seq("user_id"))
        ()
      }
      .start()
    deltaRows.grouped(math.max(1, deltaRows.size / 3)).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    // the pinned v1 reader still sees EXACTLY the pre-stream table
    assert(Snapshots.readSnapshot(spark, root, v1).agg(sum("n")).head.getLong(0) == v1Total)
    assert(Snapshots.latestVersion(spark, root) > v1)
    // the latest snapshot equals the batch recompute over ALL events
    val want = stats(ev).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = Snapshots
      .readSnapshot(spark, root)
      .select(col("day").cast("string"), col("user_id"), col("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want)
  }

  test("foreachBatch incremental MV maintenance replays to exactly the batch q143 rollup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the streamed rows, pre-projected to the MV's input shape
    val rows = graft.core.Tables
      .events(spark, sf)
      .selectExpr(
        "event_type",
        "CAST(to_date(ts) AS STRING) AS day",
        "CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm")
      .as[(String, String, Long)]
      .collect()
      .toSeq
    // split on the q143 base/delta boundary so the micro-batches mirror
    // the batch operator's partial-aggregate segments
    val (base, delta) = rows.partition(_._2.substring(8).toInt <= 20)
    // the maintained view: merge each micro-batch's partial aggregate into
    // state by summing the commutative-monoid fields — q143's law, run on
    // the real micro-batch runtime instead of two static frames
    val state = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    val stream = MemoryStream[(String, String, Long)]
    val q = stream
      .toDF()
      .toDF("event_type", "day", "vm")
      .writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val partial = batch
          .groupBy("event_type", "day")
          .agg(
            org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
            org.apache.spark.sql.functions.sum("vm").as("sv"))
          .collect()
        state.synchronized {
          partial.foreach { r =>
            val k = (r.getString(0), r.getString(1))
            val (n0, s0) = state.getOrElse(k, (0L, 0L))
            state(k) = (n0 + r.getLong(2), s0 + r.getLong(3))
          }
        }
        ()
      }
      .start()
    stream.addData(base)
    q.processAllAvailable()
    stream.addData(delta)
    q.processAllAvailable()
    q.stop()
    val want = graft.queries.Advanced
      .q143(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(state.toMap == want)
  }

  test("foreachBatch HLL register merge replays to exactly the batch q145 estimates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the streamed unit is the MERGEABLE SKETCH STATE, not raw events:
    // (day, bucket, r) registers arrive in two arbitrary batches and the
    // sink max-merges them — the law that lets a stream maintain windowed
    // distinct counts without reprocessing any prior day
    val regs = graft.queries.Advanced
      .dailyHllRegisters(spark, sf)
      .selectExpr("CAST(day AS STRING) AS day", "bucket", "r")
      .as[(String, Int, Int)]
      .collect()
      .toSeq
    val (first, second) = regs.partition(_.hashCode() % 2 == 0) // arbitrary interleave
    val state = scala.collection.mutable.Map.empty[(String, Int), Int]
    val stream = MemoryStream[(String, Int, Int)]
    val q = stream
      .toDF()
      .toDF("day", "bucket", "r")
      .writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { row =>
          val k = (row.getString(0), row.getInt(1))
          val r = row.getInt(2)
          state.synchronized { state(k) = math.max(state.getOrElse(k, 0), r) }
        }
        ()
      }
      .start()
    stream.addData(first)
    q.processAllAvailable()
    stream.addData(second)
    q.processAllAvailable()
    q.stop()
    // window the streamed state exactly like q145 and compare estimates
    val mergedRows = state.toSeq.map { case ((day, b), r) => (day, b, r) }
    val merged = mergedRows
      .toDF("day", "bucket", "r")
      .selectExpr("CAST(day AS DATE) AS day", "bucket", "r")
    val maxDay = merged.selectExpr("max(day) AS max_day")
    val windowed = merged
      .select($"day", $"bucket", $"r", org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.sequence(
          org.apache.spark.sql.functions.lit(0),
          org.apache.spark.sql.functions.lit(6))).as("k"))
      .selectExpr("date_add(day, k) AS wend", "bucket", "r")
      .crossJoin(org.apache.spark.sql.functions.broadcast(maxDay))
      .filter($"wend" <= $"max_day")
      .groupBy($"wend", $"bucket")
      .agg(org.apache.spark.sql.functions.max($"r").as("r"))
    val got = graft.queries.Advanced
      .hllEstimate(windowed, "wend", "users_7d_hll")
      .collect()
      .map(r => r.getDate(0).toString -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val want = graft.queries.Advanced
      .q145(spark, sf)
      .collect()
      .map(r => r.getDate(0).toString -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(got == want)
  }

  test("foreachBatch upsert sink: streamed last-write-wins lands in the KV engine") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.core.Tables.events(spark, sf).as[Event].collect().toSeq
    val kvDir = Files.createTempDirectory("kvstream").toString
    val engine = new graft.kv.KvEngine(spark, kvDir, autoCreate = true)

    val stream = MemoryStream[Event]
    val q = Streaming
      .lastValueState(stream.toDS())
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Streaming.KeyedValue], _: Long) =>
        // the streaming twin of the reference's WriteKey ingest path
        batch.collect().foreach(kv => engine.writeKey("uservals", kv.user_id.toString, kv.last_value.toString))
        ()
      }
      .start()
    stream.addData(events)
    q.processAllAvailable()
    q.stop()

    val want = events.groupBy(_.user_id).map { case (u, es) => u -> es.maxBy(e => (e.ts.getTime, e.event_id)).value }
    want.foreach { case (u, v) =>
      assert(engine.readKey("uservals", u.toString) == v.toString)
    }
    engine.flushCollection("uservals")
    assert(!engine.isHot("uservals") && engine.collectionExists("uservals"))
  }

  test("transformWithState running totals match batch aggregation across two batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = graft.core.Tables.events(spark, sf).as[Event].collect().toSeq
      val (b1, b2) = events.splitAt(events.length / 3)
      val stream = MemoryStream[Event]
      val q = Streaming
        .runningTotals(stream.toDS())
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .format("memory")
        .queryName("tws_totals")
        .start()
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
      q.stop()
      import org.apache.spark.sql.functions.{max, struct}
      // take each user's final emission (max n) with its sum — both halves
      // of the state must round-trip through the RocksDB encoder
      val got = spark
        .table("tws_totals")
        .groupBy("user_id")
        .agg(max(struct($"n", $"sum")).as("fin"))
        .selectExpr("user_id", "fin.n AS n", "fin.sum AS sum")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), math.rint(r.getDouble(2) * 100) / 100)))
        .toMap
      val want = events.groupBy(_.user_id).map { case (u, es) =>
        u -> ((es.size.toLong, math.rint(es.map(_.value).sum * 100) / 100))
      }
      assert(got == want)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming as-of enrichment replays the batch as-of join across batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.functions.unix_millis
      val ev = graft.core.Tables.events(spark, sf)
      // quotes = purchases, trades = errors, keyed by user; ts in epoch ms
      val quotes = ev
        .filter($"event_type" === "purchase")
        .select($"user_id".as("series"), unix_millis($"ts").as("t"), $"event_id".as("qid"), $"value".as("px"))
      val trades = ev
        .filter($"event_type" === "error")
        .select($"event_id".as("trade_id"), $"user_id".as("series"), unix_millis($"ts").as("t"))
      val want = graft.operators.TimeSeriesOps
        .asOfJoin(trades, quotes, "series", "t", "t", "qid", Map("qid" -> "mqid", "px" -> "mpx"))
        .collect()
        .map(r => (r.getAs[Long]("trade_id"),
          (if (r.isNullAt(r.fieldIndex("mqid"))) None else Some(r.getAs[Long]("mqid"))),
          (if (r.isNullAt(r.fieldIndex("mpx"))) None else Some(r.getAs[Double]("mpx")))))
        .toSet
      // the interleaved tape in batch-window order, split into three
      // chronological prefixes — state must carry the last quote across
      // both boundaries
      val tape = (quotes.collect().map(r => Streaming.Tick(r.getLong(0), r.getLong(1), 0, r.getLong(2), r.getLong(2), r.getDouble(3))) ++
        trades.collect().map(r => Streaming.Tick(r.getLong(1), r.getLong(2), 1, Long.MaxValue, r.getLong(0), 0.0)))
        .sortBy(t => (t.ts, t.side, t.tie))
        .toSeq
      val stream = MemoryStream[Streaming.Tick]
      val q = Streaming
        .asOfEnrich(stream.toDS())
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .format("memory")
        .queryName("asof_stream")
        .start()
      val third = tape.length / 3
      Seq(tape.take(third), tape.slice(third, 2 * third), tape.drop(2 * third)).foreach { b =>
        stream.addData(b)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark
        .table("asof_stream")
        .collect()
        .map(r => (r.getAs[Long]("trade_id"),
          Option(r.getAs[java.lang.Long]("qid")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)))
        .toSet
      assert(got.size == want.size)
      assert(got == want, s"only-stream=${(got -- want).take(3)} only-batch=${(want -- got).take(3)}")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming LSH near-dup dedup matches the batch first-claim fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = graft.core.Tables
        .documents(spark, sf)
        .select($"doc_id", $"text")
        .as[(Long, String)]
        .collect()
        .toSeq
        .sortBy(_._1)
      val half = docs.length / 2
      val stream = MemoryStream[(Long, String)]
      val q = Streaming
        .lshBandClaims(stream.toDS().toDF("doc_id", "text"))
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .format("memory")
        .queryName("lsh_claims")
        .start()
      Seq(docs.take(half), docs.drop(half)).foreach { b =>
        stream.addData(b)
        q.processAllAvailable()
      }
      q.stop()
      // streaming verdict: dup = some bucket already claimed by an earlier doc
      import org.apache.spark.sql.functions.{min => fMin, when => fWhen}
      val streamDup = spark
        .table("lsh_claims")
        .groupBy($"doc_id")
        .agg(fMin(fWhen($"first", 1L).otherwise(0L)).as("allFirst"))
        .filter($"allFirst" === 0L)
        .collect()
        .map(_.getLong(0))
        .toSet
      // batch reference: same banding, dup iff any bucket has a smaller doc_id
      val bands = graft.llm.Dedup
        .lshBands(graft.core.Tables.documents(spark, sf), "doc_id", "text", 3)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"), r.getAs[String]("bandval")))
      val firstInBucket = bands
        .groupBy(b => (b._2, b._3))
        .map { case (k, rows) => k -> rows.map(_._1).min }
      val batchDup = bands
        .filter { case (id, band, bv) => firstInBucket((band, bv)) < id }
        .map(_._1)
        .toSet
      assert(streamDup == batchDup,
        s"only-stream=${(streamDup -- batchDup).take(3)} only-batch=${(batchDup -- streamDup).take(3)}")
      assert(streamDup.nonEmpty, "fixture contains near-dups; the detector should fire")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming anomaly detector matches the batch q89 window exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // feed events in event-time order split across three batches so the
      // ring state round-trips the store twice mid-series
      val events = graft.core.Tables.events(spark, sf).as[Event]
        .collect().toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val third = events.length / 3
      val stream = MemoryStream[Event]
      val q = Streaming
        .anomalyStream(stream.toDS())
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .format("memory")
        .queryName("tws_anomaly")
        .start()
      Seq(events.take(third), events.slice(third, 2 * third), events.drop(2 * third)).foreach { b =>
        stream.addData(b)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark
        .table("tws_anomaly")
        .select($"user_id", $"event_id", org.apache.spark.sql.functions.round($"z", 4).as("z"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val want = graft.queries.Analytics
        .q89(spark, sf)
        .select($"user_id", $"event_id", org.apache.spark.sql.functions.round($"z", 4).as("z"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == want, s"stream/batch mismatch: only-stream=${(got -- want).take(3)} only-batch=${(want -- got).take(3)}")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming CUSUM monitor replays the batch q157 detector exactly across batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // trained baseline = the batch query's own derived parameters
    val batch = graft.queries.Frontier
      .q157(spark, sf)
      .collect()
      .map(r =>
        (r.getString(0), r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("n"),
          r.getAs[Long]("cusum"), r.getAs[Boolean]("drift")))
    val byType = batch.groupBy(_._1)
    val params = byType.map { case (t, rows) =>
      val d = rows.length.toLong
      val nn = rows.map(_._3).sum
      t -> Streaming.CusumParams(mult = 10L * d, sub = 11L * nn, thresh = 20L * nn)
    }
    val daily = batch.map(r => Streaming.DailyCount(r._1, r._2, r._3)).sortBy(_.day)
    val stream = MemoryStream[Streaming.DailyCount]
    val q = Streaming
      .cusumAlerts(stream.toDS(), params)
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .format("memory")
      .queryName("cusum_stream")
      .start()
    // chronological halves: state must survive the batch boundary
    val half = daily.length / 2
    Seq(daily.take(half), daily.drop(half)).foreach { b =>
      stream.addData(b)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark
      .table("cusum_stream")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(got == batch.toSet, s"only-stream=${(got -- batch.toSet).take(3)} only-batch=${(batch.toSet -- got).take(3)}")
  }

  test("streaming counter increases roll up to the batch q163 report across batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pts = graft.core.Tables
      .events(spark, sf)
      .selectExpr(
        "event_type",
        "unix_micros(ts) AS t",
        "CAST(floor(value*1000000.0+0.5) AS LONG) AS vu")
      .as[Streaming.SeriesPoint]
      .collect()
      .sortBy(p => (p.t, p.vu))
    val stream = MemoryStream[Streaming.SeriesPoint]
    val q = Streaming
      .counterIncreases(stream.toDS())
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .format("memory")
      .queryName("ctr_stream")
      .start()
    val third = pts.length / 3
    Seq(pts.take(third), pts.slice(third, 2 * third), pts.drop(2 * third)).foreach { b =>
      stream.addData(b)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark
      .table("ctr_stream")
      .selectExpr(
        "event_type",
        "CAST(make_date(year(timestamp_micros(t)), month(timestamp_micros(t)), day(timestamp_micros(t))) AS STRING) AS day",
        "inc",
        "CAST(reset AS LONG) AS r")
      .groupBy("event_type", "day")
      .agg(
        org.apache.spark.sql.functions.sum($"inc").as("increase_u"),
        org.apache.spark.sql.functions.sum($"r").as("n_resets"),
        org.apache.spark.sql.functions.count($"inc").as("n_samples"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val want = graft.queries.Frontier
      .q163(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date]("day").toString) ->
        ((r.getAs[Long]("increase_u"), r.getAs[Long]("n_resets"), r.getAs[Long]("n_samples"))))
      .toMap
    assert(got == want, s"only-stream=${(got.toSet -- want.toSet).take(2)} only-batch=${(want.toSet -- got.toSet).take(2)}")
  }

  test("streaming CDC snapshot matches the batch q111 changelog compaction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.core.Tables.events(spark, sf).as[Event]
      .collect().toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    val third = events.length / 3
    val stream = MemoryStream[Event]
    val q = Streaming
      .cdcSnapshotState(stream.toDS())
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .format("memory")
      .queryName("cdc_snapshot")
      .start()
    Seq(events.take(third), events.slice(third, 2 * third), events.drop(2 * third)).foreach { b =>
      stream.addData(b)
      q.processAllAvailable()
    }
    q.stop()
    // emitted rows are each user's latest-so-far op per batch (monotone in
    // (ts, event_id)), so the final snapshot is the per-user max — upserts only
    val got = spark
      .table("cdc_snapshot")
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2), r.getString(3), r.getDouble(4))))
      .groupBy(_._1)
      .map { case (uid, rows) => uid -> rows.map(_._2).maxBy(t => (t._1, t._2)) }
      .collect { case (uid, (ts, _, "purchase", v)) => (uid, ts, v) }
      .toSet
    val want = graft.queries.EventQueries
      .q111(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .toSet
    assert(got == want, s"stream/batch CDC mismatch: only-stream=${(got -- want).take(3)} only-batch=${(want -- got).take(3)}")
  }

  test("stream-stream interval join equals the batch range join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.core.Tables.events(spark, sf).as[Event].collect().toSeq
    val stream = MemoryStream[Event]
    val joined = Streaming.errorPurchaseJoin(stream.toDF(), "2 hours")
    val q = joined.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory")
      .queryName("ss_join")
      .start()
    stream.addData(events)
    q.processAllAvailable()
    q.stop()
    val got = spark
      .table("ss_join")
      .groupBy("err_id")
      .count()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // batch oracle: same pairing computed directly, at full microsecond
    // precision (getTime alone truncates to ms and can disagree near the
    // window boundary)
    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val purchases = events.filter(_.event_type == "purchase")
    val want = events
      .filter(_.event_type == "error")
      .map { e =>
        e.event_id -> purchases
          .count(p =>
            p.user_id == e.user_id &&
              micros(p.ts) > micros(e.ts) - 3600000000L && micros(p.ts) <= micros(e.ts))
          .toLong
      }
      .filter(_._2 > 0)
      .toMap
    assert(got == want)
  }

  test("stream-static point-in-time enrichment matches batch q130 exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.core.Tables.events(spark, sf)
    val dim = graft.queries.EventQueries.scd2FeatureDim(ev)
    val stream = MemoryStream[Event]
    val clicks = stream.toDF().filter($"event_type" === "click").select($"user_id", $"event_id", $"ts")
    val enriched = Streaming.pointInTimeEnrich(clicks, dim)
    val q = enriched.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory")
      .queryName("pit_enrich")
      .start()
    stream.addData(ev.as[Event].collect().toSeq)
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    val got = spark.table("pit_enrich").collect().map(key).toMap
    val want = graft.queries.EventQueries.q130(spark, sf).collect().map(key).toMap
    assert(got == want, "stream-static enrichment diverged from batch q130")
  }

  test("session windows produce bounded state output") {
    import spark.implicits._
    val dir = stagedEventsDir()
    val raw = streamEvents(dir)
    val agg = Streaming.sessionCounts(raw, "30 minutes", "10 minutes")
    val out = Streaming.runToMemory(spark, agg, "sess_counts", OutputMode.Complete())
    assert(out.count() > 0)
  }

  test("flatMapGroupsWithState alerts fire only on new maxima above threshold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, v: Double) =
      Event(id, java.sql.Timestamp.valueOf(t), 7L, "metric", v, "{}")

    val stream = MemoryStream[Event]
    val q = Streaming
      .thresholdAlerts(stream.toDS(), threshold = 2.0)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName("alerts")
      .start()
    // batch 1: 1.0 (below threshold), 5.0 (alert), 3.0 (below running max)
    stream.addData(Seq(
      ev(1, "2024-01-01 10:00:00", 1.0),
      ev(2, "2024-01-01 10:01:00", 5.0),
      ev(3, "2024-01-01 10:02:00", 3.0)))
    q.processAllAvailable()
    // batch 2: 7.0 (alert, beats state max 5.0 from batch 1), 6.0 (no)
    stream.addData(Seq(
      ev(4, "2024-01-01 10:03:00", 7.0),
      ev(5, "2024-01-01 10:04:00", 6.0)))
    q.processAllAvailable()
    q.stop()

    val got = spark
      .table("alerts")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value"), r.getAs[Double]("prev_max")))
    assert(got.sameElements(Array((2L, 5.0, 1.0), (4L, 7.0, 5.0))), got.mkString(", "))
  }

  test("stateful checkpoint recovery: restarted query restores state and totals stay exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, max, struct}
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val srcDir = Files.createTempDirectory("ckptsrc").toString
      val outDir = Files.createTempDirectory("ckptout").toString
      // raw fixture rows (physical ts type preserved) split in half by event_id
      val raw = spark.read.parquet(s"$sf/events.parquet")
      val cut = raw.selectExpr("percentile(event_id, 0.5)").first().getDouble(0)
      raw.filter(col("event_id") <= cut).write.mode("append").parquet(srcDir)

      def start() = Streaming
        .runningTotals(
          streamEvents(srcDir)
            .as[Event])
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .option("checkpointLocation", s"$outDir/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Streaming.UserTotals], id: Long) =>
          df.toDF().withColumn("batch_id", lit(id)).write.mode("append").parquet(s"$outDir/data")
        }
        .start()

      val q1 = start()
      q1.processAllAvailable()
      q1.stop()
      val phase1Batches = spark.read.parquet(s"$outDir/data").agg(max("batch_id")).first().getLong(0)

      // half 2 arrives while the query is DOWN; the restart must restore
      // per-user state from the checkpoint, not recount from scratch
      raw.filter(col("event_id") > cut).write.mode("append").parquet(srcDir)
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      val out = spark.read.parquet(s"$outDir/data")
      assert(out.agg(max("batch_id")).first().getLong(0) > phase1Batches, "restart emitted nothing")
      val got = out
        .groupBy("user_id")
        .agg(max(struct($"batch_id", $"n", $"sum")).as("fin"))
        .selectExpr("user_id", "fin.n AS n", "fin.sum AS sum")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), math.rint(r.getDouble(2) * 100) / 100)))
        .toMap
      val events = graft.core.Tables.events(spark, sf).as[Event].collect().toSeq
      val want = events.groupBy(_.user_id).map { case (u, es) =>
        u -> ((es.size.toLong, math.rint(es.map(_.value).sum * 100) / 100))
      }
      assert(got == want)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("change-feed reader tails commits; compaction emits nothing; folded feeds reproduce the final table") {
    import graft.sources.{Snapshots, Sources}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = Files.createTempDirectory("changefeed").toString + "/t"
    val ckpt = Files.createTempDirectory("changefeed_ckpt").toString
    val base = Seq(
      (1L, "2024-01-01", 10.0),
      (2L, "2024-01-01", 11.0),
      (3L, "2024-01-02", 20.0),
      (4L, "2024-01-03", 30.0)).toDF("id", "day", "v")
    Sources.writeParquet(base.repartition(3), root) // scattered: compaction will have work
    Snapshots.commit(spark, root) // v1
    val feeds = scala.collection.mutable.Map.empty[Long, Seq[(String, Long, String, Double)]]
    val q = Streaming.changeFeed(spark, root, ckpt) { (v, feed) =>
      val rows = feed
        .select(col("change"), col("id"), col("day"), col("v"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
        .toSeq
      feeds.synchronized { feeds(v) = rows }
    }
    try {
      q.processAllAvailable()
      Sources.deleteWhere(spark, root, col("id") === 2L) // v2: a delete
      q.processAllAvailable()
      Seq((5L, "2024-01-02", 21.0)).toDF("id", "day", "v").write.mode("append").parquet(root)
      Snapshots.commit(spark, root) // v3: an append
      q.processAllAvailable()
      val (dirs, _, _) = Sources.compactInPlace(spark, root) // v4: files change, rows don't
      assert(dirs > 0L, "fixture must leave the compactor real work")
      q.processAllAvailable()
    } finally q.stop()
    assert(feeds.keySet == Set(1L, 2L, 3L, 4L))
    assert(feeds(1L).size == 4 && feeds(1L).forall(_._1 == "added"), "v1 = initial snapshot, all added")
    assert(feeds(2L) == Seq(("removed", 2L, "2024-01-01", 11.0)))
    assert(feeds(3L) == Seq(("added", 5L, "2024-01-02", 21.0)))
    assert(feeds(4L).isEmpty, "a compaction rewrites files, not rows — the feed must stay silent")
    // multiset law: folding every per-commit feed (added − removed) equals
    // diff(empty, latest), i.e. the live table itself
    val folded = feeds.values.flatten
      .foldLeft(Map.empty[(Long, String, Double), Int]) { case (m, (chg, id, day, v)) =>
        val k = (id, day, v)
        m + (k -> (m.getOrElse(k, 0) + (if (chg == "added") 1 else -1)))
      }
      .filter(_._2 != 0)
    val want = Snapshots
      .readSnapshot(spark, root)
      .select(col("id"), col("day"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(identity)
      .map { case (k, a) => k -> a.length }
    assert(folded == want)
    // restart from the same checkpoint: nothing re-emits (exactly-once per
    // checkpoint lifetime), a NEW commit still flows
    feeds.synchronized { feeds.clear() }
    val q2 = Streaming.changeFeed(spark, root, ckpt) { (v, feed) =>
      val n = feed.count()
      feeds.synchronized { feeds(v) = Seq.fill(n.toInt)(("", 0L, "", 0.0)) }
    }
    try {
      q2.processAllAvailable()
      assert(feeds.isEmpty, "already-processed commits must not replay from the checkpoint")
      Sources.deleteWhere(spark, root, col("id") === 4L) // v5
      q2.processAllAvailable()
      assert(feeds.keySet == Set(5L) && feeds(5L).size == 1)
    } finally q2.stop()
  }

  test("change-feed re-images instead of wedging when the previous manifest was vacuumed") {
    import graft.sources.{Snapshots, Sources}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = Files.createTempDirectory("changefeed_vac").toString + "/t"
    val ckpt = Files.createTempDirectory("changefeed_vac_ckpt").toString
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v").repartition(2).write.parquet(root)
    Snapshots.commit(spark, root) // v1
    Sources.deleteWhere(spark, root, col("id") === 2L) // v2
    Seq((4L, 40.0)).toDF("id", "v").write.mode("append").parquet(root)
    Snapshots.commit(spark, root) // v3
    Snapshots.vacuum(spark, root, keepLast = 1) // v1, v2 manifests gone
    // a FRESH feed discovers only v3; diff(v2, v3) is impossible — the
    // feed must fall back to a full re-image, not crash the query
    val feeds = scala.collection.mutable.Map.empty[Long, Set[(String, Long, Double)]]
    val q = Streaming.changeFeed(spark, root, ckpt) { (v, feed) =>
      val rows = feed
        .select(col("change"), col("id"), col("v"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      feeds.synchronized { feeds(v) = rows }
    }
    try q.processAllAvailable()
    finally q.stop()
    assert(feeds.keySet == Set(3L))
    assert(feeds(3L) == Set(("added", 1L, 10.0), ("added", 3L, 30.0), ("added", 4L, 40.0)))
  }
}
