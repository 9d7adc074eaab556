package graft.kv

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exactly-once streaming→KV: idempotence-journal laws plus a live
  * foreachBatch query over a MemoryStream.
  */
class KvStreamSpec extends SparkSpec {

  private def freshEngine(): KvEngine =
    new KvEngine(spark, java.nio.file.Files.createTempDirectory("kvsink").toString, autoCreate = true)

  test("replayed batch id is applied at most once (journal gates application)") {
    import spark.implicits._
    val engine = freshEngine()
    val sink = new KvExactlyOnceSink(engine, "metrics", "k", "v")
    sink.upsert(Seq(("cpu", "0.90"), ("mem", "0.40")).toDF("k", "v"), batchId = 0L)
    assert(engine.readKey("metrics", "cpu") == "0.90")
    // a replay of batch 0 — even with (misbehaving) different content —
    // must be a no-op: the first committed content wins
    sink.upsert(Seq(("cpu", "999"), ("disk", "1.0")).toDF("k", "v"), batchId = 0L)
    assert(engine.readKey("metrics", "cpu") == "0.90")
    assert(intercept[Exception](engine.readKey("metrics", "disk")).isInstanceOf[NoSuchKeyException])
    // the next batch id applies normally
    sink.upsert(Seq(("cpu", "0.95")).toDF("k", "v"), batchId = 1L)
    assert(engine.readKey("metrics", "cpu") == "0.95")
    assert(engine.readKey(sink.journalId, "0") == "committed")
    assert(engine.readKey(sink.journalId, "1") == "committed")
  }

  test("collection names ending in the journal suffix are rejected") {
    val engine = freshEngine()
    // 'metricscommits' would collide with the journal of 'metrics'
    intercept[IllegalArgumentException](
      new KvExactlyOnceSink(engine, "metricscommits", "k", "v"))
  }

  test("crash between data apply and journal write: re-application converges") {
    import spark.implicits._
    val engine = freshEngine()
    val sink = new KvExactlyOnceSink(engine, "metrics", "k", "v")
    val batch = Seq(("cpu", "0.90"), ("mem", "0.40")).toDF("k", "v")
    // simulate the torn state: rows applied, journal never written
    batch.collect().foreach(r => engine.writeKey("metrics", r.getString(0), r.getString(1)))
    // recovery replays the batch through the sink
    sink.upsert(batch, batchId = 0L)
    assert(engine.readKey("metrics", "cpu") == "0.90")
    assert(engine.readKey("metrics", "mem") == "0.40")
    assert(engine.readKey(sink.journalId, "0") == "committed")
    // and a second replay after the journal write is a pure no-op
    sink.upsert(batch, batchId = 0L)
    assert(engine.readKey("metrics", "cpu") == "0.90")
  }

  test("live stream: foreachBatch upserts land in the engine exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val engine = freshEngine()
    val sink = new KvExactlyOnceSink(engine, "totals", "k", "v")
    val stream = MemoryStream[(String, Double)]
    val q = stream
      .toDS()
      .toDF("k", "amount")
      .writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        // per-batch aggregated upsert set (the intended foreachBatch shape)
        sink.upsert(df.groupBy("k").agg(sum("amount").cast("string").as("v")), id)
      }
      .start()
    stream.addData(("a", 1.0), ("a", 2.0), ("b", 5.0))
    q.processAllAvailable()
    stream.addData(("a", 10.0))
    q.processAllAvailable()
    q.stop()
    assert(engine.readKey("totals", "a") == "10.0") // last batch's aggregate wins
    assert(engine.readKey("totals", "b") == "5.0")
    // both micro-batches journaled
    assert(engine.readKey(sink.journalId, "0") == "committed")
    assert(engine.readKey(sink.journalId, "1") == "committed")
    // flushed state survives tier movement
    engine.flushCollection("totals")
    assert(engine.readKey("totals", "a") == "10.0")
  }
}
