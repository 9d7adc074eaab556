package graft.kv

import scala.util.Try

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once Structured-Streaming sink into [[KvEngine]]: a
  * `foreachBatch` upsert gated by a batch-id idempotence journal.
  *
  * Structured Streaming guarantees each micro-batch is delivered with a
  * monotonic `batchId` and that a restarted query REPLAYS the last batch
  * (at-least-once delivery into foreachBatch). Exactly-once state therefore
  * needs the sink to be idempotent per batch id; the journal (a dedicated
  * engine collection, `<collection>commits`) records every applied id, so
  * a replayed batch is skipped outright:
  *
  *  - crash AFTER journal write → replay sees the id, applies nothing;
  *  - crash BETWEEN data apply and journal write → replay re-applies the
  *    same rows; upserts are last-write-wins with deterministic per-batch
  *    content, so re-application converges to the identical state.
  *
  * Either way the post-recovery state equals the exactly-once state. The
  * journal also protects against a MISBEHAVING replay (same id, different
  * rows): the first committed content wins, asserted in KvStreamSpec.
  *
  * The collect is bounded and deliberate: foreachBatch output here is an
  * aggregated upsert set (distinct keys per micro-batch), and KvEngine's
  * hot tier is a driver-side write buffer by design — the data plane stays
  * in parquet/streams; this is the control-plane hand-off.
  */
final class KvExactlyOnceSink(
    engine: KvEngine,
    collection: String,
    keyCol: String,
    valueCol: String) {

  require(collection.matches("^[a-zA-Z0-9]+$"), s"invalid collection id [$collection]")
  // The journal lives in the same engine namespace as data collections; a
  // sink target ending in "commits" would collide with another sink's
  // journal (e.g. target 'metricscommits' vs the journal of 'metrics'), so
  // such names are rejected outright.
  require(
    !collection.endsWith("commits"),
    s"collection id [$collection] ends in reserved journal suffix 'commits'")
  val journalId: String = collection + "commits"

  private def committed(batchKey: String): Boolean =
    Try(engine.readKey(journalId, batchKey)).isSuccess

  /** The foreachBatch hook: `stream.writeStream.foreachBatch(sink.upsert _)`. */
  def upsert(df: DataFrame, batchId: Long): Unit = {
    val batchKey = batchId.toString
    if (committed(batchKey)) return
    val rows = df
      .select(col(keyCol).cast("string").as("k"), col(valueCol).cast("string").as("v"))
      .collect()
    rows.foreach(r => engine.writeKey(collection, r.getString(0), r.getString(1)))
    engine.writeKey(journalId, batchKey, "committed")
  }
}
