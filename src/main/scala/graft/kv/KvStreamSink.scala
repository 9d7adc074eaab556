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
  * The batch rows never move through the driver: application is
  * [[KvEngine.upsertBatch]] — a distributed anti-join ∪ union merge into
  * the hot base, pinned per batch so lineage stays O(1) across an
  * unbounded stream. The engine lands every batch in its parquet WAL
  * before upsertBatch returns, so by the time the journal records an id
  * the batch really is durable — an engine restart replays cold ∪ WAL to
  * the exact committed state. Only the journal write (one key per batch)
  * is driver-side control plane.
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
    engine.upsertBatch(
      collection,
      df.select(col(keyCol).cast("string").as("key"), col(valueCol).cast("string").as("value")))
    engine.writeKey(journalId, batchKey, "committed")
  }
}
