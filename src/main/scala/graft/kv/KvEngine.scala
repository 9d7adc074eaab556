package graft.kv

import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Error taxonomy mirroring the reference's distinct error strings for
  * missing-collection vs missing-key (reference `internal/storage/hot.go:43,47`,
  * `engine.go:97,125,172,221`).
  */
final case class NoSuchCollectionException(id: String)
    extends RuntimeException(s"no collection found for id [$id]")
final case class NoSuchKeyException(id: String, key: String)
    extends RuntimeException(s"no value found for key [$key] in collection [$id]")
final case class CollectionExistsException(id: String)
    extends RuntimeException(s"collection already exists for id [$id]")
final case class CollectionNotHotException(id: String)
    extends RuntimeException(s"collection [$id] is not hot")

/** Two-tier KV engine: the Spark-native re-expression of the reference's
  * hot/cold storage (reference `internal/storage/engine.go`).
  *
  * Mapping (see SURVEY.md §1.2):
  *  - cold tier = one **Parquet directory per collection** under `dataDir`
  *    (replaces whole-file gob, reference `cold.go:136-154`) — columnar,
  *    compressed, splittable, and written through Spark's commit protocol,
  *    which gives the atomicity the reference's truncate-then-write lacks;
  *  - hot tier = an LSM-style in-memory **overlay map** of unflushed upserts
  *    (the moral successor of `hot.go:8-10`'s process map) over an optional
  *    cached base DataFrame. Point reads check overlay first, then the base
  *    scan (predicate pushdown makes the base probe a column-pruned,
  *    row-group-skipping parquet read — not a full scan);
  *  - flush = write base∪overlay (last-write-wins) to parquet **then evict**
  *    from hot — a move, not a copy, exactly like `engine.go:111-126`;
  *  - all hot-tier state is synchronized (the reference races: one goroutine
  *    per HTTP request over unsynchronized maps, `main.go:109` + no mutex in
  *    `hot.go` — a defect we do not replicate).
  *
  * At cluster scale the overlay stays driver-side and bounded (it is a write
  * buffer, not a data store); the data lives in partitioned parquet and every
  * read is a pushed-down distributed scan.
  */
final class KvEngine(val spark: SparkSession, val dataDir: String, val autoCreate: Boolean) {

  graft.core.GraftSession.tune(spark)

  val schema: StructType = StructType(
    Seq(StructField("key", StringType, nullable = false), StructField("value", StringType)))

  /** Hot collection = optional durable base + in-memory upsert overlay.
    * `base=None` means the collection was created hot and never flushed.
    */
  private final case class Hot(base: Option[DataFrame], overlay: mutable.LinkedHashMap[String, String])

  private val hot = mutable.LinkedHashMap.empty[String, Hot]
  private val lock = new Object

  Files.createDirectories(Paths.get(dataDir))

  private def coldPath(id: String): java.nio.file.Path = Paths.get(dataDir, id)

  /** Valid persisted collection ids, like the reference's filename regex
    * `[a-zA-Z0-9]+.tsdata` (reference `cold.go:72`).
    */
  private val idRe = "^[a-zA-Z0-9]+$".r

  // ---- batch WAL (durability for upsertBatch) ----
  // Every upsertBatch lands in `<dataDir>/<id>.wal/b<seq>` parquet BEFORE the
  // call returns, so a caller that journals the batch as committed (the
  // exactly-once sink) never records durability the engine doesn't have.
  // The `.wal` suffix fails idRe, so cold listing ignores these dirs.

  private def walPath(id: String): java.nio.file.Path = Paths.get(dataDir, id + ".wal")

  private val walBatchRe = "^b\\d{8}$".r

  /** Sorted committed WAL batch dirs (lexical order == sequence order). */
  private def walBatches(id: String): Vector[java.nio.file.Path] = {
    val p = walPath(id)
    if (!Files.isDirectory(p)) Vector.empty
    else {
      val s = Files.list(p)
      try s.iterator.asScala
        .filter(q => Files.isDirectory(q) && walBatchRe.matches(q.getFileName.toString))
        .toVector
        .sortBy(_.getFileName.toString)
      finally s.close()
    }
  }

  private def walExists(id: String): Boolean = walBatches(id).nonEmpty

  /** Batches-per-collection bound: when a collection accumulates more than
    * this many committed WAL batches, [[upsertBatch]] compacts them into a
    * single batch so recovery replay (`durableView`) stays a bounded union,
    * not an O(batches) plan.
    */
  private val maxWalBatches = 8

  /** Parse the numeric sequence of the last committed batch dir (0 if none). */
  private def lastWalSeq(id: String): Int =
    walBatches(id).lastOption.map(_.getFileName.toString.drop(1).toInt).getOrElse(0)

  /** Commit a DataFrame as WAL batch `seq`: staged parquet write, then an
    * atomic rename into the `b%08d` name. The staging name fails
    * [[walBatchRe]], so a crash mid-write leaves an invisible partial dir
    * that the next commit at the same seq overwrites.
    */
  private def commitWalBatch(id: String, seq: Int, df: DataFrame): java.nio.file.Path = {
    Files.createDirectories(walPath(id))
    val stage = walPath(id).resolve(f"tmpb$seq%08d")
    if (Files.exists(stage)) deleteRec(stage)
    df.coalesce(math.max(1, df.rdd.getNumPartitions / 8)).write.mode("overwrite").parquet(stage.toString)
    val committed = walPath(id).resolve(f"b$seq%08d")
    if (Files.exists(committed)) deleteRec(committed) // impossible unless seq reuse; be safe
    Files.move(stage, committed)
    committed
  }

  /** Fold the committed WAL batches (NOT the cold base) into one batch so
    * the durable replay plan stays bounded. Crash-safe by construction: the
    * compacted batch carries a sequence higher than every input batch and a
    * superset of their keys, so under last-write-wins it shadows them
    * completely — deleting the inputs afterwards is pure cleanup, and a
    * crash between rename and cleanup leaves a state that reads identically.
    */
  private def compactWal(id: String): Unit = {
    val batches = walBatches(id)
    if (batches.size <= maxWalBatches) return
    val legs = batches.zipWithIndex.map { case (p, i) =>
      spark.read.schema(schema).parquet(p.toString).withColumn("__seq", lit(i.toLong))
    }
    val folded = legs
      .reduce(_.unionByName(_))
      .groupBy(col("key"))
      .agg(max(struct(col("__seq"), col("value"))).as("__m"))
      .select(col("key"), col("__m.value").as("value"))
    commitWalBatch(id, lastWalSeq(id) + 1, folded)
    batches.foreach(deleteRec)
  }

  /** Durable (cold parquet ∪ WAL) last-write-wins view. Lineage reads ONLY
    * durable files — recomputable after executor loss, unlike a
    * localCheckpoint whose truncated-lineage blocks die with the executor.
    * Later batches win via max(struct(seq, value)) per key: seqs are
    * distinct per key (cold=0, batches 1..N), so the struct comparison
    * never reaches the value field.
    */
  private def durableView(id: String): DataFrame = {
    val cold =
      if (coldExists(id)) Some(spark.read.schema(schema).parquet(coldPath(id).toString))
      else None
    val legs = cold.map(_.withColumn("__seq", lit(0L))).toVector ++
      walBatches(id).zipWithIndex.map { case (p, i) =>
        spark.read.schema(schema).parquet(p.toString).withColumn("__seq", lit(i + 1L))
      }
    legs
      .reduce(_.unionByName(_))
      .groupBy(col("key"))
      .agg(max(struct(col("__seq"), col("value"))).as("__m"))
      .select(col("key"), col("__m.value").as("value"))
  }

  // ---- listing / existence (reference engine.go:39-98) ----

  /** Distinct union of hot and cold ids, sorted (the reference's map-order
    * nondeterminism, `engine.go:60-65`, is replaced by a defined order).
    */
  def listCollections(): Seq[String] = {
    val h = lock.synchronized(hot.keys.toVector)
    (h ++ listCold()).distinct.sorted
  }

  private def listCold(): Seq[String] = {
    val s = Files.list(Paths.get(dataDir))
    try s.iterator.asScala
      .flatMap { p =>
        val n = p.getFileName.toString
        if (!Files.isDirectory(p)) None
        else if (idRe.matches(n)) Some(n)
        // a WAL with no flushed cold dir still IS the collection (crash
        // between upsertBatch and first flush) — surface it
        else if (n.endsWith(".wal") && idRe.matches(n.stripSuffix(".wal")) &&
          walExists(n.stripSuffix(".wal"))) Some(n.stripSuffix(".wal"))
        else None
      }
      .toVector
      .distinct
    finally s.close()
  }

  def isHotTier(id: String): Boolean = lock.synchronized(hot.contains(id))

  private def coldExists(id: String): Boolean =
    Files.isDirectory(coldPath(id)) && {
      val s = Files.list(coldPath(id))
      try s.iterator.asScala.exists(_.toString.endsWith(".parquet"))
      finally s.close()
    }

  /** Durable = flushed cold parquet OR an unreplayed batch WAL. */
  private def durableExists(id: String): Boolean = coldExists(id) || walExists(id)

  def collectionExists(id: String): Boolean = isHotTier(id) || durableExists(id)

  /** Reference `IsHot` errors when the collection exists nowhere (`engine.go:85-98`). */
  def isHot(id: String): Boolean =
    if (isHotTier(id)) true
    else if (durableExists(id)) false
    else throw NoSuchCollectionException(id)

  // ---- tier movement (reference engine.go:100-137) ----

  /** Cold → hot: install the parquet scan (cached) as the hot base.
    * Holds the engine lock so a concurrent writer's overlay is never
    * silently replaced.
    */
  def loadCollection(id: String): Unit = lock.synchronized {
    if (hot.contains(id)) return // concurrent loader/writer won; keep its overlay
    if (!durableExists(id)) throw NoSuchCollectionException(id)
    // WAL present ⇒ replay it over the cold base (crash recovery: batches
    // journaled as committed are durable in the WAL even if never flushed)
    val df =
      (if (walExists(id)) durableView(id)
       else spark.read.schema(schema).parquet(coldPath(id).toString)).cache()
    hot(id) = Hot(Some(df), mutable.LinkedHashMap.empty)
  }

  /** Hot → cold *move*: persist merged view then evict (reference flush is
    * an eviction, not a checkpoint — `engine.go:113-121`).
    */
  def flushCollection(id: String): Unit = lock.synchronized {
    // the lock is held across snapshot+write+evict: a write acknowledged
    // concurrently must never vanish into a stale snapshot (the engine is
    // a driver-side control plane; serializing flushes with writes is the
    // correctness-first trade)
    val h = hot.getOrElse(id, throw CollectionNotHotException(id))
    val merged = materialize(h)
    // Write via a temp dir then swap: the hot base may itself be a scan of
    // coldPath(id), and overwriting a parquet dir that is concurrently read
    // by the plan writing it corrupts the write.
    val tmp = coldPath(id).toString + ".tmp"
    merged.coalesce(math.max(1, merged.rdd.getNumPartitions / 4)).write.mode("overwrite").parquet(tmp)
    val target = coldPath(id)
    // Swap protocol keeps a readable copy at every instant: rename the old
    // dir aside, move the fresh write into place, only then delete the old
    // copy. A crash mid-sequence leaves either target or target.old intact
    // (never "data stranded in .tmp with no live dir"); the `.old`/`.tmp`
    // suffixes fail idRe so listCold/coldExists ignore leftovers on startup.
    val old = Paths.get(target.toString + ".old")
    if (Files.exists(old)) deleteRec(old) // leftover from an earlier crash
    val hadOld = Files.exists(target)
    if (hadOld) Files.move(target, old)
    Files.move(Paths.get(tmp), target)
    if (hadOld) deleteRec(old)
    // The flushed cold dir now contains every WAL batch's effect (the hot
    // base folded them in as they committed), so the WAL is spent: truncate
    // it under the same lock, or stale batches would shadow newer cold data
    // on the next durable replay (cold carries seq 0, batches seq >= 1).
    if (Files.isDirectory(walPath(id))) deleteRec(walPath(id))
    hot.remove(id).foreach(_.base.foreach(_.unpersist()))
  }

  private def deleteRec(p: java.nio.file.Path): Unit = {
    Files.walk(p).iterator.asScala.toVector.reverseIterator.foreach(Files.delete)
  }

  /** Flush everything hot; collect (not fail-fast) errors, like
    * `engine.go:128-137`.
    */
  def flushAllCollections(): Seq[Throwable] = {
    val ids = lock.synchronized(hot.keys.toVector)
    ids.flatMap(id => scala.util.Try(flushCollection(id)).failed.toOption)
  }

  /** Merged last-write-wins view of a hot collection: overlay beats base. */
  private def materialize(h: Hot): DataFrame = {
    import spark.implicits._
    val overlayDf = h.overlay.toSeq.toDF("key", "value")
    h.base match {
      case None => overlayDf
      case Some(b) =>
        if (h.overlay.isEmpty) b
        else b.join(overlayDf.select($"key"), Seq("key"), "left_anti").unionByName(overlayDf)
    }
  }

  /** The collection as a DataFrame (any tier) — the engine's query surface.
    * WAL-only and cold+WAL collections are served through the durable
    * last-write-wins view, so every id [[listCollections]] surfaces is
    * readable here (the existence surface is consistent across the API).
    */
  def collection(id: String): DataFrame = {
    val inHot = lock.synchronized(hot.get(id))
    inHot match {
      case Some(h) => materialize(h)
      case None =>
        if (!durableExists(id)) throw NoSuchCollectionException(id)
        if (walExists(id)) durableView(id)
        else spark.read.schema(schema).parquet(coldPath(id).toString)
    }
  }

  // ---- point ops (reference engine.go:139-222) ----

  /** Read-through point lookup (reference `ReadKey`, `engine.go:139-173`):
    * hot miss loads the collection from cold, then reads. The base probe is
    * a pushed-down parquet filter, not a full scan.
    */
  def readKey(id: String, key: String): String = lock.synchronized {
    val h = hot.get(id)
    h match {
      case Some(hc) =>
        hc.overlay.get(key) match {
          case Some(v) => v
          case None =>
            hc.base.flatMap(b => probe(b, key)).getOrElse(throw NoSuchKeyException(id, key))
        }
      case None =>
        // durable (cold OR WAL-only) — loadCollection replays the WAL
        if (!durableExists(id)) throw NoSuchCollectionException(id)
        loadCollection(id) // read-through: install in hot like engine.go:157
        readKey(id, key)
    }
  }

  private def probe(df: DataFrame, key: String): Option[String] =
    df.filter(col("key") === key).select(col("value")).limit(1).collect() match {
      case Array(Row(v: String)) => Some(v)
      case Array(Row(null))      => Some(null)
      case _                     => None
    }

  /** Last-write-wins upsert into hot; auto-creates when configured
    * (reference `WriteKey` + `LoadCollectionIfNotPresent`,
    * `engine.go:175-222`).
    */
  def writeKey(id: String, key: String, value: String): Unit = lock.synchronized {
    loadCollectionIfNotPresent(id)
    hot(id).overlay(key) = value
  }

  /** Distributed batch upsert: merge a DataFrame of (key, value) rows into
    * the hot collection with last-write-wins semantics WITHOUT moving the
    * rows through the driver — the streaming-sink write path
    * ([[KvExactlyOnceSink]]). The current merged view (base ∪ overlay)
    * loses to the batch on key collisions (the batch is the newest write),
    * exactly as a sequence of `writeKey` calls would resolve, but the merge
    * is a distributed anti-join ∪ union. The result is pinned with
    * `localCheckpoint` so lineage stays O(1) across unbounded micro-batches
    * (each batch's plan would otherwise stack on the last's), and becomes
    * the new hot base with an empty overlay. Rows must have distinct keys
    * (the foreachBatch contract: an aggregated upsert set); duplicate keys
    * would resolve arbitrarily, same as unordered writeKey application.
    */
  def upsertBatch(id: String, rows: DataFrame): Unit = lock.synchronized {
    loadCollectionIfNotPresent(id)
    val h = hot(id)
    val batch = rows
      .select(col("key").cast("string").as("key"), col("value").cast("string").as("value"))
    // Durability first: land the batch in the WAL *before* any engine state
    // changes, so a caller that journals the batch as committed (the
    // exactly-once sink) never records durability the engine doesn't have.
    // A crash after this rename is recovered by loadCollection's WAL replay.
    val committedDir = commitWalBatch(id, lastWalSeq(id) + 1, batch)
    // The in-memory merge reads the batch BACK from its committed WAL
    // parquet — the newest leg of the lineage rests on durable files. The
    // localCheckpoint keeps lineage O(1) across unbounded micro-batches
    // (it is an acceleration only: if its blocks are lost with an executor,
    // evict + loadCollection rebuilds the identical state from cold ∪ WAL).
    val committed = spark.read.schema(schema).parquet(committedDir.toString)
    val merged = materialize(h)
      .join(committed.select(col("key")), Seq("key"), "left_anti")
      .unionByName(committed)
      .localCheckpoint() // eager: materializes on executors inside this call
    h.base.foreach(_.unpersist())
    hot(id) = Hot(Some(merged), mutable.LinkedHashMap.empty)
    compactWal(id) // bound the replay plan at maxWalBatches legs
  }

  def loadCollectionIfNotPresent(id: String): Unit = lock.synchronized {
    if (isHotTier(id)) return
    if (durableExists(id)) { loadCollection(id); return }
    if (!autoCreate) throw NoSuchCollectionException(id)
    createCollection(id)
  }

  /** Create empty hot collection; error if exists (reference `hot.go:62-72`). */
  def createCollection(id: String): Unit = lock.synchronized {
    if (collectionExists(id)) throw CollectionExistsException(id)
    hot(id) = Hot(None, mutable.LinkedHashMap.empty)
  }

  /** Drop from hot; error if absent (reference `hot.go:74-85`). */
  def dropCollection(id: String): Unit = lock.synchronized {
    hot.remove(id) match {
      case Some(h) => h.base.foreach(_.unpersist())
      case None    => throw NoSuchCollectionException(id)
    }
  }
}
