package graft.kv

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Reference-parity tests for the KV engine (SURVEY.md §2.1 semantics):
  * error taxonomy, last-write-wins, read-through, flush-as-eviction,
  * distinct-union listing.
  */
class KvEngineSpec extends SparkSpec {

  private def freshEngine(autoCreate: Boolean = true): KvEngine = {
    val dir = Files.createTempDirectory("kv").toString
    new KvEngine(spark, dir, autoCreate)
  }

  test("write then read returns value; last write wins (hot.go:50-60 semantics)") {
    val e = freshEngine()
    e.writeKey("c1", "k", "v1")
    e.writeKey("c1", "k", "v2")
    assert(e.readKey("c1", "k") == "v2")
  }

  test("missing collection vs missing key raise distinct errors (hot.go:43,47)") {
    val e = freshEngine(autoCreate = false)
    intercept[NoSuchCollectionException](e.readKey("nope", "k"))
    val e2 = freshEngine()
    e2.writeKey("c1", "k", "v")
    intercept[NoSuchKeyException](e2.readKey("c1", "other"))
  }

  test("autoCreate=false refuses writes to absent collections (engine.go:210-221)") {
    val e = freshEngine(autoCreate = false)
    intercept[NoSuchCollectionException](e.writeKey("c1", "k", "v"))
  }

  test("flush is a move: collection leaves hot, survives on disk, read-through reloads (engine.go:111-126,139-173)") {
    val e = freshEngine()
    e.writeKey("c1", "k1", "v1")
    e.writeKey("c1", "k2", "v2")
    assert(e.isHot("c1"))
    e.flushCollection("c1")
    assert(!e.isHot("c1"))
    assert(e.collectionExists("c1"))
    // read-through: miss in hot loads from cold then reads
    assert(e.readKey("c1", "k2") == "v2")
    assert(e.isHot("c1"))
  }

  test("flush of non-hot collection errors (engine.go:125)") {
    val e = freshEngine()
    intercept[CollectionNotHotException](e.flushCollection("ghost"))
  }

  test("listCollections is the distinct union of hot and cold (engine.go:39-66)") {
    val e = freshEngine()
    e.writeKey("a", "k", "v")
    e.writeKey("b", "k", "v")
    e.flushCollection("a") // a: cold only
    e.writeKey("a", "k2", "v2") // a: hot again (and cold)
    assert(e.listCollections() == Seq("a", "b"))
  }

  test("isHot errors when the collection exists nowhere (engine.go:85-98)") {
    val e = freshEngine()
    intercept[NoSuchCollectionException](e.isHot("ghost"))
  }

  test("create errors on duplicate; drop errors on absent (hot.go:62-85)") {
    val e = freshEngine()
    e.createCollection("c1")
    intercept[CollectionExistsException](e.createCollection("c1"))
    e.dropCollection("c1")
    intercept[NoSuchCollectionException](e.dropCollection("c1"))
  }

  test("flush merges overlay over cold base (upsert compaction)") {
    val e = freshEngine()
    e.writeKey("c1", "k1", "v1")
    e.writeKey("c1", "k2", "v2")
    e.flushCollection("c1")
    e.writeKey("c1", "k2", "v2b") // overlay updates one key over cold base
    e.writeKey("c1", "k3", "v3")
    e.flushCollection("c1")
    e.loadCollection("c1")
    assert(e.readKey("c1", "k1") == "v1")
    assert(e.readKey("c1", "k2") == "v2b")
    assert(e.readKey("c1", "k3") == "v3")
    assert(e.collection("c1").count() == 3)
  }

  test("upsertBatch is last-write-wins over base AND overlay, stays queryable and flushable") {
    import spark.implicits._
    val e = freshEngine()
    e.writeKey("c1", "k1", "v1")
    e.flushCollection("c1") // k1 now in the cold base
    e.writeKey("c1", "k2", "v2") // k2 in the overlay
    // the batch beats both tiers on collision, adds new keys, drops nothing
    e.upsertBatch("c1", Seq(("k1", "b1"), ("k2", "b2"), ("k3", "b3")).toDF("key", "value"))
    assert(e.readKey("c1", "k1") == "b1")
    assert(e.readKey("c1", "k2") == "b2")
    assert(e.readKey("c1", "k3") == "b3")
    assert(e.collection("c1").count() == 3)
    // point writes after the batch still win (overlay over pinned base)
    e.writeKey("c1", "k3", "p3")
    assert(e.readKey("c1", "k3") == "p3")
    e.flushCollection("c1")
    assert(e.readKey("c1", "k1") == "b1")
    assert(e.readKey("c1", "k3") == "p3")
    assert(e.collection("c1").count() == 3)
  }

  test("no acknowledged write is lost under concurrent writes and flushes") {
    val e = freshEngine()
    e.writeKey("conc", "seed", "0")
    val writers = (1 to 4).map { t =>
      new Thread(() => (0 until 25).foreach(i => e.writeKey("conc", s"k_${t}_$i", s"v_${t}_$i")))
    }
    val flusher = new Thread(() => (0 until 5).foreach { _ =>
      try e.flushCollection("conc")
      catch { case _: CollectionNotHotException => () } // raced with another flush: fine
    })
    (writers :+ flusher).foreach(_.start())
    (writers :+ flusher).foreach(_.join())
    // every acknowledged write must be readable afterwards
    (1 to 4).foreach(t => (0 until 25).foreach { i =>
      assert(e.readKey("conc", s"k_${t}_$i") == s"v_${t}_$i", s"lost k_${t}_$i")
    })
    assert(e.readKey("conc", "seed") == "0")
  }

  test("flushAll collects errors instead of failing fast (engine.go:128-137)") {
    val e = freshEngine()
    e.writeKey("a", "k", "v")
    e.writeKey("b", "k", "v")
    assert(e.flushAllCollections().isEmpty)
    assert(!e.isHotTier("a") && !e.isHotTier("b"))
  }

  // ---- batch WAL durability ----

  test("upsertBatch is durable before return: a fresh engine over the same dir replays the WAL") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kv").toString
    val e = new KvEngine(spark, dir, autoCreate = true)
    e.upsertBatch("wal1", Seq(("k1", "a"), ("k2", "b")).toDF("key", "value"))
    e.upsertBatch("wal1", Seq(("k2", "b2"), ("k3", "c")).toDF("key", "value"))
    // simulate a crash: all hot state (overlay, checkpoint blocks) is gone
    val e2 = new KvEngine(spark, dir, autoCreate = true)
    assert(e2.listCollections().contains("wal1"))
    assert(e2.collectionExists("wal1"))
    // last-write-wins across replayed batches, never-flushed collection
    assert(e2.readKey("wal1", "k1") == "a")
    assert(e2.readKey("wal1", "k2") == "b2")
    assert(e2.readKey("wal1", "k3") == "c")
    assert(e2.collection("wal1").count() == 3)
  }

  test("WAL-only collection is consistently visible across the whole API surface") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kv").toString
    val e = new KvEngine(spark, dir, autoCreate = true)
    e.upsertBatch("only", Seq(("k", "v")).toDF("key", "value"))
    val e2 = new KvEngine(spark, dir, autoCreate = true)
    // every listing/existence/read path agrees the collection exists
    assert(e2.listCollections() == Seq("only"))
    assert(e2.collectionExists("only"))
    assert(!e2.isHot("only")) // durable, not hot — no exception
    assert(e2.collection("only").count() == 1) // served without a cold dir
    assert(e2.readKey("only", "k") == "v")
    // and createCollection refuses to shadow it
    intercept[CollectionExistsException](e2.createCollection("only"))
  }

  test("flush truncates the WAL: stale batches never shadow newer cold data") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kv").toString
    val e = new KvEngine(spark, dir, autoCreate = true)
    e.upsertBatch("t", Seq(("k", "old")).toDF("key", "value"))
    e.flushCollection("t") // cold now holds k=old; WAL must be gone
    assert(!Files.isDirectory(java.nio.file.Paths.get(dir, "t.wal")) ||
      !Files.list(java.nio.file.Paths.get(dir, "t.wal")).iterator().hasNext)
    e.writeKey("t", "k", "new")
    e.flushCollection("t")
    // a fresh engine must see the newest flushed value, not a revived WAL batch
    val e2 = new KvEngine(spark, dir, autoCreate = true)
    assert(e2.readKey("t", "k") == "new")
  }

  test("WAL compaction bounds the replay plan and preserves state bit-for-bit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kv").toString
    val e = new KvEngine(spark, dir, autoCreate = true)
    // 12 batches: k is overwritten each time, ki accumulates
    (1 to 12).foreach { i =>
      e.upsertBatch("cmp", Seq(("k", s"v$i"), (s"k$i", s"x$i")).toDF("key", "value"))
    }
    // compaction (threshold 8) must have folded the tail: few batch dirs remain
    val walDir = java.nio.file.Paths.get(dir, "cmp.wal")
    val nBatches = Files.list(walDir).iterator().asScala.count(p =>
      p.getFileName.toString.matches("^b\\d{8}$"))
    assert(nBatches <= 9, s"WAL not compacted: $nBatches batch dirs")
    // recovery state identical to the uncompacted history
    val e2 = new KvEngine(spark, dir, autoCreate = true)
    assert(e2.readKey("cmp", "k") == "v12")
    (1 to 12).foreach(i => assert(e2.readKey("cmp", s"k$i") == s"x$i"))
    assert(e2.collection("cmp").count() == 13)
  }
}
