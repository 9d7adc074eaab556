package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws of time-based retention ([[Snapshots.vacuumOlderThan]]) and
  * orphan-file GC ([[Snapshots.removeOrphans]]): a generous window
  * reclaims nothing, a zero window degenerates to keep-latest (refs still
  * pin), orphan reaping touches exactly the unreferenced-and-aged files
  * (dry-run lists only, grace protects in-flight writers, referenced
  * bytes and manifest reads are untouched), empty stray dirs prune, and
  * the SQL faces ride the same code.
  */
class RetentionSpec extends SparkSpec {

  import spark.implicits._

  private def table(dir: String): Unit = {
    val base = Seq(
      (1L, "d01", 10.0),
      (2L, "d01", 11.0),
      (3L, "d02", 20.0),
      (4L, "d03", 30.0)).toDF("id", "day", "v")
    Sources.writeParquet(base.repartition(1), dir, partitionCols = Seq("day"))
  }

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("vacuumOlderThan: a generous window reclaims nothing; zero keeps only the head (refs still pin)") {
    val dir = Files.createTempDirectory("ret_time").toString + "/t"
    table(dir)
    Snapshots.commit(spark, dir, Seq("day"))
    Snapshots.createRef(spark, dir, "audit", 1L)
    Sources.deleteWhere(spark, dir, $"id" === 1L) // v2 (old d01 file archives; +baseline noop)
    Thread.sleep(20)
    Sources.deleteWhere(spark, dir, $"id" === 3L) // archives d02's file
    val latest = Snapshots.latestVersion(spark, dir)
    assert(Snapshots.vacuumOlderThan(spark, dir, 3600L * 1000).isEmpty, "everything is recent")
    assert(Snapshots.readSnapshot(spark, dir, 1L).count() == 4L)
    // zero window, but the 'audit' ref pins v1 — every pre-delete file is
    // still referenced, so nothing may reclaim and v1 stays readable
    assert(Snapshots.vacuumOlderThan(spark, dir, 0L).isEmpty, "the ref must pin v1's files")
    assert(Snapshots.readSnapshot(spark, dir, 1L).count() == 4L)
    // ref dropped: the zero window degenerates to keep-latest
    Snapshots.dropRef(spark, dir, "audit")
    val reclaimed = Snapshots.vacuumOlderThan(spark, dir, 0L)
    assert(
      reclaimed.exists(_.startsWith("day=d01/")) && reclaimed.exists(_.startsWith("day=d02/")),
      s"expected both pre-delete archives reclaimed, got $reclaimed")
    assert(Snapshots.readSnapshot(spark, dir, latest).count() == 2L)
  }

  test("removeOrphans: dry-run lists, the reap deletes exactly the aged stray, reads unchanged") {
    val dir = Files.createTempDirectory("ret_orph").toString + "/t"
    table(dir)
    Snapshots.commit(spark, dir, Seq("day"))
    val before = Snapshots.readSnapshot(spark, dir).collect().map(_.toString).sorted.toSeq
    val fs = fsOf(dir)
    // a crashed writer's stray: a REAL parquet part in an existing
    // partition dir, plus one in a brand-new partition value's dir
    val strayDf = Seq((99L, 99.0)).toDF("id", "v")
    val stage = Files.createTempDirectory("ret_stage").toString
    strayDf.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val s1 = new org.apache.hadoop.fs.Path(dir, "day=d01/stray-crashed-append.parquet")
    val s2 = new org.apache.hadoop.fs.Path(dir, "day=zzz/stray-new-partition.parquet")
    fs.mkdirs(s2.getParent)
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, s1, false, spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, s2, false, spark.sparkContext.hadoopConfiguration)
    val old = System.currentTimeMillis() - 10_000L
    fs.setTimes(s1, old, old)
    fs.setTimes(s2, old, old)
    // the crashed writer's dir is as old as its crash: age it too (a
    // FRESH dir is grace-protected — it may be a live landing's mkdirs)
    fs.setTimes(s2.getParent, old, old)
    // the stray poisons a LISTING-based read (manifest reads never see it)
    assert(spark.read.parquet(dir).count() == before.size + 2)
    val dry = Snapshots.removeOrphans(spark, dir, graceMs = 1000L, dryRun = true)
    assert(dry == Seq("day=d01/stray-crashed-append.parquet", "day=zzz/stray-new-partition.parquet"))
    assert(fs.exists(s1) && fs.exists(s2), "dry run must not delete")
    val reaped = Snapshots.removeOrphans(spark, dir, graceMs = 1000L)
    assert(reaped == dry)
    assert(!fs.exists(s1) && !fs.exists(s2))
    assert(!fs.exists(s2.getParent), "the stray-only partition dir must prune")
    assert(Snapshots.readSnapshot(spark, dir).collect().map(_.toString).sorted.toSeq == before)
    assert(spark.read.parquet(dir).count() == before.size, "the listing read agrees again")
    assert(Snapshots.removeOrphans(spark, dir, graceMs = 1000L).isEmpty, "idempotent")
  }

  test("removeOrphans: the grace window protects an in-flight writer's fresh DIRECTORY") {
    val dir = Files.createTempDirectory("ret_dirgrace").toString + "/t"
    table(dir)
    Snapshots.commit(spark, dir, Seq("day"))
    val fs = fsOf(dir)
    // a lock-free landing's mkdirs just created this partition dir; the
    // rename hasn't happened yet — the empty dir is EXACTLY what a live
    // writer looks like mid-landing and must survive the prune
    val inFlight = new org.apache.hadoop.fs.Path(dir, "day=landing/")
    fs.mkdirs(inFlight)
    assert(Snapshots.removeOrphans(spark, dir, graceMs = 1000L).isEmpty)
    assert(fs.exists(inFlight), "a dir younger than the grace must not prune")
    // once aged past the grace and still empty, the next pass tidies it
    val old = System.currentTimeMillis() - 10_000L
    fs.setTimes(inFlight, old, old)
    assert(Snapshots.removeOrphans(spark, dir, graceMs = 1000L).isEmpty)
    assert(!fs.exists(inFlight), "an aged empty stray dir prunes")
  }

  test("removeOrphans: the grace window protects an in-flight writer's fresh file") {
    val dir = Files.createTempDirectory("ret_grace").toString + "/t"
    table(dir)
    Snapshots.commit(spark, dir, Seq("day"))
    val fs = fsOf(dir)
    val fresh = new org.apache.hadoop.fs.Path(dir, "day=d01/landing-right-now.parquet")
    val out = fs.create(fresh, true)
    try out.write(Array.fill[Byte](16)(1))
    finally out.close()
    assert(Snapshots.removeOrphans(spark, dir, graceMs = 3600L * 1000).isEmpty)
    assert(fs.exists(fresh), "a file younger than the grace is never touched")
  }

  test("removeOrphans refuses a directory with no committed manifest") {
    val dir = Files.createTempDirectory("ret_refuse").toString + "/t"
    table(dir) // files, no manifest
    val e = intercept[IllegalArgumentException] { Snapshots.removeOrphans(spark, dir) }
    assert(e.getMessage.contains("no committed manifest"))
  }

  test("SQL faces: CALL vacuum(retain_ms) and CALL remove_orphans") {
    val base = Files.createTempDirectory("ret_sql").toString
    val dir = s"$base/t"
    table(dir)
    Snapshots.commit(spark, dir, Seq("day"))
    Sources.deleteWhere(spark, dir, $"id" === 3L)
    val fs = fsOf(dir)
    val stray = new org.apache.hadoop.fs.Path(dir, "day=d01/stray.bin")
    val out = fs.create(stray, true)
    try out.write(Array.fill[Byte](8)(7))
    finally out.close()
    val old = System.currentTimeMillis() - 10_000L
    fs.setTimes(stray, old, old)
    val cat = s"retsql_${java.lang.Long.toHexString(System.nanoTime())}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.snap.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", base)
    val dry = spark
      .sql(s"CALL $cat.remove_orphans(table => 't', grace_ms => 1000, dry_run => true)")
      .head().getLong(0)
    assert(dry == 1L && fs.exists(stray))
    val gone = spark
      .sql(s"CALL $cat.remove_orphans(table => 't', grace_ms => 1000)")
      .head().getLong(0)
    assert(gone == 1L && !fs.exists(stray))
    assert(spark.sql(s"CALL $cat.vacuum(table => 't', retain_ms => ${3600L * 1000})")
      .head().getLong(0) == 0L)
    val reclaimed = spark.sql(s"CALL $cat.vacuum(table => 't', retain_ms => 0)").head().getLong(0)
    assert(reclaimed >= 1L, "the zero window must reclaim the pre-delete archive")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 3L)
  }
}
