package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge-on-read deletion vectors: commit shape, read correctness across
  * every path (programmatic, SQL, row-level ops, CDC, streaming),
  * soundness gates on stats consumers, and lifecycle (materialize,
  * vacuum, clone, restore).
  */
class DeleteVectorsSpec extends SparkSpec {

  import spark.implicits._

  /** day-partitioned 4-row table with stats (day) — the SnapshotsSpec
    * fixture: day=2024-01-01 holds ids 1,2 in ONE file, so a delete of
    * id=2 exercises the partial-file path.
    */
  private def table(dir: String): Long = {
    val base = Seq(
      (1L, "2024-01-01", 10.0),
      (2L, "2024-01-01", 11.0),
      (3L, "2024-01-02", 20.0),
      (4L, "2024-01-03", 30.0)).toDF("id", "day", "v")
    Sources.writeParquet(base.repartition(1), dir, partitionCols = Seq("day"))
    Snapshots.commit(spark, dir, Seq("day", "id"))
  }

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double)] =
    df.select($"id", $"day".cast("string"), $"v")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet

  test("applyChanges nullSafeKeys: NULL-keyed rows vector, replace and delete like any other key") {
    val dir = Files.createTempDirectory("dv_nullsafe").toString + "/t"
    val rows = Seq(
      (Some("a"), 10L),
      (Some("b"), 20L),
      (Option.empty[String], 30L),
      (Option.empty[String], 30L)).toDF("k", "v")
    // the NULL key occupies TWO identical rows so the match must vector
    // both; stats on k give the narrowing its per-file null counts
    Sources.writeParquet(rows.repartition(1), dir)
    Snapshots.commit(spark, dir, Seq("k"))
    def state(): Seq[(Option[String], Long)] =
      Snapshots.readSnapshot(spark, dir).collect()
        .map(r => (Option(r.getString(0)), r.getLong(1))).toSeq.sortBy(t => (t._1, t._2))
    // DEFAULT face: SQL equality — a NULL-keyed change row matches
    // nothing (merge semantics), the fresh image just appends
    DeleteVectors.applyChanges(
      spark, dir,
      Seq((Option.empty[String], 31L, "u")).toDF("k", "v", "op"),
      Seq("k"), "op")
    assert(
      state() == Seq((None, 30L), (None, 30L), (None, 31L), (Some("a"), 10L), (Some("b"), 20L)),
      s"SQL-equality matching must not vector NULL keys: ${state()}")
    // NULL-SAFE face: the NULL group's old rows (all three now) die and
    // the replacement lands — one atomic version
    val v0 = Snapshots.latestVersion(spark, dir)
    DeleteVectors.applyChanges(
      spark, dir,
      Seq((Option.empty[String], 42L, "u")).toDF("k", "v", "op"),
      Seq("k"), "op", nullSafeKeys = true)
    assert(Snapshots.latestVersion(spark, dir) == v0 + 1L)
    assert(state() == Seq((None, 42L), (Some("a"), 10L), (Some("b"), 20L)), state().toString)
    // and a NULL-keyed DELETE op removes the group outright
    DeleteVectors.applyChanges(
      spark, dir,
      Seq((Option.empty[String], 0L, "d")).toDF("k", "v", "op"),
      Seq("k"), "op", nullSafeKeys = true)
    assert(state() == Seq((Some("a"), 10L), (Some("b"), 20L)), state().toString)
  }

  test("MoR delete removes rows without touching a data file; pre-delete version pins") {
    val dir = Files.createTempDirectory("dv_basic").toString + "/t"
    val v1 = table(dir)
    val filesBefore = Snapshots.listDataFiles(spark, dir)
    val (files, rows) = DeleteVectors.deleteWhere(spark, dir, $"id" % 2 === 0)
    assert(files == 2L && rows == 2L) // id=2 (day 01) and id=4 (day 03)
    // ZERO data-file churn: same live files, byte-identical
    assert(Snapshots.listDataFiles(spark, dir) == filesBefore)
    assert(Snapshots.latestVersion(spark, dir) == v1 + 1L)
    // live read subtracts; the pinned pre-delete version does not
    assert(rowSet(Snapshots.readSnapshot(spark, dir)) ==
      Set((1L, "2024-01-01", 10.0), (3L, "2024-01-02", 20.0)))
    assert(rowSet(Snapshots.readSnapshot(spark, dir, v1)).size == 4)
    // metadata-only count is logical
    assert(Snapshots.countRows(spark, dir) == 2L)
    assert(Snapshots.countRows(spark, dir, v1) == 4L)
    // sidecars live under the hidden .snap-dv tree, invisible to listers
    val dv = Snapshots.dvByRel(Snapshots.manifestView(spark, dir))
    assert(dv.size == 2 && dv.values.forall(_._1.startsWith(Snapshots.DvDirName + "/")))
    assert(dv.values.map(_._2).toSeq.sorted == Seq(1L, 1L))
  }

  test("overlapping second delete merges positions into one sidecar, counts stay exact") {
    val dir = Files.createTempDirectory("dv_merge").toString + "/t"
    table(dir)
    DeleteVectors.deleteWhere(spark, dir, $"id" === 1L)
    val (f2, r2) = DeleteVectors.deleteWhere(spark, dir, $"id" <= 2L) // id=1 again + id=2
    assert(f2 == 1L && r2 == 1L, s"only id=2 is NEW, got ($f2, $r2)")
    val dv = Snapshots.dvByRel(Snapshots.manifestView(spark, dir))
    assert(dv.size == 1, "one file touched → one pointer")
    assert(dv.values.head._2 == 2L, "sidecar holds the union of both deletes")
    assert(rowSet(Snapshots.readSnapshot(spark, dir)) ==
      Set((3L, "2024-01-02", 20.0), (4L, "2024-01-03", 30.0)))
    assert(Snapshots.countRows(spark, dir) == 2L)
    // a delete matching ONLY already-deleted rows commits nothing
    val before = Snapshots.latestVersion(spark, dir)
    assert(DeleteVectors.deleteWhere(spark, dir, $"id" === 1L) == ((0L, 0L)))
    assert(Snapshots.latestVersion(spark, dir) == before)
  }

  test("a fully-deleted file is pruned from scans but stays listed and restorable") {
    val dir = Files.createTempDirectory("dv_full").toString + "/t"
    val v1 = table(dir)
    DeleteVectors.deleteWhere(spark, dir, $"day" === "2024-01-02") // the whole file of id=3
    val view = Snapshots.manifestView(spark, dir)
    assert(view.rels.size == 3, "the file stays listed (pinned versions need it)")
    assert(rowSet(Snapshots.readSnapshot(spark, dir)).map(_._1) == Set(1L, 2L, 4L))
    // pruned read of just that partition: empty, not an error
    assert(Snapshots.readSnapshot(spark, dir, prune = Seq(("day", "2024-01-02", "2024-01-02"))).count() == 0L)
    assert(Snapshots.countRows(spark, dir) == 3L)
    assert(rowSet(Snapshots.readSnapshot(spark, dir, v1)).size == 4)
  }

  test("COW DML guards are SCOPED: ops touching a DV'd file refuse, ops bounded away run") {
    val dir = Files.createTempDirectory("dv_guard").toString + "/t"
    table(dir)
    DeleteVectors.deleteWhere(spark, dir, $"id" === 2L) // DV on day=01's file
    // touching the DV'd file refuses loudly (raw rewrite would resurrect)
    val e1 = intercept[RuntimeException](Sources.deleteWhere(spark, dir, $"id" === 1L))
    assert(e1.getMessage.contains("deletion vectors"))
    val e2 = intercept[RuntimeException](Sources.updateWhere(spark, dir, $"id" === 1L, Map("v" -> lit(0.0))))
    assert(e2.getMessage.contains("deletion vectors"))
    // bounded away from the DV'd file, the same ops run — and the vector
    // carries through their commits untouched
    val (df0, dr0) = Sources.deleteWhere(spark, dir, $"id" === 4L) // day=03's clean file
    assert(df0 == 1L && dr0 == 1L)
    val (uf0, ur0) = Sources.updateWhere(spark, dir, $"id" === 3L, Map("v" -> lit(21.0)))
    assert(uf0 == 1L && ur0 == 1L)
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir)).size == 1)
    assert(rowSet(Snapshots.readSnapshot(spark, dir)) ==
      Set((1L, "2024-01-01", 10.0), (3L, "2024-01-02", 21.0)))
    // a partitioned MERGE into an un-DV'd partition runs; into the DV'd one refuses
    val e3 = intercept[RuntimeException](Sources.mergeIntoPartitioned(
      spark, dir, Seq((9L, "2024-01-01", 90.0)).toDF("id", "day", "v"), "day", Seq("id")))
    assert(e3.getMessage.contains("deletion vectors"))
    Sources.mergeIntoPartitioned(
      spark, dir, Seq((9L, "2024-01-09", 90.0)).toDF("id", "day", "v"), "day", Seq("id"))
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir)).size == 1)
    // materialize folds the vector in: reads unchanged (plus the merge row),
    // pointers gone, COW ops on the formerly-DV'd file accepted again
    val liveBefore = rowSet(Snapshots.readSnapshot(spark, dir))
    val (mf, mp) = DeleteVectors.materialize(spark, dir)
    assert(mf == 1L && mp == 1L)
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir)).isEmpty)
    assert(rowSet(Snapshots.readSnapshot(spark, dir)) == liveBefore)
    // physical agreement: a raw directory read now matches too
    assert(spark.read.parquet(dir).count() == 3L)
    val (df2, dr2) = Sources.deleteWhere(spark, dir, $"id" === 1L)
    assert(df2 == 1L && dr2 == 1L)
  }

  test("compactInPlace FOLDS the rewritten scope's vectors and leaves other scopes pointed") {
    val (_, dir) = catalogTable("dvfold")
    // a second file in day=01 so the dir is a compaction target
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = Files.createTempDirectory("dv_fold_extra").toString + "/out"
    Seq((10L, 100.0)).toDF("id", "v").repartition(1).write.parquet(tmp)
    val part = fs
      .listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .get
    fs.rename(part, new org.apache.hadoop.fs.Path(dir, "day=2024-01-01/part-extra-fold.parquet"))
    Snapshots.commit(spark, dir) // v2
    DeleteVectors.deleteWhere(spark, dir, $"id" === 2L) // v3: DV in day=01
    DeleteVectors.deleteWhere(spark, dir, $"id" === 3L) // v4: DV in day=02 (fully deleted)
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir)).size == 2)
    val (dirs, before, after) = Sources.compactInPlace(spark, dir) // v5
    assert(dirs == 1L && before == 2L && after == 1L)
    val v5 = Snapshots.latestVersion(spark, dir)
    val dv = Snapshots.dvByRel(Snapshots.manifestView(spark, dir))
    assert(
      dv.keySet.map(_.split("/").head) == Set("day=2024-01-02"),
      s"day=01's vector must fold, day=02's must survive: $dv")
    assert(rowSet(Snapshots.readSnapshot(spark, dir)).map(_._1) == Set(1L, 10L, 4L))
    // physical proof: the compacted day=01 dir no longer holds the deleted row
    val raw01 = spark.read.parquet(s"$dir/day=2024-01-01").select($"id")
      .collect().map(_.getLong(0)).toSet
    assert(raw01 == Set(1L, 10L), s"folded rewrite must drop id=2, got $raw01")
    // CDC: a folding compaction is a PURE rewrite — the version nets nothing
    val net = spark.read
      .option("startingVersion", v5)
      .option("endingVersion", v5)
      .table("dvfold.ev.changes")
      .count()
    assert(net == 0L, s"compaction version must net zero changes, got $net")
  }

  test("partition-scoped compact/cluster: only matching dirs rewrite; predicates are typed") {
    val dir = Files.createTempDirectory("dv_scoped_opt").toString + "/t"
    table(dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // two extra files so BOTH day=01 and day=02 are compaction targets
    Seq(("2024-01-01", 10L), ("2024-01-02", 20L)).foreach { case (day, id) =>
      val tmp = Files.createTempDirectory(s"dv_opt_$id").toString + "/out"
      Seq((id, 100.0)).toDF("id", "v").repartition(1).write.parquet(tmp)
      val part = fs
        .listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath)
        .find(_.getName.endsWith(".parquet"))
        .get
      fs.rename(part, new org.apache.hadoop.fs.Path(dir, s"day=$day/part-extra-$id.parquet"))
    }
    Snapshots.commit(spark, dir)
    val day01Before = Snapshots.files(spark, dir).filter(_.startsWith("day=2024-01-01/")).toSet
    // typed predicate (day inferred as DATE): only day=02 compacts
    val (dirs, before, after) =
      Sources.compactInPlace(spark, dir, Some($"day" === "2024-01-02"))
    assert(dirs == 1L && before == 2L && after == 1L, s"got ($dirs, $before, $after)")
    assert(
      Snapshots.files(spark, dir).filter(_.startsWith("day=2024-01-01/")).toSet == day01Before,
      "the out-of-scope dir must keep its files")
    assert(Snapshots.files(spark, dir).count(_.startsWith("day=2024-01-02/")) == 1)
    // scoped clustering: only day=01 rewrites
    val files03 = Snapshots.files(spark, dir).filter(_.startsWith("day=2024-01-03/")).toSet
    val (scopes, _) =
      Sources.clusterInPlace(spark, dir, $"id", filesPerScope = 1, Some($"day" < "2024-01-02"))
    assert(scopes == 1L)
    assert(Snapshots.files(spark, dir).filter(_.startsWith("day=2024-01-03/")).toSet == files03)
    assert(rowSet(Snapshots.readSnapshot(spark, dir)).map(_._1) == Set(1L, 2L, 3L, 4L, 10L, 20L))
    // unpartitioned scope refuses loudly
    val flat = Files.createTempDirectory("dv_opt_flat").toString + "/t"
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v").repartition(2).write.parquet(flat)
    Snapshots.commit(spark, flat)
    intercept[IllegalArgumentException](
      Sources.compactInPlace(spark, flat, Some($"id" === 1L)))
  }

  test("clusterInPlace folds vectors too (every scope rewrites)") {
    val dir = Files.createTempDirectory("dv_cluster").toString + "/t"
    table(dir)
    DeleteVectors.deleteWhere(spark, dir, $"id" === 2L)
    val (scopes, before) = Sources.clusterInPlace(spark, dir, $"id", filesPerScope = 1)
    assert(scopes == 3L && before == 3L)
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir)).isEmpty)
    assert(rowSet(Snapshots.readSnapshot(spark, dir)).map(_._1) == Set(1L, 3L, 4L))
    assert(spark.read.parquet(dir).count() == 3L, "raw read agrees after the fold")
  }

  test("scoped materialize folds only the matching partitions' vectors") {
    val dir = Files.createTempDirectory("dv_scoped_mat").toString + "/t"
    table(dir)
    DeleteVectors.deleteWhere(spark, dir, $"id" === 2L) // day=01
    DeleteVectors.deleteWhere(spark, dir, $"id" === 4L) // day=03
    val (mf, mp) = DeleteVectors.materialize(spark, dir, Some($"day" === "2024-01-03"))
    assert(mf == 1L && mp == 1L, s"got ($mf, $mp)")
    val dv = Snapshots.dvByRel(Snapshots.manifestView(spark, dir))
    assert(dv.keySet.map(_.split("/").head) == Set("day=2024-01-01"), dv.toString)
    assert(rowSet(Snapshots.readSnapshot(spark, dir)).map(_._1) == Set(1L, 3L))
    // the folded partition accepts COW DML again; the pointed one refuses
    val (uf, ur) = Sources.updateWhere(spark, dir, $"day" === "2024-01-03", Map("v" -> lit(0.0)))
    assert(uf == 0L && ur == 0L, "day=03's only row was deleted — nothing to update")
    intercept[RuntimeException](Sources.deleteWhere(spark, dir, $"id" === 1L))
    // an unscoped pass finishes the job
    val (mf2, _) = DeleteVectors.materialize(spark, dir)
    assert(mf2 == 1L)
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir)).isEmpty)
    // a scope on a NON-partition column refuses loudly rather than guessing
    DeleteVectors.deleteWhere(spark, dir, $"id" === 1L)
    intercept[Exception](DeleteVectors.materialize(spark, dir, Some($"v" > 0.0)))
  }

  test("materialize archives a fully-deleted file instead of writing an empty rewrite") {
    val dir = Files.createTempDirectory("dv_matfull").toString + "/t"
    table(dir)
    DeleteVectors.deleteWhere(spark, dir, $"day" === "2024-01-02")
    val (mf, _) = DeleteVectors.materialize(spark, dir)
    assert(mf == 1L)
    val view = Snapshots.manifestView(spark, dir)
    assert(view.rels.size == 2, "the empty file left the live set")
    assert(Snapshots.readSnapshot(spark, dir).count() == 3L)
  }

  test("readAddedSince refuses across a DV change (rows were removed)") {
    val dir = Files.createTempDirectory("dv_added").toString + "/t"
    val v1 = table(dir)
    DeleteVectors.deleteWhere(spark, dir, $"id" === 2L)
    val e = intercept[IllegalArgumentException](Snapshots.readAddedSince(spark, dir, v1).count())
    assert(e.getMessage.contains("deletion vectors"))
    // diff (the full reconciliation) reports exactly the deleted row
    val d = Snapshots.diff(spark, dir, v1).collect()
    assert(d.length == 1 && d.head.getAs[String]("change") == "removed" && d.head.getAs[Long]("id") == 2L)
  }

  test("restore to the pre-delete version drops the pointers and revives the rows") {
    val dir = Files.createTempDirectory("dv_restore").toString + "/t"
    val v1 = table(dir)
    DeleteVectors.deleteWhere(spark, dir, $"id" <= 2L)
    assert(Snapshots.countRows(spark, dir) == 2L)
    val v3 = Snapshots.restore(spark, dir, v1)
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir, v3)).isEmpty)
    assert(rowSet(Snapshots.readSnapshot(spark, dir)).size == 4)
    assert(Snapshots.countRows(spark, dir) == 4L)
    // the DV'd middle version still pins
    assert(Snapshots.countRows(spark, dir, v1 + 1L) == 2L)
  }

  test("clone carries DV sidecars and pointers; the fork reads identically and evolves alone") {
    val dir = Files.createTempDirectory("dv_clone").toString + "/t"
    table(dir)
    DeleteVectors.deleteWhere(spark, dir, $"id" === 2L)
    val dst = Files.createTempDirectory("dv_clone_dst").toString + "/t"
    Snapshots.cloneSnapshot(spark, dir, dst)
    assert(rowSet(Snapshots.readSnapshot(spark, dst)) == rowSet(Snapshots.readSnapshot(spark, dir)))
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dst)).size == 1)
    assert(Snapshots.countRows(spark, dst) == 3L)
    // fork evolves alone: materializing the clone leaves the source DV'd
    DeleteVectors.materialize(spark, dst)
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dst)).isEmpty)
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir)).size == 1)
  }

  test("vacuum reaps superseded sidecars, keeps the ones retained manifests reference") {
    val dir = Files.createTempDirectory("dv_vacuum").toString + "/t"
    table(dir)
    DeleteVectors.deleteWhere(spark, dir, $"id" === 1L) // sidecar A (v2)
    DeleteVectors.deleteWhere(spark, dir, $"id" === 2L) // sidecar B supersedes A (v3)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dvFiles(): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(dir, Snapshots.DvDirName)
      if (!fs.exists(p)) Seq.empty
      else {
        def walk(d: org.apache.hadoop.fs.Path): Seq[String] =
          fs.listStatus(d).toSeq.flatMap(st =>
            if (st.isDirectory) walk(st.getPath) else Seq(st.getPath.getName))
        walk(p)
      }
    }
    assert(dvFiles().size == 2)
    // keep both DV versions: nothing reaped (v2's sidecar still referenced)
    Snapshots.vacuum(spark, dir, keepLast = 2)
    assert(dvFiles().size == 2)
    // keep only the latest: sidecar A is an expired version's — reaped
    Snapshots.vacuum(spark, dir, keepLast = 1)
    assert(dvFiles().size == 1)
    assert(rowSet(Snapshots.readSnapshot(spark, dir)).map(_._1) == Set(3L, 4L))
    // after materialize, the last sidecar becomes unreferenced history
    DeleteVectors.materialize(spark, dir)
    Snapshots.vacuum(spark, dir, keepLast = 1)
    assert(dvFiles().isEmpty)
  }

  test("positions are exact across multiple row groups (not first-group-relative)") {
    val dir = Files.createTempDirectory("dv_rowgroups").toString + "/t"
    // tiny row groups force several per file: positions past the first
    // group catch any reader that resets its ordinal per group
    val n = 50000
    spark
      .range(n.toLong)
      .select($"id", ($"id" % 97).cast("double").as("v"))
      .repartition(1)
      .write
      .option("parquet.block.size", (64 * 1024).toString)
      .option("parquet.page.size", (8 * 1024).toString)
      .parquet(dir)
    Snapshots.commit(spark, dir, Seq("id"))
    val (files, rows) = DeleteVectors.deleteWhere(spark, dir, $"id" % 1000 === 7)
    assert(files == 1L && rows == n / 1000L)
    val live = Snapshots.readSnapshot(spark, dir)
    assert(live.count() == n - n / 1000L)
    assert(live.filter($"id" % 1000 === 7).count() == 0L)
    // spot-check survivors around the holes — including deep in the file
    assert(live.filter($"id".isin(6L, 8L, 1006L, 49006L, 49008L)).count() == 5L)
    assert(live.filter($"id" === 49007L).count() == 0L, "a hole past the first row group")
  }

  /** Catalog fixture: `ev` under a fresh catalog name, MoR-ready. */
  private def catalogTable(name: String): (String, String) = {
    val base = Files.createTempDirectory("dv_cat").toString
    val dir = s"$base/ev"
    table(dir)
    spark.conf.set(s"spark.sql.catalog.$name", classOf[graft.sources.snap.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", base)
    (base, dir)
  }

  test("v2 batch scan (SPJ/DPP path) applies deletion vectors too") {
    val (_, dir) = catalogTable("dvv2")
    DeleteVectors.deleteWhere(spark, dir, $"id" % 2 === 0)
    val v1 = spark.sql("SELECT id, v FROM dvv2.ev ORDER BY id").collect().map(_.getLong(0)).toSeq
    val v2 = spark.read
      .option("batchscan", "v2")
      .table("dvv2.ev")
      .select($"id")
      .orderBy($"id")
      .collect()
      .map(_.getLong(0))
      .toSeq
    assert(v1 == Seq(1L, 3L) && v2 == v1, s"v1=$v1 v2=$v2")
  }

  test("insert-only stream: a DV commit is a change commit — fails loudly, skippable") {
    val (_, dir) = catalogTable("dvstream")
    import org.apache.spark.sql.streaming.Trigger
    def drain(skip: Boolean): Seq[Long] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val rd = spark.readStream
      val q = (if (skip) rd.option("skipChangeCommits", "true") else rd)
        .table("dvstream.ev")
        .writeStream
        .option("checkpointLocation", Files.createTempDirectory("dv_ck").toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach(r => got.add(r.getAs[Long]("id")))
        }
        .start()
      try q.awaitTermination()
      finally q.stop()
      scala.jdk.CollectionConverters.CollectionHasAsScala(got).asScala.toSeq.sorted
    }
    assert(drain(skip = false) == Seq(1L, 2L, 3L, 4L), "pre-delete history streams")
    DeleteVectors.deleteWhere(spark, dir, $"id" === 2L) // v2: a MoR change commit
    // recorded schema is (id, v, day): partition col appended by inference
    spark.sql("INSERT INTO dvstream.ev VALUES (9, 90.0, DATE'2024-01-09')") // v3: append
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](drain(skip = false))
    assert(
      e.getCause != null && e.getCause.getMessage.contains("merge-on-read"),
      s"unexpected failure: ${e.getCause}")
    // skipChangeCommits: the DV commit skips wholesale, appends still flow
    assert(drain(skip = true) == Seq(1L, 2L, 3L, 4L, 9L))
  }

  test("streaming changes feed emits the MoR delete and matches batch") {
    val (_, dir) = catalogTable("dvcdc")
    DeleteVectors.deleteWhere(spark, dir, $"id" <= 2L)
    import org.apache.spark.sql.streaming.Trigger
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val q = spark.readStream
      .table("dvcdc.ev.changes")
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("dv_cdc_ck").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r =>
          got.add((r.getAs[Long]("id"), r.getAs[String]("_change_type"), r.getAs[Long]("_commit_version"))))
      }
      .start()
    try q.awaitTermination()
    finally q.stop()
    val streamed = scala.jdk.CollectionConverters.CollectionHasAsScala(got).asScala.toSeq.sorted
    val batch = spark.read
      .table("dvcdc.ev.changes")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"), r.getAs[Long]("_commit_version")))
      .toSeq
      .sorted
    assert(streamed == batch, s"stream/batch divergence:\n$streamed\nvs\n$batch")
    assert(streamed.filter(_._2 == "delete") == Seq((1L, "delete", 2L), (2L, "delete", 2L)))
  }

  test("re-deleting already-deleted rows of a PARTIALLY deleted file commits nothing") {
    val dir = Files.createTempDirectory("dv_redelete").toString + "/t"
    table(dir)
    DeleteVectors.deleteWhere(spark, dir, $"id" === 1L) // day=01 file keeps id=2
    val v = Snapshots.latestVersion(spark, dir)
    val dvBefore = Snapshots.dvByRel(Snapshots.manifestView(spark, dir))
    // same predicate again: the file is NOT fully deleted (so it stays a
    // candidate and re-matches the raw row), yet the position set is
    // unchanged — no version, no pointer churn, no spurious change commit
    assert(DeleteVectors.deleteWhere(spark, dir, $"id" === 1L) == ((0L, 0L)))
    assert(Snapshots.latestVersion(spark, dir) == v)
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir)) == dvBefore)
    assert(Snapshots.dvChangedRels(spark, dir, v).nonEmpty) // the real delete
  }

  test("hybrid grouped aggregate pushdown folds manifest + scanned sides per group") {
    val (_, dir) = catalogTable("dvhyb")
    // a second, CLEAN file in day=01 so that group mixes both sides
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = Files.createTempDirectory("dv_hyb_extra").toString + "/out"
    Seq((10L, 100.0)).toDF("id", "v").repartition(1).write.parquet(tmp)
    val part = fs
      .listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .get
    fs.rename(part, new org.apache.hadoop.fs.Path(dir, "day=2024-01-01/part-extra-hyb.parquet"))
    Snapshots.commit(spark, dir)
    DeleteVectors.deleteWhere(spark, dir, $"id" === 2L) // vector in day=01's FIRST file
    val df = spark.sql(
      "SELECT day, count(*) AS n, count(id) AS ni, min(id) AS mn, max(id) AS mx " +
        "FROM dvhyb.ev GROUP BY day ORDER BY day")
    val descs = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        if (r.scan.getClass.getSimpleName == "V1ScanWrapper")
          r.scan.getClass.getMethod("v1Scan").invoke(r.scan)
            .asInstanceOf[org.apache.spark.sql.connector.read.Scan].description()
        else r.scan.description()
    }
    assert(
      descs.exists(d => d.contains("GraftSnapAggScan") && d.contains("hybrid: 1/4")),
      s"expected a hybrid pushdown over 1 DV'd of 4 files, got $descs")
    val rows = df.collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(
      rows == Seq(
        ("2024-01-01", 2L, 2L, 1L, 10L), // clean extreme 10 folded with scanned survivor 1
        ("2024-01-02", 1L, 1L, 3L, 3L),
        ("2024-01-03", 1L, 1L, 4L, 4L)),
      rows.toString)
    // DATE extremes fold too — and under java8API the scanned side comes
    // back as LocalDate, which the fold must compare chronologically
    val mmd = spark.sql("SELECT min(day) AS mnd, max(day) AS mxd FROM dvhyb.ev").head()
    assert(mmd.getDate(0).toString == "2024-01-01" && mmd.getDate(1).toString == "2024-01-03")
    spark.conf.set("spark.sql.datetime.java8API.enabled", "true")
    try {
      val r8 = spark.sql("SELECT min(day) AS mnd, max(day) AS mxd FROM dvhyb.ev").head()
      assert(
        r8.getAs[java.time.LocalDate](0).toString == "2024-01-01" &&
          r8.getAs[java.time.LocalDate](1).toString == "2024-01-03")
    } finally spark.conf.unset("spark.sql.datetime.java8API.enabled")
    // COUNT(*) alone never scans — manifest-only even with the vector live
    val cnt = spark.sql("SELECT count(*) AS n FROM dvhyb.ev")
    val cntDescs = cnt.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        if (r.scan.getClass.getSimpleName == "V1ScanWrapper")
          r.scan.getClass.getMethod("v1Scan").invoke(r.scan)
            .asInstanceOf[org.apache.spark.sql.connector.read.Scan].description()
        else r.scan.description()
    }
    assert(cntDescs.exists(_.contains("manifest-only, zero file opens")), cntDescs.toString)
    assert(cnt.head().getLong(0) == 4L)
  }

  test("grouped COUNT(*) pushdown emits NO row for a fully-deleted group") {
    val (_, dir) = catalogTable("dvgrp")
    DeleteVectors.deleteWhere(spark, dir, $"day" === "2024-01-02") // kills that day's only file
    val df = spark.sql("SELECT day, count(*) AS n FROM dvgrp.ev GROUP BY day ORDER BY day")
    val descs = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        if (r.scan.getClass.getSimpleName == "V1ScanWrapper")
          r.scan.getClass.getMethod("v1Scan").invoke(r.scan)
            .asInstanceOf[org.apache.spark.sql.connector.read.Scan].description()
        else r.scan.description()
    }
    assert(descs.exists(_.contains("GraftSnapAggScan")), s"expected pushdown, got $descs")
    val rows = df.collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(
      rows == Seq(("2024-01-01", 2L), ("2024-01-03", 1L)),
      s"a fully-deleted group must vanish, got $rows")
  }

  test("MoR delete and reads survive URI-special characters in root and partition values") {
    val base = Files.createTempDirectory("dv sp%ace").toString
    val dir = s"$base/t t"
    val rows = Seq(
      (1L, "a b", 1.0), (2L, "a b", 2.0),
      (3L, "c%d", 3.0), (4L, "e+f", 4.0)).toDF("id", "k", "v")
    Sources.writeParquet(rows.repartition(1), dir, partitionCols = Seq("k"))
    Snapshots.commit(spark, dir, Seq("id"))
    val (files, deleted) = DeleteVectors.deleteWhere(spark, dir, $"id".isin(1L, 3L, 4L))
    assert(files == 3L && deleted == 3L, s"got ($files, $deleted)")
    val live = Snapshots.readSnapshot(spark, dir)
    assert(live.select($"id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(Snapshots.countRows(spark, dir) == 1L)
  }

  test("MoR delete stats-prunes its match scan: non-matching files are never opened") {
    val dir = Files.createTempDirectory("dv_prune").toString + "/t"
    table(dir)
    // corrupt the day=2024-01-03 data file IN PLACE (manifest entry kept,
    // checksum sidecar removed): any scan that opens it now fails — so a
    // green day-bounded delete PROVES the pruning skipped the file
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = Snapshots.files(spark, dir).find(_.startsWith("day=2024-01-03/")).get
    val vPath = new org.apache.hadoop.fs.Path(dir, victim)
    val crc = new org.apache.hadoop.fs.Path(vPath.getParent, s".${vPath.getName}.crc")
    if (fs.exists(crc)) fs.delete(crc, false)
    val out = fs.create(vPath, true)
    try out.write("not parquet".getBytes("UTF-8"))
    finally out.close()
    val (files, rows) = DeleteVectors.deleteWhere(spark, dir, $"day" === "2024-01-01")
    assert(files == 1L && rows == 2L)
    // and the un-pruned shape would indeed have failed
    intercept[Throwable](DeleteVectors.deleteWhere(spark, dir, $"v" > 100.0))
  }

  test("cat.t.dvs metadata table reports per-file vector state, manifest-only") {
    val (_, dir) = catalogTable("dvmeta")
    DeleteVectors.deleteWhere(spark, dir, $"id" <= 2L) // both rows of day=01's file
    DeleteVectors.deleteWhere(spark, dir, $"id" === 3L) // one of day=02's
    val rows = spark
      .sql("SELECT rel, n_deleted, n_rows, fully_deleted FROM dvmeta.ev.dvs ORDER BY rel")
      .collect()
      .map(r => (r.getString(0).split("/").head, r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(
      rows == Seq(("day=2024-01-01", 2L, 2L, true), ("day=2024-01-02", 1L, 1L, true)),
      rows.toString)
    // a version pin shows the DV state AS OF that version
    assert(spark.sql("SELECT * FROM dvmeta.ev.dvs VERSION AS OF 2").count() == 1L)
    assert(spark.sql("SELECT * FROM dvmeta.ev.dvs VERSION AS OF 1").count() == 0L)
    // after materialize the table is empty again
    DeleteVectors.materialize(spark, dir)
    assert(spark.sql("SELECT * FROM dvmeta.ev.dvs").count() == 0L)
  }

  test("a lock-free append racing the DV commit: both land, neither is lost") {
    val dir = Files.createTempDirectory("dv_race").toString + "/t"
    table(dir)
    // claim the DV commit's version slot out from under it ONCE: the
    // restated commit must rebase onto the appender's version and retry
    // (the appender's file untouched, the pointers landing on top)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val extraRel = "day=2024-01-09/part-race-append.parquet"
    val extra = Seq((9L, 90.0)).toDF("id", "v")
    val tmp = Files.createTempDirectory("dv_race_extra").toString + "/out"
    extra.repartition(1).write.parquet(tmp)
    val part = fs
      .listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .get
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "day=2024-01-09"))
    fs.rename(part, new org.apache.hadoop.fs.Path(dir, extraRel))
    val appended = new java.util.concurrent.atomic.AtomicLong(-1L)
    val racer = new Thread(() => {
      // wait until the delete's match scan is plausibly underway, then
      // take the next slot lock-free
      Thread.sleep(300)
      appended.set(Snapshots.commitAppend(spark, dir, Seq(extraRel)))
    })
    racer.start()
    val (files, rows) = DeleteVectors.deleteWhere(spark, dir, $"id" === 2L)
    racer.join(30000)
    assert(files == 1L && rows == 1L)
    val latest = Snapshots.manifestView(spark, dir)
    assert(latest.rels.contains(extraRel), "the racer's append must survive the DV commit")
    assert(Snapshots.dvByRel(latest).size == 1, "the DV pointer must survive the append")
    val ids = Snapshots.readSnapshot(spark, dir).select($"id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L, 4L, 9L), ids.toString)
  }

  test("bounded MoR: crossing the deleted-fraction threshold rewrites the file in the same commit") {
    val (_, dir) = catalogTable("dvbound")
    spark.conf.set("spark.graft.dv.maxDeletedFraction", "0.4")
    try {
      // day=01's file holds ids 1,2 — deleting one is a 0.5 fraction,
      // strictly above the 0.4 threshold with a survivor: the file must
      // REWRITE (no pointer), atomically with the commit
      val v1 = Snapshots.latestVersion(spark, dir)
      val day01Before = Snapshots.files(spark, dir).filter(_.startsWith("day=2024-01-01/"))
      val (files, rows) = DeleteVectors.deleteWhere(spark, dir, $"id" === 1L)
      assert(files == 1L && rows == 1L)
      assert(Snapshots.latestVersion(spark, dir) == v1 + 1L, "one atomic version")
      val view = Snapshots.manifestView(spark, dir)
      assert(Snapshots.dvByRel(view).isEmpty, "above-threshold file must not keep a pointer")
      val day01After = view.rels.filter(_.startsWith("day=2024-01-01/"))
      assert(day01After.size == 1 && day01After != day01Before, "replacement under a fresh name")
      assert(rowSet(Snapshots.readSnapshot(spark, dir)).map(_._1) == Set(2L, 3L, 4L))
      assert(rowSet(Snapshots.readSnapshot(spark, dir, v1)).size == 4, "pre-delete version pins")
      // CDC nets exactly the deleted row across the rewrite
      val ch = spark.read
        .option("startingVersion", v1 + 1L)
        .table("dvbound.ev.changes")
        .select($"id", $"_change_type")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .toSeq
      assert(ch == Seq((1L, "delete")), ch.toString)
      // BELOW the threshold (or provably empty) files still take pointers:
      // deleting day=02's only row is a 1.0 fraction but zero survivors
      DeleteVectors.deleteWhere(spark, dir, $"day" === "2024-01-02")
      assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir)).size == 1)
    } finally spark.conf.unset("spark.graft.dv.maxDeletedFraction")
  }

  test("materialize on a row-count-less manifest archives fully-deleted files, lands no empty rewrite") {
    // schema recorded but NO stats columns: fullyDeleted can't be decided
    // from the manifest, so the staged footer must be the authority
    val base = Files.createTempDirectory("dv_nostats").toString
    val dir = s"$base/t"
    Snapshots.createTable(
      spark,
      dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("day", org.apache.spark.sql.types.DateType))),
      partCols = Seq("day"))
    spark.conf.set(s"spark.sql.catalog.dvns", classOf[graft.sources.snap.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.dvns.root", base)
    spark.sql(
      "INSERT INTO dvns.t VALUES (1, 10.0, DATE'2024-01-01'), (2, 11.0, DATE'2024-01-01'), " +
        "(3, 20.0, DATE'2024-01-02')")
    assert(
      Snapshots.manifestView(spark, dir).stats.values
        .forall(st => !st.contains(Snapshots.RowCountKey)),
      "fixture must have no recorded row counts")
    DeleteVectors.deleteWhere(spark, dir, $"day" === "2024-01-01") // kills that file entirely
    DeleteVectors.materialize(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = Snapshots.files(spark, dir)
    live.foreach { rel =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(dir, rel),
          spark.sparkContext.hadoopConfiguration))
      try assert(r.getRecordCount > 0L, s"$rel committed as an empty file")
      finally r.close()
    }
    assert(spark.sql("SELECT id FROM dvns.t").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("MoR upsert: matched rows become vectors, source rows append, ONE commit") {
    val dir = Files.createTempDirectory("dv_upsert").toString + "/t"
    val v1 = table(dir)
    val filesBefore = Snapshots.files(spark, dir).toSet
    val src = Seq((2L, "2024-01-01", 110.0), (9L, "2024-01-09", 90.0)).toDF("id", "day", "v")
    val (touched, deleted) = DeleteVectors.upsert(spark, dir, src, Seq("day", "id"))
    assert(touched == 1L && deleted == 1L, s"got ($touched, $deleted)")
    assert(Snapshots.latestVersion(spark, dir) == v1 + 1L, "one atomic version")
    val filesAfter = Snapshots.files(spark, dir).toSet
    assert(filesBefore.subsetOf(filesAfter), "nothing rewritten or archived")
    assert((filesAfter -- filesBefore).nonEmpty, "the epoch's rows landed as new files")
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir)).size == 1)
    assert(rowSet(Snapshots.readSnapshot(spark, dir)) == Set(
      (1L, "2024-01-01", 10.0),
      (2L, "2024-01-01", 110.0),
      (3L, "2024-01-02", 20.0),
      (4L, "2024-01-03", 30.0),
      (9L, "2024-01-09", 90.0)))
    assert(Snapshots.countRows(spark, dir) == 5L, "metadata count stays exact")
    // snapshot isolation: the pre-upsert version still reads the old row
    assert(rowSet(Snapshots.readSnapshot(spark, dir, v1))
      .contains((2L, "2024-01-01", 11.0)))
    // insert-only epoch: no matches, still one commit, no pointer churn
    val (t2, d2) =
      DeleteVectors.upsert(spark, dir, Seq((7L, "2024-01-07", 70.0)).toDF("id", "day", "v"), Seq("day", "id"))
    assert(t2 == 0L && d2 == 0L)
    assert(Snapshots.countRows(spark, dir) == 6L)
  }

  test("MoR upsert epochs: high-water replay skip; two streamed epochs ≡ one batch apply") {
    val a = Files.createTempDirectory("dv_ups_a").toString + "/t"
    val b = Files.createTempDirectory("dv_ups_b").toString + "/t"
    table(a); table(b)
    val e0 = Seq((2L, "2024-01-01", 110.0), (9L, "2024-01-09", 90.0)).toDF("id", "day", "v")
    val e1 = Seq((9L, "2024-01-09", 91.0), (3L, "2024-01-02", 21.0)).toDF("id", "day", "v")
    DeleteVectors.upsert(spark, a, e0, Seq("day", "id"), streamTag = "q", epochId = 0L)
    val vAfter0 = Snapshots.latestVersion(spark, a)
    // replayed epoch: skipped whole — no version, no vectors, no files
    assert(DeleteVectors.upsert(spark, a, e0, Seq("day", "id"), streamTag = "q", epochId = 0L) == ((0L, 0L)))
    assert(Snapshots.latestVersion(spark, a) == vAfter0)
    DeleteVectors.upsert(spark, a, e1, Seq("day", "id"), streamTag = "q", epochId = 1L)
    // the batch twin applies both epochs in order, un-tagged
    DeleteVectors.upsert(spark, b, e0, Seq("day", "id"))
    DeleteVectors.upsert(spark, b, e1, Seq("day", "id"))
    assert(rowSet(Snapshots.readSnapshot(spark, a)) == rowSet(Snapshots.readSnapshot(spark, b)))
    assert(rowSet(Snapshots.readSnapshot(spark, a)).contains((9L, "2024-01-09", 91.0)),
      "epoch 1's update wins over epoch 0's insert")
  }

  test("applyChanges: deletes become vectors only, upserts append, ONE commit") {
    val dir = Files.createTempDirectory("dv_cdc_apply").toString + "/t"
    val v1 = table(dir)
    val filesBefore = Snapshots.files(spark, dir).toSet
    val changes = Seq(
      ("d", 2L, "2024-01-01", 0.0), // delete: only the key matters
      ("u", 3L, "2024-01-02", 21.0), // update: full replacement row
      ("i", 9L, "2024-01-09", 90.0) // insert: no match
    ).toDF("op", "id", "day", "v")
    val (touched, deleted) =
      DeleteVectors.applyChanges(spark, dir, changes, Seq("day", "id"), "op")
    assert(touched == 2L && deleted == 2L, s"got ($touched, $deleted)")
    assert(Snapshots.latestVersion(spark, dir) == v1 + 1L, "one atomic version")
    assert(filesBefore.subsetOf(Snapshots.files(spark, dir).toSet), "nothing rewritten")
    assert(rowSet(Snapshots.readSnapshot(spark, dir)) == Set(
      (1L, "2024-01-01", 10.0),
      (3L, "2024-01-02", 21.0),
      (4L, "2024-01-03", 30.0),
      (9L, "2024-01-09", 90.0)))
    // the deleted key left NO appended copy: day=01 gained no file
    assert(
      (Snapshots.files(spark, dir).toSet -- filesBefore)
        .forall(r => !r.startsWith("day=2024-01-01/")),
      "a delete row must not land an appended image")
    assert(Snapshots.countRows(spark, dir) == 4L)
  }

  test("a crashed epoch's landed-but-uncommitted files are swept before the retry lands") {
    val dir = Files.createTempDirectory("dv_ups_crash").toString + "/t"
    table(dir)
    // simulate a crash between landing and commit: a file with THIS
    // epoch's prefix sits live and uncommitted in a dir the retry lands
    // into — a listing-based commit would adopt it as duplicate rows
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = Files.createTempDirectory("dv_ups_leftover").toString + "/out"
    Seq((999L, 999.0)).toDF("id", "v").repartition(1).write.parquet(tmp)
    val part = fs
      .listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .get
    val leftover = new org.apache.hadoop.fs.Path(dir, "day=2024-01-01/mor-q-0-part-leftover.parquet")
    fs.rename(part, leftover)
    DeleteVectors.upsert(
      spark,
      dir,
      Seq((2L, "2024-01-01", 110.0)).toDF("id", "day", "v"),
      Seq("day", "id"),
      streamTag = "q",
      epochId = 0L)
    assert(!fs.exists(leftover), "the retry must sweep the crashed attempt's leftover")
    assert(Snapshots.readSnapshot(spark, dir).filter($"id" === 999L).count() == 0L)
    assert(rowSet(Snapshots.readSnapshot(spark, dir)).contains((2L, "2024-01-01", 110.0)))
  }

  test("non-partition-keyed upsert narrows candidates by key min/max, then blooms") {
    val dir = Files.createTempDirectory("dv_ups_narrow").toString + "/t"
    // day=01 holds ids {1,3}, day=02 ids {2,4}: the value RANGES overlap,
    // so only the bloom stage can tell the files apart for a point key
    Seq(
      (1L, "2024-01-01", 10.0),
      (3L, "2024-01-01", 30.0),
      (2L, "2024-01-02", 20.0),
      (4L, "2024-01-02", 40.0)).toDF("id", "day", "v")
      .repartition(1)
      .write
      .partitionBy("day")
      .parquet(dir)
    Snapshots.commit(spark, dir, Seq("day", "id"), Seq("id"))
    // keys = (id) only — NOT covering the partition column: before r13
    // this scanned every live file per epoch
    val (t1, d1) = DeleteVectors.upsert(
      spark, dir, Seq((4L, "2024-01-02", 44.0)).toDF("id", "day", "v"), Seq("id"))
    assert(t1 == 1L && d1 == 1L)
    assert(
      DeleteVectors.lastUpsertCandidateFiles.get() == 1L,
      s"range stage must keep only day=02's file (id∈[2,4]), " +
        s"got ${DeleteVectors.lastUpsertCandidateFiles.get()}")
    // a point key inside BOTH ranges: the bloom stage must still exclude
    // the file that never held the value (id=2 matches [1,3] by range but
    // not by bloom — and it is now DV'd in day=02, which is fine: the
    // match scan reads raw and re-matching dead rows dedups)
    val (t2, _) = DeleteVectors.upsert(
      spark, dir, Seq((2L, "2024-01-02", 22.0)).toDF("id", "day", "v"), Seq("id"))
    assert(t2 == 1L)
    assert(
      DeleteVectors.lastUpsertCandidateFiles.get() == 1L,
      s"bloom stage must drop the range-overlapping file that never held id=2, " +
        s"got ${DeleteVectors.lastUpsertCandidateFiles.get()}")
    assert(rowSet(Snapshots.readSnapshot(spark, dir)) == Set(
      (1L, "2024-01-01", 10.0),
      (3L, "2024-01-01", 30.0),
      (2L, "2024-01-02", 22.0),
      (4L, "2024-01-02", 44.0)))
    // an all-null key batch provably matches nothing and scans nothing
    val nullKeys = Seq(("2024-01-02", 1.0)).toDF("day", "v")
      .withColumn("id", lit(null).cast("long"))
    val (t3, d3) = DeleteVectors.upsert(spark, dir, nullKeys, Seq("id"))
    assert(t3 == 0L && d3 == 0L)
    assert(DeleteVectors.lastUpsertCandidateFiles.get() == 0L)
  }

  test("FLOAT-keyed upsert: range narrowing widens probes through the stats' double domain") {
    val dir = Files.createTempDirectory("dv_ups_float").toString + "/t"
    // 0.1f's manifest stat is the WIDENED double ("0.10000000149011612");
    // a probe rendered by CAST(float AS STRING) reads "0.1" — compared as
    // doubles the file's interval would wrongly miss its own boundary
    // value, the matched row would never vector, and the upsert would
    // land a duplicate key
    Seq(
      (0.1f, "2024-01-01", 10.0),
      (0.7f, "2024-01-02", 20.0)).toDF("f", "day", "v")
      .repartition(1)
      .write
      .partitionBy("day")
      .parquet(dir)
    Snapshots.commit(spark, dir, Seq("day", "f"))
    val (t1, d1) = DeleteVectors.upsert(
      spark, dir, Seq((0.1f, "2024-01-01", 11.0)).toDF("f", "day", "v"), Seq("f"))
    assert(t1 == 1L && d1 == 1L, s"boundary float key must match its file, got ($t1, $d1)")
    assert(
      DeleteVectors.lastUpsertCandidateFiles.get() == 1L,
      "the widened probe must keep exactly the matching file")
    val rows = Snapshots.readSnapshot(spark, dir)
      .select($"f", $"v").collect().map(r => (r.getFloat(0), r.getDouble(1))).toSet
    assert(rows == Set((0.1f, 11.0), (0.7f, 20.0)), s"no duplicate key may survive: $rows")
  }

  test("bloom probes hit the byte-budgeted LRU cache on a repeat narrowing epoch") {
    val dir = Files.createTempDirectory("dv_ups_bloomcache").toString + "/t"
    Seq(
      (1L, "2024-01-01", 10.0),
      (3L, "2024-01-01", 30.0),
      (2L, "2024-01-02", 20.0),
      (4L, "2024-01-02", 40.0)).toDF("id", "day", "v")
      .repartition(1)
      .write
      .partitionBy("day")
      .parquet(dir)
    Snapshots.commit(spark, dir, Seq("day", "id"), Seq("id"))
    // epoch 1 warms the cache (some reads allowed); epoch 2 probes the
    // SAME files' sidecars and must read NOTHING from the filesystem —
    // the per-epoch driver-I/O tax the entry-capped cache used to pay
    DeleteVectors.upsert(
      spark, dir, Seq((2L, "2024-01-02", 22.0)).toDF("id", "day", "v"), Seq("id"))
    Snapshots.lastBloomReads.set(0L)
    // key id=3: range keeps exactly the two ORIGINAL files (epoch 1's
    // appended file spans [2,2] and is range-excluded), both of whose
    // sidecars epoch 1 already decoded
    DeleteVectors.upsert(
      spark, dir, Seq((3L, "2024-01-01", 33.0)).toDF("id", "day", "v"), Seq("id"))
    assert(
      Snapshots.lastBloomReads.get() == 0L,
      s"second epoch re-read ${Snapshots.lastBloomReads.get()} bloom sidecars from the FS")
  }

  test("ad-hoc upsert sweeps a crashed PRIOR attempt's leftovers (constant prefix)") {
    val dir = Files.createTempDirectory("dv_adhoc_crash").toString + "/t"
    table(dir)
    // a prior ad-hoc upsert crashed between landing and commit: its file
    // sits live, uncommitted, under the ad-hoc prefix — with a
    // per-attempt random tag the retry could never recognize it
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = Files.createTempDirectory("dv_adhoc_leftover").toString + "/out"
    Seq((999L, 999.0)).toDF("id", "v").repartition(1).write.parquet(tmp)
    val part = fs
      .listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .get
    val leftover = new org.apache.hadoop.fs.Path(dir, "day=2024-01-01/mor-adhoc-part-crash.parquet")
    fs.rename(part, leftover)
    DeleteVectors.upsert(
      spark, dir, Seq((2L, "2024-01-01", 110.0)).toDF("id", "day", "v"), Seq("day", "id"))
    assert(!fs.exists(leftover), "the ad-hoc sweep must remove the crashed attempt's leftover")
    assert(Snapshots.readSnapshot(spark, dir).filter($"id" === 999L).count() == 0L)
    assert(rowSet(Snapshots.readSnapshot(spark, dir)).contains((2L, "2024-01-01", 110.0)))
  }

  test("a delete-only CDC epoch on an unpartitioned table lands NO zero-row file") {
    val dir = Files.createTempDirectory("dv_del_only").toString + "/t"
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
      .repartition(1)
      .write
      .parquet(dir)
    Snapshots.commit(spark, dir, Seq("id"))
    val filesBefore = Snapshots.files(spark, dir)
    val changes = Seq(("d", 2L, 0.0)).toDF("op", "id", "v")
    val (touched, deleted) =
      DeleteVectors.applyChanges(spark, dir, changes, Seq("id"), "op")
    assert(touched == 1L && deleted == 1L)
    assert(
      Snapshots.files(spark, dir) == filesBefore,
      "a pure-delete epoch must not append an empty parquet file")
    assert(Snapshots.countRows(spark, dir) == 2L)
    assert(rowSet2(Snapshots.readSnapshot(spark, dir)) == Set((1L, 10.0), (3L, 30.0)))
  }

  private def rowSet2(df: org.apache.spark.sql.DataFrame): Set[(Long, Double)] =
    df.select($"id", $"v").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

  test("branch MoR delete: branch reads subtract, live untouched, fast-forward carries the vectors") {
    val dir = Files.createTempDirectory("dv_branch_del").toString + "/t"
    table(dir) // day=01 holds ids 1,2 in ONE file; day=02 id 3; day=03 id 4
    Snapshots.createBranch(spark, dir, "dev")
    // a branch APPEND first, so the delete can also hit a branch-private file
    Snapshots.appendToBranch(
      spark, dir, "dev", Seq((9L, "2024-01-09", 90.0), (10L, "2024-01-09", 100.0)).toDF("id", "day", "v"))
    // delete id=2 (a FORK file's row) and id=10 (a BRANCH file's row) — on the branch
    val (f1, r1) = DeleteVectors.deleteOnBranch(spark, dir, "dev", $"id" === 2L || $"id" === 10L)
    assert(f1 == 2L && r1 == 2L, s"got ($f1, $r1)")
    // the LIVE line is byte-for-byte untouched: no version, no pointers
    assert(Snapshots.latestVersion(spark, dir) == 1L)
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir)).isEmpty)
    assert(rowSet(Snapshots.readSnapshot(spark, dir)).map(_._1) == Set(1L, 2L, 3L, 4L))
    // the branch subtracts both
    assert(idsOf2(Snapshots.readBranch(spark, dir, "dev")) == Set(1L, 3L, 4L, 9L))
    // idempotence: re-deleting already-deleted rows commits nothing
    assert(DeleteVectors.deleteOnBranch(spark, dir, "dev", $"id" === 2L) == ((0L, 0L)))
    // vacuum keeps branch-line DV sidecars alive (they live only in
    // branch manifests)
    Snapshots.vacuum(spark, dir, keepLast = 1)
    assert(idsOf2(Snapshots.readBranch(spark, dir, "dev")) == Set(1L, 3L, 4L, 9L))
    // fast-forward adopts BOTH vector kinds: the fork file's pointer
    // restates on main (same sidecar — its embedded rel didn't move), the
    // moved branch file's sidecar is REHOMED to the new rel
    val v = Snapshots.fastForward(spark, dir, "dev")
    assert(v == 2L)
    assert(idsOf2(Snapshots.readSnapshot(spark, dir)) == Set(1L, 3L, 4L, 9L))
    assert(Snapshots.countRows(spark, dir) == 4L, "metadata count subtracts the adopted vectors")
    val dv = Snapshots.dvByRel(Snapshots.manifestView(spark, dir))
    assert(dv.size == 2, s"both adopted files carry pointers: $dv")
    assert(dv.keySet.forall(!_.startsWith(Snapshots.BranchDataDirName)), dv.keySet.toString)
    // the rehomed sidecar's embedded rel matches its moved file (the
    // anti-join would silently resurrect id=10 otherwise — the read above
    // already proved it, this pins the mechanism)
    val movedRel = dv.keySet.find(_.startsWith("day=2024-01-09/")).get
    val sidecar = spark.read.parquet(s"$dir/${dv(movedRel)._1}")
    assert(sidecar.select($"rel").as[String].collect().toSet == Set(movedRel))
  }

  private def idsOf2(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select($"id").as[Long].collect().toSet

  test("branch MoR upsert: matched rows vector + rows append in ONE branch version; adoption carries both") {
    val dir = Files.createTempDirectory("dv_branch_ups").toString + "/t"
    val v1 = table(dir)
    Snapshots.createBranch(spark, dir, "dev")
    Snapshots.appendToBranch(
      spark, dir, "dev", Seq((9L, "2024-01-09", 90.0)).toDF("id", "day", "v")) // branch v1
    // the upsert updates a FORK row (id=2), a BRANCH-APPENDED row (id=9)
    // and inserts a new one (id=11) — one statement, one branch version
    val src = Seq(
      (2L, "2024-01-01", 110.0),
      (9L, "2024-01-09", 91.0),
      (11L, "2024-01-11", 111.0)).toDF("id", "day", "v")
    val (touched, deleted) = DeleteVectors.upsertOnBranch(spark, dir, "dev", src, Seq("day", "id"))
    assert(touched == 2L && deleted == 2L, s"got ($touched, $deleted)")
    assert(rowSet(Snapshots.readBranch(spark, dir, "dev")) == Set(
      (1L, "2024-01-01", 10.0),
      (2L, "2024-01-01", 110.0),
      (3L, "2024-01-02", 20.0),
      (4L, "2024-01-03", 30.0),
      (9L, "2024-01-09", 91.0),
      (11L, "2024-01-11", 111.0)))
    // the LIVE line never changed: no version, no vectors, old content
    assert(Snapshots.latestVersion(spark, dir) == v1)
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir)).isEmpty)
    assert(rowSet(Snapshots.readSnapshot(spark, dir)).contains((2L, "2024-01-01", 11.0)))
    // a NO-OP upsert (empty source) returns (0, 0), commits no branch
    // version and changes nothing
    val branchBefore = rowSet(Snapshots.readBranch(spark, dir, "dev"))
    assert(DeleteVectors.upsertOnBranch(spark, dir, "dev", src.limit(0), Seq("day", "id")) ==
      ((0L, 0L)))
    assert(rowSet(Snapshots.readBranch(spark, dir, "dev")) == branchBefore)
    // adoption carries both sides: the fork pointer restates, the moved
    // branch files' vectors rehome, the new rows arrive
    Snapshots.fastForward(spark, dir, "dev")
    assert(rowSet(Snapshots.readSnapshot(spark, dir)) == Set(
      (1L, "2024-01-01", 10.0),
      (2L, "2024-01-01", 110.0),
      (3L, "2024-01-02", 20.0),
      (4L, "2024-01-03", 30.0),
      (9L, "2024-01-09", 91.0),
      (11L, "2024-01-11", 111.0)))
    assert(Snapshots.countRows(spark, dir) == 6L)
    assert(Snapshots.branches(spark, dir).isEmpty, "adoption drops the branch whole")
  }

  test("upsertMorSink: a real stream lands per-epoch MoR upserts, exactly once") {
    val dir = Files.createTempDirectory("dv_ups_stream").toString + "/t"
    table(dir)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits.newProductEncoder
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, Double)]
    val q = stream
      .toDF()
      .toDF("id", "day", "v")
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("dv_ups_ck").toString)
      .foreachBatch(graft.streaming.Streaming.upsertMorSink(dir, Seq("day", "id"), tag = "s1"))
      .start()
    try {
      stream.addData((2L, "2024-01-01", 110.0))
      q.processAllAvailable()
      stream.addData((2L, "2024-01-01", 120.0), (9L, "2024-01-09", 90.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(rowSet(Snapshots.readSnapshot(spark, dir)) == Set(
      (1L, "2024-01-01", 10.0),
      (2L, "2024-01-01", 120.0),
      (3L, "2024-01-02", 20.0),
      (4L, "2024-01-03", 30.0),
      (9L, "2024-01-09", 90.0)))
    assert(Snapshots.dvByRel(Snapshots.manifestView(spark, dir)).nonEmpty)
  }

  test("branch-targeted CDC sink: 3 epochs replay onto the fork, crash-replay skips, " +
    "compaction sizes the file set, branch read ≡ batch twin") {
    val dir = Files.createTempDirectory("dv_branch_stream").toString + "/t"
    table(dir)
    Snapshots.commit(spark, dir, Seq("day", "id"))
    Snapshots.createBranch(spark, dir, "replay")
    val liveBefore = rowSet(Snapshots.readSnapshot(spark, dir))
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits.newProductEncoder
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, Long, String, Double)]
    val ckDir = Files.createTempDirectory("dv_branch_ck").toString
    def start() = stream
      .toDF()
      .toDF("op", "id", "day", "v")
      .writeStream
      .option("checkpointLocation", ckDir)
      .foreachBatch(graft.streaming.Streaming.applyChangesMorSink(
        dir, Seq("day", "id"), opCol = "op", tag = "br1", branch = "replay"))
      .start()
    val q = start()
    try {
      stream.addData(("u", 2L, "2024-01-01", 110.0)) // epoch 0: update a FORK row
      q.processAllAvailable()
      stream.addData(("d", 3L, "2024-01-02", 0.0), ("i", 9L, "2024-01-09", 90.0)) // epoch 1
      q.processAllAvailable()
      stream.addData(("u", 9L, "2024-01-09", 91.0)) // epoch 2: update epoch 1's append
      q.processAllAvailable()
    } finally q.stop()
    // crash-replay: a restarted query re-offers processed epochs — the
    // per-(branch, tag) high-water marker skips them whole
    val bvBefore = Snapshots.branchView(spark, dir, "replay").version
    val q2 = start()
    try q2.processAllAvailable()
    finally q2.stop()
    assert(
      Snapshots.branchView(spark, dir, "replay").version == bvBefore,
      "replayed epochs must commit nothing on the branch line")
    val expected = Set(
      (1L, "2024-01-01", 10.0),
      (2L, "2024-01-01", 110.0),
      (4L, "2024-01-03", 30.0),
      (9L, "2024-01-09", 91.0))
    assert(rowSet(Snapshots.readBranch(spark, dir, "replay")) == expected)
    // the live line never moved
    assert(rowSet(Snapshots.readSnapshot(spark, dir)) == liveBefore)
    // compaction: the replay's small files (incl. a DV'd branch append —
    // epoch 2 vectored epoch 1's file) fold to ~one per partition value
    val bv0 = Snapshots.branchView(spark, dir, "replay")
    val privateRels = bv0.rels.filter(_.startsWith(Snapshots.BranchDataDirName))
    assert(privateRels.size >= 2, privateRels.toString)
    val (before, after) = Snapshots.compactBranch(spark, dir, "replay")
    assert(before == privateRels.size.toLong && after < before, s"($before, $after)")
    assert(rowSet(Snapshots.readBranch(spark, dir, "replay")) == expected, "compaction folds, never changes content")
    val bv1 = Snapshots.branchView(spark, dir, "replay")
    assert(
      bv1.rels.filter(_.startsWith(Snapshots.BranchDataDirName))
        .forall(r => !Snapshots.hasDv(bv1.stats.getOrElse(r, Map.empty))),
      "compacted branch files must be clean (vectors folded)")
    // adopt: fast-forward takes the SIZED set, and the result equals the
    // batch twin (the same ops applied in one ad-hoc CDC batch)
    Snapshots.fastForward(spark, dir, "replay")
    assert(rowSet(Snapshots.readSnapshot(spark, dir)) == expected)
  }

  test("restore shrinking a DV surfaces the revived rows as CDC inserts") {
    val (_, dir) = catalogTable("dvrevive")
    DeleteVectors.deleteWhere(spark, dir, $"id" === 2L) // v2
    Snapshots.restore(spark, dir, 1L) // v3: pointer reverts to none
    val v3 = spark.read
      .option("startingVersion", 3)
      .option("endingVersion", 3)
      .table("dvrevive.ev.changes")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type")))
      .toSeq
      .sorted
    assert(v3 == Seq((2L, "insert")), s"got $v3")
  }
}
