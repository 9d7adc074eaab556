package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, sum, when}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.Snapshots.ColStat

/** Merge-on-read DELETE for snapshot tables — deletion vectors.
  *
  * The copy-on-write delete ([[Sources.deleteWhere]]) prices a deletion at
  * the size of every file holding a match: correct, but exactly the wrong
  * cost model for the common 100 TB case — deleting 0.01 % of rows (a GDPR
  * erasure, a bad-record purge) from files of a million rows each rewrites
  * a million rows per file to remove a hundred. The lakehouse answer
  * (Delta's deletion vectors, Iceberg's position deletes) is MERGE-ON-READ:
  * record WHICH row positions died and subtract them at scan time; rewrite
  * nothing until a compaction ([[materialize]]) folds the vectors in.
  *
  * Representation here:
  *  - One sidecar parquet file of `(rel, pos)` rows per DV'd data file,
  *    under the hidden `<root>/.snap-dv/` tree ([[Snapshots.DvDirName]]).
  *    `pos` is the file-row ordinal — Spark's `_metadata.row_index`
  *    domain, the same coordinate system the scan recovers, so positions
  *    survive row-group skipping and any reader parallelism. Positions
  *    are sorted and distinct; `rel` rides INSIDE the sidecar so the
  *    read-side anti-join needs no per-file bookkeeping.
  *  - The manifest's per-file stats map carries the pointer
  *    ([[Snapshots.DvPathKey]] → sidecar rel, [[Snapshots.DvCountKey]] →
  *    exact deleted count) — so DV state flows through delta commits,
  *    checkpoints, partition-index groups, clone re-rendering and the
  *    stats-carry of every other commit with no new manifest machinery.
  *  - A file accrues deletes from MANY deletes but always points at ONE
  *    sidecar: a later delete merges the previous positions into its new
  *    sidecar (cost: O(existing DV) per touched file, never O(data)).
  *    Old sidecars keep serving pinned versions until [[Snapshots.vacuum]].
  *
  * Scale shape of [[deleteWhere]]: one pruned snapshot scan to find
  * matches (manifest stats + bloom narrowing, same as the COW path), one
  * shuffle of the MATCHED (rel, pos) pairs only — not the data — a
  * distributed sidecar write, and an O(touched-files) manifest delta. No
  * data file is read past the match scan and none is written. Reads pay a
  * broadcast anti-join on the deleted positions until materialization.
  *
  * Semantics: snapshot-isolated (the delete applies to the version its
  * scan pinned), time-travelable (pre-delete versions keep reading the
  * undeleted rows through their own manifests' DV state), restorable
  * ([[Snapshots.restore]] restores the target version's DV pointers), and
  * CDC-precise (`cat.t.changes` emits exactly the newly-dead rows as
  * `delete` — see [[graft.sources.snap.SnapChanges]]).
  */
object DeleteVectors {

  private val sidecarSchema = StructType(
    Seq(StructField("rel", StringType, nullable = false), StructField("pos", LongType, nullable = false)))

  /** Bounded merge-on-read: when a delete pushes a file's deleted
    * fraction STRICTLY above `spark.graft.dv.maxDeletedFraction`
    * (default 0.9) — and survivors remain — the file is REWRITTEN in the
    * same commit instead of pointed at. Unbounded vector growth is the
    * known MoR failure mode (every read of a 95 %-deleted file decodes
    * 20× the surviving rows); the threshold caps read amplification at
    * `1/(1−threshold)` while keeping the common small-delete case
    * rewrite-free. Provably-empty files stay as pointers (they cost
    * nothing: every plan prunes them). Set the conf to 1.0 to never
    * auto-rewrite, lower it for read-heavy tables.
    */
  val DefaultMaxDeletedFraction = 0.9

  private def maxDeletedFraction(spark: SparkSession): Double =
    spark.conf.getOption("spark.graft.dv.maxDeletedFraction") match {
      case None => DefaultMaxDeletedFraction
      case Some(s) =>
        // refuse loudly: a silently-swallowed typo would re-enable (or a
        // NaN would silently disable) auto-rewrites
        val t = scala.util.Try(s.toDouble).getOrElse(sys.error(
          s"spark.graft.dv.maxDeletedFraction must be a number in [0, 1], got '$s'"))
        require(
          !t.isNaN && t >= 0.0 && t <= 1.0,
          s"spark.graft.dv.maxDeletedFraction must be in [0, 1], got '$s'")
        t
    }

  /** Merge-on-read DELETE: record the positions of rows matching
    * `predicate` as deletion vectors and commit the pointer update — no
    * data file is rewritten. Returns (files touched, rows newly deleted).
    *
    * NULL-predicate rows are NOT matched (kept), the same three-valued
    * rule as the COW delete. Rows already deleted by an earlier DV are
    * never double-counted: the new sidecar is the DISTINCT union of old
    * and new positions and the recorded count is exact.
    */
  def deleteWhere(spark: SparkSession, root: String, predicate: Column): (Long, Long) =
    Snapshots.withTableLock(spark, root) {
      val version = Snapshots.latestVersion(spark, root)
      require(
        version > 0L,
        s"merge-on-read delete on $root needs a committed manifest — Snapshots.commit / createTable first")
      val view = Snapshots.manifestView(spark, root, version)
      require(
        view.schema.isDefined,
        s"merge-on-read delete on $root needs a v2 manifest (recorded schema) — " +
          "commit with statsCols to upgrade")
      if (view.rels.isEmpty) return (0L, 0L)
      val written = matchDeletes(spark, root, view, predicate)
      if (written.isEmpty) return (0L, 0L)
      boundedCommit(spark, root, view, written)
    }

  /** The MoR delete's match core over one VIEW's files (main line or a
    * branch): candidate narrowing BEFORE any data I/O — skip provably-
    * fully-deleted files, stats-prune the predicate's top-level range
    * conjuncts against the manifest's per-file intervals (the
    * `DELETE WHERE day = X` shape opens only that day's files at any
    * table size), then bloom-narrow equality probes — then ONE match
    * scan of the candidates (RAW rows: re-matching an already-deleted
    * row is harmless, the sidecar union dedups) and the distributed
    * sidecar write. Returns (rel, new sidecar rel, merged count) per
    * touched file; the caller commits (main: [[boundedCommit]]; branch:
    * a branch-delta restate).
    */
  private def matchDeletes(
      spark: SparkSession,
      root: String,
      view: Snapshots.ManifestView,
      predicate: Column): Seq[(String, String, Long)] = {
    val alive = view.rels.filterNot(r =>
      Snapshots.fullyDeleted(view.stats.getOrElse(r, Map.empty)))
    if (alive.isEmpty) return Seq.empty
    val probeFrame = Snapshots.scanRels(spark, root, alive.take(1), view.schema)
    val ranges = Sources.rangeProbes(probeFrame, predicate)
    val statsPruned =
      if (ranges.isEmpty) alive
      else
        alive.filter(rel =>
          Snapshots.fileMatchesRanges(view.stats.getOrElse(rel, Map.empty), ranges))
    val probes = Sources.equalityProbes(probeFrame, predicate)
    val active = probes.filter { case (c, _) => view.bloomCols.contains(c) }
    val candidates =
      if (active.isEmpty) statsPruned
      else
        statsPruned.filter { rel =>
          active.forall { case (c, v) => Snapshots.bloomMightContain(spark, root, rel, c, v) }
        }
    if (candidates.isEmpty) return Seq.empty
    val scan = Snapshots.scanRelsWithPos(spark, root, candidates, view.schema)
    val matches = scan
      .filter(coalesce(predicate, lit(false)))
      .select(col("__graft_dv_rel__").as("rel"), col("__graft_dv_pos__").as("pos"))
    val oldDvByRel: Map[String, String] = candidates.flatMap { rel =>
      Snapshots.dvOf(view.stats.getOrElse(rel, Map.empty)).map { case (p, _) => rel -> p }
    }.toMap
    val commitTag = java.util.UUID.randomUUID().toString.take(8)
    writeSidecars(spark, root, matches, oldDvByRel, commitTag)
  }

  /** Merge-on-read DELETE on a WRITABLE BRANCH — the live line is
    * untouched: matched positions (over the BRANCH's file set, fork files
    * and branch appends alike) become deletion vectors recorded by a
    * branch-delta restate, so `readBranch` / `VERSION AS OF '<branch>'`
    * subtract them while every main read keeps the rows. Combined with
    * [[Snapshots.fastForward]] — which carries the branch's pointer
    * changes into the live line when main hasn't diverged — a branch is
    * the STAGING AREA for a risky bulk delete: run it on the fork,
    * validate the branch read, then adopt (or drop) it, all without a
    * byte of data rewrite. Same narrowing as [[deleteWhere]]; no
    * threshold rewrite on branches (vectors fold on the main line after
    * adoption, by the ordinary maintenance passes). Returns
    * (files touched, rows newly deleted).
    */
  def deleteOnBranch(
      spark: SparkSession,
      root: String,
      name: String,
      predicate: Column): (Long, Long) =
    Snapshots.withTableLock(spark, root) {
      val bv = Snapshots.branchView(spark, root, name)
      require(
        bv.schema.isDefined,
        s"merge-on-read branch delete on $root needs a v2 manifest (recorded schema)")
      val written = matchDeletes(spark, root, bv, predicate)
      val (changed, newlyDeleted) = pointerUpdatesOf(bv, written)
      if (changed.isEmpty) return (0L, 0L)
      // the view was built under THIS table lock — pass it through, no
      // second branch-chain read
      Snapshots.restateOnBranch(spark, root, name, bv, changed)
      (changed.size.toLong, newlyDeleted)
    }

  /** Apply a batch of freshly-written sidecar results as ONE commit,
    * under the bounded-MoR policy — the shared back half of the MoR
    * DELETE and the delta-based UPDATE/MERGE write:
    *
    *  - a file whose new position set equals its old one is NOT restated
    *    (count equality IS set equality — the merged set is a superset of
    *    the old; the fresh sidecar becomes an orphan vacuum reaps) — a
    *    spurious restate would read as a change commit downstream;
    *  - files whose deleted fraction crossed
    *    `spark.graft.dv.maxDeletedFraction` (with survivors) REWRITE in
    *    the same commit instead of pointing: replacements stage first
    *    (no live-tree mutation), then archive+land+commit runs with a
    *    rollback — a failed commit restores the originals and removes the
    *    landed replacements, so a failed statement stays a clean no-op
    *    that no later listing-based commit can half-adopt;
    *  - map-typed tables never auto-rewrite: the change feed's multiset
    *    cancellation cannot byte-key map values across a rewrite, and DV
    *    pointer updates are the feed's map-safe representation.
    *
    * `addedRels`: files the caller already landed (the delta DML's
    * inserts) to record in the same version. Returns (files with changed
    * pointers or rewrites, newly deleted rows).
    */
  private[sources] def boundedCommit(
      spark: SparkSession,
      root: String,
      view: Snapshots.ManifestView,
      written: Seq[(String, String, Long)],
      addedRels: Seq[String] = Seq.empty): (Long, Long) = {
    val (changed, newlyDeleted) = pointerUpdatesOf(view, written)
    if (changed.isEmpty && addedRels.isEmpty) return (0L, 0L)
    val mapTyped =
      view.schema.exists(s => s.fields.exists(f => Snapshots.containsMapType(f.dataType)))
    val threshold = maxDeletedFraction(spark)
    val (rewriteNow, pointerUpdates) =
      if (mapTyped) (Map.empty[String, Map[String, ColStat]], changed)
      else
        changed.partition { case (_, st) =>
          val rows = st.get(Snapshots.RowCountKey).map(_.min.toLong)
          val cnt = Snapshots.dvOf(st).map(_._2).getOrElse(0L)
          rows.exists(r => cnt < r && cnt.toDouble > threshold * r.toDouble)
        }
    if (rewriteNow.isEmpty) {
      Snapshots.commitRestated(spark, root, pointerUpdates, addedRels)
      return (changed.size.toLong, newlyDeleted)
    }
    // phase A — stage every replacement with NO live-tree mutation
    val staged = new java.util.concurrent.ConcurrentLinkedQueue[(String, Path, String, Long)]()
    Snapshots.parEach(rewriteNow.toSeq) { case (rel, st) =>
      val (dvRel, dvCnt) = Snapshots.dvOf(st).get
      staged.add(stageRewrite(spark, root, rel, dvRel, dvCnt))
    }
    import scala.jdk.CollectionConverters._
    val stagedSeq = staged.asScala.toSeq
    // phase B — archive originals, land replacements, ONE commit; any
    // failure rolls the live tree back to exactly the pre-statement state
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var landed = List.empty[Path]
    var archived = List.empty[String]
    try {
      stagedSeq.foreach { case (rel, part, newRel, survivors) =>
        Snapshots.archiveFile(fs, rootPath, new Path(rootPath, rel))
        archived ::= rel
        // zero-survivor replacements never land (row-count-less manifests
        // can't detect full deletion up front; the staged footer can) —
        // the original's removal alone is the correct commit
        if (survivors > 0L) {
          val to = new Path(rootPath, newRel)
          if (!fs.rename(part, to)) sys.error(s"bounded rewrite failed to land $newRel")
          landed ::= to
        }
      }
      Snapshots.commitRestated(
        spark,
        root,
        pointerUpdates,
        addedRels = addedRels ++ stagedSeq.collect { case (_, _, nr, s) if s > 0L => nr },
        removedRels = stagedSeq.map(_._1))
    } catch {
      case t: Throwable =>
        landed.foreach(p => try fs.delete(p, false) catch { case _: Exception => () })
        // restore by COPY from the archive (never rename back out: the
        // archived bytes may also serve OLDER pinned manifests)
        archived.foreach { rel =>
          try {
            val live = new Path(rootPath, rel)
            val arch = new Path(new Path(rootPath, Snapshots.ArchiveDirName), rel)
            if (!fs.exists(live) && fs.exists(arch))
              org.apache.hadoop.fs.FileUtil
                .copy(fs, arch, fs, live, false, spark.sparkContext.hadoopConfiguration)
          } catch { case _: Exception => () }
        }
        throw t
    } finally {
      stagedSeq.foreach { case (_, part, _, _) =>
        try fs.delete(part.getParent, true) catch { case _: Exception => () }
      }
    }
    (changed.size.toLong, newlyDeleted)
  }

  /** Fresh-sidecar results folded into per-file POINTER UPDATES — the one
    * encoding of DV state both commit faces share (main-line
    * [[boundedCommit]] and the branch restate): a file whose merged count
    * equals its old one is a NO-OP (count equality IS set equality — the
    * merged sidecar is a superset; the fresh sidecar becomes an orphan
    * vacuum reaps), every other file's stats are re-stated with the new
    * pointer. Returns (rel → new stats, rows newly deleted).
    */
  private def pointerUpdatesOf(
      view: Snapshots.ManifestView,
      written: Seq[(String, String, Long)]): (Map[String, Map[String, ColStat]], Long) = {
    var newlyDeleted = 0L
    val changed: Map[String, Map[String, ColStat]] = written.flatMap {
      case (rel, dvRel, cnt) =>
        val st = view.stats.getOrElse(rel, Map.empty[String, ColStat])
        val oldCnt = Snapshots.dvOf(st).map(_._2).getOrElse(0L)
        if (cnt == oldCnt) None
        else {
          newlyDeleted += cnt - oldCnt
          Some(rel -> (st.filterNot(e => Snapshots.isDvKey(e._1)) ++ Map(
            Snapshots.DvPathKey -> ColStat("s", dvRel, dvRel),
            Snapshots.DvCountKey -> ColStat("l", cnt.toString, cnt.toString))))
        }
    }.toMap
    (changed, newlyDeleted)
  }

  /** Phase A of a per-file rewrite: write the file's survivors (minus its
    * sidecar's positions) into a hidden temp dir NEXT TO it — no
    * live-tree mutation. Returns (rel, staged part path, replacement rel,
    * surviving rows); the caller archives + lands (and can roll back) —
    * and must NOT land a zero-survivor replacement (a table whose
    * manifest predates row counts can't detect full deletion up front,
    * so the staged footer is the authority: committing an empty file
    * would make every future scan open it for nothing).
    */
  private def stageRewrite(
      spark: SparkSession,
      root: String,
      rel: String,
      dvRel: String,
      dvCount: Long): (String, Path, String, Long) = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(rootPath, rel)
    require(fs.exists(live), s"rewrite: $rel is not live under $root")
    val positions0 = spark.read.parquet(new Path(rootPath, dvRel).toString).select(col("pos"))
    // broadcast only below the recorded-count threshold — the scan path's
    // discipline ([[Snapshots.DvBroadcastMaxPositions]]): a near-threshold
    // multi-million-position vector must not ship tens of MB to every
    // rewrite task when a real join prices the same anti-join correctly
    val positions =
      if (dvCount <= Snapshots.DvBroadcastMaxPositions) broadcast(positions0) else positions0
    // the file's OWN physical schema (no enforced table schema, no
    // partition splice) — this rewrites bytes in place
    val data = spark.read
      .parquet(live.toString)
      .withColumn("__graft_dv_pos__", col("_metadata.row_index"))
    val keep = data
      .join(positions, data("__graft_dv_pos__") === positions("pos"), "left_anti")
      .drop("__graft_dv_pos__")
    val tmpDir = new Path(live.getParent, s".dv-materialize-${live.getName}")
    keep.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmpDir.toString)
    val part = fs
      .listStatus(tmpDir)
      .map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"rewrite of $rel produced no part file"))
    val cut = rel.lastIndexOf('/')
    val newRel = if (cut < 0) part.getName else rel.substring(0, cut + 1) + part.getName
    val survivors = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(part, spark.sparkContext.hadoopConfiguration))
      try r.getRecordCount
      finally r.close()
    }
    (rel, part, newRel, survivors)
  }

  /** Stage + archive + land in one step — [[materialize]]'s shape, where
    * the closing listing-based commit immediately follows under the same
    * lock. A zero-survivor staged file archives the original WITHOUT
    * landing (the no-row-count-manifest case full deletion can't detect
    * up front).
    */
  private def rewriteSansPositions(
      spark: SparkSession,
      root: String,
      rel: String,
      dvRel: String,
      dvCount: Long): Unit = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, part, newRel, survivors) = stageRewrite(spark, root, rel, dvRel, dvCount)
    Snapshots.archiveFile(fs, rootPath, new Path(rootPath, rel))
    if (survivors > 0L && !fs.rename(part, new Path(rootPath, newRel)))
      throw new IllegalStateException(s"rewrite of $rel failed to land $part")
    fs.delete(part.getParent, true)
  }

  /** Re-home one DV sidecar after its data file MOVED to a new rel (the
    * branch fast-forward): the sidecar's rows embed the data file's rel —
    * the read-side anti-join matches on it — so a moved file needs a
    * fresh sidecar carrying the NEW rel with the same positions. One
    * driver-side streaming copy (sidecars are small by construction); the
    * orphaned old sidecar dies in vacuum. Returns the new sidecar rel.
    */
  private[sources] def rehomeSidecar(
      spark: SparkSession,
      root: String,
      oldDvRel: String,
      newDataRel: String): String = {
    val rootPath = new Path(root)
    // the SESSION conf, like every other engine-side parquet I/O path —
    // sparkContext.hadoopConfiguration would silently drop session
    // overrides (Bridge.sessionHadoopConf's documented contract)
    val hconf = org.apache.spark.sql.graft.Bridge.sessionHadoopConf(spark)
    val newDvRel =
      s"${Snapshots.DvDirName}/$newDataRel.dv-ff-${java.util.UUID.randomUUID().toString.take(8)}.parquet"
    val r = org.apache.spark.sql.graft.Bridge.parquetRowReader(
      new Path(rootPath, oldDvRel),
      StructType(Seq(StructField("pos", LongType, nullable = false))),
      hconf)
    val w = org.apache.spark.sql.graft.Bridge.parquetRowWriter(
      new Path(rootPath, newDvRel),
      sidecarSchema,
      hconf)
    val relU = org.apache.spark.unsafe.types.UTF8String.fromString(newDataRel)
    try {
      var row = r.read()
      while (row != null) {
        w.write(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](relU, row.getLong(0))))
        row = r.read()
      }
    } finally {
      try r.close()
      finally w.close() // each closes even if the other throws
    }
    newDvRel
  }

  /** Union two deletion-vector sidecars of the SAME data file into one
    * fresh sidecar — the rebase resolution when both the branch line and
    * the live line vectored the file (both position domains address the
    * same immutable bytes, so the union is each line's deletes applied).
    * Either side may be absent. Driver-side and bounded by the two
    * vectors' sizes; no sort-order assumption on the inputs. Returns
    * (new sidecar rel, distinct position count); the superseded sidecars
    * die in vacuum.
    */
  private[sources] def unionSidecars(
      spark: SparkSession,
      root: String,
      dataRel: String,
      aRel: Option[String],
      bRel: Option[String]): (String, Long) = {
    val rootPath = new Path(root)
    val hconf = org.apache.spark.sql.graft.Bridge.sessionHadoopConf(spark)
    def positions(rel: String): Array[Long] = {
      val r = org.apache.spark.sql.graft.Bridge.parquetRowReader(
        new Path(rootPath, rel),
        StructType(Seq(StructField("pos", LongType, nullable = false))),
        hconf)
      val buf = scala.collection.mutable.ArrayBuilder.make[Long]
      try {
        var row = r.read()
        while (row != null) {
          buf += row.getLong(0)
          row = r.read()
        }
      } finally r.close()
      buf.result()
    }
    val merged = (aRel.map(positions).getOrElse(Array.empty[Long]) ++
      bRel.map(positions).getOrElse(Array.empty[Long])).distinct.sorted
    val newDvRel =
      s"${Snapshots.DvDirName}/$dataRel.dv-rb-${java.util.UUID.randomUUID().toString.take(8)}.parquet"
    val w = org.apache.spark.sql.graft.Bridge.parquetRowWriter(
      new Path(rootPath, newDvRel),
      sidecarSchema,
      hconf)
    val relU = org.apache.spark.unsafe.types.UTF8String.fromString(dataRel)
    try merged.foreach { pos =>
      w.write(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](relU, pos)))
    } finally w.close()
    (newDvRel, merged.length.toLong)
  }

  /** Distributed sidecar write: shuffle ONLY the matched (rel, pos) pairs,
    * one partition stream per hash bucket, each task writing one sidecar
    * per rel it owns (positions sorted-distinct, previous sidecar's
    * positions merge-deduped in — a streaming merge of two sorted runs,
    * O(1) memory). Returns (rel, sidecar rel, total positions) per rel —
    * O(touched files) driver metadata, the same footprint as the COW
    * delete's affected-file list. Task-attempt-unique sidecar names keep
    * retries safe: only the winning attempt's names are committed,
    * orphans die in vacuum.
    */
  private[sources] def writeSidecars(
      spark: SparkSession,
      root: String,
      matches: DataFrame,
      oldDvByRel: Map[String, String],
      commitTag: String): Seq[(String, String, Long)] = {
    import spark.implicits._
    val conf = org.apache.spark.sql.graft.Bridge.serializableConf(
      org.apache.spark.sql.graft.Bridge.sessionHadoopConf(spark))
    val rootStr = root
    val dvDir = Snapshots.DvDirName
    val schema = sidecarSchema
    matches
      .select(col("rel").as("_1"), col("pos").as("_2"))
      .as[(String, Long)]
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"))
      .mapPartitions { it =>
        val hconf = org.apache.spark.sql.graft.Bridge.confOf(conf)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(tc => s"${tc.partitionId()}-${tc.taskAttemptId()}")
          .getOrElse("0-0")
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        // the input is sorted by (rel, pos): consume one rel's run at a
        // time, merging the old sidecar's sorted positions in
        val rows = it.buffered
        while (rows.hasNext) {
          val rel = rows.head._1
          val dvRel = s"$dvDir/$rel.dv-$commitTag-$attempt.parquet"
          val target = new Path(new Path(rootStr), dvRel)
          val old: Iterator[Long] = oldDvByRel.get(rel) match {
            case None => Iterator.empty
            case Some(oldRel) =>
              val r = org.apache.spark.sql.graft.Bridge.parquetRowReader(
                new Path(new Path(rootStr), oldRel),
                StructType(Seq(StructField("pos", LongType, nullable = false))),
                hconf)
              new Iterator[Long] {
                private var cur = r.read()
                override def hasNext: Boolean = cur != null
                override def next(): Long = {
                  val v = cur.getLong(0)
                  cur = r.read()
                  if (cur == null) r.close()
                  v
                }
              }
          }
          val fresh: Iterator[Long] = new Iterator[Long] {
            override def hasNext: Boolean = rows.hasNext && rows.head._1 == rel
            override def next(): Long = rows.next()._2
          }
          val w = org.apache.spark.sql.graft.Bridge.parquetRowWriter(target, schema, hconf)
          val relU = org.apache.spark.unsafe.types.UTF8String.fromString(rel)
          var n = 0L
          var last = Long.MinValue
          // streaming sorted-merge with dedup: both runs ascending
          val a = old.buffered
          val b = fresh.buffered
          while (a.hasNext || b.hasNext) {
            val v =
              if (!a.hasNext) b.next()
              else if (!b.hasNext) a.next()
              else if (a.head <= b.head) a.next()
              else b.next()
            if (v != last || n == 0L) {
              w.write(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                Array[Any](relU, v)))
              n += 1L
              last = v
            }
          }
          w.close()
          out += ((rel, dvRel, n))
        }
        out.iterator
      }
      .collect()
      .toSeq
  }

  /** Fold deletion vectors into their data files — the compaction that
    * ends (or, scoped, shrinks) the merge-on-read era: each in-scope DV'd
    * file rewrites WITHOUT its deleted positions (provably-empty files
    * just archive), originals archive (pinned manifests keep resolving),
    * and the closing commit drops the folded pointers while out-of-scope
    * vectors carry forward untouched. Returns (files rewritten-or-
    * archived, positions folded).
    *
    * `where`: an optional scope over the table's HIVE PARTITION columns —
    * `materialize(spark, root, Some(col("day") === "2024-01-03"))` folds
    * only that day's vectors. At 100 TB this is what keeps one partition's
    * GDPR delete from pricing a whole-table rewrite before the next
    * scoped OPTIMIZE: fold where you're about to do maintenance, leave the
    * rest pointed. The predicate is evaluated per FILE against its typed
    * partition-path values (mis-renderable values fall conservatively out
    * of scope); it cannot reference data columns — position-level scoping
    * below a partition is what the vectors themselves already are.
    * Unscoped (`where = None`) folds everything; after that, raw-reading
    * maintenance ops accept the whole table again.
    */
  def materialize(
      spark: SparkSession,
      root: String,
      where: Option[Column] = None): (Long, Long) =
    Snapshots.withTableLock(spark, root) {
      val version = Snapshots.latestVersion(spark, root)
      if (version == 0L) return (0L, 0L)
      val view = Snapshots.manifestView(spark, root, version)
      val all = Snapshots.dvByRel(view)
      val dvd = where match {
        case None => all
        case Some(pred) =>
          val kept = scopeByPartitions(spark, view, all.keys.toSeq, pred)
          all.filter { case (rel, _) => kept(rel) }
      }
      if (dvd.isEmpty) return (0L, 0L)
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Snapshots.parEach(dvd.toSeq) { case (rel, (dvRel, dvCnt)) =>
        val st = view.stats.getOrElse(rel, Map.empty[String, ColStat])
        if (Snapshots.fullyDeleted(st)) {
          // every recorded row is deleted: nothing survives — archive only
          val live = new Path(rootPath, rel)
          require(fs.exists(live), s"materialize: $rel is not live under $root")
          Snapshots.archiveFile(fs, rootPath, live)
        } else rewriteSansPositions(spark, root, rel, dvRel, dvCnt)
      }
      Snapshots.commit(spark, root) // rewritten files get fresh stats; pointers die with the rels
      (dvd.size.toLong, dvd.values.map(_._2).sum)
    }

  /** Merge-on-read UPSERT — the streaming-CDC-apply primitive: every
    * source row lands in APPENDED files, and table rows matching a source
    * row's key become deletion-vector positions, ONE atomic commit
    * covering both ([[boundedCommit]], so the threshold-rewrite policy
    * applies here too). Nothing is rewritten: at 100 TB an epoch's upsert
    * is priced at (match scan over candidate files) + (the epoch's own
    * bytes) + O(touched files) manifest delta — never partition rewrites.
    *
    * Match semantics are MERGE's: a table row matches when EVERY
    * `keyCols` value equals a source row's (null keys never match). The
    * caller supplies full replacement rows keyed uniquely per statement —
    * the same contract SQL MERGE enforces. When the table's partition
    * columns are all key columns (the CDC shape: keyed by (day, id)),
    * the match scan prunes to the source's own partitions exactly;
    * otherwise every live file is a candidate.
    *
    * Streaming exactly-once: pass (`streamTag`, `epochId`) from
    * `foreachBatch` — a replayed epoch at-or-below the per-tag high-water
    * marker is skipped whole. The marker advances AFTER the commit, so a
    * crash in between replays the epoch; that replay is LOGICALLY
    * idempotent (the epoch's earlier copies match their own keys and die
    * as vectors, the fresh copies land — same logical table, the change
    * feed shows the churn), the standard foreachBatch-upsert contract.
    *
    * Returns (files with changed pointers or rewrites, rows newly
    * deleted); appended files ride the same commit.
    */
  def upsert(
      spark: SparkSession,
      root: String,
      source: DataFrame,
      keyCols: Seq[String],
      streamTag: String = "",
      epochId: Long = -1L): (Long, Long) =
    applyInternal(spark, root, source, source, keyCols, streamTag, epochId)

  /** Full CDC-apply — [[upsert]] plus DELETES in the same atomic epoch:
    * `changes` rows whose `opCol` value is in `deleteOps` remove their key
    * (matched table rows become vector positions, nothing appends); every
    * other row is an upsert (matched rows die, the new image appends).
    * One commit covers the whole batch. Same contracts as [[upsert]]
    * (full replacement rows on the non-delete side, one op per key per
    * batch, the exactly-once epoch marker); delete rows only need their
    * KEY columns populated. This is the end-to-end CDC sink: a Debezium-
    * style (op, key, image) feed applies at merge-on-read prices.
    */
  def applyChanges(
      spark: SparkSession,
      root: String,
      changes: DataFrame,
      keyCols: Seq[String],
      opCol: String,
      deleteOps: Set[String] = Set("d", "delete"),
      streamTag: String = "",
      epochId: Long = -1L,
      nullSafeKeys: Boolean = false): (Long, Long) = {
    require(
      changes.columns.contains(opCol),
      s"applyChanges needs the op column '$opCol' in the change feed")
    val isDelete = col(opCol).isin(deleteOps.toSeq: _*)
    applyInternal(
      spark,
      root,
      keySource = changes,
      appendSource = changes.filter(!coalesce(isDelete, lit(false))).drop(opCol),
      keyCols = keyCols,
      streamTag = streamTag,
      epochId = epochId,
      nullSafeKeys = nullSafeKeys)
  }

  /** The shared apply core: table rows matching ANY `keySource` key die
    * as deletion vectors; `appendSource` rows (full table rows) land as
    * appended files; one [[boundedCommit]].
    */
  private def applyInternal(
      spark: SparkSession,
      root: String,
      keySource: DataFrame,
      appendSource: DataFrame,
      keyCols: Seq[String],
      streamTag: String,
      epochId: Long,
      nullSafeKeys: Boolean = false): (Long, Long) =
    Snapshots.withTableLock(spark, root) {
      require(keyCols.nonEmpty, "upsert needs at least one key column")
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (streamTag.nonEmpty && epochId >= 0L &&
        lastUpsertEpoch(fs, rootPath, streamTag) >= epochId) return (0L, 0L)
      val version = Snapshots.latestVersion(spark, root)
      require(
        version > 0L,
        s"merge-on-read upsert on $root needs a committed manifest — Snapshots.commit / createTable first")
      val view = Snapshots.manifestView(spark, root, version)
      val (keyFields, sourceKeys, partCols, alive) =
        upsertInputs(view, root, keySource, appendSource, keyCols)
      // aligned to the recorded schema: order and types (a malformed value
      // fails loudly here, never lands half-cast)
      val schema = view.schema.get // upsertInputs verified it
      val aligned = appendSource.select(
        schema.fields.toIndexedSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
      val commitTag = java.util.UUID.randomUUID().toString.take(8)
      val written =
        matchKeyUpserts(
          spark, root, view, alive, sourceKeys, keyCols, keyFields, partCols, commitTag,
          nullSafe = nullSafeKeys)
      // the ad-hoc prefix is CONSTANT on purpose: the crashed-attempt
      // sweep in [[landAppend]] keys on the prefix, and a per-attempt
      // random tag could never match a PRIOR attempt's leftovers — a hard
      // crash between landing and commit would leave live uncommitted
      // files for the next listing-based commit to adopt as duplicates.
      // All upserts serialize on the table lock, so sweeping every
      // uncommitted `mor-adhoc-` file in the target dirs is safe.
      val epochPrefix =
        if (streamTag.nonEmpty && epochId >= 0L)
          s"mor-${java.net.URLEncoder.encode(streamTag, "UTF-8")}-$epochId-"
        else "mor-adhoc-"
      val addedRels =
        landAppend(spark, fs, rootPath, aligned, partCols, commitTag, epochPrefix, view.rels.toSet)
      if (written.isEmpty && addedRels.isEmpty) return (0L, 0L)
      val res =
        try boundedCommit(spark, root, view, written, addedRels)
        catch {
          case t: Throwable =>
            // a failed commit must not leave landed files for a later
            // listing-based commit to adopt
            addedRels.foreach(rel =>
              try fs.delete(new Path(rootPath, rel), false) catch { case _: Exception => () })
            throw t
        }
      if (streamTag.nonEmpty && epochId >= 0L) writeUpsertEpoch(fs, rootPath, streamTag, epochId)
      res
    }

  /** The key-match core shared by the main-line upsert/CDC-apply and the
    * branch upsert: ONE distinct-key frame feeds the range probes, the
    * bloom probes, the broadcast decision and the match join.
    *
    * Candidate narrowing: keys ⊇ partition columns ⇒ partition-exact in
    * the TYPED domain (the same per-file parse [[scopeByPartitions]]
    * uses — a non-canonically rendered dir value still matches, an
    * unparseable one reads NULL on BOTH the narrow and the scan splice:
    * consistently unmatched, never silently missed); otherwise
    * [[narrowByKeyStats]] applies the batch deleteWhere discipline
    * (epoch key min/max vs per-file intervals, then tuple bloom probes)
    * — a non-partition-keyed CDC stream must not scan a 100 TB table
    * every epoch. The key set broadcasts only when provably small (a
    * backfill epoch carrying tens of millions of keys takes a real join,
    * not an OOM). Sets [[lastUpsertCandidateFiles]].
    */
  private def matchKeyUpserts(
      spark: SparkSession,
      root: String,
      view: Snapshots.ManifestView,
      alive: Seq[String],
      sourceKeys: DataFrame,
      keyCols: Seq[String],
      keyFields: Seq[StructField],
      partCols: Seq[String],
      commitTag: String,
      nullSafe: Boolean = false): Seq[(String, String, Long)] = {
    val keys0 = sourceKeys.distinct().persist()
    val (candidates, written) =
      try {
        val keyCount = keys0.count()
        val candidates =
          candidateRelsForKeys(
            spark, root, view, alive, keys0, keyCount, keyCols, keyFields, partCols, nullSafe)
        val written: Seq[(String, String, Long)] =
          if (candidates.isEmpty) Seq.empty
          else {
            val scan = Snapshots.scanRelsWithPos(spark, root, candidates, view.schema)
            val keys =
              if (keyCount <= Snapshots.DvBroadcastMaxPositions) broadcast(keys0) else keys0
            // `<=>` when the caller matches null-safely (Mv's NULL-keyed
            // groups); plain name-equality join otherwise — EqualNullSafe
            // still hash-joins, but the default face keeps SQL equality
            // (a NULL key matching nothing IS merge semantics)
            val matched =
              if (nullSafe)
                scan.join(keys, keyCols.map(c => scan(c) <=> keys(c)).reduce(_ && _), "left_semi")
              else scan.join(keys, keyCols, "left_semi")
            val matches = matched
              .select(col("__graft_dv_rel__").as("rel"), col("__graft_dv_pos__").as("pos"))
            val oldDvByRel = candidates.flatMap { rel =>
              Snapshots.dvOf(view.stats.getOrElse(rel, Map.empty)).map { case (p, _) => rel -> p }
            }.toMap
            writeSidecars(spark, root, matches, oldDvByRel, commitTag)
          }
        (candidates, written)
      } finally keys0.unpersist()
    lastUpsertCandidateFiles.set(candidates.size.toLong)
    written
  }

  /** Merge-on-read UPSERT on a WRITABLE BRANCH — [[upsert]]'s semantics
    * on the branch line, ONE branch-local version: branch rows (fork
    * files and branch appends alike) matching a source row's key become
    * deletion-vector positions recorded by restate lines, the source's
    * full replacement rows land as branch-private appended files, and a
    * single branch delta commits both. The live line never changes until
    * [[Snapshots.fastForward]] adopts the branch — whose machinery
    * already carries BOTH sides (fork-file pointers restate; appended
    * files move with their sidecars, vectors rehomed). With
    * [[deleteOnBranch]] this completes branch DML: replay a day's CDC
    * onto a ten-byte fork, validate the branch read, adopt or drop.
    * Ad-hoc only (no epoch markers — streaming sinks target the live
    * line). Returns (files with changed pointers, rows newly deleted);
    * appended files ride the same branch version.
    */
  def upsertOnBranch(
      spark: SparkSession,
      root: String,
      name: String,
      source: DataFrame,
      keyCols: Seq[String],
      streamTag: String = "",
      epochId: Long = -1L): (Long, Long) =
    applyOnBranchInternal(spark, root, name, source, source, keyCols, streamTag, epochId)

  /** Full CDC-apply ON A BRANCH — [[applyChanges]]'s semantics on the
    * branch line: delete-op rows vector their keys (nothing appends),
    * the rest upsert, ONE branch version per batch. With the `streamTag`/
    * `epochId` pair this is the streaming replay target: a day's CDC feed
    * replays onto a ten-byte fork at epoch prices, exactly-once per
    * (branch, tag), while the live line never moves —
    * [[graft.streaming.Streaming.applyChangesMorSink]] with a `branch`
    * routes here.
    */
  def applyChangesOnBranch(
      spark: SparkSession,
      root: String,
      name: String,
      changes: DataFrame,
      keyCols: Seq[String],
      opCol: String,
      deleteOps: Set[String] = Set("d", "delete"),
      streamTag: String = "",
      epochId: Long = -1L): (Long, Long) = {
    require(
      changes.columns.contains(opCol),
      s"applyChangesOnBranch needs the op column '$opCol' in the change feed")
    val isDelete = col(opCol).isin(deleteOps.toSeq: _*)
    applyOnBranchInternal(
      spark,
      root,
      name,
      keySource = changes,
      appendSource = changes.filter(!coalesce(isDelete, lit(false))).drop(opCol),
      keyCols = keyCols,
      streamTag = streamTag,
      epochId = epochId)
  }

  /** The shared branch apply core ([[upsertOnBranch]] /
    * [[applyChangesOnBranch]]). Exactly-once: the per-(branch, tag) epoch
    * high-water marker lives INSIDE the branch's manifest dir — it dies
    * with the branch (drop/fast-forward), so a recreated branch of the
    * same name starts its epochs fresh; the crash window between commit
    * and marker falls back to the upsert's logical idempotence, the main
    * line's contract. Crashed-attempt file leftovers need no sweep here:
    * branch reads are MANIFEST-driven (never listing-based), so an
    * uncommitted landed file is invisible and dies when the branch dir
    * is removed whole.
    */
  private def applyOnBranchInternal(
      spark: SparkSession,
      root: String,
      name: String,
      keySource: DataFrame,
      appendSource: DataFrame,
      keyCols: Seq[String],
      streamTag: String,
      epochId: Long): (Long, Long) =
    Snapshots.withTableLock(spark, root) {
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (streamTag.nonEmpty && epochId >= 0L &&
        lastBranchEpoch(fs, rootPath, name, streamTag) >= epochId) return (0L, 0L)
      val bv = Snapshots.branchView(spark, root, name)
      val (keyFields, sourceKeys, partCols, alive) =
        upsertInputs(bv, root, keySource, appendSource, keyCols)
      val commitTag = java.util.UUID.randomUUID().toString.take(8)
      val written =
        matchKeyUpserts(spark, root, bv, alive, sourceKeys, keyCols, keyFields, partCols, commitTag)
      val (changed, newlyDeleted) = pointerUpdatesOf(bv, written)
      // landOnBranch aligns the source to the recorded schema itself
      val added = Snapshots.landOnBranch(spark, root, name, bv, appendSource)
      if (changed.isEmpty && added.isEmpty) return (0L, 0L)
      try Snapshots.commitBranchDelta(spark, root, name, bv, changed.toSeq ++ added)
      catch {
        case t: Throwable =>
          // a failed branch commit must be a clean no-op like the main
          // line's: remove this statement's landed files (the orphaned DV
          // sidecars are vacuum-reapable, the same contract as
          // applyInternal's failure path)
          added.foreach { case (rel, _) =>
            try fs.delete(new Path(rootPath, rel), false) catch { case _: Exception => () }
          }
          throw t
      }
      if (streamTag.nonEmpty && epochId >= 0L)
        writeBranchEpoch(fs, rootPath, name, streamTag, epochId)
      (changed.size.toLong, newlyDeleted)
    }

  private def branchEpochMarker(rootPath: Path, name: String, tag: String): Path =
    new Path(
      Snapshots.branchDir(rootPath, name),
      s".mor-epoch-${java.net.URLEncoder.encode(tag, "UTF-8")}")

  private def lastBranchEpoch(
      fs: org.apache.hadoop.fs.FileSystem,
      rootPath: Path,
      name: String,
      tag: String): Long = {
    val p = branchEpochMarker(rootPath, name, tag)
    if (!fs.exists(p)) return -1L
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
    finally in.close()
  }

  private def writeBranchEpoch(
      fs: org.apache.hadoop.fs.FileSystem,
      rootPath: Path,
      name: String,
      tag: String,
      epochId: Long): Unit = {
    val p = branchEpochMarker(rootPath, name, tag)
    val tmp = new Path(p.getParent, s"${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(epochId.toString.getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) fs.delete(tmp, false)
  }

  /** Shared validation + alignment prologue of the upsert faces
    * ([[applyInternal]] and [[upsertOnBranch]]): key columns must exist
    * on both sides, sources carry FULL replacement rows, keys cast to
    * the TABLE's key types so the match join compares in one domain.
    * Returns (keyFields, sourceKeys, partCols, alive).
    */
  private def upsertInputs(
      view: Snapshots.ManifestView,
      root: String,
      keySource: DataFrame,
      appendSource: DataFrame,
      keyCols: Seq[String]): (Seq[StructField], DataFrame, Seq[String], Seq[String]) = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val schema = view.schema.getOrElse(
      sys.error(s"merge-on-read upsert on $root needs a v2 manifest (recorded schema)"))
    keyCols.foreach(k =>
      require(
        schema.fieldNames.contains(k) && keySource.columns.contains(k),
        s"upsert key column '$k' is not in both the table schema and the source"))
    schema.fieldNames.foreach(c =>
      require(
        appendSource.columns.contains(c),
        s"upsert source is missing table column '$c' — sources carry FULL replacement rows"))
    val keyFields = keyCols.map(k => schema.fields.find(_.name == k).get)
    val sourceKeys = keySource.select(
      keyFields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    val partCols =
      if (view.partCols.nonEmpty) view.partCols else Snapshots.partitionColsFromRels(view.rels)
    val alive = view.rels.filterNot(r =>
      Snapshots.fullyDeleted(view.stats.getOrElse(r, Map.empty)))
    (keyFields, sourceKeys, partCols, alive)
  }

  /** Candidate files the most recent upsert/CDC-apply on this thread
    * match-scanned — observability for the narrowing laws (a spec must be
    * able to assert an epoch touching one day's keys did not scan other
    * days' files). The [[Snapshots.lastCommitFooterReads]] discipline.
    */
  private[sources] val lastUpsertCandidateFiles: ThreadLocal[Long] = new ThreadLocal[Long] {
    override def initialValue(): Long = -1L
  }

  /** Past this many distinct keys an epoch skips per-file BLOOM probing
    * (the range stage still applies): tuple probes cost
    * keys × bloom-cols bitset tests per candidate file, and a backfill
    * epoch carrying millions of keys matches most files anyway — the
    * probe would be pure overhead on top of the real join that decides.
    */
  val BloomProbeMaxKeys = 4096L

  /** The candidate-file set a distinct-key batch can possibly match —
    * the shared narrowing front of every keyed merge-on-read op (upsert,
    * CDC-apply, and [[Mv]]'s affected-group recompute). Keys covering the
    * partition columns narrow partition-exactly in the typed domain;
    * otherwise [[narrowByKeyStats]] applies the stats-interval + bloom
    * tuple discipline. `keys0` must already be distinct (and should be
    * persisted by the caller — this path counts and re-scans it).
    *
    * `nullSafe = true` serves the null-safe (`<=>`) match faces: key
    * tuples carrying a NULL component can only match rows that are NULL
    * there, which footer min/max, partition-value equality and bloom
    * probes are all blind to (stats ignore nulls). The batch splits:
    * null-FREE tuples narrow exactly as above, and null-BEARING tuples
    * admit precisely the files that can hold a NULL in some
    * null-bearing key column — per-file NULL-COUNT stats prune data
    * columns (a file recording zero nulls can never match), the path
    * segment prunes partition columns (only the null-rendering segment
    * can), and a file with no recorded stats stays conservatively. A
    * mostly-non-NULL workload keeps change-pricing; only the genuinely
    * null-bearing slice of the table joins the scan.
    */
  private[sources] def candidateRelsForKeys(
      spark: SparkSession,
      root: String,
      view: Snapshots.ManifestView,
      alive: Seq[String],
      keys0: DataFrame,
      keyCount: Long,
      keyCols: Seq[String],
      keyFields: Seq[StructField],
      partCols: Seq[String],
      nullSafe: Boolean = false): Seq[String] = {
    if (alive.isEmpty || keyCount == 0L) return Seq.empty
    if (!nullSafe)
      return candidatesNullFree(spark, root, view, alive, keys0, keyCount, keyCols, keyFields, partCols)
    // ONE tiny agg learns which key columns bear nulls and how many
    // tuples carry any — the split is driver-metadata-priced
    val anyNull = keyCols.map(col(_).isNull).reduce(_ || _)
    val aggCols = keyCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__graft_nulls_$c")) :+
      sum(when(anyNull, 1L).otherwise(0L)).as("__graft_nulls_any")
    val row = keys0.agg(aggCols.head, aggCols.tail: _*).head()
    val nAny = row.getLong(keyCols.size)
    if (nAny == 0L)
      return candidatesNullFree(spark, root, view, alive, keys0, keyCount, keyCols, keyFields, partCols)
    val nullCols = keyCols.zipWithIndex.collect { case (c, i) if row.getLong(i) > 0L => c }
    val base =
      if (nAny == keyCount) Seq.empty
      else candidatesNullFree(
        spark, root, view, alive, keys0.filter(!anyNull), keyCount - nAny, keyCols, keyFields, partCols)
    val baseSet = base.toSet
    val nullable = nullBearingCandidates(view, alive, nullCols, partCols).toSet
    alive.filter(rel => baseSet.contains(rel) || nullable.contains(rel))
  }

  /** [[candidateRelsForKeys]]'s null-FREE core: partition-exact when the
    * keys cover the partition columns, stats+bloom narrowing otherwise.
    */
  private def candidatesNullFree(
      spark: SparkSession,
      root: String,
      view: Snapshots.ManifestView,
      alive: Seq[String],
      keys0: DataFrame,
      keyCount: Long,
      keyCols: Seq[String],
      keyFields: Seq[StructField],
      partCols: Seq[String]): Seq[String] =
    if (partCols.nonEmpty && partCols.forall(keyCols.contains)) {
      val relDf = partitionValuesDf(spark, view, alive, partCols)
      val touched = keys0.select(partCols.map(col): _*).distinct()
      relDf
        .join(broadcast(touched), partCols.toSeq, "left_semi")
        .select(col("__graft_scope_rel__"))
        .collect()
        .map(_.getString(0))
        .toSeq
    } else narrowByKeyStats(spark, root, view, alive, keys0, keyCount, keyFields)

  /** The files that can possibly hold a row with NULL in some
    * `nullCols` column — [[candidateRelsForKeys]]'s null-bearing arm.
    * Exclusion only on a definite miss: a recorded zero null-count (data
    * column) or a non-null path segment (partition column); unknown
    * keeps the file. Union over columns — a per-tuple conjunction would
    * prune tighter but the union is already a superset of every tuple's
    * true match set, the read path's pruning contract.
    */
  private[sources] def nullBearingCandidates(
      view: Snapshots.ManifestView,
      alive: Seq[String],
      nullCols: Seq[String],
      partCols: Seq[String]): Seq[String] =
    alive.filter { rel =>
      nullCols.exists { c =>
        if (partCols.contains(c))
          graft.sources.snap.SnapFilters
            .partSegments(rel)
            .get(c)
            .flatMap(graft.sources.snap.SnapFilters.segValue)
            .isEmpty
        else
          Snapshots.nullCountOf(view.stats.getOrElse(rel, Map.empty), c).forall(_ > 0L)
      }
    }

  /** Candidate narrowing when the MERGE keys do NOT cover the partition
    * columns — the batch [[deleteWhere]] three-stage discipline ported to
    * the epoch shape (stage 1, fully-deleted skip, already ran in the
    * caller's `alive`):
    *
    *  2. RANGE: one tiny agg over the epoch's distinct keys computes each
    *     key column's min/max, rendered through `CAST(… AS STRING)` (the
    *     manifest-stat string domain); files whose recorded interval
    *     misses any key column's range are dropped with zero I/O — a
    *     day's worth of keys against a day-clustered 100 TB table keeps
    *     that day's files only. A key column with NO non-null value in
    *     the batch matches nothing at all (null keys never match), so
    *     the epoch short-circuits to zero candidates.
    *  3. BLOOM: when the epoch is small enough to enumerate
    *     ([[BloomProbeMaxKeys]]), each surviving file must admit at least
    *     one key TUPLE through every bloom-indexed key column's sidecar —
    *     the point-erasure discipline, tuple-accurate (a file admitting
    *     k1 of one tuple and k2 of another but no whole tuple is
    *     dropped).
    *
    * Both stages may only EXCLUDE on a definite miss (unrenderable
    * values, absent stats and absent sidecars all keep the file), so the
    * match join below sees a superset of the true match set — exactly
    * the read path's pruning contract.
    */
  private def narrowByKeyStats(
      spark: SparkSession,
      root: String,
      view: Snapshots.ManifestView,
      alive: Seq[String],
      keys: DataFrame,
      keyCount: Long,
      keyFields: Seq[StructField]): Seq[String] = {
    import org.apache.spark.sql.functions.{max => smax, min => smin}
    if (keyCount == 0L) return Seq.empty
    val aggCols = keyFields.flatMap { f =>
      // FLOAT stats were recorded through Number.doubleValue() (0.1f →
      // "0.10000000149011612"), while CAST(float AS STRING) renders the
      // shortest FLOAT decimal ("0.1") — compared as doubles those
      // differ, so a key equal to a file's boundary value would be
      // wrongly excluded. Widen the probe through the SAME JVM
      // float→double path the stats used before rendering.
      val probe = f.dataType match {
        case org.apache.spark.sql.types.FloatType => col(f.name).cast("double")
        case _ => col(f.name)
      }
      Seq(
        smin(probe).cast("string").as(s"lo_${f.name}"),
        smax(probe).cast("string").as(s"hi_${f.name}"))
    }
    val row = keys.agg(aggCols.head, aggCols.tail: _*).head()
    val ranges: Seq[(String, Option[String], Option[String])] = keyFields.map { f =>
      (f.name, Option(row.getAs[String](s"lo_${f.name}")), Option(row.getAs[String](s"hi_${f.name}")))
    }
    // a key column that is null on EVERY source row can never equal a
    // table value — the epoch provably matches nothing
    if (ranges.exists { case (_, lo, hi) => lo.isEmpty && hi.isEmpty }) return Seq.empty
    val statsPruned = alive.filter(rel =>
      Snapshots.fileMatchesRanges(view.stats.getOrElse(rel, Map.empty), ranges))
    val bloomKeyCols = keyFields.map(_.name).filter(view.bloomCols.contains)
    if (bloomKeyCols.isEmpty || statsPruned.isEmpty || keyCount > BloomProbeMaxKeys)
      return statsPruned
    // tuples with a null in any bloom-probed key column can't match and
    // must not vacuously admit files
    val tuples: Array[Seq[String]] = keys
      .select(bloomKeyCols.map(c => col(c).cast("string")): _*)
      .collect()
      .map(r => bloomKeyCols.indices.map(i => r.getString(i)): Seq[String])
      .filter(_.forall(_ != null))
    if (tuples.isEmpty) return Seq.empty
    statsPruned.filter { rel =>
      tuples.exists(t =>
        bloomKeyCols.zip(t).forall { case (c, v) =>
          Snapshots.bloomMightContain(spark, root, rel, c, v)
        })
    }
  }

  /** Write `df` into the table's hive layout via a hidden stage dir and
    * land each part file under the table root, prefixed `epochPrefix` so
    * a crashed attempt's leftovers are DISCOVERABLE. Two orphan defenses
    * (a listing-based commit would otherwise silently adopt strays as
    * duplicate rows):
    *  - before landing, every target directory is swept for uncommitted
    *    files carrying this epoch's prefix — a prior attempt that crashed
    *    between landing and commit — and they are deleted (bounded by the
    *    batch's own partitions, not the table);
    *  - a landing failure rolls back the files this attempt already
    *    landed before rethrowing.
    * The part names keep their Spark-generated uniqueness under the
    * prefix, so rels are never reused (the archive invariant). Returns
    * the landed rels; the caller commits them (and deletes them if the
    * commit itself fails).
    */
  private def landAppend(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      rootPath: Path,
      df: DataFrame,
      partCols: Seq[String],
      tag: String,
      epochPrefix: String,
      committedRels: Set[String]): Seq[String] = {
    val stage = new Path(rootPath, s".mor-upsert-$tag")
    if (fs.exists(stage)) fs.delete(stage, true)
    val writer =
      if (partCols.nonEmpty)
        // co-locate each partition's rows (the mergeIntoPartitioned
        // small-files discipline): ~one file per touched partition value
        df.repartition(partCols.map(col): _*).write.partitionBy(partCols: _*)
      else df.coalesce(1).write
    writer.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(stage.toString)
    // shared landing discipline ([[Snapshots.stagedParts]]): zero-row
    // parts never land — a pure-delete CDC epoch must not commit an empty
    // parquet file — and footer checks run in the driver pool
    val rootUri = fs.makeQualified(rootPath).toUri.getPath
    val targets = Snapshots.stagedParts(spark, fs, stage).map { case (p, stageRel) =>
      val cut = stageRel.lastIndexOf('/')
      val rel =
        if (cut < 0) epochPrefix + stageRel
        else stageRel.substring(0, cut + 1) + epochPrefix + stageRel.substring(cut + 1)
      (p, rel)
    }
    // sweep crashed-attempt leftovers from exactly the dirs this batch
    // lands into: same epoch prefix, present on disk, absent from the
    // committed manifest
    targets.map(t => new Path(rootPath, t._2).getParent).distinct.foreach { dir =>
      if (fs.exists(dir)) {
        fs.listStatus(dir).foreach { st =>
          if (st.isFile && st.getPath.getName.startsWith(epochPrefix)) {
            val rel = fs.makeQualified(st.getPath).toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
            if (!committedRels.contains(rel)) fs.delete(st.getPath, false)
          }
        }
      }
    }
    val rels = Snapshots.landParts(fs, rootPath, targets)
    fs.delete(stage, true)
    rels
  }

  private def upsertMarker(rootPath: Path, tag: String): Path =
    new Path(
      new Path(rootPath, Snapshots.ManifestDirName),
      s".mor-epoch-${java.net.URLEncoder.encode(tag, "UTF-8")}")

  private def lastUpsertEpoch(
      fs: org.apache.hadoop.fs.FileSystem,
      rootPath: Path,
      tag: String): Long = {
    val m = upsertMarker(rootPath, tag)
    if (!fs.exists(m)) -1L
    else {
      val in = fs.open(m)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeUpsertEpoch(
      fs: org.apache.hadoop.fs.FileSystem,
      rootPath: Path,
      tag: String,
      epochId: Long): Unit = {
    val m = upsertMarker(rootPath, tag)
    fs.mkdirs(m.getParent)
    val tmp = new Path(m.getParent, s".mor-epoch-tmp-${java.net.URLEncoder.encode(tag, "UTF-8")}")
    val out = fs.create(tmp, true)
    try out.write(epochId.toString.getBytes("UTF-8"))
    finally out.close()
    fs.delete(m, false)
    if (!fs.rename(tmp, m)) sys.error(s"upsert epoch high-water update failed for $tag@$epochId")
  }

  /** Which of `rels` satisfy `pred` over their hive partition-path values?
    * Exact, not pruning: each file's segments parse as the DECLARED
    * partition-column types (`try_cast` — a value the type can't render
    * reads NULL, so it conservatively falls out of any value predicate)
    * and the predicate evaluates per file in one tiny local Spark job —
    * full Column expressiveness (IN lists, ranges, date arithmetic) with
    * O(DV'd files) driver metadata, never a data read.
    */
  private def scopeByPartitions(
      spark: SparkSession,
      view: Snapshots.ManifestView,
      rels: Seq[String],
      pred: Column): Set[String] = {
    val partCols =
      if (view.partCols.nonEmpty) view.partCols else Snapshots.partitionColsFromRels(view.rels)
    require(
      partCols.nonEmpty,
      "scoped materialize needs a hive-partitioned table — omit `where` to fold everything")
    partitionValuesDf(spark, view, rels, partCols)
      .filter(pred)
      .select(col("__graft_scope_rel__"))
      .collect()
      .map(_.getString(0))
      .toSet
  }

  /** One row per rel with its hive partition-path values parsed as the
    * DECLARED column types (`try_cast`: an unparseable dir value reads
    * NULL — the same value the scan splice would produce). The per-file
    * partition-domain the scoped fold and the upsert narrowing share.
    */
  private def partitionValuesDf(
      spark: SparkSession,
      view: Snapshots.ManifestView,
      rels: Seq[String],
      partCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val rows = rels.map { rel =>
      val segs = graft.sources.snap.SnapFilters.partSegments(rel)
      Row.fromSeq(
        rel +: partCols.map(c =>
          segs.get(c).flatMap(graft.sources.snap.SnapFilters.segValue).orNull))
    }
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(
        StructField("__graft_scope_rel__", StringType, nullable = false) +:
          partCols.map(c => StructField(c, StringType, nullable = true))))
    partCols.foldLeft(raw) { (df, c) =>
      view.schema.flatMap(_.fields.find(_.name == c)) match {
        case Some(f) =>
          df.withColumn(
            c,
            org.apache.spark.sql.functions.expr(s"try_cast(`$c` AS ${f.dataType.sql})"))
        case None => df
      }
    }
  }
}
