package graft.sources

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, expr, lit}
import org.apache.spark.sql.types.StructField

/** Incrementally-maintained MATERIALIZED VIEWS over snapshot tables —
  * `CREATE MATERIALIZED VIEW … GROUP BY …` with a refresh that prices at
  * the CHANGE, not the table.
  *
  * An MV is itself a snapshot table (so it time-travels, clones and
  * vacuums like any other) holding `SELECT keys…, aggs… FROM source GROUP
  * BY keys…`, plus one tiny definition file recording the source root,
  * the group keys, the aggregate expressions, and the source version the
  * view last reflected. [[refresh]] advances the view to the source's
  * head in three bounded steps:
  *
  *  1. AFFECTED GROUPS: the row-level change feed between the watermark
  *     and the head ([[graft.sources.snap.SnapChangesTable]] — reads only
  *     the versions' CHANGED files, compaction cancels to zero) projected
  *     onto the group keys, distinct. A day's CDC names a day's groups.
  *  2. RECOMPUTE: exactly those groups re-aggregate from the source head.
  *     This is full re-aggregation PER GROUP, so every aggregate is
  *     maintainable — `min`/`max` under deletes included, where
  *     delta-maintenance schemes go wrong. The scan is narrowed by the
  *     merge-on-read upsert's own candidate discipline
  *     ([[DeleteVectors.candidateRelsForKeys]]): group keys covering the
  *     partition columns prune partition-exactly; otherwise key min/max
  *     vs per-file stats intervals, then bloom tuple probes. A
  *     day-keyed MV over a day-clustered 100 TB table recomputes from
  *     ONE DAY's files.
  *  3. APPLY: recomputed groups MERGE into the view (merge-on-read
  *     upsert), groups whose last source row vanished DELETE — one
  *     atomic MV version; the watermark advances only after it commits.
  *
  * Crash contract: the watermark write is AFTER the MV commit, so a crash
  * between them replays the same window on the next refresh — the replay
  * recomputes the same groups to the same values and the upsert lands a
  * content-identical view (versions differ, content converges): the
  * foreachBatch-upsert idempotence argument.
  *
  * Fallback contract: when the change window is no longer expressible
  * (the source was vacuumed past the watermark), refresh DOWNGRADES to a
  * full resync — every group key on either side counts as affected, the
  * same apply path runs — and reports `fullResync = true`. Correctness
  * never depends on the feed; only the price does.
  *
  * NULL group keys are legitimate `GROUP BY` groups: the apply matches
  * them NULL-SAFELY (`<=>` — [[DeleteVectors.applyChanges]]'s
  * `nullSafeKeys` face), so NULL-keyed groups update and delete inside
  * the SAME atomic merge as every other group, and candidate narrowing
  * stays change-priced through per-file null-count stats (a file
  * recording zero nulls in the key columns can never hold a NULL-keyed
  * row and stays pruned; only null-bearing or stats-less files join the
  * conservative set).
  *
  * Beyond the reference's surface (a KV store has no views); the design
  * re-derives the lakehouse "incremental MV" idea over this format's own
  * change feed + upsert machinery.
  */
object Mv {

  /** A materialized view's recorded definition. `refreshedVersion` is the
    * SOURCE manifest version the view currently reflects.
    */
  final case class MvDef(
      sourceRoot: String,
      keyCols: Seq[String],
      aggExprs: Seq[String],
      refreshedVersion: Long,
      filterSql: Option[String] = None)

  /** One refresh's outcome: the source window applied, how many groups
    * recomputed / deleted, and whether the feed downgraded to a full
    * resync.
    */
  final case class RefreshReport(
      fromVersion: Long,
      toVersion: Long,
      groupsRecomputed: Long,
      groupsDeleted: Long,
      fullResync: Boolean)

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def defPath(mvRoot: Path): Path =
    new Path(new Path(mvRoot, Snapshots.ManifestDirName), "mv/def")

  private def enc(s: String): String = URLEncoder.encode(s, StandardCharsets.UTF_8.name())
  private def dec(s: String): String = URLDecoder.decode(s, StandardCharsets.UTF_8.name())

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Parse the view's definition file — LOUDLY (the [[Snapshots.refs]]
    * lesson: refresh derives what to recompute from it, so silently
    * tolerating a garbled line would silently build a wrong view).
    */
  def definition(spark: SparkSession, mvRoot: String): MvDef = {
    val p = defPath(new Path(mvRoot))
    val fs = fsOf(spark, p)
    // heal the writeDef crash window: the next-image file is COMPLETE by
    // construction (written and closed before the old def is deleted), so
    // a missing def with a present next-image means the crash fell
    // between delete and rename — finish the rename. With BOTH present
    // the old def is authoritative (the crash fell before the delete; the
    // stale watermark merely replays, which is idempotent).
    val next = new Path(p.getParent, ".def-next")
    if (!fs.exists(p) && fs.exists(next)) fs.rename(next, p)
    require(
      fs.exists(p),
      s"$mvRoot is not a materialized view — no definition at $p (create one with Mv.create)")
    def fail(msg: String): Nothing =
      sys.error(
        s"garbled materialized-view definition $p: $msg — refusing to refresh; " +
          "restore the file or recreate the view")
    val in = fs.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = txt.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    if (lines.headOption.isEmpty || lines.head != "graft-mv v1") fail("unknown header")
    var source: Option[String] = None
    var version: Option[Long] = None
    var filterSql: Option[String] = None
    val keys = scala.collection.mutable.ArrayBuffer.empty[String]
    val aggs = scala.collection.mutable.ArrayBuffer.empty[String]
    lines.tail.foreach { l =>
      l.split(" ", 2) match {
        case Array("source", v) => source = Some(dec(v))
        case Array("filter", v) => filterSql = Some(dec(v))
        case Array("version", v) =>
          version = Some(
            try v.toLong
            catch { case _: NumberFormatException => fail(s"unparseable version '$v'") })
        case Array("key", v) => keys += dec(v)
        case Array("agg", v) => aggs += dec(v)
        case _ => fail(s"unparseable line '$l'")
      }
    }
    if (keys.isEmpty) fail("no group keys recorded")
    if (aggs.isEmpty) fail("no aggregate expressions recorded")
    MvDef(
      source.getOrElse(fail("no source recorded")),
      keys.toSeq,
      aggs.toSeq,
      version.getOrElse(fail("no refreshed version recorded")),
      filterSql)
  }

  /** Durably (re)write the definition. Unlike the epoch markers (whose
    * loss merely replays), this file is the ONLY copy of the view's
    * keys/aggs/filter — a delete-then-rename crash must not strand the
    * view definition-less. The next image therefore lands under ONE
    * deterministic name BEFORE the old def is touched, and
    * [[definition]] heals the delete→rename window by finishing the
    * rename. All writers hold the MV table lock, so the fixed name never
    * races.
    */
  private def writeDef(fs: FileSystem, mvRoot: Path, d: MvDef): Unit = {
    val p = defPath(mvRoot)
    fs.mkdirs(p.getParent)
    val next = new Path(p.getParent, ".def-next")
    val body = (Seq("graft-mv v1", s"source ${enc(d.sourceRoot)}", s"version ${d.refreshedVersion}") ++
      d.filterSql.map(f => s"filter ${enc(f)}").toSeq ++
      d.keyCols.map(k => s"key ${enc(k)}") ++
      d.aggExprs.map(a => s"agg ${enc(a)}")).mkString("", "\n", "\n")
    val out = fs.create(next, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(next, p)) {
      // a LOCK-FREE reader's [[definition]] heal may have finished our
      // rename for us inside the delete→rename window — that is success,
      // not failure, iff the def now holds exactly this image
      val healed =
        fs.exists(p) && {
          val in = fs.open(p)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString == body
          finally in.close()
        }
      if (!healed) sys.error(s"materialized-view definition update failed for $p")
    }
  }

  /** `SELECT keys…, aggs… GROUP BY keys…` — THE aggregation, one shape at
    * create and at every refresh (determinism of the recompute is what
    * makes the crash-replay converge).
    */
  private def aggregated(src: DataFrame, d: MvDef): DataFrame =
    d.filterSql
      .fold(src)(f => src.filter(expr(f)))
      .groupBy(d.keyCols.map(col): _*)
      .agg(expr(d.aggExprs.head), d.aggExprs.tail.map(expr): _*)

  /** Create the view: one full aggregation at the source's current head,
    * committed as a snapshot table with stats AND bloom sidecars on the
    * group keys (the refresh upsert's narrowing discipline rides them),
    * then the definition file. `mvRoot` must be fresh.
    */
  def create(
      spark: SparkSession,
      sourceRoot: String,
      mvRoot: String,
      keyCols: Seq[String],
      aggExprs: Seq[String],
      filterSql: Option[String] = None): Long = {
    require(keyCols.nonEmpty, "Mv.create: at least one group-key column")
    require(aggExprs.nonEmpty, "Mv.create: at least one aggregate expression")
    val srcV = Snapshots.latestVersion(spark, sourceRoot)
    require(
      srcV > 0L,
      s"Mv.create: source $sourceRoot has no committed manifest — a view materializes a " +
        "snapshot table (Snapshots.commit / createTable first)")
    val mvPath = new Path(mvRoot)
    val fs = fsOf(spark, mvPath)
    require(
      Snapshots.latestVersion(spark, mvRoot) == 0L && !fs.exists(defPath(mvPath)),
      s"Mv.create: $mvRoot already holds a table or view — drop it or pick another root")
    val d = MvDef(sourceRoot, keyCols, aggExprs, srcV, filterSql.map(_.trim).filter(_.nonEmpty))
    val full = aggregated(Snapshots.readSnapshot(spark, sourceRoot, srcV), d)
    val cols = full.columns.toSeq
    require(
      cols.take(keyCols.size) == keyCols,
      s"Mv.create: group keys did not project as declared (got ${cols.mkString(", ")})")
    val aliases = cols.drop(keyCols.size)
    aliases.foreach(a =>
      require(
        a.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"Mv.create: aggregate column '$a' needs an explicit simple alias — " +
          "write e.g. 'sum(x) AS total_x'"))
    require(
      (aliases ++ keyCols).distinct.size == aliases.size + keyCols.size,
      s"Mv.create: duplicate output column among ${cols.mkString(", ")}")
    Sources.writeParquet(full, mvRoot)
    val v = Snapshots.commit(spark, mvRoot, keyCols, keyCols)
    writeDef(fs, mvPath, d)
    v
  }

  /** Advance the view to the source's current head. Returns the window
    * applied and the group counts; a no-op (already at head) returns
    * zeros. Snapshot-consistent under concurrent source writers: the
    * whole refresh reads the source PINNED at the head observed on entry,
    * and the watermark records exactly that version.
    */
  def refresh(spark: SparkSession, mvRoot: String): RefreshReport =
    Snapshots.withTableLock(spark, mvRoot) {
      val d = definition(spark, mvRoot)
      val v1 = Snapshots.latestVersion(spark, d.sourceRoot)
      require(
        v1 >= d.refreshedVersion,
        s"materialized view $mvRoot reflects source version ${d.refreshedVersion} but " +
          s"${d.sourceRoot} is at $v1 — the source was replaced wholesale; recreate the view")
      if (v1 == d.refreshedVersion)
        return RefreshReport(v1, v1, 0L, 0L, fullResync = false)
      val mvPath = new Path(mvRoot)
      val fs = fsOf(spark, mvPath)
      val incremental = affectedKeysViaChanges(spark, d, v1)
      val affected = incremental.getOrElse {
        // full resync: every group on either side is affected — same
        // apply path, full price, still correct for every aggregate
        val srcKeys = keysOf(spark, d.sourceRoot, v1, d.keyCols, d.filterSql)
        val mvKeys = keysOf(spark, mvRoot, -1L, d.keyCols, None)
        srcKeys.unionByName(mvKeys).distinct().persist()
      }
      try {
        val (rec, del) = applyDelta(spark, d, mvRoot, affected, v1)
        writeDef(fs, mvPath, d.copy(refreshedVersion = v1))
        RefreshReport(d.refreshedVersion, v1, rec, del, fullResync = incremental.isEmpty)
      } finally affected.unpersist()
    }

  /** The distinct group keys of a pinned snapshot — empty-table-safe (a
    * fully-deleted table yields an empty frame in the recorded schema
    * instead of [[Snapshots.readSnapshot]]'s no-files refusal).
    */
  private def keysOf(
      spark: SparkSession,
      root: String,
      version: Long,
      keyCols: Seq[String],
      filterSql: Option[String]): DataFrame = {
    val view = Snapshots.manifestView(spark, root, version)
    val live = view.rels.filterNot(r =>
      Snapshots.fullyDeleted(view.stats.getOrElse(r, Map.empty)))
    if (live.isEmpty) {
      val sch = view.schema.getOrElse(sys.error(s"$root records no schema"))
      val keyed = org.apache.spark.sql.types.StructType(
        keyCols.map(c =>
          sch.fields
            .find(_.name == c)
            .getOrElse(sys.error(s"group key '$c' is not a column of $root"))))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], keyed)
    } else {
      val df = Snapshots.scanRels(spark, root, live, view.schema, Snapshots.dvByRel(view))
      filterSql.fold(df)(f => df.filter(expr(f))).select(keyCols.map(col): _*)
    }
  }

  /** The affected group keys via the row-level change feed — `None` when
    * the window is no longer expressible (vacuumed predecessor data), in
    * which case the caller downgrades to a full resync. The frame is
    * persisted and FORCED here so a feed refusal surfaces before any MV
    * mutation.
    */
  private def affectedKeysViaChanges(
      spark: SparkSession,
      d: MvDef,
      v1: Long): Option[DataFrame] = {
    import scala.jdk.CollectionConverters._
    val keys =
      try {
        val tbl = new graft.sources.snap.SnapChangesTable(d.sourceRoot)
        val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          Map(
            "startingversion" -> (d.refreshedVersion + 1L).toString,
            "endingversion" -> v1.toString).asJava)
        val rel = org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
          .create(tbl, None, None, opts)
        val feed = org.apache.spark.sql.graft.Bridge.ofRows(spark, rel)
        d.filterSql
          .fold(feed)(f => feed.filter(expr(f)))
          .select(d.keyCols.map(col): _*)
          .distinct()
          .persist()
      } catch {
        case NonFatal(e) =>
          log.warn(
            s"materialized-view refresh: change feed for ${d.sourceRoot} " +
              s"(${d.refreshedVersion}, $v1] not plannable (${e.getMessage}); full resync",
            e)
          return None
      }
    try {
      keys.count() // force NOW: a vacuumed window surfaces here, not mid-apply
      Some(keys)
    } catch {
      case NonFatal(e) =>
        keys.unpersist()
        log.warn(
          s"materialized-view refresh: change feed for ${d.sourceRoot} " +
            s"(${d.refreshedVersion}, $v1] unreadable (${e.getMessage}); full resync",
          e)
        None
    }
  }

  /** Recompute `affected` groups from the source pinned at `v1` and merge
    * the outcome into the view in ONE atomic MV version: fresh values
    * upsert, vanished groups delete — NULL-keyed groups included, via the
    * null-safe apply. Returns (groups recomputed, groups deleted).
    */
  private def applyDelta(
      spark: SparkSession,
      d: MvDef,
      mvRoot: String,
      affected: DataFrame,
      v1: Long): (Long, Long) = {
    val n = affected.count()
    if (n == 0L) return (0L, 0L) // e.g. a pure-compaction window: nothing changed
    val srcView = Snapshots.manifestView(spark, d.sourceRoot, v1)
    val srcSchema = srcView.schema.getOrElse(
      sys.error(s"source ${d.sourceRoot} records no schema — commit with statsCols first"))
    val keyFields: Seq[StructField] = d.keyCols.map(c =>
      srcSchema.fields
        .find(_.name == c)
        .getOrElse(sys.error(s"group key '$c' is no longer a column of ${d.sourceRoot}")))
    // compare in the TABLE's key domain (the upsert prologue's cast)
    val affectedCast =
      affected.select(keyFields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    val srcPartCols =
      if (srcView.partCols.nonEmpty) srcView.partCols
      else Snapshots.partitionColsFromRels(srcView.rels)
    val alive = srcView.rels.filterNot(r =>
      Snapshots.fullyDeleted(srcView.stats.getOrElse(r, Map.empty)))
    // null-safe narrowing: NULL-keyed affected groups admit exactly the
    // null-bearing files (per-file null-count stats / path segments),
    // everything else narrows on stats+bloom as usual
    val candidates = DeleteVectors.candidateRelsForKeys(
      spark, d.sourceRoot, srcView, alive, affectedCast, n, d.keyCols, keyFields, srcPartCols,
      nullSafe = true)
    val mvSchema = Snapshots
      .manifestView(spark, mvRoot)
      .schema
      .getOrElse(sys.error(s"materialized view $mvRoot records no schema"))
    val recomputed = (if (candidates.isEmpty) {
                        // every affected group's last row vanished: nothing to recompute
                        spark.createDataFrame(
                          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                          mvSchema)
                      } else {
                        val scan = Snapshots.scanRels(
                          spark, d.sourceRoot, candidates, srcView.schema, Snapshots.dvByRel(srcView))
                        val keysB =
                          if (n <= Snapshots.DvBroadcastMaxPositions) broadcast(affectedCast)
                          else affectedCast
                        // null-safe semi-join: NULL is a legitimate group key
                        val cond = d.keyCols.map(c => scan(c) <=> keysB(c)).reduce(_ && _)
                        aggregated(scan.join(keysB, cond, "left_semi"), d)
                      }).persist()
    try {
      val recKeys = recomputed.select(d.keyCols.map(col): _*)
      val vanished = affectedCast
        .join(recKeys, d.keyCols.map(c => affectedCast(c) <=> recKeys(c)).reduce(_ && _), "left_anti")
        .persist()
      try {
        val recCount = recomputed.count()
        val delCount = vanished.count()
        val opCol = "__graft_mv_op__"
        def shaped(df: DataFrame, keysOnly: Boolean): DataFrame =
          df.select(mvSchema.fields.toSeq.map { f =>
            (if (!keysOnly || d.keyCols.contains(f.name)) col(f.name).cast(f.dataType)
             else lit(null).cast(f.dataType)).as(f.name)
          }: _*)
        val changes = shaped(recomputed, keysOnly = false)
          .withColumn(opCol, lit("u"))
          .unionByName(shaped(vanished, keysOnly = true).withColumn(opCol, lit("d")))
        // nullSafeKeys: a NULL-keyed group's old view row matches its
        // fresh image through `<=>`, so NULL groups ride the SAME atomic
        // commit as every other group (no separate pre-delete version —
        // a reader between two commits could otherwise see a view state
        // corresponding to no source snapshot)
        DeleteVectors.applyChanges(spark, mvRoot, changes, d.keyCols, opCol, nullSafeKeys = true)
        (recCount, delCount)
      } finally vanished.unpersist()
    } finally recomputed.unpersist()
  }
}
