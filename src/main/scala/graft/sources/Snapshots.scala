package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pinned snapshot reads for maintained parquet tables — the
  * minimal table-format commit layer over [[Sources.deleteWhere]] /
  * [[Sources.mergeIntoPartitioned]] / [[Sources.compactParquet]].
  *
  * Problem: those maintenance ops are crash-safe per file/partition, but a
  * concurrent reader listing the directory mid-operation can see a
  * half-swapped file set, and yesterday's version is unrecoverable the
  * moment the swap lands. The lakehouse answer (Iceberg/Delta) is to make
  * the FILE LIST the unit of commit: a reader pins a manifest — an
  * explicit list of data files — and reads exactly those files, immune to
  * concurrent directory churn; maintenance never deletes a replaced file,
  * it ARCHIVES it (rename into a dot-prefixed sibling tree, invisible to
  * directory listers), so every pinned manifest stays fully readable until
  * an explicit [[vacuum]].
  *
  * Layout under the table root:
  *  - `_graft_manifests/v0000000001.manifest` … — one relative data-file
  *    path per line, sorted; committed via temp-write + atomic rename.
  *    Underscore prefix → invisible to Spark's file index (same convention
  *    as `_SUCCESS`/`_spark_metadata`).
  *  - `.snap-archive/<relpath>` — replaced data files, preserving their
  *    partition-dir structure (`day=X/part-….parquet`), so snapshot reads
  *    keep hive partition-column inference (archived files scan with
  *    `basePath = <root>/.snap-archive`, under which the `k=v` segments
  *    line up exactly as the live tree's do).
  *
  * Relative paths are never reused: Spark part-file names carry a per-job
  * UUID, and [[Sources.deleteWhere]] gives rewritten files a fresh name —
  * so `<relpath>` is a stable identity and the flat archive cannot
  * collide ([[archiveFile]] still checks and fails loudly).
  *
  * Scale: a manifest is one line per data file — the same metadata the
  * scan's own listing materializes; commits cost one listing + one small
  * file write, reads cost zero extra I/O (the explicit file list REPLACES
  * the directory listing). Single-writer per table, like the maintenance
  * ops themselves; readers need no coordination at any concurrency.
  */
object Snapshots {

  val ManifestDirName = "_graft_manifests"
  val ArchiveDirName = ".snap-archive"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: Path) = new Path(root, ManifestDirName)

  private def manifestPath(root: Path, version: Long) =
    new Path(manifestDir(root), f"v$version%010d.manifest")

  private def isHidden(name: String): Boolean =
    name.startsWith(".") || name.startsWith("_")

  /** Enforced single-writer: maintenance ops run under an exclusive table
    * lock (create-exclusive `_graft_manifests/.lock`, atomic on every
    * hadoop FS that supports atomic create — local FS and HDFS do; object
    * stores would swap in a conditional PUT). The lock carries its epoch
    * millis + owner tag; a lock older than `staleMs` is presumed crashed
    * and broken. Readers never touch the lock — snapshot reads stay
    * coordination-free at any concurrency.
    */
  def withTableLock[T](spark: SparkSession, root: String, staleMs: Long = 10 * 60 * 1000L)(body: => T): T = {
    val dir = manifestDir(new Path(root))
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    val lock = new Path(dir, ".lock")
    val tag = s"${System.currentTimeMillis()} ${spark.sparkContext.applicationId}"
    var acquired = false
    var attempts = 0
    while (!acquired) {
      try {
        val out = fs.create(lock, false) // create-exclusive: the atomic acquire
        try out.write(tag.getBytes("UTF-8"))
        finally out.close()
        acquired = true
      } catch {
        case _: java.io.IOException =>
          val ageMs =
            try {
              val in = fs.open(lock)
              val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
              System.currentTimeMillis() - txt.trim.split(" ").head.toLong
            } catch { case _: Exception => 0L } // racing holder mid-write: treat as fresh
          if (ageMs > staleMs) fs.delete(lock, false) // crashed holder: break and retry
          else {
            attempts += 1
            if (attempts > 600) sys.error(s"table $root is locked by another writer (${lock})")
            Thread.sleep(50)
          }
      }
    }
    try body
    finally fs.delete(lock, false)
  }

  /** Current data files of the table, as root-relative paths (sorted).
    * Skips hidden files/dirs at every level — manifests, archive, staging
    * and `_SUCCESS` markers are never data.
    */
  def listDataFiles(spark: SparkSession, root: String): Seq[String] = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val rootUri = rootPath.makeQualified(fs.getUri, fs.getWorkingDirectory).toUri
    def walk(dir: Path): Seq[String] =
      fs.listStatus(dir).toSeq.filterNot(st => isHidden(st.getPath.getName)).flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else Seq(rootUri.relativize(st.getPath.toUri).getPath)
      }
    walk(rootPath).sorted
  }

  /** Latest committed manifest version, or 0 if none. */
  def latestVersion(spark: SparkSession, root: String): Long = {
    val dir = manifestDir(new Path(root))
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) 0L
    else
      fs.listStatus(dir)
        .toSeq
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
          n.stripPrefix("v").stripSuffix(".manifest").toLong
        }
        .sorted
        .lastOption
        .getOrElse(0L)
  }

  /** Commit the table's CURRENT file set as the next manifest version.
    * Atomic (temp write + rename); returns the committed version.
    */
  def commit(spark: SparkSession, root: String): Long = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val files = listDataFiles(spark, root)
    val version = latestVersion(spark, root) + 1L
    val dir = manifestDir(rootPath)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID().toString}")
    val out = fs.create(tmp, false)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val target = manifestPath(rootPath, version)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      sys.error(s"manifest commit race at $target — Snapshots is single-writer per table")
    }
    version
  }

  /** Commit a baseline manifest iff the table has none — called by the
    * maintenance ops so the PRE-maintenance state is always pinnable.
    */
  def ensureBaseline(spark: SparkSession, root: String): Long = {
    val v = latestVersion(spark, root)
    if (v > 0L) v else commit(spark, root)
  }

  /** The root-relative file list of manifest `version` (≤0 → latest). */
  def files(spark: SparkSession, root: String, version: Long = -1L): Seq[String] = {
    val v = if (version > 0) version else latestVersion(spark, root)
    require(v > 0, s"no manifest committed under $root")
    val p = manifestPath(new Path(root), v)
    val fs = fsOf(spark, p)
    require(fs.exists(p), s"manifest v$v does not exist under $root (vacuumed or never committed)")
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Resolve a manifest entry to its current location: live path if the
    * file is still live, archive path if maintenance replaced it.
    */
  def resolve(spark: SparkSession, root: String, rel: String): Path = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val live = new Path(rootPath, rel)
    if (fs.exists(live)) live
    else {
      val archived = new Path(new Path(rootPath, ArchiveDirName), rel)
      if (fs.exists(archived)) archived
      else sys.error(s"snapshot file $rel is neither live nor archived — vacuumed?")
    }
  }

  /** Read the table pinned at manifest `version` (≤0 → latest): an
    * explicit-file-list scan, immune to concurrent maintenance.
    *
    * Live and archived files are scanned separately, each with its own
    * `basePath` (the archive preserves the `k=v` partition-dir structure,
    * so hive partition-column inference works on both sides — but a single
    * scan mixing the two roots would trip Spark's conflicting-directory
    * check on the extra `.snap-archive` segment), then unioned by name.
    * Still one job, two file sources — no shuffle, no extra I/O.
    */
  def readSnapshot(spark: SparkSession, root: String, version: Long = -1L): DataFrame = {
    val rels = files(spark, root, version)
    require(rels.nonEmpty, s"manifest under $root lists no data files")
    val (live, archived) = rels.map(rel => resolve(spark, root, rel)).partition { p =>
      !p.toString.contains(s"/$ArchiveDirName/")
    }
    val archiveBase = new Path(new Path(root), ArchiveDirName).toString
    val scans = Seq(root -> live, archiveBase -> archived).collect {
      case (base, ps) if ps.nonEmpty =>
        spark.read.option("basePath", base).parquet(ps.map(_.toString): _*)
    }
    scans.reduce(_.unionByName(_))
  }

  /** Row-level change feed between two pinned manifests — the
    * `table_changes()` a lakehouse exposes, computed from the snapshots
    * themselves: rows in `fromVersion` but not `toVersion` are tagged
    * `removed`, the reverse `added` (multiset semantics via `exceptAll`,
    * so duplicate rows diff by count). An UPDATE surfaces as its old row
    * removed + its new row added. Scale: two snapshot scans + the
    * hash-partitioned exceptAll pair — no state beyond the shuffle, and
    * file-level pruning applies because unchanged files resolve to the
    * SAME archived-or-live path on both sides.
    */
  def diff(spark: SparkSession, root: String, fromVersion: Long, toVersion: Long = -1L): DataFrame = {
    val from = readSnapshot(spark, root, fromVersion)
    val to = readSnapshot(spark, root, toVersion)
    import org.apache.spark.sql.functions.lit
    from
      .exceptAll(to)
      .withColumn("change", lit("removed"))
      .unionByName(to.exceptAll(from).withColumn("change", lit("added")))
  }

  /** Move a replaced data file into the archive, preserving its relative
    * path. Called by the maintenance ops INSTEAD of delete.
    *
    * A rel path denotes ONE immutable file forever, so an already-archived
    * dst can only mean the live file is a [[restore]]d duplicate of the
    * archived bytes — drop the duplicate (length-checked) instead of
    * failing; any length mismatch still fails loudly (it would mean the
    * never-reuse invariant broke).
    */
  def archiveFile(fs: FileSystem, root: Path, live: Path): Unit = {
    val rootUri = root.makeQualified(fs.getUri, fs.getWorkingDirectory).toUri
    val rel = rootUri.relativize(live.makeQualified(fs.getUri, fs.getWorkingDirectory).toUri).getPath
    require(!rel.startsWith("/") && rel.nonEmpty, s"$live is not under $root")
    val dst = new Path(new Path(root, ArchiveDirName), rel)
    if (fs.exists(dst)) {
      if (fs.getFileStatus(dst).getLen != fs.getFileStatus(live).getLen)
        sys.error(s"archive collision at $dst with DIFFERENT size — rel path reused, invariant broken")
      fs.delete(live, false) // restored duplicate of immutable archived bytes
    } else {
      fs.mkdirs(dst.getParent)
      if (!fs.rename(live, dst)) sys.error(s"archive rename $live -> $dst failed")
    }
  }

  /** RESTORE the table to manifest `version` — the O(files) undo of a bad
    * delete/merge/compaction. The LIVE tree is rewritten to exactly that
    * manifest's file list: live files the target doesn't reference are
    * archived, referenced files currently in the archive are copied back
    * live (copy, not move — the archive keeps serving every other
    * manifest), and the restored state commits as a NEW version, so
    * history stays linear and every prior manifest remains readable.
    * After restore, directory readers and manifest readers agree again.
    */
  def restore(spark: SparkSession, root: String, version: Long): Long = withTableLock(spark, root) {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val target = files(spark, root, version).toSet
    val live = listDataFiles(spark, root).toSet
    (live -- target).toSeq.sorted.foreach { rel =>
      archiveFile(fs, rootPath, new Path(rootPath, rel))
    }
    (target -- live).toSeq.sorted.foreach { rel =>
      val src = new Path(new Path(rootPath, ArchiveDirName), rel)
      require(fs.exists(src), s"restore: $rel is neither live nor archived (vacuumed?)")
      val dst = new Path(rootPath, rel)
      fs.mkdirs(dst.getParent)
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, spark.sparkContext.hadoopConfiguration)
    }
    commit(spark, root)
  }

  /** Archive every (non-hidden) file under `dir`, mapping it to the
    * archive path it would have had under `relBase` (the directory's
    * original root-relative location), then remove `dir`. Used by merge,
    * whose old partition dir has already been renamed aside.
    */
  def archiveDirContents(fs: FileSystem, root: Path, dir: Path, relBase: String): Unit = {
    def walk(d: Path, rel: String): Unit =
      fs.listStatus(d).foreach { st =>
        val name = st.getPath.getName
        val childRel = if (rel.isEmpty) name else s"$rel/$name"
        if (st.isDirectory) walk(st.getPath, childRel)
        else if (!isHidden(name)) {
          val dst = new Path(new Path(root, ArchiveDirName), childRel)
          if (fs.exists(dst))
            sys.error(s"archive collision at $dst — relative data-file paths must never be reused")
          fs.mkdirs(dst.getParent)
          if (!fs.rename(st.getPath, dst)) sys.error(s"archive rename ${st.getPath} -> $dst failed")
        }
      }
    if (fs.exists(dir)) {
      walk(dir, relBase)
      fs.delete(dir, true) // only hidden markers remain
    }
  }

  /** Expire history: keep the latest `keepLast` manifests, delete older
    * manifest files, and delete every ARCHIVED file no retained manifest
    * references. Live files are never touched (the latest manifest —
    * always retained — references the live set). Returns the deleted
    * archive-relative paths, sorted.
    */
  def vacuum(spark: SparkSession, root: String, keepLast: Int = 1): Seq[String] = {
    require(keepLast >= 1, "must retain at least the latest manifest")
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val latest = latestVersion(spark, root)
    if (latest == 0L) return Nil
    val keepFrom = math.max(1L, latest - keepLast + 1L)
    val referenced: Set[String] =
      (keepFrom to latest).flatMap(v => files(spark, root, v)).toSet
    (1L until keepFrom).foreach(v => fs.delete(manifestPath(rootPath, v), false))
    val archiveRoot = new Path(rootPath, ArchiveDirName)
    if (!fs.exists(archiveRoot)) return Nil
    val archiveUri = archiveRoot.makeQualified(fs.getUri, fs.getWorkingDirectory).toUri
    def walk(d: Path): Seq[Path] =
      fs.listStatus(d).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath) else Seq(st.getPath)
      }
    val dead = walk(archiveRoot).filterNot { p =>
      referenced.contains(
        archiveUri.relativize(p.makeQualified(fs.getUri, fs.getWorkingDirectory).toUri).getPath)
    }
    dead.foreach(p => fs.delete(p, false))
    // prune now-empty archive subdirs (metadata-only tidy-up)
    def prune(d: Path): Unit = {
      fs.listStatus(d).foreach(st => if (st.isDirectory) prune(st.getPath))
      if (fs.listStatus(d).isEmpty) fs.delete(d, false)
    }
    prune(archiveRoot)
    dead
      .map(p => archiveUri.relativize(p.makeQualified(fs.getUri, fs.getWorkingDirectory).toUri).getPath)
      .sorted
  }
}
