package graft.sources.snap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{
  BatchWrite,
  DataWriter,
  DataWriterFactory,
  LogicalWriteInfo,
  PhysicalWriteInfo,
  RowLevelOperation,
  RowLevelOperationBuilder,
  RowLevelOperationInfo,
  Write,
  WriteBuilder,
  WriterCommitMessage
}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.Snapshots

/** Group-based (copy-on-write) row-level operations for snapshot tables —
  * the machinery behind SQL `UPDATE cat.t SET …` and `MERGE INTO cat.t`
  * (and the rewrite fallback for un-pushable DELETEs):
  *
  *  1. Spark asks the table for a [[RowLevelOperation]] and builds BOTH its
  *     read and write side from the SAME instance — which is the whole
  *     coordination trick: the operation's scan records exactly the files
  *     it planned (after manifest-stats + bloom pruning of the operation's
  *     pushed condition), and its write later replaces exactly those files.
  *  2. The scan is the ordinary pruned snapshot scan: an UPDATE whose WHERE
  *     prunes to one day reads (and therefore rewrites) only that day's
  *     files — untouched files are never read or written, the same
  *     selective-rewrite economics the programmatic `updateWhere` has.
  *  3. Spark computes the full replacement row set (updated matches +
  *     untouched rows of the scanned files) and hands it back as
  *     InternalRows; [[SnapReplaceBatchWrite]] writes them as parquet in a
  *     staging dir via Spark's own `ParquetWriteSupport` (bridged — bytes
  *     identical to a DataFrame write), then commits under the table lock:
  *     land staged files, ARCHIVE the replaced ones (pinned manifests keep
  *     resolving; the op is time-travelable and restorable), commit the
  *     next manifest version inheriting the table's stats/bloom columns.
  *
  * Restriction: hive-partitioned tables are refused — replacement rows
  * carry partition values as DATA columns, which would corrupt a hive
  * layout; partitioned tables use `Sources.updateWhere` /
  * `mergeIntoPartitioned` (per-partition selective rewrites) instead.
  */
class SnapRowLevelBuilder(dir: String, view: Snapshots.ManifestView, tableSchema: StructType)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation = new SnapRowLevelOperation(dir, view, tableSchema, this)
  private[snap] var cmd: RowLevelOperation.Command = _
}

object SnapRowLevelBuilder {
  def apply(
      dir: String,
      view: Snapshots.ManifestView,
      tableSchema: StructType,
      info: RowLevelOperationInfo): SnapRowLevelBuilder = {
    // NO partitioned-table check here: Spark builds the operation for
    // EVERY delete/update/merge on the table, including deletes that the
    // metadata-only optimization later reclaims (DeleteFromTableWithFilters
    // never executes the rewrite). The refusal lives at write-build time —
    // the first point that proves the rewrite will actually run.
    val b = new SnapRowLevelBuilder(dir, view, tableSchema)
    b.cmd = info.command
    b
  }
}

class SnapRowLevelOperation(
    dir: String,
    view: Snapshots.ManifestView,
    tableSchema: StructType,
    parent: SnapRowLevelBuilder)
    extends RowLevelOperation {

  // set when Spark builds the operation's scan; the write replaces exactly
  // these files. Defaults to the whole pinned file list (an unprunable
  // condition rewrites the table — correct copy-on-write, just not cheap).
  @volatile private[snap] var scannedRels: Seq[String] = view.rels

  override def command(): RowLevelOperation.Command = parent.cmd

  override def description(): String = s"GraftSnapRowLevel ${command()} $dir"

  /** Declaring `_file` does double duty: the writer gets provenance, and —
    * decisive — it makes Spark plan the `DataAndMetadataWritingSparkTask`,
    * the only exec path that applies `ReplaceDataProjections` before the
    * connector's writer (the metadata-free task hands the writer the RAW
    * rewrite rows, `__row_operation` included).
    */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(SnapTable.FileMetaCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapScanBuilder(dir, view, tableSchema) {
      // the rewrite machinery documents (and SnapRowLevelScan relies on)
      // every pushed filter staying residual, so Spark re-applies the
      // operation's condition row-level — partition-exact consumption
      // must never strip that Filter here
      override protected def allowConsumption: Boolean = false
      override def build(): Scan = {
        super.build() match {
          case b: SnapBatchScan =>
            scannedRels = b.keptRels
            // the row-level read path plans a true DSv2 Batch (no V1
            // bridge exists under ReplaceData): same pruned file list,
            // read through Spark's own parquet row materializer
            new SnapRowLevelScan(dir, b.keptRels, b.readSchema())
          case v: SnapV2BatchScan =>
            // a session opted into the v2 batch path: same file list,
            // same row-level read shape
            scannedRels = v.currentRels
            new SnapRowLevelScan(dir, v.currentRels, v.readSchema())
          case s => s // count-style scans never appear under a row-level op
        }
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    override def build(): Write = {
      if (view.rels.exists(_.contains("=")))
        throw new UnsupportedOperationException(
          s"row-level ${command()} on a hive-partitioned snapshot table is not supported " +
            "through SQL — use graft.sources.Sources.updateWhere / mergeIntoPartitioned " +
            "(per-partition selective rewrites) instead")
      new Write {
        override def description(): String = s"GraftSnapReplaceData $dir files=${scannedRels.size}"
        override def toBatch: BatchWrite =
          new SnapReplaceBatchWrite(dir, scannedRels, info.schema(), view.version)
      }
    }
  }
}

/** The row-level operation's read side: the pruned file list as a true
  * DSv2 [[org.apache.spark.sql.connector.read.Batch]] — one input
  * partition per file, rows materialized by Spark's own parquet
  * `ReadSupport` (evolution-safe: missing columns null-fill). All pushed
  * filters stay residual (the scan builder never claims them), so Spark
  * re-applies the operation's condition row-level above this scan.
  */
class SnapRowLevelScan(dir: String, rels: Seq[String], required: StructType)
    extends Scan
    with org.apache.spark.sql.connector.read.Batch {

  override def readSchema(): StructType = required
  override def description(): String = s"GraftSnapRowLevelScan $dir files=${rels.size}"
  override def toBatch: org.apache.spark.sql.connector.read.Batch = this

  override def planInputPartitions(): Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val spark = SparkSession.active
    rels.map(rel => SnapFileInput(Snapshots.resolve(spark, dir, rel).toString): org.apache.spark.sql.connector.read.InputPartition).toArray
  }

  override def createReaderFactory(): org.apache.spark.sql.connector.read.PartitionReaderFactory =
    SnapParquetReadFactory(
      required.json,
      org.apache.spark.sql.graft.Bridge.serializableConf(
        org.apache.spark.sql.graft.Bridge.sessionHadoopConf(SparkSession.active)))
}

case class SnapFileInput(path: String) extends org.apache.spark.sql.connector.read.InputPartition

case class SnapParquetReadFactory(schemaJson: String, conf: java.io.Serializable)
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {

  override def createReader(p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val path = p.asInstanceOf[SnapFileInput].path
    val required =
      org.apache.spark.sql.types.DataType.fromJson(schemaJson).asInstanceOf[StructType]
    // `_file` is OURS to produce, not parquet's: read the data columns,
    // splice the partition's file path into the metadata slot per row
    val fileIdx = required.fieldNames.indexOf(SnapTable.FileMetaCol)
    val dataSchema =
      if (fileIdx < 0) required
      else StructType(required.fields.filterNot(_.name == SnapTable.FileMetaCol))
    val reader = org.apache.spark.sql.graft.Bridge.parquetRowReader(
      new Path(path),
      dataSchema,
      org.apache.spark.sql.graft.Bridge.confOf(conf))
    if (fileIdx < 0)
      new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean = { cur = reader.read(); cur != null }
        override def get(): InternalRow = cur
        override def close(): Unit = reader.close()
      }
    else {
      val fileVal = org.apache.spark.unsafe.types.UTF8String.fromString(path)
      val outIdx = required.fieldNames.zipWithIndex.collect {
        case (n, i) if n != SnapTable.FileMetaCol => i
      }
      val dataTypes = dataSchema.fields.map(_.dataType)
      new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean = { cur = reader.read(); cur != null }
        override def get(): InternalRow = {
          val out = new Array[Any](required.length)
          var i = 0
          while (i < dataTypes.length) {
            out(outIdx(i)) = if (cur.isNullAt(i)) null else cur.get(i, dataTypes(i))
            i += 1
          }
          out(fileIdx) = fileVal
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
        }
        override def close(): Unit = reader.close()
      }
    }
  }
}

/** Commit message: one staged file written by one task. */
case class SnapStagedFile(path: String, rows: Long) extends WriterCommitMessage

class SnapReplaceBatchWrite(
    dir: String,
    replacedRels: Seq[String],
    schema: StructType,
    scannedVersion: Long)
    extends BatchWrite {

  private def spark: SparkSession = SparkSession.active

  // staging lives INSIDE the table dir (same filesystem → rename is a
  // move) but dot-prefixed, invisible to listings and manifests
  private val stage = s".replace-${java.util.UUID.randomUUID().toString}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // the SESSION's hadoop conf (SQLConf entries included), so the staged
    // parquet honors the session timezone / parquet write settings exactly
    // like a DataFrame write would
    val conf = org.apache.spark.sql.graft.Bridge.sessionHadoopConf(spark)
    val fs = new Path(dir).getFileSystem(conf)
    fs.mkdirs(new Path(new Path(dir), stage))
    SnapParquetWriterFactory(
      s"$dir/$stage",
      schema,
      org.apache.spark.sql.graft.Bridge.serializableConf(conf))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rootPath = new Path(dir)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Snapshots.withTableLock(spark, dir) {
      // OPTIMISTIC CONCURRENCY: the rewrite read version `scannedVersion`;
      // if anything committed since (another UPDATE, a compaction, an
      // ingest), landing our replacement would duplicate or drop rows the
      // other commit moved — fail loudly instead, the caller retries. The
      // programmatic ops hold the lock across scan+rewrite+commit; the SQL
      // row-level path scans outside the lock, so it must validate here.
      val current = Snapshots.latestVersion(spark, dir)
      if (current != scannedVersion) {
        abort(messages)
        sys.error(
          s"concurrent update detected on $dir: row-level operation scanned manifest " +
            s"v$scannedVersion but the table is now at v$current — retry the statement")
      }
      // land the replacement files FIRST, then archive the replaced ones —
      // the compactInPlace window discipline; manifest readers are the
      // consistency surface and the closing commit defines the result
      messages.foreach {
        case SnapStagedFile(p, _) if p.nonEmpty =>
          val from = new Path(p)
          if (!fs.rename(from, new Path(rootPath, from.getName)))
            sys.error(s"replace-data landing failed: $from")
        case SnapStagedFile(_, _) => () // empty task: nothing staged
        case other => sys.error(s"unexpected commit message $other")
      }
      replacedRels.foreach { rel =>
        val live = new Path(rootPath, rel)
        if (fs.exists(live)) Snapshots.archiveFile(fs, rootPath, live)
      }
      fs.delete(new Path(rootPath, stage), true)
      Snapshots.commit(spark, dir) // inherits the table's stats + bloom discipline
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val rootPath = new Path(dir)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(rootPath, stage), true)
  }
}

case class SnapParquetWriterFactory(
    stageDir: String,
    schema: StructType,
    conf: java.io.Serializable)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SnapParquetDataWriter(
      new Path(
        stageDir,
        f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID().toString}.parquet"),
      schema,
      org.apache.spark.sql.graft.Bridge.confOf(conf))
}

/** One task's parquet writer: Spark's own row→parquet encoding (bridged
  * `ParquetWriteSupport`), snappy, one file per non-empty task. Empty
  * tasks commit nothing — no empty-file litter. When `finalName` is set
  * (streaming epochs), the attempt writes under its OWN path and renames
  * onto the deterministic name at task commit — the commit coordinator
  * authorizes exactly one attempt per partition, so the rename is
  * race-free while concurrent attempts never share bytes.
  */
class SnapParquetDataWriter(
    path: Path,
    schema: StructType,
    conf: org.apache.hadoop.conf.Configuration,
    finalName: Option[String] = None)
    extends DataWriter[InternalRow] {

  private var writer: org.apache.parquet.hadoop.ParquetWriter[InternalRow] = _
  private var rows = 0L

  /** Metadata-and-data form: `_file` provenance is read-side only — the
    * replacement file is new, so the metadata row is simply dropped.
    */
  override def write(metadata: InternalRow, record: InternalRow): Unit = write(record)

  override def write(record: InternalRow): Unit = {
    if (writer == null)
      writer = org.apache.spark.sql.graft.Bridge.parquetRowWriter(path, schema, conf)
    writer.write(record)
    rows += 1L
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    if (rows == 0L) SnapStagedFile("", 0L)
    else
      finalName match {
        case None => SnapStagedFile(path.toString, rows)
        case Some(n) =>
          val fs = path.getFileSystem(conf)
          val target = new Path(path.getParent, n)
          if (fs.exists(target)) fs.delete(target, false) // dead attempt's leftover
          if (!fs.rename(path, target))
            throw new java.io.IOException(s"task commit rename failed: $path -> $target")
          SnapStagedFile(target.toString, rows)
      }
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    path.getFileSystem(conf).delete(path, false)
  }

  override def close(): Unit = ()
}
