package graft.sources.kv

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{StringType, StructType}

/** DataSource V2 WRITE path for the KV cold tier:
  * `df.write.format("graft-kv").option("path", root).option("collection", c)
  * .mode("append" | "overwrite").save()`.
  *
  * Spark's commit protocol does the heavy lifting: every task writes its
  * partition to a private temp file (`_tmp-<uuid>` under the collection
  * dir), the driver's `commit` renames the complete set into place (and
  * under `overwrite` clears the previous generation first), `abort` deletes
  * the temp generation. A reader never observes a half-written file — the
  * same all-or-nothing guarantee [[graft.kv.KvEngine]]'s flush gives, and
  * strictly better than the reference's truncate-then-write
  * (reference `internal/storage/cold.go:136-154`).
  *
  * One parquet part file per input partition — the write parallelism IS the
  * upstream partitioning, as with Spark's own file sinks.
  */
class KvWriteBuilder(root: String, info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val collection = Option(info.options.get("collection"))
      .getOrElse(throw new IllegalArgumentException("graft-kv write requires option(\"collection\", ...)"))
    require(
      KvDataSourceV2.idRe.matches(collection),
      s"collection id [$collection] must be alphanumeric (cold-tier id law)")
    val schema = info.schema()
    require(
      schema.fields.map(f => (f.name, f.dataType)).sameElements(Array(("key", StringType), ("value", StringType))),
      s"graft-kv write expects (key STRING, value STRING), got ${schema.simpleString}")
    new KvWrite(root, collection, doTruncate)
  }
}

class KvWrite(root: String, collection: String, truncate: Boolean) extends Write {
  override def toBatch: BatchWrite = new KvBatchWrite(root, collection, truncate)
}

case class KvCommitMessage(tempFile: String) extends WriterCommitMessage

class KvBatchWrite(root: String, collection: String, truncate: Boolean) extends BatchWrite {

  private val generation = UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    KvWriterFactory(root, collection, generation)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(root, collection)
    Files.createDirectories(dir)
    if (truncate) {
      val s = Files.list(dir)
      try s.iterator.asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(Files.delete)
      finally s.close()
    }
    messages.foreach { case KvCommitMessage(tmp) =>
      val src = Paths.get(tmp)
      // ".tmp" suffix while in flight: never matches the tier's "*.parquet"
      // globs (or a concurrent truncate) until the rename below commits it
      val dst = dir.resolve(
        src.getFileName.toString.stripPrefix(s"_tmp-$generation-").stripSuffix(".tmp") + ".parquet")
      Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case KvCommitMessage(tmp) => Files.deleteIfExists(Paths.get(tmp))
      case _ => ()
    }
}

case class KvWriterFactory(root: String, collection: String, generation: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(root, collection, generation, partitionId, taskId)
}

/** Task-side writer: one parquet file per partition, written under a
  * generation-unique temp name so concurrent/zombie attempts can never
  * collide; only the driver's commit makes it visible.
  */
class KvDataWriter(root: String, collection: String, generation: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val tmpPath = {
    Files.createDirectories(Paths.get(root, collection))
    Paths.get(root, collection, f"_tmp-$generation-part-$partitionId%05d-$taskId.tmp")
  }

  private val messageType = MessageTypeParser.parseMessageType(
    "message kv { required binary key (UTF8); optional binary value (UTF8); }")
  private val factory = new SimpleGroupFactory(messageType)
  private val conf = new Configuration()
  GroupWriteSupport.setSchema(messageType, conf)
  private val writer = ExampleParquetWriter
    .builder(new Path(tmpPath.toString))
    .withConf(conf)
    .build()

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(0), s"null key writing to collection [$collection]")
    val g = factory.newGroup()
    g.append("key", row.getUTF8String(0).toString)
    if (!row.isNullAt(1)) g.append("value", row.getUTF8String(1).toString)
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    KvCommitMessage(tmpPath.toString)
  }

  override def abort(): Unit = {
    writer.close()
    Files.deleteIfExists(tmpPath)
  }

  override def close(): Unit = ()
}
