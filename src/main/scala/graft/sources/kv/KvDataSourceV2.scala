package graft.sources.kv

import java.util

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector over the KV engine's cold tier: every persisted
  * collection (one parquet directory per collection under the engine root,
  * [[graft.kv.KvEngine]]) surfaces as rows of ONE logical table
  * `(collection, key, value)` — the relational view of the reference's
  * whole store (reference `internal/storage/cold.go:61-88` lists the same
  * directory to answer `ListCollections`).
  *
  * The Spark-native part is what the connector PUSHES DOWN:
  *  - `collection = 'x'` / `collection IN (…)` prune entire directories at
  *    planning time — the scan never opens a file of another collection
  *    (the moral equivalent of partition pruning on a `partitionBy` layout);
  *  - `key = 'k'` is taken into the reader and filtered during the parquet
  *    row walk, so a point probe ships only matching rows out of the scan;
  *  - column pruning drops unreferenced output columns (a keys-only listing
  *    never materializes values).
  *
  * Split granularity is one input partition per parquet FILE, so a
  * 1000-executor cluster reads a big collection in parallel; the constant
  * `collection` column costs nothing per row. Local-FS `Configuration` is
  * built reader-side; on a real cluster the hadoop conf would ride along
  * broadcast exactly as Spark's own parquet source does.
  */
class KvDataSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kv"

  /** option("collection", …) scopes the table to ONE collection and its
    * (key, value) view — writers name their target this way, and a scoped
    * READ sees only that collection's rows (the scan builder receives the
    * same option and prunes to its directory). Without the option the
    * table is the full (collection, key, value) store.
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.containsKey("collection")) KvDataSourceV2.WriteSchema else KvDataSourceV2.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val root = Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("graft-kv requires a path (the KV engine dataDir)"))
    new KvTable(root, schema)
  }
}

object KvDataSourceV2 {
  val Schema: StructType = StructType(
    Seq(
      StructField("collection", StringType, nullable = false),
      StructField("key", StringType, nullable = false),
      StructField("value", StringType)))

  /** Schema of one collection — what a writer provides. */
  val WriteSchema: StructType = StructType(
    Seq(StructField("key", StringType, nullable = false), StructField("value", StringType)))

  /** Same id law as the engine/reference (`cold.go:72`'s filename regex). */
  private[kv] val idRe = "^[a-zA-Z0-9]+$".r

  private[kv] def listCollections(root: String): Seq[String] = {
    val dir = new java.io.File(root)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && idRe.matches(f.getName))
      .map(_.getName)
      .sorted
      .toSeq
  }

  private[kv] def listParquetFiles(root: String, collection: String): Seq[String] = {
    val dir = new java.io.File(root, collection)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath)
      .sorted
      .toSeq
  }
}

class KvTable(root: String, presented: StructType = KvDataSourceV2.Schema)
    extends Table
    with SupportsRead
    with SupportsWrite {
  override def name(): String = s"graft-kv:$root"
  override def schema(): StructType = presented
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // A collection-scoped read (option("collection", …)) presents the
    // 2-column (key, value) schema, so the scope MUST also prune the scan
    // — otherwise the rows of every collection would merge with no
    // collection column left to tell them apart.
    val scoped = Option(options.get("collection")).map { c =>
      if (!KvDataSourceV2.idRe.matches(c))
        throw new IllegalArgumentException(s"invalid collection id: $c")
      c
    }
    new KvScanBuilder(root, presented, scoped)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new KvWriteBuilder(root, info)
}

class KvScanBuilder(
    root: String,
    presented: StructType = KvDataSourceV2.Schema,
    scoped: Option[String] = None)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var required: StructType = presented
  private val pushed = mutable.ArrayBuffer.empty[Filter]
  private var collections: Option[Set[String]] = scoped.map(Set(_)) // None = all
  private var keyEquals: Option[String] = None
  private var keyRange: KvKeyRange = KvKeyRange.all
  private var countByCollection: Option[Boolean] = None // Some(grouped?)
  private var limit: Option[Int] = None

  private def anyKeyPredicate: Boolean = keyEquals.isDefined || !keyRange.isAll

  /** COUNT(*) — optionally grouped by `collection` — answers from parquet
    * FOOTER metadata: row counts of a 100 TB store without opening a
    * single data page. Complete pushdown is sound because a collection
    * never spans input partitions in the aggregated plan (one partition
    * per collection → per-group results are final). Refused whenever a
    * key-equality was pushed (footer counts ignore row filters).
    */
  private def countPlan(agg: Aggregation): Option[Boolean] = {
    val countStarOnly = agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(_.isInstanceOf[CountStar])
    lazy val groups = agg.groupByExpressions
    if (!countStarOnly || anyKeyPredicate) None
    else if (groups.isEmpty) Some(false)
    else if (groups.forall {
        case f: NamedReference => f.fieldNames.sameElements(Array("collection"))
        case _ => false
      }) Some(true)
    else None
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    countPlan(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    countPlan(aggregation) match {
      case Some(grouped) => countByCollection = Some(grouped); true
      case None => false
    }
  }

  override def pushLimit(l: Int): Boolean = {
    limit = Some(l) // per-partition early stop; Spark still applies the global limit
    true
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = mutable.ArrayBuffer.empty[Filter]
    filters.foreach {
      case f @ EqualTo("collection", v: String) =>
        collections = Some(collections.fold(Set(v))(_ intersect Set(v))); pushed += f
      case f @ In("collection", vs) if vs.forall(_.isInstanceOf[String]) =>
        val s = vs.map(_.asInstanceOf[String]).toSet
        collections = Some(collections.fold(s)(_ intersect s)); pushed += f
      case f @ EqualTo("key", v: String) =>
        // several key-equality conjuncts can only match their intersection;
        // keep the first and let Spark re-check the rest as residuals
        if (keyEquals.isEmpty) { keyEquals = Some(v); pushed += f }
        else residual += f
      // range / prefix scans — the other half of a KV store's read
      // surface; bounds conjoin by tightening (lexicographic on the
      // alphanumeric id space, identical to Spark's own UTF8 ordering
      // there)
      case f @ GreaterThan("key", v: String) =>
        keyRange = keyRange.withLower(v, inclusive = false); pushed += f
      case f @ GreaterThanOrEqual("key", v: String) =>
        keyRange = keyRange.withLower(v, inclusive = true); pushed += f
      case f @ LessThan("key", v: String) =>
        keyRange = keyRange.withUpper(v, inclusive = false); pushed += f
      case f @ LessThanOrEqual("key", v: String) =>
        keyRange = keyRange.withUpper(v, inclusive = true); pushed += f
      case f @ StringStartsWith("key", p) =>
        keyRange = keyRange.withPrefix(p); pushed += f
      case f @ IsNotNull("collection" | "key") =>
        pushed += f // never null by construction
      case other =>
        residual += other
    }
    residual.toArray
  }

  override def pushedFilters(): Array[Filter] = pushed.toArray

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = countByCollection match {
    case Some(grouped) => new KvCountScan(root, collections, grouped)
    case None => new KvScan(root, required, collections, keyEquals, pushed.toArray, limit, keyRange)
  }
}

/** Conjoined key bounds (tightest lower/upper + optional prefix), applied
  * in the reader before any row leaves the scan. Bounds compare as plain
  * Java strings — identical to UTF8 binary order on the engine's
  * alphanumeric key space.
  */
case class KvKeyRange(
    lower: Option[(String, Boolean)], // (bound, inclusive)
    upper: Option[(String, Boolean)],
    prefix: Option[String]) {
  def isAll: Boolean = lower.isEmpty && upper.isEmpty && prefix.isEmpty
  def withLower(v: String, inclusive: Boolean): KvKeyRange = {
    val next = lower match {
      case Some((b, inc)) =>
        val c = v.compareTo(b)
        if (c > 0 || (c == 0 && !inclusive)) (v, inclusive) else (b, inc)
      case None => (v, inclusive)
    }
    copy(lower = Some(next))
  }
  def withUpper(v: String, inclusive: Boolean): KvKeyRange = {
    val next = upper match {
      case Some((b, inc)) =>
        val c = v.compareTo(b)
        if (c < 0 || (c == 0 && !inclusive)) (v, inclusive) else (b, inc)
      case None => (v, inclusive)
    }
    copy(upper = Some(next))
  }
  def withPrefix(p: String): KvKeyRange = {
    // two prefixes: the longer wins if nested, else the range is empty —
    // modeled by keeping both (contains applies each)
    val next = prefix match {
      case Some(q) =>
        if (p.startsWith(q)) p else if (q.startsWith(p)) q else p + " " + q // unsatisfiable
      case None => p
    }
    copy(prefix = Some(next))
  }
  def contains(key: String): Boolean = {
    if (key == null) return false
    lower.forall { case (b, inc) => val c = key.compareTo(b); c > 0 || (inc && c == 0) } &&
    upper.forall { case (b, inc) => val c = key.compareTo(b); c < 0 || (inc && c == 0) } &&
    prefix.forall(key.startsWith)
  }
}

object KvKeyRange {
  val all: KvKeyRange = KvKeyRange(None, None, None)
}

/** Aggregated scan: COUNT(*) [GROUP BY collection] from footer metadata.
  * Output rows are FINAL (complete pushdown): grouped → one partition per
  * collection emitting (collection, count); global → one partition summing
  * every footer.
  */
class KvCountScan(root: String, collections: Option[Set[String]], grouped: Boolean)
    extends Scan
    with Batch {

  override def readSchema(): StructType =
    if (grouped)
      StructType(Seq(StructField("collection", StringType, nullable = false), StructField("count", LongType, nullable = false)))
    else StructType(Seq(StructField("count", LongType, nullable = false)))

  override def toBatch: Batch = this

  override def description(): String =
    s"GraftKvCountScan root=$root grouped=$grouped PushedAggregates: [COUNT(*)]"

  override def planInputPartitions(): Array[InputPartition] = {
    val all = KvDataSourceV2.listCollections(root)
    val selected = collections.fold(all)(want => all.filter(want))
    if (grouped) selected.map(c => KvCountPartition(Seq(c)): InputPartition).toArray
    else Array(KvCountPartition(selected))
  }

  override def createReaderFactory(): PartitionReaderFactory = KvCountReaderFactory(root, grouped)
}

case class KvCountPartition(collections: Seq[String]) extends InputPartition

case class KvCountReaderFactory(root: String, grouped: Boolean) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KvCountPartition]
    new PartitionReader[InternalRow] {
      private val rows: Iterator[InternalRow] = {
        val conf = new Configuration()
        def countOf(c: String): Long =
          KvDataSourceV2.listParquetFiles(root, c).map { f =>
            val r = org.apache.parquet.hadoop.ParquetFileReader
              .open(org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(f), conf))
            try r.getRecordCount finally r.close()
          }.sum
        if (grouped)
          // A zero-row collection (zero parquet files, or only zero-row
          // files — both reachable by overwriting with an empty frame)
          // contributes no rows to the scan, and GROUP BY over the scan
          // emits NO group for it — so the complete pushdown must not.
          p.collections.iterator
            .map(c => (c, countOf(c)))
            .filter(_._2 > 0L)
            .map { case (c, n) =>
              new GenericInternalRow(Array[Any](UTF8String.fromString(c), n)): InternalRow
            }
        else Iterator(new GenericInternalRow(Array[Any](p.collections.map(countOf).sum)): InternalRow)
      }
      private var row: InternalRow = _
      override def next(): Boolean = { if (rows.hasNext) { row = rows.next(); true } else false }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

class KvScan(
    root: String,
    required: StructType,
    collections: Option[Set[String]],
    keyEquals: Option[String],
    pushed: Array[Filter],
    limit: Option[Int] = None,
    keyRange: KvKeyRange = KvKeyRange.all)
    extends Scan
    with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"GraftKvScan root=$root PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val all = KvDataSourceV2.listCollections(root)
    val selected = collections.fold(all)(want => all.filter(want)) // directory-level pruning
    selected.flatMap { c =>
      KvDataSourceV2.listParquetFiles(root, c).map(f => KvInputPartition(c, f): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    KvReaderFactory(required.fieldNames, keyEquals, limit, keyRange)
}

case class KvInputPartition(collection: String, file: String) extends InputPartition

case class KvReaderFactory(
    fields: Array[String],
    keyEquals: Option[String],
    limit: Option[Int],
    keyRange: KvKeyRange = KvKeyRange.all)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KvInputPartition]
    new KvPartitionReader(p.collection, p.file, fields, keyEquals, limit, keyRange)
  }
}

/** Row walk over one cold-tier parquet file through parquet-hadoop's Group
  * API (the file was written by Spark with schema (key STRING, value
  * STRING), [[graft.kv.KvEngine]]). The pushed key-equality is applied
  * here, before any row leaves the scan.
  */
class KvPartitionReader(
    collection: String,
    file: String,
    fields: Array[String],
    keyEquals: Option[String],
    limit: Option[Int] = None,
    keyRange: KvKeyRange = KvKeyRange.all)
    extends PartitionReader[InternalRow] {

  private val reader =
    ParquetReader.builder(new GroupReadSupport(), new Path(file)).withConf(new Configuration()).build()
  private var row: InternalRow = _
  private var emitted = 0

  override def next(): Boolean = {
    if (limit.exists(emitted >= _)) return false // pushed limit: stop the row walk early
    var g = reader.read()
    while (g != null) {
      val key = if (g.getFieldRepetitionCount("key") > 0) g.getString("key", 0) else null
      if (keyEquals.forall(_ == key) && (keyRange.isAll || keyRange.contains(key))) {
        val value = if (g.getFieldRepetitionCount("value") > 0) g.getString("value", 0) else null
        val vals: Array[Any] = fields.map {
          case "collection" => UTF8String.fromString(collection)
          case "key" => UTF8String.fromString(key)
          case "value" => if (value == null) null else UTF8String.fromString(value)
          case other => throw new IllegalStateException(s"unknown column $other")
        }
        row = new GenericInternalRow(vals)
        emitted += 1
        return true
      }
      g = reader.read()
    }
    false
  }

  override def get(): InternalRow = row

  override def close(): Unit = reader.close()
}
