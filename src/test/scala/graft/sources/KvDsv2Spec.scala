package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.kv.KvEngine

/** The DataSource V2 cold-tier connector: one logical (collection, key,
  * value) table over the engine's parquet directories, with directory-level
  * collection pruning, in-reader key pushdown, and column pruning.
  */
class KvDsv2Spec extends SparkSpec {

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graftkv-dsv2").toString
    val eng = new KvEngine(spark, dir, autoCreate = true)
    eng.writeKey("metrics", "cpu", "0.97")
    eng.writeKey("metrics", "mem", "0.41")
    eng.writeKey("logs", "boot", "ok")
    eng.flushAllCollections()
    dir
  }

  private def table = spark.read.format("graft-kv").load(root)

  test("reads every flushed collection as one (collection, key, value) table") {
    val rows = table.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(("metrics", "cpu", "0.97"), ("metrics", "mem", "0.41"), ("logs", "boot", "ok")))
  }

  test("collection equality prunes directories and key equality pushes into the reader") {
    val q = table.filter("collection = 'metrics' AND key = 'cpu'")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(collection,metrics)"), plan)
    assert(plan.contains("EqualTo(key,cpu)"), plan)
    assert(q.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("metrics", "cpu", "0.97")))
    // directory-level pruning is structural: the scan plans no partition
    // for the unselected collection's files
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val parts = scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputPartitions
    assert(parts.nonEmpty && parts.forall {
      case graft.sources.kv.KvInputPartition(c, _) => c == "metrics"
      case other => fail(s"unexpected partition $other")
    })
  }

  test("column pruning reaches the scan (keys-only listing reads no values)") {
    val q = table.select("key").orderBy("key")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<key:string>"), plan)
    assert(q.collect().map(_.getString(0)).toSeq == Seq("boot", "cpu", "mem"))
  }

  test("IN-list on collection prunes to the named subset") {
    val q = table.filter("collection IN ('logs', 'nosuch')")
    val rows = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("logs", "boot")))
  }

  test("COUNT(*) GROUP BY collection answers from parquet footers (complete aggregate pushdown)") {
    val q = table.groupBy("collection").count().orderBy("collection")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftKvStatsScan"), plan)
    // complete pushdown: no aggregate exec survives above the scan
    assert(!plan.contains("HashAggregate"), plan)
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("logs", 1L), ("metrics", 2L)))
  }

  test("global COUNT(*) pushes down and matches") {
    val q = table.groupBy().count()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftKvStatsScan"), plan)
    assert(q.collect().head.getLong(0) == 3L)
  }

  test("aggregate pushdown is refused when a key filter is present (footer counts ignore filters)") {
    val q = table.filter("key = 'cpu'").groupBy("collection").count()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftKvStatsScan"), plan)
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("metrics", 1L)))
  }

  test("limit pushes into the reader and still returns correct rows") {
    val q = table.limit(2)
    assert(q.collect().length == 2)
  }

  test("DSv2 write: append lands through the commit protocol and reads back everywhere") {
    import spark.implicits._
    val wroot = Files.createTempDirectory("graftkv-write").toString
    Seq(("a", "1"), ("b", "2")).toDF("key", "value")
      .write.format("graft-kv").option("path", wroot).option("collection", "w1").mode("append").save()
    Seq(("c", "3")).toDF("key", "value")
      .write.format("graft-kv").option("path", wroot).option("collection", "w1").mode("append").save()
    // readable through the DSv2 scan ...
    val viaScan = spark.read.format("graft-kv").load(wroot)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(viaScan == Set("a" -> "1", "b" -> "2", "c" -> "3"))
    // ... and through the engine (same cold-tier layout)
    val eng = new KvEngine(spark, wroot, autoCreate = false)
    assert(eng.readKey("w1", "b") == "2")
    // no temp-generation files survive commit
    val leftovers = new java.io.File(wroot, "w1").listFiles.filter(_.getName.startsWith("_tmp-"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("DSv2 write: overwrite truncates the previous generation atomically") {
    import spark.implicits._
    val wroot = Files.createTempDirectory("graftkv-ow").toString
    Seq(("old", "x")).toDF("key", "value")
      .write.format("graft-kv").option("path", wroot).option("collection", "w2").mode("append").save()
    Seq(("new", "y")).toDF("key", "value")
      .write.format("graft-kv").option("path", wroot).option("collection", "w2").mode("overwrite").save()
    val rows = spark.read.format("graft-kv").load(wroot)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(rows == Set("new" -> "y"))
  }

  test("DSv2 write: wrong schema and invalid collection ids fail loudly") {
    import spark.implicits._
    val wroot = Files.createTempDirectory("graftkv-bad").toString
    // Spark's own table-schema validation fires first (the table presents
    // (key, value) for a collection write) — either layer failing loudly
    // is the contract
    val bad1 = intercept[Exception] {
      Seq(("a", 1)).toDF("key", "n")
        .write.format("graft-kv").option("path", wroot).option("collection", "ok").mode("append").save()
    }
    assert(bad1.getMessage != null && bad1.getMessage.nonEmpty)
    val bad2 = intercept[Exception] {
      Seq(("a", "1")).toDF("key", "value")
        .write.format("graft-kv").option("path", wroot).option("collection", "not/ok").mode("append").save()
    }
    assert(bad2.getMessage.contains("alphanumeric") || bad2.getCause != null)
  }

  test("key range and prefix push into the reader (the KV range-scan surface)") {
    // range: lexicographic bounds on the key
    val q1 = table.filter("key >= 'boot' AND key < 'mem'")
    val p1 = q1.queryExecution.executedPlan.toString
    assert(p1.contains("GreaterThanOrEqual(key,boot)") && p1.contains("LessThan(key,mem)"), p1)
    assert(q1.collect().map(_.getString(1)).toSet == Set("boot", "cpu"))
    // prefix: LIKE 'c%' pushes as StringStartsWith
    val q2 = table.filter("key LIKE 'c%'")
    val p2 = q2.queryExecution.executedPlan.toString
    assert(p2.contains("StringStartsWith(key,c)"), p2)
    assert(q2.collect().map(_.getString(1)).toSeq == Seq("cpu"))
    // conjoined bounds tighten; contradictory bounds return nothing
    assert(table.filter("key > 'boot' AND key > 'cpu' AND key <= 'mem'")
      .collect().map(_.getString(1)).toSet == Set("mem"))
    assert(table.filter("key > 'z'").collect().isEmpty)
  }

  test("range scan and MIN/MAX order supplementary-plane keys like Spark (UTF-8 binary, not UTF-16)") {
    import org.apache.spark.sql.functions.{max, min}
    // U+1F600 (😀, a surrogate pair 😀) vs U+FF21 (fullwidth A):
    // UTF-16 code-unit order puts the surrogate FIRST, UTF-8 binary order
    // puts it LAST — exactly the divergence between String.compareTo and
    // Spark's UTF8String compare. The pushed range filters are reported
    // fully handled (no residual re-check), so the reader's order must be
    // Spark's.
    val emoji = "😀"
    val fwA = "Ａ"
    val wroot = Files.createTempDirectory("graftkv-unicode").toString
    val eng = new KvEngine(spark, wroot, autoCreate = true)
    eng.writeKey("u", "ascii", "1")
    eng.writeKey("u", fwA, "2")
    eng.writeKey("u", emoji, "3")
    eng.flushAllCollections()
    val t = spark.read.format("graft-kv").load(wroot)
    // key > fullwidth-A must include the emoji (codepoint above) and it
    // alone; under UTF-16 compare the reader would return nothing
    assert(t.filter(t("key") > fwA).collect().map(_.getString(1)).toSeq == Seq(emoji))
    assert(t.filter(t("key") < fwA).collect().map(_.getString(1)).toSeq == Seq("ascii"))
    // MIN/MAX footer pushdown must agree with Spark's own agg semantics
    val q = t.agg(min("key"), max("key"))
    assert(q.queryExecution.executedPlan.toString.contains("GraftKvStatsScan"))
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("ascii", emoji)))
  }

  test("aggregate pushdown is refused when a key RANGE is present (footer counts ignore filters)") {
    val q = table.filter("key >= 'c'").groupBy("collection").count()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftKvStatsScan"), plan)
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet == Set(("metrics", 2L)))
  }

  test("collection-scoped read returns only that collection's rows with the (key, value) schema") {
    val q = spark.read.format("graft-kv").option("collection", "metrics").load(root)
    assert(q.schema.fieldNames.toSeq == Seq("key", "value"))
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set("cpu" -> "0.97", "mem" -> "0.41"))
    // the scope is a scan-time prune: no partition of another collection is planned
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val parts = scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputPartitions
    assert(parts.nonEmpty && parts.forall {
      case graft.sources.kv.KvInputPartition(c, _) => c == "metrics"
      case other => fail(s"unexpected partition $other")
    })
  }

  test("collection-scoped read with an invalid id fails loudly") {
    val err = intercept[Exception] {
      spark.read.format("graft-kv").option("collection", "not/ok").load(root).collect()
    }
    assert(err.getMessage != null)
  }

  test("grouped COUNT(*) emits no row for a zero-file collection (empty-overwrite truncation)") {
    import spark.implicits._
    val wroot = Files.createTempDirectory("graftkv-zero").toString
    Seq(("a", "1")).toDF("key", "value")
      .write.format("graft-kv").option("path", wroot).option("collection", "keep").mode("append").save()
    Seq(("b", "2")).toDF("key", "value")
      .write.format("graft-kv").option("path", wroot).option("collection", "gone").mode("append").save()
    // truncate `gone` to a zero-file directory via an empty overwrite
    spark.emptyDataset[(String, String)].toDF("key", "value")
      .write.format("graft-kv").option("path", wroot).option("collection", "gone").mode("overwrite").save()
    val t = spark.read.format("graft-kv").load(wroot)
    val counted = t.groupBy("collection").count()
    assert(counted.queryExecution.executedPlan.toString.contains("GraftKvStatsScan"))
    // GROUP BY over the scan emits no group for a zero-row collection — so must the pushdown
    assert(counted.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("keep", 1L)))
    assert(t.groupBy().count().collect().head.getLong(0) == 1L)
  }

  test("MIN/MAX(key) GROUP BY collection answers from footer statistics (complete pushdown)") {
    import org.apache.spark.sql.functions.{count, max, min}
    val q = table
      .groupBy("collection")
      .agg(min("key").as("kmin"), max("key").as("kmax"), count("*").as("n"))
      .orderBy("collection")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftKvStatsScan"), plan)
    assert(plan.contains("MIN(key)") && plan.contains("MAX(key)") && plan.contains("COUNT(*)"), plan)
    // complete pushdown: no aggregate exec above the scan
    assert(!plan.contains("HashAggregate"), plan)
    assert(q.collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq ==
      Seq(("logs", "boot", "boot", 1L), ("metrics", "cpu", "mem", 2L)))
  }

  test("global MIN/MAX(key) pushes down and matches") {
    import org.apache.spark.sql.functions.{max, min}
    val q = table.agg(min("key"), max("key"))
    assert(q.queryExecution.executedPlan.toString.contains("GraftKvStatsScan"))
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("boot", "mem")))
  }

  test("MIN/MAX pushdown refused under a key predicate (stats ignore row filters)") {
    import org.apache.spark.sql.functions.min
    val q = table.filter("key >= 'c'").agg(min("key"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftKvStatsScan"), plan)
    assert(q.collect().head.getString(0) == "cpu") // correct via the row path
  }

  test("MIN/MAX over an empty store yields one all-NULL global row") {
    import org.apache.spark.sql.functions.{count, max, min}
    val empty = Files.createTempDirectory("graftkv-mm-empty").toString
    val q = spark.read.format("graft-kv").load(empty).agg(min("key"), max("key"), count("*"))
    val r = q.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getLong(2) == 0L)
  }

  test("SQLMetrics: point probe reports files planned, collections pruned, rows scanned/emitted") {
    val q = table.filter("collection = 'metrics' AND key = 'cpu'")
    assert(q.collect().length == 1) // execute THIS plan (metrics are per-execution)
    val scan = q.queryExecution.executedPlan
      .collectLeaves()
      .collectFirst { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      .get
    def m(name: String): Long = scan.metrics(name).value
    assert(m(graft.sources.kv.KvMetrics.CollectionsPruned) == 1L, "logs dir must be pruned")
    assert(m(graft.sources.kv.KvMetrics.FilesPlanned) >= 1L)
    assert(m(graft.sources.kv.KvMetrics.RowsScanned) == 2L, "walks only the metrics files")
    assert(m(graft.sources.kv.KvMetrics.RowsEmitted) == 1L, "only the probed key leaves the scan")
  }

  test("SQLMetrics: footer-only aggregate reports files answered without reading rows") {
    val q = table.groupBy("collection").count()
    assert(q.collect().length == 2)
    val scan = q.queryExecution.executedPlan
      .collectLeaves()
      .collectFirst { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      .get
    assert(scan.metrics(graft.sources.kv.KvMetrics.FooterOnlyFiles).value >= 2L)
  }

  test("robustness: empty root reads as empty, missing path option fails loudly") {
    val empty = Files.createTempDirectory("graftkv-empty").toString
    assert(spark.read.format("graft-kv").load(empty).collect().isEmpty)
    val err = intercept[Exception] {
      spark.read.format("graft-kv").options(Map.empty[String, String]).load().collect()
    }
    assert(err.getMessage != null)
    // a stray non-collection directory (bad id chars) is never scanned
    Files.createDirectory(java.nio.file.Paths.get(empty, "not-a-collection!"))
    assert(spark.read.format("graft-kv").load(empty).collect().isEmpty)
  }
}
