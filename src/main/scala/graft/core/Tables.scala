package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row models for the driver fixtures (TPC-H-ish star schema plus an
  * `events` stream table and LLM-pipeline tables). The reference's entire
  * data model is `type Collection map[string]string`
  * (reference `internal/storage/types.go:3`); [[KV]] is its direct
  * structural equivalent, the rest realize the reference's *time-series
  * intent* (reference `README.md:3`) with real types.
  */
case class KV(key: String, value: String)

case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

/** Fixture loaders. All loads are lazy parquet scans — predicate pushdown
  * and column pruning reach the scan because nothing here forces
  * materialization.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS); Spark reads it as long nanos
    * (legacy.parquet.nanosAsLong) and we truncate to micros — identical to
    * DuckDB's nanos→micros truncation, so oracle timestamps match exactly.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
}
