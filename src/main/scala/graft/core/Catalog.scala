package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface: register the fixture tables as temp views so the whole
  * engine is reachable through `spark.sql(...)` — the catalog role the
  * reference's collection listing played (reference
  * `internal/storage/engine.go:39-66`), but backed by Spark's session
  * catalog with real schemas.
  */
object Catalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Create (or replace) one temp view per fixture table over `dir`.
    * Returns the view names. `events` gets the nanos→micros conversion so
    * SQL users see a proper TIMESTAMP column.
    */
  def registerAll(spark: SparkSession, dir: String): Seq[String] = {
    tableNames.foreach { t =>
      val df: DataFrame =
        if (t == "events") Tables.events(spark, dir) else Tables.table(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
    tableNames
  }

  /** List the registered graft views — the `ListCollections` analogue.
    * Filtered to the graft table set: the session catalog may also hold
    * user views and managed tables that are not ours to report.
    */
  def listTables(spark: SparkSession): Seq[String] =
    spark.catalog
      .listTables()
      .collect()
      .map(_.name)
      .filter(tableNames.contains)
      .toSeq
      .sorted
}
