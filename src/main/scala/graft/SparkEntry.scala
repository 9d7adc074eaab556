package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Det, GraftSession, Tables}
import graft.queries.{EventQueries, Extended, Relational, Retrieval, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: every operator from SURVEY.md §2.2 surfaces here as a
  * named deterministic query; `oracleSql` carries the DuckDB twin for the
  * driver's hash-compare (column names are kept identical on both sides —
  * the compare sorts columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join + aggregation: orders ⋈ customer (shuffle on custkey),
    * nation broadcast.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    val d = "/root/testdata/sf0.001"
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(Det.r2(sum(col("o_totalprice"))).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++
      EventQueries.queries ++
      TextQueries.queries ++
      VectorQueries.queries ++
      Extended.queries ++
      Retrieval.queries ++
      Map(
        "q35_multimodal_features" -> ((s: SparkSession, d: String) =>
          graft.multimodal.Multimodal.featureQuery(s, d)),
        "q64_frame_sample" -> ((s: SparkSession, d: String) =>
          graft.multimodal.Multimodal
            .sampleFrames(
              graft.multimodal.Multimodal.asMedia(Tables.documents(s, d)),
              chunkSize = 64,
              everyN = 2)
            .toDF()
            .orderBy(col("doc_id"), col("frame_idx"))),
        "q70_resize_stub" -> ((s: SparkSession, d: String) =>
          graft.multimodal.Multimodal
            .resizeStub(graft.multimodal.Multimodal.asMedia(Tables.documents(s, d)), factor = 2)
            .toDF()
            .orderBy(col("doc_id"))))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for genuinely non-SQL ops
    * (q48 HLL estimate, q49 iterative k-means) → driver records rows-only.
    *
    * q35's stub decode is SQL-expressible because the fixture text is
    * ASCII (verified across all SFs): the byte sum equals the code-point
    * sum, and text length < the stub's modulus so no wraparound occurs.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventQueries.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ Extended.oracles ++ Retrieval.oracles ++
      Map(
        "q35_multimodal_features" ->
          """WITH b AS (
            |  SELECT doc_id, 'media/' || source AS media_type,
            |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
            |    CAST(coalesce(list_sum(list_transform(string_split(text, ''), c -> unicode(c))), 0) AS BIGINT) AS checksum
            |  FROM documents)
            |SELECT doc_id, media_type, byte_len, checksum,
            |  16 + (checksum % 64) AS width,
            |  16 + ((checksum // 64) % 64) AS height
            |FROM b ORDER BY doc_id""".stripMargin,
        // frame sampling: every 2nd 64-byte chunk; ASCII fixture text makes
        // substr-by-chars equal substr-by-bytes and code-point sum equal
        // byte sum (both < the stub modulus)
        "q64_frame_sample" ->
          """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
            |  CAST(length(ch) AS BIGINT) AS frame_len,
            |  CAST(coalesce(list_sum(list_transform(string_split(ch, ''), c -> unicode(c))), 0) AS BIGINT) AS frame_checksum
            |FROM (
            |  SELECT doc_id, i, substr(text, CAST(i * 64 + 1 AS INT), 64) AS ch
            |  FROM documents,
            |    LATERAL (SELECT unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS i) t
            |  WHERE i % 2 = 0) s
            |ORDER BY doc_id, frame_idx""".stripMargin,
        // resize stub: stride-4 byte sampling (2×2 pooling pick) — same
        // ASCII-fixture argument as q35/q64 makes it SQL-expressible
        "q70_resize_stub" ->
          """WITH b AS (
            |  SELECT doc_id, 'media/' || source AS media_type, text,
            |    CAST(length(text) AS BIGINT) AS len,
            |    CAST(coalesce(list_sum(list_transform(string_split(text, ''), c -> unicode(c))), 0) AS BIGINT) % 1000003 AS checksum
            |  FROM documents),
            |d AS (SELECT doc_id, media_type, text, len,
            |        16 + (checksum % 64) AS width,
            |        16 + ((checksum // 64) % 64) AS height
            |      FROM b)
            |SELECT doc_id, media_type,
            |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
            |  CAST(greatest(1, width // 2) AS BIGINT) AS new_w,
            |  CAST(greatest(1, height // 2) AS BIGINT) AS new_h,
            |  CAST(len(range(1, CAST(len + 1 AS BIGINT), 4)) AS BIGINT) AS resized_len,
            |  CAST(coalesce(list_sum(list_transform(range(1, CAST(len + 1 AS BIGINT), 4), i -> unicode(text[i]))), 0) AS BIGINT) % 1000003 AS resized_checksum
            |FROM d ORDER BY doc_id""".stripMargin)
}
