package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Det, GraftSession, Tables}
import graft.queries.{Advanced, Analytics, Corpus, EventQueries, Extended, Frontier, Frontier2, Frontier3, Pipeline, Relational, Retrieval, TextQueries, VectorQueries}

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
      Corpus.queries ++
      Analytics.queries ++
      Pipeline.queries ++
      Advanced.queries ++
      Frontier.queries ++
      Frontier2.queries ++
      Frontier3.queries ++
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
        "q70_resize_bmp" -> ((s: SparkSession, d: String) =>
          graft.multimodal.Multimodal.resizeQuery(s, d)),
        "q73_wav_features" -> ((s: SparkSession, d: String) =>
          graft.multimodal.Multimodal.wavFeatureQuery(s, d)),
        "q74_ppm_features" -> ((s: SparkSession, d: String) =>
          graft.multimodal.Multimodal.ppmFeatureQuery(s, d)),
        "q132_image_ahash_dedup" -> ((s: SparkSession, d: String) =>
          graft.multimodal.Multimodal.imageDedupQuery(s, d)),
        "q185_png_roundtrip" -> ((s: SparkSession, d: String) =>
          graft.multimodal.Multimodal.pngFeatureQuery(s, d)),
        "q191_jpeg_roundtrip" -> ((s: SparkSession, d: String) =>
          graft.multimodal.Multimodal.jpegFeatureQuery(s, d)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for genuinely non-SQL ops
    * (q48 HLL estimate, q49 iterative k-means training) → driver records
    * rows-only.
    *
    * The media queries (q35/q64/q70/q73/q74) are SQL-expressible because
    * the media bytes are synthesized closed-form from `documents` (the
    * fixture text is ASCII at every SF, so byte == code point): the engine
    * runs a real container encode→decode roundtrip, and the oracle
    * recomputes the decoded features directly from the closed forms.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventQueries.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ Extended.oracles ++ Retrieval.oracles ++
      Corpus.oracles ++ Analytics.oracles ++ Pipeline.oracles ++
      Advanced.oracles ++ Frontier.oracles ++ Frontier2.oracles ++
      Frontier3.oracles ++
      Map(
        // q35: REAL BMP decode. The media bytes are a 24-bit BMP encoded
        // from closed-form dimensions (w = 8 + doc_id % 24,
        // h = 8 + n_chars % 16) and pixels cycled from the doc's text
        // bytes; the engine decodes the container (header, padding,
        // bottom-up rows), and the oracle recomputes the same features
        // from the closed forms. byte_len = 54-byte headers + padded rows.
        "q35_multimodal_features" ->
          """WITH b AS (
            |  SELECT doc_id, 8 + (doc_id % 24) AS w, 8 + (n_chars % 16) AS h,
            |         text, length(text) AS len
            |  FROM documents)
            |SELECT doc_id, 'image/bmp' AS media_type,
            |  CAST(54 + (((3 * w + 3) // 4) * 4) * h AS BIGINT) AS byte_len,
            |  CAST(list_sum(list_transform(range(0, 3 * w * h),
            |       i -> unicode(text[CAST(i % len AS INT) + 1]))) AS BIGINT) AS checksum,
            |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height
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
        // q70: REAL resize — decode BMP, 2×2 top-left-pick downsample on
        // pixel geometry, re-encode, decode again. Resized pixel (r, c)
        // = original (2r, 2c); flat resized index i maps to original text
        // byte ((i÷(nw·3))·2·w + ((i mod nw·3)÷3)·2)·3 + (i mod 3), mod len.
        // resized_len is the re-encoded BMP's size (54 + padded rows).
        "q70_resize_bmp" ->
          """WITH b AS (
            |  SELECT doc_id, 8 + (doc_id % 24) AS w, 8 + (n_chars % 16) AS h,
            |         text, length(text) AS len
            |  FROM documents),
            |d AS (SELECT doc_id, w, h, greatest(1, w // 2) AS nw, greatest(1, h // 2) AS nh,
            |             text, len
            |      FROM b)
            |SELECT doc_id, 'image/bmp' AS media_type,
            |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
            |  CAST(nw AS BIGINT) AS new_w, CAST(nh AS BIGINT) AS new_h,
            |  CAST(54 + (((3 * nw + 3) // 4) * 4) * nh AS BIGINT) AS resized_len,
            |  CAST(list_sum(list_transform(range(0, nw * nh * 3),
            |    i -> unicode(text[CAST((((i // (nw * 3)) * 2 * w + ((i % (nw * 3)) // 3) * 2) * 3
            |                            + (i % 3)) % len AS INT) + 1]))) AS BIGINT) AS resized_checksum
            |FROM d ORDER BY doc_id""".stripMargin,
        // q73: REAL WAV decode (RIFF chunk walk, PCM16 mono). Sample i is
        // (text byte − 96)·256; rate = 8/12/16 kHz by doc_id mod 3.
        "q73_wav_features" ->
          """WITH b AS (
            |  SELECT doc_id, 8000 + 4000 * (doc_id % 3) AS rate,
            |         length(text) AS n, text
            |  FROM documents)
            |SELECT doc_id, 'audio/wav' AS media_type,
            |  CAST(44 + 2 * n AS BIGINT) AS byte_len,
            |  CAST(rate AS BIGINT) AS sample_rate,
            |  CAST(n AS BIGINT) AS n_samples,
            |  CAST((n * 1000) // rate AS BIGINT) AS duration_ms,
            |  CAST(list_max(list_transform(range(1, n + 1),
            |       i -> abs((unicode(text[i]) - 96) * 256))) AS BIGINT) AS peak,
            |  CAST(list_sum(list_transform(range(1, n + 1),
            |       i -> abs((unicode(text[i]) - 96) * 256))) AS BIGINT) AS loudness
            |FROM b ORDER BY doc_id""".stripMargin,
        // q74: REAL PPM (P6) decode — text header parse + raw RGB payload.
        // byte_len = "P6\n" + "<w> <h>\n" + "255\n" + 3·w·h.
        "q74_ppm_features" ->
          """WITH b AS (
            |  SELECT doc_id, 4 + (n_chars % 13) AS w, 4 + (doc_id % 11) AS h,
            |         text, length(text) AS len
            |  FROM documents)
            |SELECT doc_id, 'image/ppm' AS media_type,
            |  CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
            |       + 3 * w * h AS BIGINT) AS byte_len,
            |  CAST(list_sum(list_transform(range(0, 3 * w * h),
            |       i -> unicode(text[CAST(i % len AS INT) + 1]))) AS BIGINT) AS checksum,
            |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height
            |FROM b ORDER BY doc_id""".stripMargin,
        // q132: aHash over the DECODED BMP — the oracle replays the 8×8
        // top-left-pick grid on the closed-form raster (pixel (x,y,k) is
        // text byte ((y·w+x)·3+k) mod len) and the all-integer 64·cell >
        // total threshold; the hash ships as two 32-bit halves (a set bit
        // 63 would be a negative BIGINT vs an overflowing HUGEINT cast).
        "q132_image_ahash_dedup" ->
          """WITH b AS (
            |  SELECT doc_id, 8 + (doc_id % 24) AS w, 8 + (n_chars % 16) AS h,
            |         text, length(text) AS len
            |  FROM documents),
            |c AS (
            |  SELECT doc_id, ci,
            |    list_sum(list_transform(range(0, 3), k ->
            |      unicode(text[CAST(((((ci // 8) * h // 8) * w + ((ci % 8) * w // 8)) * 3 + k) % len AS INT) + 1]))) AS cs
            |  FROM b, LATERAL (SELECT unnest(range(0, 64)) AS ci) t),
            |g AS (SELECT doc_id, ci, cs, sum(cs) OVER (PARTITION BY doc_id) AS total FROM c),
            |hh AS (
            |  SELECT doc_id,
            |    CAST(sum(CASE WHEN ci < 32 AND 64 * cs > total THEN (CAST(1 AS BIGINT) << CAST(ci AS INT)) ELSE 0 END) AS BIGINT) AS ahash_lo,
            |    CAST(sum(CASE WHEN ci >= 32 AND 64 * cs > total THEN (CAST(1 AS BIGINT) << CAST(ci - 32 AS INT)) ELSE 0 END) AS BIGINT) AS ahash_hi
            |  FROM g GROUP BY doc_id),
            |gs AS (SELECT ahash_lo, ahash_hi, count(*) AS group_size FROM hh GROUP BY 1, 2)
            |SELECT h2.doc_id, h2.ahash_lo, h2.ahash_hi, gs.group_size
            |FROM hh h2 JOIN gs USING (ahash_lo, ahash_hi)
            |ORDER BY doc_id""".stripMargin,
        // q185: REAL PNG roundtrip — deflate-compressed truecolor PNG with
        // per-row filter cycling (None/Sub/Up/Average/Paeth), decoded via
        // CRC-checked chunk walk + inflate + unfilter. byte_len is NOT
        // reported (a DEFLATE stream's length is not closed-form); the
        // decode-derived columns must survive the compressed roundtrip.
        // q191: REAL baseline JPEG roundtrip — flat 16x16 MCUs synthesized
        // in the YCbCr domain, so the LOSSY quantize→dequantize→IDCT→
        // YCbCr→RGB chain is exact integer/dyadic arithmetic the oracle
        // replays: DC quant (q0: lum 16 ⇒ /2, chr 17), dequant·(1/8), the
        // JFIF color matrix with floor(x+0.5) and clamp. Every arithmetic
        // step below mirrors the decoder's expression order exactly.
        "q191_jpeg_roundtrip" ->
          """WITH b AS (
            |  SELECT doc_id, 16 * (1 + doc_id % 3) AS w, 16 * (1 + n_chars % 2) AS h,
            |         text, length(text) AS len
            |  FROM documents),
            |v AS (
            |  SELECT doc_id, w, h,
            |    unicode(text[CAST(mi % len AS INT) + 1]) AS yv,
            |    unicode(text[CAST((mi + 7) % len AS INT) + 1]) AS cbv,
            |    unicode(text[CAST((mi + 13) % len AS INT) + 1]) AS crv
            |  FROM b, LATERAL (SELECT unnest(range(0, (w // 16) * (h // 16))) AS mi) t),
            |d AS (
            |  SELECT doc_id, w, h,
            |    least(255, greatest(0, 2 * CAST(floor((yv - 128) / 2.0 + 0.5) AS BIGINT) + 128)) AS yd,
            |    least(255.0, greatest(0.0, floor(17 * floor(8 * (cbv - 128) / 17.0 + 0.5) / 8 + 128.5))) AS cbd,
            |    least(255.0, greatest(0.0, floor(17 * floor(8 * (crv - 128) / 17.0 + 0.5) / 8 + 128.5))) AS crd
            |  FROM v),
            |rgb AS (
            |  SELECT doc_id, w, h,
            |    least(255, greatest(0, CAST(floor(yd + 1.402 * (crd - 128) + 0.5) AS BIGINT))) AS r,
            |    least(255, greatest(0, CAST(floor(yd - 0.344136 * (cbd - 128) - 0.714136 * (crd - 128) + 0.5) AS BIGINT))) AS g,
            |    least(255, greatest(0, CAST(floor(yd + 1.772 * (cbd - 128) + 0.5) AS BIGINT))) AS bb
            |  FROM d)
            |SELECT doc_id, 'image/jpeg' AS media_type,
            |  CAST(256 * sum(r + g + bb) AS BIGINT) AS checksum,
            |  CAST(max(w) AS BIGINT) AS width, CAST(max(h) AS BIGINT) AS height
            |FROM rgb GROUP BY doc_id ORDER BY doc_id""".stripMargin,
        "q185_png_roundtrip" ->
          """WITH b AS (
            |  SELECT doc_id, 8 + (doc_id % 17) AS w, 8 + (n_chars % 13) AS h,
            |         text, length(text) AS len
            |  FROM documents)
            |SELECT doc_id, 'image/png' AS media_type,
            |  CAST(list_sum(list_transform(range(0, 3 * w * h),
            |       i -> unicode(text[CAST(i % len AS INT) + 1]))) AS BIGINT) AS checksum,
            |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height
            |FROM b ORDER BY doc_id""".stripMargin)
}
