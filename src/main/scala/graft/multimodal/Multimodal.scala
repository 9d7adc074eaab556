package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, and per-partition batched feature extraction.
  *
  * The decode step is a **STUB** (image/audio codecs are not in this
  * container): `decodeStub` derives deterministic pseudo-features from the
  * bytes. The Spark-side shape is the real design and is what matters at
  * 100 TB: binary + metadata travel columnar in parquet, extraction runs
  * `mapPartitions` (one JVM-side batch loop per partition — the Scala
  * analogue of `mapInPandas` batching), output is a typed Dataset with a
  * stable schema, and nothing ever collects to the driver.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features; `width`/`height` are what a real image decode
    * would yield — the stub synthesizes them deterministically.
    */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      checksum: Long,
      width: Long,
      height: Long)

  /** Wrap a text table as a media table (payload = utf8 bytes) — a stand-in
    * for real image/audio ingestion; keeps the pipeline end-to-end runnable.
    */
  def asMedia(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col("doc_id"),
      concat(lit("media/"), col("source")).as("media_type"),
      col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** STUB decode: a real implementation would decode the codec here
    * (e.g. JPEG → pixels). Deterministic fake so tests are stable.
    */
  private def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum = (sum + (payload(i) & 0xff)) % 1000003L; i += 1 }
    val width = 16L + (sum % 64L)        // fake dimensions derived from content
    val height = 16L + ((sum / 64L) % 64L)
    (sum, width, height)
  }

  /** Batched per-partition feature extraction. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (checksum, w, h) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, checksum, w, h)
      }
    }
  }

  /** A sampled "frame" from a media payload. A real video pipeline would
    * decode and emit every Nth frame; the stub slices the byte stream into
    * fixed-size chunks and keeps every Nth — the Spark-side shape (one
    * media row fans out to many frame rows, each with positional metadata)
    * is identical.
    */
  case class Frame(doc_id: Long, frame_idx: Long, frame_len: Long, frame_checksum: Long)

  /** Frame sampling: explode each payload into every `everyN`th chunk of
    * `chunkSize` bytes. Per-partition batched, no driver involvement; at
    * scale the output is written partitioned by media id range.
    */
  def sampleFrames(media: Dataset[MediaRow], chunkSize: Int, everyN: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val nChunks = (r.payload.length + chunkSize - 1) / chunkSize
        (0 until nChunks).iterator.filter(_ % everyN == 0).map { i =>
          val from = i * chunkSize
          val until = math.min(from + chunkSize, r.payload.length)
          var sum = 0L
          var j = from
          while (j < until) { sum = (sum + (r.payload(j) & 0xff)) % 1000003L; j += 1 }
          Frame(r.doc_id, i.toLong, (until - from).toLong, sum)
        }
      }
    }
  }

  /** Resize result: original + target dimensions and the checksum of the
    * downsampled payload.
    */
  case class Resized(
      doc_id: Long,
      media_type: String,
      width: Long,
      height: Long,
      new_w: Long,
      new_h: Long,
      resized_len: Long,
      resized_checksum: Long)

  /** STUB resize: a real pipeline would decode, bilinear-downscale by
    * `factor`, and re-encode; the stub has no pixel geometry (the payload
    * is an opaque byte stream), so it keeps every `factor²`-th byte of the
    * FLAT payload — the same 1/factor² data reduction a factor× downscale
    * gives, but NOT equivalent to per-block pooling of a row-major image
    * (a real decode replacing this stub must also replace the q70 oracle).
    * Per-partition batched like the other media ops — the binary column
    * never leaves the executors.
    */
  def resizeStub(media: Dataset[MediaRow], factor: Int = 2): Dataset[Resized] = {
    val spark = media.sparkSession
    import spark.implicits._
    val stride = factor * factor
    media.mapPartitions { rows =>
      rows.map { r =>
        val (_, w, h) = decodeStub(r.payload)
        var sum = 0L
        var cnt = 0L
        var i = 0
        while (i < r.payload.length) {
          sum = (sum + (r.payload(i) & 0xff)) % 1000003L
          cnt += 1
          i += stride
        }
        Resized(
          r.doc_id,
          r.media_type,
          w,
          h,
          math.max(1L, w / factor),
          math.max(1L, h / factor),
          cnt,
          sum)
      }
    }
  }

  /** End-to-end: documents → media → features (the registered query). */
  def featureQuery(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(asMedia(graft.core.Tables.documents(spark, dir)))
      .toDF()
      .orderBy(col("doc_id"))
}
