package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, and per-partition batched feature extraction.
  *
  * Decode is REAL: [[MediaCodec]] implements BMP (24-bit), PPM (P6) and
  * WAV (PCM16 mono) containers in pure JVM code — header parse, row
  * padding, bottom-up row order, RIFF chunk walk — so `width`/`height`/
  * `sample_rate` come out of actual container bytes, not a synthesized
  * hash. The container has no image/audio fixture files, so the media
  * BYTES are generated deterministically from the `documents` fixture
  * (dimensions from doc_id/n_chars, pixels/samples from the text bytes):
  * an encode→decode roundtrip through the real format, which a DuckDB
  * oracle can still check end-to-end because the synthesis is closed-form.
  *
  * Scale shape (what matters at 100 TB): binary + metadata travel columnar
  * in parquet, extraction runs `mapPartitions` (one JVM-side batch loop per
  * partition — the Scala analogue of `mapInPandas` batching), output is a
  * typed Dataset with a stable schema, and payload bytes never reach the
  * driver.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted image features: decoded dimensions + pixel checksum. */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      checksum: Long,
      width: Long,
      height: Long)

  /** Extracted audio features from a decoded PCM clip. */
  case class AudioFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      sample_rate: Long,
      n_samples: Long,
      duration_ms: Long,
      peak: Long,
      loudness: Long)

  /** Wrap a text table as a media table (payload = utf8 bytes) — the
    * "opaque byte stream" shape used by frame sampling (q64).
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

  /** Bridge from a `binaryFile`-source frame ([[graft.sources.Sources.readBinaryFiles]])
    * into the decode pipeline: doc_id parsed from the file's base name,
    * media_type from its extension. Media corpora that arrive as raw
    * files on object storage enter through here and flow into the same
    * [[imageFeatures]]/[[audioFeatures]]/[[resizeMedia]] operators as
    * parquet-resident binary columns — the payload stays on executors
    * either way.
    */
  def fromBinaryFiles(files: DataFrame): Dataset[MediaRow] = {
    val spark = files.sparkSession
    import spark.implicits._
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    val mediaType = when(ext === "bmp", lit("image/bmp"))
      .when(ext === "ppm", lit("image/ppm"))
      .when(ext === "png", lit("image/png"))
      .when(ext === "jpg" || ext === "jpeg", lit("image/jpeg"))
      .when(ext === "wav", lit("audio/wav"))
      .otherwise(concat(lit("application/"), ext))
    files.select(
      regexp_extract(col("path"), "([0-9]+)\\.[A-Za-z0-9]+$", 1).cast("long").as("doc_id"),
      mediaType.as("media_type"),
      col("content").as("payload"))
      .as[MediaRow]
  }

  /** Pixel synthesis: cycle the doc's text bytes over an n-byte buffer.
    * Closed-form (`pixels(i) = text(i % len)`), so the oracle can recompute
    * any decoded checksum straight from the text column.
    */
  private def cycleBytes(text: Array[Byte], n: Int): Array[Byte] = {
    // Empty text would make `i % length` divide by zero (and a silent WAV
    // clip would diverge from the oracle's list_max(NULL)); substitute one
    // space byte so the failure mode is explicit and closed-form.
    val src = if (text.isEmpty) Array(' '.toByte) else text
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = src(i % src.length); i += 1 }
    out
  }

  private def docTriples(df: DataFrame): Dataset[(Long, String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
  }

  /** documents → real 24-bit BMP payloads. Dimensions are closed-form in
    * (doc_id, n_chars): width = 8 + doc_id % 24, height = 8 + n_chars % 16.
    */
  def asBmpMedia(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    docTriples(df).mapPartitions { rows =>
      rows.map { case (id, text, nChars) =>
        val w = (8 + id % 24).toInt
        val h = (8 + nChars % 16).toInt
        val px = cycleBytes(text.getBytes("UTF-8"), w * h * 3)
        MediaRow(id, "image/bmp", MediaCodec.encodeBmp(MediaCodec.Raster(w, h, px)))
      }
    }
  }

  /** documents → real compressed PNG payloads (8-bit truecolor, zlib
    * IDAT, filter type cycling per row so decode exercises all five
    * filters incl. Paeth). Dimensions are closed-form in (doc_id,
    * n_chars): width = 8 + doc_id % 17, height = 8 + n_chars % 13.
    */
  def asPngMedia(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    docTriples(df).mapPartitions { rows =>
      rows.map { case (id, text, nChars) =>
        val w = (8 + id % 17).toInt
        val h = (8 + nChars % 13).toInt
        val px = cycleBytes(text.getBytes("UTF-8"), w * h * 3)
        MediaRow(id, "image/png", MediaCodec.encodePng(MediaCodec.Raster(w, h, px)))
      }
    }
  }

  /** documents → real baseline 4:2:0 JPEG payloads, synthesized in the
    * YCbCr domain as FLAT 16×16 MCUs (Y constant per MCU, Cb/Cr constant
    * per chroma block): a flat block's spectrum is DC-only, so the lossy
    * quantize→dequantize→IDCT chain is exact integer-and-dyadic
    * arithmetic a SQL oracle replays bit-for-bit — the PNG/q185
    * discipline carried to a LOSSY codec. Dimensions are closed-form
    * multiples of 16 (w = 16·(1 + doc_id % 3), h = 16·(1 + n_chars % 2));
    * MCU m's plane values are text bytes at offsets m, m+7, m+13.
    */
  def asJpegMedia(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    docTriples(df).mapPartitions { rows =>
      rows.map { case (id, text, nChars) =>
        val w = (16 * (1 + id % 3)).toInt
        val h = (16 * (1 + nChars % 2)).toInt
        val mcX = w / 16
        val nMcu = mcX * (h / 16)
        val src = text.getBytes("UTF-8")
        def tb(i: Int): Int =
          if (src.isEmpty) ' '.toInt else src(i % src.length) & 0xff
        val yp = Array.tabulate(w * h)(i => tb(((i / w) / 16) * mcX + (i % w) / 16))
        val cw = w / 2
        val cb = Array.tabulate(cw * (h / 2))(i => tb(((i / cw) / 8) * mcX + (i % cw) / 8 + 7))
        val cr = Array.tabulate(cw * (h / 2))(i => tb(((i / cw) / 8) * mcX + (i % cw) / 8 + 13))
        MediaRow(id, "image/jpeg", MediaCodec.encodeJpegYcc(w, h, yp, cb, cr, quality = 50))
      }
    }
  }

  /** documents → binary P6 PPM payloads: width = 4 + n_chars % 13,
    * height = 4 + doc_id % 11.
    */
  def asPpmMedia(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    docTriples(df).mapPartitions { rows =>
      rows.map { case (id, text, nChars) =>
        val w = (4 + nChars % 13).toInt
        val h = (4 + id % 11).toInt
        val px = cycleBytes(text.getBytes("UTF-8"), w * h * 3)
        MediaRow(id, "image/ppm", MediaCodec.encodePpm(MediaCodec.Raster(w, h, px)))
      }
    }
  }

  /** documents → PCM16 mono WAV payloads: sample rate 8/12/16 kHz by
    * doc_id mod 3, one sample per text byte: `(byte − 96) · 256`.
    */
  def asWavMedia(df: DataFrame): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    docTriples(df).mapPartitions { rows =>
      rows.map { case (id, text, _) =>
        val rate = (8000 + 4000 * (id % 3)).toInt
        val bytes = text.getBytes("UTF-8")
        // An empty clip would give engine peak 0 vs the oracle's
        // list_max(NULL); fail loudly instead of diverging silently.
        require(bytes.nonEmpty, s"doc $id: empty text cannot synthesize a WAV clip")
        val samples = new Array[Short](bytes.length)
        var i = 0
        while (i < bytes.length) { samples(i) = (((bytes(i) & 0xff) - 96) * 256).toShort; i += 1 }
        MediaRow(id, "audio/wav", MediaCodec.encodeWav(MediaCodec.Clip(rate, samples)))
      }
    }
  }

  /** Image feature extraction: REAL decode (dispatched on media_type),
    * checksum = sum of decoded pixel bytes. Batched per partition.
    */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val raster = r.media_type match {
          case "image/bmp" => MediaCodec.decodeBmp(r.payload)
          case "image/png" => MediaCodec.decodePng(r.payload)
          case "image/ppm" => MediaCodec.decodePpm(r.payload)
          case "image/jpeg" => MediaCodec.decodeJpeg(r.payload)
          case t => throw new IllegalArgumentException(s"not an image media_type: $t")
        }
        var sum = 0L
        var i = 0
        while (i < raster.pixels.length) { sum += raster.pixels(i) & 0xff; i += 1 }
        MediaFeatures(
          r.doc_id,
          r.media_type,
          r.payload.length.toLong,
          sum,
          raster.width.toLong,
          raster.height.toLong)
      }
    }
  }

  /** Audio feature extraction: REAL RIFF/fmt/data parse. */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val clip = MediaCodec.decodeWav(r.payload)
        var peak = 0L
        var loud = 0L
        var i = 0
        while (i < clip.samples.length) {
          val a = math.abs(clip.samples(i).toLong)
          if (a > peak) peak = a
          loud += a
          i += 1
        }
        AudioFeatures(
          r.doc_id,
          r.media_type,
          r.payload.length.toLong,
          clip.sampleRate.toLong,
          clip.samples.length.toLong,
          clip.samples.length.toLong * 1000L / clip.sampleRate,
          peak,
          loud)
      }
    }
  }

  /** A sampled "frame" from a media payload: the byte stream sliced into
    * fixed-size chunks, every Nth kept — the fan-out shape (one media row
    * to many positional frame rows) of a video sampling pipeline.
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

  /** Resize result: original + target dimensions, re-encoded size and the
    * checksum of the resized pixels.
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

  /** REAL resize: decode the BMP, factor× box-downsample on actual pixel
    * geometry (top-left pick per block — deterministic), re-encode as BMP,
    * and decode the re-encoded bytes again so the reported features come
    * from a full encode→decode roundtrip of the resized image.
    * `resized_len` is the re-encoded BMP's size (header + padded rows).
    */
  def resizeMedia(media: Dataset[MediaRow], factor: Int = 2): Dataset[Resized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val orig = MediaCodec.decodeBmp(r.payload)
        val reencoded = MediaCodec.encodeBmp(MediaCodec.downsample(orig, factor))
        val small = MediaCodec.decodeBmp(reencoded)
        var sum = 0L
        var i = 0
        while (i < small.pixels.length) { sum += small.pixels(i) & 0xff; i += 1 }
        Resized(
          r.doc_id,
          r.media_type,
          orig.width.toLong,
          orig.height.toLong,
          small.width.toLong,
          small.height.toLong,
          reencoded.length.toLong,
          sum)
      }
    }
  }

  case class ImageHash(doc_id: Long, ahash_lo: Long, ahash_hi: Long)

  /** Perceptual average-hash over the DECODED image: sample an 8×8 grid
    * (top-left pick, the q70 resize convention), bit i set when the cell's
    * RGB sum beats the grid average — the classic aHash, with the
    * comparison kept in integers (`64·cell > total`) so both engines
    * agree exactly. Emitted as two 32-bit halves: a 64-bit hash with bit
    * 63 set would be a negative BIGINT on one engine and an overflowing
    * HUGEINT cast on the other. This is the image half of the dedup
    * family — identical rasters collide exactly; near-dup imagery is a
    * Hamming band away (the q27 simhash recipe, byte-domain).
    */
  def imageAHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val r = MediaCodec.decodeBmp(m.payload)
        val cell = new Array[Long](64)
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 8) {
            val x = gx * r.width / 8
            val y = gy * r.height / 8
            val base = (y * r.width + x) * 3
            cell(gy * 8 + gx) = (r.pixels(base) & 0xff).toLong +
              (r.pixels(base + 1) & 0xff) + (r.pixels(base + 2) & 0xff)
            gx += 1
          }
          gy += 1
        }
        val total = cell.sum
        var lo = 0L
        var hi = 0L
        var i = 0
        while (i < 64) {
          if (64L * cell(i) > total) {
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
          }
          i += 1
        }
        ImageHash(m.doc_id, lo, hi)
      }
    }
  }

  /** Registered query: aHash every BMP, then size each exact-collision
    * group (the image-dedup blocking key). One narrow decode pass, one
    * hash shuffle on the 16-byte hash.
    */
  def imageDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    val h = imageAHash(asBmpMedia(graft.core.Tables.documents(spark, dir))).toDF()
    h.join(
      h.groupBy(col("ahash_lo"), col("ahash_hi")).agg(count(lit(1)).as("group_size")),
      Seq("ahash_lo", "ahash_hi"))
      .select(col("doc_id"), col("ahash_lo"), col("ahash_hi"), col("group_size"))
      .orderBy(col("doc_id"))
  }

  /** End-to-end registered queries: documents → encoded media → decoded
    * features.
    */
  def featureQuery(spark: SparkSession, dir: String): DataFrame =
    imageFeatures(asBmpMedia(graft.core.Tables.documents(spark, dir)))
      .toDF()
      .orderBy(col("doc_id"))

  /** PNG roundtrip features. `byte_len` is dropped: a DEFLATE stream's
    * length is not closed-form (it depends on the zlib implementation),
    * so the oracle checks the decode-derived columns — which is the
    * point: checksum/width/height surviving the compressed roundtrip
    * proves the inflate + unfilter path bit-exact.
    */
  def pngFeatureQuery(spark: SparkSession, dir: String): DataFrame =
    imageFeatures(asPngMedia(graft.core.Tables.documents(spark, dir)))
      .toDF()
      .drop("byte_len")
      .orderBy(col("doc_id"))

  /** JPEG roundtrip features. `byte_len` is dropped (an entropy-coded
    * stream's length is not closed-form); checksum/width/height surviving
    * a LOSSY encode→decode roundtrip proves huffman + dequant + IDCT +
    * upsample + color conversion are bit-exact against the oracle's
    * closed-form replay of the DC-only arithmetic.
    */
  def jpegFeatureQuery(spark: SparkSession, dir: String): DataFrame =
    imageFeatures(asJpegMedia(graft.core.Tables.documents(spark, dir)))
      .toDF()
      .drop("byte_len")
      .orderBy(col("doc_id"))

  def ppmFeatureQuery(spark: SparkSession, dir: String): DataFrame =
    imageFeatures(asPpmMedia(graft.core.Tables.documents(spark, dir)))
      .toDF()
      .orderBy(col("doc_id"))

  def wavFeatureQuery(spark: SparkSession, dir: String): DataFrame =
    audioFeatures(asWavMedia(graft.core.Tables.documents(spark, dir)))
      .toDF()
      .orderBy(col("doc_id"))

  def resizeQuery(spark: SparkSession, dir: String): DataFrame =
    resizeMedia(asBmpMedia(graft.core.Tables.documents(spark, dir)), factor = 2)
      .toDF()
      .orderBy(col("doc_id"))
}
