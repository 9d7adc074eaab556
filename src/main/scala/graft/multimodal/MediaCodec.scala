package graft.multimodal

/** Pure-JVM media codecs for uncompressed formats: BMP (24-bit BI_RGB),
  * PPM (binary P6) and WAV (PCM16 mono). No external codec libraries —
  * header layout, row padding, bottom-up row order and byte endianness are
  * implemented from the public format specifications, so media decode in
  * this engine is REAL parsing of real container bytes, not a stub.
  *
  * All functions are pure `Array[Byte] => value` and run inside
  * `mapPartitions` on executors; payloads never reach the driver.
  *
  * (The reference has no media surface at all — gotsdb stores opaque
  * strings — so this realizes the LLM-pipeline mandate's multimodal
  * column requirement, not reference parity.)
  */
object MediaCodec {

  /** Decoded raster: logical top-down, row-major, RGB byte triples
    * (`pixels.length == width * height * 3`).
    */
  final case class Raster(width: Int, height: Int, pixels: Array[Byte])

  /** Decoded PCM16 mono audio clip. */
  final case class Clip(sampleRate: Int, samples: Array[Short])

  // ---- little-endian helpers (BMP and WAV are both little-endian) ------

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  // ---- BMP: BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40), 24bpp --------

  /** Per-axis caps alone don't bound the PRODUCT: a 65536×65536 header
    * wraps `width*height*3` (and the `(width*3+1)*height` scanline buffer)
    * past Int range, turning the decoder's contract — untrusted bytes fail
    * only as IllegalArgumentException — into ArrayIndexOutOfBounds /
    * NegativeArraySize. Bound the total decoded footprint in Long before
    * any allocation; 256 MiB is far above every legitimate fixture and far
    * below the wrap point.
    */
  private val MaxDecodedBytes = 256L * 1024 * 1024

  private def requireDecodedFits(width: Int, height: Int, fmt: String): Unit =
    require(
      width.toLong * height * 3 + height + 1 <= MaxDecodedBytes,
      s"$fmt: decoded size ${width}x$height exceeds the ${MaxDecodedBytes} byte cap")

  /** Bytes per stored BMP row: 3·width rounded up to a 4-byte boundary. */
  def bmpStride(width: Int): Int = (3 * width + 3) & ~3

  /** Total encoded BMP size for a width×height 24bpp image. */
  def bmpSize(width: Int, height: Int): Int = 54 + bmpStride(width) * height

  /** Encode a logical top-down RGB raster as a standard bottom-up 24-bit
    * BMP: rows are written last-first, each pixel as BGR, each row padded
    * to a 4-byte boundary.
    */
  def encodeBmp(r: Raster): Array[Byte] = {
    require(r.pixels.length == r.width * r.height * 3, "pixel buffer size mismatch")
    val stride = bmpStride(r.width)
    val dataSize = stride * r.height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length) // bfSize
    putLe32(out, 10, 54) // bfOffBits
    putLe32(out, 14, 40) // biSize (BITMAPINFOHEADER)
    putLe32(out, 18, r.width)
    putLe32(out, 22, r.height) // positive = bottom-up
    putLe16(out, 26, 1) // biPlanes
    putLe16(out, 28, 24) // biBitCount
    putLe32(out, 30, 0) // biCompression = BI_RGB
    putLe32(out, 34, dataSize)
    var y = 0
    while (y < r.height) {
      val srcRow = (r.height - 1 - y) * r.width * 3 // bottom-up storage
      val dstRow = 54 + y * stride
      var x = 0
      while (x < r.width) {
        out(dstRow + x * 3) = r.pixels(srcRow + x * 3 + 2) // B
        out(dstRow + x * 3 + 1) = r.pixels(srcRow + x * 3 + 1) // G
        out(dstRow + x * 3 + 2) = r.pixels(srcRow + x * 3) // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a 24-bit uncompressed BMP back to the logical top-down RGB
    * raster. Validates magic, header sizes, bit depth and compression;
    * throws IllegalArgumentException on anything malformed.
    */
  def decodeBmp(b: Array[Byte]): Raster = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP: bad magic/size")
    require(le32(b, 14) >= 40, "BMP: unsupported DIB header")
    val offBits = le32(b, 10)
    val width = le32(b, 18)
    val height = le32(b, 22)
    require(width > 0 && height > 0, "BMP: non-positive dimensions")
    // Header fields are untrusted 32-bit ints (reachable via binaryFile
    // ingestion): cap dimensions and do the truncation bound in Long so a
    // crafted width/height can't overflow Int past the require and land in
    // ArrayIndexOutOfBounds instead of IllegalArgumentException.
    require(width <= 65536 && height <= 65536, "BMP: dimensions exceed supported maximum")
    requireDecodedFits(width, height, "BMP")
    require(le16(b, 28) == 24, "BMP: only 24bpp supported")
    require(le32(b, 30) == 0, "BMP: only BI_RGB (uncompressed) supported")
    val stride = bmpStride(width)
    require(offBits >= 54, "BMP: pixel offset inside header")
    require(
      b.length.toLong >= offBits.toLong + stride.toLong * height.toLong,
      "BMP: truncated pixel data")
    val pixels = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = offBits + (height - 1 - y) * stride // undo bottom-up
      val dstRow = y * width * 3
      var x = 0
      while (x < width) {
        pixels(dstRow + x * 3) = b(srcRow + x * 3 + 2) // R
        pixels(dstRow + x * 3 + 1) = b(srcRow + x * 3 + 1) // G
        pixels(dstRow + x * 3 + 2) = b(srcRow + x * 3) // B
        x += 1
      }
      y += 1
    }
    Raster(width, height, pixels)
  }

  // ---- PPM: binary P6, maxval 255 -------------------------------------

  /** Encode as binary PPM: `P6\n<w> <h>\n255\n` + raw RGB triples. */
  def encodePpm(r: Raster): Array[Byte] = {
    require(r.pixels.length == r.width * r.height * 3, "pixel buffer size mismatch")
    val header = s"P6\n${r.width} ${r.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + r.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(r.pixels, 0, out, header.length, r.pixels.length)
    out
  }

  /** Parse a binary PPM (P6, maxval 255). Handles arbitrary whitespace
    * between header tokens per the netpbm spec (comments excluded — the
    * encoder never emits them).
    */
  def decodePpm(b: Array[Byte]): Raster = {
    require(b.length > 2 && b(0) == 'P' && b(1) == '6', "not a P6 PPM")
    var pos = 2
    def nextInt(): Int = {
      while (pos < b.length && Character.isWhitespace(b(pos))) pos += 1
      require(pos < b.length && b(pos) >= '0' && b(pos) <= '9', "PPM: expected integer")
      var v = 0
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1
      }
      v
    }
    val width = nextInt()
    val height = nextInt()
    val maxval = nextInt()
    require(width > 0 && height > 0, "PPM: non-positive dimensions")
    requireDecodedFits(width, height, "PPM")
    require(maxval == 255, "PPM: only maxval 255 supported")
    pos += 1 // exactly one whitespace byte after maxval
    require(b.length.toLong >= pos.toLong + width.toLong * height * 3, "PPM: truncated pixel data")
    val pixels = java.util.Arrays.copyOfRange(b, pos, pos + width * height * 3)
    Raster(width, height, pixels)
  }

  // ---- WAV: RIFF/WAVE, PCM 16-bit mono --------------------------------

  /** Encode PCM16 mono as a canonical 44-byte-header WAV file. */
  def encodeWav(c: Clip): Array[Byte] = {
    val dataSize = c.samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16) // fmt chunk size (PCM)
    putLe16(out, 20, 1) // audio format = PCM
    putLe16(out, 22, 1) // channels = mono
    putLe32(out, 24, c.sampleRate)
    putLe32(out, 28, c.sampleRate * 2) // byte rate
    putLe16(out, 32, 2) // block align
    putLe16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, dataSize)
    var i = 0
    while (i < c.samples.length) {
      putLe16(out, 44 + i * 2, c.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Parse a WAV file: walks RIFF chunks (so files with extra chunks
    * before `data` — e.g. LIST metadata — still decode), requires PCM
    * 16-bit mono.
    */
  def decodeWav(b: Array[Byte]): Clip = {
    require(
      b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E',
      "not a RIFF/WAVE file")
    var pos = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= b.length && (sampleRate < 0 || samples == null)) {
      val id = new String(b, pos, 4, "US-ASCII")
      val size = le32(b, pos + 4)
      require(size >= 0 && pos + 8 + size <= b.length, s"WAV: truncated '$id' chunk")
      id match {
        case "fmt " =>
          require(size >= 16, "WAV: short fmt chunk")
          require(le16(b, pos + 8) == 1, "WAV: only PCM supported")
          require(le16(b, pos + 10) == 1, "WAV: only mono supported")
          sampleRate = le32(b, pos + 12)
          require(le16(b, pos + 22) == 16, "WAV: only 16-bit supported")
        case "data" =>
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = le16(b, pos + 8 + i * 2).toShort
            i += 1
          }
        case _ => // skip unknown chunk
      }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    require(sampleRate > 0, "WAV: missing fmt chunk")
    require(samples != null, "WAV: missing data chunk")
    Clip(sampleRate, samples)
  }

  // ---- real raster ops -------------------------------------------------

  /** Factor× box downsample by top-left pick: resized pixel (r, c) is the
    * original pixel (factor·r, factor·c). Deterministic (no float
    * averaging) and geometry-aware — operates on decoded rows/columns,
    * not the flat byte stream.
    */
  // ---- PNG: 8-bit truecolor (color type 2), zlib IDAT ------------------
  //
  // Real PNG per the W3C spec: signature, CRC-checked chunks, IHDR,
  // zlib-compressed scanlines (java.util.zip, which IS zlib), and all five
  // row filters — None/Sub/Up/Average/Paeth — on both sides. The encoder
  // cycles the filter type per row (y mod 5), so every decode path
  // (including Paeth's three-way predictor) is exercised by any image of
  // ≥5 rows; the decoder accepts arbitrary conforming files (e.g. via
  // binaryFile ingestion), not just our encoder's output.

  private val pngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte
    b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte
    b(off + 3) = (v & 0xff).toByte
  }

  private def pngChunk(out: java.io.ByteArrayOutputStream, chunkType: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putBe32(len, 0, data.length)
    out.write(len)
    val tb = chunkType.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new java.util.zip.CRC32
    crc.update(tb)
    crc.update(data)
    val c = new Array[Byte](4)
    putBe32(c, 0, crc.getValue.toInt)
    out.write(c)
  }

  /** Paeth predictor (PNG spec §9.4): nearest of left/above/upper-left to
    * the linear estimate left + above − upper-left, ties left > above > UL.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode a logical top-down RGB raster as an 8-bit truecolor PNG.
    * Row y uses filter type y mod 5 so the stream carries every filter.
    */
  def encodePng(r: Raster): Array[Byte] = {
    require(r.pixels.length == r.width * r.height * 3, "pixel buffer size mismatch")
    val bpr = r.width * 3
    val raw = new Array[Byte]((bpr + 1) * r.height)
    var y = 0
    while (y < r.height) {
      val f = y % 5
      raw(y * (bpr + 1)) = f.toByte
      var i = 0
      while (i < bpr) {
        val cur = r.pixels(y * bpr + i) & 0xff
        val left = if (i >= 3) r.pixels(y * bpr + i - 3) & 0xff else 0
        val up = if (y > 0) r.pixels((y - 1) * bpr + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) r.pixels((y - 1) * bpr + i - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * (bpr + 1) + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater
    deflater.setInput(raw)
    deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, r.width)
    putBe32(ihdr, 4, r.height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor
    // ihdr(10..12): compression 0, filter 0, interlace 0
    val out = new java.io.ByteArrayOutputStream
    out.write(pngSig)
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", zOut.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit truecolor non-interlaced PNG: CRC-checked chunk walk,
    * zlib inflate, per-row unfilter (all five types). Ancillary chunks are
    * skipped; multiple IDAT chunks concatenate per the spec.
    */
  def decodePng(b: Array[Byte]): Raster = {
    require(b.length >= 8 + 25 + 12, "not a PNG: too short")
    var i = 0
    while (i < 8) { require(b(i) == pngSig(i), "not a PNG: bad signature"); i += 1 }
    var off = 8
    var width = -1
    var height = -1
    val idat = new java.io.ByteArrayOutputStream
    var sawEnd = false
    while (!sawEnd) {
      require(off + 8 <= b.length, "PNG: truncated chunk header")
      val len = be32(b, off)
      require(len >= 0 && off + 12L + len <= b.length, "PNG: truncated chunk")
      val chunkType = new String(b, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(b, off + 4, 4 + len)
      require(crc.getValue.toInt == be32(b, off + 8 + len), s"PNG: CRC mismatch in $chunkType")
      chunkType match {
        case "IHDR" =>
          require(len == 13, "PNG: bad IHDR length")
          width = be32(b, off + 8)
          height = be32(b, off + 12)
          require(width > 0 && height > 0, "PNG: non-positive dimensions")
          require(width <= 65536 && height <= 65536, "PNG: dimensions exceed supported maximum")
          requireDecodedFits(width, height, "PNG")
          require(b(off + 16) == 8, "PNG: only bit depth 8 supported")
          require(b(off + 17) == 2, "PNG: only truecolor (type 2) supported")
          require(b(off + 18) == 0 && b(off + 19) == 0, "PNG: bad compression/filter method")
          require(b(off + 20) == 0, "PNG: interlace not supported")
        case "IDAT" =>
          require(width > 0, "PNG: IDAT before IHDR")
          idat.write(b, off + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary (tEXt, gAMA, …): CRC-checked, skipped
      }
      off += 12 + len
    }
    require(idat.size > 0, "PNG: no IDAT data")
    val bpr = width * 3
    val raw = new Array[Byte]((bpr + 1) * height)
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        require(n > 0 || inflater.finished(), "PNG: truncated or corrupt zlib stream")
        got += n
      }
    } catch {
      // keep the decoder's single failure type: untrusted bytes (reachable
      // via binaryFile ingestion) must fail as IllegalArgumentException,
      // not a checked zlib exception
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"PNG: corrupt zlib stream: ${e.getMessage}")
    } finally inflater.end()
    require(got == raw.length, "PNG: scanline data size mismatch")
    val pixels = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val f = raw(y * (bpr + 1)) & 0xff
      require(f <= 4, s"PNG: unknown filter type $f")
      var x = 0
      while (x < bpr) {
        val v = raw(y * (bpr + 1) + 1 + x) & 0xff
        val left = if (x >= 3) pixels(y * bpr + x - 3) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * bpr + x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) pixels((y - 1) * bpr + x - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        pixels(y * bpr + x) = ((v + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Raster(width, height, pixels)
  }

  // ---- JPEG: baseline sequential DCT (SOF0), huffman, 4:2:0 -----------
  //
  // Pure-JVM baseline JPEG from the public ITU-T T.81 spec: markers, DQT
  // (quality-scaled Annex K tables), DHT (Annex K canonical huffman), SOF0,
  // SOS, entropy coding with 0xFF00 stuffing, restart markers, zigzag,
  // FDCT/IDCT, 4:2:0 subsampling with replication upsampling, JFIF
  // YCbCr<->RGB. Real web corpora are overwhelmingly JPEG — this closes
  // the container family (BMP/PPM/WAV/PNG/JPEG) for binaryFile ingestion.
  //
  // Numeric discipline (the q191 oracle contract): the DC basis function
  // is the constant 1/8, so both transforms apply the algebraically
  // simplified factor 0.125 to the DC term instead of multiplying three
  // double constants — the dominant term carries ZERO rounding error.
  // A flat 8x8 block therefore quantizes to a DC-only spectrum via exact
  // dyadic arithmetic (x/8 and x/2 are exact in binary floating point),
  // and decodes back through integer-and-dyadic steps a SQL oracle can
  // replay bit-for-bit. AC terms use the generic double basis (their
  // quantized value for flat blocks is exactly 0: the summed basis noise
  // is ~1e-14, far below the 0.5 rounding threshold).

  private def jfail(msg: String): Nothing = throw new IllegalArgumentException(s"JPEG: $msg")

  /** Annex K zigzag: zigzag index -> natural (row-major) index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44,
    51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K base quantization tables, zigzag order after transposition to
    * natural row-major here — stored in NATURAL order and emitted/read via
    * [[Zigzag]].
    */
  private val BaseQLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55, 14, 13, 16, 24, 40, 57,
    69, 56, 14, 17, 22, 29, 51, 87, 80, 62, 18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64,
    81, 104, 113, 92, 49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)

  private val BaseQChr: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99, 24, 26, 56, 99, 99, 99,
    99, 99, 47, 66, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  /** libjpeg quality scaling: 50 keeps the Annex K tables verbatim. */
  private def scaledQTable(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, "JPEG quality must be in [1, 100]")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(q => math.min(255, math.max(1, (q * scale + 50) / 100)))
  }

  // Annex K huffman table specs: (code counts per length 1..16, symbols)
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61,
    0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52,
    0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25,
    0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64,
    0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x83,
    0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99,
    0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3,
    0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8,
    0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChrBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61,
    0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33,
    0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18,
    0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63,
    0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a,
    0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97,
    0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca,
    0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7,
    0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical huffman decode table (T.81 F.2.2.3's MINCODE/MAXCODE/VALPTR
    * algorithm) built from (counts per length, symbols).
    */
  private final class JpegHuff(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    // encoder side: canonical (code, size) per symbol
    val codeOf = new Array[Int](256)
    val sizeOf = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        valPtr(len) = k
        minCode(len) = code
        var i = 0
        while (i < bits(len - 1)) {
          if (k >= vals.length) jfail("huffman table counts exceed symbol list")
          codeOf(vals(k)) = code
          sizeOf(vals(k)) = len
          code += 1; k += 1; i += 1
        }
        maxCode(len) = if (bits(len - 1) > 0) code - 1 else -1
        code <<= 1
        len += 1
      }
    }
    def decode(br: JpegBitReader): Int = {
      var len = 1
      var code = br.nextBit()
      while (len < 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | br.nextBit(); len += 1
      }
      if (maxCode(len) < 0 || code > maxCode(len)) jfail("invalid huffman code")
      val idx = valPtr(len) + code - minCode(len)
      if (idx < 0 || idx >= vals.length) jfail("huffman code outside symbol list")
      vals(idx)
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * un-stuffing; any bare marker inside the stream is a failure except
    * via [[expectRestart]].
    */
  private final class JpegBitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def nextBit(): Int = {
      if (n == 0) {
        if (pos >= b.length) jfail("truncated entropy-coded data")
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) jfail("truncated after 0xFF in entropy data")
          val m = b(pos) & 0xff; pos += 1
          if (m != 0x00) jfail(f"unexpected marker 0xFF$m%02X inside entropy data")
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker. */
    def expectRestart(idx: Int): Unit = {
      n = 0
      if (pos + 1 >= b.length) jfail("truncated at restart marker")
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 + idx))
        jfail("missing restart marker")
      pos += 2
    }
    def align(): Unit = n = 0
  }

  private final class JpegBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >>> i) & 1); n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flushOnes(): Unit = while (n != 0) put(1, 1)
    def writeTo(dst: java.io.ByteArrayOutputStream): Unit = out.writeTo(dst)
  }

  // cosine basis: cosTab(x)(u) = cos((2x+1)·u·π/16); cu(0) handled via the
  // exact DC shortcut, so the tables only serve AC terms
  private val CosTab: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private def cFac(u: Int): Double = if (u == 0) 0.7071067811865476 else 1.0

  /** FDCT + quantize one 8x8 block (`samples` 0..255 natural order) into
    * zigzag-ordered quantized coefficients. DC uses the exact 1/8 factor
    * (see the section comment); quantization is floor(x/q + 0.5).
    */
  private def fdctQuant(samples: Array[Int], qtNat: Array[Int]): Array[Int] = {
    val outZ = new Array[Int](64)
    var s = 0L
    var i = 0
    while (i < 64) { s += samples(i) - 128; i += 1 }
    outZ(0) = math.floor(s * 0.125 / qtNat(0) + 0.5).toInt
    var z = 1
    while (z < 64) {
      val nat = Zigzag(z)
      val u = nat % 8
      val v = nat / 8
      var acc = 0.0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          acc += (samples(y * 8 + x) - 128) * CosTab(x)(u) * CosTab(y)(v)
          x += 1
        }
        y += 1
      }
      val coef = 0.25 * cFac(u) * cFac(v) * acc
      outZ(z) = math.floor(coef / qtNat(nat) + 0.5).toInt
      z += 1
    }
    outZ
  }

  /** Dequantized natural-order coefficients -> clamped 0..255 samples. DC
    * contributes exactly dc/8; AC terms use the generic double basis.
    */
  private def idctBlock(coefNat: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    val dc = coefNat(0) * 0.125
    var anyAc = false
    var i = 1
    while (i < 64 && !anyAc) { anyAc = coefNat(i) != 0; i += 1 }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        if (anyAc) {
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              if ((u | v) != 0) {
                val c = coefNat(v * 8 + u)
                if (c != 0) acc += cFac(u) * cFac(v) * c * CosTab(x)(u) * CosTab(y)(v)
              }
              u += 1
            }
            v += 1
          }
          acc *= 0.25
        }
        val px = math.floor(dc + acc + 128.0 + 0.5)
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px.toInt
        x += 1
      }
      y += 1
    }
    out
  }

  private def magnitudeCat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Huffman-encode one quantized block (zigzag order): DC diff category +
    * bits, AC run/size with ZRL and EOB. Returns the new DC predictor.
    */
  private def emitEntropyBlock(
      bw: JpegBitWriter,
      coefZ: Array[Int],
      pred: Int,
      dc: JpegHuff,
      ac: JpegHuff): Int = {
    val diff = coefZ(0) - pred
    val s = if (diff == 0) 0 else magnitudeCat(diff)
    bw.put(dc.codeOf(s), dc.sizeOf(s))
    if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    var lastNz = 63
    while (lastNz > 0 && coefZ(lastNz) == 0) lastNz -= 1
    var k = 1
    while (k <= lastNz) {
      var run = 0
      while (coefZ(k) == 0) { run += 1; k += 1 }
      while (run >= 16) { bw.put(ac.codeOf(0xf0), ac.sizeOf(0xf0)); run -= 16 } // ZRL
      val v = coefZ(k)
      val sz = magnitudeCat(v)
      val sym = (run << 4) | sz
      bw.put(ac.codeOf(sym), ac.sizeOf(sym))
      bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
      k += 1
    }
    if (lastNz < 63) bw.put(ac.codeOf(0x00), ac.sizeOf(0x00)) // EOB
    coefZ(0)
  }

  /** Sample the 8x8 block at block coords (bx, by) from a plane, edge
    * pixels replicated past the boundary.
    */
  private def sampleBlock(plane: Array[Int], pw: Int, ph: Int, bx: Int, by: Int): Array[Int] = {
    val blk = new Array[Int](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(by * 8 + y, ph - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(bx * 8 + x, pw - 1)
        blk(y * 8 + x) = plane(sy * pw + sx)
        x += 1
      }
      y += 1
    }
    blk
  }

  /** Grayscale (single-component) baseline JPEG: per T.81 A.2 the scan is
    * non-interleaved — one data unit per MCU in block raster order, the
    * declared sampling factors irrelevant. `yp` is width×height 0..255.
    */
  def encodeJpegGray(
      width: Int,
      height: Int,
      yp: Array[Int],
      quality: Int = 50,
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "JPEG: non-positive dimensions")
    require(yp.length == width * height, "JPEG: luma plane size mismatch")
    require(restartInterval >= 0, "JPEG: negative restart interval")
    val qLum = scaledQTable(BaseQLum, quality)
    val dcL = new JpegHuff(DcLumBits, DcLumVals)
    val acL = new JpegHuff(AcLumBits, AcLumVals)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      payload.foreach(v => out.write(v & 0xff))
    }
    marker(0xd8)
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, 0 +: Zigzag.map(qLum))
    seg(
      0xc0,
      Array(8, (height >> 8) & 0xff, height & 0xff, (width >> 8) & 0xff, width & 0xff, 1,
        1, 0x11, 0))
    seg(0xc4, 0x00 +: (DcLumBits ++ DcLumVals))
    seg(0xc4, 0x10 +: (AcLumBits ++ AcLumVals))
    if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff)) // DRI
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    var bw = new JpegBitWriter()
    val bxs = (width + 7) / 8
    val bys = (height + 7) / 8
    var pred = 0
    var mcu = 0
    var rstIdx = 0
    var by = 0
    while (by < bys) {
      var bx = 0
      while (bx < bxs) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // close the entropy segment: pad to a byte, emit RSTn, reset the
          // DC predictor — exactly what the decoder's expectRestart undoes
          bw.flushOnes()
          bw.writeTo(out)
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          bw = new JpegBitWriter()
          pred = 0
        }
        pred = emitEntropyBlock(bw, fdctQuant(sampleBlock(yp, width, height, bx, by), qLum), pred, dcL, acL)
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flushOnes()
    bw.writeTo(out)
    marker(0xd9)
    out.toByteArray
  }

  /** Encode from explicit YCbCr planes: `yp` is width×height; `cb`/`cr`
    * are ceil(w/2)×ceil(h/2) (4:2:0). This is the natural internal entry —
    * [[encodeJpeg]] converts RGB and subsamples first — and the one the
    * q191 synthesis uses so the oracle's closed form starts from the
    * exact plane values. All planes are 0..255 ints.
    */
  def encodeJpegYcc(
      width: Int,
      height: Int,
      yp: Array[Int],
      cb: Array[Int],
      cr: Array[Int],
      quality: Int = 50): Array[Byte] = {
    require(width > 0 && height > 0, "JPEG: non-positive dimensions")
    val cw = (width + 1) / 2
    val ch = (height + 1) / 2
    require(yp.length == width * height, "JPEG: luma plane size mismatch")
    require(cb.length == cw * ch && cr.length == cw * ch, "JPEG: chroma plane size mismatch")
    val qLum = scaledQTable(BaseQLum, quality)
    val qChr = scaledQTable(BaseQChr, quality)
    val dcL = new JpegHuff(DcLumBits, DcLumVals)
    val acL = new JpegHuff(AcLumBits, AcLumVals)
    val dcC = new JpegHuff(DcChrBits, DcChrVals)
    val acC = new JpegHuff(AcChrBits, AcChrVals)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      payload.foreach(v => out.write(v & 0xff))
    }
    marker(0xd8) // SOI
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    seg(0xdb, 0 +: Zigzag.map(qLum)) // DQT id 0, zigzag order
    seg(0xdb, 1 +: Zigzag.map(qChr)) // DQT id 1
    seg(
      0xc0, // SOF0: baseline
      Array(8, (height >> 8) & 0xff, height & 0xff, (width >> 8) & 0xff, width & 0xff, 3,
        1, 0x22, 0, // Y: h=2, v=2, qtable 0
        2, 0x11, 1, // Cb: h=1, v=1, qtable 1
        3, 0x11, 1)) // Cr
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit =
      seg(0xc4, ((cls << 4) | id) +: (bits ++ vals))
    dht(0, 0, DcLumBits, DcLumVals)
    dht(1, 0, AcLumBits, AcLumVals)
    dht(0, 1, DcChrBits, DcChrVals)
    dht(1, 1, AcChrBits, AcChrVals)
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)) // SOS
    val bw = new JpegBitWriter()
    def emitBlock(coefZ: Array[Int], pred: Int, dc: JpegHuff, ac: JpegHuff): Int =
      emitEntropyBlock(bw, coefZ, pred, dc, ac)
    def block(plane: Array[Int], pw: Int, ph: Int, bx: Int, by: Int): Array[Int] =
      sampleBlock(plane, pw, ph, bx, by)
    val mcusX = (width + 15) / 16
    val mcusY = (height + 15) / 16
    var predY = 0
    var predCb = 0
    var predCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var v = 0
        while (v < 2) {
          var u = 0
          while (u < 2) {
            predY = emitBlock(fdctQuant(block(yp, width, height, mx * 2 + u, my * 2 + v), qLum), predY, dcL, acL)
            u += 1
          }
          v += 1
        }
        predCb = emitBlock(fdctQuant(block(cb, cw, ch, mx, my), qChr), predCb, dcC, acC)
        predCr = emitBlock(fdctQuant(block(cr, cw, ch, mx, my), qChr), predCr, dcC, acC)
        mx += 1
      }
      my += 1
    }
    bw.flushOnes()
    bw.writeTo(out)
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** RGB entry point: JFIF RGB→YCbCr (floor(x+0.5) snap per sample), 2×2
    * box-average chroma subsampling (floor(avg+0.5), edge clamp), then
    * [[encodeJpegYcc]].
    */
  def encodeJpeg(r: Raster, quality: Int = 50): Array[Byte] = {
    require(r.pixels.length == r.width * r.height * 3, "pixel buffer size mismatch")
    val w = r.width
    val h = r.height
    val yp = new Array[Int](w * h)
    val cbF = new Array[Int](w * h)
    val crF = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val rr = r.pixels(i * 3) & 0xff
      val gg = r.pixels(i * 3 + 1) & 0xff
      val bb = r.pixels(i * 3 + 2) & 0xff
      yp(i) = clamp255(math.floor(0.299 * rr + 0.587 * gg + 0.114 * bb + 0.5))
      cbF(i) = clamp255(math.floor(128.0 - 0.168736 * rr - 0.331264 * gg + 0.5 * bb + 0.5))
      crF(i) = clamp255(math.floor(128.0 + 0.5 * rr - 0.418688 * gg - 0.081312 * bb + 0.5))
      i += 1
    }
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    def sub(full: Array[Int]): Array[Int] = {
      val o = new Array[Int](cw * ch)
      var cy = 0
      while (cy < ch) {
        var cx = 0
        while (cx < cw) {
          var s = 0
          var n = 0
          var dy = 0
          while (dy < 2) {
            val sy = cy * 2 + dy
            if (sy < h) {
              var dx = 0
              while (dx < 2) {
                val sx = cx * 2 + dx
                if (sx < w) { s += full(sy * w + sx); n += 1 }
                dx += 1
              }
            }
            dy += 1
          }
          o(cy * cw + cx) = (s + n / 2) / n
          cx += 1
        }
        cy += 1
      }
      o
    }
    encodeJpegYcc(w, h, yp, sub(cbF), sub(crF), quality)
  }

  private def clamp255(v: Double): Int = if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** Decode a baseline (SOF0) huffman JPEG: grayscale or YCbCr with
    * sampling factors 1-2 per axis, single interleaved scan, optional
    * restart intervals. Untrusted bytes fail only as
    * IllegalArgumentException (fuzz-covered); unsupported-but-valid
    * variants (progressive, 12-bit, arithmetic coding) fail the same way
    * with a named reason.
    */
  def decodeJpeg(b: Array[Byte]): Raster = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) jfail("bad SOI magic")
    var pos = 2
    def u8(): Int = {
      if (pos >= b.length) jfail("truncated header")
      val v = b(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val hi = u8(); (hi << 8) | u8() }
    val qt = new Array[Array[Int]](4) // natural order
    val dcTabs = new Array[JpegHuff](4)
    val acTabs = new Array[JpegHuff](4)
    var width = 0
    var height = 0
    // per component: id, h, v, tq
    var comps: Array[(Int, Int, Int, Int)] = null
    var restartInterval = 0
    var raster: Raster = null
    while (raster == null) {
      if (u8() != 0xff) jfail("expected marker")
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes
      m match {
        case 0xd8 => jfail("nested SOI")
        case 0xd9 => jfail("EOI before any scan")
        case 0xc0 => // SOF0 baseline
          val len = u16()
          if (len < 8) jfail("SOF0 too short")
          if (u8() != 8) jfail("only 8-bit precision supported")
          height = u16(); width = u16()
          if (width <= 0 || height <= 0) jfail("non-positive dimensions")
          if (width > 65536 || height > 65536) jfail("dimensions exceed supported maximum")
          requireDecodedFits(width, height, "JPEG")
          val n = u8()
          if (n != 1 && n != 3) jfail(s"unsupported component count $n")
          if (len != 8 + 3 * n) jfail("SOF0 length mismatch")
          comps = Array.fill(n)((0, 0, 0, 0)).map { _ =>
            val id = u8()
            val hv = u8()
            val tq = u8()
            val ch = hv >> 4
            val cv = hv & 15
            if (ch < 1 || ch > 2 || cv < 1 || cv > 2) jfail(s"unsupported sampling ${ch}x$cv")
            if (tq > 3) jfail("bad quant table id")
            (id, ch, cv, tq)
          }
        case 0xc4 => // DHT (possibly several tables per segment)
          val len = u16()
          val end = pos + len - 2
          if (end > b.length) jfail("DHT overruns file")
          while (pos < end) {
            val tc = u8()
            val cls = tc >> 4
            val id = tc & 15
            if (cls > 1 || id > 3) jfail("bad huffman table class/id")
            val bits = Array.fill(16)(u8())
            val total = bits.sum
            if (total > 256 || pos + total > end) jfail("huffman table overruns segment")
            val vals = Array.fill(total)(u8())
            val t = new JpegHuff(bits, vals)
            if (cls == 0) dcTabs(id) = t else acTabs(id) = t
          }
        case 0xdb => // DQT
          val len = u16()
          val end = pos + len - 2
          if (end > b.length) jfail("DQT overruns file")
          while (pos < end) {
            val pq = u8()
            if ((pq >> 4) != 0) jfail("only 8-bit quant tables supported")
            val id = pq & 15
            if (id > 3) jfail("bad quant table id")
            val tab = new Array[Int](64)
            var k = 0
            while (k < 64) { tab(Zigzag(k)) = u8(); k += 1 }
            if (tab.exists(_ == 0)) jfail("zero quantizer")
            qt(id) = tab
          }
        case 0xdd =>
          if (u16() != 4) jfail("bad DRI length")
          restartInterval = u16()
        case 0xda => // SOS → entropy-coded data
          if (comps == null) jfail("SOS before SOF0")
          val len = u16()
          val ns = u8()
          if (ns != comps.length || len != 6 + 2 * ns) jfail("scan/frame component mismatch")
          val scanTabs = Array.fill(ns)((0, 0))
          var i = 0
          while (i < ns) {
            val cs = u8()
            if (comps.indexWhere(_._1 == cs) != i) jfail("scan component order mismatch")
            val tt = u8()
            if ((tt >> 4) > 3 || (tt & 15) > 3) jfail("bad scan table id")
            scanTabs(i) = (tt >> 4, tt & 15)
            i += 1
          }
          if (u8() != 0 || u8() != 63 || u8() != 0) jfail("non-baseline spectral selection")
          raster = decodeScan(b, pos, width, height, comps, scanTabs, qt, dcTabs, acTabs, restartInterval)
        // NB: `pos += u16() - 2` would read the OLD pos before u16()
        // advances it — evaluate the length first
        case mm if mm >= 0xe0 && mm <= 0xef => val len = u16(); pos += len - 2 // APPn
        case 0xfe => val len = u16(); pos += len - 2 // COM
        case 0xc2 => jfail("progressive JPEG not supported")
        case 0xc9 | 0xca | 0xcb => jfail("arithmetic coding not supported")
        case other => jfail(f"unsupported marker 0xFF$other%02X")
      }
      if (pos > b.length) jfail("segment overruns file")
    }
    raster
  }

  private def decodeScan(
      b: Array[Byte],
      start: Int,
      width: Int,
      height: Int,
      frameComps: Array[(Int, Int, Int, Int)],
      scanTabs: Array[(Int, Int)],
      qt: Array[Array[Int]],
      dcTabs: Array[JpegHuff],
      acTabs: Array[JpegHuff],
      restartInterval: Int): Raster = {
    // T.81 A.2: a SINGLE-component scan is non-interleaved — the MCU is
    // one data unit and the frame's sampling factors do not apply (a
    // grayscale SOF may legally declare 2x2); multi-component scans are
    // interleaved with h×v blocks per component per MCU
    val comps =
      if (frameComps.length == 1) frameComps.map(c => (c._1, 1, 1, c._4)) else frameComps
    val maxH = comps.map(_._2).max
    val maxV = comps.map(_._3).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    val n = comps.length
    // padded per-component planes
    val planeW = new Array[Int](n)
    val planeH = new Array[Int](n)
    val planes = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      planeW(i) = mcusX * 8 * comps(i)._2
      planeH(i) = mcusY * 8 * comps(i)._3
      planes(i) = new Array[Int](planeW(i) * planeH(i))
      val (dcT, acT) = scanTabs(i)
      if (dcTabs(dcT) == null || acTabs(acT) == null) jfail("scan references undefined huffman table")
      if (qt(comps(i)._4) == null) jfail("frame references undefined quant table")
      i += 1
    }
    val br = new JpegBitReader(b, start)
    val pred = new Array[Int](n)
    var mcu = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.expectRestart(rstIdx)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        var c = 0
        while (c < n) {
          val (_, ch, cv, tq) = comps(c)
          val q = qt(tq)
          val dcT = dcTabs(scanTabs(c)._1)
          val acT = acTabs(scanTabs(c)._2)
          var v = 0
          while (v < cv) {
            var u = 0
            while (u < ch) {
              // decode one block
              val coefNat = new Array[Int](64)
              val s = dcT.decode(br)
              if (s > 11) jfail("DC category out of range")
              val diff = if (s == 0) 0 else extend(br.receive(s), s)
              pred(c) += diff
              coefNat(0) = pred(c) * q(0)
              var k = 1
              while (k < 64) {
                val rs = acT.decode(br)
                val run = rs >> 4
                val sz = rs & 15
                if (sz == 0) {
                  if (run == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += run
                  if (k > 63) jfail("AC coefficient index overruns block")
                  coefNat(Zigzag(k)) = extend(br.receive(sz), sz) * q(Zigzag(k))
                  k += 1
                }
              }
              val px = idctBlock(coefNat)
              val bx = (mx * ch + u) * 8
              val by = (my * cv + v) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  planes(c)((by + yy) * planeW(c) + bx + xx) = px(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              u += 1
            }
            v += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    br.align()
    // the next marker must be EOI (single-scan baseline)
    if (br.pos + 1 >= b.length + 1) jfail("truncated before EOI")
    if (br.pos + 1 >= b.length || (b(br.pos) & 0xff) != 0xff || (b(br.pos + 1) & 0xff) != 0xd9)
      jfail("missing EOI after scan")
    // color-convert (replication upsampling for subsampled chroma). The
    // expression ORDER matches the q191 oracle SQL exactly — left-to-right
    // IEEE double ops, floor(x+0.5), clamp.
    val pixels = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        if (n == 1) {
          val g = planes(0)(y * planeW(0) + x).toByte
          pixels(o) = g; pixels(o + 1) = g; pixels(o + 2) = g
        } else {
          val yv = planes(0)((y * comps(0)._3 / maxV) * planeW(0) + x * comps(0)._2 / maxH)
          val cbv = planes(1)((y * comps(1)._3 / maxV) * planeW(1) + x * comps(1)._2 / maxH)
          val crv = planes(2)((y * comps(2)._3 / maxV) * planeW(2) + x * comps(2)._2 / maxH)
          pixels(o) = clamp255(math.floor(yv + 1.402 * (crv - 128) + 0.5)).toByte
          pixels(o + 1) =
            clamp255(math.floor(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128) + 0.5)).toByte
          pixels(o + 2) = clamp255(math.floor(yv + 1.772 * (cbv - 128) + 0.5)).toByte
        }
        x += 1
      }
      y += 1
    }
    Raster(width, height, pixels)
  }

  /** T.81 EXTEND: map the `s` received bits to the signed coefficient. */
  private def extend(v: Int, s: Int): Int =
    if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  def downsample(r: Raster, factor: Int): Raster = {
    require(factor >= 1, "factor must be >= 1")
    val nw = math.max(1, r.width / factor)
    val nh = math.max(1, r.height / factor)
    val out = new Array[Byte](nw * nh * 3)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        val src = ((y * factor) * r.width + (x * factor)) * 3
        val dst = (y * nw + x) * 3
        out(dst) = r.pixels(src)
        out(dst + 1) = r.pixels(src + 1)
        out(dst + 2) = r.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    Raster(nw, nh, out)
  }
}
