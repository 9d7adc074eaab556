package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import MediaCodec.{Clip, Raster}

  // ---- codec unit tests (no Spark) ------------------------------------

  test("BMP golden bytes: 2x2 image matches the spec layout byte-for-byte") {
    // pixels (top-down RGB): (255,0,0) (0,255,0) / (0,0,255) (1,2,3)
    val r = Raster(2, 2, Array[Byte](
      255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 255.toByte, 1, 2, 3))
    val b = MediaCodec.encodeBmp(r)
    assert(b.length == 54 + 8 * 2) // stride(2)=8 (6 rounded to 8), 2 rows
    assert(b(0) == 'B' && b(1) == 'M')
    assert((b(2) & 0xff) == 70) // bfSize LE
    assert((b(10) & 0xff) == 54) // bfOffBits
    assert((b(14) & 0xff) == 40) // biSize
    assert((b(18) & 0xff) == 2 && (b(22) & 0xff) == 2) // w, h
    assert((b(28) & 0xff) == 24) // bit depth
    // pixel data is bottom-up BGR: first stored row = image row 1
    assert((b(54) & 0xff, b(55) & 0xff, b(56) & 0xff) == ((255, 0, 0))) // (0,0,255) as BGR
    assert((b(57) & 0xff, b(58) & 0xff, b(59) & 0xff) == ((3, 2, 1))) // (1,2,3) as BGR
    assert(b(60) == 0 && b(61) == 0) // row padding
    // second stored row = image row 0
    assert((b(62) & 0xff, b(63) & 0xff, b(64) & 0xff) == ((0, 0, 255))) // (255,0,0) as BGR
    val back = MediaCodec.decodeBmp(b)
    assert(back.width == 2 && back.height == 2)
    assert(back.pixels.sameElements(r.pixels))
  }

  test("BMP roundtrips all widths across the padding boundary") {
    for (w <- 1 to 9; h <- Seq(1, 3)) {
      val px = Array.tabulate[Byte](w * h * 3)(i => ((i * 37 + 11) % 251).toByte)
      val back = MediaCodec.decodeBmp(MediaCodec.encodeBmp(Raster(w, h, px)))
      assert(back.width == w && back.height == h && back.pixels.sameElements(px),
        s"roundtrip failed at ${w}x$h")
    }
  }

  test("PNG roundtrips all widths; ≥5 rows exercises every filter incl. Paeth") {
    for (w <- 1 to 9; h <- Seq(1, 6)) {
      val px = Array.tabulate[Byte](w * h * 3)(i => ((i * 37 + 11) % 251).toByte)
      val back = MediaCodec.decodePng(MediaCodec.encodePng(Raster(w, h, px)))
      assert(back.width == w && back.height == h && back.pixels.sameElements(px),
        s"roundtrip failed at ${w}x$h")
    }
    // worst case for Average/Paeth rounding: extreme byte values adjacent
    val extremes = Array.tabulate[Byte](4 * 7 * 3)(i => (if (i % 2 == 0) 0 else 255).toByte)
    val back = MediaCodec.decodePng(MediaCodec.encodePng(Raster(4, 7, extremes)))
    assert(back.pixels.sameElements(extremes))
  }

  test("PNG is really compressed and decode skips ancillary chunks") {
    // constant raster: DEFLATE must beat the raw size by a wide margin
    val w = 64; val h = 32
    val flat = Array.fill[Byte](w * h * 3)(42)
    val png = MediaCodec.encodePng(Raster(w, h, flat))
    assert(png.length < w * h * 3 / 4, s"png not compressed: ${png.length} bytes")
    // splice a tEXt chunk (with a correct CRC) between IHDR and IDAT:
    // a conforming decoder must CRC-check and skip it
    val ihdrEnd = 8 + 12 + 13
    val data = "comment".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update("tEXt".getBytes("US-ASCII")); crc.update(data)
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put("tEXt".getBytes("US-ASCII")).put(data).putInt(crc.getValue.toInt)
    val spliced = png.take(ihdrEnd) ++ bb.array() ++ png.drop(ihdrEnd)
    assert(MediaCodec.decodePng(spliced).pixels.sameElements(flat))
  }

  test("PNG decode fuzz: arbitrary mutations fail as IllegalArgumentException, never anything else") {
    val good = MediaCodec.encodePng(Raster(6, 6, Array.tabulate[Byte](108)(i => (i * 31).toByte)))
    val rnd = new scala.util.Random(42)
    var rejected = 0
    for (_ <- 1 to 300) {
      val mutated = good.clone()
      for (_ <- 0 to rnd.nextInt(4)) mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      try { MediaCodec.decodePng(mutated); () }
      catch {
        case _: IllegalArgumentException => rejected += 1
        case e: Throwable => fail(s"non-contract failure ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    assert(rejected > 0, "CRC checks must catch most mutations")
    // pure garbage and truncations at every prefix length
    for (len <- 0 to 60) {
      try { MediaCodec.decodePng(Array.fill[Byte](len)(0x41)); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("BMP/PPM/WAV decode fuzz: mutations fail as IllegalArgumentException, never anything else") {
    val rnd = new scala.util.Random(7)
    val goods = Seq(
      MediaCodec.encodeBmp(Raster(5, 4, Array.tabulate[Byte](60)(i => (i * 17).toByte))),
      MediaCodec.encodePpm(Raster(4, 5, Array.tabulate[Byte](60)(i => (i * 13).toByte))),
      MediaCodec.encodeWav(MediaCodec.Clip(8000, Array.tabulate[Short](40)(i => (i * 321).toShort))))
    val decoders: Seq[Array[Byte] => Any] =
      Seq(MediaCodec.decodeBmp _, MediaCodec.decodePpm _, MediaCodec.decodeWav _)
    goods.zip(decoders).foreach { case (good, dec) =>
      for (_ <- 1 to 200) {
        val m = good.clone()
        for (_ <- 0 to rnd.nextInt(4)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        try { dec(m); () }
        catch {
          case _: IllegalArgumentException => ()
          case e: Throwable => fail(s"non-contract failure ${e.getClass.getName}: ${e.getMessage}")
        }
      }
      for (len <- 0 to 50) {
        try { dec(good.take(len)); () }
        catch {
          case _: IllegalArgumentException => ()
          case e: Throwable => fail(s"truncation len=$len: ${e.getClass.getName}")
        }
      }
    }
  }

  test("PNG decode rejects malformed input") {
    val good = MediaCodec.encodePng(Raster(3, 3, Array.tabulate[Byte](27)(_.toByte)))
    intercept[IllegalArgumentException](MediaCodec.decodePng(Array[Byte](1, 2, 3)))
    val badSig = good.clone(); badSig(0) = 'X'
    intercept[IllegalArgumentException](MediaCodec.decodePng(badSig))
    // flip one IDAT payload byte: the chunk CRC must catch it
    val corrupt = good.clone()
    corrupt(8 + 25 + 8 + 2) = (corrupt(8 + 25 + 8 + 2) ^ 0x40).toByte
    intercept[IllegalArgumentException](MediaCodec.decodePng(corrupt))
    intercept[IllegalArgumentException](MediaCodec.decodePng(good.dropRight(6))) // truncated
  }

  test("BMP decode rejects malformed input") {
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(Array[Byte](1, 2, 3)))
    val good = MediaCodec.encodeBmp(Raster(2, 2, new Array[Byte](12)))
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(good.take(40))) // truncated
    val badDepth = good.clone(); badDepth(28) = 8 // 8bpp
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(badDepth))
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(badMagic))
    // crafted width/height whose stride*height overflows Int must hit the
    // require (Long-domain bound), not ArrayIndexOutOfBounds
    val overflow = good.clone()
    def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(overflow, 18, 46341) // width: 46341*46341*... wraps Int
    putLe32(overflow, 22, 46341) // height
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(overflow))
    val hugeDim = good.clone()
    putLe32(hugeDim, 18, 1 << 20) // over the 65536 cap
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(hugeDim))
    // both axes AT the per-axis cap: the product 65536*65536*3 wraps Int —
    // the Long-domain footprint bound must reject it as IllegalArgument
    val capSquared = good.clone()
    putLe32(capSquared, 18, 65536)
    putLe32(capSquared, 22, 65536)
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(capSquared))
  }

  test("PNG/PPM dimension products that wrap Int fail as IllegalArgumentException") {
    // PNG: patch IHDR to 65536x65536 and fix the chunk CRC so the guard
    // (not the CRC check) is what rejects it
    val good = MediaCodec.encodePng(Raster(3, 3, Array.tabulate[Byte](27)(_.toByte)))
    val p = good.clone()
    def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = ((v >>> 24) & 0xff).toByte; b(off + 1) = ((v >>> 16) & 0xff).toByte
      b(off + 2) = ((v >>> 8) & 0xff).toByte; b(off + 3) = (v & 0xff).toByte
    }
    putBe32(p, 16, 65536) // IHDR width (sig 8 + len 4 + type 4)
    putBe32(p, 20, 65536) // IHDR height
    val crc = new java.util.zip.CRC32
    crc.update(p, 12, 4 + 13) // chunk type + IHDR payload
    putBe32(p, 12 + 4 + 13, crc.getValue.toInt)
    val e = intercept[IllegalArgumentException](MediaCodec.decodePng(p))
    assert(e.getMessage.contains("byte cap"))
    // PPM: header dims parse fine per-axis but the product wraps
    intercept[IllegalArgumentException](
      MediaCodec.decodePpm("P6\n46341 46341\n255\n".getBytes("US-ASCII")))
  }

  test("JPEG flat-MCU image decodes to the exact closed form (the q191 oracle law)") {
    // flat 16x16 MCUs: DC-only spectra -> every arithmetic step is integer
    // or dyadic, so the decoded RGB is exactly computable outside the codec
    val (w, h) = (48, 32)
    val mcX = w / 16
    val nMcu = mcX * (h / 16)
    def tb(i: Int): Int = 32 + (i * 37) % 95 // ASCII-ish synthetic "text"
    val yv = Array.tabulate(nMcu)(m => tb(m))
    val cbv = Array.tabulate(nMcu)(m => tb(m + 7))
    val crv = Array.tabulate(nMcu)(m => tb(m + 13))
    val yp = Array.tabulate(w * h) { i => yv(((i / w) / 16) * mcX + (i % w) / 16) }
    val cb = Array.tabulate((w / 2) * (h / 2)) { i => cbv(((i / (w / 2)) / 8) * mcX + (i % (w / 2)) / 8) }
    val cr = Array.tabulate((w / 2) * (h / 2)) { i => crv(((i / (w / 2)) / 8) * mcX + (i % (w / 2)) / 8) }
    val enc = MediaCodec.encodeJpegYcc(w, h, yp, cb, cr, quality = 50)
    val dec = MediaCodec.decodeJpeg(enc)
    assert(dec.width == w && dec.height == h)
    def clamp(v: Double): Int = math.max(0, math.min(255, math.floor(v).toInt))
    for (m <- 0 until nMcu) {
      // closed form: quantize DC with q0 (lum 16, chr 17), dequantize, /8, +128
      val yd = math.max(0, math.min(255, 2 * math.floor((yv(m) - 128) / 2.0 + 0.5).toInt + 128))
      val cbd = clamp(17.0 * math.floor(8 * (cbv(m) - 128) / 17.0 + 0.5) / 8 + 128 + 0.5)
      val crd = clamp(17.0 * math.floor(8 * (crv(m) - 128) / 17.0 + 0.5) / 8 + 128 + 0.5)
      val er = clamp(yd + 1.402 * (crd - 128) + 0.5)
      val eg = clamp(yd - 0.344136 * (cbd - 128) - 0.714136 * (crd - 128) + 0.5)
      val eb = clamp(yd + 1.772 * (cbd - 128) + 0.5)
      val px = ((m / mcX) * 16 * w + (m % mcX) * 16) * 3 // top-left pixel of the MCU
      assert(
        (dec.pixels(px) & 0xff, dec.pixels(px + 1) & 0xff, dec.pixels(px + 2) & 0xff)
          == ((er, eg, eb)),
        s"MCU $m: y=${yv(m)} cb=${cbv(m)} cr=${crv(m)}")
      // and the whole MCU is that constant color
      for (dy <- 0 until 16; dx <- 0 until 16) {
        val o = (((m / mcX) * 16 + dy) * w + (m % mcX) * 16 + dx) * 3
        assert((dec.pixels(o) & 0xff) == er && (dec.pixels(o + 1) & 0xff) == eg
          && (dec.pixels(o + 2) & 0xff) == eb)
      }
    }
  }

  test("JPEG lossy roundtrip on arbitrary pixels: dims exact, bounded error, odd sizes pad correctly") {
    for ((w, h, q) <- Seq((24, 16, 90), (17, 13, 90), (8, 8, 75), (33, 9, 95))) {
      val px = Array.tabulate[Byte](w * h * 3) { i =>
        // smooth gradient + texture: representative JPEG content
        val x = (i / 3) % w; val y = (i / 3) / w
        ((x * 5 + y * 3 + (i % 3) * 20 + (x * y % 7)) % 256).toByte
      }
      val dec = MediaCodec.decodeJpeg(MediaCodec.encodeJpeg(MediaCodec.Raster(w, h, px), q))
      assert(dec.width == w && dec.height == h, s"${w}x$h")
      val mae = px.indices.map(i => math.abs((px(i) & 0xff) - (dec.pixels(i) & 0xff))).sum.toDouble / px.length
      assert(mae < 12.0, f"${w}x$h q$q mean abs error $mae%.1f too high — DCT chain broken")
    }
  }

  test("grayscale JPEG: flat blocks exact; SOF sampling factors ignored for single-component scans") {
    val (w, h) = (24, 16)
    // flat 8x8 blocks: DC-only, exact closed form (lum q0 = 16 ⇒ /2 snap)
    val bxs = w / 8
    def tb(i: Int): Int = 40 + (i * 29) % 80
    val yp = Array.tabulate(w * h)(i => tb(((i / w) / 8) * bxs + (i % w) / 8))
    val enc = MediaCodec.encodeJpegGray(w, h, yp, quality = 50)
    val dec = MediaCodec.decodeJpeg(enc)
    assert(dec.width == w && dec.height == h)
    for (bi <- 0 until bxs * (h / 8)) {
      val expect = math.max(0, math.min(255, 2 * math.floor((tb(bi) - 128) / 2.0 + 0.5).toInt + 128))
      val o = ((bi / bxs) * 8 * w + (bi % bxs) * 8) * 3
      assert((dec.pixels(o) & 0xff) == expect && dec.pixels(o) == dec.pixels(o + 1)
        && dec.pixels(o + 1) == dec.pixels(o + 2), s"block $bi")
    }
    // T.81 A.2: a grayscale SOF may declare ANY sampling factors — the
    // single-component scan is non-interleaved regardless. Patch the SOF
    // to 2x2; the entropy stream is unchanged and must decode identically.
    val sofAt = {
      var i = 2
      while (!((enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    val patched = enc.clone()
    patched(sofAt + 11) = 0x22.toByte // component 1 sampling h=2, v=2
    val dec2 = MediaCodec.decodeJpeg(patched)
    assert(dec2.pixels.sameElements(dec.pixels), "sampling factors must not affect a 1-component scan")
  }

  test("JPEG restart markers: DRI/RSTn streams decode identically to unsegmented ones") {
    val (w, h) = (40, 24) // 15 blocks -> RST0..RST6 with interval 2
    val px = Array.tabulate(w * h)(i => (i * 13 + (i / w) * 7) % 256)
    val plain = MediaCodec.decodeJpeg(MediaCodec.encodeJpegGray(w, h, px, quality = 80))
    val restarted = MediaCodec.encodeJpegGray(w, h, px, quality = 80, restartInterval = 2)
    assert(restarted.containsSlice(Array(0xff.toByte, 0xd0.toByte)), "fixture must really emit RST0")
    val dec = MediaCodec.decodeJpeg(restarted)
    assert(dec.pixels.sameElements(plain.pixels), "restart segmentation must not change decoded pixels")
    // a dropped restart marker is a hard failure, not silent desync
    val idx = {
      var i = 2
      while (!((restarted(i) & 0xff) == 0xff && (restarted(i + 1) & 0xff) == 0xd0)) i += 1
      i
    }
    val broken = restarted.take(idx) ++ restarted.drop(idx + 2)
    intercept[IllegalArgumentException](MediaCodec.decodeJpeg(broken))
  }

  test("JPEG decode fuzz: mutations and truncations fail only as IllegalArgumentException") {
    val yp = Array.tabulate(32 * 16)(i => (i * 7) % 256)
    val cbcr = Array.tabulate(16 * 8)(i => (i * 11) % 256)
    val good = MediaCodec.encodeJpegYcc(32, 16, yp, cbcr, cbcr, quality = 50)
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 300) {
      val m = good.clone()
      for (_ <- 0 to rnd.nextInt(4)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      try { MediaCodec.decodeJpeg(m); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"non-contract failure ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    for (len <- 0 to 80) {
      try { MediaCodec.decodeJpeg(good.take(len)); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"truncation len=$len: ${e.getClass.getName}")
      }
    }
  }

  test("JPEG decode rejects malformed markers with named reasons") {
    val good = MediaCodec.encodeJpeg(MediaCodec.Raster(8, 8, Array.tabulate[Byte](192)(_.toByte)), 50)
    intercept[IllegalArgumentException](MediaCodec.decodeJpeg(Array[Byte](1, 2, 3)))
    val badMagic = good.clone(); badMagic(1) = 0x00
    intercept[IllegalArgumentException](MediaCodec.decodeJpeg(badMagic))
    intercept[IllegalArgumentException](MediaCodec.decodeJpeg(good.dropRight(2))) // no EOI
    // progressive SOF (0xC2 in place of 0xC0) must name the reason
    val sofAt = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    val prog = good.clone(); prog(sofAt + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](MediaCodec.decodeJpeg(prog))
    assert(e.getMessage.contains("progressive"))
    // dimension product overflow caught by the Long-domain cap
    val huge = good.clone()
    huge(sofAt + 5) = 0xff.toByte; huge(sofAt + 6) = 0xff.toByte // height 65535
    huge(sofAt + 7) = 0xff.toByte; huge(sofAt + 8) = 0xff.toByte // width 65535
    val e2 = intercept[IllegalArgumentException](MediaCodec.decodeJpeg(huge))
    assert(e2.getMessage.contains("byte cap"))
  }

  test("PPM roundtrips and parses multi-digit dimensions") {
    for ((w, h) <- Seq((1, 1), (13, 7), (120, 3))) {
      val px = Array.tabulate[Byte](w * h * 3)(i => ((i * 13 + 5) % 256).toByte)
      val enc = MediaCodec.encodePpm(Raster(w, h, px))
      assert(new String(enc.take(2), "US-ASCII") == "P6")
      val back = MediaCodec.decodePpm(enc)
      assert(back.width == w && back.height == h && back.pixels.sameElements(px))
    }
    intercept[IllegalArgumentException](MediaCodec.decodePpm("P3\n1 1\n255\n".getBytes))
  }

  test("WAV roundtrips samples and survives an extra RIFF chunk before data") {
    val samples = Array.tabulate[Short](100)(i => ((i - 50) * 300).toShort)
    val enc = MediaCodec.encodeWav(Clip(12000, samples))
    assert(enc.length == 44 + 200)
    val back = MediaCodec.decodeWav(enc)
    assert(back.sampleRate == 12000 && back.samples.sameElements(samples))
    // splice a LIST chunk between fmt and data: decoder must skip it
    val extra = new Array[Byte](12) // id(4) + size(4) + 4 payload bytes
    extra(0) = 'L'; extra(1) = 'I'; extra(2) = 'S'; extra(3) = 'T'; extra(4) = 4
    val spliced = enc.take(36) ++ extra ++ enc.drop(36)
    // fix RIFF size field (bytes 4..7, LE): + 12
    val riffSize = 36 + 200 + 12
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    val back2 = MediaCodec.decodeWav(spliced)
    assert(back2.sampleRate == 12000 && back2.samples.sameElements(samples))
    intercept[IllegalArgumentException](MediaCodec.decodeWav(enc.take(20)))
  }

  test("downsample picks top-left pixels with real geometry") {
    // 4x2 image, pixel value = 10*row + col in the R channel
    val px = new Array[Byte](4 * 2 * 3)
    for (y <- 0 until 2; x <- 0 until 4) px((y * 4 + x) * 3) = (10 * y + x).toByte
    val small = MediaCodec.downsample(Raster(4, 2, px), 2)
    assert(small.width == 2 && small.height == 1)
    assert(small.pixels(0) == 0) // (0,0)
    assert(small.pixels(3) == 2) // (0,2)
  }

  // ---- Spark pipeline tests -------------------------------------------

  test("BMP features: decoded dimensions match the synthesis closed form") {
    val out = Multimodal.featureQuery(spark, sf)
    assert(
      out.columns.toSeq == Seq("doc_id", "media_type", "byte_len", "checksum", "width", "height"))
    val rows = out.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "image/bmp")
      val w = r.getLong(4)
      val h = r.getLong(5)
      assert(w == 8 + id % 24 && h >= 8 && h < 24)
      assert(r.getLong(2) == 54L + ((3 * w + 3) / 4 * 4) * h) // header + padded rows
      assert(r.getLong(3) > 0) // pixel checksum
    }
    // deterministic: second run identical
    assert(rows.sameElements(Multimodal.featureQuery(spark, sf).collect()))
  }

  test("resize roundtrip: re-decoded dimensions are halved, checksum matches direct downsample") {
    val media = Multimodal.asBmpMedia(graft.core.Tables.documents(spark, sf))
    val out = Multimodal.resizeMedia(media, factor = 2).collect()
    assert(out.length == 500)
    out.foreach { r =>
      assert(r.new_w == math.max(1, r.width / 2) && r.new_h == math.max(1, r.height / 2))
      assert(r.resized_len == MediaCodec.bmpSize(r.new_w.toInt, r.new_h.toInt))
      assert(r.resized_checksum >= 0)
    }
  }

  test("WAV features: duration and loudness come from real decoded samples") {
    val out = Multimodal.wavFeatureQuery(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      val rate = r.getLong(3)
      val n = r.getLong(4)
      assert(rate == 8000 + 4000 * (id % 3))
      assert(r.getLong(2) == 44 + 2 * n) // byte_len
      assert(r.getLong(5) == n * 1000 / rate) // duration_ms
      assert(r.getLong(6) <= 16384 && r.getLong(6) > 0) // peak bounded by synthesis
      assert(r.getLong(7) >= r.getLong(6)) // loudness >= peak
    }
  }

  test("PPM features agree with BMP checksum formula where dims coincide") {
    val out = Multimodal.ppmFeatureQuery(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val w = r.getLong(4)
      val h = r.getLong(5)
      assert(w >= 4 && w < 17 && h >= 4 && h < 15)
      assert(r.getLong(2) == 9 + w.toString.length + h.toString.length + 3 * w * h)
    }
  }

  test("frame sampling keeps every Nth chunk with correct lengths") {
    val media = Multimodal.asMedia(graft.core.Tables.documents(spark, sf))
    val frames = Multimodal.sampleFrames(media, chunkSize = 64, everyN = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    assert(frames.forall(f => f.frame_len > 0 && f.frame_len <= 64))
    // coverage: every doc with a payload contributes frame 0
    val docsWithFrames = frames.map(_.doc_id).distinct.length
    assert(docsWithFrames == 500)
    assert(frames.count(_.frame_idx == 0) == 500)
  }

  test("binaryFile ingestion: raw media files flow into the decode pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toFile
    try {
      // 5 real BMPs with known dimensions + 2 WAVs the glob must skip
      val dims = Seq((3, 2), (4, 4), (5, 3), (2, 7), (8, 1))
      dims.zipWithIndex.foreach { case ((w, h), i) =>
        val px = Array.tabulate[Byte](w * h * 3)(j => ((i + j) % 251).toByte)
        java.nio.file.Files.write(
          new java.io.File(dir, s"img_$i.bmp").toPath,
          MediaCodec.encodeBmp(Raster(w, h, px)))
      }
      (0 until 2).foreach { i =>
        java.nio.file.Files.write(
          new java.io.File(dir, s"clip_$i.wav").toPath,
          MediaCodec.encodeWav(Clip(8000, Array[Short](1, 2, 3))))
      }
      val files = graft.sources.Sources.readBinaryFiles(spark, dir.getAbsolutePath, "*.bmp")
      assert(files.count() == 5, "glob must select only the BMPs at listing time")
      // length predicate reaches the binaryFile scan (pushed, not residual-only)
      val filtered = graft.sources.Sources
        .readBinaryFiles(spark, dir.getAbsolutePath, "*.bmp", maxBytes = 1000000L)
      val scan = filtered.queryExecution.executedPlan.toString
      assert(scan.contains("PushedFilters") && scan.contains("LessThanOrEqual(length"), scan)
      val feats = Multimodal
        .imageFeatures(Multimodal.fromBinaryFiles(files))
        .collect()
        .map(f => f.doc_id -> f)
        .toMap
      dims.zipWithIndex.foreach { case ((w, h), i) =>
        val f = feats(i.toLong)
        assert(f.media_type == "image/bmp")
        assert(f.width == w && f.height == h, s"img_$i decoded ${f.width}x${f.height}, wrote ${w}x$h")
        assert(f.byte_len == MediaCodec.bmpSize(w, h))
      }
    } finally {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }

  test("image aHash: uniform raster hashes to zero, half-contrast sets exactly the bright half") {
    import spark.implicits._
    def media(id: Long, px: Array[Byte], w: Int, h: Int) =
      Seq(Multimodal.MediaRow(id, "image/bmp", MediaCodec.encodeBmp(Raster(w, h, px)))).toDS()
    // uniform: every cell equals the average, the strict > never fires
    val flat = Array.fill(16 * 16 * 3)(100.toByte)
    val h0 = Multimodal.imageAHash(media(1, flat, 16, 16)).collect().head
    assert(h0.ahash_lo == 0L && h0.ahash_hi == 0L)
    // left half black, right half white: exactly the right-half grid
    // columns (gx >= 4 → x >= w/2) beat the mean in every row
    val split = Array.tabulate(16 * 16 * 3) { i =>
      val x = (i / 3) % 16
      if (x < 8) 0.toByte else 255.toByte
    }
    val h1 = Multimodal.imageAHash(media(2, split, 16, 16)).collect().head
    val expectRow = (4 until 8).map(gx => 1L << gx).sum // bits 4..7 per row
    val expectLo = (0 until 4).map(gy => expectRow << (8 * gy)).reduce(_ | _)
    assert(h1.ahash_lo == expectLo && h1.ahash_hi == expectLo,
      s"got ${h1.ahash_lo.toBinaryString}/${h1.ahash_hi.toBinaryString}")
    // identical rasters collide — the dedup blocking law
    val h2 = Multimodal.imageAHash(media(3, split.clone(), 16, 16)).collect().head
    assert((h2.ahash_lo, h2.ahash_hi) == ((h1.ahash_lo, h1.ahash_hi)))
  }
}
