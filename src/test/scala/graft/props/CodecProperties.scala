package graft.props

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.multimodal.MediaCodec
import graft.multimodal.MediaCodec.{Clip, Raster}

/** Property tests for the pure-JVM media codecs: encode∘decode = identity
  * over arbitrary dimensions and contents (no Spark involvement — these
  * are plain byte-level laws, so the generator budget can be high).
  */
object CodecProperties extends Properties("graft.multimodal.MediaCodec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val genRaster: Gen[Raster] = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 25)
    seed <- Gen.choose(Int.MinValue, Int.MaxValue)
  } yield {
    // deterministic pseudo-random pixels from the seed (no RNG state leaks
    // between shrink attempts)
    val px = new Array[Byte](w * h * 3)
    var x = seed
    var i = 0
    while (i < px.length) {
      x = x * 1103515245 + 12345
      px(i) = (x >>> 16).toByte
      i += 1
    }
    Raster(w, h, px)
  }

  private val genClip: Gen[Clip] = for {
    rate <- Gen.oneOf(8000, 12000, 16000, 44100)
    n <- Gen.choose(0, 500)
    seed <- Gen.choose(Int.MinValue, Int.MaxValue)
  } yield {
    val samples = new Array[Short](n)
    var x = seed
    var i = 0
    while (i < n) {
      x = x * 1103515245 + 12345
      samples(i) = (x >>> 13).toShort
      i += 1
    }
    Clip(rate, samples)
  }

  property("BMP roundtrip is identity for any dimensions (padding included)") =
    forAll(genRaster) { r =>
      val back = MediaCodec.decodeBmp(MediaCodec.encodeBmp(r))
      Prop(back.width == r.width && back.height == r.height &&
        back.pixels.sameElements(r.pixels))
    }

  property("BMP size formula matches the encoder") = forAll(genRaster) { r =>
    Prop(MediaCodec.encodeBmp(r).length == MediaCodec.bmpSize(r.width, r.height))
  }

  property("PPM roundtrip is identity") = forAll(genRaster) { r =>
    val back = MediaCodec.decodePpm(MediaCodec.encodePpm(r))
    Prop(back.width == r.width && back.height == r.height &&
      back.pixels.sameElements(r.pixels))
  }

  property("WAV roundtrip preserves rate and samples (incl. negative)") =
    forAll(genClip) { c =>
      val back = MediaCodec.decodeWav(MediaCodec.encodeWav(c))
      Prop(back.sampleRate == c.sampleRate && back.samples.sameElements(c.samples))
    }

  property("downsample geometry: dims divide by factor, pixels come from grid points") =
    forAll(genRaster, Gen.choose(1, 4)) { (r, f) =>
      val s = MediaCodec.downsample(r, f)
      val dimsOk = s.width == math.max(1, r.width / f) && s.height == math.max(1, r.height / f)
      // every resized pixel equals the original at (f*row, f*col)
      val pixOk = (0 until s.height).forall { y =>
        (0 until s.width).forall { x =>
          (0 until 3).forall { ch =>
            s.pixels((y * s.width + x) * 3 + ch) ==
              r.pixels(((y * f) * r.width + (x * f)) * 3 + ch)
          }
        }
      }
      Prop(dimsOk && pixOk)
    }
}
