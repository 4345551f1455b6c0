package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class MediaCodecSpec extends AnyFunSuite {

  test("BMP round-trip: header fields and exact channel means") {
    // 3x2 image, known pixels
    val px = Array(
      Array((255, 0, 0), (0, 255, 0), (0, 0, 255)),
      Array((10, 20, 30), (40, 50, 60), (70, 80, 90)))
    val stats = MediaCodec.decodeBmp(MediaCodec.encodeBmp(px)).get
    assert(stats.width == 3 && stats.height == 2 && stats.channels == 3)
    assert(math.abs(stats.meanR - (255 + 10 + 40 + 70) / 6.0 / 255.0) < 1e-12)
    assert(math.abs(stats.meanG - (255 + 20 + 50 + 80) / 6.0 / 255.0) < 1e-12)
    assert(math.abs(stats.meanB - (255 + 30 + 60 + 90) / 6.0 / 255.0) < 1e-12)
  }

  test("BMP: row padding handled (width not a multiple of 4)") {
    // width 3 → 9 data bytes padded to 12 per row; wrong accounting
    // would shift every row after the first
    val px = Array.tabulate(5, 3)((y, x) => (y * 40 + x, 0, 0))
    val stats = MediaCodec.decodeBmp(MediaCodec.encodeBmp(px)).get
    val want = (0 until 5).flatMap(y => (0 until 3).map(x => y * 40 + x))
      .sum / 15.0 / 255.0
    assert(math.abs(stats.meanR - want) < 1e-12)
    assert(stats.meanG == 0.0 && stats.meanB == 0.0)
  }

  test("PPM round-trip incl. comment handling") {
    val px = Array.tabulate(2, 4)((y, x) => (x * 60, y * 100, 128))
    val enc = MediaCodec.encodePpm(px)
    val stats = MediaCodec.decodePpm(enc).get
    assert(stats.width == 4 && stats.height == 2)
    assert(math.abs(stats.meanB - 128.0 / 255.0) < 1e-12)
    // header comments are legal PPM
    val withComment = ("P6\n# a comment\n4 2\n255\n").getBytes("US-ASCII") ++
      enc.drop("P6\n4 2\n255\n".length)
    assert(MediaCodec.decodePpm(withComment).contains(stats))
  }

  test("WAV round-trip: rate, frames, rms, peak, zero crossings") {
    // alternating +/-8192 square wave: rms = peak = 0.25, crossing
    // at every step
    val samples = Array.tabulate[Short](100)(i =>
      if (i % 2 == 0) 8192 else -8192)
    val stats = MediaCodec.decodeWav(MediaCodec.encodeWav(samples, 8000)).get
    assert(stats.sampleRate == 8000 && stats.channels == 1)
    assert(stats.nFrames == 100)
    assert(math.abs(stats.rms - 0.25) < 1e-9)
    assert(math.abs(stats.peak - 0.25) < 1e-9)
    assert(math.abs(stats.zeroCrossRate - 1.0) < 1e-9)
    assert(math.abs(stats.durationSec - 100.0 / 8000) < 1e-12)
  }

  test("WAV: stereo block align and extra chunks") {
    val samples = Array.tabulate[Short](64)(i => (i * 100).toShort)
    val mono = MediaCodec.encodeWav(samples, 44100, channels = 2)
    val stats = MediaCodec.decodeWav(mono).get
    assert(stats.channels == 2 && stats.nFrames == 32)
  }

  test("malformed inputs decode to Undecodable, never throw") {
    val cases = Seq(
      Array.empty[Byte],
      "BM".getBytes, // truncated BMP
      "P6\n-3 2\n255\n".getBytes, // negative width
      "RIFFxxxxWAVE".getBytes, // no chunks
      MediaCodec.encodeWav(Array[Short](1, 2, 3), 8000).take(46), // cut data
      Array.tabulate[Byte](128)(i => (i * 37).toByte))
    cases.foreach { b =>
      assert(MediaCodec.decode(b) match {
        case MediaCodec.Undecodable => true
        case _ => false
      })
    }
  }

  test("decode dispatches by magic: BMP, PPM, WAV, PNG, JPEG recognized") {
    val px = Array.tabulate(2, 2)((y, x) => (x, y, 0))
    assert(MediaCodec.decode(MediaCodec.encodeBmp(px))
      .isInstanceOf[MediaCodec.DecodedImage])
    assert(MediaCodec.decode(MediaCodec.encodePpm(px))
      .isInstanceOf[MediaCodec.DecodedImage])
    assert(MediaCodec.decode(MediaCodec.encodeWav(Array[Short](0, 1), 8000))
      .isInstanceOf[MediaCodec.DecodedAudio])
    assert(MediaCodec.decode(MediaCodec.encodePng(px))
      .isInstanceOf[MediaCodec.DecodedImage])
    assert(MediaCodec.decode(MediaCodec.encodeJpeg(px))
      .isInstanceOf[MediaCodec.DecodedImage])
  }

  test("PNG is lossless: decoded means equal the PPM means bit-for-bit") {
    val px = Array.tabulate(7, 5)((y, x) =>
      ((y * 31 + x * 7) % 256, (x * 17) % 256, (y * 11) % 256))
    val png = MediaCodec.decodeImageIo(MediaCodec.encodePng(px)).get
    val ppm = MediaCodec.decodePpm(MediaCodec.encodePpm(px)).get
    assert(png == ppm) // exact: same pixels, same row-major double fold
  }

  test("JPEG decodes for real: lossy, means near the source") {
    // a flat-ish image keeps JPEG error small
    val px = Array.tabulate(16, 16)((y, x) => (120 + (x + y) % 8, 64, 200))
    val stats = MediaCodec.decodeImageIo(MediaCodec.encodeJpeg(px)).get
    assert(stats.width == 16 && stats.height == 16)
    val wantR = px.flatten.map(_._1).sum / 256.0 / 255.0
    assert(math.abs(stats.meanR - wantR) < 0.05)
    assert(math.abs(stats.meanG - 64 / 255.0) < 0.05)
    assert(math.abs(stats.meanB - 200 / 255.0) < 0.05)
  }

  test("decodePixels: identical logical pixels across BMP/PPM/PNG") {
    val px = Array.tabulate(5, 7)((y, x) =>
      ((y * 40 + x) % 256, (x * 30) % 256, (y * 20) % 256))
    val want = px.flatten.map { case (r, g, b) => (r << 16) | (g << 8) | b }
    for (enc <- Seq(MediaCodec.encodeBmp(px), MediaCodec.encodePpm(px),
      MediaCodec.encodePng(px))) {
      val (w, h, got) = MediaCodec.decodePixels(enc).get
      assert(w == 7 && h == 5)
      assert(got.toSeq == want.toSeq) // BMP bottom-up storage unwound
    }
  }

  test("resizeNearest: integer NN mapping, lossless PPM out") {
    val px = Array.tabulate(4, 6)((y, x) => (y * 50 + x, 0, 0))
    val resized = MediaCodec.resizeNearest(MediaCodec.encodeBmp(px), 3, 2).get
    val (w, h, got) = MediaCodec.decodePixels(resized).get
    assert(w == 3 && h == 2)
    // dest (y,x) <- src (y*4/2, x*6/3) = (2y, 2x)
    val want = for (y <- 0 until 2; x <- 0 until 3)
      yield ((2 * y * 50 + 2 * x) << 16)
    assert(got.toSeq == want)
    assert(MediaCodec.resizeNearest("not an image".getBytes, 2, 2).isEmpty)
  }

  test("AIFF via javax.sound matches the WAV decoder on identical PCM") {
    val samples = Array.tabulate[Short](400)(j =>
      (((j * 997) % 2048 - 1024) * 16).toShort)
    val wav = MediaCodec.decodeWav(MediaCodec.encodeWav(samples, 8000)).get
    val aiff = MediaCodec.decodeAudioSystem(
      MediaCodec.encodeAiff(samples, 8000)).get
    assert(aiff == wav) // same PCM, same sequential fold — bit-equal
    assert(MediaCodec.decode(MediaCodec.encodeAiff(samples, 8000))
      .isInstanceOf[MediaCodec.DecodedAudio])
  }

  test("corrupt PNG/JPEG bytes decode to None/Undecodable, never throw") {
    val junkPng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2)
    assert(MediaCodec.decodeImageIo(junkPng).isEmpty)
    assert(MediaCodec.decode(junkPng) == MediaCodec.Undecodable)
    val junkJpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0, 1)
    assert(MediaCodec.decode(junkJpeg) == MediaCodec.Undecodable)
  }

  test("imageHash: aHash/dHash are format-invariant, edit-local, and " +
      "total on garbage") {
    val px = Array.tabulate(12, 16)((y, x) =>
      ((y * 16 + x) % 256, (x * 7) % 256, (y * 11) % 256))
    val bmp = MediaCodec.encodeBmp(px)
    val ppm = MediaCodec.encodePpm(px)
    val png = MediaCodec.encodePng(px)
    // lossless containers of the same pixels hash identically
    val h = MediaCodec.imageHash(bmp).get
    assert(MediaCodec.imageHash(ppm).get == h)
    assert(MediaCodec.imageHash(png).get == h)
    val hd = MediaCodec.imageHash(bmp, dHash = true).get
    assert(MediaCodec.imageHash(ppm, dHash = true).get == hd)
    // a one-pixel edit moves the hash at most a few bits
    val edited = px.map(_.clone())
    edited(3)(5) = (255, 255, 255)
    val he = MediaCodec.imageHash(MediaCodec.encodePpm(edited)).get
    assert(java.lang.Long.bitCount(h ^ he) <= 6,
      s"one-pixel edit moved ${java.lang.Long.bitCount(h ^ he)} bits")
    // an unrelated image is far away
    val other = Array.tabulate(12, 16)((y, x) =>
      (255 - (y * 16 + x) % 256, (x * 31) % 256, (y * 3) % 256))
    val ho = MediaCodec.imageHash(MediaCodec.encodePpm(other)).get
    assert(java.lang.Long.bitCount(h ^ ho) > 6)
    // total on garbage
    assert(MediaCodec.imageHash("not an image".getBytes).isEmpty)
    assert(MediaCodec.imageHash(null).isEmpty)
  }

}
