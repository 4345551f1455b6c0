package graft.pipeline

/** Pure-JVM decoders for media containers: BMP and binary PPM (P6)
  * images, PCM WAV audio, and YUV4MPEG2 (y4m) video are parsed from
  * their specs directly; PNG, JPEG, and GIF decode through the JDK's
  * built-in ImageIO codecs, and AIFF/AU through javax.sound
  * (java.desktop — still no external library). Only formats whose
  * codecs the JDK does not ship (MP3, MP4/H.264) fall back to the
  * documented stub in [[Multimodal]].
  *
  * All parsers are total: malformed input returns None, never throws —
  * a distributed media scan must not die on one corrupt blob.
  */
object MediaCodec {

  final case class ImageStats(width: Int, height: Int, channels: Int,
                              meanR: Double, meanG: Double, meanB: Double) {
    def brightness: Double = (meanR + meanG + meanB) / 3.0
  }

  final case class AudioStats(sampleRate: Int, channels: Int, nFrames: Long,
                              rms: Double, peak: Double, zeroCrossRate: Double) {
    def durationSec: Double =
      if (sampleRate == 0) 0.0 else nFrames.toDouble / sampleRate
  }

  final case class VideoStats(width: Int, height: Int, fpsNum: Int,
                              fpsDen: Int, nFrames: Long, sampledFrames: Int,
                              lumaMean: Double, lumaStd: Double) {
    def fps: Double = if (fpsDen == 0) 0.0 else fpsNum.toDouble / fpsDen
  }

  sealed trait Decoded
  final case class DecodedImage(stats: ImageStats) extends Decoded
  final case class DecodedAudio(stats: AudioStats) extends Decoded
  final case class DecodedVideo(stats: VideoStats) extends Decoded
  case object Undecodable extends Decoded

  def decode(bytes: Array[Byte]): Decoded = {
    if (bytes == null || bytes.length < 4) Undecodable
    else if (bytes(0) == 'B' && bytes(1) == 'M')
      decodeBmp(bytes).map(DecodedImage).getOrElse(Undecodable)
    else if (bytes(0) == 'P' && bytes(1) == '6')
      decodePpm(bytes).map(DecodedImage).getOrElse(Undecodable)
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F')
      decodeWav(bytes).map(DecodedAudio).getOrElse(Undecodable)
    else if (bytes.length >= 9 &&
      new String(bytes, 0, 9, "US-ASCII") == "YUV4MPEG2")
      decodeY4m(bytes).map(DecodedVideo).getOrElse(Undecodable)
    else if ((bytes.length >= 12 && bytes(0) == 'F' && bytes(1) == 'O' &&
      bytes(2) == 'R' && bytes(3) == 'M' && bytes(8) == 'A' &&
      bytes(9) == 'I' && bytes(10) == 'F') || // AIFF / AIFC
      (bytes(0) == '.' && bytes(1) == 's' && bytes(2) == 'n' &&
        bytes(3) == 'd')) // AU
      decodeAudioSystem(bytes).map(DecodedAudio).getOrElse(Undecodable)
    else if ((bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G') || // PNG
      (bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte &&
        bytes(2) == 0xff.toByte) || // JPEG
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == '8')) // GIF
      decodeImageIo(bytes).map(DecodedImage).getOrElse(Undecodable)
    else Undecodable
  }

  // ------------------------------------------------------------ BMP --
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Uncompressed 24/32-bit BITMAPINFOHEADER BMP. Rows are bottom-up
    * unless height is negative; 24-bit rows pad to 4-byte multiples;
    * pixels are stored BGR(A).
    */
  def decodeBmp(b: Array[Byte]): Option[ImageStats] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOffset = le32(b, 10)
    val headerSize = le32(b, 14)
    if (headerSize < 40) return None
    val width = le32(b, 18)
    val rawHeight = le32(b, 22)
    val height = math.abs(rawHeight)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (width <= 0 || height == 0 || compression != 0 ||
      (bpp != 24 && bpp != 32)) return None
    val bytesPerPx = bpp / 8
    val rowSize = ((width * bytesPerPx + 3) / 4) * 4
    if (dataOffset.toLong + rowSize.toLong * height > b.length) return None
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    var y = 0
    while (y < height) {
      var x = 0
      val row = dataOffset + y * rowSize
      while (x < width) {
        val p = row + x * bytesPerPx
        sb += (b(p) & 0xff)
        sg += (b(p + 1) & 0xff)
        sr += (b(p + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    val n = width.toDouble * height
    Some(ImageStats(width, height, 3, sr / n / 255.0, sg / n / 255.0,
      sb / n / 255.0))
  }

  /** Minimal BMP writer (24-bit, bottom-up) for tests and synthetic
    * corpora. `pixels(y)(x)` = (r, g, b) with row 0 at the top.
    */
  def encodeBmp(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val height = pixels.length
    val width = if (height == 0) 0 else pixels(0).length
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    def putLe32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, out.length); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, width); putLe32(22, height)
    out(26) = 1; out(28) = 24
    putLe32(34, dataSize)
    var y = 0
    while (y < height) {
      var x = 0
      val row = 54 + (height - 1 - y) * rowSize // bottom-up storage
      while (x < width) {
        val (r, g, b) = pixels(y)(x)
        out(row + x * 3) = b.toByte
        out(row + x * 3 + 1) = g.toByte
        out(row + x * 3 + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------ PPM --
  /** Binary PPM (P6): ASCII header `P6 <w> <h> <maxval>` with
    * `#` comments, one whitespace, then RGB triplets.
    */
  def decodePpm(b: Array[Byte]): Option[ImageStats] = {
    var pos = 0
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < b.length) {
        val c = b(pos).toChar
        if (c.isWhitespace) pos += 1
        else if (c == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else go = false
      }
    }
    def token(): Option[String] = {
      skipWsAndComments()
      val start = pos
      while (pos < b.length && !b(pos).toChar.isWhitespace) pos += 1
      if (pos > start) Some(new String(b, start, pos - start, "US-ASCII"))
      else None
    }
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    pos = 2
    val hdr = for {
      w <- token().flatMap(_.toIntOption)
      h <- token().flatMap(_.toIntOption)
      mx <- token().flatMap(_.toIntOption)
    } yield (w, h, mx)
    hdr match {
      case Some((w, h, mx)) if w > 0 && h > 0 && mx > 0 && mx < 65536 =>
        pos += 1 // the single whitespace after maxval
        if (mx >= 256 || pos.toLong + 3L * w * h > b.length) None
        else {
          var (sr, sg, sb) = (0.0, 0.0, 0.0)
          var i = pos
          val end = pos + 3 * w * h
          while (i < end) {
            sr += (b(i) & 0xff); sg += (b(i + 1) & 0xff); sb += (b(i + 2) & 0xff)
            i += 3
          }
          val n = w.toDouble * h
          Some(ImageStats(w, h, 3, sr / n / mx, sg / n / mx, sb / n / mx))
        }
      case _ => None
    }
  }

  def encodePpm(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val height = pixels.length
    val width = if (height == 0) 0 else pixels(0).length
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    for (row <- pixels; (r, g, b) <- row) {
      out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
      i += 3
    }
    out
  }

  // ------------------------------------------------- pixels & resize --
  /** Full RGB pixel decode (logical row-major, packed 0xRRGGBB) for
    * every image container [[decode]] understands — the access layer
    * under resize/thumbnail ops. BMP unwinds its bottom-up storage;
    * PPM reads triplets directly; PNG/JPEG/GIF go through ImageIO.
    */
  def decodePixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b == null || b.length < 4) return None
    if (b(0) == 'B' && b(1) == 'M') {
      if (b.length < 54) return None
      val dataOffset = le32(b, 10)
      val width = le32(b, 18)
      val rawHeight = le32(b, 22)
      val height = math.abs(rawHeight)
      val bpp = le16(b, 28)
      if (width <= 0 || height == 0 || le32(b, 30) != 0 ||
        (bpp != 24 && bpp != 32)) return None
      val bytesPerPx = bpp / 8
      val rowSize = ((width * bytesPerPx + 3) / 4) * 4
      if (dataOffset.toLong + rowSize.toLong * height > b.length) return None
      val out = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val srcRow = if (rawHeight > 0) height - 1 - y else y // bottom-up
        val row = dataOffset + srcRow * rowSize
        var x = 0
        while (x < width) {
          val p = row + x * bytesPerPx
          out(y * width + x) = ((b(p + 2) & 0xff) << 16) |
            ((b(p + 1) & 0xff) << 8) | (b(p) & 0xff)
          x += 1
        }
        y += 1
      }
      Some((width, height, out))
    } else if (b(0) == 'P' && b(1) == '6') {
      // reuse the stats parser's header walk by re-parsing the header
      var pos = 2
      def skipWs(): Unit = {
        var go = true
        while (go && pos < b.length) {
          val c = b(pos).toChar
          if (c.isWhitespace) pos += 1
          else if (c == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
          else go = false
        }
      }
      def tok(): Option[Int] = {
        skipWs()
        val s = pos
        while (pos < b.length && !b(pos).toChar.isWhitespace) pos += 1
        if (pos > s) new String(b, s, pos - s, "US-ASCII").toIntOption else None
      }
      (tok(), tok(), tok()) match {
        case (Some(w), Some(h), Some(mx))
          if w > 0 && h > 0 && mx > 0 && mx < 256 =>
          pos += 1
          if (pos.toLong + 3L * w * h > b.length) None
          else {
            val out = new Array[Int](w * h)
            var i = 0
            while (i < w * h) {
              val p = pos + i * 3
              out(i) = ((b(p) & 0xff) << 16) | ((b(p + 1) & 0xff) << 8) |
                (b(p + 2) & 0xff)
              i += 1
            }
            Some((w, h, out))
          }
        case _ => None
      }
    } else {
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Int](w * h)
          img.getRGB(0, 0, w, h, out, 0, w)
          var i = 0
          while (i < out.length) { out(i) &= 0xffffff; i += 1 }
          Some((w, h, out))
        }
      } catch { case _: Exception => None }
    }
  }

  /** Nearest-neighbor resize to (dw × dh), re-encoded as lossless PPM
    * so downstream decode/featurize stays bit-predictable. Source
    * pixel for dest (y, x) is (⌊y·sh/dh⌋, ⌊x·sw/dw⌋) — the standard
    * integer NN mapping, reproducible in any engine.
    */
  def resizeNearest(b: Array[Byte], dw: Int, dh: Int): Option[Array[Byte]] =
    decodePixels(b).map { case (sw, sh, px) =>
      val out = Array.tabulate(dh, dw) { (y, x) =>
        val p = px((y * sh / dh) * sw + (x * sw / dw))
        ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      }
      encodePpm(out)
    }

  // ------------------------------------------- perceptual hashing --
  /** 64-bit perceptual image hash — aHash (average hash) or dHash
    * (difference hash), the standard public near-dup fingerprints for
    * images: downsample the luma plane to a tiny grid with the SAME
    * integer nearest-neighbor mapping as [[resizeNearest]], then
    * threshold. Near-identical images (recompressions, small edits,
    * resizes) land within a few Hamming bits of each other, which is
    * what makes banded Hamming blocking work
    * ([[Multimodal.imageNearDupPairs]]).
    *
    * Every step is integer arithmetic, so any engine replays the hash
    * bit-for-bit:
    *  - grid sample: src = (y·sh/gh, x·sw/gw) (integer floor);
    *  - luma = (299·r + 587·g + 114·b) / 1000 (BT.601 in integer);
    *  - aHash bit (y·8+x) set iff luma·64 ≥ Σ lumas (the exact
    *    integer form of "above the mean");
    *  - dHash samples a 9×8 grid, bit (y·8+x) set iff the right
    *    neighbor is strictly brighter.
    *
    * None for undecodable bytes (the total-parser contract).
    */
  def imageHash(b: Array[Byte], dHash: Boolean = false): Option[Long] =
    decodePixels(b).map { case (sw, sh, px) =>
      val gw = if (dHash) 9 else 8
      val gh = 8
      val luma = new Array[Int](gw * gh)
      var y = 0
      while (y < gh) {
        var x = 0
        while (x < gw) {
          val p = px((y * sh / gh) * sw + (x * sw / gw))
          val r = (p >> 16) & 0xff
          val g = (p >> 8) & 0xff
          val bl = p & 0xff
          luma(y * gw + x) = (299 * r + 587 * g + 114 * bl) / 1000
          x += 1
        }
        y += 1
      }
      var hash = 0L
      if (dHash) {
        var i = 0
        while (i < 64) {
          val yy = i / 8
          val xx = i % 8
          if (luma(yy * gw + xx + 1) > luma(yy * gw + xx))
            hash |= 1L << i
          i += 1
        }
      } else {
        var sum = 0L
        var i = 0
        while (i < 64) { sum += luma(i); i += 1 }
        var j = 0
        while (j < 64) {
          if (luma(j).toLong * 64L >= sum) hash |= 1L << j
          j += 1
        }
      }
      hash
    }

  /** [[imageHash]] with a Java-friendly signature for generated code
    * (Janino has no Scala Option): null = undecodable.
    */
  def imageHashBoxed(b: Array[Byte], dHash: Boolean): java.lang.Long =
    imageHash(b, dHash) match {
      case Some(h) => java.lang.Long.valueOf(h)
      case None => null
    }

  /** Raw 16-bit PCM sample sequence of a WAV container (the
    * [[decodeWav]] header walk, payload returned instead of folded);
    * None for anything that isn't plain 16-bit PCM WAV.
    */
  def wavSamples(b: Array[Byte]): Option[Array[Short]] = {
    if (b == null || b.length < 44 || b(0) != 'R' || b(1) != 'I' ||
      b(2) != 'F' || b(3) != 'F' || b(8) != 'W' || b(9) != 'A' ||
      b(10) != 'V' || b(11) != 'E') return None
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var blockAlign = 0
    var dataOff = -1
    var dataLen = 0
    while (pos + 8 <= b.length && (dataOff < 0 || sampleRate == 0)) {
      val id = new String(b, pos, 4, "US-ASCII")
      val size = le32(b, pos + 4)
      if (size < 0 || pos + 8 + size.toLong > b.length) return None
      id match {
        case "fmt " if size >= 16 =>
          if (le16(b, pos + 8) != 1) return None // PCM only
          channels = le16(b, pos + 10)
          sampleRate = le32(b, pos + 12)
          blockAlign = le16(b, pos + 20)
          bits = le16(b, pos + 22)
        case "data" =>
          dataOff = pos + 8
          dataLen = size
        case _ => ()
      }
      pos += 8 + size + (size & 1)
    }
    if (dataOff < 0 || sampleRate <= 0 || channels <= 0 || bits != 16 ||
      blockAlign != channels * 2) return None
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = le16(b, dataOff + i * 2).toShort; i += 1 }
    Some(out)
  }

  /** 64-bit perceptual AUDIO hash — the energy-delta fingerprint
    * (the Haitsma–Kalker 2002 "A Highly Robust Audio Fingerprint"
    * design reduced to one band: the hash bit is the SIGN of the
    * energy difference between adjacent time windows, which survives
    * volume changes exactly — scaling every sample scales every
    * window energy by the same factor and flips no comparison).
    * Integer-exact and oracle-replayable:
    *  - the sample sequence splits into 65 contiguous windows with
    *    integer bounds w·n/65;
    *  - energy(w) = Σ |sample| (a Long — exact; documented bound:
    *    n < ~3·10⁷ samples keeps the cross-multiplied comparison in
    *    64 bits);
    *  - bit w set iff energy(w+1)·len(w) > energy(w)·len(w+1) (the
    *    exact integer form of "mean energy rises").
    * None for non-PCM-WAV bytes or clips shorter than 65 samples
    * (no stable fingerprint).
    */
  def audioHash(b: Array[Byte]): Option[Long] =
    wavSamples(b).filter(_.length >= 65).map { ss =>
      val n = ss.length
      // Long arithmetic: w*n overflows Int past ~33M samples (a
      // 13-minute 44.1kHz stereo clip) — the quotient always fits
      val bounds = Array.tabulate(66)(w => (w.toLong * n / 65).toInt)
      val e = new Array[Long](65)
      var w = 0
      while (w < 65) {
        var s = 0L
        var i = bounds(w)
        while (i < bounds(w + 1)) { s += math.abs(ss(i).toLong); i += 1 }
        e(w) = s
        w += 1
      }
      var hash = 0L
      var j = 0
      while (j < 64) {
        val lenJ = (bounds(j + 1) - bounds(j)).toLong
        val lenJ1 = (bounds(j + 2) - bounds(j + 1)).toLong
        if (e(j + 1) * lenJ > e(j) * lenJ1) hash |= 1L << j
        j += 1
      }
      hash
    }

  /** [[audioHash]] boxed for generated code: null = not hashable. */
  def audioHashBoxed(b: Array[Byte]): java.lang.Long =
    audioHash(b) match {
      case Some(h) => java.lang.Long.valueOf(h)
      case None => null
    }

  /** 64-bit perceptual VIDEO hash — the keyframe-thumbnail
    * fingerprint (the standard public approach to video near-dup:
    * sample a keyframe and perceptual-hash it): the FIRST frame's Y
    * plane downsamples to an 8×8 grid with the [[imageHash]] integer
    * NN mapping, bit set iff luma·64 ≥ Σ (the exact integer
    * above-the-mean form). Container metadata (fps, aspect,
    * interlacing) never reaches the hash, so a re-timed or re-tagged
    * copy of the same content is Hamming distance 0 — exactly the
    * near-dup a crawled video corpus is full of. None for non-Y4M
    * bytes (codec-requiring containers fall to the documented stub
    * boundary, like every decoder here).
    */
  def videoHash(b: Array[Byte]): Option[Long] =
    parseY4mHead(b).flatMap { hd =>
      var first = -1
      val n = walkY4mFrames(b, hd, 1) { (idx, dataStart) =>
        if (idx == 0L) first = dataStart
      }
      if (n <= 0 || first < 0) None
      else {
        val w = hd.w
        val h = hd.h
        val luma = new Array[Int](64)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            luma(y * 8 + x) = b(first + (y * h / 8) * w + (x * w / 8)) & 0xff
            x += 1
          }
          y += 1
        }
        var sum = 0L
        var i = 0
        while (i < 64) { sum += luma(i); i += 1 }
        var hash = 0L
        var j = 0
        while (j < 64) {
          if (luma(j).toLong * 64L >= sum) hash |= 1L << j
          j += 1
        }
        Some(hash)
      }
    }

  /** [[videoHash]] boxed for generated code: null = not hashable. */
  def videoHashBoxed(b: Array[Byte]): java.lang.Long =
    videoHash(b) match {
      case Some(h) => java.lang.Long.valueOf(h)
      case None => null
    }

  /** Copy of a Y4M container with the frame rate re-tagged (header
    * `F<num>:<den>` token replaced; frame data untouched) — the
    * metadata-variant fixture for the video near-dup family: same
    * content, different container parameters.
    */
  def y4mWithFps(b: Array[Byte], num: Int, den: Int): Option[Array[Byte]] = {
    if (b == null || b.length < 9) return None // total-parser contract
    val headEnd = b.indexOf('\n'.toByte)
    if (headEnd < 0 ||
      new String(b, 0, 9, "US-ASCII") != "YUV4MPEG2") return None
    val head = new String(b, 0, headEnd, "US-ASCII")
    val toks = head.split(' ').map(t =>
      if (t.startsWith("F") && t.contains(':')) s"F$num:$den" else t)
    val newHead = (toks.mkString(" ") + "\n").getBytes("US-ASCII")
    val out = new Array[Byte](newHead.length + (b.length - headEnd - 1))
    System.arraycopy(newHead, 0, out, 0, newHead.length)
    System.arraycopy(b, headEnd + 1, out, newHead.length,
      b.length - headEnd - 1)
    Some(out)
  }

  /** Volume-attenuated copy of a PCM WAV (every sample integer-divided
    * by `div`, truncation toward zero — replayable in any engine),
    * re-encoded mono-layout-preserving via [[encodeWav]]. Test/fixture
    * helper for the audio near-dup family: attenuation preserves the
    * energy-delta sign pattern exactly, so the copy is a distance-0
    * perceptual near-dup.
    */
  def attenuateWav(b: Array[Byte], div: Int): Option[Array[Byte]] =
    for {
      ss <- wavSamples(b)
      st <- decodeWav(b)
    } yield encodeWav(ss.map(s => (s / div).toShort), st.sampleRate,
      st.channels)

  // --------------------------------- JDK javax.sound (AIFF/AU/WAV) --
  /** AIFF and AU (and any other format the JDK's sampled-audio SPI
    * parses) via `javax.sound.sampled.AudioSystem` — java.desktop
    * again, no external codec. Only 16-bit PCM payloads are scored
    * (same contract as [[decodeWav]]); samples fold sequentially in
    * the byte stream's frame order, so stats match the WAV path
    * bit-for-bit for identical PCM.
    */
  def decodeAudioSystem(b: Array[Byte]): Option[AudioStats] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          None
        else {
          val data = in.readAllBytes()
          val bigEndian = fmt.isBigEndian
          val channels = fmt.getChannels
          val nSamples = data.length / 2
          var sumSq = 0.0
          var peak = 0.0
          var crossings = 0L
          var prevNeg = false
          var i = 0
          while (i < nSamples) {
            val o = i * 2
            val raw =
              if (bigEndian) ((data(o) & 0xff) << 8) | (data(o + 1) & 0xff)
              else ((data(o + 1) & 0xff) << 8) | (data(o) & 0xff)
            val s = raw.toShort.toInt / 32768.0
            sumSq += s * s
            val a = math.abs(s)
            if (a > peak) peak = a
            val neg = s < 0
            if (i > 0 && neg != prevNeg) crossings += 1
            prevNeg = neg
            i += 1
          }
          if (nSamples == 0 || channels <= 0) None
          else {
            val nFrames = nSamples.toLong / channels
            val rms = math.sqrt(sumSq / nSamples)
            val zcr =
              if (nSamples > 1) crossings.toDouble / (nSamples - 1) else 0.0
            Some(AudioStats(fmt.getSampleRate.toInt, channels, nFrames, rms,
              peak, zcr))
          }
        }
      } finally in.close()
    } catch { case _: Exception => None } // unsupported/corrupt: total

  /** AIFF writer (JDK javax.sound) for tests: 16-bit PCM big-endian. */
  def encodeAiff(samples: Array[Short], sampleRate: Int,
                 channels: Int = 1): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(i * 2) = (samples(i) >> 8).toByte
      data(i * 2 + 1) = samples(i).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, channels, channels * 2, sampleRate.toFloat, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt,
      samples.length.toLong / channels)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    out.toByteArray
  }

  // ------------------------------------- JDK ImageIO (PNG/JPEG/GIF) --
  /** PNG, JPEG, and GIF via the JDK's own ImageIO codecs — java.desktop
    * ships them, so these formats need NO external library and are not
    * stub territory. PNG/GIF are lossless (decoded pixels == source
    * pixels, means exactly predictable); JPEG is lossy, so its stats
    * are real but encoder-dependent. Accumulation is row-major
    * sequential-double, same discipline as [[decodePpm]].
    */
  def decodeImageIo(b: Array[Byte]): Option[ImageStats] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0.0
        var sg = 0.0
        var sb = 0.0
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            sr += (p >> 16) & 0xff
            sg += (p >> 8) & 0xff
            sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        Some(ImageStats(w, h, 3, sr / n / 255.0, sg / n / 255.0,
          sb / n / 255.0))
      }
    } catch { case _: Exception => None } // corrupt container: total, never throws

  private def toBufferedImage(pixels: Array[Array[(Int, Int, Int)]]):
      java.awt.image.BufferedImage = {
    val h = pixels.length
    val w = if (h == 0) 0 else pixels(0).length
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixels(y)(x)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Lossless PNG writer (JDK ImageIO) for tests and synthetic corpora. */
  def encodePng(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(pixels), "png", out)
    out.toByteArray
  }

  /** JPEG writer (JDK ImageIO, default quality) — lossy, for the
    * decode-roundtrip tests.
    */
  def encodeJpeg(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(pixels), "jpg", out)
    out.toByteArray
  }

  // ------------------------------------------------------------ WAV --
  /** RIFF/WAVE with a PCM (format 1) `fmt ` chunk and 16-bit samples.
    * Walks the chunk list, so extra chunks (LIST, fact) are fine.
    */
  def decodeWav(b: Array[Byte]): Option[AudioStats] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return None
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var blockAlign = 0
    var dataOff = -1
    var dataLen = 0
    while (pos + 8 <= b.length && (dataOff < 0 || sampleRate == 0)) {
      val id = new String(b, pos, 4, "US-ASCII")
      val size = le32(b, pos + 4)
      if (size < 0 || pos + 8 + size.toLong > b.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = le16(b, pos + 8)
          if (audioFormat != 1) return None // PCM only
          channels = le16(b, pos + 10)
          sampleRate = le32(b, pos + 12)
          blockAlign = le16(b, pos + 20)
          bits = le16(b, pos + 22)
        case "data" =>
          dataOff = pos + 8
          dataLen = size
        case _ => ()
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (dataOff < 0 || sampleRate <= 0 || channels <= 0 || bits != 16 ||
      blockAlign != channels * 2) return None
    val nSamples = dataLen / 2
    var sumSq = 0.0
    var peak = 0.0
    var crossings = 0L
    var prevNeg = false
    var i = 0
    while (i < nSamples) {
      val s = (le16(b, dataOff + i * 2).toShort).toInt / 32768.0
      sumSq += s * s
      val a = math.abs(s)
      if (a > peak) peak = a
      val neg = s < 0
      if (i > 0 && neg != prevNeg) crossings += 1
      prevNeg = neg
      i += 1
    }
    val nFrames = nSamples.toLong / channels
    Some(AudioStats(sampleRate, channels, nFrames,
      if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples),
      peak,
      if (nSamples <= 1) 0.0 else crossings.toDouble / (nSamples - 1)))
  }

  // ------------------------------------------------------------ Y4M --
  /** Uncompressed YUV4MPEG2 video ("y4m" — what ffmpeg/mjpegtools pipe
    * between stages): a text header `YUV4MPEG2 W.. H.. F<num>:<den>
    * [C<subsampling>] …\n`, then per frame a `FRAME…\n` marker and raw
    * planar YCbCr data. Header-parseable with zero codec dependencies,
    * so the video decode path is REAL: luma statistics accumulate over
    * every `frameStep`-th frame's Y plane (sequential double, frame
    * then row-major order).
    */
  private final case class Y4mHead(w: Int, h: Int, fn: Int, fd: Int,
                                   ySize: Int, frameBytes: Int, dataStart: Int)

  private def parseY4mHead(b: Array[Byte]): Option[Y4mHead] = {
    val headEnd = b.indexOf('\n'.toByte)
    if (headEnd < 0) return None
    val head = new String(b, 0, headEnd, "US-ASCII")
    val parts = head.split(" ")
    if (parts.isEmpty || parts(0) != "YUV4MPEG2") return None
    def int(s: String): Int = // -1 on malformed: parsers never throw
      try s.toInt catch { case _: NumberFormatException => -1 }
    var w = 0
    var h = 0
    var fn = 0
    var fd = 1
    var sub = "420"
    parts.drop(1).foreach { p =>
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' => w = int(p.drop(1))
        case 'H' => h = int(p.drop(1))
        case 'F' => p.drop(1).split(":", 2) match {
          case Array(a, d) => fn = int(a); fd = int(d)
          case _ => fn = -1
        }
        case 'C' => sub = p.drop(1)
        case _ => ()
      }
    }
    if (w <= 0 || h <= 0 || fn < 0 || fd <= 0) return None
    val ySize = w * h
    val chroma =
      if (sub.startsWith("444")) 2 * ySize
      else if (sub.startsWith("422")) 2 * ((w + 1) / 2) * h
      else 2 * ((w + 1) / 2) * ((h + 1) / 2) // 420 variants
    Some(Y4mHead(w, h, fn, fd, ySize, ySize + chroma, headEnd + 1))
  }

  /** Walks frames, invoking `onFrame(frameIdx, yPlaneOffset)` for every
    * `frameStep`-th one. Returns the total frame count, or -1 on a
    * malformed stream (bad FRAME marker / truncated frame data).
    */
  private def walkY4mFrames(b: Array[Byte], hd: Y4mHead, frameStep: Int)
                           (onFrame: (Long, Int) => Unit): Long = {
    var i = hd.dataStart
    var nFrames = 0L
    while (i < b.length) {
      // FRAME marker line (may carry parameters)
      val eol = b.indexOf('\n'.toByte, i)
      if (eol < 0 || eol - i < 5 ||
        new String(b, i, 5, "US-ASCII") != "FRAME") return -1L
      val dataStart = eol + 1
      if (dataStart + hd.frameBytes > b.length) return -1L
      if (nFrames % frameStep == 0) onFrame(nFrames, dataStart)
      nFrames += 1
      i = dataStart + hd.frameBytes
    }
    nFrames
  }

  def decodeY4m(b: Array[Byte], frameStep: Int = 1): Option[VideoStats] =
    parseY4mHead(b).flatMap { hd =>
      var sampled = 0
      var sum = 0.0
      var sumSq = 0.0
      val nFrames = walkY4mFrames(b, hd, frameStep) { (_, dataStart) =>
        var j = dataStart
        val end = dataStart + hd.ySize
        while (j < end) {
          val y = (b(j) & 0xff).toDouble
          sum += y
          sumSq += y * y
          j += 1
        }
        sampled += 1
      }
      if (nFrames <= 0) None
      else {
        val n = sampled.toDouble * hd.ySize
        val mean = sum / n
        val variance = math.max(0.0, sumSq / n - mean * mean)
        Some(VideoStats(hd.w, hd.h, hd.fn, hd.fd, nFrames, sampled, mean,
          math.sqrt(variance)))
      }
    }

  /** Real frame sampling: per-sampled-frame luma means,
    * `(frameIdx, meanY)` for every `frameStep`-th frame — what a frame
    * extractor feeds downstream (thumbnailing, shot detection).
    */
  def y4mFrameLuma(b: Array[Byte],
                   frameStep: Int = 1): Option[Array[(Long, Double)]] =
    parseY4mHead(b).flatMap { hd =>
      val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      val nFrames = walkY4mFrames(b, hd, frameStep) { (idx, dataStart) =>
        var j = dataStart
        val end = dataStart + hd.ySize
        var sum = 0.0
        while (j < end) { sum += (b(j) & 0xff).toDouble; j += 1 }
        acc += ((idx, sum / hd.ySize))
      }
      if (nFrames <= 0) None else Some(acc.toArray)
    }

  /** Y4M writer (C420, F`fpsNum`:`fpsDen`) for tests and synthetic
    * corpora: `frames(f)(plane)` with plane 0 = Y (w×h), 1 = U, 2 = V
    * (⌈w/2⌉×⌈h/2⌉ each).
    */
  def encodeY4m(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
                frames: Array[Array[Array[Byte]]]): Array[Byte] = {
    val head = s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n"
      .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      head.length + frames.map(f => marker.length + f.map(_.length).sum).sum)
    out.put(head)
    frames.foreach { f =>
      out.put(marker)
      f.foreach(out.put)
    }
    out.array()
  }

  /** Minimal PCM16 mono/stereo WAV writer for tests and synthetic
    * corpora. `samples` are interleaved 16-bit values.
    */
  def encodeWav(samples: Array[Short], sampleRate: Int,
                channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putLe32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def putLe16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def putTag(o: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    putTag(0, "RIFF"); putLe32(4, 36 + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16); putLe16(20, 1)
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels * 2); putLe16(32, channels * 2)
    putLe16(34, 16)
    putTag(36, "data"); putLe32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLe16(44 + i * 2, samples(i))
      i += 1
    }
    out
  }
}
