package graft.pipeline

import graft.core.Schemas.MediaRow
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `BINARY` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The decode step is REAL for BMP/PPM/PNG/JPEG/GIF images, PCM WAV
  * audio, and uncompressed Y4M video via [[MediaCodec]] (pure JVM —
  * spec-direct parsers plus the JDK's own ImageIO codecs, no external
  * libraries) — and falls back to a clearly-marked deterministic STUB
  * only for formats whose codecs the JDK does not ship (MP3,
  * MP4/H.264, none available in this environment). The
  * dataflow (mapPartitions over record batches, one decode per
  * element, metadata carried alongside) is exactly what a Pandas-UDF /
  * `mapInPandas` pipeline does in PySpark.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("durationMs", LongType, nullable = false)))

  /** STUB decode for codec-requiring formats only: a deterministic
    * byte-fold so pipelines stay testable end-to-end. Kind tag 0 marks
    * stubbed rows, so downstream can tell real features apart.
    */
  private def decodeStub(bytes: Array[Byte], featDim: Int): Array[Float] = {
    // ??? <- external codec (MP3 / MP4-H.264) would go here
    val out = new Array[Float](featDim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) {
        out(i % featDim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  /** Fixed-dim feature vector from a decoded container. Slot 0 is the
    * modality tag (1 = image, 2 = audio, 3 = video, 0 = stub
    * fallback); the rest are the container's real pixel/sample
    * statistics (luma stats scaled to [0,1] like the image means).
    */
  private def featurize(bytes: Array[Byte], featDim: Int): Array[Float] =
    MediaCodec.decode(bytes) match {
      case MediaCodec.DecodedImage(s) =>
        fit(featDim, Array(1.0, s.width.toDouble, s.height.toDouble,
          s.channels.toDouble, s.meanR, s.meanG, s.meanB, s.brightness))
      case MediaCodec.DecodedAudio(s) =>
        fit(featDim, Array(2.0, s.sampleRate.toDouble, s.channels.toDouble,
          s.durationSec, s.rms, s.peak, s.zeroCrossRate,
          s.nFrames.toDouble))
      case MediaCodec.DecodedVideo(s) =>
        fit(featDim, Array(3.0, s.width.toDouble, s.height.toDouble,
          s.fps, s.lumaMean / 255.0, s.lumaStd / 255.0,
          s.nFrames.toDouble, s.sampledFrames.toDouble))
      case MediaCodec.Undecodable => decodeStub(bytes, featDim)
    }

  private def fit(featDim: Int, vals: Array[Double]): Array[Float] =
    Array.tabulate(featDim)(i => if (i < vals.length) vals(i).toFloat else 0.0f)

  /** Feature extraction over media batches: partition-local, batched,
    * metadata preserved — the multimodal analogue of
    * [[graft.embed.Embed.embedColumn]].
    */
  def extractFeatures(df: DataFrame, featDim: Int = 16,
                      batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add("features",
      ArrayType(FloatType, containsNull = false))
    val bi = df.schema.fieldIndex("bytes")
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map(r => Row.fromSeq(
          r.toSeq :+ featurize(r.getAs[Array[Byte]](bi), featDim).toSeq))
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling stub for video rows: emits one row per sampled
    * frame index at `everyMs` spacing — the explode shape a real
    * frame extractor produces.
    */
  def sampleFrames(df: DataFrame, everyMs: Long = 1000L): DataFrame =
    df.where(col("kind") === "video")
      .select(col("id"), col("durationMs"),
        explode(sequence(lit(0L), greatest(col("durationMs") - 1, lit(0L)),
          lit(everyMs))).as("frameMs"))

  /** REAL frame sampling for Y4M video rows: decodes every
    * `frameStep`-th frame's Y plane and emits `(id, frameIdx,
    * lumaMean)` per sampled frame. Non-Y4M video rows (codec-requiring
    * containers) produce no rows — the caller sees exactly what was
    * decodable. Partition-local like [[extractFeatures]].
    */
  def sampleFrameStats(df: DataFrame, frameStep: Int = 1): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frameIdx", LongType, nullable = false),
      StructField("lumaMean", DoubleType, nullable = false)))
    val bi = df.schema.fieldIndex("bytes")
    val ii = df.schema.fieldIndex("id")
    df.where(col("kind") === "video").mapPartitions { it =>
      it.flatMap { r =>
        MediaCodec.y4mFrameLuma(r.getAs[Array[Byte]](bi), frameStep)
          .toSeq.flatten
          .map { case (f, m) => Row(r.getLong(ii), f, m) }
      }
    }(Encoders.row(outSchema))
  }

  /** Thumbnail/normalize step: image rows are nearest-neighbor-resized
    * to (dw × dh) and re-encoded as lossless PPM (width/height metadata
    * updated); rows whose bytes aren't a decodable image pass through
    * untouched. Partition-local like [[extractFeatures]] — the resize
    * runs where the bytes already are, no shuffle.
    */
  def resizeImages(df: DataFrame, dw: Int, dh: Int): DataFrame = {
    val bi = df.schema.fieldIndex("bytes")
    val wi = df.schema.fieldIndex("width")
    val hi = df.schema.fieldIndex("height")
    df.mapPartitions { it =>
      it.map { r =>
        MediaCodec.resizeNearest(r.getAs[Array[Byte]](bi), dw, dh) match {
          case Some(resized) =>
            Row.fromSeq(r.toSeq.updated(bi, resized).updated(wi, dw)
              .updated(hi, dh))
          case None => r
        }
      }
    }(Encoders.row(df.schema))
  }

  /** 64-bit perceptual hash column ([[MediaCodec.imageHash]] —
    * codegen'd; NULL for undecodable bytes).
    */
  def imagePHash(bytes: org.apache.spark.sql.Column,
                 dHash: Boolean = false): org.apache.spark.sql.Column =
    graft.functions.ColumnBridge.column(ImagePHash(
      graft.functions.ColumnBridge.expression(bytes), dHash))

  /** Perceptual near-dup pairs over an image BYTES column — the
    * multimodal entry in the dedup family (MinHash text, SimHash
    * text, cosine embeddings, and now aHash/dHash images): (d1 < d2,
    * dist ≤ maxDist) Hamming pairs over the 64-bit perceptual hashes,
    * blocked EXACTLY like [[Dedup.simhashPairs]] — the hash splits
    * into `bands` contiguous chunks and only same-chunk-value pairs
    * are compared. Pigeonhole: two hashes within `maxDist` bits must
    * agree on at least one chunk when `bands > maxDist` (enforced), so
    * the banded pass emits EVERY qualifying pair — brute-force
    * equality, at candidate cost bounded by chunk-bucket occupancy,
    * never all-pairs (multi-index Hamming, Norouzi et al. 2012).
    *
    * 100 TB: one decode scan for the hashes (64 bits per image —
    * a sliver), one self-equi-join per band on (band, chunk) — the
    * same shuffle shape as the text near-dup family; undecodable
    * rows drop out (the total-parser contract).
    */
  def imageNearDupPairs(df: DataFrame, bytesCol: String, idCol: String,
                        maxDist: Int = 6, bands: Int = 8,
                        dHash: Boolean = false): DataFrame =
    hammingPairs(df.select(col(idCol).as("doc"),
      imagePHash(col(bytesCol), dHash).as("ph")), maxDist, bands)

  /** Perceptual near-dup pairs over an AUDIO bytes column — the same
    * banded Hamming pass over [[MediaCodec.audioHash]] energy-delta
    * fingerprints (volume-invariant by construction: attenuation
    * scales every window energy equally and flips no sign).
    */
  def audioNearDupPairs(df: DataFrame, bytesCol: String, idCol: String,
                        maxDist: Int = 6, bands: Int = 8): DataFrame =
    hammingPairs(df.select(col(idCol).as("doc"),
      audioPHash(col(bytesCol)).as("ph")), maxDist, bands)

  /** Perceptual near-dup pairs over a VIDEO bytes column — the
    * keyframe-thumbnail fingerprint ([[MediaCodec.videoHash]]:
    * first-frame Y-plane aHash, container-metadata-invariant) through
    * the same banded Hamming pass.
    */
  def videoNearDupPairs(df: DataFrame, bytesCol: String, idCol: String,
                        maxDist: Int = 6, bands: Int = 8): DataFrame =
    hammingPairs(df.select(col(idCol).as("doc"),
      videoPHash(col(bytesCol)).as("ph")), maxDist, bands)

  /** 64-bit perceptual VIDEO hash column ([[MediaCodec.videoHash]] —
    * codegen'd; NULL for non-Y4M bytes).
    */
  def videoPHash(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ColumnBridge.column(VideoPHash(
      graft.functions.ColumnBridge.expression(bytes)))

  /** Frame-rate re-tag transform for Y4M video rows (header token
    * only, frame data untouched); non-Y4M rows pass through.
    */
  def retagFps(df: DataFrame, num: Int, den: Int): DataFrame = {
    val bi = df.schema.fieldIndex("bytes")
    df.mapPartitions { it =>
      it.map { r =>
        MediaCodec.y4mWithFps(r.getAs[Array[Byte]](bi), num, den) match {
          case Some(v) => Row.fromSeq(r.toSeq.updated(bi, v))
          case None => r
        }
      }
    }(Encoders.row(df.schema))
  }

  /** The `bands` contiguous chunk values of a 64-bit hash column —
    * THE banding decomposition every Hamming-family consumer derives
    * keys from (the one-shot pairs here AND the persisted
    * [[PHashIndex]] layout): pigeonhole losslessness depends on both
    * sides using exactly this chunking, so it lives in one place.
    */
  private[pipeline] def bandChunks(ph: org.apache.spark.sql.Column,
                                   bands: Int): Seq[org.apache.spark.sql.Column] = {
    require(bands > 0 && 64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    (0 until bands).map(b =>
      shiftrightunsigned(ph, b * width).bitwiseAND(lit(mask)))
  }

  /** The shared banded Hamming pass over any (doc, ph BIGINT) frame:
    * lossless by pigeonhole for maxDist < bands.
    */
  private def hammingPairs(sig0: DataFrame, maxDist: Int,
                           bands: Int): DataFrame = {
    require(bands > maxDist,
      s"banded blocking is only lossless for maxDist < bands " +
        s"(pigeonhole); got maxDist=$maxDist bands=$bands")
    val sig = sig0.where(col("ph").isNotNull)
    val banded = sig.select(col("doc"), col("ph"),
      posexplode(array(bandChunks(col("ph"), bands): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"),
        bit_count(col("a.ph").bitwiseXOR(col("b.ph"))).as("dist"))
      .dropDuplicates("d1", "d2")
      .where(col("dist") <= maxDist)
  }

  /** 64-bit perceptual AUDIO hash column ([[MediaCodec.audioHash]] —
    * codegen'd; NULL for non-PCM-WAV or too-short clips).
    */
  def audioPHash(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ColumnBridge.column(AudioPHash(
      graft.functions.ColumnBridge.expression(bytes)))

  /** Volume-attenuation transform for audio rows (every sample
    * integer-divided by `div`), partition-local like
    * [[resizeImages]]; rows whose bytes aren't PCM WAV pass through
    * untouched. Fixture/normalization helper for the audio near-dup
    * family.
    */
  def attenuateAudio(df: DataFrame, div: Int): DataFrame = {
    val bi = df.schema.fieldIndex("bytes")
    df.mapPartitions { it =>
      it.map { r =>
        MediaCodec.attenuateWav(r.getAs[Array[Byte]](bi), div) match {
          case Some(a) => Row.fromSeq(r.toSeq.updated(bi, a))
          case None => r
        }
      }
    }(Encoders.row(df.schema))
  }

  /** Deterministic synthetic media table for tests/demo: REAL
    * containers for images (BMP / PNG / PPM rotating — PNG is lossless
    * so its decoded means equal the PPM case bit-for-bit, keeping the
    * golden oracle valid), audio (PCM16 WAV), and every other video
    * row (uncompressed Y4M); the remaining video rows carry an opaque
    * blob (a codec-requiring container stand-in), exercising the stub
    * fallback. JPEG stays out of the oracled synthetic — lossy decode
    * is encoder-dependent, covered by roundtrip tests instead.
    */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val (bytes, w, h, durMs) = kind match {
        case "image" =>
          val w = 2 + i % 6
          val h = 2 + (i * 7) % 5
          val px = Array.tabulate(h, w)((y, x) =>
            ((i * 31 + y * w + x) % 256, (i * 17 + x) % 256, (i * 7 + y) % 256))
          val enc = if (i % 6 == 0) MediaCodec.encodeBmp(px)
          else if (i % 12 == 3) MediaCodec.encodePng(px)
          else MediaCodec.encodePpm(px)
          (enc, w, h, 0L)
        case "audio" =>
          val sr = 8000
          val nsamp = 160 + (i % 5) * 80
          val samples = Array.tabulate[Short](nsamp)(j =>
            (((i * 31 + j * 997) % 2048 - 1024) * 16).toShort)
          (MediaCodec.encodeWav(samples, sr), 0, 0,
            nsamp * 1000L / sr)
        case _ if (i / 3) % 2 == 0 =>
          // real Y4M container (see gen_multimodal_golden.py parity)
          val v = i / 3
          val w = 4 + 2 * (v % 3)
          val h = 4 + 2 * ((v * 5) % 3)
          val nf = 2 + v % 3
          val fps = Seq(25, 30, 24)(v % 3)
          val frames = Array.tabulate(nf) { f =>
            val yPlane = Array.tabulate[Byte](w * h)(p =>
              ((i * 31 + f * 97 + p * 13) % 256).toByte)
            val cSize = (w / 2) * (h / 2)
            val u = Array.fill[Byte](cSize)(((i * 7 + f) % 256).toByte)
            val vp = Array.fill[Byte](cSize)(((i * 11 + f) % 256).toByte)
            Array(yPlane, u, vp)
          }
          (MediaCodec.encodeY4m(w, h, fps, 1, frames), w, h,
            nf * 1000L / fps)
        case _ =>
          val blob = Array.tabulate[Byte](64 + i % 64)(j =>
            ((i * 31 + j) % 251).toByte)
          (blob, 64 + i % 512, 64 + (i * 7) % 512, 1000L * (1 + i % 10))
      }
      MediaRow(i.toLong, kind, bytes, w, h, durMs)
    }
    spark.createDataFrame(rows)
  }
}


/** 64-bit perceptual image hash (aHash/dHash) as a codegen'd Catalyst
  * expression over BINARY — the kernel is [[MediaCodec.imageHash]];
  * undecodable bytes yield NULL (nullable on purpose: a corrupt blob
  * must drop out of the dedup pass, not kill the scan).
  */
case class ImagePHash(child: org.apache.spark.sql.catalyst.expressions.Expression,
                      dHash: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_phash"

  override def nullSafeEval(a: Any): Any =
    MediaCodec.imageHashBoxed(a.asInstanceOf[Array[Byte]], dHash)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ph = ctx.freshName("ph")
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Long $ph = graft.pipeline.MediaCodec.imageHashBoxed($a, $dHash);
      if ($ph == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $ph.longValue();
      }""")
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): ImagePHash =
    copy(child = c)
}


/** 64-bit perceptual audio hash (energy-delta fingerprint) as a
  * codegen'd Catalyst expression over BINARY — the kernel is
  * [[MediaCodec.audioHash]]; NULL for non-PCM-WAV bytes or clips too
  * short to fingerprint.
  */
case class AudioPHash(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_phash"

  override def nullSafeEval(a: Any): Any =
    MediaCodec.audioHashBoxed(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ph = ctx.freshName("aph")
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Long $ph = graft.pipeline.MediaCodec.audioHashBoxed($a);
      if ($ph == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $ph.longValue();
      }""")
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): AudioPHash =
    copy(child = c)
}


/** 64-bit perceptual video hash (first-keyframe thumbnail aHash) as
  * a codegen'd Catalyst expression over BINARY — the kernel is
  * [[MediaCodec.videoHash]]; NULL for non-Y4M bytes.
  */
case class VideoPHash(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "video_phash"

  override def nullSafeEval(a: Any): Any =
    MediaCodec.videoHashBoxed(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ph = ctx.freshName("vph")
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Long $ph = graft.pipeline.MediaCodec.videoHashBoxed($a);
      if ($ph == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $ph.longValue();
      }""")
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): VideoPHash =
    copy(child = c)
}
