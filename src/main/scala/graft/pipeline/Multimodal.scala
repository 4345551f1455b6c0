package graft.pipeline

import graft.core.Schemas.MediaRow
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `BINARY` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The decode step is REAL for the header-parseable containers —
  * BMP/PPM images and PCM WAV audio via [[MediaCodec]] (pure JVM, no
  * codec libraries) — and falls back to a clearly-marked deterministic
  * STUB only for formats that genuinely need an external codec (JPEG,
  * MP3, video containers, none available in this environment). The
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
    // ??? <- external codec (JPEG/MP3/video) would go here
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
    * modality tag (1 = image, 2 = audio, 0 = stub fallback); the rest
    * are the container's real pixel/sample statistics.
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

  /** Deterministic synthetic media table for tests/demo: REAL
    * containers for images (BMP/PPM alternating) and audio (PCM16
    * WAV); video rows carry an opaque blob (no pure-JVM video
    * container), exercising the stub fallback.
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
          else MediaCodec.encodePpm(px)
          (enc, w, h, 0L)
        case "audio" =>
          val sr = 8000
          val nsamp = 160 + (i % 5) * 80
          val samples = Array.tabulate[Short](nsamp)(j =>
            (((i * 31 + j * 997) % 2048 - 1024) * 16).toShort)
          (MediaCodec.encodeWav(samples, sr), 0, 0,
            nsamp * 1000L / sr)
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
