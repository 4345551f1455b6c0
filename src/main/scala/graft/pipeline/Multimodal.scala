package graft.pipeline

import graft.core.Schemas.MediaRow
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `BINARY` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The Spark-side plumbing — schema, batch shape, partitioning — is
  * real; the codec step is a clearly-marked deterministic STUB
  * (decode libraries are not available in this environment). At
  * deployment the stub body is replaced by the actual decoder; the
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

  /** STUB decode: a real implementation parses the container and
    * returns pixel/sample features. The stub derives a deterministic
    * feature vector from the byte content so pipelines are testable
    * end-to-end.
    */
  private def decodeStub(bytes: Array[Byte], featDim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake for plumbing tests
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
          r.toSeq :+ decodeStub(r.getAs[Array[Byte]](bi), featDim).toSeq))
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

  /** Deterministic synthetic media table for tests/demo. */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val bytes = Array.tabulate[Byte](64 + i % 64)(j => ((i * 31 + j) % 251).toByte)
      MediaRow(i.toLong, kind, bytes, 64 + i % 512, 64 + (i * 7) % 512,
        if (kind == "video") 1000L * (1 + i % 10) else 0L)
    }
    spark.createDataFrame(rows)
  }
}
