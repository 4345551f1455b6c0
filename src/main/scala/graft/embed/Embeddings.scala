package graft.embed

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Pluggable embedding models — the engine's X1 extension point
  * (reference embeddings.py:62-279 `AbstractEmbeddingModel`).
  *
  * Contract (reference embeddings.py:118-200): output is
  * L2-normalized float32, truncated to the first `dim` components
  * (Matryoshka-style, vectordb.py:81-86); `batchEmbed` must equal
  * per-item `embed`. The reference's `RandomEmbedding` is replaced by
  * a DETERMINISTIC hash embedding so tests and reruns reproduce.
  */
trait EmbeddingModel extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
  /** Batch contract (reference embeddings.py:185-200): impls may
    * amortize per-call setup; must equal mapping `embed`.
    */
  def batchEmbed(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)
}

/** Deterministic pseudo-random unit vector per text: FNV-1a-64 over
  * UTF-8 bytes seeds a splitmix64 stream → uniform floats → L2
  * normalize. Same shape/norm invariants as the reference's
  * RandomEmbedding (embeddings.py:118-153) but reproducible.
  */
final case class HashEmbedding(dim: Int = 256) extends EmbeddingModel {
  override def embed(text: String): Array[Float] = {
    var h = 0xcbf29ce484222325L
    var bi = 0
    val bytes = text.getBytes("UTF-8")
    while (bi < bytes.length) {
      h ^= (bytes(bi) & 0xffL); h *= 0x100000001b3L; bi += 1
    }
    val out = new Array[Float](dim)
    var s = h
    var i = 0
    var sumSq = 0.0
    while (i < dim) {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      val u = ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
      out(i) = u.toFloat
      sumSq += u.toFloat * u.toFloat
      i += 1
    }
    val norm = math.sqrt(sumSq)
    i = 0
    while (i < dim) { out(i) = (out(i) / norm).toFloat; i += 1 }
    out
  }
}

/** The reference test suite's FakeEmbedder: `text -> [len(text)]`
  * (reference tests/test_vector_service.py:78-81). dim=1, NOT
  * normalized — used to make retrieval order observable in tests.
  */
case object LengthEmbedding extends EmbeddingModel {
  override val dim: Int = 1
  override def embed(text: String): Array[Float] = Array(text.length.toFloat)
}

object Embed {
  /** Add an embedding column via `mapPartitions` batches, preserving
    * the reference's batch-embed contract (amortized per-partition
    * setup; embeddings.py:185-200). Scales with partitions; no
    * driver-side work.
    */
  def embedColumn(df: DataFrame, model: EmbeddingModel, textCol: String,
                  outCol: String, batchSize: Int = 256): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val vecs = model.batchEmbed(rows.map(r => Option(r.getString(idx)).getOrElse("")))
        rows.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v))
      }
    }(Encoders.row(outSchema))
  }
}
