package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The model-digest sidecar contracts (r16 guard-cost fix): digest
  * equality must be exactly sameModel/samePq equality in practice,
  * the sidecar must ride saveModel, pre-digest layouts must still
  * verify through the full parquet fallback, and a foreign model
  * must be refused through the digest path.
  */
class DigestSidecarSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("saveModel writes a digest that discriminates models and " +
    "round-trips the persisted bytes") {
    val a = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    val b = Ivf.train(emb.where(col("vec_id") < 100), "embedding",
      "vec_id", nlist = 4, iters = 1)
    assert(Ivf.modelDigest(a) == Ivf.modelDigest(a))
    assert(Ivf.modelDigest(a) != Ivf.modelDigest(b))
    val dir = java.nio.file.Files.createTempDirectory("digest")
    val mp = dir.resolve("_model").toString
    Ivf.saveModel(spark, a, mp)
    assert(graft.core.DigestSidecar.read(spark, mp)
      .contains(Ivf.modelDigest(a)))
    // the digest is a cache of the persisted bytes: loading the
    // parquet back reproduces a model with the same digest
    assert(Ivf.modelDigest(Ivf.loadModel(spark, mp)) == Ivf.modelDigest(a))
    assert(Ivf.modelMatchesPersisted(spark, mp, a))
    assert(!Ivf.modelMatchesPersisted(spark, mp, b))
  }

  test("pre-digest layouts fall back to the parquet comparison; " +
    "persisted-vs-persisted matches both ways") {
    val a = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    val b = Ivf.train(emb.where(col("vec_id") < 100), "embedding",
      "vec_id", nlist = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("digest_legacy")
    val mpA = dir.resolve("_modelA").toString
    val mpB = dir.resolve("_modelB").toString
    val mpA2 = dir.resolve("_modelA2").toString
    Ivf.saveModel(spark, a, mpA)
    Ivf.saveModel(spark, b, mpB)
    Ivf.saveModel(spark, a, mpA2)
    // legacy shape: strip A's sidecar — every check must still work
    val fs = new org.apache.hadoop.fs.Path(mpA).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(mpA, "_digest"), false)
    assert(graft.core.DigestSidecar.read(spark, mpA).isEmpty)
    assert(Ivf.modelMatchesPersisted(spark, mpA, a))
    assert(!Ivf.modelMatchesPersisted(spark, mpA, b))
    assert(Ivf.persistedModelsMatch(spark, mpA, mpA2)) // one-sided legacy
    assert(Ivf.persistedModelsMatch(spark, mpA2, mpA))
    assert(!Ivf.persistedModelsMatch(spark, mpA, mpB))
    assert(!Ivf.persistedModelsMatch(spark, mpA2, mpB)) // both digested
  }

  test("ensurePair refuses a foreign model through the digest path " +
    "and Pq digests discriminate codebooks") {
    val a = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    val b = Ivf.train(emb.where(col("vec_id") < 100), "embedding",
      "vec_id", nlist = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("digest_pair")
    val root = dir.resolve("layout").toString
    Ivf.saveModel(spark, a, Ivf.modelPath(root))
    Ivf.ensurePair(spark, a, None, root) // match: no error, no re-save
    intercept[IllegalArgumentException] {
      Ivf.ensurePair(spark, b, None, root)
    }
    val pqA = Pq.train(emb, "embedding", "vec_id", m = 4, ksub = 8,
      iters = 2)
    val pqB = Pq.train(emb.where(col("vec_id") < 200), "embedding",
      "vec_id", m = 2, ksub = 4, iters = 1)
    assert(Pq.digest(pqA) == Pq.digest(pqA))
    assert(Pq.digest(pqA) != Pq.digest(pqB))
    Pq.saveModel(spark, pqA, Ivf.pqPath(root))
    assert(graft.core.DigestSidecar.read(spark, Ivf.pqPath(root))
      .contains(Pq.digest(pqA)))
    Ivf.ensurePair(spark, a, Some(pqA), root)
    intercept[IllegalArgumentException] {
      Ivf.ensurePair(spark, a, Some(pqB), root)
    }
  }
}
