package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Perceptual (aHash/dHash) image near-dup: the banded Hamming pass
  * equals brute force whenever bands > maxDist (pigeonhole), resized
  * copies land within the default radius, and undecodable rows drop
  * out silently.
  */
class MultimodalNearDupSpec extends SparkTestBase {

  test("banded pairs equal brute force; resized copies found; " +
      "undecodable rows drop out") {
    val media = Multimodal.synthetic(spark, 99)
      .where(col("kind") === "image")
    val copies = Multimodal.resizeImages(media, 8, 6)
      .select((col("id") + 1000L).as("id"), col("kind"), col("bytes"),
        col("width"), col("height"), col("durationMs"))
    // plant an undecodable row: must vanish, not throw
    val junk = spark.createDataFrame(Seq(
      graft.core.Schemas.MediaRow(9999L, "image",
        "definitely not an image".getBytes, 0, 0, 0L)))
    val corpus = media.unionByName(copies).unionByName(junk)
    val got = Multimodal.imageNearDupPairs(corpus, "bytes", "id",
        maxDist = 6, bands = 8)
      .select("d1", "d2", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    // brute force over the collected hashes
    val hs = corpus.select(col("id"),
        Multimodal.imagePHash(col("bytes")).as("ph"))
      .where(col("ph").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val brute = for {
      a <- hs.indices
      b <- (a + 1) until hs.length
      d = java.lang.Long.bitCount(hs(a)._2 ^ hs(b)._2)
      if d <= 6
    } yield (hs(a)._1, hs(b)._1, d)
    assert(got == brute.sortBy(p => (p._1, p._2)))
    assert(got.nonEmpty, "fixture must contain perceptual near-dups")
    assert(got.exists { case (d1, d2, _) => d2 - d1 == 1000L },
      "some original-resized pair must be within the radius")
    assert(!got.exists(p => p._1 == 9999L || p._2 == 9999L))
    // dHash variant: same machinery, different fingerprint
    val gotD = Multimodal.imageNearDupPairs(corpus, "bytes", "id",
      maxDist = 6, bands = 8, dHash = true).count()
    assert(gotD > 0)
    // lossless pigeonhole requires bands > maxDist: enforced loudly
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(corpus, "bytes", "id",
        maxDist = 8, bands = 8)
    }
  }

  test("codegen and interpreted imagePHash agree bit-for-bit") {
    val media = Multimodal.synthetic(spark, 30).where(col("kind") === "image")
    def run() = media
      .select(Multimodal.imagePHash(col("bytes")).as("a"),
        Multimodal.imagePHash(col("bytes"), dHash = true).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == viaCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("audio hash: volume-invariant, banded equals brute force, " +
      "total on garbage") {
    val media = Multimodal.synthetic(spark, 99)
      .where(col("kind") === "audio")
    val copies = Multimodal.attenuateAudio(media, 2)
      .select((col("id") + 1000L).as("id"), col("kind"), col("bytes"),
        col("width"), col("height"), col("durationMs"))
    val corpus = media.unionByName(copies)
    // volume invariance: every attenuated copy is a distance-0 pair
    val got = Multimodal.audioNearDupPairs(corpus, "bytes", "id",
        maxDist = 6, bands = 8)
      .select("d1", "d2", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    val origIds = media.select("id").collect().map(_.getLong(0))
    origIds.foreach { id =>
      assert(got.contains((id, id + 1000L, 0)),
        s"volume-halved copy of $id must hash identically")
    }
    // banded ≡ brute force
    val hs = corpus.select(col("id"),
        Multimodal.audioPHash(col("bytes")).as("ph"))
      .where(col("ph").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val brute = for {
      a <- hs.indices
      b <- (a + 1) until hs.length
      d = java.lang.Long.bitCount(hs(a)._2 ^ hs(b)._2)
      if d <= 6
    } yield (hs(a)._1, hs(b)._1, d)
    assert(got == brute.sortBy(p => (p._1, p._2)))
    // total on garbage / non-audio
    assert(MediaCodec.audioHash("not a wav".getBytes).isEmpty)
    assert(MediaCodec.audioHash(null).isEmpty)
    assert(MediaCodec.audioHash(
      MediaCodec.encodeWav(Array.fill[Short](10)(5), 8000)).isEmpty,
      "clips under 65 samples have no stable fingerprint")
    // deeper attenuation still hashes identically (sign pattern only)
    val h1 = MediaCodec.audioHash(
      MediaCodec.encodeWav(Array.tabulate[Short](200)(j =>
        (((j * 997) % 2048 - 1024) * 16).toShort), 8000)).get
    val h8 = MediaCodec.audioHash(MediaCodec.attenuateWav(
      MediaCodec.encodeWav(Array.tabulate[Short](200)(j =>
        (((j * 997) % 2048 - 1024) * 16).toShort), 8000), 8).get).get
    assert(h1 == h8)
  }


  test("video hash: fps-retag invariant, banded equals brute force, " +
      "blob rows drop out") {
    val media = Multimodal.synthetic(spark, 99)
      .where(col("kind") === "video")
    val copies = Multimodal.retagFps(media, 60, 1)
      .select((col("id") + 1000L).as("id"), col("kind"), col("bytes"),
        col("width"), col("height"), col("durationMs"))
    val corpus = media.unionByName(copies)
    val got = Multimodal.videoNearDupPairs(corpus, "bytes", "id",
        maxDist = 6, bands = 8)
      .select("d1", "d2", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    // every Y4M row's retagged copy is a distance-0 pair; blob rows
    // (codec-requiring containers) hash NULL and appear in no pair
    val y4mIds = corpus.select(col("id"),
        Multimodal.videoPHash(col("bytes")).as("ph"))
      .where(col("ph").isNotNull)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(y4mIds.nonEmpty && y4mIds.size < corpus.count())
    y4mIds.filter(_ < 1000L).foreach { id =>
      assert(got.contains((id, id + 1000L, 0)),
        s"fps-retagged copy of $id must hash identically")
    }
    assert(got.forall(p => y4mIds(p._1) && y4mIds(p._2)))
    // banded ≡ brute force
    val hs = corpus.select(col("id"),
        Multimodal.videoPHash(col("bytes")).as("ph"))
      .where(col("ph").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val brute = for {
      a <- hs.indices
      b <- (a + 1) until hs.length
      d = java.lang.Long.bitCount(hs(a)._2 ^ hs(b)._2)
      if d <= 6
    } yield (hs(a)._1, hs(b)._1, d)
    assert(got == brute.sortBy(p => (p._1, p._2)))
    // retag really changed the container (not a byte-identical copy)
    val origFps = media.limit(1).select("bytes").collect()(0)
      .getAs[Array[Byte]](0)
    MediaCodec.decodeY4m(origFps).foreach { st =>
      val re = MediaCodec.y4mWithFps(origFps, 60, 1).get
      assert(MediaCodec.decodeY4m(re).get.fpsNum == 60)
      assert(st.lumaMean == MediaCodec.decodeY4m(re).get.lumaMean)
    }
  }

}
