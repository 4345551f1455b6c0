package graft.pipeline

import graft.functions.{MisraGries, MulDivFloor}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Seeded randomized property checks for the exact kernels — 1000+
  * cases each against an independent reference implementation (plain
  * ScalaTest with a FIXED seed: reproducible, no framework bridge).
  */
class KernelPropertySpec extends AnyFunSuite {

  test("MulDivFloor.evalExact == BigInt reference over random operands") {
    val rnd = new Random(0xBEEF)
    (1 to 2000).foreach { _ =>
      // mix magnitudes so both the long fast path and the BigInt
      // overflow path are exercised
      val a = rnd.nextLong(1L << rnd.nextInt(62)).abs
      val b = rnd.nextLong(1L << rnd.nextInt(62)).abs
      val c = rnd.nextLong(1L << rnd.nextInt(40)).abs + 1L
      val want = (BigInt(a) * BigInt(b) / BigInt(c)).toLong
      assert(MulDivFloor.evalExact(a, b, c) == want, s"($a,$b,$c)")
    }
  }

  test("HostBlocked.probe == naive suffix reference over random hosts") {
    val rnd = new Random(0xF00D)
    val labels = Vector("a", "bb", "ccc", "x", "yz")
    def host(n: Int): String =
      Vector.fill(n)(labels(rnd.nextInt(labels.size))).mkString(".")
    (1 to 2000).foreach { _ =>
      val bl = Vector.fill(1 + rnd.nextInt(4))(host(1 + rnd.nextInt(3)))
      val set = new java.util.HashSet[String]()
      bl.foreach(set.add)
      val h = host(1 + rnd.nextInt(5))
      val want = bl.exists(e => h == e || h.endsWith("." + e))
      assert(HostBlocked.probe(h, set) == want,
        s"host=$h bl=$bl")
    }
  }

  test("MisraGries containment holds under random chunking and merge order") {
    val rnd = new Random(0xCAFE)
    (1 to 60).foreach { _ =>
      val m = 2 + rnd.nextInt(6)
      val universe = ('a' to 'j').map(_.toString)
      // zipf-ish stream
      val stream = Seq.fill(200 + rnd.nextInt(400)) {
        universe(math.min(universe.size - 1,
          (math.abs(rnd.nextGaussian()) * 3).toInt))
      }
      val agg = MisraGries(BoundReference(0, StringType, nullable = true), m)
      // random chunking into partial buffers, merged in random order
      val chunks = rnd.shuffle(stream).grouped(1 + rnd.nextInt(50)).toSeq
      val bufs = chunks.map { ch =>
        val b = agg.createAggregationBuffer()
        ch.foreach(s => agg.update(b,
          InternalRow(UTF8String.fromString(s))))
        b
      }
      val merged = rnd.shuffle(bufs).reduce(agg.merge)
      assert(merged.size <= m)
      val n = stream.size
      val freq = stream.groupBy(identity).view.mapValues(_.size.toLong)
      freq.foreach { case (s, f) =>
        if (f > n.toLong / (m + 1))
          assert(merged.contains(s),
            s"m=$m n=$n freq($s)=$f must be contained, got ${merged.keys}")
      }
      // weights never overcount
      merged.foreach { case (s, w) =>
        assert(w <= freq.getOrElse(s, 0L), s"$s overcounted")
      }
    }
  }

  test("BPE encode always rebuilds word</w> under random models") {
    val rnd = new Random(0xB0BA)
    (1 to 200).foreach { _ =>
      val alphabet = "abcd"
      def word() = Seq.fill(1 + rnd.nextInt(8))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val counts = Seq.fill(1 + rnd.nextInt(10))(word())
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val model = new Bpe.BpeModel(
        Bpe.trainFromCounts(counts, 1 + rnd.nextInt(20),
          minPairCount = 1L).map(x => (x._2, x._3)).toArray)
      (1 to 10).foreach { _ =>
        val w = word()
        val enc = Bpe.encodeWord(w, model)
        assert(enc.mkString == w + Bpe.EndOfWord,
          s"w=$w enc=$enc")
      }
    }
  }

  test("imageHash is container-invariant over random pixel grids") {
    val rnd = new Random(0xA11A)
    (1 to 200).foreach { _ =>
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(24)
      val px = Array.tabulate(h, w)((_, _) =>
        (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      // lossless containers of the same pixels must hash identically
      val viaBmp = MediaCodec.imageHash(MediaCodec.encodeBmp(px))
      val viaPpm = MediaCodec.imageHash(MediaCodec.encodePpm(px))
      val viaPng = MediaCodec.imageHash(MediaCodec.encodePng(px))
      assert(viaBmp.isDefined && viaBmp == viaPpm && viaBmp == viaPng,
        s"w=$w h=$h")
      val dBmp = MediaCodec.imageHash(MediaCodec.encodeBmp(px), dHash = true)
      val dPpm = MediaCodec.imageHash(MediaCodec.encodePpm(px), dHash = true)
      assert(dBmp == dPpm)
    }
  }

  test("audioHash is exactly volume-invariant when attenuation divides " +
      "every sample") {
    val rnd = new Random(0xB00B)
    (1 to 300).foreach { _ =>
      val n = 65 + rnd.nextInt(1000)
      // samples are multiples of 16 so /2, /4, /8, /16 divide exactly
      val ss = Array.tabulate[Short](n)(_ =>
        ((rnd.nextInt(4096) - 2048) * 16).toShort)
      val wav = MediaCodec.encodeWav(ss, 8000)
      val h = MediaCodec.audioHash(wav)
      assert(h.isDefined)
      Seq(2, 4, 8, 16).foreach { div =>
        val att = MediaCodec.attenuateWav(wav, div).get
        assert(MediaCodec.audioHash(att) == h, s"n=$n div=$div")
      }
    }
  }

  test("banded Hamming blocking is lossless under pigeonhole " +
      "(random hashes, every bands/maxDist combo)") {
    val rnd = new Random(0xD00D)
    // the claim behind imageNearDupPairs/audioNearDupPairs/PHashIndex:
    // for ANY two 64-bit values within maxDist < bands, at least one
    // of the `bands` contiguous chunks is untouched — verified here
    // directly on the chunk decomposition the operators use
    for (bands <- Seq(4, 8, 16); _ <- 1 to 500) {
      val width = 64 / bands
      val mask = if (width == 64) -1L else (1L << width) - 1L
      val maxDist = bands - 1
      val a = rnd.nextLong()
      // flip up to maxDist random bits
      val flips = rnd.shuffle((0 until 64).toList).take(rnd.nextInt(maxDist + 1))
      val b = flips.foldLeft(a)((v, bit) => v ^ (1L << bit))
      val shared = (0 until bands).exists(k =>
        ((a >>> (k * width)) & mask) == ((b >>> (k * width)) & mask))
      assert(shared,
        s"bands=$bands flipped=${flips.size}: no shared chunk")
    }
  }

  test("IVF residual + assigned centroid reconstructs within one " +
      "float32 ulp per component (random vectors)") {
    val rnd = new Random(0xE55E)
    val dim = 16
    val sample = Array.tabulate(64)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val model = Ivf.trainFromSample(sample, nlist = 4, iters = 2)
    (1 to 500).foreach { _ =>
      val v = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      val c = model.centroids(model.nearestDescend(v, 1)(0))
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v)
      val cl = model.nearestDescend(v, 1)(0)
      val r = model.residualData(arr, true, cl).toFloatArray()
      v.indices.foreach { i =>
        val back = r(i).toDouble + (if (i < c.length) c(i).toDouble else 0.0)
        // the only rounding is the residual's f32 narrowing — error is
        // bounded by half an ulp OF THE RESIDUAL (which can exceed the
        // vector's own ulp when the residual is the larger magnitude)
        assert(math.abs(back - v(i)) <= 0.5 * math.ulp(r(i)).toDouble,
          s"component $i: $back vs ${v(i)} (residual ${r(i)})")
      }
      // and the centroid dot replays the sequential fold exactly
      var want = 0.0
      var i = 0
      while (i < math.min(dim, c.length)) {
        want += v(i).toDouble * c(i).toDouble; i += 1
      }
      assert(java.lang.Double.doubleToLongBits(
        model.centroidDotData(arr, true, cl)) ==
        java.lang.Double.doubleToLongBits(want))
    }
  }

}
