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
}
