package graft

import graft.media.{FakeCodec, Media}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel tests: no SparkSession needed. */
class KernelSpec extends AnyFunSuite {

  test("fractional frame indices (S4: 0.2/0.5/0.8)") {
    assert(Media.FrameIndex.fractional(100, Seq(0.2, 0.5, 0.8)) ==
      Seq(20L, 50L, 80L))
    assert(Media.FrameIndex.fractional(1, Seq(0.2, 0.5, 0.8)) ==
      Seq(0L, 0L, 0L))
  }

  test("first/mid/last with degenerate guard (S5, coca_caption.py:41-53)") {
    assert(Media.FrameIndex.firstMidLast(100) == Seq(0L, 50L, 99L))
    assert(Media.FrameIndex.firstMidLast(3) == Seq(0L, 0L, 0L))
    assert(Media.FrameIndex.firstMidLast(2) == Seq(0L, 0L, 0L))
  }

  test("strided sampling (S6, default stride 10)") {
    assert(Media.FrameIndex.strided(25) == Seq(0L, 10L, 20L))
    assert(Media.FrameIndex.strided(1) == Seq(0L))
  }

  test("fake codec is deterministic and shape-stable") {
    val a = FakeCodec.probe("/x/y.mp4")
    val b = FakeCodec.probe("/x/y.mp4")
    assert(a == b)
    assert(a.nFrames > 0 && a.fps > 0)
    assert(FakeCodec.decodeFrame("/x/y.mp4", 3).toSeq ==
      FakeCodec.decodeFrame("/x/y.mp4", 3).toSeq)
    assert(FakeCodec.contentDelta(
      FakeCodec.decodeFrame("p", 0), FakeCodec.decodeFrame("p", 0)) == 0.0)
  }

  test("MinHashAgg matches a direct per-seed md5 minimum") {
    val agg = new functions.MinHashAgg(4)
    val shingles = Seq("a b c", "b c d", "c d e")
    val viaAgg = shingles.foldLeft(agg.zero)(agg.reduce)
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    (0 until 4).foreach { i =>
      assert(viaAgg(i) == shingles.map(x => md5Hex(s"$i:$x")).min)
    }
    // merge is commutative/idempotent on the same data
    val halves = agg.merge(
      shingles.take(1).foldLeft(agg.zero)(agg.reduce),
      shingles.drop(1).foldLeft(agg.zero)(agg.reduce))
    assert(halves.toSeq == viaAgg.toSeq)
  }
}
