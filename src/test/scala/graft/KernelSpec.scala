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

  test("F13 normalize kernels match hand-computed pixels") {
    assert(Media.Pixels.div255(Array(0.0, 127.5, 255.0)).toSeq ==
      Seq(0.0, 0.5, 1.0))
    assert(Media.Pixels.signed(Array(0.0, 127.5, 255.0)).toSeq ==
      Seq(-1.0, 0.0, 1.0))
  }

  test("F13 shorter-side-512 dims preserve aspect") {
    assert(Media.Pixels.shorterSideDims(1024, 2048) == (512, 1024))
    assert(Media.Pixels.shorterSideDims(1920, 1080) == (910, 512))
    assert(Media.Pixels.shorterSideDims(512, 512) == (512, 512))
  }

  test("F13 resize and center-crop against a hand-built plane") {
    // 4x2 plane, values = x + 10*y
    val px = Array(0.0, 1, 2, 3, 10, 11, 12, 13)
    // nearest-neighbor 2x downscale in x keeps columns 0 and 2
    assert(Media.Pixels.resize(px, 4, 2, 2, 2).toSeq ==
      Seq(0.0, 2.0, 10.0, 12.0))
    // center crop 2x2 of a 4x2 keeps columns 1-2
    assert(Media.Pixels.centerCrop(px, 4, 2, 2, 2).toSeq ==
      Seq(1.0, 2.0, 11.0, 12.0))
  }

  test("F13 preprocess mode flag dispatches and rejects unknowns") {
    val px = Array.fill(4)(255.0)
    assert(Media.Pixels.preprocess("div255")(px, 2, 2)._1.forall(_ == 1.0))
    assert(Media.Pixels.preprocess("signed")(px, 2, 2)._1.forall(_ == 1.0))
    // shorter-side-512 UPSCALES small images (torchvision Resize(512)
    // semantics) then center-crops to 512x512
    val (rp, rw, rh) = Media.Pixels.preprocess("resize512")(px, 2, 2)
    assert(rw == 512 && rh == 512 && rp.length == 512 * 512)
    assert(rp.forall(_ == 1.0)) // constant plane survives resize+crop
    val err = intercept[IllegalArgumentException] {
      Media.Pixels.preprocess("bogus")(px, 2, 2)
    }
    assert(err.getMessage.contains("div255"))
  }

  test("S8 decodeAuto dispatches by extension; unknown/broken is None") {
    assert(FakeCodec.decodeAuto("/v/a.mp4").isDefined)
    assert(FakeCodec.decodeAuto("/v/a.png").isDefined)
    assert(FakeCodec.decodeAuto("/v/a.xyz").isEmpty)
    assert(FakeCodec.decodeAuto("noext").isEmpty)
    // image arm decodes frame 0 regardless of the requested index
    assert(FakeCodec.decodeAuto("/v/a.png", 7).get.toSeq ==
      FakeCodec.decodeImage("/v/a.png").toSeq)
  }

  test("K6 encodeClip is deterministic and span-sensitive") {
    val a = FakeCodec.encodeClip("/v/a.mp4", 0, 48)
    assert(a.toSeq == FakeCodec.encodeClip("/v/a.mp4", 0, 48).toSeq)
    assert(a.toSeq != FakeCodec.encodeClip("/v/a.mp4", 0, 49).toSeq)
    intercept[IllegalArgumentException] {
      FakeCodec.encodeClip("/v/a.mp4", 5, 5)
    }
  }

  test("K7 archiveShards gates on the count check, then zips and cleans") {
    def mkShard(n: Int): java.io.File = {
      val d = java.nio.file.Files.createTempDirectory("shard").toFile
      (0 until n).foreach { i =>
        java.nio.file.Files.write(new java.io.File(d, s"f$i.bin").toPath,
          Array.fill(16)(i.toByte))
      }
      d
    }
    val ok = mkShard(5)
    val res = graft.io.Sinks.archiveShards(ok.getPath, expectedFiles = 6)
    val zip = res match {
      case graft.io.Sinks.Archived(p, warn) => assert(warn.isEmpty); p
      case other => fail(s"expected Archived, got $other")
    }
    assert(!ok.exists(), "raw dir must be deleted after archiving")
    val zf = new java.util.zip.ZipFile(zip)
    try assert(zf.size() == 5) finally zf.close()
    // a failed count check must REFUSE and leave the raw files untouched
    val bad = mkShard(5)
    val err = graft.io.Sinks.archiveShards(bad.getPath, expectedFiles = 20)
    assert(err.isInstanceOf[graft.io.Sinks.ArchiveRefused])
    assert(bad.exists() && bad.listFiles().length == 5)
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
