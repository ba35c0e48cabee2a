package graft

import graft.media.{FakeCodec, GrfCodec, Media, MediaCodec}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MediaCodec against REAL on-disk bytes: the GRF1 fixture container
  * exercises the full codec I/O lifecycle (open, header validation,
  * frame seek, truncation errors, clip re-encode) that FakeCodec's
  * path-hash kernels cannot — so the S8 error path and the K6 clip
  * sink are proven over actual files, not just the trait's shape. */
class MediaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  private def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("grf")

  /** 4x3 plane whose bytes encode (frame, pixel) so any slice is
    * recognizable after a round-trip. */
  private def plane(frame: Int): Array[Byte] =
    Array.tabulate(12)(p => (frame * 16 + p).toByte)

  private def writeFixture(dir: java.nio.file.Path, name: String,
      nFrames: Int): String = {
    val p = dir.resolve(name).toString
    GrfCodec.write(p, 4, 3, 24.0, (0 until nFrames).map(plane))
    p
  }

  test("GrfCodec probe/decode round-trips real header and frame bytes") {
    val dir = tmpDir()
    val p = writeFixture(dir, "a.grf", 10)
    val info = GrfCodec.probe(p)
    assert(info.width == 4 && info.height == 3 && info.fps == 24.0)
    assert(info.nFrames == 10 && math.abs(info.duration - 10 / 24.0) < 1e-12)
    assert(GrfCodec.decodeFrame(p, 0).toSeq == plane(0).toSeq)
    assert(GrfCodec.decodeFrame(p, 7).toSeq == plane(7).toSeq)
    // decodeAuto dispatches .grf through the video arm
    assert(GrfCodec.decodeAuto(p, 3).get.toSeq == plane(3).toSeq)
  }

  test("GrfCodec rejects malformed inputs loudly; decodeAuto nulls them") {
    val dir = tmpDir()
    val good = writeFixture(dir, "good.grf", 5)
    // missing file
    intercept[Exception](GrfCodec.probe(dir.resolve("no.grf").toString))
    // bad magic
    val badMagic = dir.resolve("bad.grf").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(badMagic),
      "JUNKJUNKJUNKJUNKJUNKJUNK".getBytes)
    intercept[Exception](GrfCodec.probe(badMagic))
    // truncated body: header says 5 frames, file carries 2.5
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(good))
    val cut = dir.resolve("cut.grf").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(cut),
      bytes.take(24 + 30)) // header(24) + 2.5 planes
    intercept[Exception](GrfCodec.decodeFrame(cut, 4))
    // out-of-range frame
    intercept[Exception](GrfCodec.decodeFrame(good, 5))
    // the S8 contract: every failure is a None, never an escape
    assert(GrfCodec.decodeAuto(badMagic).isEmpty)
    assert(GrfCodec.decodeAuto(cut, 4).isEmpty)
    assert(GrfCodec.decodeAuto(good, 99).isEmpty)
    assert(GrfCodec.decodeAuto(dir.resolve("x.unknown").toString).isEmpty)
  }

  test("S4-S6 sampler over real files: frames decode, truncated file -> null row") {
    import spark.implicits._
    val dir = tmpDir()
    val good = writeFixture(dir, "ok.grf", 30)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(good))
    val cut = dir.resolve("trunc.grf").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(cut), bytes.take(24 + 18))
    val out = Media.withSampledFrames(
      Seq(good, cut).toDF("path"), "path", "first_mid_last", GrfCodec)
      .select(col("path"), col("frames")).collect()
      .map(r => r.getString(0) -> r.getSeq[Array[Byte]](1)).toMap
    assert(out(good).map(_.toSeq) ==
      Seq(plane(0).toSeq, plane(15).toSeq, plane(29).toSeq))
    // mid/last frames of the truncated file fail to decode -> null
    // ELEMENTS (the probe itself succeeded), not a dead task
    assert(out(cut)(0).toSeq == plane(0).toSeq && out(cut)(2) == null)
  }

  test("K6 clipFiles round-trips real clip bytes through the sink") {
    import spark.implicits._
    val dir = tmpDir()
    val src = writeFixture(dir, "movie.grf", 20)
    val outDir = dir.resolve("clips").toString
    val rows = Seq((src, 3L, 7L), (src, 10L, 12L)).toDF("path", "s", "e")
    val written = graft.io.Sinks.clipFiles(rows, "path", "s", "e", outDir,
      GrfCodec).collect()
    assert(written.forall(_.getAs[String]("clip_path_error") == null))
    written.foreach { r =>
      val (s, e) = (r.getAs[Long]("s"), r.getAs[Long]("e"))
      val clip = r.getAs[String]("clip_path")
      val info = GrfCodec.probe(clip)
      assert(info.nFrames == e - s && info.width == 4 && info.height == 3)
      (0L until e - s).foreach { i =>
        assert(GrfCodec.decodeFrame(clip, i).toSeq ==
          plane((s + i).toInt).toSeq) // bytes, not just counts
      }
    }
    // failure arm: a clip range past EOF errors the ROW, not the task
    val bad = graft.io.Sinks.clipFiles(
      Seq((src, 15L, 25L)).toDF("path", "s", "e"), "path", "s", "e",
      outDir, GrfCodec).collect().head
    assert(bad.getAs[String]("clip_path") == null &&
      bad.getAs[String]("clip_path_error") != null)
  }

  test("S1 scan + M1 scene detection run over a directory of real files") {
    val dir = tmpDir()
    // two scenes: 6 near-constant frames, then a hard jump for 6 more
    val planes = (0 until 6).map(_ => Array.fill[Byte](12)(10)) ++
      (0 until 6).map(_ => Array.fill[Byte](12)(120))
    val p = dir.resolve("scenes.grf").toString
    GrfCodec.write(p, 4, 3, 24.0, planes)
    val scanned = Media.scanVideoDir(spark, dir.toString)
    assert(scanned.count() == 1) // pathGlobFilter admits .grf
    val scenes = Media.detectScenes(scanned, "path", threshold = 30.0,
      codec = GrfCodec)
      .select("scene_start_idx", "scene_end_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(scenes.toSeq == Seq((0L, 6L), (6L, 12L)))
  }

  test("end-to-end on real bytes: scan -> probe -> detect -> split -> recount") {
    import spark.implicits._
    // The whole reference pipeline over GRF fixtures in ONE flow: S1
    // directory scan, S9 probe, M1 scene detection, K6 clip sink, then
    // a RE-SCAN of the sink output closed by the A6 count check — the
    // round-trip a production run performs between crawl and archive.
    val dir = tmpDir()
    def flat(v: Int) = Array.fill[Byte](12)(v.toByte)
    // movieA: three 6-frame scenes (hard jumps at 6 and 12)
    GrfCodec.write(dir.resolve("movieA.grf").toString, 4, 3, 24.0,
      (0 until 6).map(_ => flat(10)) ++ (0 until 6).map(_ => flat(80)) ++
        (0 until 6).map(_ => flat(160)))
    // movieB: one 8-frame scene
    GrfCodec.write(dir.resolve("movieB.grf").toString, 4, 3, 24.0,
      (0 until 8).map(_ => flat(42)))
    // S1 + S9: scan the dir, probe real headers
    val scanned = Media.scanVideoDir(spark, dir.toString)
    val probed = Media.withMediaInfo(scanned, "path", GrfCodec)
    val frames = probed.select(col("path"), col("media_info.n_frames"))
      .as[(String, Long)].collect().toMap
    assert(frames.size == 2 && frames.values.toSet == Set(18L, 8L))
    // M1: scene detection over decoded frame bytes
    val scenes = Media.detectScenes(probed, "path", threshold = 30.0,
      codec = GrfCodec)
    val perSource = scenes.groupBy(col("path"))
      .agg(count(lit(1)).as("n_expected"))
    // K6: materialize each scene as a standalone clip file
    val clipDir = dir.resolve("clips").toString
    val written = graft.io.Sinks.clipFiles(
      scenes.select(col("path"), col("scene_start_idx"),
        col("scene_end_idx")),
      "path", "scene_start_idx", "scene_end_idx", clipDir, GrfCodec)
    assert(written.filter(col("clip_path_error").isNotNull).count() == 0)
    // re-scan the SINK OUTPUT as its own corpus; every clip must probe
    // with exactly its scene's frame span, and the split frame bytes
    // must equal the source frames they came from
    val rescanned = Media.scanVideoDir(spark, clipDir)
    val clipInfo = Media.withMediaInfo(rescanned, "path", GrfCodec)
      .select(col("path"), col("media_info.n_frames").as("nf"))
      .as[(String, Long)].collect()
    assert(clipInfo.map(_._2).sorted.toSeq == Seq(6L, 6L, 6L, 8L))
    val firstA = clipInfo.map(_._1).filter(_.contains("movieA"))
      .map(p => GrfCodec.decodeFrame(p, 0).head.toInt & 0xff).sorted
    assert(firstA.toSeq == Seq(10, 80, 160)) // one clip per scene, bytes intact
    // A6: expected scene count per source vs clips actually on disk
    // (clip filenames carry the source stem — parse it back out)
    val actual = rescanned
      .withColumn("stem",
        regexp_extract(col("path"), "([^/]+)_[0-9a-f]{8}_", 1))
      .groupBy(col("stem")).agg(count(lit(1)).as("n_actual"))
    val expected = perSource
      .withColumn("stem",
        regexp_extract(col("path"), "([^/]+)\\.grf$", 1))
      .select(col("stem"), col("n_expected"))
    val check = graft.ops.QualityOps.checkCounts(
      expected, actual, "stem", "n_expected", "n_actual", tol = 0L)
      .select(col("stem"), col("n_expected"), col("n_actual"), col("ok"))
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(check == Set(("movieA", 3L, 3L, true), ("movieB", 1L, 1L, true)),
      check.toString)
  }

  test("FakeCodec and GrfCodec share the trait's contentDelta kernel") {
    val a = Array.fill[Byte](12)(10)
    val b = Array.fill[Byte](12)(40)
    assert((FakeCodec: MediaCodec).contentDelta(a, b) == 30.0)
    assert((GrfCodec: MediaCodec).contentDelta(a, b) == 30.0)
  }
}
