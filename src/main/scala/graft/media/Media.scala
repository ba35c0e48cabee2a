package graft.media

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media (video/image/audio) column support.
  *
  * Design (SURVEY.md §7.3): binary assets are opaque `BINARY` columns (or
  * paths into object storage) with typed metadata alongside; every codec
  * touchpoint hides behind [[MediaCodec]]. The build environment has no
  * codec libraries (offline), so the shipped implementation is
  * [[FakeCodec]] — a deterministic stand-in with the same interface and
  * batch shape; the Spark-side plumbing (schema, partitioning, UDF
  * signatures, explode) is real and tested. A production deployment
  * plugs a JavaCPP-FFmpeg codec into the same trait.
  */
trait MediaCodec extends Serializable {

  /** S9 media probe (ffprobe resolution/fps/frames;
    * evaluations/scene_cut.py:28-34, utils/utils.py:8-15). */
  def probe(path: String): MediaInfo

  /** Decode one frame (S4-S6 samplers decode only selected indices;
    * data_schema/macvidataset.py:29-42). */
  def decodeFrame(path: String, frameIdx: Long): Array[Byte]

  /** Decode a still image (the gif/png arm of the S8 dispatch;
    * imaging_quality.py:12-35 load_gif_frames/load_image). */
  def decodeImage(path: String): Array[Byte] = decodeFrame(path, 0L)

  /** K6: encode frames [startIdx, endIdx) of the source as a standalone
    * clip container (utils/scenecut.py:120-121 split_video_ffmpeg;
    * evaluations/scene_cut.py:207-208) — the pipeline's primary physical
    * output. */
  def encodeClip(path: String, startIdx: Long, endIdx: Long): Array[Byte]

  /** M1 content-change score between consecutive frames (the
    * PySceneDetect ContentDetector kernel, utils/scenecut.py:88-93):
    * mean absolute plane difference — codec-independent, so it lives
    * on the trait. */
  def contentDelta(prev: Array[Byte], cur: Array[Byte]): Double = {
    // Mismatched or empty planes would silently truncate via zip (or
    // divide by zero) and bias the score; fail loudly instead so the
    // caller's S8 error path surfaces it (ADVICE r5).
    require(prev.length == cur.length && prev.nonEmpty,
      s"contentDelta: plane length mismatch or empty (prev=${prev.length}, cur=${cur.length})")
    prev.zip(cur).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
      .sum.toDouble / prev.length
  }

  /** S8 polymorphic loader: dispatch on file extension — still images
    * decode whole, video containers decode frame `frameIdx`, anything
    * unrecognized yields None (the reference raises NotImplementedError,
    * imaging_quality.py:44-46; per SURVEY §4.3 an unreadable asset
    * becomes a null row, never a dead task). */
  final def decodeAuto(path: String, frameIdx: Long = 0L): Option[Array[Byte]] = {
    val dot = path.lastIndexOf('.')
    val ext = if (dot < 0) "" else path.substring(dot + 1).toLowerCase
    try {
      if (MediaCodec.imageExtensions.contains(ext)) Some(decodeImage(path))
      else if (Media.videoExtensions.contains(ext)) Some(decodeFrame(path, frameIdx))
      else None
    } catch { case _: Exception => None }
  }
}

object MediaCodec {
  /** Still-image arm of the S8 dispatch (imaging_quality.py:12-35). */
  val imageExtensions: Seq[String] = Seq("gif", "png", "jpg", "jpeg", "bmp", "webp")
}

final case class MediaInfo(width: Int, height: Int, fps: Double,
    nFrames: Long, duration: Double)

/** Deterministic fake codec: everything derives from a hash of the path
  * so tests are stable and distributed runs agree on every executor. */
object FakeCodec extends MediaCodec {
  private def h(s: String): Long = {
    var x = 1125899906842597L
    s.foreach(c => x = 31 * x + c)
    x & 0x7fffffffffffffffL
  }
  override def probe(path: String): MediaInfo = {
    val k = h(path)
    val fps = 24.0 + (k % 7).toDouble
    val n = 48 + (k % 2000)
    MediaInfo(640 + 16 * (k % 41).toInt, 360 + 9 * (k % 41).toInt,
      fps, n, n / fps)
  }
  override def decodeFrame(path: String, frameIdx: Long): Array[Byte] = {
    val k = h(s"$path#$frameIdx")
    Array.tabulate(64)(i => ((k >> (i % 56)) & 0xff).toByte)
  }
  override def encodeClip(path: String, startIdx: Long, endIdx: Long): Array[Byte] = {
    require(endIdx > startIdx, s"empty clip [$startIdx, $endIdx)")
    val k = h(s"$path[$startIdx,$endIdx)")
    // length scales with the span so size-based assertions are possible
    val len = 32 + math.min(endIdx - startIdx, 4096L).toInt
    Array.tabulate(len)(i => ((k >> (i % 56)) & 0xff).toByte)
  }
}

/** A codec that reads REAL bytes from disk — over "GRF1", a trivial
  * deterministic container (big-endian header
  * `'G' 'R' 'F' '1' | width:i32 | height:i32 | fps_milli:i32 |
  * n_frames:i64`, then `n_frames` row-major grayscale planes of
  * width·height bytes each). The format exists so the [[MediaCodec]]
  * seam is exercised end-to-end against actual files — open, header
  * validation, frame seek, short-read/truncation errors, clip
  * re-encode — the I/O lifecycle a production FFmpeg binding walks
  * (imaging_quality.py:12-46 dispatch; utils/scenecut.py:120-121
  * split), with none of its codec dependencies. Every malformed input
  * THROWS (missing file, bad magic, corrupt header, out-of-range
  * frame, truncated body); `decodeAuto`/the sampler UDFs translate
  * that to the S8 null-row error path, never a dead task. */
object GrfCodec extends MediaCodec {
  private val Magic = "GRF1".getBytes("US-ASCII")
  private val HeaderLen = 4 + 4 + 4 + 4 + 8

  private final case class Header(width: Int, height: Int, fpsMilli: Int,
      nFrames: Long) {
    def frameSize: Int = width * height
    def fps: Double = fpsMilli / 1000.0
  }

  private def withFile[A](path: String)(f: java.io.RandomAccessFile => A): A = {
    // the binaryFile source (scanVideoDir) hands out file: URIs — a real
    // codec binding must accept both those and plain local paths
    val local =
      if (path.startsWith("file:"))
        java.nio.file.Paths.get(java.net.URI.create(path)).toString
      else path
    val raf = new java.io.RandomAccessFile(local, "r")
    try f(raf) finally raf.close()
  }

  private def header(raf: java.io.RandomAccessFile): Header = {
    val m = new Array[Byte](4)
    raf.readFully(m)
    require(m.sameElements(Magic), "not a GRF1 container")
    val h = Header(raf.readInt(), raf.readInt(), raf.readInt(), raf.readLong())
    require(h.width > 0 && h.height > 0 && h.fpsMilli > 0 && h.nFrames >= 0 &&
      h.width.toLong * h.height <= Int.MaxValue, "corrupt GRF1 header")
    h
  }

  override def probe(path: String): MediaInfo = withFile(path) { raf =>
    val h = header(raf)
    MediaInfo(h.width, h.height, h.fps, h.nFrames, h.nFrames / h.fps)
  }

  override def decodeFrame(path: String, frameIdx: Long): Array[Byte] =
    withFile(path) { raf =>
      val h = header(raf)
      require(frameIdx >= 0 && frameIdx < h.nFrames,
        s"frame $frameIdx out of [0, ${h.nFrames})")
      raf.seek(HeaderLen + frameIdx * h.frameSize.toLong)
      val buf = new Array[Byte](h.frameSize)
      raf.readFully(buf) // EOFException on a truncated body
      buf
    }

  override def encodeClip(path: String, startIdx: Long, endIdx: Long): Array[Byte] = {
    require(endIdx > startIdx, s"empty clip [$startIdx, $endIdx)")
    withFile(path) { raf =>
      val h = header(raf)
      require(startIdx >= 0 && endIdx <= h.nFrames,
        s"clip [$startIdx, $endIdx) out of [0, ${h.nFrames})")
      val out = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(out)
      d.write(Magic); d.writeInt(h.width); d.writeInt(h.height)
      d.writeInt(h.fpsMilli); d.writeLong(endIdx - startIdx)
      raf.seek(HeaderLen + startIdx * h.frameSize.toLong)
      val buf = new Array[Byte](h.frameSize)
      (startIdx until endIdx).foreach { _ =>
        raf.readFully(buf); d.write(buf)
      }
      d.flush()
      out.toByteArray
    }
  }

  /** Test-fixture writer: one GRF1 file from in-memory planes. */
  def write(path: String, width: Int, height: Int, fps: Double,
      frames: Seq[Array[Byte]]): Unit = {
    require(frames.forall(_.length == width * height),
      s"every plane must be $width x $height bytes")
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path)))
    try {
      out.write(Magic); out.writeInt(width); out.writeInt(height)
      out.writeInt(math.round(fps * 1000).toInt); out.writeLong(frames.length.toLong)
      frames.foreach(out.write)
    } finally out.close()
  }
}

object Media {

  /** Frame-index policies of the reference, as pure kernels (oracle-
    * checked in SparkEntry via q13_frame_sampler; unit-tested here). */
  object FrameIndex {
    /** S4: fractional points (macvidataset.py:21). */
    def fractional(nFrames: Long, points: Seq[Double]): Seq[Long] =
      points.map(p => math.floor(nFrames * p).toLong)
    /** S5: first/mid/last with degenerate guard (coca_caption.py:41-53). */
    def firstMidLast(nFrames: Long, num: Int = 3): Seq[Long] =
      if (nFrames <= num) Seq.fill(num)(0L)
      else Seq(0L, nFrames / 2, nFrames - 1)
    /** S6: stride sampling (ocr_score.py:12-27, default 10). */
    def strided(nFrames: Long, stride: Long = 10): Seq[Long] =
      0L.to(nFrames - 1).by(stride)
  }

  /** S1 video-directory scan: binary-file source with the reference's
    * extension whitelist (utils/scenecut.py:101-112). Reads metadata
    * lazily — content only when a downstream op needs the bytes. */
  val videoExtensions: Seq[String] =
    Seq("mp4", "avi", "mkv", "mov", "wmv", "flv", "webm", "mpeg", "mpg",
      "grf") // the [[GrfCodec]] fixture container rides the same dispatch

  def scanVideoDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", s"*.{${videoExtensions.mkString(",")}}")
      .load(dir)
      .select(col("path"), col("length"), col("modificationTime"))

  /** S8/S9: probe UDF attaching a media-info struct column. */
  def withMediaInfo(df: DataFrame, pathCol: String,
      codec: MediaCodec = FakeCodec): DataFrame = {
    val probeUdf = udf { path: String =>
      val i = codec.probe(path)
      (i.width, i.height, i.fps, i.nFrames, i.duration)
    }
    df.withColumn("media_info",
      probeUdf(col(pathCol))
        .cast("struct<width:int,height:int,fps:double,n_frames:bigint,duration:double>"))
  }

  /** F13 pixel-preprocessing kernels (imaging_quality.py:48-68 transform
    * modes; macvid.py:186-188 signed normalize). The image model is the
    * codec's grayscale byte plane; every kernel is a pure function so the
    * Spark side (mapInPandas analog = mapPartitions batches) carries no
    * semantics of its own. */
  object Pixels {
    /** `x / 255` normalization (imaging_quality.py:50). */
    def div255(px: Array[Double]): Array[Double] = px.map(_ / 255.0)

    /** `(x / 255 - 0.5) * 2` signed normalization (macvid.py:186-188). */
    def signed(px: Array[Double]): Array[Double] =
      px.map(x => (x / 255.0 - 0.5) * 2.0)

    /** Shorter-side-`target` scaled dims, aspect preserved
      * (imaging_quality.py:56-60). */
    def shorterSideDims(w: Int, h: Int, target: Int = 512): (Int, Int) =
      if (w <= h) (target, math.round(h.toDouble * target / w).toInt)
      else (math.round(w.toDouble * target / h).toInt, target)

    /** Nearest-neighbor resize of a row-major w×h plane. */
    def resize(px: Array[Double], w: Int, h: Int,
        ow: Int, oh: Int): Array[Double] = {
      require(px.length == w * h, s"${px.length} != $w x $h")
      Array.tabulate(ow * oh) { i =>
        val (ox, oy) = (i % ow, i / ow)
        val sx = math.min(w - 1, ox * w / ow)
        val sy = math.min(h - 1, oy * h / oh)
        px(sy * w + sx)
      }
    }

    /** Center crop to cw×ch (imaging_quality.py:61-63). */
    def centerCrop(px: Array[Double], w: Int, h: Int,
        cw: Int, ch: Int): Array[Double] = {
      require(cw <= w && ch <= h, s"crop ${cw}x$ch > ${w}x$h")
      val (x0, y0) = ((w - cw) / 2, (h - ch) / 2)
      Array.tabulate(cw * ch) { i =>
        val (ox, oy) = (i % cw, i / cw)
        px((y0 + oy) * w + (x0 + ox))
      }
    }

    val modes: Seq[String] = Seq("div255", "signed", "resize512")

    /** The `--mode` policy flag (imaging_quality.py:123): named
      * preprocessing pipelines over a w×h plane. Returns (pixels, w, h).
      */
    def preprocess(mode: String)(px: Array[Double], w: Int, h: Int)
        : (Array[Double], Int, Int) = mode match {
      case "div255" => (div255(px), w, h)
      case "signed" => (signed(px), w, h)
      case "resize512" =>
        val (sw, sh) = shorterSideDims(w, h, 512)
        val scaled = resize(px, w, h, sw, sh)
        val side = math.min(512, math.min(sw, sh))
        val cropped = centerCrop(scaled, sw, sh, side, side)
        (div255(cropped), side, side)
      case other => throw new IllegalArgumentException(
        s"unknown preprocess mode '$other'; valid: ${modes.mkString(", ")}")
    }
  }

  private val framePolicies =
    Seq("fractional", "first_mid_last", "stride<N>")

  /** S4-S6 unified sampler: decode the frames selected by a policy into
    * an ArrayType(BinaryType) column. Decode cost is per selected frame
    * (never the whole clip), and rows stay where their partition is —
    * no shuffle. An undecodable asset yields a null frames array (S8
    * error path), never a dead task. The policy is validated HERE, on
    * the driver — an invalid one must be an immediate
    * IllegalArgumentException, not a MatchError inside an executor UDF.
    */
  def withSampledFrames(df: DataFrame, pathCol: String, policy: String,
      codec: MediaCodec = FakeCodec): DataFrame = {
    val ok = policy == "fractional" || policy == "first_mid_last" ||
      (policy.startsWith("stride") &&
        scala.util.Try(policy.stripPrefix("stride").toLong).toOption
          .exists(_ >= 1)) // stride0 / overflow must fail HERE, not as
                           // an executor-side exception swallowed to null
    if (!ok) throw new IllegalArgumentException(
      s"unknown frame policy '$policy'; valid: ${framePolicies.mkString(", ")}")
    val sampler = udf { path: String =>
      try {
        val n = codec.probe(path).nFrames
        val idx = policy match {
          case "fractional" => FrameIndex.fractional(n, Seq(0.2, 0.5, 0.8))
          case "first_mid_last" => FrameIndex.firstMidLast(n)
          case s => FrameIndex.strided(n, s.stripPrefix("stride").toLong)
        }
        idx.map(i => codec.decodeAuto(path, i).orNull).toArray
      } catch { case _: Exception => null }
    }
    df.withColumn("frames", sampler(col(pathCol)))
  }

  /** S7 strided-window batch reader (data_schema/macvid.py:126-190): the
    * training consumer's view of a clip — stride-S frame subsampling
    * (`:176-178`), a fixed-length window at an offset derived
    * deterministically from the path (the reference randomizes,
    * `:180-183`; determinism keeps distributed retries and tests
    * agreeing), per-frame decode, F13 signed [-1,1] normalize
    * (`:186-188`), emitted as `batch: Array[Array[Float]]` — one inner
    * array per frame, channel-major (the CHW permute is the identity for
    * the codec's single-channel plane). Frames whose decode fails yield
    * an empty inner array (S8 error path) rather than a dead task; a
    * clip shorter than the window yields a null batch. Decode cost is
    * per selected frame and rows never shuffle. */
  def trainingWindows(df: DataFrame, pathCol: String, stride: Long = 4,
      windowLen: Int = 16, codec: MediaCodec = FakeCodec): DataFrame = {
    require(stride >= 1 && windowLen >= 1,
      s"stride=$stride windowLen=$windowLen must be >= 1")
    val reader = udf { path: String =>
      // an unprobe-able asset yields a null batch, never a dead task
      // (S8 error path — FakeCodec never throws but a real codec does)
      val n = try codec.probe(path).nFrames
        catch { case _: Exception => -1L }
      val idx = if (n < 0) Seq.empty[Long] else FrameIndex.strided(n, stride)
      if (idx.length < windowLen) null
      else {
        val slots = idx.length - windowLen + 1
        // stand-in for the reference's random window start: stable per path
        val off = (math.abs(path.hashCode.toLong) % slots).toInt
        idx.slice(off, off + windowLen).map { i =>
          codec.decodeAuto(path, i) match {
            case Some(bytes) =>
              Pixels.signed(bytes.map(b => (b & 0xff).toDouble))
                .map(_.toFloat)
            case None => Array.empty[Float]
          }
        }.toArray
      }
    }
    df.withColumn("batch", reader(col(pathCol)))
  }

  /** M1 scene detection over decoded frames: contentDelta > threshold ⇒
    * cut (threshold 30.0 = the reference default, utils/scenecut.py:96).
    * Returns one row per detected scene via explode — the 1→N generator.
    */
  def detectScenes(df: DataFrame, pathCol: String, threshold: Double = 30.0,
      codec: MediaCodec = FakeCodec): DataFrame = {
    val detect = udf { path: String =>
      val info = codec.probe(path)
      val stride = math.max(1L, info.nFrames / 64) // sampled detection
      val idx = FrameIndex.strided(info.nFrames, stride)
      val frames = idx.map(i => codec.decodeFrame(path, i))
      val cuts = idx.zip(frames).sliding(2).collect {
        case Seq((_, a), (i2, b)) if codec.contentDelta(a, b) > threshold => i2
      }.toSeq
      val bounds = (0L +: cuts) :+ info.nFrames
      bounds.sliding(2).map { case Seq(s, e) => (s, e) }.toArray
    }
    df.withColumn("scene", explode(detect(col(pathCol))))
      .withColumn("scene_start_idx", col("scene._1"))
      .withColumn("scene_end_idx", col("scene._2"))
      .drop("scene")
  }
}
