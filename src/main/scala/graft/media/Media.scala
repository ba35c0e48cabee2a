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

  /** M1 content-change score between consecutive frames (the
    * PySceneDetect ContentDetector kernel, utils/scenecut.py:88-93). */
  def contentDelta(prev: Array[Byte], cur: Array[Byte]): Double
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
  override def contentDelta(prev: Array[Byte], cur: Array[Byte]): Double =
    prev.zip(cur).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
      .sum.toDouble / prev.length
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
    Seq("mp4", "avi", "mkv", "mov", "wmv", "flv", "webm", "mpeg", "mpg")

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

  /** S4-S6 unified sampler: decode the frames selected by a policy into
    * an ArrayType(BinaryType) column. Decode cost is per selected frame
    * (never the whole clip), and rows stay where their partition is —
    * no shuffle. */
  def withSampledFrames(df: DataFrame, pathCol: String, policy: String,
      codec: MediaCodec = FakeCodec): DataFrame = {
    val sampler = udf { path: String =>
      val n = codec.probe(path).nFrames
      val idx = policy match {
        case "fractional" => FrameIndex.fractional(n, Seq(0.2, 0.5, 0.8))
        case "first_mid_last" => FrameIndex.firstMidLast(n)
        case s if s.startsWith("stride") =>
          FrameIndex.strided(n, s.stripPrefix("stride").toLong)
      }
      idx.map(i => codec.decodeFrame(path, i)).toArray
    }
    df.withColumn("frames", sampler(col(pathCol)))
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
