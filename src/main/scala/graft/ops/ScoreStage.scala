package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The generic ML scoring stage — the skeleton every reference scorer
  * shares (SURVEY.md §2.8: partition → batch → model forward → enrich;
  * aesthetic_score.py:116-135, ocr_score.py:66-74, imaging_quality.py:
  * 80-92) re-expressed as one `mapPartitions` combinator:
  *
  *  - model/codec state is built once per partition via a lazy holder
  *    (the reference builds once per process, aesthetic_score.py:100-108)
  *  - rows are fed to the kernel in batches (DataLoader batch_size
  *    analog; batching amortizes model-call overhead)
  *  - kernel failures yield a null score + error column instead of
  *    killing the task (ocr_score.py:77-78's exit() is the bug we do NOT
  *    replicate; SURVEY §4.3)
  *  - resume semantics are an anti-join against the done set (P3), so
  *    re-running a stage is idempotent.
  */
object ScoreStage {

  /** A batched scoring kernel: one batch of input rows → one score (or
    * error) per row, order-preserving. */
  trait Kernel extends Serializable {
    def name: String
    /** Called once per partition before scoring (model load). */
    def setup(): Unit = ()
    def score(batch: Seq[Row]): Seq[Either[String, Double]]
  }

  /** Append `<outCol>` (double) and `<outCol>_error` (string) columns. */
  def scoreStage(df: DataFrame, kernel: Kernel, batchSize: Int = 8,
      outCol: String = "score"): DataFrame = {
    val outSchema = df.schema
      .add(StructField(outCol, DoubleType))
      .add(StructField(s"${outCol}_error", StringType))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { it =>
      kernel.setup() // once per partition, not per row (D4/§4.1)
      it.grouped(batchSize).flatMap { batch =>
        val scores =
          try kernel.score(batch)
          catch { case e: Exception => batch.map(_ => Left(e.getMessage)) }
        batch.zip(scores).map { case (row, res) =>
          Row.fromSeq(row.toSeq ++ (res match {
            case Right(v) => Seq(v, null)
            case Left(err) => Seq(null, err)
          }))
        }
      }
    }(enc)
  }

  /** P6 null-drop: remove rows whose kernel failed (collate_fn drop,
    * aesthetic_score.py:76-80). */
  def dropFailed(df: DataFrame, outCol: String): DataFrame =
    df.filter(col(outCol).isNotNull).drop(s"${outCol}_error")

  /** P3 resume: drop rows whose key is already in the done set. A
    * zero-byte/invalid "done" row counts as NOT done (ocr_score.py:64) —
    * callers pre-filter doneDf accordingly. */
  def resumeFilter(df: DataFrame, doneDf: DataFrame, key: String): DataFrame =
    df.join(doneDf.select(col(key)).distinct(), Seq(key), "left_anti")

  /** M4 imaging-quality kernel (imaging_quality.py:70-95 MUSIQ shape):
    * three "frames" are preprocessed with the F13 signed normalize
    * ((x/255 - 0.5) * 2, macvid.py:186-188 — [[graft.media.Media.Pixels]]
    * is the single implementation), scored per frame (mean activation),
    * and averaged — per-frame score, mean of 3. Deterministic: frame f =
    * embedding dims [21f, 21f+21); strict left-to-right folds mirror the
    * SQL oracle bit-for-bit. */
  final class ImagingQualityKernel extends Kernel {
    override def name = "imaging_quality"
    override def score(batch: Seq[Row]): Seq[Either[String, Double]] =
      batch.map { row =>
        val v = row.getAs[scala.collection.Seq[Float]]("embedding")
        if (v == null || v.length < 63) Left("embedding too short")
        else {
          val frames = (0 until 3).map { f =>
            val px = Array.tabulate(21)(i => v(f * 21 + i).toDouble)
            val norm = graft.media.Media.Pixels.signed(px)
            var s = 0.0
            norm.foreach(s += _)
            s / 21.0
          }
          Right((frames(0) + frames(1) + frames(2)) / 3.0)
        }
      }
  }

  /** M9 optical-flow score kernel (OFScore declared at README.md:109-116,
    * scripts/ofscore.sh:49-52; semantics mirror M8 = mean flow magnitude,
    * SURVEY §2 M9). The embedding's 64 dims are read as a dense 32-point
    * (u, v) flow field; score = mean sqrt(u²+v²), strict left-to-right
    * fold so the SQL oracle's list_reduce is bit-identical. */
  final class OpticalFlowKernel extends Kernel {
    override def name = "of_score"
    override def score(batch: Seq[Row]): Seq[Either[String, Double]] =
      batch.map { row =>
        val v = row.getAs[scala.collection.Seq[Float]]("embedding")
        if (v == null || v.length < 64) Left("flow field too short")
        else {
          var s = 0.0
          var i = 0
          while (i < 32) {
            val u = v(2 * i).toDouble
            val w = v(2 * i + 1).toDouble
            s += math.sqrt(u * u + w * w)
            i += 1
          }
          Right(s / 32.0)
        }
      }
  }

  /** M2 stand-in kernel: L2-normalize the embedding (F5, aesthetic_score
    * .py:69-74) and apply a fixed linear head — the deterministic shape
    * of the CLIP+MLP aesthetic scorer. Weights are rational so the exact
    * same arithmetic is expressible in the SQL oracle. */
  final class LinearHeadKernel(dim: Int) extends Kernel {
    override def name = "aesthetic_linear"
    private def w(i: Int): Double = (((i * 7) % 13) - 6) / 13.0
    override def score(batch: Seq[Row]): Seq[Either[String, Double]] =
      batch.map { row =>
        val v = row.getAs[scala.collection.Seq[Float]]("embedding")
        if (v == null || v.isEmpty) Left("null embedding")
        else {
          // left-to-right folds mirror the SQL oracle bit-for-bit;
          // zero vector normalizes by 1 (aesthetic_score.py:69-74)
          var ss = 0.0
          v.foreach(x => ss += x.toDouble * x.toDouble)
          val nrm = if (ss == 0.0) 1.0 else math.sqrt(ss)
          var dot = 0.0
          var i = 0
          v.foreach { x => dot += (x.toDouble / nrm) * w(i); i += 1 }
          Right(dot)
        }
      }
  }
}
