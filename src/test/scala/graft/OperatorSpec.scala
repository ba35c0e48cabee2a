package graft

import graft.ops.ScoreStage
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-level tests over the sf0.001 testdata: semantics invariants,
  * failure handling, and physical-plan audits (the "is this the plan
  * you'd want at 100 TB" checks).
  */
class OperatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Tables.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q12 scene explode partitions each duration exactly") {
    val bad = SparkEntry.queries("q12_scene_explode")(spark, sf)
      .groupBy("event_id")
      .agg(sum(col("clip_end") - col("clip_start")).as("covered"),
        max("clip_end").as("last_end"), min("clip_start").as("first_start"),
        count(lit(1)).as("n"))
      .join(Tables.table(spark, sf, "events"), "event_id")
      .filter(abs(col("covered") - col("value")) > 1e-9 ||
        col("first_start") =!= 0.0)
      .count()
    assert(bad == 0)
  }

  test("resume filter is idempotent (P3)") {
    val df = Tables.table(spark, sf, "customer")
    val done = df.limit(50).select(col("c_custkey"))
    val once = ScoreStage.resumeFilter(df, done, "c_custkey")
    assert(once.count() == df.count() - 50)
    // running the "stage" again with the full done set leaves nothing
    val all = df.select(col("c_custkey"))
    assert(ScoreStage.resumeFilter(df, all, "c_custkey").count() == 0)
  }

  test("scoreStage yields error column instead of failing the task") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val df = spark.createDataFrame(
      Seq(Row(1L), Row(-1L), Row(2L)).asJava, schema)
    val kernel = new ScoreStage.Kernel {
      override def name = "neg_fails"
      override def score(batch: Seq[Row]): Seq[Either[String, Double]] =
        batch.map { r =>
          val v = r.getLong(0)
          if (v < 0) Left("negative") else Right(v * 2.0)
        }
    }
    val out = ScoreStage.scoreStage(df, kernel, batchSize = 2)
    assert(out.filter(col("score_error").isNotNull).count() == 1)
    assert(ScoreStage.dropFailed(out, "score").count() == 2)
  }

  test("custom DotProduct expression matches the HOF fold bit-for-bit") {
    val e = Tables.table(spark, sf, "embeddings").limit(64)
    val hof =
      """aggregate(zip_with(embedding, embedding,
           (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
           CAST(0 AS DOUBLE), (acc, v) -> acc + v)"""
    val diffs = e
      .withColumn("a", expr(hof))
      .withColumn("b", functions.VectorFunctions.dot(col("embedding"), col("embedding")))
      .filter(col("a") =!= col("b")).count()
    assert(diffs == 0)
  }

  test("media pipeline: scan→probe→sample→detect is plumbed end-to-end") {
    import spark.implicits._
    val paths = Seq("/v/a.mp4", "/v/b.mkv", "/v/c.webm").toDF("path")
    val probed = graft.media.Media.withMediaInfo(paths, "path")
    assert(probed.select("media_info.n_frames").as[Long].collect().forall(_ > 0))
    val sampled = graft.media.Media.withSampledFrames(probed, "path", "fractional")
    assert(sampled.select(size(col("frames"))).as[Int].collect().forall(_ == 3))
    val scenes = graft.media.Media.detectScenes(probed, "path", threshold = 10.0)
    // scenes tile [0, n_frames) contiguously per video
    val bad = scenes.groupBy("path")
      .agg(min("scene_start_idx").as("s"), max("scene_end_idx").as("e"),
        sum(col("scene_end_idx") - col("scene_start_idx")).as("covered"))
      .join(probed, "path")
      .filter(col("s") =!= 0 || col("e") =!= col("media_info.n_frames") ||
        col("covered") =!= col("media_info.n_frames"))
      .count()
    assert(bad == 0)
  }

  // ---- physical-plan audits (scale hygiene) -------------------------

  test("q02 pushes its filters into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThan(l_quantity"), p)
  }

  test("q03 star joins broadcast the dimension chain") {
    val p = plan("q03_star_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q01 aggregates partially before the shuffle (map-side combine)") {
    val p = plan("q01_agg_pushdown")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q04 anti join stays a broadcast/hash join, not a nested loop") {
    val p = plan("q04_resume_anti_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q27 LSH candidates come from an equi-join (no cartesian product)") {
    val p = plan("q27_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q20 range join keys on user_id (hash join + residual filter)") {
    val p = plan("q20_range_join")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
