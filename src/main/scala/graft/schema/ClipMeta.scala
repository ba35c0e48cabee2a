package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The clip-metadata data model (SURVEY.md §1).
  *
  * Mirrors the reference's nested "MaCVid" schema (data_schema/macvid.py:
  * 11-44, evaluations/scene_cut.py:39-72) and the flat published MMTrail
  * schema (README.md:37-63), re-typed for Spark. JSON is an edge format
  * only; internally everything is parquet/columnar.
  */
object ClipMeta {

  /** scene.objects element (macvid.py:30-36). */
  val objectType: StructType = StructType(Seq(
    StructField("category", StringType),
    StructField("action", StringType),
    StructField("action_speed", StringType)))

  /** Nested MaCVid schema: basic / scene / camera / misc / transcript. */
  val macvidSchema: StructType = StructType(Seq(
    StructField("basic", StructType(Seq(
      StructField("video_id", StringType),
      StructField("video_path", StringType),
      StructField("video_duration", DoubleType),
      StructField("video_resolution", ArrayType(IntegerType)),
      StructField("video_fps", DoubleType),
      StructField("clip_id", StringType),
      StructField("clip_path", StringType),
      StructField("clip_duration", DoubleType),
      StructField("clip_start_end_idx", ArrayType(LongType)),
      // scalar before scoring, 3 scores after (aesthetic_score.py:132)
      StructField("optimal_score", ArrayType(DoubleType))))),
    StructField("scene", StructType(Seq(
      StructField("captions", StringType),
      StructField("place", StringType),
      StructField("background", StringType),
      StructField("style", StringType),
      StructField("num_of_objects", IntegerType),
      StructField("objects", ArrayType(objectType)),
      StructField("ocr_score", DoubleType),          // ocr_score.py:72
      StructField("imaging_quality", DoubleType)))), // imaging_quality.py:90
    StructField("camera", StructType(Seq(
      StructField("view_scale", StringType),
      StructField("movement", StringType),
      StructField("speed", StringType)))),
    // open sections -> string maps (macvid.py:43, utils/scenecut.py:28)
    StructField("misc", MapType(StringType, StringType)),
    StructField("transcript", MapType(StringType, StringType))))

  /** Flat published MMTrail schema (README.md:37-63). */
  val mmtrailSchema: StructType = StructType(Seq(
    StructField("video_id", StringType),
    StructField("video_path", StringType),
    StructField("video_duration", DoubleType),
    StructField("video_resolution", ArrayType(IntegerType)),
    StructField("video_fps", DoubleType),
    StructField("clip_id", StringType),
    StructField("clip_path", StringType),
    StructField("clip_duration", DoubleType),
    StructField("clip_start_end_idx", ArrayType(LongType)),
    StructField("image_quality", DoubleType),
    StructField("of_score", DoubleType),
    StructField("aesthetic_score", ArrayType(DoubleType)),
    StructField("music_caption_wo_vocal", ArrayType(StructType(Seq(
      StructField("text", StringType), StructField("time", StringType))))),
    StructField("vocal_caption", StringType),
    StructField("frame_caption", ArrayType(StringType)),
    StructField("music_caption", ArrayType(StructType(Seq(
      StructField("text", StringType), StructField("time", StringType))))),
    StructField("objects", ArrayType(StringType)),
    StructField("background", StringType),
    StructField("ocr_score", DoubleType),
    StructField("caption", StringType),
    StructField("polish_caption", StringType),
    StructField("merge_caption", StringType)))

  /** Permissive shard reader: the `load_from_dict` graceful-degradation
    * semantics (scene_cut.py:120-137) — malformed/missing sections become
    * nulls instead of failing the row; corrupt files are kept as rows
    * with `_corrupt_record` populated. */
  def readShards(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String]): DataFrame =
    spark.read
      .option("multiLine", true)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(macvidSchema.add(StructField("_corrupt_record", StringType)))
      .json(paths: _*)

  /** Stage contract: output schema = input schema + declared columns
    * (SURVEY §1.2). Returns the new columns actually added. */
  def addedColumns(in: DataFrame, out: DataFrame): Seq[String] =
    out.columns.diff(in.columns).toSeq

  /** Upsert a nested field (the `update_value` guard of
    * scene_cut.py:143-154, minus its silent-drop bug). A row whose
    * section struct is NULL (the permissive reader's degraded rows —
    * exactly the ones worth enriching) gets a fresh all-null struct
    * first: `withField` on a null struct returns null, which would
    * silently discard the computed value for those rows. */
  def withNestedField(df: DataFrame, section: String, field: String,
      value: Column): DataFrame = {
    val sectionType = df.schema(section).dataType.asInstanceOf[StructType]
    val empty = struct(sectionType.fields.map(f =>
      lit(null).cast(f.dataType).as(f.name)): _*)
    df.withColumn(section,
      coalesce(col(section), empty).withField(field, value))
  }
}
