package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink parity with the reference's output formats (SURVEY §2.1 K1-K5).
  * Internally everything stays parquet; these exist for edge
  * compatibility with consumers of the reference's layouts.
  */
object Sinks {

  /** K1 per-clip JSON: one file per row (aesthetic_score.py:130-135).
    * Implemented with maxRecordsPerFile=1 so the commit protocol stays
    * Spark's (atomic, speculative-execution-safe) instead of hand-rolled
    * per-row file writes. */
  def perClipJson(df: DataFrame, outDir: String, keyCol: String): Unit =
    df.repartition(col(keyCol))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", 1)
      .json(outDir)

  /** K2 JSONL append (utils/scenecut.py:105,119). */
  def jsonlAppend(df: DataFrame, outDir: String): Unit =
    df.write.mode(SaveMode.Append).json(outDir)

  /** K3 merged single-file JSON array (coca_caption.py:107-121's rank-0
    * gather — Spark's shuffle/commit replaces the manual rank files).
    * coalesce(1) is an edge-format concession; callers at scale keep the
    * default parallel layout. */
  def mergedJson(df: DataFrame, outDir: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).json(outDir)

  /** K4 CSV sink (utils/utils.py:37-40). */
  def csv(df: DataFrame, outDir: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", true).csv(outDir)

  /** K5 "<score> <clip>" text scores (run_extract_mvs.sh:8-16). */
  def textScores(df: DataFrame, scoreCol: String, keyCol: String,
      outDir: String): Unit =
    df.select(concat_ws(" ", col(scoreCol), col(keyCol)).as("value"))
      .write.mode(SaveMode.Overwrite).text(outDir)

  /** Shard-budget writer (README.md:89: ≤1M rows / <1 TB per shard):
    * partitioned parquet with bounded records per file. */
  def shardedParquet(df: DataFrame, outDir: String,
      maxRecordsPerFile: Long = 1000000L): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(outDir)
}
