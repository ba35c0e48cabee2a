package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers an [[OpSpec]] in one of the
  * `graft.ops.*` modules; this object is just the flattened registry the
  * driver harness consumes (Verify dumps each query to parquet and the
  * oracle SQL to JSON; the driver hash-compares against DuckDB).
  */
object SparkEntry {

  val registry: Seq[OpSpec] =
    ops.Relational.all ++ ops.PipelineOps.all ++ ops.EventOps.all ++
      ops.TextOps.all ++ ops.DedupOps.all ++ ops.EmbeddingOps.all ++
      ops.SemanticDedupOps.all ++ ops.VectorIndexOps.all ++
      ops.CaptionOps.all ++ ops.CurationOps.all ++ ops.QualityOps.all ++
      ops.SampleOps.all ++ ops.Skew.all ++ ops.BloomPrune.all ++
      ops.LayoutOps.all ++ ops.AssembleOps.all ++ ops.SketchOps.all ++
      ops.GraphOps.all ++ ops.ScoreStage.all ++ ops.ClassifierOps.all ++
      streaming.StreamingStages.oracleOps

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q03StarJoin.query(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(op => op.name -> op.query).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(op => op.oracle.map(op.name -> _)).toMap
}
