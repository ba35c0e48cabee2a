package graft

import org.apache.spark.sql.SparkSession

/** Library entry point for users (the mains use the same pieces
  * directly): one call yields a session with the engine's required
  * configs (nanos-parquet read, AQE, UTC) and its native SQL functions
  * registered — after this, `spark.sql("SELECT dot_product(a, b) ...")`
  * and every `graft.ops.*` operator work out of the box.
  */
object Graft {

  /** A pre-configured builder the caller can still override. */
  def builder(): SparkSession.Builder =
    Tables.configure(SparkSession.builder())
      .withExtensions(new GraftExtensions)

  /** Build (or get) the session and ensure the function registry has the
    * engine's natives even when an existing session is returned
    * (extensions only apply at construction). */
  def session(master: String = "local[*]",
      shufflePartitions: Option[Int] = None): SparkSession = {
    val b = builder().master(master)
    shufflePartitions.foreach(n =>
      b.config("spark.sql.shuffle.partitions", n.toString))
    val s = b.getOrCreate()
    GraftExtensions.install(s)
    s
  }

  /** Register every corpus table of `dir` as a temp view (with the same
    * ts normalization as [[Tables.table]]), so the full SQL surface —
    * `spark.sql("SELECT ... FROM lineitem JOIN orders ...")`, including
    * the registered native functions — works against a scale-factor
    * directory with one call. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach(n =>
      Tables.table(spark, dir, n).createOrReplaceTempView(n))
}
