package graft

import org.apache.spark.sql.SparkSession

/** Scratch: run a registered query through the noop sink, print total
  * elapsed and the query's STATIC physical plan. Note the printed plan
  * is freshly planned (`isFinalPlan=false`) — the noop write executes
  * through its own QueryExecution, so AQE runtime re-planning (skew
  * splits, coalesced partitions) is NOT reflected here; use it for
  * operator/shuffle structure, not final partition counts. */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q50_ngram_jaccard")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    println(f"ELAPSED ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
