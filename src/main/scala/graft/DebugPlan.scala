package graft

import org.apache.spark.sql.SparkSession

/** Scratch: print a query's final adaptive plan + per-stage timing. */
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
