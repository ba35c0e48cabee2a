package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition probe (dev tool, not part of the engine). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.table(spark, dir, "documents")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val ws = "filter(split(text, '\\\\s+'), x -> length(x) > 0)"
    val attr = docs.withColumn("words", expr(ws))
      .select(col("doc_id"), explode(col("words")).as("term"))
    val inline = docs.select(col("doc_id"),
      explode(expr(ws)).as("term"))
    time("warm")(noop(attr))
    time("attr-explode")(noop(attr))
    time("attr-explode 2")(noop(attr))
    time("inline-explode")(noop(inline))
    time("inline-explode 2")(noop(inline))
    // downstream agg comparison (the q76 shape)
    time("attr+agg")(noop(attr.groupBy("term").count()))
    time("inline+agg")(noop(inline.groupBy("term").count()))
    spark.stop()
  }
}
