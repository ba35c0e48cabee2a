package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition probe (dev tool, not part of the engine). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // single-task-scan probe: every base table is one row group, so the
    // scan-side map stage runs on ONE core; measure what an up-front
    // round-robin repartition buys for map-heavy shapes.
    val docs = Tables.table(spark, dir, "documents")
    val docsR = docs.repartition(32)
    val e = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val eR = e.repartition(32)

    // shape 1: gram hashing + explode (the q50/q107/novelty family)
    def grams(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
      explode(expr(
        """transform(
             filter(split(text, '\\s+'), x -> length(x) > 0),
             w -> md5(w))""")).as("g"))
    // shape 2: cosine scoring against broadcast centroids (localCosTop)
    def cos(df: org.apache.spark.sql.DataFrame) = {
      val cents = ops.EmbeddingOps.kmeansCentroids(e, k = 16, iters = 0)
      df.withColumn("nrm", lit(1.0))
    }
    val nE = e.withColumn("ss",
      expr("aggregate(embedding, 0e0, (a,x) -> a + CAST(x AS DOUBLE)*CAST(x AS DOUBLE))"))
      .withColumn("nrm", when(col("ss") === 0.0, lit(1.0)).otherwise(sqrt(col("ss"))))
      .drop("ss")
    val nER = nE.repartition(32)
    val cents = nE.limit(16)
      .select(col("vec_id").as("cid"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cv"),
        col("nrm").as("cnrm"))
    def score(df: org.apache.spark.sql.DataFrame) = {
      val packed = cents.agg(sort_array(collect_list(
        struct(col("cid"), col("cv"), col("cnrm")))).as("_cents"))
      df.crossJoin(broadcast(packed)).select(col("vec_id"),
        expr("""element_at(array_sort(transform(_cents, c -> named_struct(
            'cosine', aggregate(zip_with(embedding, c.cv,
              (x, y) -> CAST(x AS DOUBLE) * y), 0e0, (a, y) -> a + y)
              / (nrm * c.cnrm),
            'cid', c.cid)),
          (l, r) -> CASE WHEN l.cosine > r.cosine THEN -1
                         WHEN l.cosine < r.cosine THEN 1
                         WHEN l.cid < r.cid THEN -1
                         WHEN l.cid > r.cid THEN 1 ELSE 0 END), 1).cid""")
          .as("cell"))
    }
    time("warm grams 1task")(noop(grams(docs)))
    time("grams 1task")(noop(grams(docs)))
    time("grams repart")(noop(grams(docsR)))
    time("grams repart 2")(noop(grams(docsR)))
    time("score 1task")(noop(score(nE)))
    time("score 1task 2")(noop(score(nE)))
    time("score repart")(noop(score(nER)))
    time("score repart 2")(noop(score(nER)))
    // agg shape over lineitem (the TPC-H q01 shape)
    val li = Tables.table(spark, dir, "lineitem")
    def agg(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(Tables.dsum(col("l_extendedprice")).as("s"),
          count(lit(1)).as("n"))
    time("li agg 1task")(noop(agg(li)))
    time("li agg 1task 2")(noop(agg(li)))
    time("li agg repart")(noop(agg(li.repartition(32))))
    time("li agg repart 2")(noop(agg(li.repartition(32))))
    spark.stop()
  }
}
