package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` of named registered queries
  * to `<outDir>/<name>.txt` — the plan evidence the optimization-round
  * deliverables commit under plans/. Lifecycle queries execute their
  * build trajectory while the DataFrame is constructed (that is their
  * contract); the dumped plan is the returned (serve/report) query's.
  *
  * Usage: runMain graft.PlanDump <outDir> <name1,name2,...>
  * Data dir from SPARK_GRAFT_SF_DIR (default sf0.001 — plan shape only).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$n.txt"), p)
        println(s"[plandump] wrote $outDir/$n.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
