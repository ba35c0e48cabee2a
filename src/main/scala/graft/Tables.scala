package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column

/** Table loading + cross-engine-exact arithmetic helpers.
  *
  * Correctness is judged by a bit-level hash compare between our parquet
  * output and a DuckDB run of the oracle SQL (see Verify.scala). Floating
  * point sums are order-dependent, so every aggregated double goes through
  * an exact decimal representation first (money-like inputs all have <=2
  * decimal places), and is cast back to double only at the end — both
  * engines then produce the identical IEEE double. Counts are cast to
  * BIGINT explicitly because DuckDB's SUM(int) returns HUGEINT and its
  * len() returns BIGINT while Spark's size() returns INT.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // The driver has generated events.ts both as TIMESTAMP(NANOS) (which
    // Spark 4 only reads as a nanos-since-epoch long via
    // spark.sql.legacy.parquet.nanosAsLong) and as plain TIMESTAMP(US).
    // Normalize either encoding to a micros TimestampType column; the
    // long branch uses exact integer division (a double division would
    // lose precision at 1e18). TIMESTAMP(US) columns arrive as
    // TimestampType directly because inferTimestampNTZ is disabled below.
    if (name == "events" &&
      df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Session settings every entry point needs (timestamp parquet + AQE).
    * inferTimestampNTZ=false: isAdjustedToUTC=false parquet timestamps
    * read as session-TZ TimestampType (session TZ pinned to UTC), the
    * same instants DuckDB's naive TIMESTAMP sees — not TIMESTAMP_NTZ,
    * which unix_micros/window functions reject. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    // native expressions (dot_product / dot_fd / sorted_intersect_count)
    // available to expr()-string call sites in every entry point
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")

  /** Per-JVM scratch root for the lifecycle queries' persisted
    * artifacts (indexes, rollups, layouts). Fixed WITHIN a JVM so
    * build-once guards stay warm and repeated invocations reset their
    * own state instead of accreting one directory per run; unique
    * ACROSS processes so two drivers sharing a host can never delete
    * each other's live index files mid-query (catalog table names are
    * already per-JVM — the in-memory catalog dies with the session —
    * so the filesystem was the only shared surface). */
  lazy val scratchDir: String = {
    reapDeadScratch()
    val dir = s"${sys.props("java.io.tmpdir")}/graft_${ProcessHandle.current().pid()}"
    // sentinel marks the dir as OURS — the reaper deletes only marked
    // dirs, so an unrelated process that happens to name a tmpdir
    // graft_<digits> is never touched (the tmpdir/graft_<pid> namespace
    // is otherwise reserved by this engine by convention only)
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    val s = p.resolve(ScratchSentinel)
    if (!java.nio.file.Files.exists(s)) java.nio.file.Files.createFile(s)
    dir
  }

  /** Marker file every engine scratch dir carries (see [[scratchDir]]/
    * [[reapDeadScratch]]). */
  private val ScratchSentinel = ".graft_scratch"

  /** Delete scratch roots left by DEAD drivers (graft_<pid> dirs whose
    * pid no longer runs): each Verify/Bench/test JVM gets its own
    * scratch dir, so without reaping, repeated driver invocations
    * accrete one index-sized directory per JVM in /tmp forever. A
    * LIVE pid's dir is never touched (that is the whole point of the
    * per-JVM scoping); pid reuse at worst leaves one dir to the next
    * reap. Only dirs carrying the [[ScratchSentinel]] marker are
    * deleted — `tmpdir/graft_<digits>` is reserved by this engine by
    * convention, and the sentinel turns that convention into a check
    * so a foreign process's same-named dir survives. Runs once per
    * JVM, at first scratchDir use. */
  private[graft] def reapDeadScratch(): Unit = {
    def rm(f: java.io.File): Unit =
      graft.io.IndexLifecycle.rmDir(f.getPath)
    Option(new java.io.File(sys.props("java.io.tmpdir")).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("graft_") &&
        new java.io.File(f, ScratchSentinel).isFile)
      .foreach { f =>
        f.getName.stripPrefix("graft_").toLongOption.foreach { pid =>
          val h = ProcessHandle.of(pid)
          if (!(h.isPresent && h.get().isAlive)) rm(f)
        }
      }
  }

  /** Cheap order-free fingerprint of a table's physical file listing
    * (relative name, size, mtime per file): build-once guards fold it
    * into their key so regenerated source data changes the key and
    * forces a rebuild instead of silently serving a stale index. */
  def dataFingerprint(sfDir: String, name: String): String = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(s"$sfDir/$name.parquet")
    val entries: Seq[String] =
      if (!java.nio.file.Files.exists(root)) Seq(s"absent:$root")
      else {
        val walk = java.nio.file.Files.walk(root)
        try walk.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(p => s"${root.relativize(p)}:" +
            s"${java.nio.file.Files.size(p)}:" +
            s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}")
          .toVector.sorted
        finally walk.close()
      }
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.mkString("\n").getBytes("UTF-8"))
      .take(6).map(x => f"$x%02x").mkString
  }

  /** Exact decimal type for money-like doubles (<=2 dp, < 1e10). */
  val dec: DecimalType = DecimalType(12, 2)

  /** Order-independent exact sum of a money-like double column, as double. */
  def dsum(c: Column): Column = sum(c.cast(dec)).cast("double")

  /** Exact average: double division of the exact sum — IEEE-identical in
    * both engines (vs avg(), whose accumulation order is engine-defined). */
  def davg(c: Column): Column =
    (sum(c.cast(dec)).cast("double") / count(c)).cast("double")

  /** Timestamp → canonical string (microsecond precision, UTC session TZ)
    * so the compare never depends on engine timestamp encodings. */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Second-precision variant for derived/window timestamps. */
  def fmtTsSec(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}

/** One operator of the engine: a named DataFrame query over the testdata
  * plus (where SQL-expressible) a DuckDB oracle with IDENTICAL output
  * column names and types. `oracle = None` → driver runs rows-only check.
  */
final case class OpSpec(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String])
