package graft.ops

import graft.{OpSpec, Tables}
import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-side organization a 100 TB table
  * needs so the read side can prune. Z-order clustering co-locates rows
  * that are close in BOTH of two filter dimensions into the same files
  * (so a scan with predicates on either column touches a small fraction
  * of files), and the percentile profile is the range-metadata audit
  * that tells you whether the layout/statistics actually discriminate.
  *
  * Reference tie: the reference organizes output by group directories
  * (`utils/scenecut.py` writes per-group shards) — a 1-D layout; Z-order
  * is the 2-D generalization a Spark lakehouse uses for the same
  * purpose.
  */
object LayoutOps {

  /** Bits per dimension of the Z-value (10 → 20-bit interleaved key). */
  private val ZBits = 10

  /** Bit-interleave two [[ZBits]]-bit ints: bit i of x lands at 2i, bit
    * i of y at 2i+1. Emitted as a plain integer-arithmetic sum so both
    * engines evaluate the identical expression; `shl`/`shr`/`and` are
    * dialect formatters (Spark: shiftleft/shiftright functions, DuckDB:
    * `<<`/`>>` operators). */
  private def interleave(x: String, y: String,
      shl: (String, Int) => String, shr: (String, Int) => String): String =
    (0 until ZBits).flatMap { i =>
      Seq(shl(s"(${shr(x, i)} & 1)", 2 * i),
        shl(s"(${shr(y, i)} & 1)", 2 * i + 1))
    }.mkString("(", " + ", ")")

  private def sparkShl(e: String, n: Int) = s"shiftleft($e, $n)"
  private def sparkShr(e: String, n: Int) = s"shiftright($e, $n)"
  private def duckShl(e: String, n: Int) = s"(($e) << $n)"
  private def duckShr(e: String, n: Int) = s"(($e) >> $n)"

  /** Files-per-table target expressed as a tile shift: tile = z >> 14
    * keeps 64 tiles over the 20-bit z space; at a real scale the shift
    * is chosen from target file size, the keyspace math is unchanged. */
  private val TileShift = 14

  /** Z-order clustering key over orders (customer × order-day): each row
    * gets its interleaved z-value and tile (= target file) id. The sort
    * that actually lays data out is `df.repartitionByRange(col("zval"))`
    * + sortWithinPartitions — metadata-only here; the oracle checks the
    * key math. Row-local integer arithmetic: no shuffle, no state. */
  val q71Zorder = OpSpec(
    "q71_zorder",
    (s, dir) => {
      val x = "(o_custkey % 1024)"
      val y = "(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') % 1024)"
      table(s, dir, "orders")
        .withColumn("xk", expr(s"CAST($x AS BIGINT)"))
        .withColumn("yk", expr(s"CAST($y AS BIGINT)"))
        .withColumn("zval",
          expr(s"CAST(${interleave("xk", "yk", sparkShl, sparkShr)} AS BIGINT)"))
        .select(col("o_orderkey"), col("xk"), col("yk"), col("zval"),
          expr(s"CAST(${sparkShr("zval", TileShift)} AS BIGINT)").as("tile"))
    },
    Some(s"""
      SELECT o_orderkey, xk, yk,
        CAST(${interleave("xk", "yk", duckShl, duckShr)} AS BIGINT) AS zval,
        CAST(${duckShr("CAST(" + interleave("xk", "yk", duckShl, duckShr) + " AS BIGINT)", TileShift)} AS BIGINT) AS tile
      FROM (SELECT o_orderkey,
              CAST(o_custkey % 1024 AS BIGINT) AS xk,
              CAST(date_diff('day', DATE '1970-01-01',
                CAST(o_orderdate AS DATE)) % 1024 AS BIGINT) AS yk
            FROM orders)"""))

  /** Column-range/percentile profile per stratum — exact percentile_disc
    * (p50/p90/p99 of document length per source) computed portably: the
    * value at 1-based rank ceil(p·n), selected by row_number, with
    * ceilings as pure integer arithmetic ((p·n + (q-1)) DIV q — no
    * DOUBLE percentile math to diverge). One window pass + one
    * aggregation; at scale this is the per-partition statistics audit
    * that drives layout/skew decisions (see [[Skew]]). */
  val q72PercentileProfile = OpSpec(
    "q72_percentile_profile",
    (s, dir) => {
      val wOrd = Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))
      // group count rides the SAME ordered window with an explicit
      // full frame — one Window operator, one sort, no second pass
      val wAll = wOrd.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      table(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("rn", row_number().over(wOrd).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy(col("source"))
        .agg(
          max(col("n")).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(when(col("rn") === expr("(n + 1) DIV 2"), col("n_chars")))
            .as("p50_chars"),
          max(when(col("rn") === expr("(9 * n + 9) DIV 10"), col("n_chars")))
            .as("p90_chars"),
          max(when(col("rn") === expr("(99 * n + 99) DIV 100"), col("n_chars")))
            .as("p99_chars"),
          max(col("n_chars")).as("max_chars"))
    },
    Some("""
      SELECT source,
        CAST(MAX(n) AS BIGINT) AS n_docs,
        MIN(n_chars) AS min_chars,
        MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50_chars,
        MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS p90_chars,
        MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN n_chars END) AS p99_chars,
        MAX(n_chars) AS max_chars
      FROM (SELECT source, n_chars,
              CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
              CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
            FROM documents)
      GROUP BY source"""))

  /** Power-of-two (log-scale) histogram of document length per source —
    * the size-distribution audit for power-law data where linear bins
    * (q08) put everything in one bucket. floor(log2(x)) is computed
    * EXACTLY as length(binary(x)) − 1 — no floating log2(), whose libm
    * rounding at exact powers of two differs per platform and would
    * flip boundary rows between engines. Bucket bounds re-derived by
    * integer shifts; the per-source share is the one division of exact
    * counts. Single aggregate, output ≤ sources × 64 rows. */
  val q110Log2Histogram = OpSpec(
    "q110_log2_histogram",
    (s, dir) => {
      val w = Window.partitionBy(col("source"))
      table(s, dir, "documents")
        .filter(col("n_chars") > 0)
        .withColumn("bin",
          expr("CAST(length(bin(n_chars)) - 1 AS BIGINT)"))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n"))
        .withColumn("lo", expr(
          "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT)) AS BIGINT)"))
        .withColumn("hi", expr(
          "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT) + 1) - 1 AS BIGINT)"))
        .withColumn("src_n", sum(col("n")).over(
          w.orderBy(col("bin")).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("source"), col("bin"), col("lo"), col("hi"), col("n"),
          (col("n").cast("double") / col("src_n").cast("double"))
            .as("share"))
    },
    Some("""
      SELECT source, bin,
        CAST(1 << bin AS BIGINT) AS lo,
        CAST((1 << (bin + 1)) - 1 AS BIGINT) AS hi,
        n,
        CAST(n AS DOUBLE)
          / CAST(CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT)
                 AS DOUBLE) AS share
      FROM (
        SELECT source,
          CAST(length(format('{:b}', n_chars)) - 1 AS BIGINT) AS bin,
          COUNT(*) AS n
        FROM documents WHERE n_chars > 0
        GROUP BY 1, 2)"""))

  /** q176: small-file compaction plan — the write-side maintenance
    * every 100 TB table needs: given per-file sizes (documents stand in
    * as "files": source = directory, n_chars = bytes), roll files in
    * id order into target-size output bins (greedy first-fit: bin =
    * cumulative-bytes-before DIV target, the roll-to-next-file-after-
    * exceeding rule real compactors use), and emit the per-bin manifest
    * (file count, bytes, id range) that the rewrite job consumes. All
    * integer arithmetic; the only float op is an exact floor-divide of
    * sub-2^53 longs. Scale: one window cumsum per source partition —
    * the same per-directory pass a metadata-driven compactor runs; no
    * data rows move here, only the plan. */
  val q176CompactionPlan = OpSpec(
    "q176_compaction_plan",
    (s, dir) => {
      val target = 4096L
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("cum", sum(col("n_chars")).over(w))
        .withColumn("bin", expr(
          s"""CAST(floor(CAST(cum - n_chars AS DOUBLE) / $target)
              AS BIGINT)"""))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("bytes"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
    },
    Some("""
      SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_files,
        CAST(SUM(n_chars) AS BIGINT) AS bytes,
        MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM (
        SELECT doc_id, source, n_chars,
          CAST(floor(CAST(SUM(n_chars) OVER (PARTITION BY source
                 ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
                 CURRENT ROW) - n_chars AS DOUBLE) / 4096) AS BIGINT)
            AS bin
        FROM documents)
      GROUP BY source, bin"""))

  /** q179: deterministic multi-epoch shuffle — training wants a
    * DIFFERENT but REPRODUCIBLE global order each epoch; salting the
    * order key with the epoch number (md5('ep<e>:' || doc_id)) gives
    * exactly that: any worker can recompute its slice, reruns agree,
    * and epochs decorrelate. Emits the first 5 positions of each of 3
    * epochs as the gate anchor (the full order is the same expression
    * un-limited). Scale: per-epoch order is rank-by-hash — a sort-
    * shuffle a training-data loader pays once per epoch; the top-5
    * anchor itself is a per-partition-heads TakeOrdered, no global
    * sort. */
  val q179EpochShuffle = OpSpec(
    "q179_epoch_shuffle",
    (s, dir) => {
      val w = Window.partitionBy(col("epoch"))
        .orderBy(col("rk"), col("doc_id"))
      table(s, dir, "documents")
        .select(col("doc_id"),
          explode(expr("sequence(CAST(0 AS BIGINT), CAST(2 AS BIGINT))"))
            .as("epoch"))
        .withColumn("rk", md5(concat(lit("ep"), col("epoch"), lit(":"),
          col("doc_id")).cast("binary")))
        .withColumn("position", row_number().over(w).cast("long"))
        .filter(col("position") <= 5)
        .select(col("epoch"), col("position"), col("doc_id"), col("rk"))
    },
    Some("""
      SELECT epoch, position, doc_id, rk
      FROM (
        SELECT e.epoch, d.doc_id,
          md5('ep' || e.epoch || ':' || d.doc_id) AS rk,
          CAST(ROW_NUMBER() OVER (PARTITION BY e.epoch
            ORDER BY md5('ep' || e.epoch || ':' || d.doc_id), d.doc_id)
            AS BIGINT) AS position
        FROM documents d,
          (SELECT CAST(UNNEST(range(0, 3)) AS BIGINT) AS epoch) e)
      WHERE position <= 5"""))

  /** Shared recursive temp-dir reset for the layout lifecycle gates. */
  private def rmTree(path: String): Unit = {
    graft.io.IndexLifecycle.rmDir(path)
  }

  /** q236: Hive-partitioned table layout + PARTITION PRUNING — the
    * date-partitioned directory scheme every 100 TB event table ships
    * with: events land under dt=YYYY-MM-DD directories (the write
    * pays one shuffle-free pass), and a date-sliced read touches ONLY
    * the matching directories — the scan does file-listing-level
    * pruning before any row is read (spec-audited: PartitionFilters
    * in the plan, input files restricted to the slice). The gated
    * result is a one-week rollup off the partitioned copy; the oracle
    * derives the same week from the raw table, so the layout must be
    * lossless. Partition values come back as typed partition columns;
    * the output casts to the oracle's string form. */
  val q236PartitionedLayout = OpSpec(
    "q236_partitioned_layout",
    (s, dir) => {
      val path = s"${graft.Tables.scratchDir}/part_q236"
      rmTree(path)
      table(s, dir, "events")
        .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
        .write.partitionBy("dt").parquet(path)
      s.read.parquet(path)
        .filter(col("dt") >= "2024-01-08" && col("dt") <= "2024-01-14")
        .groupBy(col("dt").cast("string").as("dt"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Tables.dsum(col("value")).as("total"))
    },
    Some("""
      SELECT strftime(ts, '%Y-%m-%d') AS dt, event_type,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM events
      WHERE strftime(ts, '%Y-%m-%d') >= '2024-01-08'
        AND strftime(ts, '%Y-%m-%d') <= '2024-01-14'
      GROUP BY 1, 2"""))

  /** q237: SCHEMA EVOLUTION across shard generations — the ingest
    * reality a year-long pipeline cannot avoid: generation 1 shards
    * were written before the `lang` column existed, generation 2
    * carries it (plus `n_chars`). A mergeSchema read unions the file
    * schemas (old files yield NULLs for the new columns) and the
    * rollup treats missing language as its own class — no backfill
    * rewrite of the old 100 TB generation required. The oracle
    * re-derives the same split from the raw table, so the
    * two-generation read must be lossless. */
  val q237SchemaEvolution = OpSpec(
    "q237_schema_evolution",
    (s, dir) => {
      val path = s"${graft.Tables.scratchDir}/gen_q237"
      rmTree(path)
      val docs = table(s, dir, "documents")
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"))
        .write.parquet(s"$path/g1")
      docs.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        .write.parquet(s"$path/g2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$path/g1", s"$path/g2")
        .groupBy(coalesce(col("lang"), lit("missing")).as("lang"))
        .agg(count(lit(1)).as("n_docs"),
          expr("CAST(SUM(n_chars) AS BIGINT)").as("chars"))
    },
    Some("""
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'missing' ELSE lang END
          AS lang,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN NULL ELSE n_chars END)
          AS BIGINT) AS chars
      FROM documents
      GROUP BY 1"""))

  /** q238: single-partition BACKFILL via dynamic partition overwrite —
    * the late-data correction a 100 TB event table takes weekly:
    * one day's values arrive revised, and ONLY that day's dt=
    * directory is rewritten (partitionOverwriteMode=dynamic replaces
    * exactly the partitions present in the incoming frame; a static
    * overwrite would truncate the whole table). The gated readout
    * rolls up the corrected table; the oracle applies the same
    * correction as a CASE over the raw rows — so the surgical rewrite
    * must be indistinguishable from a full recompute. The spec proves
    * the OTHER 29 partitions' files were not touched. */
  val q238PartitionBackfill = OpSpec(
    "q238_partition_backfill",
    (s, dir) => {
      val path = s"${graft.Tables.scratchDir}/bkf_q238"
      rmTree(path)
      val ev = table(s, dir, "events")
        .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      ev.write.partitionBy("dt").parquet(path)
      // the revised day: values double (a corrected currency feed)
      val revised = ev.filter(col("dt") === "2024-01-10")
        .withColumn("value", col("value") * 2.0)
      revised.write
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").partitionBy("dt").parquet(path)
      s.read.parquet(path)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Tables.dsum(col("value")).as("total"))
    },
    Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(CASE WHEN strftime(ts, '%Y-%m-%d') = '2024-01-10'
          THEN value * 2 ELSE value END AS DECIMAL(12,2))) AS DOUBLE)
          AS total
      FROM events
      GROUP BY 1"""))

  /** q239: CSV round-trip losslessness — the K4 edge format under the
    * bit-exact gate: money-typed doubles and timestamps survive
    * write-as-text → parse-back exactly (Spark emits the shortest
    * double representation and string→double parses are correctly
    * rounded, so the round-trip is the identity; timestamps pin an
    * explicit UTC pattern). The rollup over the round-tripped copy
    * must equal the oracle over the raw parquet — any formatting loss
    * would shift the exact decimal sums. */
  val q239CsvRoundtrip = OpSpec(
    "q239_csv_roundtrip",
    (s, dir) => {
      val path = s"${graft.Tables.scratchDir}/csv_q239"
      rmTree(path)
      val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      table(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .write.option("header", "true").option("timestampFormat", fmt)
        .csv(path)
      s.read.option("header", "true").option("timestampFormat", fmt)
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
          "event_type STRING, value DOUBLE")
        .csv(path)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Tables.dsum(col("value")).as("total"),
          graft.Tables.fmtTs(max(col("ts"))).as("last_ts"))
    },
    Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total,
        strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts
      FROM events
      GROUP BY 1"""))

  /** q265: JSONL round-trip losslessness — the K2 edge format (the
    * reference's primary metadata sink, utils/scenecut.py:105,119)
    * under the bit-exact gate: document TEXT with its full character
    * content must survive write-as-JSON-lines → parse-back exactly
    * (JSON string escaping is the identity on content). The proof is a
    * per-source content checksum — an order-free SUM of a per-row
    * md5-fold over (doc_id, text) — computed on the ROUND-TRIPPED copy
    * and compared against the oracle on the raw parquet: one flipped
    * character anywhere shifts the sum. */
  val q265JsonlRoundtrip = OpSpec(
    "q265_jsonl_roundtrip",
    (s, dir) => {
      val path = s"${graft.Tables.scratchDir}/jsonl_q265"
      rmTree(path)
      graft.io.Sinks.jsonlAppend(
        table(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("source")), path)
      s.read.schema("doc_id LONG, text STRING, source STRING").json(path)
        .withColumn("rh", expr(s"CAST(${graft.ops.DedupOps.hexToLong(
          "md5(cast(concat(cast(doc_id as string), ':', text) as binary))",
          1, 10)} AS BIGINT)"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("text"))).cast("long").as("n_chars"),
          sum(col("rh")).as("content_sum"))
    },
    Some(s"""
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        CAST(SUM(${graft.ops.DedupOps.hexToLong(
          "md5(CAST(doc_id AS VARCHAR) || ':' || text)", 1, 10)})
          AS BIGINT) AS content_sum
      FROM documents
      GROUP BY 1"""))

  /** q293: ORC round-trip — the second columnar format Spark ships
    * natively (the interchange surface a consumer on the Hive/Trino
    * side of a lake reads): documents written as ORC, read back, and
    * checksummed per source with q265's order-free md5-fold, so a row
    * lost to a broken stripe or a character mangled in string
    * encoding flips the hash. The oracle reads the ORIGINAL parquet —
    * one gate proves write+read inverse through a different container
    * format. The spec separately proves ORC scans take predicate
    * pushdown (PushedFilters reaches the scan), so the format keeps
    * parquet's scan discipline at scale, not just its bytes. */
  val q293OrcRoundtrip = OpSpec(
    "q293_orc_roundtrip",
    (s, dir) => {
      val path = s"${graft.Tables.scratchDir}/orc_q293"
      rmTree(path)
      table(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .withColumn("rh", expr(s"CAST(${graft.ops.DedupOps.hexToLong(
          "md5(cast(concat(cast(doc_id as string), ':', text) as binary))",
          1, 10)} AS BIGINT)"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("text"))).cast("long").as("n_chars"),
          sum(col("rh")).as("content_sum"))
    },
    Some(s"""
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        CAST(SUM(${graft.ops.DedupOps.hexToLong(
          "md5(CAST(doc_id AS VARCHAR) || ':' || text)", 1, 10)})
          AS BIGINT) AS content_sum
      FROM documents
      GROUP BY 1"""))

  /** q272: PER-CLIP JSON round-trip — the K1 edge format (one JSON
    * file per row, aesthetic_score.py:130-135) under the bit-exact
    * gate, exercising the real [[graft.io.Sinks.perClipJson]] path
    * (repartition-by-key + maxRecordsPerFile=1, so the commit protocol
    * stays Spark's). A deterministic tenth of the corpus keeps the
    * file count honest-but-bounded (one file per row is the FORMAT's
    * cost, not a scale path — the spec separately proves file count ==
    * row count). The readback checksum folds doc_id AND text, so a
    * row lost to a broken per-file commit or a character mangled by
    * JSON escaping flips the hash. */
  val q272PerclipJsonRoundtrip = OpSpec(
    "q272_perclip_json_roundtrip",
    (s, dir) => {
      val path = s"${graft.Tables.scratchDir}/pcjson_q272"
      rmTree(path)
      graft.io.Sinks.perClipJson(
        table(s, dir, "documents")
          .filter(col("doc_id") % 10 === 3)
          .select(col("doc_id"), col("text"), col("source")),
        path, "doc_id")
      s.read.schema("doc_id LONG, text STRING, source STRING").json(path)
        .withColumn("rh", expr(s"CAST(${graft.ops.DedupOps.hexToLong(
          "md5(cast(concat(cast(doc_id as string), ':', text) as binary))",
          1, 10)} AS BIGINT)"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("rh")).as("content_sum"))
    },
    Some(s"""
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(${graft.ops.DedupOps.hexToLong(
          "md5(CAST(doc_id AS VARCHAR) || ':' || text)", 1, 10)})
          AS BIGINT) AS content_sum
      FROM documents WHERE doc_id % 10 = 3
      GROUP BY 1"""))

  /** q273: TEXT-SCORES round-trip — the K5 edge format ("<score>
    * <clip>" lines, run_extract_mvs.sh:8-16) under the gate via the
    * real [[graft.io.Sinks.textScores]] path. The score is an exact
    * BIGINT (n_chars) because a double would round-trip through
    * engine-specific string formatting; the clip id is the F3
    * convention (source:doc_id). The checksum is computed from the
    * PARSED line halves, so the gate proves the parse inverts the
    * format — a swapped field order or a lost line flips it. */
  val q273TextSinkRoundtrip = OpSpec(
    "q273_text_sink_roundtrip",
    (s, dir) => {
      val path = s"${graft.Tables.scratchDir}/txt_q273"
      rmTree(path)
      graft.io.Sinks.textScores(
        table(s, dir, "documents")
          .withColumn("score", length(col("text")).cast("long"))
          .withColumn("clip",
            concat(col("source"), lit(":"), col("doc_id"))),
        "score", "clip", path)
      s.read.text(path)
        .withColumn("score",
          expr("CAST(split(value, ' ')[0] AS BIGINT)"))
        .withColumn("clip", expr("split(value, ' ')[1]"))
        .withColumn("src", expr("split(clip, ':')[0]"))
        .withColumn("rh", expr(s"CAST(${graft.ops.DedupOps.hexToLong(
          "md5(cast(concat(cast(score as string), ' ', clip) as binary))",
          1, 10)} AS BIGINT)"))
        .groupBy(col("src"))
        .agg(count(lit(1)).as("n"),
          sum(col("score")).cast("long").as("sum_score"),
          sum(col("rh")).as("content_sum"))
    },
    Some(s"""
      SELECT source AS src, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(length(text)) AS BIGINT) AS sum_score,
        CAST(SUM(${graft.ops.DedupOps.hexToLong(
          "md5(CAST(length(text) AS VARCHAR) || ' ' || source || ':' || " +
            "CAST(doc_id AS VARCHAR))", 1, 10)}) AS BIGINT) AS content_sum
      FROM documents
      GROUP BY 1"""))

  /** q274: MERGED-JSON round-trip — the K3 edge format (the rank-0
    * gather of coca_caption.py:107-121 as ONE json array file) under
    * the gate via the real [[graft.io.Sinks.mergedJson]] path. The
    * coalesce(1) is the format's contract (spec proves exactly one
    * data file); the checksum proves the gather lost nothing. */
  val q274MergedJsonRoundtrip = OpSpec(
    "q274_merged_json_roundtrip",
    (s, dir) => {
      val path = s"${graft.Tables.scratchDir}/mjson_q274"
      rmTree(path)
      graft.io.Sinks.mergedJson(
        table(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang")), path)
      s.read.schema("doc_id LONG, text STRING, lang STRING").json(path)
        .withColumn("rh", expr(s"CAST(${graft.ops.DedupOps.hexToLong(
          "md5(cast(concat(cast(doc_id as string), ':', text) as binary))",
          1, 10)} AS BIGINT)"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("rh")).as("content_sum"))
    },
    Some(s"""
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(${graft.ops.DedupOps.hexToLong(
          "md5(CAST(doc_id AS VARCHAR) || ':' || text)", 1, 10)})
          AS BIGINT) AS content_sum
      FROM documents
      GROUP BY 1"""))

  val all: Seq[OpSpec] = Seq(q71Zorder, q72PercentileProfile,
    q110Log2Histogram, q176CompactionPlan, q179EpochShuffle,
    q236PartitionedLayout, q237SchemaEvolution, q238PartitionBackfill,
    q239CsvRoundtrip, q265JsonlRoundtrip, q272PerclipJsonRoundtrip,
    q273TextSinkRoundtrip, q274MergedJsonRoundtrip,
    q293OrcRoundtrip)
}
