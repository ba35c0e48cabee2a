package graft.ops

import graft.{OpSpec, Tables}
import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation / analysis surface extensions (SURVEY §2.12 quantile
  * curation, §2.6 shard union, §2.4 grouping sets, §2.5 global top-k,
  * F12 JSON extraction over the events.props column).
  */
object CurationOps {

  /** Score-band curation via ntile deciles (the `best_ocr_only.json`
    * selection of macvid.py:113-115 generalized). A global sort is
    * acceptable for a final curation pass; the streaming-friendly
    * alternative is approx_percentile thresholds. Total tie-break keeps
    * tile assignment engine-identical. */
  val q37QuantileCuration = OpSpec(
    "q37_quantile_curation",
    (s, dir) => {
      val w = Window.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      table(s, dir, "orders")
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .filter(col("decile") >= 9)
        .select(col("o_orderkey"), col("o_totalprice"), col("decile"))
    },
    Some("""
      SELECT o_orderkey, o_totalprice, decile
      FROM (SELECT o_orderkey, o_totalprice,
              CAST(ntile(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS BIGINT) AS decile
            FROM orders)
      WHERE decile >= 9"""))

  /** S3/§2.6 multi-shard union with schema drift: shards carrying
    * different column subsets union by NAME with null fill
    * (unionByName(allowMissingColumns) — the reference accumulates
    * shards via list extend, macvid.py:152-157, where drift silently
    * misaligns; here it is explicit). */
  val q38ShardUnion = OpSpec(
    "q38_shard_union",
    (s, dir) => {
      val c = table(s, dir, "customer")
      val a = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"), lit("shard_a").as("src"))
      val b = c.filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey"), col("c_acctbal"), lit("shard_b").as("src"))
      a.unionByName(b, allowMissingColumns = true)
    },
    Some("""
      SELECT * FROM (
        SELECT c_custkey, c_name, 'shard_a' AS src FROM customer
        WHERE c_mktsegment = 'BUILDING')
      UNION ALL BY NAME
      (SELECT c_custkey, c_acctbal, 'shard_b' AS src FROM customer
       WHERE c_acctbal > 5000.0)"""))

  /** §2.4 CUBE slicing over status × priority. */
  val q39Cube = OpSpec(
    "q39_cube",
    (s, dir) => {
      table(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
    },
    Some("""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)"""))

  /** §2.5 global top-k: Spark plans TakeOrderedAndProject — per-partition
    * top-k then a k-sized merge on the driver; no global sort
    * materializes. Total tie-break makes the result a deterministic set.
    */
  val q40GlobalTopk = OpSpec(
    "q40_global_topk",
    (s, dir) => {
      table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 100"""))

  /** F12 JSON extraction (from_json/to_json edges of the reference's
    * open `misc`/`transcript` sections): pull a typed value out of
    * events.props and aggregate over it. */
  val q41JsonExtract = OpSpec(
    "q41_json_extract",
    (s, dir) => {
      table(s, dir, "events")
        .withColumn("k",
          get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(k) AS BIGINT) AS sum_k,
             min(k) AS min_k, max(k) AS max_k
      FROM (SELECT event_type,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events)
      GROUP BY event_type"""))

  val all: Seq[OpSpec] = Seq(
    q37QuantileCuration, q38ShardUnion, q39Cube, q40GlobalTopk,
    q41JsonExtract)
}
