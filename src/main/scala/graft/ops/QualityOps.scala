package graft.ops

import graft.OpSpec
import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality / invariant operators: M4 imaging quality through the real
  * scoring skeleton, the A6 count-consistency check, §2.6 INTERSECT, and
  * the typed MinHash aggregator on a real query path.
  */
object QualityOps {

  /** M4 imaging quality (imaging_quality.py:70-95): per-frame score with
    * F13 signed-normalize preprocessing, mean of 3 frames, executed
    * through the [[ScoreStage]] mapPartitions skeleton (build-once,
    * batched, error→null — the same physical shape a real MUSIQ forward
    * pass would run in). */
  val q42ImagingQuality = OpSpec(
    "q42_imaging_quality",
    (s, dir) => {
      val df = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      ScoreStage.dropFailed(
        ScoreStage.scoreStage(df, new ScoreStage.ImagingQualityKernel,
          batchSize = 8, outCol = "iq_score"),
        "iq_score")
        .select(col("vec_id"), col("iq_score"))
    },
    Some {
      def frame(f: Int): String = {
        val (lo, hi) = (f * 21 + 1, f * 21 + 21)
        s"""(list_reduce(list_transform(generate_series($lo, $hi),
             i -> (CAST(embedding[i] AS DOUBLE) / 255e0 - 5e-1) * 2e0),
             (a, b) -> a + b) / 21e0)"""
      }
      s"""
      SELECT vec_id, (f0 + f1 + f2) / 3e0 AS iq_score
      FROM (SELECT vec_id, ${frame(0)} AS f0, ${frame(1)} AS f1,
                   ${frame(2)} AS f2
            -- mirrors the kernel's failure path: embeddings shorter
            -- than the 3x21 frame layout go Left -> dropFailed
            FROM embeddings
            WHERE embedding IS NOT NULL AND len(embedding) >= 63)"""
    })

  /** A6 count-consistency check op (check/check_secne.py:14-26: expected
    * clip count vs clips actually materialized, tolerance 3). Generic:
    * LEFT join so a key with no actual rows counts 0, not a dropped row
    * — a missing output is exactly what the check must surface. */
  def checkCounts(expected: DataFrame, actual: DataFrame, key: String,
      expCol: String, actCol: String, tol: Long): DataFrame =
    expected.join(actual, Seq(key), "left")
      .withColumn(actCol, coalesce(col(actCol), lit(0L)))
      .withColumn("n_diff", abs(col(expCol) - col(actCol)))
      .withColumn("ok", col("n_diff") <= tol)

  /** A6 instance: the scene-count invariant over the q12 clip table.
    * Expected = the reference's ±1 estimate (floor(d/30)+1); actual =
    * clips the explode materialized (ceil(d/30), 0 for zero-duration
    * events) — diff is 0 or 1, within the reference's tolerance. */
  val q43CheckCounts = OpSpec(
    "q43_check_counts",
    (s, dir) => {
      val expected = table(s, dir, "events")
        .select(col("event_id"),
          (floor(col("value") / 30.0).cast("long") + 1L).as("n_expected"))
      val actual = PipelineOps.q12SceneExplode.query(s, dir)
        .groupBy(col("event_id")).agg(count(lit(1)).as("n_actual"))
      checkCounts(expected, actual, "event_id", "n_expected", "n_actual",
        tol = 3L)
        .select(col("event_id"), col("n_expected"), col("n_actual"),
          col("n_diff"), col("ok"))
    },
    Some("""
      WITH clips AS (
        SELECT event_id, COUNT(*) AS n_actual
        FROM (SELECT event_id,
                CAST(ceil(value / 3e1) AS BIGINT) AS n_clips FROM events),
             LATERAL (SELECT unnest(generate_series(0, n_clips - 1)) AS i)
        GROUP BY event_id)
      SELECT e.event_id,
        CAST(floor(e.value / 3e1) AS BIGINT) + 1 AS n_expected,
        COALESCE(c.n_actual, 0) AS n_actual,
        abs(CAST(floor(e.value / 3e1) AS BIGINT) + 1
            - COALESCE(c.n_actual, 0)) AS n_diff,
        abs(CAST(floor(e.value / 3e1) AS BIGINT) + 1
            - COALESCE(c.n_actual, 0)) <= 3 AS ok
      FROM events e LEFT JOIN clips c USING (event_id)"""))

  /** §2.6 INTERSECT (the set-op triple's missing member — q09 covers
    * EXCEPT/UNION): customers in the BUILDING segment who also hold a
    * high balance. */
  val q44Intersect = OpSpec(
    "q44_intersect",
    (s, dir) => {
      val c = table(s, dir, "customer")
      c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"))
        .intersect(
          c.filter(col("c_acctbal") > 5000.0)
            .select(col("c_custkey"), col("c_name")))
    },
    Some("""
      SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5e3"""))

  /** U-AF on a real query path: the typed [[graft.functions.MinHashAgg]]
    * folding shingle ROWS into a 4-wide md5-min signature via
    * `groupByKey(...).agg` — the Dataset-API twin of q27's relational
    * signature stage (partial aggregation comes from the Aggregator
    * contract). */
  val q45MinhashAgg = OpSpec(
    "q45_minhash_agg",
    (s, dir) => {
      import s.implicits._
      DedupOps.shingleRows(s, dir)
        .as[(Long, String)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(new graft.functions.MinHashAgg(4).toColumn.name("sig"))
        .toDF("doc_id", "sig")
        .select(col("doc_id"),
          col("sig")(0).as("m0"), col("sig")(1).as("m1"),
          col("sig")(2).as("m2"), col("sig")(3).as("m3"))
    },
    Some {
      val mins = (0 until 4).map(i =>
        s"list_min(list_transform(sh, x -> md5('$i:' || x))) AS m$i")
        .mkString(",\n        ")
      s"""
      WITH docs AS (${DedupOps.shingleDuck})
      SELECT doc_id,
        $mins
      FROM docs"""
    })

  /** M9 optical-flow score (mean flow magnitude, mirroring M8 — SURVEY
    * §2 M9 "same UDF family") through the ScoreStage skeleton. */
  val q46OfScore = OpSpec(
    "q46_of_score",
    (s, dir) => {
      val df = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      ScoreStage.dropFailed(
        ScoreStage.scoreStage(df, new ScoreStage.OpticalFlowKernel,
          batchSize = 8, outCol = "of_score"),
        "of_score")
        .select(col("vec_id"), col("of_score"))
    },
    Some("""
      SELECT vec_id,
        list_reduce(list_transform(generate_series(1, 32),
          i -> sqrt(CAST(embedding[2*i-1] AS DOUBLE) * CAST(embedding[2*i-1] AS DOUBLE)
                  + CAST(embedding[2*i] AS DOUBLE) * CAST(embedding[2*i] AS DOUBLE))),
          (a, b) -> a + b) / 32e0 AS of_score
      FROM embeddings
      -- mirrors the kernel's failure path: a flow field shorter than
      -- 32 (u, v) points goes Left -> dropFailed
      WHERE embedding IS NOT NULL AND len(embedding) >= 64"""))

  /** Per-stratum column profile — the ANALYZE-style audit an ingest
    * runs before trusting a new shard (row counts, null counts,
    * distinct cardinalities, value ranges). COUNT(DISTINCT) over a
    * grouped frame plans as one Expand + two-phase aggregate — a single
    * shuffle whose width is the distinct (lang, source/doc_id) pairs,
    * not the row count, so the audit stays cheap at any corpus size.
    * Reference tie: `check_secne.py`'s count-consistency intent (A6)
    * widened to a full per-column profile. */
  val q67ColumnProfile = OpSpec(
    "q67_column_profile",
    (s, dir) => {
      table(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_text"),
          countDistinct(col("doc_id")).as("n_doc_id"),
          countDistinct(col("source")).as("n_source"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(col("n_chars")).as("sum_chars"))
    },
    Some("""
      SELECT lang,
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS null_text,
        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_doc_id,
        CAST(COUNT(DISTINCT source) AS BIGINT) AS n_source,
        MIN(n_chars) AS min_chars,
        MAX(n_chars) AS max_chars,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents
      GROUP BY lang"""))

  /** Batch-over-batch schema/distribution drift detector — q67's
    * profile computed for two ingest batches (event_id parity stands in
    * for yesterday/today) and joined per column, so a pipeline can gate
    * a new shard on "did null rates or cardinalities move". Profiles
    * are tiny (one row per column) regardless of batch size; the drift
    * compare touches only profile rows. Null rates are each ONE
    * division of exact integers; the cardinality ratio likewise. */
  val q120ProfileDrift = OpSpec(
    "q120_profile_drift",
    (s, dir) => {
      def profile(df: org.apache.spark.sql.DataFrame) = df
        .select(expr("""stack(3,
          'user_id', CAST(user_id AS STRING),
          'event_type', CAST(event_type AS STRING),
          'value', CAST(value AS STRING)) AS (col_name, v)"""))
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col("v")).as("n_distinct"))
      val ev = table(s, dir, "events")
      val a = profile(ev.filter(col("event_id") % 2 === 0))
      val b = profile(ev.filter(col("event_id") % 2 =!= 0))
      a.select(col("col_name"), col("n").as("n_a"),
          col("n_null").as("null_a"), col("n_distinct").as("nd_a"))
        .join(b.select(col("col_name"), col("n").as("n_b"),
          col("n_null").as("null_b"), col("n_distinct").as("nd_b")),
          Seq("col_name"))
        .select(col("col_name"), col("n_a"), col("null_a"), col("nd_a"),
          col("n_b"), col("null_b"), col("nd_b"),
          (col("null_a").cast("double") / col("n_a").cast("double"))
            .as("null_rate_a"),
          (col("null_b").cast("double") / col("n_b").cast("double"))
            .as("null_rate_b"),
          (col("nd_b").cast("double") / col("nd_a").cast("double"))
            .as("nd_ratio"))
    },
    Some("""
      WITH s AS (
        -- explicit UNION ALL (not UNPIVOT, which drops NULL values)
        SELECT event_id % 2 AS side, 'user_id' AS col_name,
               CAST(user_id AS VARCHAR) AS v FROM events
        UNION ALL
        SELECT event_id % 2, 'event_type', CAST(event_type AS VARCHAR)
        FROM events
        UNION ALL
        SELECT event_id % 2, 'value', CAST(value AS VARCHAR)
        FROM events),
      p AS (
        SELECT side, col_name, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_null,
          CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct
        FROM s GROUP BY 1, 2)
      SELECT a.col_name, a.n AS n_a, a.n_null AS null_a,
        a.n_distinct AS nd_a, b.n AS n_b, b.n_null AS null_b,
        b.n_distinct AS nd_b,
        CAST(a.n_null AS DOUBLE) / CAST(a.n AS DOUBLE) AS null_rate_a,
        CAST(b.n_null AS DOUBLE) / CAST(b.n AS DOUBLE) AS null_rate_b,
        CAST(b.n_distinct AS DOUBLE) / CAST(a.n_distinct AS DOUBLE)
          AS nd_ratio
      FROM (SELECT * FROM p WHERE side = 0) a
      JOIN (SELECT * FROM p WHERE side = 1) b USING (col_name)"""))

  /** k-anonymity audit with a generalization ladder — the privacy gate
    * a training-data release runs over quasi-identifiers: each
    * (nation, segment) group is k-anonymous at level 0 if ≥ k rows
    * share the full QI tuple; groups below k test the GENERALIZED
    * tuple (nation only), and groups still below k are marked for
    * suppression. Two aggregates (full QI, generalized QI) and one
    * broadcast-sized join — output is bounded by |QI domain|, not row
    * count. */
  val q121KAnonymity = OpSpec(
    "q121_k_anonymity",
    (s, dir) => {
      val k = 5
      val c = table(s, dir, "customer")
      val full = c.groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("qi_n"))
      val gen = c.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("gen_n"))
      full.join(gen, "c_nationkey")
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"), col("qi_n"), col("gen_n"),
          when(col("qi_n") >= k, 0L)
            .when(col("gen_n") >= k, 1L)
            .otherwise(2L).as("anon_level"))
    },
    Some("""
      SELECT CAST(c_nationkey AS BIGINT) AS nation,
        c_mktsegment AS segment, qi_n, gen_n,
        CAST(CASE WHEN qi_n >= 5 THEN 0
                  WHEN gen_n >= 5 THEN 1
                  ELSE 2 END AS BIGINT) AS anon_level
      FROM (SELECT c_nationkey, c_mktsegment,
              CAST(COUNT(*) AS BIGINT) AS qi_n,
              CAST(SUM(COUNT(*)) OVER (PARTITION BY c_nationkey)
                AS BIGINT) AS gen_n
            FROM customer GROUP BY 1, 2)"""))

  /** q198: distributional drift by total-variation distance — q120
    * compares column PROFILES (nulls, distincts); this compares the
    * value DISTRIBUTIONS of two event slices (even/odd event ids
    * standing in for yesterday/today) per event type, as
    * TV = ½ Σ_buckets |p_i − q_i| over unit-value buckets. The usual
    * PSI/KL forms need log(); TV is the log-free f-divergence with the
    * same alerting role — and the cross-multiplied form
    * Σ|n_aᵢ·N_b − n_bᵢ·N_a| keeps EVERYTHING integer until one final
    * double division, so the gate is exact (the q50 "no float
    * threshold" discipline applied to a statistic). One group-by per
    * slice over (type, bucket), a full-outer cell join, bounded bucket
    * domain. */
  val q198TvDrift = OpSpec(
    "q198_tv_drift",
    (s, dir) => {
      def cells(half: Int) = table(s, dir, "events")
        .filter(col("event_id") % 2 === half)
        .select(col("event_type"),
          expr("CAST(floor(value) AS BIGINT)").as("bucket"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"))
      val a = cells(0).select(col("event_type"), col("bucket"),
        col("n").as("n_a"))
      val b = cells(1).select(col("event_type"), col("bucket"),
        col("n").as("n_b"))
      val joined = a.join(b, Seq("event_type", "bucket"), "full_outer")
        .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
        .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
      val totals = joined.groupBy(col("event_type"))
        .agg(sum(col("n_a")).as("na"), sum(col("n_b")).as("nb"),
          count(lit(1)).as("n_buckets"))
      joined.join(totals, "event_type")
        .groupBy(col("event_type"), col("na"), col("nb"),
          col("n_buckets"))
        .agg(expr("CAST(SUM(abs(n_a * nb - n_b * na)) AS BIGINT)")
          .as("cross_abs"))
        .select(col("event_type"), col("n_buckets"), col("na"), col("nb"),
          expr("""CAST(cross_abs AS DOUBLE)
                  / (2e0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))""")
            .as("tv"))
    },
    Some("""
      WITH a AS (
        SELECT event_type, CAST(floor(value) AS BIGINT) AS bucket,
          CAST(COUNT(*) AS BIGINT) AS n_a
        FROM events WHERE event_id % 2 = 0 GROUP BY 1, 2),
      b AS (
        SELECT event_type, CAST(floor(value) AS BIGINT) AS bucket,
          CAST(COUNT(*) AS BIGINT) AS n_b
        FROM events WHERE event_id % 2 = 1 GROUP BY 1, 2),
      joined AS (
        SELECT COALESCE(a.event_type, b.event_type) AS event_type,
          COALESCE(a.bucket, b.bucket) AS bucket,
          COALESCE(a.n_a, 0) AS n_a, COALESCE(b.n_b, 0) AS n_b
        FROM a FULL OUTER JOIN b
          ON b.event_type = a.event_type AND b.bucket = a.bucket),
      totals AS (
        SELECT event_type, CAST(SUM(n_a) AS BIGINT) AS na,
          CAST(SUM(n_b) AS BIGINT) AS nb,
          CAST(COUNT(*) AS BIGINT) AS n_buckets
        FROM joined GROUP BY 1)
      SELECT j.event_type, t.n_buckets, t.na, t.nb,
        CAST(CAST(SUM(abs(j.n_a * t.nb - j.n_b * t.na)) AS BIGINT)
             AS DOUBLE)
          / (2e0 * CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)) AS tv
      FROM joined j JOIN totals t ON t.event_type = j.event_type
      GROUP BY 1, 2, 3, 4"""))

  val all: Seq[OpSpec] = Seq(
    q42ImagingQuality, q43CheckCounts, q44Intersect, q45MinhashAgg,
    q46OfScore, q67ColumnProfile, q120ProfileDrift, q121KAnonymity,
    q198TvDrift)
}
