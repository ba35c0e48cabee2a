package graft.ops

import graft.{OpSpec, Tables}
import graft.Tables._
import org.apache.spark.sql.functions._

/** Operators mirroring the reference pipeline's media-shaped semantics,
  * instantiated over the driver testdata with deterministic kernels so a
  * DuckDB oracle exists (SURVEY.md §5: ML kernels hide behind pure
  * functions; the Spark-side plumbing is the real operator).
  */
object PipelineOps {

  /** M1 scene-cut explode: the pipeline's only 1→N generator
    * (utils/scenecut.py:88-96 ContentDetector → scene list → one clip row
    * per scene; clip_id format F3 scene_cut.py:82 `%s_%07d`). Kernel here
    * is the deterministic fixed-interval splitter (chunk = 30 units of
    * `value`); Spark shape is `explode(sequence(...))` — a generator that
    * never materializes the array on the driver and scales row-local. */
  val q12SceneExplode = OpSpec(
    "q12_scene_explode",
    (s, dir) => {
      val n = ceil(col("value") / 30.0).cast("long")
      table(s, dir, "events")
        .select(col("event_id"), col("value").as("duration"), n.as("n_clips"))
        // zero-duration events have n_clips = 0; sequence(0, -1) would
        // step BACKWARDS ([0, -1]) where the oracle's generate_series is
        // empty — drop them before the generator, matching the oracle.
        .filter(col("n_clips") >= 1)
        .withColumn("i", explode(sequence(lit(0L), col("n_clips") - 1)))
        .select(
          col("event_id"),
          format_string("%d_%07d", col("event_id"), col("i")).as("clip_id"),
          col("i").as("clip_idx"),
          (col("i").cast("double") * 30.0).as("clip_start"),
          least(col("i").cast("double") * 30.0 + 30.0, col("duration"))
            .as("clip_end"))
    },
    Some("""
      SELECT event_id,
             printf('%d_%07d', event_id, i) AS clip_id,
             i AS clip_idx,
             CAST(i AS DOUBLE) * 3e1 AS clip_start,
             least(CAST(i AS DOUBLE) * 3e1 + 3e1, duration) AS clip_end
      FROM (SELECT event_id, value AS duration,
                   CAST(ceil(value / 3e1) AS BIGINT) AS n_clips
            FROM events),
           LATERAL (SELECT unnest(generate_series(0, n_clips - 1)) AS i)"""))

  /** S4/S5/S6 frame-sampling index kernels, all three policies of the
    * reference in one projection:
    *  - fractional points 0.2/0.5/0.8 (data_schema/macvidataset.py:21)
    *  - first/mid/last with the degenerate n<=3 → [0,0,0] guard
    *    (coca_caption.py:41-53)
    *  - stride-10 count (ocr_score.py:86, utils/utils.py:17-35)
    * Pure integer column math → oracle-exact; the binary decode behind
    * these indices lives in graft.media (stubbed, non-correctness path).
    */
  val q13FrameSampler = OpSpec(
    "q13_frame_sampler",
    (s, dir) => {
      val n = (floor(col("value")).cast("long") + 1L)
      table(s, dir, "events")
        .select(col("event_id"), n.as("n_frames"))
        .select(
          col("event_id"), col("n_frames"),
          floor(col("n_frames") * 0.2).cast("long").as("idx_f20"),
          floor(col("n_frames") * 0.5).cast("long").as("idx_f50"),
          floor(col("n_frames") * 0.8).cast("long").as("idx_f80"),
          lit(0L).as("idx_first"), // first frame: 0 in both branches
          when(col("n_frames") <= 3, 0L)
            .otherwise(floor(col("n_frames") / 2).cast("long")).as("idx_mid"),
          when(col("n_frames") <= 3, 0L)
            .otherwise(col("n_frames") - 1).as("idx_last"),
          (floor((col("n_frames") - 1) / 10).cast("long") + 1L)
            .as("n_stride10"))
    },
    Some("""
      SELECT event_id, n_frames,
        CAST(floor(n_frames * 2e-1) AS BIGINT) AS idx_f20,
        CAST(floor(n_frames * 5e-1) AS BIGINT) AS idx_f50,
        CAST(floor(n_frames * 8e-1) AS BIGINT) AS idx_f80,
        CAST(0 AS BIGINT) AS idx_first,
        CASE WHEN n_frames <= 3 THEN 0
             ELSE CAST(floor(n_frames / 2) AS BIGINT) END AS idx_mid,
        CASE WHEN n_frames <= 3 THEN 0 ELSE n_frames - 1 END AS idx_last,
        CAST(floor((n_frames - 1) / 10) AS BIGINT) + 1 AS n_stride10
      FROM (SELECT event_id,
                   CAST(floor(value) AS BIGINT) + 1 AS n_frames
            FROM events)"""))

  /** M8/F8 motion-vector score kernel: mean sqrt(mx²+my²) over a clip's
    * motion vectors (models/extract_mvs.c:69-81,202). Lineitems of one
    * order stand in for the MVs of one clip. Each sqrt is rounded to 6dp
    * — via floor(x·1e6 + 0.5)/1e6, the recipe both engines compute with
    * IDENTICAL IEEE ops (their native round() functions disagree on
    * tie-adjacent doubles) — then summed exactly in decimal, so the mean
    * is order-independent and engine-identical (plain double sums are
    * not). */
  val q14MvsMean = OpSpec(
    "q14_mvs_mean",
    (s, dir) => {
      val mag = floor(
        sqrt(col("l_quantity") * col("l_quantity") +
          (col("l_discount") * 100.0) * (col("l_discount") * 100.0))
          * 1000000.0 + 0.5) / 1000000.0
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), mag.as("mag"))
        .groupBy(col("l_orderkey"))
        .agg(
          count(lit(1)).as("n_mvs"),
          (sum(col("mag").cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("mvs_mean"))
    },
    Some("""
      SELECT l_orderkey, COUNT(*) AS n_mvs,
        CAST(CAST(SUM(CAST(mag AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS mvs_mean
      FROM (SELECT l_orderkey,
              floor(sqrt(l_quantity * l_quantity +
                    (l_discount * 1e2) * (l_discount * 1e2))
                    * 1e6 + 5e-1) / 1e6 AS mag
            FROM lineitem)
      GROUP BY l_orderkey"""))

  /** F6/F7 OCR text-box area kernel: shoelace area of a quadrilateral +
    * area-ratio score (ocr_score.py:37-49). The quad is built from row
    * columns; the arithmetic is written identically in both engines so
    * each row's double is bit-identical (no aggregation → no order risk).
    */
  val q15OcrArea = OpSpec(
    "q15_ocr_area",
    (s, dir) => {
      val x1 = col("l_quantity");            val y1 = col("l_discount")
      val x2 = col("l_extendedprice") / 1000.0; val y2 = col("l_tax")
      val x3 = col("l_quantity") + 1.0;      val y3 = col("l_discount") + 1.0
      val x4 = col("l_extendedprice") / 2000.0; val y4 = col("l_tax") + 2.0
      val area = abs(
        (x1 * y2 - x2 * y1) + (x2 * y3 - x3 * y2) +
          (x3 * y4 - x4 * y3) + (x4 * y1 - x1 * y4)) / 2.0
      table(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"),
          area.as("box_area"),
          (area / 10000.0).as("area_ratio"))
    },
    Some("""
      SELECT l_orderkey,
        abs((x1*y2 - x2*y1) + (x2*y3 - x3*y2) + (x3*y4 - x4*y3) + (x4*y1 - x1*y4)) / 2e0 AS box_area,
        (abs((x1*y2 - x2*y1) + (x2*y3 - x3*y2) + (x3*y4 - x4*y3) + (x4*y1 - x1*y4)) / 2e0) / 1e4 AS area_ratio
      FROM (SELECT l_orderkey,
              l_quantity AS x1, l_discount AS y1,
              l_extendedprice / 1e3 AS x2, l_tax AS y2,
              l_quantity + 1e0 AS x3, l_discount + 1e0 AS y3,
              l_extendedprice / 2e3 AS x4, l_tax + 2e0 AS y4
            FROM lineitem WHERE l_linenumber = 1)"""))

  /** F1/F2/F3 path algebra: the reference's string-substitution path
    * convention (data_schema/macvid.py:95-100: metadata path ↔ video dir
    * by replace; coca_caption.py:66,108) + clip-id formatting. */
  val q16PathAlgebra = OpSpec(
    "q16_path_algebra",
    (s, dir) => {
      table(s, dir, "documents")
        .select(
          col("doc_id"),
          concat(lit("/data/metadata/all/"), col("source"), lit("/"),
            col("doc_id"), lit(".json")).as("meta_path"))
        .select(
          col("doc_id"), col("meta_path"),
          regexp_replace(
            regexp_replace(col("meta_path"), "metadata/all", "videos"),
            "\\.json$", ".mp4").as("video_path"),
          regexp_extract(col("meta_path"), "\\.([a-z0-9]+)$", 1).as("ext"),
          format_string("%d_%07d", col("doc_id"), col("doc_id") % 100)
            .as("clip_id"))
    },
    Some("""
      SELECT doc_id, meta_path,
        regexp_replace(regexp_replace(meta_path, 'metadata/all', 'videos'),
                       '\.json$', '.mp4') AS video_path,
        regexp_extract(meta_path, '\.([a-z0-9]+)$', 1) AS ext,
        printf('%d_%07d', doc_id, doc_id % 100) AS clip_id
      FROM (SELECT doc_id,
              '/data/metadata/all/' || source || '/' || doc_id || '.json' AS meta_path
            FROM documents)"""))

  /** q246: MEDIA pipeline v4 — the reference's actual dataflow
    * (README.md:92-116: scene-cut → per-clip frame decode → scoring →
    * filter → merge/export) composed END-TO-END as one gated query,
    * where rounds 1-8 gated it only in segments (q12/q13/q14/q34/
    * q49/q100/q200):
    *
    *   scene-cut explode (M1, q12's kernel) → frame sample (S5, q13's
    *   0.2/0.5/0.8 points) → per-frame motion-score kernel (M8, q14's
    *   6-dp sqrt recipe, clip-dependent so distinct clips score
    *   distinctly) → quality gate (P2 min-duration + score floor,
    *   both EXACT-INTEGER compares: cents and micro units) →
    *   canonical dedup (X1: md5 of (n_frames, exact micro score),
    *   first-(event, clip)-wins) → sequence pack (q79's budget fill:
    *   per-video cumulative cents ≤ 9000, exact window sum).
    *
    * Plan shape is the point: stages 1-4 are ROW-LOCAL — one Generate
    * feeding projections and integer filters, pipelined inside a
    * single stage with NO shuffle between the explode and the scorers
    * (spec-pinned) — and the whole pipeline pays exactly two
    * exchanges: the dedup window's hash on the canonical key and the
    * pack window's hash on the video. Per-frame scores sum as exact
    * integer micro units (the divide-by-3e6 double is emitted, never
    * compared), so every gate/dedup/pack decision is engine-exact. */
  val q246PipelineV4 = OpSpec(
    "q246_pipeline_v4",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      def micro(ix: String) =
        s"""CAST(floor(sqrt(($ix + 1 + clip_idx) * ($ix + 1 + clip_idx)
            + duration * duration) * 1e6 + 5e-1) AS BIGINT)"""
      val clips = table(s, dir, "events")
        .select(col("event_id"), col("value").as("duration"),
          ceil(col("value") / 30.0).cast("long").as("n_clips"))
        .filter(col("n_clips") >= 1)
        .withColumn("i", explode(sequence(lit(0L), col("n_clips") - 1)))
        .select(col("event_id"), col("duration"),
          format_string("%d_%07d", col("event_id"), col("i"))
            .as("clip_id"),
          col("i").as("clip_idx"),
          (least(col("i").cast("double") * 30.0 + 30.0, col("duration"))
            - col("i").cast("double") * 30.0).as("clip_len"))
        .withColumn("n_frames", floor(col("clip_len")).cast("long") + 1L)
        .withColumn("len_c",
          expr("CAST(round(clip_len * 1e2) AS BIGINT)"))
      val scored = clips
        .withColumn("micro_sum",
          expr(micro("CAST(floor(n_frames * 2e-1) AS BIGINT)")) +
          expr(micro("CAST(floor(n_frames * 5e-1) AS BIGINT)")) +
          expr(micro("CAST(floor(n_frames * 8e-1) AS BIGINT)")))
      val gated = scored
        .filter(col("len_c") >= 500L && col("micro_sum") >= 60000000L)
      val wd = Window.partitionBy(col("nk"))
        .orderBy(col("event_id"), col("clip_idx"))
      val deduped = gated
        .withColumn("nk", md5(concat_ws(":", col("n_frames"),
          col("micro_sum")).cast("binary")))
        .withColumn("rn", row_number().over(wd))
        .filter(col("rn") === 1)
      val wp = Window.partitionBy(col("event_id")).orderBy(col("clip_idx"))
      deduped
        .withColumn("seq_pos", row_number().over(wp).cast("long"))
        .withColumn("cum_c", sum(col("len_c")).over(
          wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum_c") <= 9000L)
        .select(col("event_id"), col("clip_id"), col("clip_idx"),
          col("n_frames"),
          (col("micro_sum").cast("double") / 3e6).as("mvs_mean"),
          col("clip_len"), col("seq_pos"),
          (col("cum_c").cast("double") / 1e2).as("cum_len"))
    },
    Some {
      def micro(ix: String) =
        s"""CAST(floor(sqrt(($ix + 1 + clip_idx) * ($ix + 1 + clip_idx)
            + duration * duration) * 1e6 + 5e-1) AS BIGINT)"""
      s"""
      WITH clips AS (
        SELECT event_id, duration,
          printf('%d_%07d', event_id, i) AS clip_id, i AS clip_idx,
          least(CAST(i AS DOUBLE) * 3e1 + 3e1, duration)
            - CAST(i AS DOUBLE) * 3e1 AS clip_len
        FROM (SELECT event_id, value AS duration,
                     CAST(ceil(value / 3e1) AS BIGINT) AS n_clips
              FROM events),
             LATERAL (SELECT unnest(generate_series(0, n_clips - 1)) AS i)),
      sampled AS (
        SELECT *, CAST(floor(clip_len) AS BIGINT) + 1 AS n_frames,
          CAST(round(clip_len * 1e2) AS BIGINT) AS len_c
        FROM clips),
      scored AS (
        SELECT *,
          ${micro("CAST(floor(n_frames * 2e-1) AS BIGINT)")} +
          ${micro("CAST(floor(n_frames * 5e-1) AS BIGINT)")} +
          ${micro("CAST(floor(n_frames * 8e-1) AS BIGINT)")} AS micro_sum
        FROM sampled),
      gated AS (
        SELECT * FROM scored
        WHERE len_c >= 500 AND micro_sum >= 60000000),
      deduped AS (
        SELECT * FROM (
          SELECT *, md5(n_frames || ':' || micro_sum) AS nk FROM gated)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY nk
          ORDER BY event_id, clip_idx) = 1)
      SELECT event_id, clip_id, clip_idx, n_frames,
        CAST(micro_sum AS DOUBLE) / 3e6 AS mvs_mean, clip_len,
        CAST(ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY clip_idx)
          AS BIGINT) AS seq_pos,
        CAST(SUM(len_c) OVER (PARTITION BY event_id ORDER BY clip_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          / 1e2 AS cum_len
      FROM deduped
      QUALIFY SUM(len_c) OVER (PARTITION BY event_id ORDER BY clip_idx
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= 9000"""
    })

  val all: Seq[OpSpec] = Seq(
    q12SceneExplode, q13FrameSampler, q14MvsMean, q15OcrArea,
    q16PathAlgebra, q246PipelineV4)
}
