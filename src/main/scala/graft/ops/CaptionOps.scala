package graft.ops

import graft.{OpSpec, Tables}
import graft.Tables._
import org.apache.spark.sql.functions._

/** Caption/LLM column-transform operators (M5-M7) and the scoring-stage
  * instantiations (M2) that are deterministic enough to oracle-check.
  * The generation step itself is pluggable (SURVEY §7.3: non-
  * deterministic ML isolated behind kernels); here a deterministic stub
  * generator stands in so the full prompt→generate→parse pipeline is
  * exercised and verified end-to-end.
  */
object CaptionOps {

  // the canonical tokenizer (single definition: TextOps)
  private def wordsSpark = TextOps.wordsSpark
  private def wordsDuck = TextOps.wordsDuck

  /** M2 aesthetic stand-in through the real mapPartitions scoring
    * skeleton ([[ScoreStage]]): L2-normalize + fixed linear head. The
    * kernel's left-to-right folds are mirrored in the oracle, so the JVM
    * and DuckDB doubles are bit-identical. */
  val q34AestheticLinear = OpSpec(
    "q34_aesthetic_linear",
    (s, dir) => {
      val df = table(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      ScoreStage.dropFailed(
        ScoreStage.scoreStage(df, new ScoreStage.LinearHeadKernel(64),
          batchSize = 8, outCol = "aesthetic"),
        "aesthetic")
        .select(col("vec_id"), col("aesthetic"))
    },
    Some("""
      SELECT vec_id,
        list_reduce(list_transform(generate_series(1, len(embedding)), i ->
          (CAST(embedding[i] AS DOUBLE) / nrm)
          * (CAST((((i - 1) * 7) % 13) - 6 AS DOUBLE) / 13e0)), (a, b) -> a + b) AS aesthetic
      FROM (SELECT vec_id, embedding,
              CASE WHEN ss = 0 THEN 1e0 ELSE sqrt(ss) END AS nrm
            FROM (SELECT vec_id, embedding,
                    list_reduce(list_transform(generate_series(1, len(embedding)), j ->
                      CAST(embedding[j] AS DOUBLE) * CAST(embedding[j] AS DOUBLE)),
                      (a, b) -> a + b) AS ss
                  -- mirrors the kernel's failure path (null/empty -> Left
                  -- -> dropFailed); an empty list would also crash
                  -- DuckDB's list_reduce outright
                  FROM embeddings
                  WHERE embedding IS NOT NULL AND len(embedding) > 0))"""))

  /** M7 prompt templating (F10, sum_caption_llama.py:34-40) + stub
    * generation + answer parsing (F9, sum_caption_llama.py:42-50):
    * prompt → `Answer: [a, b, c]` → regex extract → split/trim. */
  val q35CaptionParse = OpSpec(
    "q35_caption_parse",
    (s, dir) => {
      table(s, dir, "documents")
        .withColumn("prompt", expr(
          "concat('Extract the main objects. Captions: ', text, ' ### Answer:')"))
        .withColumn("gen", expr(
          s"concat(prompt, ' [', array_join(slice(array_sort(array_distinct($wordsSpark)), 1, 3), ', '), ']')"))
        .withColumn("answer", expr(
          "regexp_extract(gen, 'Answer:\\\\s*\\\\[(.*?)\\\\]', 1)"))
        .select(col("doc_id"),
          length(col("prompt")).cast("long").as("prompt_len"),
          col("answer"),
          expr("array_join(transform(split(answer, ','), x -> trim(x)), '|')")
            .as("objects"))
    },
    Some(s"""
      SELECT doc_id,
        CAST(length(prompt) AS BIGINT) AS prompt_len,
        regexp_extract(gen, 'Answer:\\s*\\[(.*?)\\]', 1) AS answer,
        list_aggregate(list_transform(
          string_split(regexp_extract(gen, 'Answer:\\s*\\[(.*?)\\]', 1), ','),
          x -> trim(x)), 'string_agg', '|') AS objects
      FROM (SELECT doc_id, prompt,
              prompt || ' [' ||
                coalesce(list_aggregate(list_sort(list_distinct($wordsDuck))[1:3],
                  'string_agg', ', '), '') || ']' AS gen
            FROM (SELECT doc_id, text,
                    'Extract the main objects. Captions: ' || text ||
                    ' ### Answer:' AS prompt
                  FROM documents))"""))
    // ^ coalesce: DuckDB's string_agg over an EMPTY word list is NULL and
    //   would null out gen, while Spark's array_join yields '' — a
    //   zero-word document must produce '[]' in BOTH engines

  /** M1 ContentDetector semantics on a frame stream: a cut wherever the
    * content delta between consecutive "frames" exceeds the threshold
    * (30.0 scaled to this data → 300), then per-scene rollup. Same
    * gaps-and-islands shape that powers sessionization — one shuffle. */
  val q36SceneDetectContent = OpSpec(
    "q36_scene_detect_content",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // event_id tie-break: on duplicate (user_id, ts) the lag() input
      // order would otherwise be shuffle-dependent (the q10 lesson —
      // never assume a timestamp is unique)
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "events")
        .withColumn("prev", lag(col("value"), 1).over(byUser))
        .withColumn("new_scene",
          when(col("prev").isNull || abs(col("value") - col("prev")) > 300.0, 1L)
            .otherwise(0L))
        .withColumn("scene_id", sum(col("new_scene")).over(cum))
        .groupBy(col("user_id"), col("scene_id"))
        .agg(count(lit(1)).as("n_frames"),
          dsum(col("value")).as("total_value"),
          min(col("ts")).as("t0"), max(col("ts")).as("t1"))
        .select(col("user_id"), col("scene_id"), col("n_frames"),
          col("total_value"),
          fmtTs(col("t0")).as("scene_start"), fmtTs(col("t1")).as("scene_end"))
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                 OR abs(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 3e2
               THEN 1 ELSE 0 END AS new_scene
        FROM events),
      scenes AS (
        SELECT user_id, ts, value,
          SUM(new_scene) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene_id
        FROM flagged)
      SELECT user_id, CAST(scene_id AS BIGINT) AS scene_id,
        COUNT(*) AS n_frames,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS scene_start,
        strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS scene_end
      FROM scenes GROUP BY user_id, scene_id"""))

  /** F11 caption token cleanup (coca_caption.py:98-99: strip the
    * `<start_of_text>` marker, truncate at `<end_of_text>`). The raw
    * generator output is reconstructed from the document text the way
    * CoCa emits it — marker-wrapped with trailing generation junk — then
    * cleaned with literal replace + split-at-marker (no regex: marker
    * tokens contain no metacharacter semantics, and literal ops stay
    * codegen'd). */
  val q47CaptionCleanup = OpSpec(
    "q47_caption_cleanup",
    (s, dir) => {
      table(s, dir, "documents")
        .withColumn("raw", concat(
          lit("<start_of_text>"), col("text"),
          lit("<end_of_text> trailing generation junk !!")))
        .select(col("doc_id"),
          expr("""trim(replace(substring_index(raw, '<end_of_text>', 1),
                  '<start_of_text>', ''))""").as("caption"))
        .withColumn("caption_len", length(col("caption")).cast("long"))
    },
    Some("""
      SELECT doc_id,
        trim(replace(split_part(raw, '<end_of_text>', 1),
             '<start_of_text>', '')) AS caption,
        CAST(length(trim(replace(split_part(raw, '<end_of_text>', 1),
             '<start_of_text>', ''))) AS BIGINT) AS caption_len
      FROM (SELECT doc_id,
              '<start_of_text>' || text ||
              '<end_of_text> trailing generation junk !!' AS raw
            FROM documents)"""))

  val all: Seq[OpSpec] = Seq(
    q34AestheticLinear, q35CaptionParse, q36SceneDetectContent,
    q47CaptionCleanup)
}
