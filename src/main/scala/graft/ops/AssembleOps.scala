package graft.ops

import graft.{OpSpec, Tables}
import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators: once documents are scored and deduped,
  * a training run still has to decide HOW MUCH of each domain to take
  * and WHICH rows fill a token budget. These are the mixture/budget
  * passes every large-scale pretraining pipeline runs last (the
  * reference's `selected_target.json` subset selection generalized to
  * weighted domains), built so selection is deterministic under
  * retries, repartitioning, and corpus growth — the [[SampleOps]]
  * hash-rank discipline.
  */
object AssembleOps {

  /** Integer domain weight 1..4 derived from the source name — stands
    * in for a configured {domain: weight} map; the arithmetic below is
    * weight-table-agnostic. */
  private val weightExpr =
    "CAST(1 + CAST(substring(source, 4) AS INT) % 4 AS BIGINT)"

  /** Domain-mixture sampling: draw the LARGEST total sample whose
    * domain proportions match configured integer weights w_s, without
    * over-drawing any domain. With n_s rows available per domain and
    * W = Σw_s, the feasible total is T = min_s ⌊n_s·W / w_s⌋ and each
    * domain contributes ⌊T·w_s / W⌋ rows — all integer arithmetic, no
    * float ratios to diverge. Row selection within a domain is by
    * salted-md5 rank, so the drawn set is stable under any physical
    * row order and never changes retroactively when OTHER domains
    * grow.
    *
    * Scale shape: the per-domain count aggregate is map-side combined;
    * W and T are 1-row aggregates of that tiny table, attached back via
    * 1-row broadcasts (the q76 scalar-subquery shape — the "global"
    * numbers never force data to one partition); the only big-data
    * move is the per-domain rank window — one shuffle by source, the
    * same shape q52 already carries. */
  val q78DomainMix = OpSpec(
    "q78_domain_mix",
    (s, dir) => {
      val d = table(s, dir, "documents")
      val counts = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
        .withColumn("w", expr(weightExpr))
      val withTw = counts.crossJoin(
        broadcast(counts.agg(sum(col("w")).as("tw"))))
      val tmax = withTw.agg(min(expr("n * tw DIV w")).as("tmax"))
      val quotas = withTw.crossJoin(broadcast(tmax))
        .select(col("source"), expr("tmax * w DIV tw").as("quota"))
      val wr = Window.partitionBy(col("source"))
        .orderBy(col("rk"), col("doc_id"))
      d.withColumn("rk",
          md5(concat(lit("mix:"), col("doc_id")).cast("binary")))
        .withColumn("rn", row_number().over(wr).cast("long"))
        .join(broadcast(quotas), Seq("source"))
        .filter(col("rn") <= col("quota"))
        .select(col("source"), col("rn"), col("doc_id"), col("quota"))
    },
    Some(s"""
      WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               $weightExpr AS w
        FROM documents GROUP BY source),
      quotas AS (
        SELECT source, tmax * w // tw AS quota
        FROM (SELECT source, w, tw, MIN(n * tw // w) OVER () AS tmax
              FROM (SELECT source, n, w,
                      CAST(SUM(w) OVER () AS BIGINT) AS tw
                    FROM counts))),
      ranked AS (
        SELECT source, doc_id,
          CAST(ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY md5('mix:' || doc_id), doc_id) AS BIGINT) AS rn
        FROM documents)
      SELECT r.source, r.rn, r.doc_id, q.quota
      FROM ranked r JOIN quotas q ON r.source = q.source
      WHERE r.rn <= q.quota"""))

  /** Whitespace-token budget per domain. */
  private val TokenBudget = 600L

  /** Token-budget fill: within each domain, take documents in
    * preference order (longest first — stand-in for any quality order)
    * until the running token total would exceed the budget. The
    * running total is an exact integer window sum, so the cut point is
    * engine- and order-independent. This is the "pack the context
    * budget" selection a curriculum/mixture builder runs per domain.
    *
    * Scale shape: token counting is row-local; the cumulative sum is
    * one window per domain (the same single-shuffle shape as q10's
    * running total) — no global sort, no driver loop. */
  val q79TokenBudget = OpSpec(
    "q79_token_budget",
    (s, dir) => {
      val wc = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "documents")
        .withColumn("n_words",
          expr(s"CAST(size(${TextOps.wordsSpark}) AS BIGINT)"))
        .withColumn("cum_tokens", sum(col("n_words")).over(wc))
        .filter(col("cum_tokens") <= TokenBudget)
        .select(col("source"), col("doc_id"), col("n_words"),
          col("cum_tokens"))
    },
    Some(s"""
      SELECT source, doc_id, n_words,
        CAST(SUM(n_words) OVER (PARTITION BY source
          ORDER BY n_chars DESC, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_tokens
      FROM (SELECT source, doc_id, n_chars,
              CAST(len(${TextOps.wordsDuck}) AS BIGINT) AS n_words
            FROM documents)
      QUALIFY cum_tokens <= $TokenBudget"""))

  val all: Seq[OpSpec] = Seq(q78DomainMix, q79TokenBudget)
}
