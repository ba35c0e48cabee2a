package graft.ops

import graft.{OpSpec, Tables}
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (SURVEY §2.12 north-star:
  * exact, canonicalized, MinHash+LSH, SimHash). The LSH path is the one
  * that survives 100 TB: signatures and band keys are computed row-local,
  * candidate pairs come from an equi-join on (band_idx, band_value) —
  * never an O(n²) cross product — and only candidates pay the exact
  * verification cost.
  *
  * Hashes are md5-based so both engines agree bit-for-bit: MinHash takes
  * the lexicographic MIN of md5 hex strings per seed; SimHash derives
  * bits from md5 hex digits with instr/substring arithmetic.
  */
object DedupOps {

  private val wordsDuck =
    "list_filter(string_split_regex(text, '\\s+'), x -> length(x) > 0)"
  private val wordsSpark = "filter(split(text, '\\\\s+'), x -> length(x) > 0)"

  /** Exact dedup by content hash (dropDuplicates re-expressed as
    * groupBy(hash) so the survivor choice is deterministic: min doc_id).
    */
  val q25DedupExact = OpSpec(
    "q25_dedup_exact",
    (s, dir) => {
      table(s, dir, "documents")
        .groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    },
    Some("""
      SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
             COUNT(*) AS n_copies
      FROM documents GROUP BY md5(text)"""))

  /** Canonicalized (order/multiplicity-insensitive) dedup: fingerprint =
    * md5 of the sorted distinct word set. Catches reshuffled/repeated-word
    * copies that exact hashing misses. */
  val q26DedupWordset = OpSpec(
    "q26_dedup_wordset",
    (s, dir) => {
      table(s, dir, "documents")
        .withColumn("fp", expr(
          s"md5(CAST(array_join(array_sort(array_distinct($wordsSpark)), ' ') AS BINARY))"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    },
    Some(s"""
      SELECT md5(list_aggregate(list_sort(list_distinct($wordsDuck)), 'string_agg', ' ')) AS fp,
             min(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents
      GROUP BY 1"""))

  // ---- MinHash + LSH ------------------------------------------------

  private val K = 12 // signature length
  private val R = 3  // rows per band
  private val B = K / R

  /** (doc_id, shingle) rows — distinct 3-word shingles, built
    * relationally (posexplode → window lead → distinct) so the whole
    * pipeline stays inside whole-stage codegen, with the regex split
    * evaluated exactly once per document.
    *
    * The array/HOF formulation (transform over sequence of element_at)
    * is a trap at scale: HOFs always evaluate interpreted, and outside
    * codegen there is no common-subexpression elimination, so every
    * element_at reference re-evaluates the full regex split — measured
    * minutes per stage at sf0.1 whenever a Generate or a broadcast
    * build forced interpretation.
    *
    * The repartition pins an explicit partition count: hashing work is
    * far heavier than the scan bytes, and both the one-file input and
    * AQE coalescing would otherwise collapse the stage to one task. */
  def shingleRows(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    table(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), posexplode(expr(wordsSpark)).as(Seq("pos", "w")))
      .withColumn("w2", lead(col("w"), 1).over(w))
      .withColumn("w3", lead(col("w"), 2).over(w))
      .filter(col("w3").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("w"), col("w2"), col("w3")).as("shingle"))
      .distinct()
  }

  /** First `n` hex digits of the md5 string held in column `h`, folded
    * to a non-negative long — the numeric minhash domain. Fixed-width
    * long min() buffers keep HashAggregate on its fast path (var-length
    * string minima knock it off: ~190 µs/row measured). */
  private def hexToLong(h: String, n: Int = 12): String =
    (1 to n).map { i =>
      val p = java.lang.Math.pow(16, n - i).toLong
      s"(instr('0123456789abcdef', substring($h, $i, 1)) - 1) * CAST($p AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** DuckDB twin of [[shingleDf]] as a CTE body. */
  private val shingleDuck = s"""
    SELECT doc_id,
      list_distinct(list_transform(generate_series(1, len(words) - 2),
        i -> words[i] || ' ' || words[i + 1] || ' ' || words[i + 2])) AS sh
    FROM (SELECT doc_id, $wordsDuck AS words FROM documents)
    WHERE len(words) >= 3"""

  /** MinHash near-dup detection with banded LSH (shingle → K md5-min
    * signature → B bands → equi-join candidates → exact Jaccard verify).
    * Output: candidate pairs that verify at Jaccard >= 0.25. */
  val q27MinhashLsh = OpSpec(
    "q27_minhash_lsh",
    (s, dir) => {
      // shingle rows are reused by signatures and both verify joins
      val sh = shingleRows(s, dir).persist()
      // one md5 per (seed, shingle) — a dedicated projection so the
      // hex-digit folds below reference the materialized h_i columns
      val hashed = sh.select(col("doc_id") +: col("shingle") +:
        (0 until K).map(i =>
          md5(concat(lit(s"$i:"), col("shingle")).cast("binary")).as(s"h$i")): _*)
      val sigs = hashed.groupBy(col("doc_id")).agg(
        min(expr(s"CAST(${hexToLong("h0")} AS BIGINT)")).as("s0"),
        (1 until K).map(i =>
          min(expr(s"CAST(${hexToLong(s"h$i")} AS BIGINT)")).as(s"s$i")): _*)
      val bandPairs = (0 until B).map(j =>
        s"$j, md5(CAST(concat_ws('|', ${(0 until R).map(r => s"CAST(s${j * R + r} AS STRING)").mkString(", ")}) AS BINARY))")
      val bands = sigs.select(col("doc_id"),
        expr(s"stack($B, ${bandPairs.mkString(", ")}) AS (band_idx, band_val)"))
        .persist()
      val docs = sh.groupBy(col("doc_id"))
        .agg(collect_list(col("shingle")).as("sh"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_val") === col("b.band_val") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
        .withColumn("n_inter", expr(
          "CAST(size(filter(sha, x -> array_contains(shb, x))) AS BIGINT)"))
        .withColumn("jaccard", expr(
          "CAST(n_inter AS DOUBLE) / (size(sha) + size(shb) - n_inter)"))
        .filter(col("jaccard") >= 0.25)
        .select(col("doc_a"), col("doc_b"), col("n_inter"), col("jaccard"))
    },
    Some {
      val sigSelect = (0 until K).map(i =>
        s"""list_min(list_transform(list_transform(sh, x -> md5('$i:' || x)),
             h -> CAST(${hexToLong("h")} AS BIGINT))) AS s$i""").mkString(", ")
      val bandUnion = (0 until B).map { j =>
        val cat = (0 until R).map(r => s"CAST(s${j * R + r} AS VARCHAR)").mkString(", ")
        s"SELECT doc_id, $j AS band_idx, md5(concat_ws('|', $cat)) AS band_val FROM sigs"
      }.mkString("\n      UNION ALL\n      ")
      s"""
      WITH docs AS ($shingleDuck),
      sigs AS (SELECT doc_id, sh, $sigSelect FROM docs),
      bands AS ($bandUnion),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b,
        CAST(len(list_filter(x.sh, v -> list_contains(y.sh, v))) AS BIGINT) AS n_inter,
        CAST(CAST(len(list_filter(x.sh, v -> list_contains(y.sh, v))) AS BIGINT) AS DOUBLE)
          / (len(x.sh) + len(y.sh) - CAST(len(list_filter(x.sh, v -> list_contains(y.sh, v))) AS BIGINT)) AS jaccard
      FROM cand JOIN docs x ON cand.doc_a = x.doc_id
                JOIN docs y ON cand.doc_b = y.doc_id
      WHERE CAST(CAST(len(list_filter(x.sh, v -> list_contains(y.sh, v))) AS BIGINT) AS DOUBLE)
          / (len(x.sh) + len(y.sh) - CAST(len(list_filter(x.sh, v -> list_contains(y.sh, v))) AS BIGINT)) >= 0.25"""
    })

  // ---- SimHash ------------------------------------------------------

  /** ±1 vote for bit `b` (0 = MSB) of the 32-bit hash held in column/
    * lambda var `h` (a precomputed md5 hex string — hashed ONCE per
    * shingle, not once per bit), derived via hex-digit arithmetic
    * portable to both engines. */
  private def bitTerm(b: Int, h: String = "h"): String = {
    val pos = b / 4 + 1           // 1-based hex digit index
    val p = 1 << (3 - (b % 4))    // weight of the bit inside the digit
    s"(2 * (CASE WHEN ((instr('0123456789abcdef', substring($h, $pos, 1)) - 1) % ${2 * p}) >= $p THEN 1 ELSE 0 END) - 1)"
  }

  private val shhDuck = "list_transform(sh, w -> md5(w))"

  /** Spark: per-document SimHash via explode + 32 sum(long) aggregates.
    * Higher-order functions (aggregate/transform) always evaluate
    * interpreted — 32 of them per row cost minutes at sf0.1 — while
    * explode + fixed-width long sums stay fully codegen'd end to end.
    * Bit-vote sums are order-independent integer additions, so the
    * result is engine-exact regardless of shuffle order. */
  private def simhashDf(s: SparkSession, dir: String): DataFrame = {
    val ex = shingleRows(s, dir)
      .withColumn("h", md5(col("shingle").cast("binary")))
    val sums = ex
      .select(col("doc_id") +:
        (0 until 32).map(b => expr(bitTerm(b)).cast("long").as(s"v$b")): _*)
      .groupBy(col("doc_id"))
      .agg(sum(col("v0")).as("v0"),
        (1 until 32).map(b => sum(col(s"v$b")).as(s"v$b")): _*)
    val packed = (0 until 32)
      .map(b => s"(CASE WHEN v$b >= 0 THEN ${1L << (31 - b)} ELSE 0 END)")
      .mkString("(", " + ", ")")
    sums.select(col("doc_id"), expr(s"CAST($packed AS BIGINT)").as("simhash"))
  }

  /** DuckDB twin (lists are fine there — single-process, vectorized). */
  private def simhashDuck: String =
    (0 until 32).map { b =>
      val sum = s"CAST(list_sum(list_transform(shh, h -> ${bitTerm(b)})) AS BIGINT)"
      s"(CASE WHEN $sum >= 0 THEN ${1L << (31 - b)} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Per-document 32-bit SimHash over 3-word shingles. */
  val q28Simhash = OpSpec(
    "q28_simhash",
    (s, dir) => simhashDf(s, dir),
    Some(s"""
      WITH docs AS ($shingleDuck),
      hashed AS (SELECT doc_id, $shhDuck AS shh FROM docs)
      SELECT doc_id, CAST($simhashDuck AS BIGINT) AS simhash FROM hashed"""))

  /** SimHash near-dup pairs: query docs (doc_id % 10 = 0) against the
    * rest, Hamming distance <= 6. At scale the same query runs as an
    * equi-join on simhash bands (split the 32 bits into 4 bytes; any
    * equal byte is a candidate) — here the corpus side is small enough
    * to compare directly. */
  val q29SimhashPairs = OpSpec(
    "q29_simhash_pairs",
    (s, dir) => {
      val sims = simhashDf(s, dir).persist()
      val a = sims.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
      val b = sims.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
      a.crossJoin(b)
        .withColumn("hamming",
          expr("CAST(bit_count(sim_a ^ sim_b) AS BIGINT)"))
        .filter(col("hamming") <= 6)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    },
    Some(s"""
      WITH docs AS ($shingleDuck),
      hashed AS (SELECT doc_id, $shhDuck AS shh FROM docs),
      sims AS (SELECT doc_id, CAST($simhashDuck AS BIGINT) AS simhash FROM hashed)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      FROM sims a JOIN sims b
        ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
      WHERE CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) <= 6"""))

  val all: Seq[OpSpec] = Seq(
    q25DedupExact, q26DedupWordset, q27MinhashLsh, q28Simhash,
    q29SimhashPairs)
}
