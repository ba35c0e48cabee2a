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

  /** Spark: docs → (doc_id, sh) where sh = distinct 3-word shingles.
    * The repartition decouples compute parallelism from the input file
    * count: hashing work is far heavier than the scan, and a small
    * shard (locally: one file) would otherwise pin the whole shingle +
    * signature pipeline to one task. */
  def shingleDf(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      // explicit partition count: an AQE-coalescible repartition(col)
      // collapses this tiny-by-bytes but compute-heavy stage back to
      // one task (observed: a 9-minute single-task SimHash stage)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("words", expr(wordsSpark))
      .filter(expr("size(words) >= 3"))
      .withColumn("sh", expr(
        """array_distinct(transform(sequence(1, size(words) - 2),
             i -> concat(element_at(words, i), ' ',
                         element_at(words, i + 1), ' ',
                         element_at(words, i + 2))))"""))
      .select(col("doc_id"), col("sh"))

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
      // Signature computation notes (measured at sf0.1):
      //  - the HOF form array_min(transform(sh, md5)) is fast (~4 s)
      //    while it stays inside whole-stage codegen, but re-evaluating
      //    it interpreted (under a Generate, or on both sides of the
      //    self-join) cost 50-350 s — so signatures are computed ONCE
      //    and persisted (a few MB: doc_id + shingles + 12 hashes).
      //  - the explode + 12×min(md5) aggregate alternative is NOT an
      //    option: var-length string buffers knock HashAggregate off its
      //    fast path (~190 µs/row).
      val sigCols = (0 until K).map(i =>
        expr(s"array_min(transform(sh, x -> md5(concat('$i:', x))))").as(s"s$i"))
      val sigs = shingleDf(s, dir)
        .select(col("doc_id") +: col("sh") +: sigCols: _*)
        .persist()
      val docs = sigs.select(col("doc_id"), col("sh"))
      val bandPairs = (0 until B).map(j =>
        s"$j, md5(CAST(concat_ws('|', ${(0 until R).map(r => s"s${j * R + r}").mkString(", ")}) AS BINARY))")
      val bands = sigs.select(col("doc_id"),
        expr(s"stack($B, ${bandPairs.mkString(", ")}) AS (band_idx, band_val)"))
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
        s"list_min(list_transform(sh, x -> md5('$i:' || x))) AS s$i").mkString(", ")
      val bandUnion = (0 until B).map { j =>
        val cat = (0 until R).map(r => s"s${j * R + r}").mkString(", ")
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
    val ex = shingleDf(s, dir)
      .select(col("doc_id"), explode(col("sh")).as("w"))
      .withColumn("h", md5(col("w").cast("binary")))
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
