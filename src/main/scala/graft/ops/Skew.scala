package graft.ops

import graft.{OpSpec, Tables}
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key skew mitigation (SURVEY §2.10 / D-family). AQE's skew-join
  * split handles most runtime skew transparently; these explicit forms
  * cover the two cases AQE cannot: (a) a reduce-side aggregate whose hot
  * GROUP BY key funnels one partition (AQE splits join partitions, not
  * aggregate partitions), and (b) a shuffle join whose skew is known
  * ahead of time and whose small side is replicable, where salting keeps
  * the big side's hot key spread across `salt` tasks deterministically
  * instead of relying on post-hoc re-planning.
  *
  * Both transforms are semantics-preserving: results equal the unsalted
  * plan bit-for-bit for associative/commutative aggregates (tested).
  */
object Skew {

  /** One aggregate routed through the two salted phases: `partial` runs
    * per (key, salt) sub-group, `merge` folds the partials per key.
    * Associative pairs (sum/sum, count-as-sum, min/min, max/max)
    * preserve exact semantics; the decimal-sum trick (Tables.dsum)
    * composes unchanged since decimal addition is associative. */
  final case class SaltedAgg(out: String, partial: Column, merge: Column => Column)

  /** Two-phase salted aggregation: groupBy(key, salt) partial → final
    * groupBy(key). The salt derives from a uniform-ish deterministic
    * hash of the SPREAD column (a high-cardinality column such as the
    * row's id), never from rand() — task retries must re-produce the
    * same salt or speculative execution double-counts. */
  def saltedAgg(df: DataFrame, key: Column, keyName: String,
      spread: Column, salt: Int, aggs: Seq[SaltedAgg]): DataFrame = {
    require(salt >= 1, s"salt=$salt must be >= 1")
    require(aggs.nonEmpty, "at least one aggregate required")
    val phase1 = df
      .withColumn("__salt", pmod(hash(spread), lit(salt)))
      .groupBy(key.as(keyName), col("__salt"))
      .agg(aggs.head.partial.as(s"__p_${aggs.head.out}"),
        aggs.tail.map(a => a.partial.as(s"__p_${a.out}")): _*)
    phase1
      .groupBy(col(keyName))
      .agg(aggs.head.merge(col(s"__p_${aggs.head.out}")).as(aggs.head.out),
        aggs.tail.map(a => a.merge(col(s"__p_${a.out}")).as(a.out)): _*)
  }

  /** Salted equi-join for a skewed LEFT side against a replicable RIGHT
    * side: the left's hot key rows scatter over `salt` sub-keys via a
    * deterministic hash of `leftSpread`; the right side is exploded
    * `salt`-fold so every sub-key finds its match. Right-side blowup is
    * `salt ×` — use only when the right side is dimension-sized (the
    * same precondition as a broadcast join, without needing the right
    * side to fit in every executor's memory at once).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      leftSpread: Column, salt: Int): DataFrame = {
    require(salt >= 1, s"salt=$salt must be >= 1")
    val l = left.withColumn("__salt", pmod(hash(leftSpread), lit(salt)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** D-family under the hash gate: the salted two-phase aggregate must be
    * bit-identical to the plain GROUP BY the oracle runs. l_returnflag has
    * 3 values — the degenerate hot-key shape where an unsalted reduce
    * funnels the whole table through 3 tasks; salt=16 spreads each key
    * over 16 sub-groups keyed by a deterministic hash of l_orderkey.
    * Exactness: decimal partials (associative), count-as-sum, min/min,
    * max/max. Reference tie: SURVEY §2.10 D1 (the reference shards by
    * worker rank and merges rank outputs — same partial/merge contract).
    */
  val q62SaltedAgg = OpSpec(
    "q62_salted_agg",
    (s, dir) => {
      saltedAgg(table(s, dir, "lineitem"),
        col("l_returnflag"), "l_returnflag", col("l_orderkey"), salt = 16,
        Seq(
          SaltedAgg("sum_qty", sum(col("l_quantity").cast(dec)),
            c => sum(c).cast("double")),
          SaltedAgg("sum_price", sum(col("l_extendedprice").cast(dec)),
            c => sum(c).cast("double")),
          SaltedAgg("n_rows", count(lit(1)), c => sum(c).cast("long")),
          SaltedAgg("min_qty", min(col("l_quantity")), min(_)),
          SaltedAgg("max_qty", max(col("l_quantity")), max(_))))
    },
    Some("""
      SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        MIN(l_quantity) AS min_qty,
        MAX(l_quantity) AS max_qty
      FROM lineitem
      GROUP BY l_returnflag"""))

  /** Salted fact⨝dim join under the hash gate: oracle is the plain join.
    * lineitem joins supplier on suppkey with the supplier side exploded
    * salt-fold (8×100 rows at sf0.01 — dimension-sized), then rolls up
    * revenue per supplier; result must match the unsalted plan exactly.
    */
  val q63SaltedJoin = OpSpec(
    "q63_salted_join",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_suppkey").as("suppkey"), col("l_orderkey"),
          col("l_extendedprice"), col("l_discount"))
      val dim = table(s, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_name"))
      saltedJoin(li, dim, "suppkey", col("l_orderkey"), salt = 8)
        .groupBy(col("s_name"))
        .agg(
          sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec)))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""
      SELECT s_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_name"""))

  val all: Seq[OpSpec] = Seq(q62SaltedAgg, q63SaltedJoin)
}
