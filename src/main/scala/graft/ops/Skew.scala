package graft.ops

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
}
