package graft.ops

import graft.{OpSpec, Tables}
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftx.bridge
import org.apache.spark.sql.types.BinaryType

/** Runtime bloom-filter join pruning (SURVEY §4.2 / D-family scale path).
  *
  * At 100 TB the dominant join cost is shuffling the fact side; when the
  * join is selective (most fact rows match nothing), a bloom filter of
  * the build side's keys — kilobytes, no false negatives — pushed down
  * onto the fact scan removes the non-matching rows BEFORE the shuffle.
  * This is the same mechanism Spark's own `InjectRuntimeFilter` rule
  * applies to shuffle joins; exposing it as a library op lets a pipeline
  * prune with a key set that comes from anywhere (a curated id list, a
  * prior stage's survivors), not just the other side of one equi-join.
  *
  * Build is fully distributed (internal `BloomFilterAggregate` — one
  * sketch row reaches the driver, analogous to a broadcast subquery);
  * the probe is the codegen'd `BloomFilterMightContain` over `xxhash64`,
  * so the pruned scan stays inside whole-stage codegen. The trailing
  * exact semi join removes the (fpp ≈ 3%) false positives — results are
  * exact, the bloom only cuts shuffle volume.
  *
  * Reference tie: the resume/done-list anti- and semi-joins
  * (`evaluations/aesthetic_score.py:31-36`, SURVEY §2.3 J1/J2) are this
  * exact shape once the done-list no longer fits a broadcast.
  */
object BloomPrune {

  /** Exact semi join of `big` against `small`'s keys, bloom-pruned
    * before the shuffle. `expectedKeys` sizes the sketch (build side's
    * approximate distinct key count; overestimating only costs bits). */
  def semiJoinPruned(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String, expectedKeys: Long): DataFrame = {
    require(expectedKeys > 0, s"expectedKeys=$expectedKeys must be > 0")
    val hashed = new XxHash64(Seq(bridge.expression(small(smallKey))))
    val bloomAgg = bridge.column(
      new BloomFilterAggregate(hashed, expectedKeys).toAggregateExpression())
    val sketch = small.select(bloomAgg.as("bf")).head.getAs[Array[Byte]](0)
    val mightContain = bridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      new XxHash64(Seq(bridge.expression(big(bigKey))))))
    big.filter(mightContain)
      .join(small, big(bigKey) === small(smallKey), "leftsemi")
  }

  /** Gate query: bloom-pruned semi join must equal the plain semi join
    * the oracle runs. Urgent orders (~20% of keys) select their line
    * items; the bloom removes ~80% of lineitem rows scan-side. */
  val q64BloomSemiJoin = OpSpec(
    "q64_bloom_semi_join",
    (s, dir) => {
      val urgent = table(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      // sf0.1 has ~150k orders; 1/5 urgent. A fixed 64k estimate keeps
      // the sketch a few hundred KB at any test SF; production callers
      // pass their own estimate.
      semiJoinPruned(table(s, dir, "lineitem"), "l_orderkey",
        urgent, "o_orderkey", expectedKeys = 64 * 1024)
        .groupBy(col("l_returnflag"))
        .agg(
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n_rows"))
    },
    Some("""
      SELECT l_returnflag,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                           WHERE o_orderpriority = '1-URGENT')
      GROUP BY l_returnflag"""))

  val all: Seq[OpSpec] = Seq(q64BloomSemiJoin)
}
