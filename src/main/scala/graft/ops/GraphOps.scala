package graft.ops

import graft.OpSpec
import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over relational edge tables (the dup-cluster CC and
  * triangle ops live in [[DedupOps]]; this module holds the iterative
  * rank family). The engine discipline everywhere: edges are DataFrame
  * rows, one shuffle per iteration keyed on the destination, and every
  * floating-point reduction is a SORTED left fold so two engines (and
  * two cluster runs) produce bit-identical ranks.
  */
object GraphOps {

  private val Damping = 0.85
  private val Iterations = 3

  /** One PageRank step: contributions wgt·pr flow along edges, are
    * folded per destination in src order (deterministic IEEE sum), and
    * damped. `nodes` must carry every vertex (dangling destinations
    * keep their base rank via the left join). */
  private def step(nodes: DataFrame, wEdges: DataFrame, pr: DataFrame)
      : DataFrame = {
    val contribs = wEdges
      .join(pr.select(col("v").as("src"), col("pr")), "src")
      .withColumn("c", col("wgt") * col("pr"))
      .groupBy(col("dst"))
      .agg(expr("""aggregate(
          transform(sort_array(collect_list(struct(src, c))), s -> s.c),
          0D, (acc, x) -> acc + x)""").as("s"))
    nodes
      .join(contribs.select(col("dst").as("v"), col("s")), Seq("v"), "left")
      .select(col("v"), col("n_nodes"),
        (lit(1.0 - Damping) / col("n_nodes").cast("double") +
          lit(Damping) * coalesce(col("s"), lit(0.0))).as("pr"))
  }

  /** PageRank over the event-type transition graph (the q103 Markov
    * edges: consecutive events per user, weighted by transition
    * probability count/out-total) — [[Iterations]] power iterations,
    * damping 0.85, CROSS-ENGINE BIT-EXACT: every per-node reduction is
    * a left fold over contributions sorted by source (both engines
    * stage the identical IEEE add sequence — the ScoreStage oracle
    * discipline applied to an iterative algorithm), edge weights and
    * the base term are single divisions of exact integers, and
    * dangling mass is handled identically (absent fold → base rank).
    *
    * Scale shape: each iteration is ONE shuffle of |edges| rows keyed
    * on dst plus a broadcast of the k-row rank vector — the standard
    * distributed PageRank schedule; the node count reaches the plan as
    * a 1-row broadcast scalar, never a driver round-trip. The unrolled
    * loop keeps the whole 3-step lineage in one Catalyst plan (a
    * 50-iteration production run would localCheckpoint rounds, the
    * q51 discipline). */
  val q116PageRank = OpSpec(
    "q116_pagerank",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val trans = table(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
        .withColumn("dst", lead(col("event_type"), 1).over(w))
        .filter(col("dst").isNotNull)
        .select(col("event_type").as("src"), col("dst"))
      val edges = trans.groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("cnt"))
      val outTot = edges.groupBy(col("src")).agg(sum(col("cnt")).as("out_n"))
      val wEdges = edges.join(outTot, "src")
        .select(col("src"), col("dst"),
          (col("cnt").cast("double") / col("out_n").cast("double"))
            .as("wgt"))
        .persist()
      val verts = wEdges.select(col("src").as("v"))
        .unionByName(wEdges.select(col("dst").as("v"))).distinct()
      val nCount = verts.agg(count(lit(1)).as("n_nodes"))
      val nodes = verts.crossJoin(broadcast(nCount)).persist()
      val pr0 = nodes.select(col("v"), col("n_nodes"),
        (lit(1.0) / col("n_nodes").cast("double")).as("pr"))
      val prN = (1 to Iterations).foldLeft(pr0)((pr, _) =>
        step(nodes, wEdges, pr))
      prN.select(col("v"), col("pr"))
    },
    Some {
      def stepSql(i: Int): String = s"""
      c$i AS (
        SELECT e.dst,
          list_reduce(list(e.wgt * p.pr ORDER BY e.src),
            (a, b) -> a + b) AS s
        FROM wedges e JOIN pr${i - 1} p ON p.v = e.src
        GROUP BY e.dst),
      pr$i AS (
        SELECT n.v, 0.15e0 / CAST(n.n_nodes AS DOUBLE)
             + 0.85e0 * COALESCE(c.s, 0e0) AS pr
        FROM nodes n LEFT JOIN c$i c ON c.dst = n.v)"""
      s"""
      WITH trans AS (
        SELECT event_type AS src,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS dst
        FROM events),
      edges AS (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM trans WHERE dst IS NOT NULL GROUP BY 1, 2),
      wedges AS (
        SELECT src, dst,
          CAST(cnt AS DOUBLE) / CAST(out_n AS DOUBLE) AS wgt
        FROM (SELECT *, CAST(SUM(cnt) OVER (PARTITION BY src) AS BIGINT)
                AS out_n
              FROM edges)),
      verts AS (
        SELECT src AS v FROM wedges UNION SELECT dst FROM wedges),
      nodes AS (
        SELECT v, (SELECT CAST(COUNT(*) AS BIGINT) FROM verts) AS n_nodes
        FROM verts),
      pr0 AS (
        SELECT v, 1e0 / CAST(n_nodes AS DOUBLE) AS pr FROM nodes),
      ${(1 to Iterations).map(stepSql).mkString(",")}
      SELECT v, pr FROM pr$Iterations"""
    })

  val all: Seq[OpSpec] = Seq(q116PageRank)
}
