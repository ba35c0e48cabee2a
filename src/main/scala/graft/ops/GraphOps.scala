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

  /** q183: k-core peeling (k=2, 3 bounded rounds) over the co-purchase
    * graph — parts as nodes, ≥2-shared-orders pairs as undirected edges
    * (the q161 edge rule with a support floor so the graph has real
    * structure to peel). Each round recomputes degrees with one
    * symmetric group-by and drops sub-k nodes plus their incident
    * edges via two semi-joins; the survivors' degrees after round 3
    * are the emitted core membership. The density/cohesion pruning a
    * recommendation-graph pipeline runs before embedding training.
    * Bounded rounds keep the plan static (the q116 discipline; a full
    * fixpoint uses q51's checkpointed loop) — all arithmetic integer,
    * fully deterministic. Scale: per round, one partial-aggregated
    * degree count + two hash semi-joins on node ids; never an
    * all-pairs structure. */
  val q183KCore = OpSpec(
    "q183_kcore",
    (s, dir) => {
      val k = 2
      val lines = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      var edges = lines.as("a").join(lines.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .agg(count(lit(1)).as("s")).filter(col("s") >= 2)
        // eager localCheckpoint, NOT persist: each round reads the edge
        // set three times (two degree scans + the semi-join input) and a
        // cached plan re-embeds the base pair join in every round's
        // lineage — the q51 iteration discipline
        .select(col("u"), col("v")).localCheckpoint()
      for (_ <- 1 to 3) {
        val deg = edges.select(col("u").as("n"))
          .union(edges.select(col("v").as("n")))
          .groupBy(col("n")).agg(count(lit(1)).as("deg"))
        val keep = deg.filter(col("deg") >= k).select(col("n"))
        edges = edges
          .join(keep.select(col("n").as("u")), Seq("u"), "left_semi")
          .join(keep.select(col("n").as("v")), Seq("v"), "left_semi")
          .select(col("u"), col("v")).localCheckpoint()
      }
      edges.select(col("u").as("part"))
        .union(edges.select(col("v").as("part")))
        .groupBy(col("part")).agg(count(lit(1)).as("degree"))
    },
    Some("""
      WITH lines AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e0 AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM lines a JOIN lines b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      d0 AS (SELECT n, COUNT(*) AS deg FROM
               (SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0)
             GROUP BY 1),
      k0 AS (SELECT n FROM d0 WHERE deg >= 2),
      e1 AS (SELECT e.u, e.v FROM e0 e
             JOIN k0 a ON a.n = e.u JOIN k0 b ON b.n = e.v),
      d1 AS (SELECT n, COUNT(*) AS deg FROM
               (SELECT u AS n FROM e1 UNION ALL SELECT v FROM e1)
             GROUP BY 1),
      k1 AS (SELECT n FROM d1 WHERE deg >= 2),
      e2 AS (SELECT e.u, e.v FROM e1 e
             JOIN k1 a ON a.n = e.u JOIN k1 b ON b.n = e.v),
      d2 AS (SELECT n, COUNT(*) AS deg FROM
               (SELECT u AS n FROM e2 UNION ALL SELECT v FROM e2)
             GROUP BY 1),
      k2 AS (SELECT n FROM d2 WHERE deg >= 2),
      e3 AS (SELECT e.u, e.v FROM e2 e
             JOIN k2 a ON a.n = e.u JOIN k2 b ON b.n = e.v)
      SELECT n AS part, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT u AS n FROM e3 UNION ALL SELECT v FROM e3)
      GROUP BY 1"""))

  val all: Seq[OpSpec] = Seq(q116PageRank, q183KCore)
}
