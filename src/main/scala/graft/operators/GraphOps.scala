package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryModule, Tables}

/** Iterative graph analytics over an interaction graph (q77) — the
  * domain-authority stage of a crawl/curation pipeline: PageRank-style
  * scores weight documents by the authority of their origin before
  * training-mix decisions (the reference pipeline has no graph stage at
  * all — this is a north-star extension like q70's k-means).
  *
  * The graph is derived deterministically from `events` (the corpus has no
  * explicit edge table): src = user_id, dst = event_id mod [[NodeMod]],
  * distinct-ified — a bipartite interaction graph folded into one id space,
  * ~|users|+[[NodeMod]] nodes. Production callers substitute their real
  * (src, dst) edge table; everything downstream of `edges` is the operator.
  *
  * CROSS-ENGINE DETERMINISM (same discipline as q70's k-means): ranks are
  * integers scaled by 10⁶.
  *  - init r₀ = 10⁶ for every node.
  *  - contribution per edge = r_src div outdeg(src) — exact integer
  *    division (both operands positive, Spark's `div` and DuckDB's `//`
  *    both floor).
  *  - new rank = 150000 + floor(0.85 · Σ contrib): the Σ is an exact
  *    BIGINT, one IEEE multiply + floor is bit-identical in both engines.
  *  - dangling-node mass is NOT redistributed (the standard simplification;
  *    documented, identical on both sides).
  *
  * SCALE SHAPE: every iteration is two skinny shuffles — join ranks⋈edges
  * hash-partitioned on src, then groupBy(dst) with map-side partial sums —
  * and every shuffled row is (long, long). The edge set and out-degrees are
  * computed once and cached (on a cluster: bucketed by src so the per-round
  * join is exchange-free on the edge side); ranks are localCheckpoint-ed
  * per round to truncate the growing lineage exactly like q38's
  * connected-components loop. Driver traffic is zero — no collect anywhere
  * in the loop (unlike q70, whose model is bounded; a rank vector is not).
  */
object GraphOps extends QueryModule {

  /** Folds event_id into a bounded dst-node space so the graph has real
    * in-degree structure (many events per dst node) at every SF. */
  val NodeMod = 997L

  val Iters     = 3
  val RankScale = 1000000L
  /** floor((1−d)·RankScale) for d = 0.85, precomputed exactly. */
  val Teleport = 150000L

  /** Distinct (src, dst) edges of the folded interaction graph. */
  def edges(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(col("user_id").as("src"), (col("event_id") % NodeMod).as("dst"))
      .distinct()

  /** q77: [[Iters]] PageRank power iterations over [[edges]], returning
    * (node, rank, out_degree, in_degree) for every node. */
  def pageRank(s: SparkSession, dir: String, iters: Int = Iters): DataFrame =
    pageRankOver(edges(s, dir), iters)

  /** The operator proper, over any (src, dst) edge set — fixture-testable
    * and the entry point for callers with a real edge table. */
  def pageRankOver(edgeDf: DataFrame, iters: Int = Iters): DataFrame = {
    // One pass builds the reusable graph artifacts; cache both — every
    // iteration re-reads them (cluster analog: a bucketed edge table).
    val e = edgeDf.cache()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).cache()
    val indeg  = e.groupBy("dst").agg(count(lit(1)).as("indeg"))
    val nodes = e
      .select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .cache()

    try {
      var ranks = nodes.withColumn("rank", lit(RankScale))
      for (_ <- 1 to iters) {
        val contribs = e
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .join(outdeg, Seq("src"))
          .select(col("dst"), call_function("div", col("rank"), col("outdeg")).as("contrib"))
          .groupBy("dst")
          .agg(sum(col("contrib")).as("mass"))
        ranks = nodes
          .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(
            col("node"),
            (lit(Teleport) +
              floor(lit(0.85) * coalesce(col("mass"), lit(0L)).cast(DoubleType)).cast(LongType))
              .as("rank")
          )
          .localCheckpoint() // truncate the per-round lineage (q38's pattern)
      }
      val out = ranks
        .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left")
        .join(indeg.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(
          col("node"),
          col("rank"),
          coalesce(col("outdeg"), lit(0L)).as("out_degree"),
          coalesce(col("indeg"), lit(0L)).as("in_degree")
        )
        // materialize the (nodes-sized) result before the finally releases
        // the caches it was built from
        .localCheckpoint()
      out
    } finally {
      // release the loop's caches on EVERY path — an exception mid-iteration
      // would otherwise leak three cached DataFrames for the session lifetime
      e.unpersist()
      outdeg.unpersist()
      nodes.unpersist()
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_pagerank" -> ((s, d) => pageRank(s, d))
  )

  /** The oracle unrolls the same integer iterations as CTEs (q70's
    * pattern): r0 → r1 → r2 → r3, each step = teleport + damped exact
    * contribution sum, `//` = Spark's `div` on positive BIGINTs. */
  private def stepSql(prev: String): String =
    s"""SELECT n.node,
       |  CAST(${Teleport} + floor(0.85 * CAST(COALESCE(m.mass, 0) AS DOUBLE)) AS BIGINT) AS rank
       |FROM nodes n LEFT JOIN (
       |  SELECT e.dst AS node, SUM(r.rank // o.outdeg) AS mass
       |  FROM edges e JOIN $prev r ON e.src = r.node JOIN outdeg o ON e.src = o.src
       |  GROUP BY e.dst
       |) m ON n.node = m.node""".stripMargin

  val oracles: Map[String, String] = Map(
    "q77_pagerank" ->
      s"""WITH edges AS (
         |  SELECT DISTINCT user_id AS src, event_id % $NodeMod AS dst FROM events
         |),
         |nodes AS (
         |  SELECT src AS node FROM edges UNION SELECT dst FROM edges
         |),
         |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |indeg  AS (SELECT dst, count(*) AS indeg  FROM edges GROUP BY 1),
         |r0 AS (SELECT node, CAST($RankScale AS BIGINT) AS rank FROM nodes),
         |r1 AS (${stepSql("r0")}),
         |r2 AS (${stepSql("r1")}),
         |r3 AS (${stepSql("r2")})
         |SELECT r3.node AS node, r3.rank AS rank,
         |  COALESCE(o.outdeg, 0) AS out_degree,
         |  COALESCE(i.indeg, 0) AS in_degree
         |FROM r3
         |LEFT JOIN outdeg o ON r3.node = o.src
         |LEFT JOIN indeg  i ON r3.node = i.dst""".stripMargin
  )
}
