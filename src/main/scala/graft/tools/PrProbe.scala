package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.GraphOps

/** Scratch probe: q77 per-iteration cost dissection. */
object PrProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[pprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    val eg    = GraphOps.edges(spark, dir)
    time("warm-up full (3 iters)")(GraphOps.pageRankRuns(eg)._1.queryExecution.toRdd.count())
    for (it <- Seq(0, 1, 2, 3))
      time(s"pageRank iters=$it")(GraphOps.pageRankRuns(eg, iters = it)._1.queryExecution.toRdd.count())

    // dissect one iteration by hand
    val e = eg.cache()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).cache()
    val nodes = e
      .select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .cache()
    println("EDGES=" + e.count() + " NODES=" + nodes.count() + " SRC=" + outdeg.count())
    val ranks = nodes.withColumn("rank", lit(GraphOps.RankScale)).localCheckpoint()
    val contribs = e
      .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
      .join(outdeg, Seq("src"))
      .select(col("dst"), call_function("div", col("rank"), col("outdeg")).as("contrib"))
      .groupBy("dst")
      .agg(sum(col("contrib")).as("mass"))
    time("contribs agg")(contribs.queryExecution.toRdd.count())
    val next = nodes
      .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
      .select(
        col("node"),
        (lit(GraphOps.Teleport) +
          floor(lit(0.85) * coalesce(col("mass"), lit(0L)).cast(org.apache.spark.sql.types.DoubleType))
            .cast(org.apache.spark.sql.types.LongType)).as("rank"))
    time("next (ckpt)")(next.localCheckpoint().count())
    println(contribs.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
