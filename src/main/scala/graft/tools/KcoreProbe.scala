package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.GraphOps

/** Scratch probe (not part of the registry): dissects one q139 peel round's
  * executed plan and stage costs to decide the r17 optimization shape. */
object KcoreProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[kprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    val und = GraphOps
      .edges(spark, dir)
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .cache()
    println("EDGES=" + und.count())
    val fullDeg = und
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("deg"))
    val surv = fullDeg.select("node").localCheckpoint()
    println("NODES=" + surv.count())
    val e = und
      .join(surv.withColumnRenamed("node", "a"), Seq("a"), "leftsemi")
      .join(surv.withColumnRenamed("node", "b"), Seq("b"), "leftsemi")
    val agg = e
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("d"))
      .filter(col("d") >= GraphOps.CoreK)
      .select("node")
    time("one peel round")(agg.collect())
    time("kCore full (8 rounds)")(GraphOps.kCore(spark, dir).queryExecution.toRdd.count())
    time("kCore full again")(GraphOps.kCore(spark, dir).queryExecution.toRdd.count())
    val eg = GraphOps.edges(spark, dir)
    val (dfFast, r1) = time("kCore earlyStop build+run") {
      val t = GraphOps.kCoreRuns(eg, GraphOps.CoreK, GraphOps.CoreRounds, earlyStopWhenStable = true)
      t._1.queryExecution.toRdd.count()
      t
    }
    println("kCore earlyStop rounds=" + r1)
    val (prFull, pf) = time("pageRank full (3 iters)") {
      val t = GraphOps.pageRankRuns(eg)
      t._1.queryExecution.toRdd.count(); t
    }
    val (prFast, pr) = time("pageRank earlyStop") {
      val t = GraphOps.pageRankRuns(eg, earlyStopWhenStable = true)
      t._1.queryExecution.toRdd.count(); t
    }
    println(s"pageRank rounds full=$pf fast=$pr")
    spark.stop()
  }
}
