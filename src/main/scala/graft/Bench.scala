package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Benchmark harness: runs every registered query against
  * SPARK_GRAFT_SF_DIR, reports one JSON line of per-query wall seconds PLUS
  * per-query executor CPU seconds. CPU time comes from task metrics via a
  * SparkListener, so wall-vs-cpu divergence makes environmental contention
  * self-evident in the artifact: a contended run inflates wall time but not
  * cpu time (a CPU-bound query on an idle box keeps wall ≲ cpu ≤
  * wall·cores).
  */
object Bench {

  /** Accumulates executor CPU ns across all tasks; listener events arrive
    * asynchronously, so queries snapshot the counter before/after and the
    * bus is drained between queries. */
  private final class CpuListener extends SparkListener {
    val cpuNs = new LongAdder
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) cpuNs.add(m.executorCpuTime)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]", cpus.toInt)
    val sc    = spark.sparkContext
    val cpu   = new CpuListener
    sc.addSparkListener(cpu)
    // warm the JVM/session so the first measured query doesn't pay init costs
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      org.apache.spark.GraftSparkBridge.drainListenerBus(sc) // attribute straggler events to the right query
      val cpu0 = cpu.cpuNs.sum()
      val t0   = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1L }
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkBridge.drainListenerBus(sc)
      (name, wall, (cpu.cpuNs.sum() - cpu0) / 1e9)
    }
    def json(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs     = json(results.map(r => r._1 -> r._2))
    val cpuQs  = json(results.map(r => r._1 -> r._3))
    val total  = results.map(_._2).sum
    val cpuTot = results.map(_._3).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","cpu_sec":$cpuTot,"queries":$qs,"cpu_queries":$cpuQs,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
