package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = GraftSession.get("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val names = SparkEntry.queries.toSeq.sortBy(_._1).takeWhile(_._1 < "q31_dedup_canonical")
    names.foreach { case (n, fn) => fn(spark, sfDir).count() }
    println("[probe] prefix done")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null && e.taskInfo.duration > 1000)
          println(f"[task] stage=${e.stageId} tid=${e.taskInfo.taskId} wall=${e.taskInfo.duration}ms cpu=${m.executorCpuTime/1000000}ms derun=${m.executorDeserializeTime}ms gc=${m.jvmGCTime}ms recIn=${m.inputMetrics.recordsRead} shRead=${m.shuffleReadMetrics.recordsRead} shWrite=${m.shuffleWriteMetrics.recordsWritten}")
      }
    })
    val t0 = System.nanoTime()
    graft.operators.Dedup.canonical(spark, sfDir).count()
    println(f"[probe] q31 ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
