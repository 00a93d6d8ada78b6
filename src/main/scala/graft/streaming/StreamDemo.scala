package graft.streaming

import java.nio.file.{Files, Paths}

import graft.GraftSession

/** `sbt "runMain graft.streaming.StreamDemo [eventsDir]"` — runs the
  * streaming tumbling-window aggregation over the events parquet (staged
  * into a temp dir: the file source needs a directory) and prints the
  * resulting hourly counts.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val src   = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("local[4]", 4)
    val d     = Files.createTempDirectory("graft_stream_demo")
    Files.copy(Paths.get(s"$src/events.parquet"), d.resolve("events.parquet"))
    val q = EventStream
      .tumblingCounts(EventStream.fromParquet(spark, d.toString))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("demo_tumbling")
      .start()
    q.processAllAvailable()
    val rows = spark.table("demo_tumbling").orderBy("hour_start", "event_type")
    println(s"windows=${rows.count()}")
    rows.show(8, truncate = false)
    q.stop()
    spark.stop()
  }
}
