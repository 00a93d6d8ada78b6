package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventWindows
import graft.streaming.EventStream

/** Streaming/batch semantic parity: the streaming windowed aggregations over
  * the events files must produce exactly the batch module's results once the
  * stream is fully processed.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]", 4)
  private val dir = "/root/testdata/sf0.001"

  /** File streaming source requires a directory: stage the single events
    * parquet into a temp dir. */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet")
    )
    d.toString
  }

  test("streaming tumbling window equals batch q25 result") {
    val stream = EventStream.fromParquet(spark, streamDir)
    assert(stream.isStreaming)
    val q = EventStream
      .tumblingCounts(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_tumbling")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_tumbling").collect().map(_.toSeq).toSet
      val batch    = EventWindows.tumbling(spark, dir).collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming session window produces sessions") {
    val stream = EventStream.fromParquet(spark, streamDir)
    val q = EventStream
      .sessionCounts(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_sessions")
      .start()
    try {
      q.processAllAvailable()
      val sessions = spark.table("stream_sessions").collect()
      assert(sessions.length > 0)
      // per-user session event counts must total the source row count
      val total = sessions.map(_.getAs[Long]("n_events")).sum
      assert(total == spark.read.parquet(s"$dir/events.parquet").count())
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps running per-user totals") {
    val stream = EventStream.fromParquet(spark, streamDir)
    val q = EventStream
      .runningUserTotals(stream)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_user_totals")
      .start()
    try {
      q.processAllAvailable()
      val rows  = spark.table("stream_user_totals")
      // last emitted summary per user must match the batch group-by
      val last  = rows.groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n"))
      val got   = last.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = spark.read.parquet(s"$dir/events.parquet")
        .groupBy("user_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == batch)
    } finally q.stop()
  }
}
