package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventWindows
import graft.streaming.{DocStream, EventStream}

/** Streaming/batch parity re-pinned under a DIFFERENT shuffle-partition
  * count (7, vs the suite default 4): the state-store partition count is
  * `spark.sql.shuffle.partitions` at query start, and keying bugs that
  * round-trip state through the wrong partition classically hide at the
  * one partition count every test uses — a key hashed to the wrong store
  * can still find its state when the count never changes. One
  * parameterized re-run of each state-store SHAPE (windowed agg,
  * dropDuplicates, flatMapGroupsWithState, stream-stream join) with
  * parity still pinned closes that untested freedom; the full semantic
  * matrix stays in [[StreamingSpec]].
  *
  * The 7-partition session is a child (`newSession`) of the shared
  * context: same executors, own conf — the override must not leak into
  * the other suites' session.
  */
class StreamingPartitionsSpec extends AnyFunSuite {
  private lazy val spark7 = {
    val s = GraftSession.get("local[4]", 4).newSession()
    s.conf.set("spark.sql.shuffle.partitions", "7")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stream_events_p7")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet")
    )
    d.toString
  }

  /** Two staged files = two micro-batches: cross-batch state is exercised,
    * not just within-batch dedup. */
  private lazy val docStreamDir: String = {
    val d    = java.nio.file.Files.createTempDirectory("graft_stream_docs_p7")
    val docs = spark7.read.parquet(s"$dir/documents.parquet")
    import org.apache.spark.sql.functions.col
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$d/part_a")
    docs.filter(col("doc_id") % 2 =!= 0).write.parquet(s"$d/part_b")
    val flat = java.nio.file.Files.createTempDirectory("graft_stream_docs_p7_flat")
    var i = 0
    Seq("part_a", "part_b").foreach { p =>
      java.nio.file.Files.list(d.resolve(p)).forEach { f =>
        if (f.toString.endsWith(".parquet")) {
          java.nio.file.Files.copy(f, flat.resolve(s"docs_$i.parquet")); i += 1
        }
      }
    }
    flat.toString
  }

  test("the child session actually runs at 7 shuffle partitions; the shared session is untouched") {
    assert(spark7.conf.get("spark.sql.shuffle.partitions") == "7")
    assert(GraftSession.get("local[4]", 4).conf.get("spark.sql.shuffle.partitions") == "4",
      "partition override leaked into the shared session — every other suite now runs at 7")
  }

  test("windowed-agg state at 7 partitions: tumbling counts equal batch q25") {
    val q = EventStream
      .tumblingCounts(EventStream.fromParquet(spark7, streamDir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("p7_tumbling")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark7.table("p7_tumbling").collect().map(_.toSeq).toSet
      val batch    = EventWindows.tumbling(spark7, dir).collect().map(_.toSeq).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("dropDuplicates state at 7 partitions: exact dedup equals batch distinct across micro-batches") {
    import org.apache.spark.sql.functions.{col, md5}
    // maxFilesPerTrigger=1: without it the file source takes both staged
    // files in ONE trigger and the cross-batch state claim is vacuous —
    // the >=2-batches assertion below pins that this stays multi-batch
    val q = DocStream
      .dedupExact(DocStream.fromParquet(spark7, docStreamDir, maxFilesPerTrigger = Some(1)))
      .select("fingerprint", "doc_id")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("p7_dedup")
      .start()
    try {
      q.processAllAvailable()
      val fedBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(fedBatches >= 2,
        s"expected >=2 data-carrying micro-batches, got $fedBatches — cross-batch state untested")
      val streamed = spark7.table("p7_dedup").select("fingerprint").collect().map(_.getString(0))
      val batch = spark7.read.parquet(s"$dir/documents.parquet")
        .select(md5(col("text")).as("f")).distinct().collect().map(_.getString(0))
      assert(streamed.length == streamed.distinct.length, "stream emitted a fingerprint twice")
      assert(streamed.toSet == batch.toSet)
    } finally q.stop()
  }

  test("flatMapGroupsWithState at 7 partitions: funnel conversions equal batch q92") {
    val q = EventStream
      .funnelConversions(EventStream.fromParquet(spark7, streamDir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("p7_funnel")
      .start()
    try {
      q.processAllAvailable()
      val conv  = spark7.table("p7_funnel").collect()
      val batch = EventWindows.eventFunnel(spark7, dir).head()
      assert(conv.length.toLong == batch.getAs[Long]("n_purchase_after"), "conversion count diverged")
      assert(conv.map(_.getAs[Long]("user_id")).distinct.length == conv.length)
    } finally q.stop()
  }

  test("keyed run state at 7 partitions: SCD2 run-closing equals batch q91's closed intervals") {
    val q = EventStream
      .scd2Runs(EventStream.fromParquet(spark7, streamDir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("p7_scd2")
      .start()
    try {
      q.processAllAvailable()
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[Long]("user_id"), r.getAs[String]("state"), r.getAs[Long]("valid_from_us"),
          r.getAs[Long]("valid_to_us"), r.getAs[Long]("n_events"))
      val streamed = spark7.table("p7_scd2").collect().map(key).toSet
      val batchClosed = EventWindows
        .scd2Intervals(spark7, dir)
        .filter(org.apache.spark.sql.functions.col("is_current") === 0L)
        .collect().map(key).toSet
      assert(streamed == batchClosed, "streamed closed runs diverged from batch q91")
      assert(streamed.nonEmpty, "fixture produced no closed runs — parity would be vacuous")
    } finally q.stop()
  }

  test("stream-stream join state at 7 partitions: interval join equals batch q65's positive clicks") {
    val q = EventStream
      .purchaseClickIntervalJoin(EventStream.fromParquet(spark7, streamDir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("p7_interval_join")
      .start()
    try {
      q.processAllAvailable()
      val got = spark7.table("p7_interval_join").groupBy("p_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = EventWindows.rangeJoinClicks(spark7, dir)
        .filter(org.apache.spark.sql.functions.col("n_clicks_10m") > 0)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got == batch)
    } finally q.stop()
  }
}
