package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Structured Streaming surface over a `documents` stream: the dedup family
  * (batch q30/q33) re-expressed for continuous ingestion — the shape a
  * training-data pipeline needs when the corpus arrives as a feed rather
  * than a snapshot.
  *
  * State design for scale:
  *  - Exact dedup state is one tiny row per DISTINCT fingerprint. Unbounded
  *    over an unbounded feed — so the watermark-bounded variant
  *    ([[dedupWithinHorizon]]) is the production path: state evicts past the
  *    horizon, trading global dedup for windowed dedup (the standard
  *    crawl-pipeline compromise).
  *  - LSH band state holds ≤ [[MaxPerBand]] doc ids per band key; bands are
  *    md5-banded minhash signatures, so keys distribute uniformly and the
  *    per-key list stays small for non-degenerate corpora. The cap bounds
  *    worst-case state AND worst-case per-event emission (a degenerate band
  *    would otherwise emit O(members) pairs per arrival forever).
  */
object DocStream {

  /** File-streaming schema for the `documents` table. */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  /** File-based document stream. Without `maxFilesPerTrigger` the file
    * source takes EVERY available file in one trigger — a test that stages
    * two files to "exercise cross-batch state" actually runs a single
    * micro-batch and proves nothing about the state store; pass
    * `Some(1)` to force one file per micro-batch (as
    * [[EventStream.fromParquet]] already allows). */
  def fromParquet(
      spark: SparkSession,
      path: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(DocSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(path)
  }

  /** Streaming heavy-hitters — q67's SpaceSaving sketch as STREAMING
    * aggregation state: the micro-batch planner keeps the serialized
    * O(capacity) sketch buffer in the state store and merges each batch's
    * partials into it, so the running top-bigram estimate is queryable
    * after every trigger while state stays CONSTANT-SIZE however long the
    * stream runs — the property that makes sketches the only viable
    * "global top-k over an unbounded stream" shape (exact counts grow with
    * the vocabulary; watermarks can't bound a global top-k).
    *
    * Emit in complete mode. SpaceSaving results are merge-order dependent
    * at the margins, so cross-plan parity is the GUARANTEE (cnt ≥ true ≥
    * cnt − err for tracked items; every item above total/capacity tracked)
    * — exactly what q67 pins for batch and StreamingSpec re-pins for this
    * stream against batch-exact counts. */
  def heavyHitterSketch(docs: DataFrame, capacity: Int = graft.operators.TextAnalysis.HhCapacity): DataFrame =
    docs
      .select(explode(graft.operators.TextAnalysis.bigramsOf(col("text"))).as("bigram"))
      .agg(graft.plans.HeavyHitters.spaceSaving(col("bigram"), capacity).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item").as("item"), col("h.cnt").as("cnt"), col("h.err").as("err"))

  /** Streaming exact dedup — batch q30's semantics on a stream: narrow md5
    * fingerprint, keep the first document per fingerprint. Exact parity
    * with the batch result, at the cost of state that grows with the
    * distinct corpus; see [[dedupWithinHorizon]] for the bounded variant. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs
      .withColumn("fingerprint", md5(col("text")))
      .dropDuplicates(Seq("fingerprint"))

  /** Watermark-bounded streaming dedup: duplicates are suppressed within
    * the event-time horizon and state is EVICTED past the watermark, so
    * state size tracks the horizon's data volume, not the corpus. The
    * timestamp column is caller-provided — documents carry no event time;
    * production stamps ingest time at the source. */
  def dedupWithinHorizon(docs: DataFrame, tsCol: String, horizon: String): DataFrame =
    docs
      .withColumn("fingerprint", md5(col("text")))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(Seq("fingerprint"))

  /** Default cap on per-band state (ids kept per band key). */
  val MaxPerBand = 64

  final case class BandDoc(band: String, doc_id: Long)
  final case class BandState(ids: List[Long])
  final case class CandPair(id_a: Long, id_b: Long)

  /** Streaming MinHash-LSH candidate mining — batch q33's candidate stage as
    * keyed state: signatures + band keys computed in the same narrow
    * codegen'd pass as batch (one md5 per shingle), then
    * `flatMapGroupsWithState` keyed on band emits a candidate pair between
    * each newcomer and the ids already resident in its band. A pair
    * colliding in several bands (or a doc replayed across micro-batches) can
    * emit more than once — consumers dedupe downstream, exactly like the
    * batch path's `distinct()`. Verification (exact Jaccard on the pair's
    * shingles) joins by id downstream, unchanged from batch.
    *
    * CAPPED-BAND SEMANTICS (the deliberate loss): once a band holds
    * `maxPerBand` resident ids, later arrivals still pair against every
    * resident but are NOT retained — so two post-saturation arrivals in the
    * same band never pair with each other, and WHICH docs are residents
    * depends on arrival order. That is the same compromise the batch path
    * makes ([[graft.operators.FuzzyDedup.boundedBands]] drops mega-buckets
    * entirely — members are near-identical, exact dedup's territory), traded
    * differently for streaming: bounded state AND bounded per-event emission
    * instead of zero emission. The loss is observable: pass `saturated` (a
    * driver-registered LongAccumulator) and it counts post-saturation
    * arrivals per saturated band as an AT-LEAST-ONCE monitoring signal —
    * Spark replays transformation-side accumulator updates on task retries
    * and micro-batch replays, so the counter can overcount; use it to alarm
    * when a corpus starts losing candidate coverage, not as an exact ledger
    * (exact loss accounting would have to be derived from the emitted pairs
    * themselves). Pinned by StreamingSpec's capped-band test. */
  def lshCandidates(
      docs: DataFrame,
      maxPerBand: Int = MaxPerBand,
      saturated: Option[org.apache.spark.util.LongAccumulator] = None
  ): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = docs
      .select(col("doc_id"), Dedup.shingles(col("text")).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(
        col("doc_id"),
        explode(graft.plans.TextHashExpressions.minhashBandKeys(col("shingles"))).as("band")
      )
      .as[BandDoc]
    bands
      .groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[BandDoc], state: GroupState[BandState]) => {
          var ids = state.getOption.map(_.ids).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[CandPair]
          rows.foreach { r =>
            if (!ids.contains(r.doc_id)) {
              ids.foreach { prev =>
                out += (if (prev < r.doc_id) CandPair(prev, r.doc_id) else CandPair(r.doc_id, prev))
              }
              if (ids.length < maxPerBand) ids = r.doc_id :: ids
              else saturated.foreach(_.add(1L)) // arrival at a full band: not retained
            }
          }
          state.update(BandState(ids))
          out.iterator
        }
      )
  }

  final case class FpArrival(fp: String, doc_id: Long)
  final case class NoveltyEvent(doc_id: Long, is_new: Long)
  final case class SeenState(first_id: Long)

  /** Streaming novelty detection — batch q104's "first fingerprint sighting"
    * as keyed state: one tiny `SeenState` row per DISTINCT canonical
    * fingerprint; each arriving doc emits (doc_id, is_new ∈ {0,1}). Within a
    * micro-batch the min doc_id of an unseen group is the one marked new
    * (matching batch q104's min-per-fingerprint exactly); across
    * micro-batches the first ARRIVAL wins — so batch↔stream parity holds
    * precisely when delivery respects ingest (doc_id) order, which is the
    * operator's own premise: the growth curve is BY ingest order. State is
    * one row per distinct fingerprint (the same unbounded-feed caveat as
    * [[dedupExact]]; a production feed bounds it with a watermark horizon).
    * Parity pinned by StreamingSpec's q104 fixture. */
  def noveltyEvents(docs: DataFrame): Dataset[NoveltyEvent] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(md5(Dedup.canonicalText(col("text"))).as("fp"), col("doc_id"))
      .as[FpArrival]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[FpArrival], state: GroupState[SeenState]) => {
          val ids = rows.map(_.doc_id).toList
          if (state.exists) ids.map(NoveltyEvent(_, 0L)).iterator
          else {
            val first = ids.min
            state.update(SeenState(first))
            ids.map(id => NoveltyEvent(id, if (id == first) 1L else 0L)).iterator
          }
        }
      )
  }

  /** Assemble q104's curve from (doc_id, is_new) novelty events — stateless,
    * so it runs identically over the streaming sink table and a batch
    * DataFrame (the parity pin evaluates both sides through this). Same
    * bucket arithmetic, cumulative window and dup_rate as
    * [[graft.operators.Dedup.growthCurve]]; the window runs on the
    * buckets-sized table (corpus/[[graft.operators.Dedup.GrowthBucket]]
    * rows), where single-task is the right plan. */
  def curveFromNovelty(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    events
      .groupBy(call_function("div", col("doc_id"), lit(Dedup.GrowthBucket)).as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("is_new")).as("n_new_distinct"))
      .withColumn("cum_distinct", sum(col("n_new_distinct")).over(w))
      .withColumn(
        "dup_rate",
        round((col("n_docs") - col("n_new_distinct")).cast("double") / col("n_docs"), 6)
      )
  }
}
