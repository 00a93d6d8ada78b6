package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.{Num, QueryModule, Tables}

/** Time-window operators over the `events` table — the batch expression of
  * the Structured Streaming surface (graft.streaming runs the same
  * aggregations with `readStream` + watermarks; Spark guarantees identical
  * semantics for `window`/`session_window` in both modes).
  *
  * Scale notes: tumbling windows are a plain hash aggregate on
  * (window, type) — partial-agg friendly, no state. Session windows shuffle
  * by user_id only; at 100 TB the groupBy key (user_id) distributes evenly
  * by construction and AQE handles residual skew.
  */
object EventWindows extends QueryModule {
  import Num._

  /** Tumbling 1-hour windows: count + exact sum per (hour, event_type). */
  def tumbling(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), dec6).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value")
      )

  /** Session windows with a 30-minute inactivity gap, per user. Session end
    * is last-event + gap (Spark semantics), reproduced in the oracle via
    * gaps-and-islands. */
  def sessions(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), dec6).as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events"),
        col("sum_value")
      )

  /** Sliding windows (1h length, 30m slide): each event lands in 2 windows. */
  def sliding(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"),
        col("n_events")
      )

  /** Trailing event-time frame for [[movingAvg]]: 1 hour in micros. */
  val TrailUs = 3600000000L

  /** Event-time RANGE-frame moving average (q66): per-user trailing 1-hour
    * mean — the frame q15's ROWS window cannot express (it is bounded by
    * event-time DISTANCE, not row count; sparse and dense hours get the
    * same time horizon). Partitioning is per-user, so window groups scale
    * with the key space — no few-task funnel. Ties on the order key share a
    * frame (RANGE semantics) identically in both engines; the mean is a
    * decimal-exact sum over a count — deterministic. */
  def movingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy("us")
      .rangeBetween(-TrailUs, 0)
    Tables
      .events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .select(
        col("event_id"),
        col("user_id"),
        col("us"),
        (sum(col("value").cast(dec6)).over(w).cast("double") / count(lit(1)).over(w)).as("avg_1h"),
        count(lit(1)).over(w).as("n_1h")
      )
  }

  /** Range-join window in micros: 10 minutes. Bucket width == window length
    * so a preceding-window click lands in exactly one of two buckets. */
  val RangeUs = 600000000L

  /** Per-purchase count of same-user clicks in the strictly-preceding
    * 10-minute window — a range join, expressed scale-first as a BINNED
    * equi-join: bucket = floor(ts / 10min); each purchase probes buckets
    * {b-1, b}; clicks join on (user, bucket) and the exact time predicate
    * refines. A naive formulation is a theta-join (Broadcast/CartesianNLJ —
    * quadratic); the binned plan is a plain shuffle-hash/sort-merge join on
    * (user_id, bucket) whose per-key fan-in is bounded by window density,
    * so it survives a 100× scale-up. Each click matches at most one of the
    * two probe rows (its own bucket), so no post-join dedup is needed. */
  def rangeJoinClicks(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"),
        col("user_id"),
        col("ts").as("p_ts"),
        unix_micros(col("ts")).as("p_us"),
        // integer division: exact bucketing by construction (Column `/` is
        // double division — exact only below 2^53 µs), epochs non-negative
        call_function("div", unix_micros(col("ts")), lit(RangeUs)).as("b")
      )
      .withColumn("probe_b", explode(array(col("b") - 1, col("b"))))
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(
        col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"),
        call_function("div", unix_micros(col("ts")), lit(RangeUs)).as("c_b")
      )
    purchases
      .join(
        clicks,
        col("user_id") === col("c_user") && col("probe_b") === col("c_b") &&
          col("c_us") >= col("p_us") - lit(RangeUs) && col("c_us") < col("p_us"),
        "left"
      )
      .groupBy(col("event_id"), col("user_id"), col("p_ts"))
      .agg(count(col("c_user")).as("n_clicks_10m"))
      .select(
        col("event_id"),
        col("user_id"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("p_ts"),
        col("n_clicks_10m")
      )
  }

  /** Per-user event-type transition matrix (q82) — the Markov bigram
    * counts sequence-modeling prep runs over behavioral logs (next-event
    * prediction features, funnel anomaly screens). Each user's events are
    * ordered by (event time, event_id) — the id tiebreak makes the lag
    * deterministic when two events share a timestamp — and every adjacent
    * (prev_type → next_type) pair is counted; `p` is the row-conditional
    * probability (one double division on exact longs, identical in both
    * engines).
    *
    * Scale shape: the lag window partitions by user_id — millions of
    * groups, so no few-task funnel (q46's fix does not apply: the key
    * space scales with users) — and only (prev, next) pairs reach the tiny
    * count aggregate. */
  def transitions(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    val pairs = Tables
      .events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs
      .groupBy("prev_type")
      .agg(sum(col("n")).as("n_prev"))
    pairs
      .join(totals, Seq("prev_type"))
      .select(
        col("prev_type"),
        col("next_type"),
        col("n"),
        round(col("n").cast("double") / col("n_prev"), 6).as("p")
      )
  }

  /** SCD2 interval build (q91) — gaps-and-islands change detection, the
    * warehouse dimension-build operator (and the state-reconstruction op
    * behavioral ML runs before feature extraction): collapse each user's
    * consecutive runs of the same event_type into validity intervals
    * [valid_from, valid_to), where valid_to is the NEXT run's start (NULL
    * on the open/current run — the SCD2 "current row" flag).
    *
    * Shape: ONE per-user window pass computes the change flag (lag) and
    * the running island id (rows-frame sum) in the same (us, event_id)
    * sort — the event_id tiebreak makes runs deterministic under equal
    * timestamps; the island groupBy and the lead() that closes each
    * interval then run on the RUNS table, which is |islands|-sized, not
    * |events|-sized. Everything partitions by user_id — millions of
    * groups at scale, no few-task funnel. */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val w     = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val wRows = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val runs = Tables
      .events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .withColumn("chg", when(col("prev").isNull || col("prev") =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("island", sum(col("chg")).over(wRows))
      .groupBy(col("user_id"), col("island"))
      .agg(
        min(col("event_type")).as("state"), // constant within an island
        min(col("us")).as("valid_from_us"),
        count(lit(1)).as("n_events")
      )
    val wIsl = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy(col("island"))
    runs
      .select(
        col("user_id"),
        col("state"),
        col("valid_from_us"),
        lead(col("valid_from_us"), 1).over(wIsl).as("valid_to_us"),
        col("n_events"),
        lead(col("valid_from_us"), 1).over(wIsl).isNull.cast("long").as("is_current")
      )
  }

  /** Ordered event funnel (q92) — view → click → purchase conversion, the
    * canonical product-analytics operator. "Click AFTER the first view,
    * purchase AFTER that click" is an ORDER constraint, so a naive plan
    * sorts every event per user; this one never shuffles the event table
    * at all. Min-filter composition instead: step k is a conditional MIN
    * per user, gated on the step-(k−1) timestamp — three partial
    * aggregates whose shuffles carry only (user_id, ts) pairs, with the
    * |users|-sized gate table joined back onto the filtered event stream
    * (broadcast at test scale, hash at 100 TB — skinny either way). The
    * funnel report is then one tiny rollup: users entering each step plus
    * the exact mean view→purchase latency of full conversions (integer
    * micro sums / count — one deterministic double division per row). */
  def eventFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
    val v = ev.filter(col("event_type") === "view").groupBy("user_id").agg(min(col("us")).as("t1"))
    val c = ev
      .filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("us") > col("t1"))
      .groupBy("user_id")
      .agg(min(col("us")).as("t2"), min(col("t1")).as("t1k"))
    val p = ev
      .filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("us") > col("t2"))
      .groupBy("user_id")
      .agg(min(col("us")).as("t3"), min(col("t1k")).as("t1p"))
    val nv = v.agg(count(lit(1)).as("n_view")).select(col("n_view"))
    val nc = c.agg(count(lit(1)).as("n_click_after")).select(col("n_click_after"))
    val np = p.agg(
      count(lit(1)).as("n_purchase_after"),
      sum(col("t3") - col("t1p")).as("lat_sum_us")
    )
    nv.crossJoin(nc)
      .crossJoin(np)
      .select(
        col("n_view"),
        col("n_click_after"),
        col("n_purchase_after"),
        // empty corpus: 0 conversions / 0 viewers -> null metrics (ANSI
        // division throws); any real corpus takes the original expressions
        when(
          col("n_purchase_after") > 0,
          round(col("lat_sum_us").cast("double") / col("n_purchase_after"), 6)
        ).as("avg_view_to_purchase_us"),
        when(col("n_view") > 0, round(col("n_purchase_after").cast("double") / col("n_view"), 6))
          .as("conversion")
      )
  }

  /** One week in event-time micros — the [[cohortRetention]] bucket. */
  val WeekUs = 7L * 24 * 3600 * 1000000L

  /** Cohort retention matrix (q95) — the classic product-analytics rollup:
    * users are cohorted by their signup week, and each later week of
    * activity increments that cohort's week-k retention cell; the output
    * is (cohort_week, week_offset) → active users, cohort size, and the
    * retention fraction.
    *
    * Scale shape: the cohort table is |users|-sized (one min per user over
    * the signup events — partial agg), and re-joins the event stream on
    * user_id as a SKINNY (user_id, signup-week) side — broadcast at test
    * scale, hash at 100 TB. Activity is distinct-ed on (user, cohort,
    * offset) BEFORE the matrix rollup so the exchange carries three longs
    * per active-user-week, never per event. Week arithmetic is exact
    * integer division on epoch micros (`div`), identical in DuckDB —
    * double division would round at the week boundary for large epochs. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    def weekOf(us: Column): Column = call_function("div", us, lit(WeekUs))
    // eventsDistributed, NOT events: the cohort build + activity distinct
    // are per-row CPU over every event; the r7 driver bench measured the
    // single-split scan at wall ~ cpu (7.1 s). The shuffle-bound window/
    // funnel consumers in this file deliberately stay on Tables.events —
    // the fan-out exchange measurably regresses them at gate scale
    // (q25 0.27->0.49 s, q92 cpu 0.5->6.3) and buys nothing: their first
    // exchange re-partitions anyway. Fan-out is a per-site decision.
    val ev = Tables
      .eventsDistributed(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
    val cohort = ev
      .filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min(col("us")).as("signup_us"))
      .select(col("user_id"), col("signup_us"), weekOf(col("signup_us")).as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    val active = ev
      .join(cohort, Seq("user_id"))
      .filter(col("us") >= col("signup_us"))
      .select(col("user_id"), col("cohort_week"), (weekOf(col("us")) - col("cohort_week")).as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
    active
      .join(sizes, Seq("cohort_week"))
      .select(
        col("cohort_week"),
        col("week_offset"),
        col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6).as("retention")
      )
  }

  /** One hour in event-time micros — the [[rateAnomaly]] bucket. */
  val HourUs = 3600000000L

  /** Per-user event-rate anomaly screen (q96) — the monitoring rollup a
    * pipeline runs over behavioral logs before trusting them (bot bursts,
    * instrumentation loops, replayed traffic): bucket each user's events
    * into hours, learn the user's own hourly mean/σ, and flag hours above
    * mean + 3σ. Everything is exact-integer until the last step: hourly
    * counts are longs, the per-user moment sums (Σc, Σc²) are exact long
    * partial aggregates, and mean/σ/threshold are derived per row by ONE
    * identical IEEE expression chain in both engines — so even the
    * boundary compare is deterministic. Shape: two skinny partial aggs
    * ((user, hour) counts, then per-user moments) + a |users|-sized
    * rejoin; nothing wide ever shuffles and no per-user window sort. */
  def rateAnomaly(s: SparkSession, dir: String): DataFrame = {
    val hours = Tables
      .events(s, dir)
      .select(col("user_id"), call_function("div", unix_micros(col("ts")), lit(HourUs)).as("hr"))
      .groupBy("user_id", "hr")
      .agg(count(lit(1)).as("cnt"))
    val stats = hours
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("cnt")).as("sum_c"),
        sum(col("cnt") * col("cnt")).as("sum_c2"),
        max(col("cnt")).as("max_cnt")
      )
    val mean = col("sum_c").cast("double") / col("n_hours")
    val sigma =
      sqrt(greatest(col("sum_c2").cast("double") / col("n_hours") - mean * mean, lit(0.0)))
    val thr = mean + lit(3.0) * sigma
    hours
      .join(stats, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(
        min(col("n_hours")).as("n_hours"),
        min(col("max_cnt")).as("max_cnt"),
        sum(when(col("cnt").cast("double") > thr, 1L).otherwise(0L)).as("n_anomalous_hours"),
        round(min(thr), 6).as("threshold")
      )
  }

  /** Columns [[dataProfile]] reports on (the engine-normalized events
    * shape: raw ns epoch + derived µs timestamp collapse to `ts_ns`). */
  val ProfileCols: Seq[String] = Seq("event_id", "ts_ns", "user_id", "event_type", "value", "props")

  /** Per-column data profile (q98) — the ingestion contract check (Deequ/
    * dbt-test style) every pipeline runs before trusting a new drop: row
    * count, null count/fraction, and EXACT distinct cardinality per
    * column. Profiles drive schema-drift alerts (a column whose null rate
    * jumps, an id whose cardinality stops matching row count) and are the
    * cheap precursor to q80's row-level snapshot diff.
    *
    * Shape: ONE corpus pass. The multi-column exact distincts plan as one
    * Expand (|cols|× row multiplication) feeding a partial aggregate —
    * map-side, no per-column rescans; the wide one-row result is reshaped
    * to per-column rows driver-free via a literal struct array. At 100 TB
    * swap the exact distincts for q81's HLL sketches column-wise if 6×
    * Expand is too hot — the report schema is unchanged. */
  def dataProfile(s: SparkSession, dir: String): DataFrame = {
    // eventsDistributed: the 6-way Expand multi-distinct is per-row CPU
    // that a single-split scan serializes (see cohortRetention's note)
    val ev = Tables.eventsDistributed(s, dir).select(ProfileCols.map(col): _*)
    val aggs = count(lit(1)).as("n_rows") +: ProfileCols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd") // null-excluding, as in the oracle
      )
    }
    val wide = ev.agg(aggs.head, aggs.tail: _*)
    val rows = ProfileCols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"${c}__nn").as("n_null"),
        col(s"${c}__nd").as("n_distinct")
      )
    }
    wide
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
      .withColumn("null_frac", round(col("n_null").cast("double") / col("n_rows"), 6))
  }

  /** q126: join-skew diagnosis — the report an engineer reads BEFORE
    * reaching for q78's salted join or trusting AQE's skew split: the
    * per-key row-count distribution of a join/groupBy key (here
    * events.user_id), its exact p50/p99/max, the skew factor max/avg, the
    * heaviest key, and the salt factor (⌈max/p50⌉) a salted repartition
    * would need to level it. Run against both sides of a planned join,
    * this is the capacity-planning artifact: skew_micro ≈ 10⁶ means
    * uniform keys (pick plain hash join); a 100× factor means one task
    * owns 100 partitions' work (salt, or pre-aggregate).
    *
    * Exact quantiles WITHOUT sorting the key table: the diagnosis
    * aggregates counts-of-counts — the |distinct count values|-row
    * histogram — and takes quantiles by running-sum rank over THAT. At
    * any corpus size the histogram stays tiny (count values repeat), so
    * the single-task window on it is the right plan, not a bottleneck;
    * the corpus-sized work is one skinny (user_id) partial count agg.
    * Max-key via one bounded-heap top-1 — no window over the key table.
    * skew_micro = floor(max·n_keys/n_rows·10⁶) is one IEEE chain over
    * exact LONGs, identical in DuckDB. */
  def skewDiagnosis(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables
      .events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val coc = counts.groupBy("cnt").agg(count(lit(1)).as("freq"))
    val w   = org.apache.spark.sql.expressions.Window.orderBy("cnt")
    val cum = coc.withColumn("cum", sum(col("freq")).over(w))
    val totals = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt")
    )
    val top = counts
      .agg(graft.plans.TopKAggregate.topK(struct(col("cnt"), col("user_id")), 1, reversed = Seq(false, true)).as("t"))
      // try_element_at: an empty corpus yields an empty top-k array and
      // ANSI element_at throws on index 1; null top_key is the honest read
      .select(try_element_at(col("t"), lit(1)).getField("user_id").as("top_key"))
    def quantile(q: Double, name: String): DataFrame =
      cum
        .crossJoin(totals.select(col("n_keys").as("nk")))
        .filter(col("cum") >= ceil(col("nk").cast(DoubleType) * lit(q)))
        .agg(min(col("cnt")).as(name))
    totals
      .crossJoin(quantile(0.5, "p50_cnt"))
      .crossJoin(quantile(0.99, "p99_cnt"))
      .crossJoin(top)
      .select(
        col("n_keys"),
        col("n_rows"),
        col("max_cnt"),
        col("p50_cnt"),
        col("p99_cnt"),
        col("top_key"),
        floor(
          col("max_cnt").cast(DoubleType) * col("n_keys").cast(DoubleType) /
            col("n_rows").cast(DoubleType) * lit(1e6)
        ).cast(LongType).as("skew_micro"),
        ceil(col("max_cnt").cast(DoubleType) / col("p50_cnt").cast(DoubleType)).cast(LongType).as("salt_factor")
      )
  }

  /** Paths reported by [[journeyPaths]]. */
  val PathTopK = 10

  /** q128: user-journey path mining — the funnel-DISCOVERY step before
    * q92's funnel measurement: q92 measures a KNOWN view→click→purchase
    * ordering; this finds which 3-step orderings actually dominate, by
    * counting every user's consecutive event-type trigram (event-time
    * order, event_id tiebreak — q82's determinism) and ranking the global
    * top-[[PathTopK]]. q82's Markov pairs lose the 3-step structure
    * (A→B and B→C don't imply A→B→C mass); paths restore it.
    *
    * Scale shape: the per-user lead() window shuffles skinny
    * (user_id, us, event_id, type) rows — the same exchange every
    * sessionization already pays, with user_id distributing evenly. The
    * path-count aggregate is partial on |event_types|³-bounded keys, and
    * the final ranking is the bounded heap (≤ k per partition), no sort. */
  def journeyPaths(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    Tables
      .events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n"))
      .agg(
        graft.plans.TopKAggregate
          .topK(struct(col("n"), col("path")), PathTopK, reversed = Seq(false, true))
          .as("top")
      )
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select((col("pos") + 1).cast(LongType).as("rnk"), col("t.path").as("path"), col("t.n").as("n"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q128_journey_paths"   -> (journeyPaths _),
    "q126_skew_diagnosis"  -> (skewDiagnosis _),
    "q98_data_profile"     -> (dataProfile _),
    "q96_rate_anomaly"     -> (rateAnomaly _),
    "q95_cohort_retention" -> (cohortRetention _),
    "q65_range_join"      -> (rangeJoinClicks _),
    "q25_window_tumbling" -> (tumbling _),
    "q26_window_session"  -> (sessions _),
    "q27_window_sliding"  -> (sliding _),
    "q82_transitions"     -> (transitions _),
    "q91_scd2_intervals"  -> (scd2Intervals _),
    "q92_event_funnel"    -> (eventFunnel _),
    "q66_moving_avg"      -> (movingAvg _)
  )

  val oracles: Map[String, String] = Map(
    "q128_journey_paths" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type FROM events
         |),
         |tri AS (
         |  SELECT event_type || '>' || t2 || '>' || t3 AS path FROM (
         |    SELECT event_type,
         |      lead(event_type, 1) OVER w AS t2,
         |      lead(event_type, 2) OVER w AS t3
         |    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         |  ) WHERE t3 IS NOT NULL
         |),
         |c AS (SELECT path, count(*) AS n FROM tri GROUP BY 1)
         |SELECT CAST(row_number() OVER (ORDER BY n DESC, path ASC) AS BIGINT) AS rnk, path, n
         |FROM c ORDER BY n DESC, path ASC LIMIT $PathTopK""".stripMargin,
    "q126_skew_diagnosis" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |coc AS (SELECT cnt, count(*) AS freq FROM c GROUP BY 1),
        |cum AS (SELECT cnt, sum(freq) OVER (ORDER BY cnt) AS cum FROM coc),
        |t AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
        |        max(cnt) AS max_cnt FROM c),
        |p50 AS (SELECT min(cnt) AS p50_cnt FROM cum, t
        |        WHERE cum >= ceil(CAST(n_keys AS DOUBLE) * 0.5)),
        |p99 AS (SELECT min(cnt) AS p99_cnt FROM cum, t
        |        WHERE cum >= ceil(CAST(n_keys AS DOUBLE) * 0.99)),
        |top AS (SELECT min(user_id) AS top_key FROM c, t WHERE c.cnt = t.max_cnt)
        |SELECT n_keys, n_rows, max_cnt, p50_cnt, p99_cnt, top_key,
        |  CAST(floor(CAST(max_cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |    / CAST(n_rows AS DOUBLE) * 1e6) AS BIGINT) AS skew_micro,
        |  CAST(ceil(CAST(max_cnt AS DOUBLE) / CAST(p50_cnt AS DOUBLE)) AS BIGINT) AS salt_factor
        |FROM t, p50, p99, top""".stripMargin,
    "q98_data_profile" ->
      ProfileCols
        .map { c =>
          s"""SELECT '$c' AS col_name, count(*) AS n_rows,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  round(CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS null_frac
             |FROM (SELECT event_id, ts AS ts_ns, user_id, event_type, value, props FROM events)""".stripMargin
        }
        .mkString("\nUNION ALL\n"),
    "q96_rate_anomaly" ->
      s"""WITH h AS (
         |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // $HourUs AS hr, count(*) AS cnt
         |  FROM events GROUP BY 1, 2
         |),
         |st AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_hours,
         |    CAST(sum(cnt) AS BIGINT) AS sum_c, CAST(sum(cnt * cnt) AS BIGINT) AS sum_c2,
         |    CAST(max(cnt) AS BIGINT) AS max_cnt
         |  FROM h GROUP BY 1
         |)
         |SELECT h.user_id AS user_id, min(st.n_hours) AS n_hours, min(st.max_cnt) AS max_cnt,
         |  CAST(sum(CASE WHEN CAST(h.cnt AS DOUBLE) >
         |      CAST(st.sum_c AS DOUBLE) / st.n_hours
         |        + 3.0 * sqrt(greatest(CAST(st.sum_c2 AS DOUBLE) / st.n_hours
         |            - (CAST(st.sum_c AS DOUBLE) / st.n_hours) * (CAST(st.sum_c AS DOUBLE) / st.n_hours), 0.0))
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous_hours,
         |  round(min(CAST(st.sum_c AS DOUBLE) / st.n_hours
         |        + 3.0 * sqrt(greatest(CAST(st.sum_c2 AS DOUBLE) / st.n_hours
         |            - (CAST(st.sum_c AS DOUBLE) / st.n_hours) * (CAST(st.sum_c AS DOUBLE) / st.n_hours), 0.0))), 6)
         |    AS threshold
         |FROM h JOIN st ON h.user_id = st.user_id
         |GROUP BY 1""".stripMargin,
    "q95_cohort_retention" ->
      s"""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type FROM events),
         |cohort AS (
         |  SELECT user_id, min(us) AS signup_us, min(us) // $WeekUs AS cohort_week
         |  FROM e WHERE event_type = 'signup' GROUP BY user_id
         |),
         |sizes AS (SELECT cohort_week, count(*) AS cohort_size FROM cohort GROUP BY 1),
         |active AS (
         |  SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_active FROM (
         |    SELECT DISTINCT e.user_id, c.cohort_week, (e.us // $WeekUs) - c.cohort_week AS week_offset
         |    FROM e JOIN cohort c ON e.user_id = c.user_id
         |    WHERE e.us >= c.signup_us
         |  ) GROUP BY 1, 2
         |)
         |SELECT a.cohort_week AS cohort_week, a.week_offset AS week_offset,
         |  CAST(a.n_active AS BIGINT) AS n_active, CAST(s.cohort_size AS BIGINT) AS cohort_size,
         |  round(CAST(a.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
         |FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week""".stripMargin,
    "q91_scd2_intervals" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type FROM events
        |),
        |r AS (
        |  SELECT user_id, event_id, us, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |),
        |i AS (
        |  SELECT user_id, event_type, us,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS island
        |  FROM r
        |),
        |runs AS (
        |  SELECT user_id, island, min(event_type) AS state, min(us) AS valid_from_us,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM i GROUP BY 1, 2
        |)
        |SELECT user_id, state, valid_from_us,
        |  lead(valid_from_us) OVER w2 AS valid_to_us, n_events,
        |  CAST(lead(valid_from_us) OVER w2 IS NULL AS BIGINT) AS is_current
        |FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY island)""".stripMargin,
    "q92_event_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type FROM events),
        |v AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(us) AS t2, min(t1) AS t1k FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE event_type = 'click' AND us > t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(us) AS t3, min(t1k) AS t1p FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE event_type = 'purchase' AND us > t2 GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click_after,
        |  (SELECT count(*) FROM p) AS n_purchase_after,
        |  round(CAST((SELECT sum(t3 - t1p) FROM p) AS DOUBLE) / (SELECT count(*) FROM p), 6)
        |    AS avg_view_to_purchase_us,
        |  round(CAST((SELECT count(*) FROM p) AS DOUBLE) / (SELECT count(*) FROM v), 6) AS conversion""".stripMargin,
    "q82_transitions" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type FROM events
        |),
        |pairs AS (
        |  SELECT prev_type, event_type AS next_type, count(*) AS n FROM (
        |    SELECT event_type,
        |      lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_type
        |    FROM e
        |  ) WHERE prev_type IS NOT NULL
        |  GROUP BY 1, 2
        |),
        |tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_prev FROM pairs GROUP BY 1)
        |SELECT p.prev_type AS prev_type, p.next_type AS next_type, p.n AS n,
        |  round(CAST(p.n AS DOUBLE) / t.n_prev, 6) AS p
        |FROM pairs p JOIN tot t ON p.prev_type = t.prev_type""".stripMargin,
    "q66_moving_avg" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events
         |)
         |SELECT event_id, user_id, us,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) / (count(*) OVER w) AS avg_1h,
         |  count(*) OVER w AS n_1h
         |FROM e
         |WINDOW w AS (PARTITION BY user_id ORDER BY us
         |             RANGE BETWEEN $TrailUs PRECEDING AND CURRENT ROW)""".stripMargin,
    "q65_range_join" ->
      s"""SELECT p.event_id AS event_id, p.user_id AS user_id,
         |  strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS p_ts,
         |  count(c.user_id) AS n_clicks_10m
         |FROM events p LEFT JOIN events c
         |  ON c.user_id = p.user_id AND c.event_type = 'click'
         |  AND epoch_us(CAST(c.ts AS TIMESTAMP)) >= epoch_us(CAST(p.ts AS TIMESTAMP)) - $RangeUs
         |  AND epoch_us(CAST(c.ts AS TIMESTAMP)) < epoch_us(CAST(p.ts AS TIMESTAMP))
         |WHERE p.event_type = 'purchase'
         |GROUP BY 1, 2, 3""".stripMargin,
    "q25_window_tumbling" ->
      s"""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
         |  event_type, count(*) AS n_events, ${sqlDsum("value", 6)} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q26_window_session" ->
      s"""WITH e AS (SELECT user_id, value, CAST(ts AS TIMESTAMP) AS t FROM events),
         |m AS (SELECT user_id, value, t,
         |        CASE WHEN lag(t) OVER w IS NULL
         |               OR t - lag(t) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
         |s AS (SELECT user_id, value, t,
         |        CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
         |      FROM m)
         |SELECT user_id,
         |  strftime(min(t), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
         |  strftime(max(t) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
         |  count(*) AS n_events, ${sqlDsum("value", 6)} AS sum_value
         |FROM s GROUP BY user_id, sid""".stripMargin,
    "q27_window_sliding" ->
      """WITH e AS (
        |  SELECT event_type,
        |    make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000) * 1800000000) AS w0
        |  FROM events
        |),
        |w AS (
        |  SELECT event_type, w0 AS ws FROM e
        |  UNION ALL
        |  SELECT event_type, w0 - INTERVAL 30 MINUTE AS ws FROM e
        |)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type, count(*) AS n_events
        |FROM w GROUP BY 1, 2""".stripMargin
  )
}
