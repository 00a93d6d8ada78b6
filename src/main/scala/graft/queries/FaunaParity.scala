package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryModule, Tables}
import graft.functions.FaunaFunctions._

/** The reference's operator surface (SURVEY.md §2) exercised over the
  * driver's tables: scalar functions F1-F3, flatten S3, JSON tolerance S4,
  * and the P3/P4/P5 validity predicates — all as codegen'd built-ins.
  *
  * The flagship (`q20_epoch_normalize`) derives mixed-unit epochs (s/ms/µs/ns
  * chosen deterministically per row) plus injected invalid (negative) and
  * future values from `events.ts`, then runs the reference's normalize →
  * validate → reject pipeline (`/root/reference/src/animals_etl/utils.py:20-48`)
  * with a fixed `asOf` cutoff for reproducibility.
  */
object FaunaParity extends QueryModule {

  /** Fixed "now" for the reference's future-timestamp rejection (P4). */
  val AsOf: Column = lit("2026-01-01 00:00:00").cast(TimestampType)

  private def div(c: Column, d: Long): Column = call_function("div", c, lit(d))

  /** Mixed-unit epoch derivation: unit by event_id % 4, with invalid and
    * future rows injected on the 97 / 101 residues. Purely integer math so
    * the DuckDB oracle reproduces it bit-for-bit.
    */
  def rawEpoch(eventId: Column, tsNs: Column): Column =
    when(eventId % 97 === 0, lit(-1L))
      .when(eventId % 101 === 0, div(tsNs, 1000L) + lit(315360000000000L)) // ~+10y, µs band
      .when(eventId % 4 === 0, div(tsNs, 1000000000L))                     // seconds
      .when(eventId % 4 === 1, div(tsNs, 1000000L))                        // milliseconds
      .when(eventId % 4 === 2, div(tsNs, 1000L))                           // microseconds
      .otherwise(tsNs)                                                     // nanoseconds

  def epochNormalize(s: SparkSession, dir: String): DataFrame = {
    // eventsDistributed: the ISO render is pure CPU per row and the gate's
    // single-file events scan would serialize it (exposed by the round-7
    // honest bench: 10.2 s wall at the 10x corpus with ~2 cores busy)
    val ev  = Tables.eventsDistributed(s, dir)
    val iso = epochToIso8601Utc(rawEpoch(col("event_id"), col("ts_ns")), AsOf)
    ev.withColumn("iso", iso)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("iso")).as("n_valid"),
        min(col("iso")).as("min_iso"),
        max(col("iso")).as("max_iso")
      )
  }

  /** F1 splitFriends + S3 explode over `part.p_name` (spaces → commas to
    * exercise the comma-split semantics), token frequency table. */
  def splitExplode(s: SparkSession, dir: String): DataFrame =
    Tables
      .part(s, dir)
      .select(col("p_partkey"), explode(splitFriends(translate(col("p_name"), " ", ","))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"), countDistinct(col("p_partkey")).as("n_parts"))

  /** S4 permissive JSON: parse `events.props`, tolerate unparseable rows as
    * nulls, aggregate the extracted field. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame = {
    val ev     = Tables.eventsDistributed(s, dir) // per-row JSON parse: fan out
    val schema = StructType(Seq(StructField("k", LongType)))
    ev.withColumn("k", from_json(col("props"), schema).getField("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k")
      )
  }

  /** F3 ISO validation as a predicate over generated strings: render epochs
    * through the full pipeline and assert the regex accepts every non-null
    * result (quality-gate parity with pipeline.py:85). */
  def isoValidate(s: SparkSession, dir: String): DataFrame = {
    val ev  = Tables.eventsDistributed(s, dir) // per-row render+regex: fan out
    val iso = epochToIso8601Utc(rawEpoch(col("event_id"), col("ts_ns")), AsOf)
    ev.withColumn("iso", iso)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("iso")).as("n_valid"),
        sum(when(isValidIsoUtc(col("iso")), 0L).otherwise(1L)).as("n_invalid_format"),
        sum(when(col("iso").rlike("\\.\\d{6}Z$"), 1L).otherwise(0L)).as("n_fractional")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_epoch_normalize" -> (epochNormalize _),
    "q21_split_explode"   -> (splitExplode _),
    "q22_json_extract"    -> (jsonExtract _),
    "q23_iso_validate"    -> (isoValidate _)
  )

  /** Shared oracle fragment: the reference's normalize ladder in DuckDB SQL
    * over a raw-epoch column named `epoch_raw`, yielding `iso`. */
  private val isoLadder: String =
    """n AS (SELECT *, CASE WHEN epoch_raw IS NULL OR epoch_raw < 0 THEN NULL
      |  WHEN epoch_raw >= 1000000000000000000 THEN epoch_raw // 1000
      |  WHEN epoch_raw >= 1000000000000000 THEN epoch_raw
      |  WHEN epoch_raw >= 1000000000000 THEN epoch_raw * 1000
      |  ELSE epoch_raw * 1000000 END AS us0 FROM r),
      |v AS (SELECT *, CASE WHEN us0 IS NULL OR us0 > 253402300799999999
      |    OR make_timestamp(us0) > TIMESTAMP '2026-01-01 00:00:00' THEN NULL ELSE us0 END AS us FROM n),
      |i AS (SELECT *, CASE WHEN us IS NULL THEN NULL ELSE
      |  strftime(make_timestamp(us), '%Y-%m-%dT%H:%M:%S') ||
      |  CASE WHEN us % 1000000 <> 0 THEN '.' || strftime(make_timestamp(us), '%f') ELSE '' END || 'Z' END AS iso
      |FROM v)""".stripMargin

  private val rawEpochSql: String =
    """r AS (SELECT event_id, event_type, CASE
      |  WHEN event_id % 97 = 0 THEN -1
      |  WHEN event_id % 101 = 0 THEN epoch_ns(ts) // 1000 + 315360000000000
      |  WHEN event_id % 4 = 0 THEN epoch_ns(ts) // 1000000000
      |  WHEN event_id % 4 = 1 THEN epoch_ns(ts) // 1000000
      |  WHEN event_id % 4 = 2 THEN epoch_ns(ts) // 1000
      |  ELSE epoch_ns(ts) END AS epoch_raw FROM events)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q20_epoch_normalize" ->
      s"""WITH $rawEpochSql,
         |$isoLadder
         |SELECT event_type, count(*) AS n_events, count(iso) AS n_valid,
         |  min(iso) AS min_iso, max(iso) AS max_iso
         |FROM i GROUP BY event_type""".stripMargin,
    "q21_split_explode" ->
      """SELECT token, count(*) AS n, count(DISTINCT p_partkey) AS n_parts
        |FROM (
        |  SELECT p_partkey,
        |    unnest(list_filter(list_transform(string_split(replace(p_name, ' ', ','), ','),
        |                                      x -> trim(x)), x -> x <> '')) AS token
        |  FROM part
        |)
        |GROUP BY token""".stripMargin,
    "q22_json_extract" ->
      """SELECT event_type, count(*) AS n_rows,
        |  count(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS n_with_k,
        |  CAST(sum(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q23_iso_validate" ->
      s"""WITH $rawEpochSql,
         |$isoLadder
         |SELECT count(*) AS n_rows, count(iso) AS n_valid,
         |  CAST(sum(CASE WHEN iso IS NULL OR regexp_matches(iso, '^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?Z$$') THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid_format,
         |  CAST(sum(CASE WHEN regexp_matches(iso, '\\.\\d{6}Z$$') THEN 1 ELSE 0 END) AS BIGINT) AS n_fractional
         |FROM i""".stripMargin
  )
}
