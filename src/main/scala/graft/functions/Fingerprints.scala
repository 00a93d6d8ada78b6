package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The engine-wide md5-prefix content fingerprints, with their DuckDB twins
  * in ONE place. Each helper pairs a Spark `Column` with the SQL rendering
  * the oracles must use, so an engine/oracle dtype or width mismatch has a
  * single home (before this, `conv(substring(md5(…),1,8),16,10)` was
  * hand-rolled at ~8 call sites and each oracle re-derived its own
  * `CAST('0x' || substr(md5(…),1,8) AS BIGINT)`).
  *
  * Width choices:
  *  - fp8: first 8 hex chars → uint32-range LONG. Cheap per-row salt /
  *    shard / sampling hash — collision-tolerant uses only.
  *  - fp15: first 15 hex chars → 60-bit LONG. Hash families that need
  *    negligible collision mass within a document (token hashing, SimHash
  *    base) while staying clear of the sign bit (DuckDB's 0x-cast and
  *    Spark's conv both stay positive at ≤ 15 hex chars).
  */
object Fingerprints {

  /** First 8 md5 hex chars as a LONG in [0, 2³²). */
  def fp8(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** First 15 md5 hex chars as a 60-bit non-negative LONG. */
  def fp15(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** DuckDB twin of [[fp8]] over a SQL expression string. */
  def fp8Sql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 8) AS BIGINT)"

  /** DuckDB twin of [[fp15]] over a SQL expression string. */
  def fp15Sql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"
}
