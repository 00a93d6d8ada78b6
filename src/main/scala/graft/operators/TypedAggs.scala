package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Typed `Aggregator` surface (SURVEY.md §2.7): custom aggregation logic
  * with a mutable buffer, merged associatively — the user-extensibility
  * path for aggregates Spark lacks. The example accumulates a bitmask of
  * event types seen per user: order-independent (OR is commutative), so
  * results are deterministic under any partitioning and exactly
  * reproducible in the oracle via `bit_or`.
  */
object TypedAggs extends QueryModule {

  /** Stable event-type → bit mapping (alphabetical). */
  val TypeBits: Map[String, Long] = Map(
    "click"    -> 1L,
    "error"    -> 2L,
    "purchase" -> 4L,
    "signup"   -> 8L,
    "view"     -> 16L
  )

  final case class UserTypeEvent(user_id: Long, event_type: String)

  /** Bitwise-OR aggregator over mapped event-type bits. */
  object TypeMaskAgg extends Aggregator[UserTypeEvent, Long, Long] {
    override def zero: Long = 0L
    override def reduce(acc: Long, e: UserTypeEvent): Long =
      acc | TypeBits.getOrElse(e.event_type, 0L)
    override def merge(a: Long, b: Long): Long = a | b
    override def finish(acc: Long): Long       = acc
    override def bufferEncoder: Encoder[Long]  = Encoders.scalaLong
    override def outputEncoder: Encoder[Long]  = Encoders.scalaLong
  }

  /** Per-user event-type coverage: mask + distinct-type count. */
  def userTypeMask(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val typed = Tables
      .events(s, dir)
      .select(col("user_id"), col("event_type"))
      .as[UserTypeEvent]
    typed
      .groupByKey(_.user_id)
      .agg(TypeMaskAgg.toColumn.name("type_mask"))
      .toDF("user_id", "type_mask")
      .withColumn("n_types", bit_count(col("type_mask")).cast("long"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_typed_agg_mask" -> (userTypeMask _)
  )

  val oracles: Map[String, String] = Map(
    "q29_typed_agg_mask" -> {
      val cases = TypeBits.toSeq.sortBy(_._1)
        .map { case (t, b) => s"WHEN '$t' THEN $b" }
        .mkString(" ")
      s"""SELECT user_id,
         |  CAST(bit_or(CASE event_type $cases ELSE 0 END) AS BIGINT) AS type_mask,
         |  CAST(bit_count(bit_or(CASE event_type $cases ELSE 0 END)) AS BIGINT) AS n_types
         |FROM events GROUP BY user_id""".stripMargin
    }
  )
}
