package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level validation channel: the distributed analog of the reference's
  * 422 error path (`/root/reference/src/http_client.py:20-27` — one bad
  * payload fails the whole batch). In an engine, invalid rows shouldn't
  * abort the job OR silently vanish: they split into a quarantine frame
  * carrying the reason, for separate sinking/inspection.
  */
object Quarantine {

  final case class Split(valid: DataFrame, quarantined: DataFrame)

  /** Split on named validation rules. A row is quarantined if any rule
    * fails; `_quarantine_reasons` lists the failing rule names. The input
    * is evaluated once per branch off a shared tagged plan — both branches
    * remain pure column pipelines (no driver round-trip).
    */
  def split(df: DataFrame, rules: Map[String, Column]): Split = {
    val reasons = array_compact(
      array(rules.toSeq.sortBy(_._1).map { case (name, ok) =>
        when(!coalesce(ok, lit(false)), lit(name)).otherwise(lit(null))
      }: _*)
    )
    val tagged = df.withColumn("_quarantine_reasons", reasons)
    Split(
      valid = tagged.filter(size(col("_quarantine_reasons")) === 0).drop("_quarantine_reasons"),
      quarantined = tagged.filter(size(col("_quarantine_reasons")) > 0)
    )
  }
}
