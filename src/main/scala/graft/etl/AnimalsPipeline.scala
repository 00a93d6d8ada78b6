package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.sinks.HttpBatchSink
import graft.sources.{HttpTimeouts, RestEnrich, RetryPolicy}

/** The reference's full E-T-L composed Spark-first
  * (`/root/reference/src/animals_etl/cli.py:40-43`): paginated scan →
  * keyed-lookup enrichment → transform → batched POST. Unlike the
  * reference's four materialization barriers, scan → enrich → transform is
  * one pipelined narrow plan; only the sink action executes it.
  */
object AnimalsPipeline {

  final case class Result(postedBatches: Long)

  def listed(spark: SparkSession, transportClass: String): DataFrame =
    spark.read
      .format("graft.sources.RestAnimalsSource")
      .option("transport", transportClass)
      .load()

  def run(
      spark: SparkSession,
      transportClass: String,
      asOf: Column,
      concurrency: Int = 8,
      batchSize: Int = 100,
      policy: RetryPolicy = RetryPolicy(),
      timeouts: HttpTimeouts = HttpTimeouts()
  ): Result = {
    val ids         = listed(spark, transportClass)
    val details     = RestEnrich.details(ids, transportClass, concurrency, policy, timeouts)
    val transformed = AnimalsTransform.transform(details, asOf)
    Result(HttpBatchSink.post(transformed, transportClass, batchSize, policy, timeouts))
  }

  /** Env/CLI-configured entry point — the reference's `cli.py` run shape. */
  def run(spark: SparkSession, transportClass: String, asOf: Column, config: EtlConfig): Result =
    run(spark, transportClass, asOf, config.concurrency, config.batchSize, config.policy, config.timeouts)
}
