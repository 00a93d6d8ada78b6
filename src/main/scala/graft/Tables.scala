package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet tables (`/root/repo/TESTDATA.md`).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS); Spark's vectorized
  * reader needs the legacy nanosAsLong conf to read it (as a raw ns-epoch
  * LONG), which suits this engine — the flagship query normalizes raw epochs
  * anyway. Set lazily, before the first events read.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")

  /** `documents` spread across all cores. The test file is a single parquet
    * row group (= one input split = one task), which serializes CPU-heavy
    * per-row operators (hashing, shingling) locally; on a real corpus the
    * thousands of splits make this a no-op-equivalent. The tiny text
    * shuffle buys full-parallel expression evaluation. */
  def documentsDistributed(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** `events` with `ts` surfaced as both a raw ns-epoch long (`ts_ns`) and a
    * microsecond-precision TIMESTAMP (`ts`).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    val raw = s.read.parquet(s"$d/events.parquet")
    raw
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(call_function("div", col("ts_ns"), lit(1000L))))
  }
}
