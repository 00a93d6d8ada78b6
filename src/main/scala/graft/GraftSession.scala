package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration this engine is designed around.
  *
  * Tuned for the driver's local[32] harness but with settings that carry to a
  * real cluster: AQE on (runtime re-planning, skew-join handling, partition
  * coalescing), shuffle partitions sized to cores rather than the 200 default,
  * UTC session time zone so timestamp rendering matches the DuckDB oracle.
  */
object GraftSession {
  def builder(master: String = "local[32]", cores: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Engine-wide contract: nanos-precision parquet timestamps surface as
      // raw ns-epoch LONGs (see Tables.events). Set once here, not as a
      // hidden side effect of a table read.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(master: String = "local[32]", cores: Int = 32): SparkSession = {
    val spark = builder(master, cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
