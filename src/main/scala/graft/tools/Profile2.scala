package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, FuzzyDedup}
import graft.plans.TextHashExpressions

/** Candidate-volume profiler for the pair-mining dedup queries. */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p2] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // q33 minhash: band bucket sizes + candidate count
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val bands = docs.select(col("doc_id"), explode(TextHashExpressions.minhashBandKeys(col("shingles"))).as("band"))
    time("q33 band rows")(println("  rows=" + bands.count()))
    val bandSizes = bands.groupBy("band").count()
    time("q33 candidate pairs (sum k*(k-1)/2)") {
      println("  cand=" + bandSizes.agg(sum(col("count") * (col("count") - 1) / 2)).head().getDouble(0).toLong)
    }
    // q35 simhash bands
    val fp = FuzzyDedup.simhashed(spark, dir).select("doc_id", "fp")
    val banded = fp.select(col("doc_id"),
      explode(array((0 until 4).map(i => concat_ws(":", lit(i), shiftright(col("fp"), i * 15) % 32768)): _*)).as("band"))
    time("q35 candidate pairs") {
      println("  cand=" + banded.groupBy("band").count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).head().getDouble(0).toLong)
    }
    // q32 inverted index volume
    val inv = docs.select(col("doc_id"), explode(col("shingles")).as("sh"))
    time("q32 join volume (sum df^2/2)") {
      println("  vol=" + inv.groupBy("sh").count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).head().getDouble(0).toLong)
    }
    // per-stage timing of q35
    time("q35 full")(FuzzyDedup.simhashPairs(spark, dir).count())
    time("q33 full")(FuzzyDedup.minhashLsh(spark, dir).count())
    spark.stop()
  }
}
