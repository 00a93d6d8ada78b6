package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Scratch profiler for the dedup hot path: times each stage of the
  * inverted-index Jaccard pipeline separately at the given SF dir. */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    val sh = Tables.documents(spark, dir).select(col("doc_id"), Dedup.shingles(col("text")).as("shingles"))
    time("shingles")(sh.count())
    val inv = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    time("inverted index")(inv.count())
    val a = inv.select(col("doc_id").as("id_a"), col("sh"))
    val b = inv.select(col("doc_id").as("id_b"), col("sh"))
    val joined = a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
    time("self join")(joined.count())
    val inter = joined.groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    time("join+group")(inter.count())
    time("full q32")(Dedup.ngramJaccard(spark, dir).count())
    time("full q33")(graft.operators.FuzzyDedup.minhashLsh(spark, dir).count())
    time("q33 bands only") {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), Dedup.shingles(col("text")).as("shingles"))
        .filter(size(col("shingles")) > 0)
        .withColumn("hs", transform(col("shingles"), s => graft.operators.FuzzyDedup.baseHash(s)))
      docs.select(col("doc_id"), explode(graft.operators.FuzzyDedup.bandKeys(
        graft.operators.FuzzyDedup.minhashSignature(col("hs")))).as("band")).count()
    }
    time("full q35")(graft.operators.FuzzyDedup.simhashPairs(spark, dir).count())
    time("simhash fp only")(graft.operators.FuzzyDedup.simhashed(spark, dir).count())
    spark.stop()
  }
}
