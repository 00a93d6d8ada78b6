package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.{DedupIndex, FuzzyDedup}

/** Scratch probe: per-phase wall of the q112 maintenance loop at the given
  * SF dir, to find whether the cost is the text passes, the bucketed
  * writes, or the probe joins. */
object IndexProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[iprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    val prefix = "iprobe_idx"
    val docs   = Tables.documentsDistributed(spark, dir)
    val m      = col("doc_id") % FuzzyDedup.DeltaMod
    val base   = docs.filter(m < 8)
    val b1     = docs.filter(m === 8)
    val b2     = docs.filter(m === 9)
    time("full q112 (warm-up)")(DedupIndex.q112(spark, dir).queryExecution.toRdd.count())
    // build internals, replicated with per-phase timers
    import graft.sources.Layout
    val n = time("build: count")(DedupIndex.autoNumBuckets(base.count()))
    time("build: resets")(Seq(s"${prefix}_fp", s"${prefix}_shingles", s"${prefix}_bands")
      .foreach(Layout.resetTable(spark, _)))
    val hashed = base.select(
      col("doc_id"),
      md5(col("text")).as("fingerprint"),
      graft.operators.Dedup.shingles(col("text")).as("shingles"))
    time("build: write shingles")(Layout.writeBucketed(hashed, s"${prefix}_shingles", "doc_id", n))
    val shTable = spark.table(s"${prefix}_shingles")
    time("build: write fp")(
      Layout.writeBucketed(shTable.select("fingerprint").distinct(), s"${prefix}_fp", "fingerprint", n))
    val bands = FuzzyDedup.boundedBands(
      shTable
        .filter(size(col("shingles")) > 0)
        .select(
          col("doc_id"),
          explode(graft.plans.TextHashExpressions.minhashBandKeys(col("shingles"))).as("band")),
      "band",
      FuzzyDedup.MaxBandOccupancy)
    time("build: write bands")(Layout.writeBucketed(bands.select("band", "doc_id"), s"${prefix}_bands", "band", n))
    time("probeAndAbsorb b1")(DedupIndex.probeAndAbsorb(spark, b1, prefix).queryExecution.toRdd.count())
    time("probe b2")(DedupIndex.probe(spark, b2, prefix).queryExecution.toRdd.count())
    time("full q112 again")(DedupIndex.q112(spark, dir).queryExecution.toRdd.count())
    spark.stop()
  }
}
