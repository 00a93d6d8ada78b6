package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, FuzzyDedup, TextAnalysis}

/** Scratch probe (not part of the registry): phase split of
  * q109_survivors_quality (and its q107/q38 siblings) — LSH mine vs CC vs
  * quality pass vs final rollup — to decide the r18 optimization shape. */
object SurvProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[sprobe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    spark.read.parquet(s"$dir/lineitem.parquet").count() // session warm

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      // Phase 1: the shingle pass (minhashLsh's docs checkpoint)
      val docs = time("shingle checkpoint (eager)") {
        Tables
          .documentsDistributed(spark, dir)
          .select(col("doc_id"), Dedup.shingles(col("text")).as("shingles"))
          .filter(size(col("shingles")) > 0)
          .localCheckpoint()
      }
      // Phase 2: mining (bands + candidates + verify) — materialized by the
      // pair store pack, same as connectedComponents does internally
      val bands = FuzzyDedup.boundedBands(
        docs.select(
          col("doc_id"),
          explode(graft.plans.TextHashExpressions.minhashBandKeys(col("shingles"))).as("band")),
        "band",
        FuzzyDedup.MaxBandOccupancy
      )
      val cand = bands
        .select(col("band"), col("doc_id").as("id_a"))
        .join(bands.select(col("band"), col("doc_id").as("id_b")), Seq("band"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .distinct()
      val shA = docs.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"))
      val shB = docs.select(col("doc_id").as("id_b"), col("shingles").as("sh_b"))
      val pairs = cand
        .join(shA, Seq("id_a"))
        .join(shB, Seq("id_b"))
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast(LongType))
        .withColumn("union_n", (size(col("sh_a")) + size(col("sh_b"))).cast(LongType) - col("inter"))
        .withColumn("jaccard", round(col("inter") / col("union_n"), 6))
        .filter(col("jaccard") >= 0.3)
        .select("id_a", "id_b")
      val store = time("mine pairs -> packed store")(FuzzyDedup.packPairStore(pairs))
      // Phase 3: CC loop
      val (labels, rounds) = time("cc loop")(FuzzyDedup.ccLoop(store.edges))
      println(s"[sprobe] cc rounds=$rounds")
      store.unpersist()
      // Phase 4: quality corpus pass (q109's second text scan)
      val qdocs = time("quality checkpoint (eager)") {
        Tables
          .documentsDistributed(spark, dir)
          .select(
            col("doc_id"),
            col("source"),
            floor(TextAnalysis.qualityScore(col("text"), col("n_chars")) * lit(1e6))
              .cast(LongType)
              .as("qm"))
          .localCheckpoint()
      }
      // Phase 5: members checkpoint
      val members = time("members checkpoint (eager)") {
        labels
          .join(qdocs.select(col("doc_id").as("node"), col("qm")), Seq("node"))
          .localCheckpoint()
      }
      // Phase 6: best/reps/removed + final rollup
      time("argmax + final rollup") {
        val best = members.groupBy("label").agg(max(col("qm")).as("maxq"))
        val reps = members
          .join(best, Seq("label"))
          .filter(col("qm") === col("maxq"))
          .groupBy("label")
          .agg(min(col("node")).as("rep"))
        val removed = members
          .join(reps, Seq("label"))
          .filter(col("node") =!= col("rep"))
          .select(col("node").as("doc_id"), lit(1L).as("removed"))
        qdocs
          .join(removed, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(coalesce(col("removed"), lit(0L))).as("n_removed"),
            sum(when(col("removed").isNull, 1L).otherwise(0L)).as("n_survivors"),
            sum(when(col("removed").isNotNull, col("qm")).otherwise(0L)).as("q_removed_sum")
          )
          .write.format("noop").mode("overwrite").save()
      }
      // End-to-end references
      time("q109 end-to-end")(
        FuzzyDedup.dedupSurvivorsByQuality(spark, dir).write.format("noop").mode("overwrite").save())
      time("q107 end-to-end")(
        FuzzyDedup.dedupSurvivors(spark, dir).write.format("noop").mode("overwrite").save())
      time("q38 end-to-end")(
        FuzzyDedup.dedupClusters(spark, dir).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
