package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Num, QueryModule, Tables}

/** Training-data preparation operators beyond dedup/quality: the sampling
  * and batching stages of a 100 TB corpus pipeline.
  *
  *  - Stratified sampling: deterministic "random" order via md5(doc_id), so
  *    every engine (and every rerun) draws the same sample — no RNG state.
  *  - Sequence packing: greedy token-budget binning per language via an
  *    exclusive running sum — the shuffle is one window per stratum.
  *  - Repetition scoring: distinct/total shingle ratio, a standard
  *    quality signal for generated/boilerplate text.
  */
object TrainingPrep extends QueryModule {
  import Num._

  val SamplePerLang = 20
  val TokenBudget   = 4096

  /** Deterministic stratified sample: top-N per language in md5 order. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("lang")
      .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
    Tables
      .documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= SamplePerLang)
  }

  /** Pack documents into fixed token-budget bins per language: bin id =
    * floor(exclusive-cumulative-tokens / budget), docs in doc_id order. */
  def sequencePacking(s: SparkSession, dir: String): DataFrame = {
    val nTokens = size(split(col("text"), " +")).cast(LongType)
    val w       = Window.partitionBy("lang").orderBy("doc_id")
    val cumBefore = coalesce(
      sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L)
    )
    Tables
      .documents(s, dir)
      .select(col("doc_id"), col("lang"), nTokens.as("n_tokens"))
      .withColumn("bin_id", floor(cumBefore / lit(TokenBudget)).cast(LongType))
  }

  /** Intra-document repetition: 1 - distinct/total trigram-shingle ratio,
    * aggregated per language. */
  def repetitionScore(s: SparkSession, dir: String): DataFrame = {
    val n        = size(split(col("text"), " +"))
    val total    = greatest(n - 2, lit(0))
    val distinctN = size(Dedup.shingles(col("text")))
    val ratio = when(total > 0, round(lit(1.0) - distinctN.cast(DoubleType) / total.cast(DoubleType), 6))
      .otherwise(lit(0.0))
    Tables
      .documents(s, dir)
      .withColumn("rep_ratio", ratio)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        dsum(col("rep_ratio"), dec6).as("sum_rep"),
        max(col("rep_ratio")).as("max_rep")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_stratified_sample" -> (stratifiedSample _),
    "q46_sequence_packing"  -> (sequencePacking _),
    "q47_repetition_score"  -> (repetitionScore _)
  )

  val oracles: Map[String, String] = Map(
    "q45_stratified_sample" ->
      s"""SELECT doc_id, lang, n_chars, rk FROM (
         |  SELECT doc_id, lang, n_chars,
         |    row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM documents
         |) WHERE rk <= $SamplePerLang""".stripMargin,
    "q46_sequence_packing" ->
      s"""SELECT doc_id, lang, n_tokens,
         |  CAST(floor(COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $TokenBudget) AS BIGINT) AS bin_id
         |FROM (
         |  SELECT doc_id, lang, CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT) AS n_tokens
         |  FROM documents
         |)""".stripMargin,
    "q47_repetition_score" ->
      s"""WITH ${Dedup.shinglesSql},
         |r AS (
         |  SELECT d.lang,
         |    CASE WHEN greatest(len(regexp_split_to_array(d.text, ' +')) - 2, 0) > 0
         |      THEN round(1.0 - CAST(len(sh.shingles) AS DOUBLE)
         |             / greatest(len(regexp_split_to_array(d.text, ' +')) - 2, 0), 6)
         |      ELSE 0.0 END AS rep_ratio
         |  FROM documents d JOIN sh ON d.doc_id = sh.doc_id
         |)
         |SELECT lang, count(*) AS n_docs, ${sqlDsum("rep_ratio", 6)} AS sum_rep,
         |  max(rep_ratio) AS max_rep
         |FROM r GROUP BY lang""".stripMargin
  )
}
