package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Document deduplication family over `documents` — the operators a
  * training-data pipeline runs at 100 TB.
  *
  * Scale design:
  *  - Exact / canonical dedup: one hash-shuffle on a 32-char fingerprint,
  *    never on the full text (group key is md5, so shuffle rows are tiny and
  *    the text column is pruned before the exchange).
  *  - N-gram Jaccard: inverted-index self-join (shingle → doc) rather than a
  *    doc × doc cross join — O(sum df²) not O(n²). At real scale the MinHash
  *    banding variant (MinHashLsh) replaces the exact index; both are here.
  */
object Dedup extends QueryModule {

  /** Canonical form: lowercase, strip non-alphanumerics to single spaces. */
  def canonicalText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Exact dedup: group by content hash, keep the smallest doc_id. */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables
      .documentsDistributed(s, dir)
      .groupBy(md5(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Near-exact dedup on the canonical form (whitespace/punct/case folded). */
  def canonical(s: SparkSession, dir: String): DataFrame =
    Tables
      .documentsDistributed(s, dir)
      .groupBy(md5(canonicalText(col("text"))).as("fingerprint"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-trigram shingles per document. Trigrams over bigrams is a
    * scale decision: document frequency per shingle drops ~|vocab|×, so the
    * inverted-index/LSH candidate volume (∝ Σ df²) collapses while
    * discrimination improves. Guards the <3-token case — `sequence(1, 0)`
    * would generate a descending range, not an empty one. */
  def shingles(text: Column): Column = graft.plans.TextHashExpressions.wordShingles(text)

  /** Reference HOF formulation of [[shingles]] — semantically identical;
    * kept for the parity test. Interpreted lambdas re-run the split per
    * element (O(tokens²)), which is why the native expression exists. */
  def shinglesHof(text: Column): Column = {
    val toks = split(text, " +")
    when(size(toks) < 3, array().cast("array<string>")).otherwise(
      array_distinct(
        transform(
          sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))
        )
      )
    )
  }

  /** Row ceiling for [[ngramJaccard]] (override with the
    * `graft.invertedJaccard.maxRows` session conf): the inverted index is
    * O(Σ df²) — exact, but quadratic in per-shingle document frequency. */
  val JaccardDefaultMaxRows = 1000000L

  /** All-pairs word-bigram Jaccard ≥ 0.3 via inverted index:
    * explode shingles → self-join on shingle (id_a < id_b) → intersection
    * counts → join per-doc set sizes → Jaccard.
    *
    * TEST-SCALE ORACLE BASELINE — exact Jaccard over every co-shingled
    * pair, the ground truth that q33's banded MinHash approximates. Like
    * q37, it fails fast above a row ceiling instead of silently running a
    * Σ df² join on a corpus; q33 is the production path. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val maxRows =
      s.conf.getOption("graft.invertedJaccard.maxRows").map(_.toLong).getOrElse(JaccardDefaultMaxRows)
    val n = Tables.documents(s, dir).count()
    require(
      n <= maxRows,
      s"ngramJaccard is the O(sum df^2) test-scale baseline: corpus has $n docs > limit $maxRows. " +
        "Use minhashLsh (q33) at corpus scale, or raise graft.invertedJaccard.maxRows explicitly."
    )
    val sh  = Tables.documentsDistributed(s, dir).select(col("doc_id"), shingles(col("text")).as("shingles"))
    val sz  = sh.select(col("doc_id"), size(col("shingles")).as("n_sh"))
    val inv = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val a   = inv.select(col("doc_id").as("id_a"), col("sh"))
    val b   = inv.select(col("doc_id").as("id_b"), col("sh"))
    val inter = a
      .join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    val szA = sz.select(col("doc_id").as("id_a"), col("n_sh").as("n_a"))
    val szB = sz.select(col("doc_id").as("id_b"), col("n_sh").as("n_b"))
    inter
      .join(szA, Seq("id_a"))
      .join(szB, Seq("id_b"))
      .withColumn("union_n", col("n_a") + col("n_b") - col("inter"))
      .withColumn("jaccard", round(col("inter") / col("union_n"), 6))
      .filter(col("jaccard") >= 0.3)
      .select("id_a", "id_b", "inter", "union_n", "jaccard")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_dedup_exact"     -> (exact _),
    "q31_dedup_canonical" -> (canonical _),
    "q32_dedup_jaccard"   -> (ngramJaccard _)
  )

  /** DuckDB rendering of [[shingles]] — shared by the Jaccard and MinHash
    * oracles. */
  val shinglesSql: String =
    """sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
      |         ELSE list_distinct(list_transform(generate_series(1, len(t) - 2),
      |                                           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
      |    END AS shingles
      |  FROM (SELECT doc_id, regexp_split_to_array(text, ' +') AS t FROM documents)
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q31_dedup_canonical" ->
      """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "q32_dedup_jaccard" ->
      s"""WITH $shinglesSql,
         |sz AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
         |inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b, inter, (sa.n_sh + sb.n_sh - inter) AS union_n,
         |  round(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
         |FROM inter
         |JOIN sz sa ON inter.id_a = sa.doc_id
         |JOIN sz sb ON inter.id_b = sb.doc_id
         |WHERE round(inter / (sa.n_sh + sb.n_sh - inter), 6) >= 0.3""".stripMargin
  )
}
