package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** The null-input robustness class EmptyCorpusSpec can't reach: rows that
  * EXIST but carry NULL string payloads. At production scale this shape is
  * routine — a failed-scrape batch delivers every row with `text` NULL, an
  * upstream schema drift nulls a dimension string — and the engine-wide
  * contract is the reference's own (P2 drop / P3 nullify-and-count,
  * `/root/reference/src/animals_etl/pipeline.py:39-43,67-70`): a null value
  * may drop a row or zero a metric, but must NEVER throw a task or driver
  * error. The r13 probe found five job-killers in exactly this class
  * (q129/q132 `ROW_VALUE_IS_NULL` on a null-fed band model; q51–q53 task
  * failures at the media seam, since repaired by the doc_id-derived
  * fixture + decodeSafe quarantine) — this spec pins the fixes and the
  * whole registry against regressions.
  *
  * Two corpora, cloned from sf0.001 with real row counts:
  *   - `text` NULL in documents (the headline failed-scrape shape);
  *   - every OTHER string column NULL across all ten tables (lang, source,
  *     event_type, props, names, flags, segments…) — Spark built-ins
  *     null-propagate, so this mostly pins the custom paths' driver-side
  *     model reads.
  * Like EmptyCorpusSpec, the gate is EXECUTION (the full plan runs), not
  * row parity — the oracle compare on real data owns value correctness.
  */
class NullTextSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]", 4)
  private val srcDir = "/root/testdata/sf0.001"

  private val tables = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Clone the corpus with the given (table → columns) set to NULL,
    * preserving every physical type (cast back to the original). */
  private def cloneWithNulls(nulls: Map[String, Seq[String]]): String = {
    val out = Files.createTempDirectory("graft-nulls").toFile
    out.deleteOnExit()
    tables.foreach { t =>
      val df = spark.read.parquet(s"$srcDir/$t.parquet")
      val nulled = nulls.getOrElse(t, Nil).foldLeft(df) { (d, c) =>
        d.withColumn(c, lit(null).cast(d.schema(c).dataType))
      }
      nulled.write.mode("overwrite").parquet(s"${out.getAbsolutePath}/$t.parquet")
    }
    out.getAbsolutePath
  }

  private def runAll(dir: String): Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, dir).queryExecution.toRdd.count() // full plan, all columns
        None
      } catch {
        case e: Throwable =>
          Some(name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }

  test("every registered query executes with documents.text all-NULL") {
    val failures = runAll(cloneWithNulls(Map("documents" -> Seq("text"))))
    assert(
      failures.isEmpty,
      s"${failures.size} queries throw on an all-null-text corpus:\n" +
        failures.map { case (n, m) => s"  $n -> $m" }.mkString("\n"))
  }

  test("every registered query executes with all non-text string columns NULL") {
    val failures = runAll(cloneWithNulls(Map(
      "region"    -> Seq("r_name"),
      "nation"    -> Seq("n_name"),
      "customer"  -> Seq("c_name", "c_mktsegment"),
      "supplier"  -> Seq("s_name"),
      "part"      -> Seq("p_name", "p_brand", "p_type"),
      "orders"    -> Seq("o_orderstatus", "o_orderpriority"),
      "lineitem"  -> Seq("l_returnflag", "l_linestatus"),
      "events"    -> Seq("event_type", "props"),
      "documents" -> Seq("lang", "source")
    )))
    assert(
      failures.isEmpty,
      s"${failures.size} queries throw with non-text string columns nulled:\n" +
        failures.map { case (n, m) => s"  $n -> $m" }.mkString("\n"))
  }

  test("every registered query executes with half-null embeddings and null metric columns") {
    // the decode-failure analog for vectors/metrics: an embedding pipeline
    // emits NULL for undecodable inputs, a metrics feed drops fields. Half
    // the vectors null (not all) is the harder shape — the driver-side
    // models (IVF centroids, k-means seeds, per-dim min/max) still build,
    // but from rows whose neighbors are null.
    val out = Files.createTempDirectory("graft-nullemb").toFile
    out.deleteOnExit()
    tables.foreach { t =>
      val df = spark.read.parquet(s"$srcDir/$t.parquet")
      val nulled = t match {
        case "embeddings" =>
          df.withColumn(
            "embedding",
            org.apache.spark.sql.functions
              .when(org.apache.spark.sql.functions.pmod(col("vec_id"), lit(2)) === 0, lit(null))
              .otherwise(col("embedding")))
        case "events"    => df.withColumn("value", lit(null).cast(df.schema("value").dataType))
        case "documents" => df.withColumn("n_chars", lit(null).cast(df.schema("n_chars").dataType))
        case _           => df
      }
      nulled.write.mode("overwrite").parquet(s"${out.getAbsolutePath}/$t.parquet")
    }
    val failures = runAll(out.getAbsolutePath)
    assert(
      failures.isEmpty,
      s"${failures.size} queries throw on half-null embeddings / null metrics:\n" +
        failures.map { case (n, m) => s"  $n -> $m" }.mkString("\n"))
  }

  test("every registered query executes with NaN/Inf/zero/null-element embedding vectors") {
    // the standing degraded-vector corpus, grown probe by probe:
    //  - every 5th vector all-NaN, every 7th all-Infinity (r14 — the two
    //    non-finite fp16-overflow renderings). Before the ingestion-boundary
    //    finite filter this CRASHED q119 (NaN distances empty a k-means
    //    cluster -> DIVIDE_BY_ZERO) and silently poisoned every ranking NaN
    //    touched (NaN sorts HIGH, so a NaN vector won top-k slots).
    //  - every 11th vector ALL-ZERO (r16 — zeroed encoder flush / writer
    //    padding / masked embeddings). Finite, but L2 norm 0: before the
    //    zero-norm extension of Tables.finiteVectors, eight cosine paths
    //    threw ANSI DIVIDE_BY_ZERO (ZeroVectorProbeSpec pins the set).
    //  - every 13th vector carries ONE NULL element (r16 — a partial row
    //    from the embedding writer). Pins the deliberate three-valued-logic
    //    drop: `!exists(non-finite)` needs a definite false, which a NULL
    //    element denies, so the row is dropped — semantics documented at
    //    Tables.finiteVectors, asserted here rather than left incidental.
    // Contract for all four shapes: data-quality drops (reference P2),
    // never task failures or ranking entries.
    import org.apache.spark.sql.functions.{concat, expr, pmod, slice, transform, when}
    val out = Files.createTempDirectory("graft-nanemb").toFile
    out.deleteOnExit()
    tables.foreach { t =>
      val df = spark.read.parquet(s"$srcDir/$t.parquet")
      val mangled =
        if (t != "embeddings") df
        else df.withColumn(
          "embedding",
          when(pmod(col("vec_id"), lit(5)) === 0,
            transform(col("embedding"), _ => lit(Float.NaN)))
            .when(pmod(col("vec_id"), lit(7)) === 0,
              transform(col("embedding"), _ => lit(Float.PositiveInfinity)))
            .when(pmod(col("vec_id"), lit(11)) === 0,
              transform(col("embedding"), _ => lit(0.0f)))
            .when(pmod(col("vec_id"), lit(13)) === 0,
              concat(
                expr("array(CAST(NULL AS FLOAT))"),
                slice(col("embedding"), 2, 1000)))
            .otherwise(col("embedding")))
      mangled.write.mode("overwrite").parquet(s"${out.getAbsolutePath}/$t.parquet")
    }
    val dir = out.getAbsolutePath
    val failures = runAll(dir)
    assert(
      failures.isEmpty,
      s"${failures.size} queries throw on a NaN/Inf/zero/null-element-vector corpus:\n" +
        failures.map { case (n, m) => s"  $n -> $m" }.mkString("\n"))
    // the drop is visible at the boundary: the filtered view sees only the
    // finite nonzero vectors — every mangled id (multiples of 5/7/11/13)
    // is gone, everything else kept — and no NaN survives into a ranking
    // (q60's top-k would otherwise surface NaN cosines)
    val mangledPred =
      pmod(col("vec_id"), lit(5)) === 0 || pmod(col("vec_id"), lit(7)) === 0 ||
        pmod(col("vec_id"), lit(11)) === 0 || pmod(col("vec_id"), lit(13)) === 0
    val raw      = spark.read.parquet(s"$dir/embeddings.parquet")
    val expected = raw.filter(!mangledPred).count()
    val view     = Tables.embeddings(spark, dir)
    assert(view.count() == expected, s"filtered view ${view.count()} vs expected survivors $expected")
    assert(view.filter(mangledPred).count() == 0, "a degraded vector survived the ingestion filter")
    val knn = graft.operators.Similarity.knnBrute(spark, dir)
    val bad = knn.filter(org.apache.spark.sql.functions.isnan(col("cos")) || col("cos").isNull).count()
    assert(bad == 0, s"$bad NaN/NULL cosines reached the q60 top-k")
  }

  test("q129/q132 band models read null text as zero-token docs (driver-side scalar contract)") {
    val dir = cloneWithNulls(Map("documents" -> Seq("text")))
    // the r13 job-killers: a ROW_VALUE_IS_NULL here was a driver exception
    val sel = graft.operators.TrainingPrep.tokenBudgetSelect(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("sel_tokens"), org.apache.spark.sql.functions.sum("tokens"))
      .collect()(0)
    // all docs are zero-token: token sums are 0, nothing throws
    assert(sel.getLong(0) == 0L && sel.getLong(1) == 0L)
    val cur = graft.operators.TrainingPrep.curriculumOrder(spark, dir)
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    // every doc still gets a main-phase slot; the anneal replays the top slice
    assert(cur.filter(col("phase") === "main").count() == nDocs)
  }
}
