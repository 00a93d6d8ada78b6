package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit, pmod, transform, when}
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 close probe (intelligence, not a contract yet): ALL-ZERO
  * embedding vectors. A zero vector is FINITE — it survives the r15
  * non-finite ingestion filter — but its L2 norm is 0, and every cosine
  * in the engine divides by a norm product (`dot/(na*nb)`), which under
  * ANSI mode is a DIVIDE_BY_ZERO job killer the moment a zero vector
  * meets a pair scan or a top-k. Zero vectors are routine production
  * shapes: a zeroed-out row from a failed encoder flush, padding rows
  * from a batch writer, masked/redacted embeddings.
  *
  * This spec RECORDS which queries throw (printed, compared against the
  * recorded set below) rather than asserting zero failures — the fix
  * (probably: drop zero-norm vectors at the same ingestion boundary, the
  * P2 contract) belongs at round-16 start, where a full stamp window can
  * follow it (the r13→r14 null-probe convention).
  */
class ZeroVectorProbeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]", 4)
  private val srcDir = "/root/testdata/sf0.001"

  private val tables = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  test("zero-vector corpus: failure set is recorded and does not grow") {
    val out = Files.createTempDirectory("graft-zerovec").toFile
    out.deleteOnExit()
    tables.foreach { t =>
      val df = spark.read.parquet(s"$srcDir/$t.parquet")
      val mangled =
        if (t != "embeddings") df
        else df.withColumn(
          "embedding",
          when(pmod(col("vec_id"), lit(5)) === 0,
            transform(col("embedding"), _ => lit(0.0f)))
            .otherwise(col("embedding")))
      mangled.write.mode("overwrite").parquet(s"${out.getAbsolutePath}/$t.parquet")
    }
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, out.getAbsolutePath).queryExecution.toRdd.count()
        None
      } catch {
        case e: Throwable =>
          Some(name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    failures.foreach { case (n, m) => info(s"THROWS $n -> $m") }
    // the recorded r15 failure set — r16's fix shrinks this to empty; any
    // GROWTH is a regression this spec catches in the meantime
    val recorded = Set(
      "q37_dedup_embedding", "q39_dedup_embedding_lsh", "q60_knn_brute",
      "q61_lsh_pairs", "q62_ivf_knn", "q76_embedding_clusters",
      "q111_ann_recall", "q119_semdedup")
    val unexpected = failures.map(_._1).filterNot(recorded)
    assert(
      unexpected.isEmpty,
      s"zero-vector failure set GREW beyond the recorded r15 probe:\n" +
        failures.map { case (n, m) => s"  $n -> $m" }.mkString("\n"))
  }
}
