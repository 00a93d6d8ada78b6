package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit, pmod, transform, when}
import org.scalatest.funsuite.AnyFunSuite

/** Zero-norm embedding vector CONTRACT (flipped from the r15 recording
  * probe): ALL-ZERO vectors are finite but have L2 norm 0, and before r16
  * eight cosine paths threw ANSI DIVIDE_BY_ZERO the moment one met a pair
  * scan or a top-k (the recorded r15 set: q37/q39/q60/q61/q62/q76/q111/
  * q119). Zero vectors are routine production shapes — a zeroed-out row
  * from a failed encoder flush, padding rows from a batch writer,
  * masked/redacted embeddings — so the engine now:
  *
  *  1. DROPS them at the ingestion boundary (`Tables.finiteVectors` —
  *     cosine against a zero vector is undefined, so the P2 drop loses no
  *     ranking semantics), and
  *  2. guards every cosine division (`Similarity.cosine` —
  *     `dot / nullif(norm·norm, 0)`) so a zero-norm vector reaching any
  *     FUTURE entry point degrades to a NULL score, never a task failure.
  *
  * This spec asserts the failure set is EMPTY across the whole registry on
  * a zero-vector-bearing corpus, and that no zero-norm vector wins a q60
  * top-k slot.
  */
class ZeroVectorProbeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]", 4)
  private val srcDir = "/root/testdata/sf0.001"

  private val tables = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private lazy val zeroVecDir: String = {
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
    out.getAbsolutePath
  }

  test("zero-vector corpus: every registered query executes (failure set EMPTY)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, zeroVecDir).queryExecution.toRdd.count()
        None
      } catch {
        case e: Throwable =>
          Some(name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    assert(
      failures.isEmpty,
      s"${failures.size} queries throw on a zero-vector corpus:\n" +
        failures.map { case (n, m) => s"  $n -> $m" }.mkString("\n"))
  }

  test("no zero-norm vector wins a q60 top-k slot (and no null cosine leaks)") {
    val top = SparkEntry.queries("q60_knn_brute")(spark, zeroVecDir)
    // ingestion drops vec_id % 5 == 0 rows (the mangled zero vectors), so
    // none may appear as a query OR a neighbour, and every surfaced cosine
    // is a real (non-null) score
    val zeroWinners = top.filter(col("vec_id") % 5 === 0 || col("q_id") % 5 === 0).count()
    assert(zeroWinners == 0, s"$zeroWinners zero-norm vectors reached the q60 top-k")
    val nullCos = top.filter(col("cos").isNull).count()
    assert(nullCos == 0, s"$nullCos NULL cosines leaked into the q60 top-k")
    assert(top.count() > 0, "q60 returned no rows on the degraded corpus")
  }
}
