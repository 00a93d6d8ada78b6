package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Scale-robustness property the generator corpora can't exercise: every
  * registered query must EXECUTE (not necessarily return rows) on a corpus
  * whose tables are all empty. At production scale "empty" is routine — a
  * filter that eliminates everything, a new shard, a partition with no
  * survivors — and Spark's built-ins handle it; what this pins is the
  * custom paths: driver-side model collects (centroids, vocabularies,
  * density bands), 1-row-aggregate scalars feeding cost dispatch, and
  * guard `require`s, none of which may throw when their input vanishes.
  * Schemas are cloned from the sf0.001 corpus (limit 0), so the physical
  * types — including events.ts — match production exactly.
  */
class EmptyCorpusSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]", 4)
  private val srcDir = "/root/testdata/sf0.001"

  private lazy val emptyDir: String = {
    val out = Files.createTempDirectory("graft-empty").toFile
    out.deleteOnExit()
    val tables = Seq(
      "region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read
        .parquet(s"$srcDir/$t.parquet")
        .limit(0)
        .write
        .mode("overwrite")
        .parquet(s"${out.getAbsolutePath}/$t.parquet")
    }
    out.getAbsolutePath
  }

  test("every registered query executes on an all-empty corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, emptyDir).queryExecution.toRdd.count() // full plan, all columns
        None
      } catch {
        case e: Throwable =>
          Some(name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    assert(
      failures.isEmpty,
      s"${failures.size} queries throw on an empty corpus:\n" +
        failures.map { case (n, m) => s"  $n -> $m" }.mkString("\n"))
  }
}
