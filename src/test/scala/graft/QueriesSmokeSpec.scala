package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must execute against sf0.001 and (where it
  * aggregates the whole table) return rows. Catches runtime plan errors
  * before the driver's verify pass does.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[8]", 8)
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or a documented reason") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == SparkEntry.noOracle, s"queries without oracle SQL: $missing")
  }

  test("approx_count_distinct is within its error bound") {
    val row = SparkEntry.queries("q14_approx_distinct")(spark, dir).head()
    val exact = graft.queries.Analytics.distinctStats(spark, dir).head()
    val approxParts = row.getAs[Long]("approx_parts").toDouble
    val exactParts  = exact.getAs[Long]("n_parts").toDouble
    assert(math.abs(approxParts - exactParts) / exactParts < 0.1)
  }

  test("q46 bin ids are chunk-width invariant (two-phase offset composition)") {
    import org.apache.spark.sql.functions.col
    def rows(chunk: Long) =
      graft.operators.TrainingPrep
        .sequencePacking(spark, dir, chunk)
        .orderBy(col("doc_id"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
    // chunk 7 forces many chunks per language at sf0.001 — composition of
    // per-chunk running sums + offsets must equal the single-window result
    assert(rows(7L) == rows(1L << 30))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes on sf0.001") {
      val df = fn(spark, dir)
      val n  = df.count()
      assert(n >= 0)
    }
  }
}
