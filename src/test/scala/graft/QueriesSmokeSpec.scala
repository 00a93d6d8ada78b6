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

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes on sf0.001") {
      val df = fn(spark, dir)
      val n  = df.count()
      assert(n >= 0)
    }
  }
}
