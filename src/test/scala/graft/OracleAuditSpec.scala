package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.Analytics

/** Adversarial audit of the single-row gate queries (r11 verdict #5): a
  * 1-row hash match against the oracle is only as strong as what the row's
  * values depend on, so each of q02/q09/q19 gets a planted fixture where
  * every predicate BOUNDARY has a row just inside and just outside, and
  * the expected aggregate is hand-computed. A comparison defect (>= vs >,
  * < vs <=, AND/OR grouping, distinct vs plain count) flips a planted
  * boundary row and fails the exact expectation — the regression class a
  * corpus-level 1-row hash can mask when the corpus happens to have no
  * boundary-sitting rows.
  *
  * The other seven low-row gate queries carry their discriminating specs
  * elsewhere (cited per query in COVERAGE.md §degenerate-gate-row audit):
  * q37/q39/q76 FuzzyDedupSpec planted/boundary fixtures, q61
  * Q61RecallSpec, q14 QueriesSmokeSpec error-bound, q67 PropertySpec
  * sketch guarantees, q92 Round5OpsSpec order constraints.
  */
class OracleAuditSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]", 4)
  import spark.implicits._

  private def stage(dir: java.nio.file.Path, table: String, df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"$dir/$table.parquet")

  test("q02 filter boundaries: every >=/</between edge has an in-row and an out-row") {
    val d = java.nio.file.Files.createTempDirectory("graft_q02_audit")
    // filter: shipdate in [1996-01-01, 1997-01-01), discount in [0.04, 0.07], qty < 24
    val li = Seq(
      // (shipdate, qty, price, discount) — IN rows (revenue = price*discount)
      ("1996-06-01", 10.0, 100.0, 0.05), // mid-range                    -> 5.0
      ("1996-01-01", 23.0, 200.0, 0.04), // every lower/upper boundary IN -> 8.0
      ("1996-12-31", 1.0, 100.0, 0.07),  // discount upper boundary IN   -> 7.0
      // OUT rows — each flips in under a single comparison defect
      ("1995-12-31", 10.0, 999.0, 0.05), // before the window
      ("1997-01-01", 10.0, 999.0, 0.05), // window end is EXCLUSIVE
      ("1996-06-01", 24.0, 999.0, 0.05), // qty < 24 is strict
      ("1996-06-01", 10.0, 999.0, 0.03), // discount below band
      ("1996-06-01", 10.0, 999.0, 0.08)  // discount above band
    ).toDF("ship", "l_quantity", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", to_timestamp(col("ship")))
      .drop("ship")
    stage(d, "lineitem", li)
    val row = Analytics.filterRevenue(spark, d.toString).head()
    assert(row.getAs[Long]("n_rows") == 3L, s"boundary row mis-classified: $row")
    assert(row.getAs[Double]("revenue") == 20.0, s"revenue off: $row")
  }

  test("q09 distinct stats: planted duplicates separate countDistinct from count") {
    val d = java.nio.file.Files.createTempDirectory("graft_q09_audit")
    val li = Seq(
      // (partkey, suppkey, orderkey) — dups planted per column so ANY
      // distinct-vs-plain defect shifts exactly one output column
      (1L, 10L, 100L),
      (1L, 10L, 200L),
      (2L, 10L, 200L),
      (3L, 20L, 300L)
    ).toDF("l_partkey", "l_suppkey", "l_orderkey")
    stage(d, "lineitem", li)
    val row = Analytics.distinctStats(spark, d.toString).head()
    assert(row.getAs[Long]("n_parts") == 3L && row.getAs[Long]("n_supps") == 2L &&
      row.getAs[Long]("n_orders") == 3L && row.getAs[Long]("n_rows") == 4L,
      s"distinct stats diverged from the planted cardinalities: $row")
  }

  test("q19 OR-of-ANDs: each branch boundary and the AND-grouping have discriminating rows") {
    val d = java.nio.file.Files.createTempDirectory("graft_q19_audit")
    val part = Seq(
      // (p_partkey, p_brand, p_size)
      (1L, "Brand#1", 15),  // branch-1 size upper boundary (between is inclusive)
      (2L, "Brand#2", 10),  // branch-2 size lower boundary
      (3L, "Brand#9", 41),  // branch-3 size > 40
      (4L, "Brand#1", 16),  // branch-1 fails on size; must NOT leak via branch 3
      (5L, "Brand#9", 40)   // branch-3 fails: size > 40 is strict
    ).toDF("p_partkey", "p_brand", "p_size")
    val li = Seq(
      // (partkey, qty, price, discount) — revenue = price * (1 - discount)
      (1L, 10.0, 100.0, 0.0), // branch 1 qty lower boundary IN  -> 100
      (1L, 9.0, 999.0, 0.0),  // branch 1 qty just OUT
      (2L, 19.0, 200.0, 0.5), // branch 2 qty just under 20 IN   -> 100
      (2L, 20.0, 999.0, 0.0), // branch 2 qty < 20 is strict
      (3L, 40.0, 300.0, 0.0), // branch 3 qty lower boundary IN  -> 300
      (3L, 39.0, 999.0, 0.0), // branch 3 qty just OUT
      // the AND-grouping discriminator: qty >= 40 qualifies branch 3's
      // quantity arm and size 16 qualifies nothing — under broken
      // OR/AND precedence this row leaks in
      (4L, 50.0, 999.0, 0.0),
      (5L, 50.0, 999.0, 0.0) // size 40 is not > 40
    ).toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    stage(d, "part", part)
    stage(d, "lineitem", li)
    val row = Analytics.orOfAnds(spark, d.toString).head()
    assert(row.getAs[Long]("n_rows") == 3L, s"branch/boundary row mis-classified: $row")
    assert(row.getAs[Double]("revenue") == 500.0, s"revenue off: $row")
  }
}
