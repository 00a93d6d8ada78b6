package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 fixes: AsOfJoinExec UnsafeRow contract, BloomMightContain
  * canonical equality. */
class Round6OpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]", 4)

  private def asofFixture = {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l-a"),
      (1L, 20L, "l-b"),
      (2L, 5L, "l-d")
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 20L, "r-20"),
      (2L, 1L, "r-1")
    ).toDF("rk", "rt", "rv")
    (left, right)
  }

  test("q84: bare asof(...).collect() — no ProjectExec above the exec (UnsafeRow contract)") {
    // SparkPlan.getByteArrayRdd casts emitted rows to UnsafeRow; before the
    // per-partition UnsafeProjection this threw ClassCastException because
    // q84's registered query always had a Project on top.
    val (left, right) = asofFixture
    val rows = graft.plans.AsOfJoinNative
      .asof(left, right, "k", "rk", "t", "rt")
      .collect()
    assert(rows.length == 3)
    val matched = rows.filter(_.getAs[String]("rv") != null)
    assert(matched.map(r => (r.getAs[Long]("k"), r.getAs[String]("rv"))).toSet ==
      Set((1L, "r-20"), (2L, "r-1")))
  }

  test("q84: sort directly above the exec (UnsafeExternalRowSorter consumes the rows)") {
    val (left, right) = asofFixture
    val sorted = graft.plans.AsOfJoinNative
      .asof(left, right, "k", "rk", "t", "rt")
      .orderBy(col("k"), col("t"))
      .collect()
    assert(sorted.length == 3)
    assert(sorted.head.getAs[String]("lv") == "l-a" && sorted.head.isNullAt(sorted.head.fieldIndex("rv")))
  }

  test("q89: BloomMightContain canonical equality is content-based (two probes, same bytes)") {
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(100, 0.03)
    (1L to 50L).foreach(bf.putLong)
    val bytes1 = graft.plans.BloomExpressions.serialize(bf)
    val bytes2 = bytes1.clone() // distinct array instance, same content
    val child  = org.apache.spark.sql.GraftBridge.expression(col("x"))
    val e1 = graft.plans.BloomMightContain(child, bytes1)
    val e2 = graft.plans.BloomMightContain(child, bytes2)
    // reference-based case-class equality on Array[Byte] broke expression
    // canonicalization / subexpression elimination for duplicate probes
    assert(e1 == e2 && e1.hashCode == e2.hashCode)
    val bfOther = BloomFilter.create(100, 0.03)
    (51L to 99L).foreach(bfOther.putLong)
    val e3 = graft.plans.BloomMightContain(child, graft.plans.BloomExpressions.serialize(bfOther))
    assert(e1 != e3)
  }

  test("q107: survivors = corpus minus non-representative cluster members (min-id reps kept)") {
    // sf0.001 gate corpus: q38's clusters vs q107's accounting must agree
    val dir = "/root/testdata/sf0.001"
    val clusters = graft.operators.FuzzyDedup.dedupClusters(spark, dir).collect()
    val removedExpected = clusters.map(r => r.getAs[Long]("cluster_size") - 1).sum
    val surv = graft.operators.FuzzyDedup.dedupSurvivors(spark, dir).collect()
    val nDocs    = surv.map(_.getAs[Long]("n_docs")).sum
    val nRemoved = surv.map(_.getAs[Long]("n_removed")).sum
    val nKept    = surv.map(_.getAs[Long]("n_survivors")).sum
    assert(nRemoved == removedExpected, s"removed $nRemoved != clusters' non-reps $removedExpected")
    assert(nKept + nRemoved == nDocs, "survivor accounting does not close")
    assert(nRemoved > 0, "gate corpus planted no near-dups — accounting would be vacuous")
  }
}
