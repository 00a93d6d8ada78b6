package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Clustering

/** k-means (q70) semantics beyond oracle parity: recovery of well-separated
  * planted clusters, partitioning-invariance of the result, and the scale
  * shape of the assignment plan.
  */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]", 4)
  import spark.implicits._

  /** 3 tight clusters of 10 points around far-apart centers; vec_ids 0..2
    * land one per cluster so the lowest-vec_id init starts with one seed in
    * each true cluster. */
  private lazy val plantedDir: String = {
    val rnd     = new scala.util.Random(11)
    val dim     = 16
    val centers = Seq(0, 1, 2).map(c => Array.tabulate(dim)(d => if (d % 3 == c) 50.0 else -20.0))
    val rows = for {
      i <- 0 until 30
      c = i % 3 // interleaved: vec_id 0,1,2 are centers 0,1,2
    } yield (i.toLong, centers(c).map(v => (v + rnd.nextGaussian()).toFloat).toSeq, c)
    val out = Files.createTempDirectory("graft-kmeans").toFile
    out.deleteOnExit()
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", col("label").cast("int"))
      .write.mode("overwrite").parquet(s"${out.getAbsolutePath}/embeddings.parquet")
    out.getAbsolutePath
  }

  test("planted well-separated clusters are recovered with 100% purity") {
    val r = Clustering.kmeans(spark, plantedDir, k = 3, iters = 2).collect()
    assert(r.length == 3)
    r.foreach { row =>
      assert(row.getAs[Long]("n_points") == 10, s"cluster ${row.getAs[Long]("cid")} size")
      assert(
        row.getAs[Long]("n_majority") == 10,
        s"cluster ${row.getAs[Long]("cid")} is impure: ${row.getAs[Long]("n_majority")}/10"
      )
    }
    assert(r.map(_.getAs[Long]("majority_label")).toSet == Set(0L, 1L, 2L))
  }

  test("result is independent of input partitioning (integer arithmetic has no merge-order drift)") {
    def run(k: Int) = Clustering.kmeans(spark, plantedDir, k = k, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val a = run(3)
    // same data through a different partition count: the update's partial
    // sums merge in a different order; exact longs must not care
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      assert(run(3) == a)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  /** q119 fixture: 25 mutually-orthogonal axis vectors (cos 0 between
    * bases, so no accidental dup pairs), an exact-copy trio (11,25,26), an
    * exact-copy pair (12,27), and one near-dup pair (13,28) at cos ≈ 0.928
    * whose two members sit at DIFFERENT distances from their centroid —
    * the only pair that can distinguish keep-farthest from keep-closest. */
  private lazy val semDedupDir: String = {
    def axisVec(axis: Int, v: Double, axis2: Int = -1, v2: Double = 0.0): Seq[Double] = {
      val a = Array.fill(64)(0.0); a(axis) = v; if (axis2 >= 0) a(axis2) = v2; a.toSeq
    }
    val rows = (0 to 24).map(i => (i.toLong, axisVec(i, 8.0), i)) ++ Seq(
      (25L, axisVec(11, 8.0), 11),
      (26L, axisVec(11, 8.0), 11),
      (27L, axisVec(12, 8.0), 12),
      (28L, axisVec(13, 5.0, 40, 2.0), 13),
      (29L, axisVec(30, 8.0), 14)
    )
    val out = Files.createTempDirectory("graft-semdedup").toFile
    out.deleteOnExit()
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", col("label").cast("int"))
      .write.mode("overwrite").parquet(s"${out.getAbsolutePath}/embeddings.parquet")
    out.getAbsolutePath
  }

  test("q119: SemDeDup accounting matches an independent keep-first replay on the planted corpus") {
    val d = Clustering.assignments(spark, semDedupDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("d").toLong).toMap
    // independent application of the keep rule over the 5 pairs the fixture
    // plants (production code only supplies each vector's centroid distance)
    val pairs = Seq((11L, 25L), (11L, 26L), (25L, 26L), (12L, 27L), (13L, 28L))
    def loser(a: Long, b: Long): Long =
      if (d(a) > d(b)) b else if (d(b) > d(a)) a else math.max(a, b)
    val expRemoved = pairs.map { case (x, y) => loser(x, y) }.toSet
    assert(d(13L) != d(28L),
      "fixture degenerate: equal centroid distances cannot pin the keep-farthest rule")
    val out = Clustering.semDedup(spark, semDedupDir).collect()
    assert(out.map(_.getAs[Long]("n_points")).sum == 30L)
    assert(out.map(_.getAs[Long]("n_pairs")).sum == 5L,
      "planted dup pairs crossed a cluster boundary or an orthogonal-base cosine leaked")
    assert(out.map(_.getAs[Long]("n_removed")).sum == expRemoved.size.toLong)
    assert(out.map(_.getAs[Long]("removed_d_sum")).sum == expRemoved.toSeq.map(d).sum,
      "removed_d_sum diverges — the engine removed different points than the keep rule dictates")
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") == r.getAs[Long]("n_points") - r.getAs[Long]("n_removed"))
    }
  }

  test("q119: cluster sizes agree with q70 on the gate corpus; clean clusters report zero removal mass") {
    val dir  = "/root/testdata/sf0.001"
    val km   = Clustering.kmeans(spark, dir).collect()
      .map(r => r.getAs[Long]("cid") -> r.getAs[Long]("n_points")).toMap
    val out  = Clustering.semDedup(spark, dir).collect()
    assert(out.map(r => r.getAs[Long]("cid") -> r.getAs[Long]("n_points")).toMap == km,
      "q119 partitions the corpus differently from q70's final assignment")
    out.filter(_.getAs[Long]("n_removed") == 0L).foreach { r =>
      assert(r.getAs[Long]("removed_d_sum") == 0L && r.getAs[Long]("n_kept") == r.getAs[Long]("n_points"))
    }
  }

  test("native argmin equals the literal array_min formulation bit-for-bit") {
    import graft.plans.VectorExpressions
    // the pre-r9 formulation, kept here as the reference implementation
    def literalNearest(qv: org.apache.spark.sql.Column, centroids: Seq[(Long, Array[Double])]) = {
      val sqx = VectorExpressions.dotProduct(qv, qv)
      array_min(array(centroids.map { case (cid, qc) =>
        val qcLit = array(qc.toIndexedSeq.map(lit): _*)
        val qcSq  = qc.map(v => v * v).sum
        struct((sqx - lit(2.0) * VectorExpressions.dotProduct(qv, qcLit) + lit(qcSq)).as("d"), lit(cid).as("c"))
      }: _*))
    }
    val (emb, centroids) = Clustering.fit(spark, plantedDir, k = 3)
    def res(c: org.apache.spark.sql.Column) = emb
      .withColumn("best", c)
      .select(col("vec_id"), col("best.d"), col("best.c"))
      .collect().map(_.toSeq).toSet
    val native  = res(VectorExpressions.nearestCentroid(col("qv"), centroids))
    val literal = res(literalNearest(col("qv"), centroids))
    assert(native == literal, "native argmin diverged from the literal formulation")
    assert(native.nonEmpty)
  }

  test("NearestCentroid: content-based equality across separately-built instances") {
    import graft.plans.NearestCentroid
    import org.apache.spark.sql.GraftBridge
    // array fields would make the case-class equals/hashCode reference-
    // based: two independently-constructed copies of the same model would
    // never canonicalize equal, silently defeating Catalyst subexpression
    // elimination / exchange reuse for future multi-copy callers
    // share the child (Column wrappers carry non-comparable stack-trace
    // Origins); the fix target is the MODEL ARRAYS, freshly built per call
    val ch = GraftBridge.expression(col("qv"))
    def mk() = NearestCentroid(ch, Array(1L, 2L), Array(Array(1.0, 2.0), Array(3.0, 4.0)))
    val a = mk(); val b = mk()
    assert(a == b, "identical models built separately must compare equal")
    assert(a.hashCode == b.hashCode, "equal instances must hash equal")
    assert(a.semanticEquals(b), "Catalyst canonicalization must identify them")
    val c = NearestCentroid(ch, Array(1L, 2L), Array(Array(1.0, 2.0), Array(3.0, 5.0)))
    assert(a != c && !a.semanticEquals(c), "different matrices must not compare equal")
  }

  test("autoSemK: floored at gate scale, linear in the corpus past the floor") {
    import Clustering.{autoSemK, K, SemDedupTargetCluster}
    // every gate corpus (<= ~6k vectors) keeps the oracle-replayed K
    assert(autoSemK(600) == K && autoSemK(2000) == K && autoSemK(6000) == K)
    assert(autoSemK(SemDedupTargetCluster * K) == K)
    // past the floor K tracks n/target: pair volume n·target, not n²/K
    assert(autoSemK(SemDedupTargetCluster * K + 1) == K + 1)
    assert(autoSemK(60000) == 59)
    assert(autoSemK(200000) == 196)
  }

  test("SemDeDup-remedy K: assignment stays one map-side pass at K=300") {
    // the K range the literal tree could not reach (K x dim struct
    // literals melt codegen); the native expression's plan is O(1) in K
    import graft.plans.VectorExpressions
    val cents = (0 until 300).map(c => c.toLong -> Array.tabulate(16)(d => ((c * 31 + d) % 997).toDouble))
    val emb = Tables.embeddingsDistributed(spark, plantedDir)
      .select(col("vec_id"), Clustering.quantize(col("embedding")).as("qv"))
      .withColumn("best", VectorExpressions.nearestCentroid(col("qv"), cents))
    val plan = emb.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), "K=300 assignment must stay map-side")
    val rows = emb.select(col("best.c")).collect()
    assert(rows.nonEmpty && rows.forall(r => { val c = r.getLong(0); c >= 0 && c < 300 }))
  }

  test("assignment plan: no join, no cartesian product — centroids are literals") {
    val emb = Tables.embeddingsDistributed(spark, plantedDir)
      .select(col("vec_id"), Clustering.quantize(col("embedding")).as("qv"))
    // one assignment pass as the operator builds it (k literal centroid arrays)
    val cents = (0 until 3).map(c => c.toLong -> Array.fill(16)(c * 1000.0)).toSeq
    val m     = classOf[Clustering.type].getDeclaredMethods.find(_.getName == "nearest").get
    m.setAccessible(true)
    val best = m.invoke(Clustering, col("qv"), cents).asInstanceOf[org.apache.spark.sql.Column]
    val plan = emb.withColumn("best", best).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "assignment must not join against a centroid table")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Exchange"), "assignment is map-side only")
  }
}
