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
