package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Measures q61's pair recall across hyperplane-bit settings against
  * PLANTED ground-truth near-dup pairs — the `autoLshBits` occupancy-128
  * claim ("fat-enough buckets keep ≥0.95-cosine neighbours colliding at
  * useful rates") pinned by measurement, not geometry.
  *
  * Fixture: 40,000 random unit vectors (64-dim gaussian, seeded) plus 400
  * planted near-duplicates — vector j perturbed by gaussian noise scaled
  * eps ∈ [0.1, 0.3], landing true cosines in ≈[0.95, 0.995]. The corpus
  * size pushes `autoLshBits` past its 8-bit floor (40,400 > 2^8·128 =
  * 32,768 → 9 bits), so the sweep covers the floor, the auto choice, and
  * two over-sharp settings. Ground truth is computed from the SAME
  * float-truncated vectors the parquet stores, with the engine's
  * sequential-fold double arithmetic.
  *
  * Expected shape (random-hyperplane LSH, OR of `LshBandFamilies`
  * independent tables): a pair at cosine c collides in one table with
  * probability p^bits (p = 1 − acos(c)/π) and survives the OR with
  * 1 − (1 − p^bits)^T — more bits = sharper buckets = lower recall (the
  * trade `autoLshBits` makes to keep candidate volume linear), and the
  * band families buy recall back at ×T linear cost instead of ×2^Δbits
  * occupancy growth. Recall-critical retrieval still uses q39's banded
  * multi-table shape or q60/q62's exact/IVF paths.
  */
class Q61RecallSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]", 4)

  private val nBase    = 40000
  private val nPlanted = 400
  private val dim      = 64

  /** Sequential-fold dot on the float-truncated values — bit-identical to
    * the engine's asDouble + dotProduct composition. */
  private def dotF(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def cos6(a: Array[Float], b: Array[Float]): Double = {
    val c = dotF(a, b) / (math.sqrt(dotF(a, a)) * math.sqrt(dotF(b, b)))
    BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  // fixture + ground truth, built once per suite
  private lazy val (dir, truePairs): (String, Set[(Long, Long)]) = {
    val rnd = new scala.util.Random(20260815L)
    def gaussian(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    def normalize(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = Array.fill(nBase)(normalize(gaussian()))
    val planted = (0 until nPlanted).map { j =>
      // UNIT noise direction: cos(v, normalize(v + eps*u)) ≈ 1/sqrt(1+eps²)
      // for u ⊥ v, so eps ∈ [0.1, 0.3] lands cosines ≈ [0.96, 0.995]
      val eps = 0.1 + 0.2 * j / nPlanted.toDouble
      val u   = normalize(gaussian())
      normalize(Array.tabulate(dim)(i => base(j)(i).toDouble + eps * u(i).toDouble))
    }
    val gt = (0 until nPlanted).collect {
      case j if cos6(base(j), planted(j)) >= 0.95 => (j.toLong, (nBase + j).toLong)
    }.toSet
    // sanity: the perturbation scale must actually land ≥0.95 pairs, or the
    // recall denominators measure nothing
    assert(gt.size >= nPlanted * 9 / 10, s"only ${gt.size}/$nPlanted planted pairs reached 0.95")

    val out = "/tmp/q61recall"
    import spark.implicits._
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      planted.zipWithIndex.map { case (v, j) => ((nBase + j).toLong, v) }
    rows.toSeq.toDF("vec_id", "embedding")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    (out, gt)
  }

  private def recallAt(bits: Int): Double = {
    val mined = Similarity
      .lshPairsAt(spark, dir, bits)
      .select("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    truePairs.count(mined.contains).toDouble / truePairs.size
  }

  test("autoLshBits leaves the floor on this corpus and keeps occupancy under target") {
    assert(Similarity.autoLshBits(nBase + nPlanted) == 9)
    assert((nBase + nPlanted) / math.pow(2, 9) <= Similarity.LshTargetOccupancy.toDouble)
  }

  test("dynamic oracle tracks the corpus past the floor; static stays the floor rendering") {
    val static = Similarity.oracles("q61_lsh_pairs")
    val render = Similarity.oraclesDynamic("q61_lsh_pairs")
    // gate corpus (sf0.001, under 2^8*128 rows): dynamic == static — the
    // committed floor rendering is exactly what the driver replays today
    assert(render(spark, "/root/testdata/sf0.001") == static)
    // this fixture (40,400 rows) pushes autoLshBits to 9: the rendered
    // oracle must carry the 9th plane term the static floor SQL lacks —
    // without this, Spark's corpus-sized bucketing silently diverges from
    // a fixed-bits oracle on any corpus past 32,768 vectors
    val dyn = render(spark, dir)
    assert(dyn != static)
    assert(dyn.contains(s"THEN ${1L << 8} ELSE") && !static.contains(s"THEN ${1L << 8} ELSE"))
  }

  test("pair recall at the auto-chosen bits is measured and useful") {
    val r = recallAt(9)
    info(f"recall at auto bits (9): $r%.3f over ${truePairs.size} planted pairs")
    // single-table recall measured 0.568 here (r11); the OR-of-two-bands
    // amplification lifts the seeded fixture to ≈0.8 — the 0.6 floor is
    // the r12 operating contract, with headroom for FP platform drift
    // without masking a real recall regression
    assert(r >= 0.6, f"recall at auto bits collapsed: $r%.3f")
  }

  test("recall declines monotonically with sharper buckets — the documented trade") {
    val r8  = recallAt(8)
    val r9  = recallAt(9)
    val r12 = recallAt(12)
    val r16 = recallAt(16)
    info(f"recall by bits: 8→$r8%.3f 9→$r9%.3f 12→$r12%.3f 16→$r16%.3f")
    assert(r8 >= r9 && r9 > r12 && r12 > r16,
      f"recall not monotone in bits: $r8%.3f/$r9%.3f/$r12%.3f/$r16%.3f")
    // the floor setting buys little recall over auto (one bit apart) while
    // carrying ~2x the candidate volume — the occupancy trade is real
    assert(r8 - r9 < 0.15, f"one extra bit cost ${r8 - r9}%.3f recall — model broken")
  }
}
