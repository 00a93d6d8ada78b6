package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Tables}
import graft.sources.Layout

/** PERSISTED dedup index (q106) — the cross-run production shape of q58's
  * incremental dedup. q58 screens a delta batch against a base corpus it
  * re-fingerprints inside the SAME job; a continuous corpus-building
  * pipeline cannot afford that — the base is re-read and re-hashed on every
  * arriving batch. This operator persists the base's dedup state ONCE as
  * three bucketed tables and lets every subsequent delta batch probe them:
  *
  *  - `<prefix>_fp`       (fingerprint)                     bucketed by fingerprint
  *  - `<prefix>_bands`    (band, doc_id)                    bucketed by band
  *  - `<prefix>_shingles` (doc_id, fingerprint, shingles)   bucketed by doc_id
  *
  * Bucketing is the scale story: the three probe joins (exact fingerprint,
  * band candidates, shingle verify) each hit an index table PRE-BUCKETED on
  * its join key, so the INDEX side of every join is exchange-free — only
  * the delta batch (tiny, by the incremental premise) shuffles, and the
  * corpus-sized shingle table is read only for rows matching band
  * candidates. Per-probe cost is O(delta), independent of how many batches
  * preceded it. Pinned by DedupIndexSpec: bucketed band/fp scans aggregate
  * with no exchange, and the probe result equals q58 row-for-row on the
  * gate split.
  *
  * Band occupancy is capped at BUILD time over the base alone
  * ([[FuzzyDedup.boundedBands]]); the delta side probes uncapped. This
  * differs from q58 — which caps the base+delta union — only when a bucket
  * crosses [[FuzzyDedup.MaxBandOccupancy]] exactly at the boundary, a
  * degenerate mega-cluster case that is exact-dedup's territory either way.
  * The q106 oracle replays the base-only cap, so the gate checks the
  * declared semantics.
  *
  * Accepted-doc MAINTENANCE is [[probeAndAbsorb]] (q112): survivors of each
  * batch are appended to the three tables with the same bucket spec, so
  * later batches dedup against base ∪ earlier survivors. [[build]] is the
  * rebuild primitive for periodic compaction (re-enforcing the global band
  * cap). Streaming: [[probeBatch]] is the `foreachBatch` sink.
  *
  * Schema migration: the shingle table gained the `fingerprint` column (the
  * one-text-scan layout). An index persisted by the earlier 2-column layout
  * still PROBES correctly (probe selects columns by name), but absorb
  * appends the 3-column shape — [[probeAndAbsorb]] detects the old layout
  * UP FRONT (a schema lookup before any probe work) and fails with the
  * migration instruction: run [[build]] (the normal compaction) once to
  * migrate before resuming maintenance. Both halves are pinned by
  * DedupIndexSpec's old-layout test.
  */
object DedupIndex {

  val IndexPrefix = "graft_dedup_idx"
  /** Bucket-count FLOOR: matches the engine-wide shuffle parallelism so
    * bucketed scans line up with exchange partitioning at test scale. The
    * actual count is sized per-build by [[autoNumBuckets]]; every gate
    * corpus sits far under one [[TargetRowsPerBucket]] × this floor, so
    * the oracles see exactly 32. */
  val NumBuckets = 32

  /** [[autoNumBuckets]]'s target: rows of index state per bucket. Sized so
    * a bucket's shingle file stays a comfortable task unit (~250k docs ×
    * ~a few hundred bytes of fingerprint+shingle state ≈ low tens of MB
    * compressed) — small enough to scan/sort in one task, large enough
    * that file count, not file size, never dominates. */
  val TargetRowsPerBucket = 1L << 18
  /** Cap: 4096 write tasks per build/absorb is ample parallelism for a
    * 1000-executor cluster, and ~4k files per index table stays trivially
    * listable. Beyond ~10^9 docs, bucket files grow past the target —
    * that is the scale where the index would shard by corpus partition
    * (date/source) ABOVE the bucketing, not grow the bucket count. */
  val MaxBuckets = 4096

  /** Production bucket sizing, the q39 `autoEmbBits` discipline applied to
    * the index: the smallest power of two giving ≤ [[TargetRowsPerBucket]]
    * rows per bucket, clamped to [[[NumBuckets]], [[MaxBuckets]]].
    * Power-of-two keeps bucket counts across generations of the index
    * divisible into each other (an old 512-bucket table and a rebuilt
    * 1024-bucket one still co-partition pairwise-cleanly for a migration
    * join). Build writes the chosen count into the catalog's bucket spec;
    * probe needs no number at all (bucketed scans carry their
    * outputPartitioning); absorb reads the spec BACK from the catalog
    * ([[tableBuckets]]) so appends keep validating against what the table
    * actually is, never against what today's sizing rule would pick. */
  def autoNumBuckets(rows: Long): Int = {
    val needed = math.max(1L, (rows + TargetRowsPerBucket - 1) / TargetRowsPerBucket)
    val pow2   = java.lang.Long.highestOneBit(needed)
    val up     = if (pow2 == needed) needed else pow2 << 1
    math.min(MaxBuckets.toLong, math.max(NumBuckets.toLong, up)).toInt
  }

  /** The PERSISTED bucket count of an index table — absorb's append spec
    * must match the catalog entry (Spark validates and fails loudly on
    * drift), so it is read from the catalog, not recomputed. */
  private def tableBuckets(s: SparkSession, table: String): Int =
    org.apache.spark.sql.GraftBridge.bucketSpec(s, table).map(_._1).getOrElse(NumBuckets)

  /** ONE text projection computing both dedup signals — every index path
    * ([[build]], [[probe]], [[probeAndAbsorb]]) materializes this once and
    * derives fingerprints, band keys and verify shingles from it, so text
    * is read and tokenized exactly once per corpus/batch pass. Rows with
    * empty shingle arrays stay (their fingerprint still belongs in the
    * exact-dup table); they never reach the band table, so verify-join
    * semantics are unchanged. */
  private def hashed(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(col("text")).as("fingerprint"),
      Dedup.shingles(col("text")).as("shingles"))

  /** See [[graft.sources.Layout.resetTable]] — shared with q124's
    * co-bucketed join build. */
  private def reset(s: SparkSession, table: String): Unit = Layout.resetTable(s, table)

  /** Build (or rebuild) the persisted index from the base corpus.
    *
    * The corpus TEXT is scanned and tokenized exactly ONCE: the shingle
    * table persists (doc_id, fingerprint, shingles) from a single
    * projection, then BOTH derived tables come from read-backs of it —
    * fingerprints as a skinny column scan, bands as the (doc_id, long[])
    * scan through the band-key expression. At corpus scale reading and
    * hashing raw text is the dominant build cost; one pass per rebuild is
    * the whole point of the pay-once index.
    *
    * `numBuckets` ≤ 0 (the default) sizes buckets from the corpus row
    * count via [[autoNumBuckets]] — the count is a doc_id-only job
    * (column-pruned, no text IO), marginal next to the text pass the
    * build pays anyway. */
  /** Run independent write jobs concurrently (guide §2.6: actions are only
    * sequential because the driver calls them sequentially). Fresh threads
    * per call — not a shared pool — so Spark's InheritableThreadLocal job
    * properties (description/group) are captured from THIS caller at
    * thread creation, keeping bench/UI attribution correct. First failure
    * rethrows after all tasks settle (no orphaned in-flight write), with
    * any sibling failures attached as suppressed exceptions. Failure-path
    * footprint note: because all siblings run to completion before the
    * rethrow, a failed task can leave MORE sibling tables mutated than the
    * sequential form would have (e.g. shingles+bands appended while the fp
    * append failed) — the same partial-index residue class as the
    * documented mid-absorb crash window, healed by [[build]] compaction
    * and visible via [[auditResidue]].
    *
    * Interrupt-safe: an interrupt of the CALLING thread mid-barrier must
    * not return control while write jobs are still in flight (the
    * streaming sink's commit marker relies on all-writes-complete-before-
    * return), so the joins are retried until every worker settles and the
    * interrupt is re-delivered via the thread's interrupt flag. */
  private[graft] def inParallel(tasks: (() => Unit)*): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = tasks.map { t =>
      new Thread(() => try t() catch { case e: Throwable => errs.add(e); () })
    }
    ts.foreach(_.start())
    var interrupted = false
    ts.foreach { th =>
      var joined = false
      while (!joined)
        try { th.join(); joined = true }
        catch { case _: InterruptedException => interrupted = true }
    }
    if (interrupted) Thread.currentThread().interrupt()
    if (!errs.isEmpty) {
      val it    = errs.iterator()
      val first = it.next()
      while (it.hasNext) first.addSuppressed(it.next())
      throw first
    }
  }

  def build(docs: DataFrame, prefix: String = IndexPrefix, numBuckets: Int = 0): Unit = {
    val s = docs.sparkSession
    val n = if (numBuckets > 0) numBuckets else autoNumBuckets(docs.count())
    Seq(s"${prefix}_fp", s"${prefix}_shingles", s"${prefix}_bands").foreach(reset(s, _))
    Layout.writeBucketed(hashed(docs), s"${prefix}_shingles", "doc_id", n)
    val shTable = s.table(s"${prefix}_shingles")
    // Pre-partition on the band key AT THE BUCKET COUNT before the
    // occupancy window (r18, guide §2): the window needs a band-clustered
    // exchange anyway, and HashPartitioning(band, n) satisfies it — so
    // this ONE exchange serves the window AND the bucketed layout, where
    // the previous shape paid the window's shuffle-partitions exchange
    // plus writeBucketed's second repartition back-to-back. Same for the
    // fp distinct: aggregate + layout share one fingerprint exchange.
    val bands = FuzzyDedup.boundedBands(
      shTable
        .filter(size(col("shingles")) > 0)
        .select(
          col("doc_id"),
          explode(graft.plans.TextHashExpressions.minhashBandKeys(col("shingles"))).as("band")
        )
        .repartition(n, col("band")),
      "band",
      FuzzyDedup.MaxBandOccupancy
    )
    // fp and bands both derive from the persisted shingle table and write
    // to DIFFERENT tables — independent jobs, overlapped (r17: 0.72 s +
    // 1.06 s sequential → max of the two; the tail tasks of one write
    // back-fill cores the other frees)
    inParallel(
      () =>
        Layout.writeBucketedAligned(
          shTable.select("fingerprint").repartition(n, col("fingerprint")).distinct(),
          s"${prefix}_fp", "fingerprint", n),
      () =>
        Layout.writeBucketedAligned(bands.select("band", "doc_id"), s"${prefix}_bands", "band", n)
    )
  }

  /** Screen a delta batch against the persisted index: q58's output shape —
    * one row per delta doc with (exact_dup, n_near, near_match, keep).
    * The batch text is read ONCE (the [[hashed]] checkpoint); the three
    * probe joins all derive from the skinny materialized frame. */
  def probe(s: SparkSession, delta: DataFrame, prefix: String = IndexPrefix): DataFrame =
    probeHashed(s, hashed(delta).localCheckpoint(), prefix)

  /** [[probe]] over an already-materialized [[hashed]] frame — shared with
    * [[probeAndAbsorb]], whose absorb appends reuse the same checkpoint. */
  private def probeHashed(s: SparkSession, h: DataFrame, prefix: String): DataFrame = {
    val fpIdx   = s.table(s"${prefix}_fp")
    val bandIdx = s.table(s"${prefix}_bands")
    val shIdx   = s.table(s"${prefix}_shingles")
    val exactDup = h
      .select("doc_id", "fingerprint")
      .join(fpIdx.withColumn("e", lit(1L)), Seq("fingerprint"), "left")
      .select(col("doc_id"), coalesce(col("e"), lit(0L)).as("exact_dup"))
    val dSh = h.filter(size(col("shingles")) > 0).select("doc_id", "shingles")
    val cand = dSh
      .select(
        col("doc_id").as("d_id"),
        explode(graft.plans.TextHashExpressions.minhashBandKeys(col("shingles"))).as("band")
      )
      .join(bandIdx.select(col("band"), col("doc_id").as("b_id")), Seq("band"))
      .select("d_id", "b_id")
      .distinct()
    val near = cand
      .join(dSh.select(col("doc_id").as("d_id"), col("shingles").as("sh_d")), Seq("d_id"))
      .join(shIdx.select(col("doc_id").as("b_id"), col("shingles").as("sh_b")), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("sh_d"), col("sh_b"))).cast(LongType))
      .withColumn("union_n", (size(col("sh_d")) + size(col("sh_b"))).cast(LongType) - col("inter"))
      .filter(round(col("inter") / col("union_n"), 6) >= 0.3)
      .groupBy(col("d_id").as("doc_id"))
      .agg(count(lit(1)).as("n_near"), min(col("b_id")).as("near_match"))
    exactDup
      .join(near, Seq("doc_id"), "left")
      .withColumn("n_near", coalesce(col("n_near"), lit(0L)))
      .withColumn("near_match", coalesce(col("near_match"), lit(-1L)))
      .withColumn("keep", (col("exact_dup") === 0 && col("n_near") === 0).cast(LongType))
      .select("doc_id", "exact_dup", "n_near", "near_match", "keep")
  }

  /** Probe the batch, ABSORB its survivors into the index, return the
    * verdicts — the full incremental-dedup maintenance loop (q112): after
    * this call, later batches dedup against base ∪ earlier survivors, so
    * the index stays current without a rebuild. Only keep==1 docs enter
    * the index (a dup's fingerprint is already there by definition; adding
    * near-dups would make the index grow with the DUP mass instead of the
    * novel mass). Appends go through [[graft.sources.Layout.appendBucketed]]
    * — same bucket spec, so probe joins stay exchange-free on the index
    * side. The absorb batch's band entries are occupancy-capped within the
    * batch alone; the global cap is re-enforced by the periodic [[build]]
    * compaction, exactly like segment merges in any LSM-ish index.
    *
    * Correctness note: verdicts are materialized (`localCheckpoint`)
    * BEFORE the index tables are mutated — `probe` is lazy, and computing
    * it after the append would screen the batch against itself. */
  def probeAndAbsorb(s: SparkSession, batch: DataFrame, prefix: String = IndexPrefix): DataFrame = {
    // Detect a pre-fingerprint (2-column) shingle table UP FRONT — without
    // this, the mismatch surfaces as an AnalysisException on the absorb
    // append, mid-stream, AFTER probe work was spent. A catalog schema
    // lookup, not a scan.
    val shCols = s.table(s"${prefix}_shingles").schema.fieldNames
    require(
      shCols.contains("fingerprint"),
      s"${prefix}_shingles has the pre-fingerprint layout (${shCols.mkString(", ")}): " +
        "probe still works against it, but absorb appends the 3-column shape — " +
        "run DedupIndex.build() once (the normal compaction) to migrate before resuming maintenance"
    )
    // ONE text pass over the whole batch: probe joins AND the absorb
    // appends all derive from this checkpoint — the batch text is never
    // re-read after this line
    val h        = hashed(batch).localCheckpoint()
    val verdicts = probeHashed(s, h, prefix).localCheckpoint()
    // survivor-sized: both checkpointed sides, three consumers below
    val kept = h.join(verdicts.filter(col("keep") === 1L).select("doc_id"), Seq("doc_id"))
    // same exchange-sharing shape as build(): pre-partition at the
    // PERSISTED bucket count so the occupancy window / fp distinct and
    // the bucketed append share one exchange per table (r18)
    val nBands = tableBuckets(s, s"${prefix}_bands")
    val nFp    = tableBuckets(s, s"${prefix}_fp")
    val bands = FuzzyDedup.boundedBands(
      kept
        .filter(size(col("shingles")) > 0)
        .select(
          col("doc_id"),
          explode(graft.plans.TextHashExpressions.minhashBandKeys(col("shingles"))).as("band")
        )
        .repartition(nBands, col("band")),
      "band",
      FuzzyDedup.MaxBandOccupancy
    )
    // append with the PERSISTED spec of each table (whatever build() sized),
    // read from the catalog — Spark then re-validates on the write. The
    // three appends derive from the SAME checkpointed batch frame and
    // target three DIFFERENT tables — independent jobs, overlapped
    // (guide §2.6, r17); all complete before this returns, so callers
    // (incl. the streaming sink's commit-marker write) see the same
    // all-appends-then-return contract as the sequential form.
    inParallel(
      () =>
        Layout.appendBucketedAligned(
          kept.select("fingerprint").repartition(nFp, col("fingerprint")).distinct(),
          s"${prefix}_fp", "fingerprint", nFp),
      () =>
        Layout.appendBucketed(kept, s"${prefix}_shingles", "doc_id", tableBuckets(s, s"${prefix}_shingles")),
      () =>
        Layout.appendBucketedAligned(
          bands.select("band", "doc_id"),
          s"${prefix}_bands", "band", nBands)
    )
    verdicts
  }

  /** q112: two sequential deltas through the maintained index — batch 1 is
    * probed and absorbed, batch 2 is probed against base ∪ batch-1
    * survivors. The registered proof that the index UPDATES, not just
    * screens: a batch-2 doc whose only duplicate lives in batch 1 is
    * caught here and missed by the rebuild-blind q106 shape. */
  def q112(s: SparkSession, dir: String): DataFrame = {
    val prefix = s"${IndexPrefix}_inc"
    val docs   = Tables.documentsDistributed(s, dir)
    val m      = col("doc_id") % FuzzyDedup.DeltaMod
    build(docs.filter(m < 8), prefix)
    val v1 = probeAndAbsorb(s, docs.filter(m === 8), prefix).withColumn("batch", lit(1L))
    val v2 = probe(s, docs.filter(m === 9), prefix).withColumn("batch", lit(2L))
    v1.unionByName(v2)
      .select("batch", "doc_id", "exact_dup", "n_near", "near_match", "keep")
  }

  /** Streaming sink for [[probe]] — the `foreachBatch` production shape:
    * dedup state lives in the bucketed index tables (built once, refreshed
    * offline), each micro-batch pays an O(delta) probe and appends its
    * per-doc verdicts (tagged with the batch id) to `<prefix>_verdicts`.
    * Probe semantics are delta-vs-INDEX only (q58's asymmetric contract),
    * so each row's verdict is independent of its micro-batch boundaries —
    * the union over any batching equals one batch probe over the union,
    * which is exactly what StreamingSpec pins. `foreachBatch` is
    * at-least-once under retry; verdicts are deterministic per doc, so
    * replays duplicate rows rather than corrupt them — downstream readers
    * dedup on (doc_id) as with any at-least-once sink. */
  def probeBatch(prefix: String = IndexPrefix)(batch: DataFrame, batchId: Long): Unit =
    probe(batch.sparkSession, batch, prefix)
      .withColumn("batch_id", lit(batchId))
      .write
      .mode("append")
      .format("parquet")
      .saveAsTable(s"${prefix}_verdicts")

  /** Streaming sink with ABSORB — q112's maintenance loop as a
    * `foreachBatch` stream, made idempotent under replay by the standard
    * batchId pattern: the verdict-table append (tagged with the batch id)
    * is the batch's COMMIT MARKER, written after the absorb. `foreachBatch`
    * is at-least-once — a kill between the sink completing and the
    * checkpoint commit replays the same (batchId, data) on restart — and a
    * replayed batch must NOT be re-probed: its survivors are already in
    * the index, so a fresh probe would screen the batch against itself
    * (every survivor flagged as its own duplicate) and the absorb would
    * run twice. Seeing its marker, the replay is a no-op.
    *
    * Residual at-least-once window, documented not hidden: a kill strictly
    * BETWEEN the three index appends and the marker write leaves that
    * batch's survivors in the index without verdicts; the restart re-probes
    * (self-screen for just that batch) — the same class of residue as any
    * non-transactional multi-table append, healed by the periodic
    * [[build]] compaction exactly like LSM segment repair. The recovery
    * spec exercises the covered window (kill after sink, before
    * checkpoint commit), which is what an orderly kill-and-restart hits. */
  /** Per-JVM committed-batch high-water mark, keyed by (warehouse dir,
    * verdict table) — table name alone would let one JVM hosting two
    * sessions with DIFFERENT warehouses (each with its own
    * `<prefix>_verdicts`) share a mark and silently drop the other
    * stream's batches. Within a run `foreachBatch` ids are monotone and
    * never repeat, so a replay can only be the FIRST batch after a
    * (re)start — the marker TABLE only needs probing when this JVM has no
    * mark yet; afterwards the in-memory mark answers "not a replay"
    * without scanning the ever-growing verdict table on every trigger. */
  private val committedHighWater = scala.collection.concurrent.TrieMap.empty[String, Long]

  private def hwKey(s: SparkSession, vt: String): String =
    s"${s.conf.get("spark.sql.warehouse.dir", "")}::$vt"

  /** The replay state machine, keyed so marks never cross warehouses —
    * extracted (and exercised by DedupIndexSpec's two-warehouse test,
    * which a single test JVM cannot stage live: `spark.sql.warehouse.dir`
    * is a STATIC conf, one value per SparkContext, so the two-sessions-
    * different-warehouses scenario only arises across sequential contexts
    * — precisely when the per-JVM map would have carried a stale mark
    * under table-name-only keying). `seenInTable` is by-name: the verdict
    * table is only scanned when this JVM holds no trusted mark. */
  private[graft] def replayDecision(
      key: String,
      batchId: Long,
      tableExists: Boolean,
      seenInTable: () => Boolean): Boolean =
    committedHighWater.get(key) match {
      case Some(hw) if tableExists => batchId <= hw
      case _ =>
        committedHighWater.remove(key) // drop any stale mark
        val seen = tableExists && seenInTable()
        // a found batchId IS a valid high-water mark (ids are monotone):
        // install it so the NEXT batch answers from memory, not the table
        if (seen) committedHighWater.update(key, batchId)
        seen
    }

  /** Test hook: the live key [[probeAndAbsorbBatch]] uses for a session —
    * lets the two-warehouse spec assert the warehouse is PART of the key. */
  private[graft] def replayKeyFor(s: SparkSession, prefix: String = IndexPrefix): String =
    hwKey(s, s"${prefix}_verdicts")

  /** Test hook: commit a mark directly (a stream that ran in some other
    * warehouse/context). */
  private[graft] def installReplayMark(key: String, hw: Long): Unit =
    committedHighWater.update(key, hw)

  def probeAndAbsorbBatch(prefix: String = IndexPrefix)(batch: DataFrame, batchId: Long): Unit = {
    val s  = batch.sparkSession
    val vt = s"${prefix}_verdicts"
    // The mark is only trusted while its table still exists (a catalog
    // lookup, not a scan): a DROP TABLE / warehouse wipe outside
    // resetVerdicts would otherwise leave a stale mark silently dropping
    // every batch of the next stream. A caller that keeps the table but
    // restarts from a FRESH checkpoint must go through resetVerdicts —
    // the same contract the marker table itself already imposes.
    val key = hwKey(s, vt)
    val replayed = replayDecision(
      key,
      batchId,
      tableExists = s.catalog.tableExists(vt),
      seenInTable = () => !s.table(vt).filter(col("batch_id") === batchId).isEmpty)
    // replay skips must be OBSERVABLE: if a stale mark (or a foreign
    // verdict table under a fresh checkpoint without resetVerdicts) ever
    // misclassifies a live batch, the failure mode is silent data loss —
    // one log line per skip turns that into a diagnosable signal
    if (replayed)
      System.err.println(
        s"[graft] probeAndAbsorbBatch: batch $batchId of $vt treated as a replay (already committed) — skipping"
      )
    if (!replayed) {
      probeAndAbsorb(s, batch, prefix)
        .withColumn("batch_id", lit(batchId))
        .write
        .mode("append")
        .format("parquet")
        .saveAsTable(vt)
      // mark AFTER the marker write: a failed append must stay re-probeable
      committedHighWater.update(key, math.max(committedHighWater.getOrElse(key, -1L), batchId))
    }
  }

  /** Test hook: forget the in-memory mark WITHOUT touching the table —
    * simulates a fresh JVM so a same-JVM spec can exercise the restart
    * table-probe path a real recovery takes. */
  private[graft] def clearReplayMark(prefix: String = IndexPrefix): Unit = {
    // keys are (warehouse :: table); a fresh JVM forgets ALL warehouses
    val suffix = s"::${prefix}_verdicts"
    committedHighWater.keys.filter(_.endsWith(suffix)).foreach(committedHighWater.remove)
  }

  /** Reconciliation audit for the mid-absorb crash window
    * ([[probeAndAbsorbBatch]]'s documented residue: a kill strictly between
    * the three index appends and the verdict-marker write leaves survivors
    * in the index with no verdicts). The residue is healed by the periodic
    * [[build]] compaction but was invisible until then — this makes it
    * visible ON DEMAND so a caller can decide whether to trust a maintained
    * index or force the compaction early.
    *
    * `base` is the corpus the index was BUILT from (its docs legitimately
    * have no verdicts); accountable docs = base ∪ verdict survivors. One
    * row per table with its orphan count:
    *  - `shingles` / `bands`: doc_ids in the table but not accountable
    *  - `fp`: fingerprints with NO shingle-table backing (catches the
    *    narrower crash-after-fp-append-only window, where doc_ids never
    *    landed)
    * All joins are id/fingerprint-sized LEFT ANTIs — no text, no shingle
    * arrays ever shuffle; cost is a skinny column scan per table. A clean
    * maintained index audits to three zeros. */
  def auditResidue(s: SparkSession, base: DataFrame, prefix: String = IndexPrefix): DataFrame = {
    val vt = s"${prefix}_verdicts"
    val survivors =
      if (s.catalog.tableExists(vt))
        s.table(vt).filter(col("keep") === 1L).select("doc_id")
      else s.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
    val accountable = base.select("doc_id").union(survivors).distinct()
    val sh  = s.table(s"${prefix}_shingles")
    val shOrphans = sh.select("doc_id").distinct()
      .join(accountable, Seq("doc_id"), "left_anti").count()
    val bandOrphans = s.table(s"${prefix}_bands").select("doc_id").distinct()
      .join(accountable, Seq("doc_id"), "left_anti").count()
    val fpOrphans = s.table(s"${prefix}_fp").select("fingerprint").distinct()
      .join(sh.select("fingerprint").distinct(), Seq("fingerprint"), "left_anti").count()
    import s.implicits._
    Seq(
      ("shingles", shOrphans),
      ("bands", bandOrphans),
      ("fp", fpOrphans)
    ).toDF("table", "orphans")
  }

  /** Drop the verdict table (and clear its location) before starting a new
    * stream against `prefix`. */
  def resetVerdicts(s: SparkSession, prefix: String = IndexPrefix): Unit = {
    clearReplayMark(prefix)
    reset(s, s"${prefix}_verdicts")
  }

  /** q106: build the index from the q58 base split, probe the q58 delta —
    * end-to-end through the PERSISTED tables, never the in-memory base. */
  def q106(s: SparkSession, dir: String): DataFrame = {
    val docs  = Tables.documentsDistributed(s, dir)
    val base  = docs.filter(col("doc_id") % FuzzyDedup.DeltaMod < 8)
    val delta = docs.filter(col("doc_id") % FuzzyDedup.DeltaMod >= 8)
    build(base)
    probe(s, delta)
  }
}
