package graft.streaming

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.TextOps._

/** Streaming corpus intake with curation — the readStream twin of the batch
  * c05 pipeline, restricted to the stages whose state is streaming-safe:
  *
  *   1. quality gate (token count) — stateless filter;
  *   2. benchmark decontamination — stateless per-row n-gram-hash probe
  *      against the eval-set gram set, in one of two size-adaptive physical
  *      forms (see [[BenchGrams]]);
  *   3. exact dedup on the md5 digest via `dropDuplicatesWithinWatermark` —
  *      the only stateful stage, state = one digest per distinct doc inside
  *      the watermark horizon.
  *
  * Scale notes: stage 2's gram set never holds driver memory hostage — above
  * [[CurationStream.benchmarkGrams]]'s `maxExactGrams` the set is a
  * fixed-size Bloom filter built by a DISTRIBUTED aggregation (only the
  * serialized sketch, sized by `fpp` alone, crosses the driver), shipped as
  * a BROADCAST (the per-micro-batch plan stays sketch-size-free) and probed
  * by a codegen'd short-circuit expression
  * ([[graft.functions.BloomBroadcastContainsAny]]); below it the exact
  * plan-literal hash array is cheaper (no per-element hashing). Dedup state
  * is bounded by the watermark, not the stream length — the standard trade:
  * only duplicates arriving within the horizon collapse.
  */
object CurationStream {

  /** Physical form of the decontamination gram set — the adoption seam
    * between the exact small-suite path and the Bloom scale path, mirroring
    * the batch `*Auto` operators' size switch. */
  sealed trait BenchGrams

  /** Exact distinct gram hashes, folded into the plan as a literal array and
    * probed with `array_intersect`. Right below ~10⁵ grams: exact (no false
    * drops) and cheaper per row than bloom hashing. */
  final case class ExactGrams(hashes: Seq[Long]) extends BenchGrams

  /** Serialized Spark [[org.apache.spark.util.sketch.BloomFilter]] over the
    * gram hashes — the scale path for multi-million-gram decontamination
    * corpora. Size is governed by `fpp` alone (≈ 1.44·log₂(1/fpp) bits per
    * gram — e.g. 10M grams at fpp 1e-6 ≈ 34 MiB), independent of gram-string
    * length.
    *
    * FPR bound: `fpp` is PER PROBED GRAM, so a clean document with G distinct
    * n-grams is falsely dropped with probability ≤ 1 − (1 − fpp)^G ≈ G·fpp
    * (decontamination errs toward dropping, never toward leaking benchmark
    * text — there are NO false negatives). At the default fpp 1e-6, a
    * 10k-gram document's false-drop probability is ≤ 1%. */
  final case class BloomGrams(bytes: Array[Byte], fpp: Double, nGrams: Long)
    extends BenchGrams {
    // Array[Byte] equality is reference-based; value semantics for a case
    // class holding the sketch bytes need the content compare
    override def equals(o: Any): Boolean = o match {
      case that: BloomGrams => java.util.Arrays.equals(bytes, that.bytes) &&
        fpp == that.fpp && nGrams == that.nGrams
      case _ => false
    }
    override def hashCode(): Int =
      (java.util.Arrays.hashCode(bytes), fpp, nGrams).hashCode()
  }

  /** Distinct 60-bit gram hashes of a benchmark table — the c01 n-gram
    * hashing as a DataFrame (no driver materialization). */
  private def gramHashes(benchmark: DataFrame, textCol: String, n: Int): DataFrame =
    benchmark
      .withColumn("__tk", toks(col(textCol)))
      .select(explode_outer(array_distinct(ngramsExact(col("__tk"), n))).as("__ng"))
      .filter(col("__ng").isNotNull)
      .select(h60(col("__ng")).as("__gh")).distinct()

  /** Size-adaptive benchmark gram set: exact hashes for small eval suites
    * (≤ `maxExactGrams` distinct grams), a Bloom filter past it. The switch
    * is measured from the actual distinct-gram count — one aggregation
    * either way; the bloom build is a distributed `stat.bloomFilter`
    * aggregation whose driver-side footprint is the serialized sketch only. */
  def benchmarkGrams(benchmark: DataFrame, textCol: String, n: Int = 8,
      maxExactGrams: Long = 100000L, fpp: Double = 1e-6): BenchGrams = {
    import benchmark.sparkSession.implicits._
    val grams = gramHashes(benchmark, textCol, n)
    val cnt = grams.count()
    if (cnt <= maxExactGrams)
      ExactGrams(grams.as[Long].collect().toSeq)
    else {
      val bf = grams.stat.bloomFilter("__gh", math.max(cnt, 1L), fpp)
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      BloomGrams(bos.toByteArray, fpp, cnt)
    }
  }

  /** Apply the three curation stages to a streaming `docs` frame that
    * already carries a watermark (required by the dedup stage). Column
    * `text` is read; all input columns pass through (plus `n_tok`). */
  def curate(docs: DataFrame, bench: BenchGrams, minTokens: Int,
      n: Int = 8): DataFrame = {
    val clean: Column = bench match {
      case ExactGrams(hashes) =>
        size(array_intersect(col("__ghs"), typedLit(hashes))) === 0
      case b: BloomGrams =>
        // sketch behind a broadcast handle, not a plan literal — in
        // streaming doubly important: the plan is re-serialized per
        // micro-batch, the broadcast ships once
        val bc = docs.sparkSession.sparkContext.broadcast(b.bytes)
        !graft.functions.BloomExprs.containsAnyBroadcast(bc, col("__ghs"))
    }
    docs
      .withColumn("__tk", toks(col("text")))
      .withColumn("n_tok", size(col("__tk")).cast("long"))
      .filter(col("n_tok") >= minTokens)
      // materialized: same 17×-at-sf1.0 hazard as decontaminateBloom — the
      // decontamination filter must probe the computed gram attribute, not a
      // pushdown-inlined copy whose token array re-evaluates per gram
      .withColumn("__ghs", graft.functions.Materialize.materialized(
        transform(array_distinct(ngramsExact(col("__tk"), n)), g => h60(g))))
      .filter(clean)
      .withColumn("__digest", md5(col("text")))
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__tk", "__ghs", "__digest")
  }

  /** Exact-hash-set entry point (kept for small in-code suites; prefer
    * [[benchmarkGrams]] + the [[BenchGrams]] overload, which picks the
    * physical form by measured size). */
  def curate(docs: DataFrame, benchHashes: Seq[Long], minTokens: Int,
      n: Int): DataFrame =
    curate(docs, ExactGrams(benchHashes), minTokens, n)

  // ------------------------------------------------- incremental near-dup
  /** Incremental MinHash near-dup dedup for a STREAM, as a `foreachBatch`
    * body: each micro-batch (1) greedily dedups within itself
    * ([[graft.ext.DedupOps.dropNearDuplicatesMinhash]]'s smallest-id-wins
    * contract), (2) drops any remaining doc whose band signature collides
    * with a KEPT doc of an EARLIER batch (first-seen wins — arrival order is
    * the greedy order across batches), and (3) appends the survivors'
    * postings to a parquet signature index under `batch=<id>`, with
    * overwrite — a replayed micro-batch rewrites exactly its own partition,
    * the standard foreachBatch idempotency contract.
    *
    * This is deliberately the stream-to-batch production shape, not a
    * chained stateful operator: Spark restricts stateful-after-stateful
    * chains, while a columnar signature index is unbounded-corpus-scale
    * state that restarts resume from, other jobs can read, and a compaction
    * job can rewrite. Per micro-batch cost: one signature aggregation over
    * the batch and one (band, bsig)-keyed join against the index — the
    * index side is pruned to distinct signatures and AQE broadcasts it
    * while it fits; past that it is a plain keyed shuffle join.
    *
    * Returns the surviving rows of `batch` (all columns). Wire it as:
    * {{{
    * docs.writeStream.foreachBatch { (b, id) =>
    *   val kept = CurationStream.nearDedupBatch(indexDir, "doc_id", "text")(b, id)
    *   sink(kept)    // deliver survivors wherever the pipeline sends them
    * }.start()
    * }}} */
  /** Probed-signature cap for the index-scan pruning path: the batch's
    * distinct band signatures are collected driver-side (micro-batch-bounded
    * state, the same order of magnitude as broadcasting the batch) and pushed
    * down the index scan as exact parquet `In` filters. Past the cap the
    * plain keyed join stands alone — correctness never depends on the
    * prefilter. */
  private val MaxProbeSigs = 8192

  /** Values per pushed `In` filter — see [[graft.Pushdown]]: the probe
    * splits its sorted signatures into ≤256-value chunks, one scan branch
    * per chunk (disjoint, so a plain union), keeping every pushed filter's
    * recursive Or-chain shallow while the union of branches still touches
    * only the row groups holding probed signatures. */
  private val ProbeInChunk = graft.Pushdown.InChunk

  /** Per-indexDir JVM lock serializing [[nearDedupBatch]]'s index
    * read/write against [[compactIndex]]: an unserialized heal (run before
    * every index read) could catch a live compaction between its rename
    * steps and either delete its in-flight tmp or restore the aside under
    * it, aborting the compaction spuriously. Same-JVM callers (the
    * supported shape — foreachBatch and maintenance compaction both run on
    * the stream's driver) are fully serialized; a compactor in a SEPARATE
    * process is additionally fenced by the [[Fence]] epoch manifest so it
    * can abort but never lose postings. */
  private val indexLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(dir: String): Object =
    indexLocks.computeIfAbsent(dir, _ => new Object)

  /** Cross-PROCESS epoch fencing for the signature index — the JVM lock
    * above cannot reach a compactor running in a second process (a
    * maintenance job racing the live stream). The index carries a manifest
    * directory `_fence/` of monotonically numbered `epoch-<n>` marker
    * files; every mutator acquires the next epoch by ATOMIC create-new
    * (O_EXCL locally, the namenode's create(overwrite=false) on HDFS — the
    * only primitive object stores and HDFS agree is a CAS), and the
    * FENCING RULE is asymmetric, matching ownership:
    *
    *   - the WRITER (the stream's foreachBatch) acquires an epoch at every
    *     batch and never yields — the stream owns its index;
    *   - a COMPACTOR records the epoch it acquired and re-checks `maxEpoch`
    *     before every destructive step (aside rename, commit rename, every
    *     original-partition delete). A newer epoch means a writer moved
    *     underneath it: the compactor ABORTS, rolling back or leaving only
    *     states [[healCompaction]] recovers — duplicated postings at worst,
    *     never loss. Compaction is hygiene; aborting is always safe.
    *
    * The unavoidable check-then-act window (a writer bumps between a
    * compactor's last check and its one in-flight delete) is closed on the
    * writer side: [[nearDedupBatch]] re-verifies its partition after
    * writing and re-writes if a lagging delete clobbered it — each
    * compaction run deletes a given partition at most once, so the retry
    * converges. Old epoch markers are pruned at acquire; the manifest stays
    * a handful of empty files. */
  private[graft] object Fence {
    import org.apache.hadoop.fs.{FileSystem, Path}
    private def dir(root: Path) = new Path(root, "_fence")

    /** Highest acquired epoch, 0 if none. */
    def maxEpoch(fs: FileSystem, root: Path): Long = {
      val d = dir(root)
      if (!fs.exists(d)) 0L
      else fs.listStatus(d).iterator.flatMap(s =>
        Option(s.getPath.getName).filter(_.startsWith("epoch-"))
          .flatMap(_.stripPrefix("epoch-").toLongOption)).foldLeft(0L)(math.max)
    }

    /** Acquire the next epoch: atomic create-new of `epoch-<n>`, bumping n
      * past losers of concurrent races. Prunes markers older than the
      * previous 8 (only the max matters; a few are kept so a concurrent
      * maxEpoch listing never observes an empty manifest mid-prune). */
    def acquire(fs: FileSystem, root: Path): Long = {
      val d = dir(root)
      fs.mkdirs(d)
      var e = maxEpoch(fs, root) + 1
      var acquired = false
      while (!acquired) {
        val p = new Path(d, s"epoch-$e")
        acquired =
          try { fs.create(p, false).close(); true }
          catch { case _: java.io.IOException => e += 1; false }
      }
      fs.listStatus(d).foreach { s =>
        Option(s.getPath.getName).filter(_.startsWith("epoch-"))
          .flatMap(_.stripPrefix("epoch-").toLongOption)
          .filter(_ < e - 8).foreach(_ => fs.delete(s.getPath, false))
      }
      e
    }
  }

  def nearDedupBatch(indexDir: String, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4, shingleLen: Int = 3,
      onWrite: () => Unit = () => ())
      (batch: DataFrame, batchId: Long): DataFrame = {
    import graft.ext.DedupOps
    // the minhash window-agg and posting build each feed several actions
    // (emptiness check, index write, the caller's sink) — persist both so
    // the expensive aggregations run once per micro-batch, and hand the
    // caller an eagerly-materialized result whose lineage no longer
    // references the persisted parents (so they can be freed here)
    val inBatch = DedupOps.dropNearDuplicatesMinhash(
      batch, idCol, textCol, bands, rowsPerBand, shingleLen).persist()
    val posts = DedupOps.bandPostings(
      inBatch, idCol, textCol, bands, rowsPerBand, shingleLen).persist()
    val spark = batch.sparkSession
    // Raise the In-pushdown threshold past the chunk size so the exact
    // per-value form reaches parquet, where row-group stats + dictionaries
    // on the (band,bsig)-sorted index skip every group holding none of the
    // probed signatures: per-batch index IO scales with the BATCH, not the
    // index. STICKY (see graft.Pushdown): a per-batch set/restore raced
    // concurrent streams on the same session.
    graft.Pushdown.ensureInThreshold(spark)
    try lockFor(indexDir).synchronized {
      // fence any cross-process compactor FIRST: from here on, a compactor
      // holding an older epoch aborts at its next destructive-step check
      val root = new org.apache.hadoop.fs.Path(indexDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(root)
      Fence.acquire(fs, root)
      val survivors = earlierIndex(batch, indexDir, batchId) match {
        case Some(idx) =>
          val probeSigs = posts.select(col("bsig")).distinct()
            .limit(MaxProbeSigs + 1).collect().map(_.getString(0)).toSeq
          val pruned =
            if (probeSigs.isEmpty) idx.filter(lit(false)) // no-data batch
            else if (probeSigs.length <= MaxProbeSigs)
              probeSigs.sorted.grouped(ProbeInChunk)
                .map(chunk => idx.filter(col("bsig").isInCollection(chunk)))
                .reduce(_ union _)
            else idx
          val dropIds = posts
            .join(pruned.select(col("band"), col("bsig")).distinct(), Seq("band", "bsig"))
            .select(col("__id")).distinct()
          inBatch.join(dropIds.withColumnRenamed("__id", idCol), Seq(idCol), "left_anti")
        case None => inBatch
      }
      val survivorPosts = posts.join(
        survivors.select(col(idCol).as("__id")), Seq("__id"), "left_semi")
      // skip the write when nothing survived: an empty parquet dir has no
      // schema to read back, and an absent partition is equivalent — but a
      // PRIOR attempt's partition must go (replay idempotency: a batch
      // rewrites exactly its own partition, including rewriting it to
      // nothing when compaction changed what survives between attempts)
      val target = new org.apache.hadoop.fs.Path(s"$indexDir/batch=$batchId")
      val hasPosts = !survivorPosts.isEmpty
      // write-and-verify loop: a cross-process compactor whose LAST epoch
      // check predated our Fence.acquire above can have one in-flight
      // delete land on our fresh partition (the unavoidable check-then-act
      // window, see [[Fence]]). Each compaction run deletes a partition at
      // most once and aborts at its next check, so one re-write converges;
      // the bound is paranoia against a pathological stack of compactors.
      var attempts = 0
      var settled = false
      while (!settled) {
        attempts += 1
        require(attempts <= 5,
          s"nearDedupBatch: batch=$batchId partition kept disappearing " +
            "under concurrent compaction — external coordination is broken")
        if (hasPosts)
          // (band,bsig)-sorted write: range-partitioned files, each sorted,
          // so every row group covers a narrow signature slice and the
          // probe's pushed In filter above can skip it by stats alone
          survivorPosts.sort(col("band"), col("bsig"))
            .write.mode("overwrite").parquet(target.toString)
        else fs.delete(target, true)
        onWrite() // test seam: the fencing spec injects the racing delete here
        settled =
          if (hasPosts)
            fs.exists(new org.apache.hadoop.fs.Path(target, "_SUCCESS"))
          else !fs.exists(target)
      }
      survivors.localCheckpoint(true)
    } finally {
      posts.unpersist(false)
      inBatch.unpersist(false)
    }
  }

  /** Compact the [[nearDedupBatch]] signature index: merge every partition
    * STRICTLY below `uptoBatchId` into one partition named after the highest
    * merged id, deleting the originals — small-file hygiene for a
    * long-running stream (one partition per micro-batch adds up). The
    * earlier-than-current invariant survives: every merged id < any future
    * batch id, so future batches still see all compacted postings.
    *
    * PRECONDITION: `uptoBatchId` must not exceed the streaming checkpoint's
    * committed horizon. A committed micro-batch is never replayed, so
    * folding its postings forward is safe; compacting an uncommitted batch
    * would let its replay see its own postings and drop its own documents.
    *
    * Crash-safety (rename-aside commit): write-tmp → rename the conflicting
    * `batch=<maxId>` ASIDE to `.old-<maxId>` → rename tmp into place →
    * delete the aside copy and the remaining merged partitions. Every crash
    * window now leaves the index recoverable without posting LOSS:
    * interrupted states are healed by [[healCompaction]] (run at the start
    * of every compaction AND before every [[earlierIndex]] read), and the
    * only post-commit anomaly is original partitions coexisting with the
    * merged one — duplicated postings, harmless (every consumer distincts
    * the signatures) and folded away by the next compaction. `onStep` is a
    * test seam: the crash-injection spec throws from it to exercise each
    * window, and the fencing spec runs a concurrent writer from it.
    *
    * Cross-process fencing (see [[Fence]]): the compactor acquires an
    * epoch up front and re-checks `maxEpoch` before every destructive
    * step. A concurrent [[nearDedupBatch]] (same process or not) bumps the
    * epoch, so a fenced compactor rolls back / stops cleanly — worst case
    * duplicated postings, never loss — and returns `false`. Returns `true`
    * when a merge committed (or there was nothing to merge). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      uptoBatchId: Long, onStep: String => Unit = _ => ()): Boolean =
    compactPartitions(spark, indexDir, uptoBatchId, onStep)(
      // preserve the (band,bsig) sort across compaction — the merged
      // partition must stay prunable by the per-batch probe's In filter
      _.sort(org.apache.spark.sql.functions.col("band"),
        org.apache.spark.sql.functions.col("bsig")))

  /** Compact the [[tokenCountsBatch]] count state: merge every partition
    * strictly below `uptoBatchId` into one SUM-aggregated partition —
    * [[compactIndex]]'s machinery with an aggregate merge, so the state
    * shrinks to one row per (group, token) instead of concatenating.
    *
    * The `uptoBatchId` precondition is CORRECTNESS-critical here, not just
    * replay hygiene: a replayed batch below the compaction horizon would
    * re-create its own partition while its counts also live inside the
    * merged one — double-counting, which count semantics (unlike the
    * index's distinct-probed postings) do NOT absorb. Pass only the
    * streaming checkpoint's committed horizon, which structured streaming
    * never replays. */
  def compactCounts(spark: org.apache.spark.sql.SparkSession,
      countsDir: String, uptoBatchId: Long, byCol: String,
      onStep: String => Unit = _ => ()): Boolean =
    compactPartitions(spark, countsDir, uptoBatchId, onStep)(
      _.groupBy(col(byCol), col("__tok"))
        .agg(sum(col("__c")).as("__c")))

  private def compactPartitions(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, uptoBatchId: Long, onStep: String => Unit)
      (merge: DataFrame => DataFrame): Boolean =
      lockFor(indexDir).synchronized {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return true
    healCompaction(fs, root)
    val myEpoch = Fence.acquire(fs, root)
    def fenced: Boolean = Fence.maxEpoch(fs, root) != myEpoch
    val parts = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .flatMap { p =>
        Option(p.getName).filter(_.startsWith("batch="))
          .flatMap(_.stripPrefix("batch=").toLongOption)
          .filter(_ < uptoBatchId).map(_ -> p)
      }
    if (parts.length < 2) return true // nothing to merge
    val maxId = parts.map(_._1).max
    val tmp = new org.apache.hadoop.fs.Path(root, s".compact-$maxId")
    merge(spark.read.parquet(parts.map(_._2.toString).toIndexedSeq: _*))
      .write.mode("overwrite").parquet(tmp.toString)
    onStep("merged")
    val target = new org.apache.hadoop.fs.Path(root, s"batch=$maxId")
    val aside = new org.apache.hadoop.fs.Path(root, s".old-$maxId")
    if (fenced) { fs.delete(tmp, true); onStep("fenced"); return false }
    require(fs.rename(target, aside),
      s"compactIndex: rename $target -> $aside failed")
    onStep("aside")
    // rename helper: RawLocalFileSystem THROWS on a missing source where
    // HDFS returns false — a fencing writer's concurrent heal can legally
    // remove our source (restore the aside, delete the tmp), so both
    // outcomes mean the same thing here: "the rename didn't happen"
    def tryRename(src: org.apache.hadoop.fs.Path,
        dst: org.apache.hadoop.fs.Path): Boolean =
      try fs.rename(src, dst) catch { case _: java.io.IOException => false }
    if (fenced) {
      // roll the aside back under the fence — one rename, loss-free; the
      // writer that fenced us may be healing concurrently and have restored
      // the target itself already, in which case our aside is redundant
      if (!tryRename(aside, target)) require(fs.exists(target),
        s"compactIndex: fenced rollback failed and $target is missing")
      fs.delete(tmp, true); onStep("fenced"); return false
    }
    if (!tryRename(tmp, target)) {
      // a fencing writer's heal restored the aside under us between the
      // check and the rename — orderly abort (tmp is re-built next run)
      require(fs.exists(target),
        s"compactIndex: rename $tmp -> $target failed; original kept in $aside")
      fs.delete(tmp, true); onStep("fenced"); return false
    }
    onStep("committed")
    // post-commit the merged partition holds every original posting; if a
    // writer fences us now we STOP deleting — its re-written partition must
    // survive, and the duplicates fold away next compaction (the aside is
    // target-shadowed, healCompaction deletes it)
    if (fenced) { onStep("fenced"); return false }
    fs.delete(aside, true)
    var clean = true
    parts.collect { case (id, p) if id != maxId => p }.foreach { p =>
      if (clean && fenced) { onStep("fenced"); clean = false }
      if (clean) fs.delete(p, true)
    }
    clean
  }

  // ------------------------------------------------------- streaming ANN
  /** Append ONE micro-batch's IVF-PQ codes to a partitioned on-disk ANN
    * index (round-13 NEXT #4 — the [[nearDedupBatch]] incremental-index
    * discipline applied to the
    * [[graft.ext.Similarity.saveIvfPqCodes]] layout): the batch encodes
    * under the FIXED serving `model` and rewrites EXACTLY its own
    * `batch=<id>` partition, list-sorted (range-partitioned + sorted on
    * (__cid, id)) within the partition, so [[graft.ext.Similarity]]'s
    * `ivfPqSearch(pruneLists = true)` skips row groups inside every
    * partition exactly as against a batch-built index.
    *
    * Replay idempotency: a replayed batch overwrites its own partition —
    * including rewriting it to NOTHING on an empty replay. Codes are
    * deterministic per-row projections of (model, row), so the union of
    * batch partitions is bit-identical to a one-shot corpus encode
    * (StreamingPipelineSpec pins streamed-built ≡ batch-built search).
    * The write-and-verify loop and up-front [[Fence]] epoch bump mirror
    * [[nearDedupBatch]]: a concurrent compactor aborts at its next check,
    * and its one possible in-flight delete is absorbed by a re-write. */
  def ivfPqIndexBatch(indexDir: String,
      model: graft.ext.Similarity.IvfPqModel, idCol: String, vecCol: String,
      onWrite: () => Unit = () => ())
      (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val codes = graft.ext.Similarity
      .ivfPqEncode(model, batch, idCol, vecCol).persist()
    try lockFor(indexDir).synchronized {
      val root = new org.apache.hadoop.fs.Path(indexDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(root)
      Fence.acquire(fs, root) // fence any cross-process compactor FIRST
      healCompaction(fs, root)
      // write-and-verify via the shared settled loop (test seam: onWrite
      // is the nearDedupBatch fencing-spec pattern)
      writeOwnPartition(fs, indexDir, batchId,
        if (codes.isEmpty) None else Some(codes), Seq("__cid", "id"),
        "ivfPqIndexBatch", onWrite)
    } finally codes.unpersist(false)
  }

  /** Read the [[ivfPqIndexBatch]]-maintained index as one code table for
    * [[graft.ext.Similarity]]'s `ivfPqSearch`. Heals any interrupted
    * compaction first, then reads the batch partitions WITHOUT the
    * partition-discovery column (the explicit-subdir read, so the schema
    * matches a [[graft.ext.Similarity.saveIvfPqCodes]] table exactly).
    * `dedupIds = true` (default) adds a one-pass distinct on `idCol`: in
    * steady state partitions are disjoint and it removes nothing, but in
    * the one documented crash window — a compactor dying AFTER its commit
    * rename and BEFORE deleting the merged originals — a doc's code row
    * exists in two partitions, and an ANN top-k must not surface one id
    * twice. Codes of a duplicate id are bit-identical (deterministic
    * projection), so the distinct is exact. A deployment that compacts
    * (with healing) before serving can pass `dedupIds = false` to keep the
    * scan exchange-free. */
  def loadIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, idCol: String = "id",
      dedupIds: Boolean = true): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no index at $indexDir")
    lockFor(indexDir).synchronized(healCompaction(fs, root))
    val dirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("batch=")).map(_.toString).sorted
    require(dirs.nonEmpty, s"no batch partitions under $indexDir")
    val codes = spark.read.parquet(dirs.toIndexedSeq: _*)
    if (dedupIds) codes.dropDuplicates(idCol) else codes
  }

  /** Compact the [[ivfPqIndexBatch]] index: merge every partition strictly
    * below `uptoBatchId` into one partition named after the highest merged
    * id — [[compactIndex]]'s rename-aside machinery with a list-sorted,
    * id-DISTINCT merge (a post-commit-crash leftover partition duplicates
    * code rows; the distinct folds them away exactly, codes being
    * deterministic). Same PRECONDITION as [[compactCounts]]: pass only the
    * streaming checkpoint's committed horizon. Returns `true` when a merge
    * committed (or there was nothing to merge). */
  def compactIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, uptoBatchId: Long,
      idCol: String = "id", onStep: String => Unit = _ => ()): Boolean =
    compactPartitions(spark, indexDir, uptoBatchId, onStep)(
      _.dropDuplicates(idCol).sort(col("__cid"), col(idCol)))

  // ------------------------------------------- streaming binary signatures
  /** Append ONE micro-batch's 64-bit sign signatures to a partitioned
    * on-disk signature index — the streaming maintenance path of the
    * [[graft.ext.Similarity]] `binarySigTable` relation (the round-17
    * served hybrid fusion's Hamming leg): a deployment ingesting
    * embeddings keeps the 16-byte/vector code table current per batch
    * instead of re-projecting the whole corpus, and every Hamming
    * ranking ([[graft.ext.Similarity.knnBinary]]-shaped scans, the
    * `rrf_served` fusion leg) reads the index. Signatures are pure
    * integer projections of the vector signs, so the union of batch
    * partitions is bit-identical to the one-shot table
    * (StreamingPipelineSpec pins it, including the served-fusion-leg
    * parity). Same [[ivfPqIndexBatch]] machinery: each batch rewrites
    * exactly its own `batch=<id>` partition (replay idempotent, empty
    * replay deletes), vec_id-sorted within the partition so signature
    * row groups prune on id probes; [[Fence]] + [[healCompaction]]
    * guard cross-process compaction. */
  def binarySigBatch(indexDir: String, idCol: String, vecCol: String,
      onWrite: () => Unit = () => ())
      (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val sigs = graft.ext.Similarity.withBinarySig(
        batch.select(col(idCol).as("vec_id"),
          transform(col(vecCol), x => x.cast("double")).as("__v")), "__v")
      .select(col("vec_id"), col("sig0"), col("sig1")).persist()
    try lockFor(indexDir).synchronized {
      val root = new org.apache.hadoop.fs.Path(indexDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(root)
      Fence.acquire(fs, root)
      healCompaction(fs, root)
      writeOwnPartition(fs, indexDir, batchId,
        if (sigs.isEmpty) None else Some(sigs), Seq("vec_id"),
        "binarySigBatch", onWrite)
    } finally sigs.unpersist(false)
  }

  /** Read the [[binarySigBatch]]-maintained index as one
    * (vec_id, sig0, sig1) table — the [[loadIvfPqIndex]] contract:
    * heals interrupted compactions, explicit-subdir read (schema matches
    * the batch `binarySigTable` exactly), and `dedupIds` folds away the
    * one documented post-compaction-crash duplicate window (signature
    * rows of a duplicate id are bit-identical, so the distinct is
    * exact). */
  def loadBinarySigIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, dedupIds: Boolean = true): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no index at $indexDir")
    lockFor(indexDir).synchronized(healCompaction(fs, root))
    val dirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("batch=")).map(_.toString).sorted
    require(dirs.nonEmpty, s"no batch partitions under $indexDir")
    val sigs = spark.read.parquet(dirs.toIndexedSeq: _*)
    if (dedupIds) sigs.dropDuplicates("vec_id") else sigs
  }

  /** Compact the [[binarySigBatch]] index — [[compactIvfPqIndex]]'s
    * rename-aside merge with a vec_id-sorted, id-distinct fold. Same
    * committed-horizon PRECONDITION. */
  def compactBinarySigIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, uptoBatchId: Long,
      onStep: String => Unit = _ => ()): Boolean =
    compactPartitions(spark, indexDir, uptoBatchId, onStep)(
      _.dropDuplicates("vec_id").sort(col("vec_id")))

  /** Append ONE micro-batch's single-band bucket rows to a partitioned
    * on-disk DENSE index — the streaming maintenance path of
    * [[graft.ext.Similarity]]'s content-addressed `bucketTable` (the s02
    * serving store), completing the round-17 follow-up: the
    * binary-signature index got this treatment first
    * ([[binarySigBatch]]); a deployment whose embeddings arrive as a
    * stream keeps the probed-cosine leg's index current per batch too,
    * instead of re-projecting the whole corpus on every refresh. The
    * signature width `w` is FIXED at index creation (a stream cannot
    * re-bucket retroactively — pick it from the expected corpus size via
    * the `bucketPlanes` rule; a width change is a new index), and the
    * contract is MACHINE-enforced: the first batch records `w` in a
    * `_meta.w` file and every later batch fails loudly on mismatch
    * ([[requireMeta]]; [[bucketIndexWidth]] is the read side): the same
    * [[graft.ext.Similarity.bucketProjection]] the batch store builds,
    * so for any ingested set the union of batch partitions is
    * bit-identical to the one-shot store at that width
    * (StreamingPipelineSpec pins it, including the probed-ranking
    * parity). Partition discipline is [[binarySigBatch]]'s: each batch
    * rewrites exactly its own `batch=<id>` partition (replay idempotent,
    * empty replay deletes), (bucket, vec_id)-sorted within the partition
    * so per-search IO prunes row groups to the probed lists; [[Fence]] +
    * [[healCompaction]] guard cross-process compaction. */
  def bucketBatch(indexDir: String, idCol: String, vecCol: String, w: Int,
      onWrite: () => Unit = () => ())
      (batch: DataFrame, batchId: Long): Unit = {
    require(w >= 1 && w <= 20, s"bucket width in [1,20], got $w")
    val spark = batch.sparkSession
    val rows = graft.ext.Similarity
      .bucketProjection(batch, idCol, vecCol, w).persist()
    try lockFor(indexDir).synchronized {
      val root = new org.apache.hadoop.fs.Path(indexDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(root)
      Fence.acquire(fs, root)
      requireMeta(fs, root, "w", w.toLong)
      healCompaction(fs, root)
      writeOwnPartition(fs, indexDir, batchId,
        if (rows.isEmpty) None else Some(rows), Seq("bucket", "vec_id"),
        "bucketBatch", onWrite)
    } finally rows.unpersist(false)
  }

  /** Read the [[bucketBatch]]-maintained dense index as one
    * (vec_id, v, nrm, bucket) table — the [[loadBinarySigIndex]]
    * contract: heals interrupted compactions, explicit-subdir read
    * (schema matches the batch `bucketTable` exactly), and `dedupIds`
    * folds away the one documented post-compaction-crash duplicate
    * window (bucket rows of a duplicate id are bit-identical — the
    * projection is deterministic in the vector — so the distinct is
    * exact). */
  def loadBucketIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, dedupIds: Boolean = true): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no index at $indexDir")
    lockFor(indexDir).synchronized(healCompaction(fs, root))
    val dirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("batch=")).map(_.toString).sorted
    require(dirs.nonEmpty, s"no batch partitions under $indexDir")
    val rows = spark.read.parquet(dirs.toIndexedSeq: _*)
    if (dedupIds) rows.dropDuplicates("vec_id") else rows
  }

  /** Compact the [[bucketBatch]] index — the rename-aside merge with a
    * (bucket, vec_id)-sorted, id-distinct fold, so the compacted
    * partition keeps the probed-list row-group pruning the per-batch
    * sort bought. Same committed-horizon PRECONDITION as
    * [[compactIndex]]. */
  def compactBucketIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, uptoBatchId: Long,
      onStep: String => Unit = _ => ()): Boolean =
    compactPartitions(spark, indexDir, uptoBatchId, onStep)(
      _.dropDuplicates("vec_id").sort(col("bucket"), col("vec_id")))

  // --------------------------------------- streaming component labels
  /** Append ONE micro-batch to the streamed COMPONENT-LABEL store — the
    * incremental-maintenance path of [[graft.ext.Dedup]]'s
    * `sigComponentsTable` (round-18 verdict #3: the last content-addressed
    * store without a streaming twin — ingest silently served stale labels
    * until the next batch rebuild). The store holds TWO sub-indexes under
    * `indexDir`: `sigs/batch=<id>` — the batch's per-doc simhash
    * fingerprints (a pure projection, the [[binarySigBatch]] discipline) —
    * and `labels/batch=<id>` — the label DELTA: every member of every
    * component this batch's documents touch, written as
    * (id, component, group_size, __b = batchId).
    *
    * Incremental algorithm (exact, not approximate): the batch's new
    * fingerprints probe the accumulated signature index for the pair
    * edges they add ([[graft.ext.DedupOps.simhashPairsAcross]] — band
    * equi-join, batch-sized probe side); edge endpoints CONTRACT to their
    * current resolved labels (an unlabeled endpoint is its own label —
    * previously-unpaired docs enter here); a bounded union-find over the
    * contracted label-level edges ([[graft.ext.DedupOps
    * .connectedComponents]], `maxDriverEdges`-guarded with the
    * distributed fallback) yields the merge map; and the delta rewrites
    * all members of affected components with the merged min-id label and
    * the new size. Old labels are component MINIMA by induction, so the
    * min over merged labels and new ids is the true component minimum —
    * the resolved store replays the batch `connectedComponents` labeling
    * EXACTLY for any ingestion split (spec-pinned bit-exact parity).
    *
    * Read side resolves LAST-WRITER-WINS per id on the in-row `__b`
    * column ([[loadComponentIndex]]); a replayed batch recomputes its
    * delta from state STRICTLY before it (the [[earlierIndex]] rule) and
    * rewrites exactly its own partitions — replay idempotent, empty
    * replay deletes. SCOPE of the empty-replay-delete (derived-store
    * caveat the pure-projection stores don't have): it is sound only for
    * the batch structured streaming actually replays — the LAST,
    * uncommitted one, before any later batch exists. Replaying an OLD
    * committed batch empty would orphan later deltas that were computed
    * with its docs present; committed batches are never replayed (the
    * [[compactIndex]] committed-horizon contract), so that state is
    * unreachable under the streaming semantics this store serves.
    * Banding parameters are FIXED at store creation and
    * machine-enforced via `_meta` ([[requireMeta]]).
    *
    * Identity contract: one signature per doc_id (the
    * [[graft.ext.DedupOps.simhashPairsAcross]] determinism contract). A
    * batch-vs-index collision resolves to the BATCH's signature (the
    * anti-join below); a changed document across COMMITTED batches must
    * arrive as a new doc_id — the sigs store is append-only per batch and
    * cannot retract an old batch's row.
    *
    * Scale shape: per batch, one band equi-join of batch postings against
    * the 8-byte/doc signature index, one keyed join of the (pair-graph-
    * sized) resolved label table against the batch's affected labels, and
    * a delta write sized by the affected components — never the corpus.
    * Serving cost: the resolved read is one scan + one id-keyed window
    * over the label relation; compaction ([[compactComponentIndex]])
    * folds it to one row per id. */
  def componentBatch(indexDir: String, idCol: String, textCol: String,
      bands: Int = 2, bitsPerBand: Int = 15, maxHamming: Int = 1,
      maxDriverEdges: Long = 5000000L, onWrite: () => Unit = () => ())
      (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val sigsNew = graft.ext.DedupOps.withSimhash(
        batch.select(col(idCol).cast("long").as("doc_id"),
          col(textCol).as("__text")),
        "__text", "simhash", bands * bitsPerBand)
      .select(col("doc_id"), col("simhash")).persist()
    var delta: Option[DataFrame] = None
    try lockFor(indexDir).synchronized {
      val root = new org.apache.hadoop.fs.Path(indexDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(root)
      requireMeta(fs, root, "bands", bands.toLong)
      requireMeta(fs, root, "bitsPerBand", bitsPerBand.toLong)
      requireMeta(fs, root, "maxHamming", maxHamming.toLong)
      val sigsDir = s"$indexDir/sigs"
      val labelsDir = s"$indexDir/labels"
      val sigsRoot = new org.apache.hadoop.fs.Path(sigsDir)
      val labelsRoot = new org.apache.hadoop.fs.Path(labelsDir)
      fs.mkdirs(sigsRoot); fs.mkdirs(labelsRoot)
      Fence.acquire(fs, sigsRoot); Fence.acquire(fs, labelsRoot)
      healCompaction(fs, sigsRoot); healCompaction(fs, labelsRoot)
      val hasRows = !sigsNew.isEmpty
      // the label delta, computed from state STRICTLY before this batch
      delta =
        if (!hasRows) None
        else {
          // the batch's signature WINS over any earlier index row for the
          // same doc_id (round-19 ADVICE #3: two live sigs per id made the
          // pair resolution nondeterministic through first()): the anti-join
          // is batch-sized-broadcast cheap and a no-op under the store's
          // unique-doc_id contract (see the simhashPairsAcross scaladoc —
          // a changed document is a NEW doc_id; same-batch replay recomputes
          // from strictly-earlier state, so it never self-collides here)
          val all = earlierIndex(batch, sigsDir, batchId)
            .map(_.join(broadcast(sigsNew.select(col("doc_id"))),
              Seq("doc_id"), "left_anti").unionByName(sigsNew))
            .getOrElse(sigsNew)
          val pairs = graft.ext.DedupOps.simhashPairsAcross(sigsNew, all,
            "doc_id", "simhash", bands, bitsPerBand, maxHamming)
            .localCheckpoint(true)
          // gate BEFORE touching the resolved store: the common
          // steady-state micro-batch adds no near-dup pairs, and the
          // label-store scan + checkpoint would be pure waste there
          if (pairs.isEmpty) None else {
          val res = earlierIndex(batch, labelsDir, batchId)
            .map(df => resolveLatest(df).select(col("id"), col("component"))
              .localCheckpoint(true))
          val contracted = (res match {
            case Some(r) =>
              pairs
                .join(r.select(col("id").as("id_a"), col("component").as("__ca")),
                  Seq("id_a"), "left")
                .join(r.select(col("id").as("id_b"), col("component").as("__cb")),
                  Seq("id_b"), "left")
                .select(coalesce(col("__ca"), col("id_a")).as("la"),
                  coalesce(col("__cb"), col("id_b")).as("lb"))
            case None =>
              pairs.select(col("id_a").as("la"), col("id_b").as("lb"))
          }).filter(col("la") =!= col("lb"))
          val comp = graft.ext.DedupOps.connectedComponents(
            contracted, "la", "lb", maxDriverEdges = maxDriverEdges)
          if (comp.isEmpty) None
          else {
            // merge map is bounded by the batch's contracted edges — the
            // affected labels, not the corpus
            val nc = broadcast(comp.select(col("id").as("__lbl"),
              col("component").as("__nc")))
            val oldMembers = res.map(r =>
              r.join(nc, r("component") === col("__lbl"))
                .select(r("id").as("id"), col("__nc").as("component")))
            // labels with NO rows in the resolved store are their own sole
            // member: new docs and previously-unpaired old docs
            val labeled = res.map(_.select(col("component").as("__lbl"))
              .distinct())
            val selfMembers = (labeled match {
              case Some(l) => nc.join(l, Seq("__lbl"), "left_anti")
              case None => nc
            }).select(col("__lbl").as("id"), col("__nc").as("component"))
            val members = oldMembers.map(_.unionByName(selfMembers))
              .getOrElse(selfMembers)
            val sizes = members.groupBy(col("component"))
              .agg(count(lit(1)).as("group_size"))
            Some(members.join(sizes, Seq("component"))
              .select(col("id"), col("component"), col("group_size"),
                lit(batchId).as("__b")).persist())
          }
          }
        }
      writeOwnPartition(fs, sigsDir, batchId,
        if (hasRows) Some(sigsNew) else None, Seq("doc_id"),
        "componentBatch/sigs", onWrite)
      writeOwnPartition(fs, labelsDir, batchId, delta, Seq("id"),
        "componentBatch/labels", onWrite)
    } finally {
      sigsNew.unpersist(false)
      delta.foreach(_.unpersist(false)): Unit
    }
  }

  /** Resolve the newest row per id on the in-row batch stamp — the
    * component store's last-writer-wins read. Duplicate (id, __b) rows
    * from the one documented post-compaction-crash window are
    * bit-identical (the delta is deterministic), so the pick is exact. */
  private def resolveLatest(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("__b").desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** The settled-write loop shared by the per-batch partition writers:
    * rewrite exactly `batch=<id>` (or delete it when the batch contributes
    * no rows) and re-check until the write survives a concurrent
    * compaction window. */
  private def writeOwnPartition(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, batchId: Long, rows: Option[DataFrame],
      sortCols: Seq[String], what: String, onWrite: () => Unit): Unit = {
    val target = new org.apache.hadoop.fs.Path(s"$dir/batch=$batchId")
    var attempts = 0
    var settled = false
    while (!settled) {
      attempts += 1
      require(attempts <= 5,
        s"$what: batch=$batchId partition kept disappearing under " +
          "concurrent compaction — external coordination is broken")
      rows match {
        case Some(df) =>
          df.repartitionByRange(sortCols.map(col): _*)
            .sortWithinPartitions(sortCols.map(col): _*)
            .write.mode("overwrite").parquet(target.toString)
        case None => fs.delete(target, true): Unit
      }
      onWrite()
      settled = rows match {
        case Some(_) =>
          fs.exists(new org.apache.hadoop.fs.Path(target, "_SUCCESS"))
        case None => !fs.exists(target)
      }
    }
  }

  /** Read the [[componentBatch]]-maintained store as one
    * (id, component, group_size) table — the `sigComponentsTable` shape,
    * so every batch consumer (d07's label scan, c17/c19's
    * `softDedupWeightsFromComponents`, d11's `componentStatsFromLabels`)
    * serves from the streamed store unchanged. Heals interrupted
    * compactions, resolves last-writer-wins per id, and never touches the
    * pair stage (PlanSpec pins the zero-rebuild serving). Returns an
    * empty table when no batch has produced a pair yet (every doc still a
    * singleton — the batch table's contract). */
  def loadComponentIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no index at $indexDir")
    val labelsRoot = new org.apache.hadoop.fs.Path(s"$indexDir/labels")
    lockFor(indexDir).synchronized {
      if (fs.exists(labelsRoot)) healCompaction(fs, labelsRoot)
      val sigsRoot = new org.apache.hadoop.fs.Path(s"$indexDir/sigs")
      if (fs.exists(sigsRoot)) healCompaction(fs, sigsRoot)
    }
    val dirs =
      if (!fs.exists(labelsRoot)) Array.empty[String]
      else fs.listStatus(labelsRoot).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("batch=")).map(_.toString).sorted
    if (dirs.isEmpty)
      spark.range(0).select(col("id"), col("id").as("component"),
        col("id").as("group_size"))
    else
      resolveLatest(spark.read.parquet(dirs.toIndexedSeq: _*))
        .select(col("id"), col("component"), col("group_size"))
  }

  /** Compact both component-store sub-indexes — the signature index with
    * an id-distinct doc-sorted fold, the label index by folding every
    * merged partition to the newest row per id (keeping the in-row `__b`
    * stamp, so precedence against not-yet-compacted later batches is
    * unchanged). Same committed-horizon PRECONDITION as [[compactIndex]];
    * returns true only when both sub-compactions committed (or had
    * nothing to merge). */
  def compactComponentIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, uptoBatchId: Long,
      onStep: String => Unit = _ => ()): Boolean =
    // the ROOT lock serializes against componentBatch/loadComponentIndex
    // (which key on indexDir, not the sub-dirs): without it a same-JVM
    // reader's heal could race a sub-compaction's aside/commit window.
    // compactPartitions takes its own sub-dir monitor inside — a strict
    // child of this one, taken nowhere else first, so no deadlock.
    lockFor(indexDir).synchronized {
      val sigsOk = compactPartitions(spark, s"$indexDir/sigs", uptoBatchId,
        onStep)(_.dropDuplicates("doc_id").sort(col("doc_id")))
      val labelsOk = compactPartitions(spark, s"$indexDir/labels", uptoBatchId,
        onStep)(df => resolveLatest(df.dropDuplicates()).sort(col("id")))
      sigsOk && labelsOk
    }

  /** Persist-or-check a single integer parameter under an index root — the
    * bucket index's width contract made MACHINE-enforced (round-18 ADVICE
    * #2): caller discipline alone let a later batch append at a different
    * `w`, silently mixing incompatible bucket spaces in one index (probed
    * reads then just miss rows). The FIRST batch records the value as a
    * tiny `_meta.<key>` file; every later batch must match, failing loudly
    * otherwise. The file is invisible to the partition machinery (readers
    * and compaction enumerate only `batch=`-prefixed directories). Callers
    * hold the index lock / fence, so first-write races stay in-process. */
  private def requireMeta(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, key: String, value: Long): Unit = {
    val meta = new org.apache.hadoop.fs.Path(root, s"_meta.$key")
    // CRASH-SAFE publish (round-19 ADVICE #2): the old create-then-write
    // left an EMPTY _meta file if the process died between create and
    // close, after which every later batch failed the mismatch require
    // against recorded="" — a permanently bricked index. Now the value
    // lands complete under a temp name and an atomic rename publishes it,
    // so the visible file is never partial; an empty/short file (the one
    // legacy crash shape) reads as ABSENT and is healed by re-publishing.
    def readMeta(): Option[String] =
      if (!fs.exists(meta)) None
      else {
        val in = fs.open(meta)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
        if (s.isEmpty) None else Some(s)
      }
    var recorded = readMeta()
    var attempts = 0
    while (recorded.isEmpty) {
      attempts += 1
      require(attempts <= 5,
        s"_meta.$key under $root could not be published after 5 attempts - " +
          "the filesystem keeps surfacing an empty or vanishing meta file")
      // heal the empty crash remnant — narrowly: only a zero-length file
      // (whitespace-only content cannot be produced by the atomic publish)
      if (fs.exists(meta) && fs.getFileStatus(meta).getLen == 0)
        fs.delete(meta, false): Unit
      val tmp = new org.apache.hadoop.fs.Path(root,
        s"._meta.$key.tmp-${java.util.UUID.randomUUID}")
      val out = fs.create(tmp, true)
      try out.write(value.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      // rename is the atomic publish; losing a cross-process first-write
      // race (dest already exists) is fine — re-read and compare below.
      // Callers hold the index lock / fence, so the race window is the
      // documented cross-process first-batch case only.
      if (fs.exists(meta) || !fs.rename(tmp, meta)) fs.delete(tmp, false): Unit
      recorded = readMeta()
    }
    require(recorded.contains(value.toString),
      s"index at $root was created with $key=${recorded.getOrElse("")} but " +
        s"this batch offers $key=$value - a stream cannot re-bucket " +
        "retroactively; a parameter change is a NEW index")
  }

  /** The width recorded by [[bucketBatch]]'s first batch — lets serving
    * code derive its probe configuration from the INDEX instead of caller
    * knowledge (the `_meta` contract's read side). */
  def bucketIndexWidth(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Int = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = new org.apache.hadoop.fs.Path(root, "_meta.w")
    require(fs.exists(meta), s"no _meta.w under $indexDir - not a " +
      "bucketBatch-maintained index (or created before the width contract)")
    val in = fs.open(meta)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
    finally in.close()
  }

  /** Recover an interrupted [[compactIndex]] run. For each `.old-<id>` aside
    * copy: if `batch=<id>` exists the commit rename happened — the aside is
    * redundant (its content is inside the merged partition), delete it; if
    * `batch=<id>` is absent the crash hit the aside→commit window — restore
    * the original, losing nothing (the merged tmp is deleted either way and
    * simply re-built by the next compaction). Idempotent and cheap (one
    * directory listing); called before every index read so readers never see
    * a post-crash index with a hidden partition. */
  private def healCompaction(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    val dirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
    dirs.filter(_.getName.startsWith(".old-")).foreach { aside =>
      val id = aside.getName.stripPrefix(".old-")
      val target = new org.apache.hadoop.fs.Path(root, s"batch=$id")
      if (fs.exists(target)) fs.delete(aside, true)
      else require(fs.rename(aside, target),
        s"healCompaction: restore $aside -> $target failed")
    }
    dirs.filter(_.getName.startsWith(".compact-"))
      .foreach(p => fs.delete(p, true))
  }

  /** The signature-index partitions of batches BEFORE `batchId` (a replayed
    * batch must not see its own previous postings). */
  private def earlierIndex(batch: DataFrame, indexDir: String,
      batchId: Long): Option[DataFrame] = {
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    healCompaction(fs, root) // a crashed compaction must not hide a partition
    val dirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        p.getName.startsWith("batch=") &&
          p.getName.stripPrefix("batch=").toLongOption.exists(_ < batchId)
      }
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(_.toString).toIndexedSeq: _*))
  }

  /** The [[nearDedupBatch]] signature index read back as a posting relation
    * in the [[graft.ext.DedupOps.bandPostings]] shape `(__id, band, bsig)`
    * — the adapter that lets the BATCH serving path
    * ([[graft.ext.DedupOps.dropNearDuplicatesMinhashFromPostings]], d09's
    * cross-corpus probe) read the stream's store directly (round-15 NEXT
    * #4). Heals interrupted compactions first and distincts (a post-crash
    * index may transiently hold duplicated postings — see
    * [[compactIndex]]); returns None when the index is empty.
    *
    * ONE STORE, BOTH PATHS — and its limit: the index and the batch
    * [[graft.ext.Dedup]] minhashPostTable share the bandPostings schema,
    * the d02 configuration, and the (band, bsig) sort. Spec-pinned: for a
    * corpus ingested in a single micro-batch the index is bit-identical to
    * the batch table semi-joined to d02's kept set, and the batch
    * CROSS-CORPUS operator
    * ([[graft.ext.DedupOps.dropNearDuplicatesAgainstFromPostings]], the
    * d09 serving shape) probing this index as its reference postings
    * computes exactly the cross-batch drop the stream applies to its next
    * micro-batch. The stores cannot unify further, by semantics rather
    * than layout: the batch table must hold EVERY doc's postings — the
    * within-corpus greedy keep reads the full relation (a doc is dropped
    * because some bucket holds a smaller id, KEPT OR NOT, so the
    * survivors-only index cannot recompute that decision), and d09 probes
    * its reference un-deduped — while the streaming index must hold
    * SURVIVORS ONLY (first-seen-wins: retaining dropped docs' postings
    * would drop future docs against content that was itself removed, and
    * a replayed batch would match its own prior attempt). On transitive
    * bucket chains (1~2, 2~3, 1≁3) the two rules genuinely diverge:
    * batch d02 drops 3 (its bucket's min is 2), the stream keeps 3 (2
    * never entered the index). */
  def indexPostings(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    lockFor(indexDir).synchronized { healCompaction(fs, root) }
    val dirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(_.toString).toIndexedSeq: _*)
      .select(org.apache.spark.sql.functions.col("__id"),
        org.apache.spark.sql.functions.col("band"),
        org.apache.spark.sql.functions.col("bsig"))
      .distinct())
  }

  /** |cos| between two fitted components — the drift gauge between two
    * [[topComponentReport]] points (sign-invariant: a power iteration may
    * converge to ±v, which is the same direction). 1.0 = the common
    * direction is unchanged; a falling value is the corpus-drift alarm the
    * monitor exists for (re-fit per report, compare against the previous
    * report's component, alert under a threshold). */
  def componentDrift(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length && a.nonEmpty,
      s"componentDrift: incompatible components (${a.length} vs ${b.length})")
    def dot(x: Array[Double], y: Array[Double]): Double = {
      var acc = 0.0; var d = 0
      while (d < x.length) { acc += x(d) * y(d); d += 1 }
      acc
    }
    math.abs(dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)))
  }

  /** Record one [[topComponentReport]] fit as a MONITOR POINT — the
    * time-series composition of [[componentDrift]] (round-16 verdict #7):
    * each report's fitted component persists as `monitorDir/report=<id>`
    * (the [[tokenCountsBatch]] partition discipline applied to dim-sized
    * driver state: replay overwrites exactly its own point, per-report IO
    * is one tiny row). Feed successive report ids from the batch ids the
    * reports cover; [[componentDriftAlarms]] reads the series back. */
  def componentFitPoint(spark: org.apache.spark.sql.SparkSession,
      monitorDir: String, reportId: Long, fit: Array[Double]): Unit = {
    import spark.implicits._
    lockFor(monitorDir).synchronized {
      Seq((reportId, fit.toSeq)).toDF("report_id", "component")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$monitorDir/report=$reportId")
    }
  }

  /** The DRIFT ALARM over every recorded [[componentFitPoint]], in
    * report-id order: one row per consecutive report pair —
    * `(report_id, drift = |cos(v_t, v_prev)|, alarm = drift < threshold)`.
    * The closed monitoring loop the per-pair [[componentDrift]] gauge
    * lacks: ≥3 points make a SERIES, and the alarm fires at the first
    * report whose refreshed common direction moved past the threshold —
    * not before (a stable corpus gauges ≈1.0 at every step; spec-pinned on
    * a planted rotation schedule). State is |reports| × dim driver-side
    * doubles — KBs at any corpus size; the expensive half (the fit) was
    * already bounded by [[topComponentBatch]]'s sample rule. Returns an
    * empty series when fewer than two points exist. */
  def componentDriftAlarms(spark: org.apache.spark.sql.SparkSession,
      monitorDir: String, threshold: Double): Seq[(Long, Double, Boolean)] = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold in (0,1]: $threshold")
    val root = new org.apache.hadoop.fs.Path(monitorDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val parts = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("report="))
    if (parts.length < 2) return Seq.empty
    import spark.implicits._
    val points = spark.read.parquet(parts.map(_.toString).toIndexedSeq: _*)
      .select(col("report_id"), col("component"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    points.sliding(2).collect { case Array((_, prev), (id, cur)) =>
      val d = componentDrift(prev.toArray, cur.toArray)
      (id, d, d < threshold)
    }.toSeq
  }

  /** Record one [[klDriftReport]]'s per-source KL points as a MONITOR
    * POINT — the [[componentFitPoint]] discipline applied to the token
    * distribution gauge (round-17 verdict #8: the component-drift series
    * got its alarm composition in round 17; this is the KL stream's
    * twin): each report's (source, kl_corpus) rows persist as
    * `monitorDir/report=<id>` with the report id folded into the rows,
    * so a replayed report overwrites exactly its own point. Per-report
    * IO is |sources| rows — KBs at any corpus size. */
  def klDriftPoint(monitorDir: String, reportId: Long, report: DataFrame,
      byCol: String): Unit =
    lockFor(monitorDir).synchronized {
      report.select(lit(reportId).as("report_id"), col(byCol),
          col("kl_corpus").as("kl"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$monitorDir/report=$reportId")
    }

  /** The DRIFT ALARM over every recorded [[klDriftPoint]], per source in
    * report-id order: one row per consecutive report pair per source —
    * `(report_id, <byCol>, kl, drift = |kl_t − kl_prev|, alarm = drift >
    * threshold)`. A stable source's KL-vs-corpus gauge moves ~nothing
    * between reports; a source whose token distribution SHIFTS jumps at
    * the report that first covers the shifted batches — the alarm fires
    * there and not before (spec-pinned on a planted drifting source).
    * A source absent from some report pairs its surviving points
    * (consecutive PRESENT points — absence means no tokens, not
    * drift). Returns an empty series (correct schema) when fewer than
    * two reports exist. State is |sources| × |reports| rows — driver-
    * negligible; the expensive half (the counts) was already
    * batch-partitioned by [[tokenCountsBatch]]. */
  def klDriftAlarms(spark: org.apache.spark.sql.SparkSession,
      monitorDir: String, byCol: String, threshold: Double,
      byType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType): DataFrame = {
    require(threshold > 0.0, s"threshold > 0: $threshold")
    val root = new org.apache.hadoop.fs.Path(monitorDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(root)) Array.empty[org.apache.hadoop.fs.Path]
      else fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("report="))
    val source =
      if (parts.length < 2)
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("report_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField(byCol, byType),
            org.apache.spark.sql.types.StructField("kl",
              org.apache.spark.sql.types.DoubleType))))
      else spark.read.parquet(parts.map(_.toString).toIndexedSeq: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(byCol)).orderBy(col("report_id"))
    source
      .withColumn("__prev", lag(col("kl"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("drift", abs(col("kl") - col("__prev")))
      .select(col("report_id"), col(byCol), col("kl"), col("drift"),
        (col("drift") > threshold).as("alarm"))
  }

  /** Driver-side benchmark hash set from a static benchmark table — the
    * exact form only; callers that cannot bound the eval suite should use
    * [[benchmarkGrams]], which switches to the Bloom form past
    * `maxExactGrams`. */
  def benchmarkHashes(benchmark: DataFrame, textCol: String, n: Int = 8): Seq[Long] = {
    import benchmark.sparkSession.implicits._
    gramHashes(benchmark, textCol, n).as[Long].collect().toSeq
  }

  // ------------------------------------------------ incremental KL drift
  /** Incremental token-count state for streaming distribution monitoring —
    * the c14 `klDrift` report fed from a stream: each micro-batch writes
    * its OWN (byCol, __tok, __c) aggregate as `countsDir/batch=<id>`, the
    * [[nearDedupBatch]] signature-index write discipline applied to counts:
    *
    *   - replay idempotency for free — a replayed batch OVERWRITES exactly
    *     its own partition (rewriting it to absent when the batch is
    *     empty), never double-counts;
    *   - per-batch IO is BATCH-sized (one aggregate write), never
    *     state-sized — no read-merge-rewrite of the whole vocabulary per
    *     micro-batch;
    *   - report cost grows with the partition count until compacted; the
    *     [[compactIndex]] rename-aside pattern applies verbatim when batch
    *     partitions accumulate (counts merge by sum instead of distinct).
    *
    * Use as `stream.writeStream.foreachBatch(tokenCountsBatch(dir, "text",
    * "source") _)`. */
  def tokenCountsBatch(countsDir: String, textCol: String, byCol: String)
      (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val counts = graft.ext.CurationOps.tokenCounts(batch, textCol, byCol)
      .persist()
    try lockFor(countsDir).synchronized {
      val root = new org.apache.hadoop.fs.Path(countsDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(root)
      val target = new org.apache.hadoop.fs.Path(s"$countsDir/batch=$batchId")
      // empty batch -> absent partition (an empty parquet dir has no schema
      // to read back); a replayed batch still deletes its prior attempt
      if (counts.isEmpty) fs.delete(target, true)
      else counts.write.mode("overwrite").parquet(target.toString)
    } finally counts.unpersist(false)
  }

  /** The c14 KL-drift report over everything [[tokenCountsBatch]] has
    * accumulated: sum-merge the batch partitions to one (byCol, token)
    * count table (vocabulary-sized — the merge never touches document
    * text), then the exact [[graft.ext.CurationOps.klFromCounts]] math, so
    * the streaming report is BIT-identical to running the batch `klDrift`
    * over the union of all micro-batches (spec-pinned). Returns the empty
    * report when no batch has written yet. */
  def klDriftReport(spark: org.apache.spark.sql.SparkSession,
      countsDir: String, byCol: String,
      byType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(countsDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(root)) Array.empty[org.apache.hadoop.fs.Path]
      else fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("batch="))
    // Absent state -> empty report, derived from the SAME klFromCounts
    // plan the non-empty path runs over an empty tokenCounts-shaped frame
    // (byType = the group column's type, caller-overridable), so both
    // paths always agree on schema — a hand-written StructType here would
    // silently diverge for a non-string byCol exactly when state happens
    // to be absent (round-10 ADVICE).
    val source =
      if (parts.isEmpty)
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(byCol, byType),
            org.apache.spark.sql.types.StructField("__tok",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("__c",
              org.apache.spark.sql.types.LongType))))
      else spark.read.parquet(parts.map(_.toString).toIndexedSeq: _*)
    val merged = source
      .groupBy(col(byCol), col("__tok"))
      .agg(sum(col("__c")).as("__c"))
    graft.ext.CurationOps.klFromCounts(merged, byCol)
  }

  // ------------------------------------------ embedding top-component drift
  /** Streaming twin of the s30 top-principal-component fit — the
    * corpus-drift monitor for EMBEDDING spaces (round-15 NEXT #6), the
    * [[tokenCountsBatch]] discipline applied to the ABTT primitives: each
    * micro-batch appends its training-eligible vectors (`idCol` <
    * `sampleMax` — the s30/s15 bounded-sample rule, so state is
    * sample-sized, never stream-sized) as a `sampleDir/batch=<id>`
    * partition. A replayed batch overwrites its own partition (idempotent
    * replay); an empty batch deletes it. */
  def topComponentBatch(sampleDir: String, idCol: String, vecCol: String,
      sampleMax: Long = 256L)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val sample = batch.filter(col(idCol) < sampleMax)
      .select(col(idCol), col(vecCol)).persist()
    try lockFor(sampleDir).synchronized {
      val root = new org.apache.hadoop.fs.Path(sampleDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(root)
      val target = new org.apache.hadoop.fs.Path(s"$sampleDir/batch=$batchId")
      if (sample.isEmpty) fs.delete(target, true)
      else sample.write.mode("overwrite").parquet(target.toString)
    } finally sample.unpersist(false)
  }

  /** Fit the top component over everything [[topComponentBatch]] has
    * accumulated: read the union of batch partitions and run the EXACT
    * batch [[graft.ext.Similarity.topComponentFit]] — whose driver fold is
    * id-sorted and therefore independent of how rows arrived — so the
    * streamed fit is BIT-identical to fitting the union of all
    * micro-batches in one batch job (spec-pinned). Returns None when no
    * batch has written yet (the fit has no empty-sample meaning).
    * Monitoring shape: re-fit per report and compare the component across
    * reports (cosine between fits) to watch the common direction drift as
    * the corpus grows.
    *
    * BOUND (behavior change in round 18 — release note): the forwarded
    * [[graft.ext.Similarity.topComponentFit]] now FAILS (IllegalArgument)
    * when the accumulated sample exceeds its `maxSample` default of 65536
    * rows, instead of fitting an unbounded driver collect. The
    * [[topComponentBatch]] writer's `sampleMax` id-cut keeps in-repo
    * stores far below the bound; an external caller accumulating a larger
    * sample must re-point `sampleMax`/`maxSample` deliberately — the
    * fail-not-truncate contract is intentional (a silent cut would change
    * the fitted component under a contract that promises the exact
    * accumulated sample). */
  def topComponentReport(spark: org.apache.spark.sql.SparkSession,
      sampleDir: String, idCol: String, vecCol: String, iters: Int = 8)
      : Option[(Array[Double], Array[Double])] = {
    val root = new org.apache.hadoop.fs.Path(sampleDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(root)) Array.empty[org.apache.hadoop.fs.Path]
      else fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("batch="))
    if (parts.isEmpty) None
    else Some(graft.ext.Similarity.topComponentFit(
      spark.read.parquet(parts.map(_.toString).toIndexedSeq: _*),
      idCol, vecCol, iters))
  }

  // --------------------------------------------- incremental corpus report
  /** Incremental doc-stat state for the c15 corpus report over a stream —
    * the [[tokenCountsBatch]] discipline applied to the dataset-card
    * accounting: each micro-batch writes its (source, lang) cell stats
    * (n_docs / n_tokens / n_chars / max_doc_tokens — all sum/max-mergeable)
    * as `statsDir/batch=<id>`. Replay overwrites its own partition;
    * per-batch IO is one |sources×langs|-row aggregate. */
  def docStatsBatch(statsDir: String, textCol: String, sourceCol: String,
      langCol: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val stats = batch
      .withColumn("__ntok", size(toks(col(textCol))).cast("long"))
      .withColumn("__nchr", length(col(textCol)).cast("long"))
      .groupBy(col(sourceCol), col(langCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__ntok")).as("n_tokens"),
        sum(col("__nchr")).as("n_chars"),
        max(col("__ntok")).as("max_doc_tokens"))
      .persist()
    try lockFor(statsDir).synchronized {
      val root = new org.apache.hadoop.fs.Path(statsDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(root)
      val target = new org.apache.hadoop.fs.Path(s"$statsDir/batch=$batchId")
      if (stats.isEmpty) fs.delete(target, true)
      else stats.write.mode("overwrite").parquet(target.toString)
    } finally stats.unpersist(false)
  }

  /** The c15 rollup report over everything [[docStatsBatch]] accumulated:
    * merge the cell partitions (sums re-sum, maxes re-max — every stat is
    * associative), then the SAME rollup lattice and `(all)` labels as the
    * batch [[graft.ext.CurationOps.corpusReport]], so the streamed report
    * equals the batch operator over the union of all micro-batches exactly
    * (integer-only — spec-pinned). */
  def corpusReportStream(spark: org.apache.spark.sql.SparkSession,
      statsDir: String, sourceCol: String = "source",
      langCol: String = "lang"): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(statsDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(root)) Array.empty[org.apache.hadoop.fs.Path]
      else fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("batch="))
    // Absent state -> empty report through the SAME rollup plan over an
    // empty stats-shaped frame, so the empty and non-empty paths can never
    // disagree on schema (round-10 ADVICE; the group columns surface as
    // coalesce(col, '(all)') strings on both paths either way).
    val source =
      if (parts.isEmpty)
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(
            Seq(sourceCol, langCol).map(n =>
              org.apache.spark.sql.types.StructField(n,
                org.apache.spark.sql.types.StringType)) ++
            Seq("n_docs", "n_tokens", "n_chars", "max_doc_tokens").map(n =>
              org.apache.spark.sql.types.StructField(n,
                org.apache.spark.sql.types.LongType))))
      else spark.read.parquet(parts.map(_.toString).toIndexedSeq: _*)
    source
      .rollup(col(sourceCol), col(langCol))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        max(col("max_doc_tokens")).as("max_doc_tokens"))
      .select(
        coalesce(col(sourceCol), lit("(all)")).as("source_grp"),
        coalesce(col(langCol), lit("(all)")).as("lang_grp"),
        col("n_docs"), col("n_tokens"), col("n_chars"),
        col("max_doc_tokens"))
  }

  /** [[compactCounts]] for the doc-stat state: sum/max-merge committed
    * partitions (same `uptoBatchId` correctness precondition — replaying a
    * compacted batch would double-count). */
  def compactStats(spark: org.apache.spark.sql.SparkSession,
      statsDir: String, uptoBatchId: Long, sourceCol: String = "source",
      langCol: String = "lang", onStep: String => Unit = _ => ()): Boolean =
    compactPartitions(spark, statsDir, uptoBatchId, onStep)(
      _.groupBy(col(sourceCol), col(langCol))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars"),
          max(col("max_doc_tokens")).as("max_doc_tokens")))
}
