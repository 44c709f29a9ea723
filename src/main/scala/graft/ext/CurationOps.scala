package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps._

/** Library-facing corpus-curation operators — the generic forms of the
  * oracle-checked c01–c03 queries, parameterized by table/column/threshold.
  * Same scale contract as [[DedupOps]]: keyed equi-joins and per-partition
  * windows only, never an all-pairs product or corpus-sized driver state.
  */
object CurationOps {

  /** Per-document count of distinct full `n`-grams shared with `benchmark`
    * (the held-out eval set). Returns one row per corpus row:
    * (idCol, n_bad) with n_bad = 0 for clean docs.
    *
    * Scale shape: both sides explode to 60-bit md5 n-gram hashes (8-byte
    * join keys); the benchmark hash set is distinct'd and is tiny next to
    * the corpus, so AQE broadcasts it when it fits — no hint needed, and no
    * corpus-side shuffle beyond the per-doc count. */
  private def grams(df: DataFrame, idCol: String, textCol: String,
      n: Int, out: String): DataFrame = df
    .withColumn("__tk", toks(col(textCol)))
    .select(col(idCol).as(out),
      explode_outer(array_distinct(ngramsExact(col("__tk"), n))).as("__ng"))
    .filter(col("__ng").isNotNull) // outer: no inferred-filter re-eval (see TextOps)
    .select(col(out), h60(col("__ng")).as("__h"))

  def contaminationCounts(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val bench = grams(benchmark, idCol, textCol, n, "__bid").select(col("__h")).distinct()
    val hits = grams(corpus, idCol, textCol, n, "__id")
      .join(bench, Seq("__h"))
      .groupBy(col("__id")).agg(count(lit(1)).as("__hit"))
    corpus.select(col(idCol))
      .join(hits.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__hit"), lit(0L)).as("n_bad"))
  }

  /** Remove corpus rows sharing at least `minOverlap` distinct full
    * `n`-grams with `benchmark` — the standard published decontamination
    * step (n=13 for web-scale corpora). All corpus columns pass through.
    *
    * Plan shape: the anti-join reads the corpus twice (a narrow id+text
    * scan for gram generation, the full scan for output) but never shuffles
    * it — the contaminated id set is small and AQE broadcasts it. That is
    * the right default for a RAW table scan at 100 TB. When the corpus is
    * instead an EXPENSIVE upstream chain (filters/windows/joins), pass
    * `singlePass = true`: all non-id columns ride the n-gram explode packed
    * in one struct, the benchmark left-join counts hits per doc, and a
    * per-doc filter replaces the anti-join — the corpus chain evaluates
    * exactly once at the price of one corpus-keyed shuffle (the c05
    * pipeline's measured crossover,
    * graft.ext.Curation.c05CurationPipeline). */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 13, minOverlap: Long = 1L,
      singlePass: Boolean = false): DataFrame = {
    if (singlePass) {
      val outCols = corpus.columns.toSeq
      val bench = grams(benchmark, idCol, textCol, n, "__bid")
        .select(col("__h").as("__bh")).distinct()
      corpus
        // __rid keys the re-group per ROW, not per id: duplicate-id rows keep
        // their multiplicity (the two-pass anti-join preserves it too) instead
        // of collapsing to one arbitrarily-chosen first(). Note the residual
        // duplicate-id divergence: this form judges each row on its OWN text,
        // the two-pass form drops every row of a flagged id — identical
        // whenever idCol is unique, which the two-pass contract assumes
        // anyway (contaminationCounts pools grams across same-id rows).
        .withColumn("__rid", monotonically_increasing_id())
        .withColumn("__rest", struct(outCols.map(col): _*))
        .select(col("__rid"), col("__rest"),
          explode_outer(array_distinct(ngramsExact(toks(col(textCol)), n))).as("__ng"))
        // explode_outer keeps gram-less docs (null __ng → null hash → no match)
        .withColumn("__h", h60(col("__ng")))
        .join(bench, col("__h") === col("__bh"), "left")
        // benchmark hashes are distinct'd, corpus grams per-doc distinct'd →
        // each shared gram matches exactly once, so the count IS n_bad
        .groupBy(col("__rid"))
        .agg(first(col("__rest")).as("__rest"),
          sum(when(col("__bh").isNotNull, 1L).otherwise(0L)).as("__hit"))
        .filter(col("__hit") < minOverlap)
        // original column order, idCol included wherever the corpus put it
        .select(outCols.map(c => col("__rest").getField(c).as(c)): _*)
    } else {
      val bad = contaminationCounts(corpus, benchmark, idCol, textCol, n)
        .filter(col("n_bad") >= minOverlap).select(col(idCol))
      // anti-join against the CONTAMINATED ids (small), not semi against the
      // keep set (corpus-sized) — same reasoning as dropNearDuplicatesMinhash
      corpus.join(bad, Seq(idCol), "left_anti")
    }
  }

  /** [[decontaminate]] with a Bloom PRE-FILTER on the corpus side — the
    * shape for decontamination corpora past broadcast size. The two-pass
    * form's gram join stays corpus-shuffle-free only while the benchmark
    * hash set fits a runtime broadcast; a web-scale eval suite (10⁸ grams ≈
    * 800 MB of 8-byte hashes) forces that join to shuffle EVERY corpus
    * gram. Here the benchmark grams aggregate into a fixed-size Bloom
    * sketch (≈ 14.4 bits/gram at the default fpp 1e-3, ~4.4× smaller than
    * the hash set; the build is distributed, the driver holds only the
    * sketch), every corpus row probes it scan-side with the codegen'd
    * broadcast-handle [[graft.functions.BloomBroadcastContainsAny]] (the
    * plan never carries the sketch bytes), and only CANDIDATE docs (true
    * hits plus the fpp sliver) explode into the exact gram join.
    *
    * EXACT result, not approximate: a Bloom filter has no false negatives,
    * so every truly contaminated doc reaches the verification join, and a
    * false-positive candidate is then kept by the exact count — output ≡
    * [[decontaminate]] (CurationSpec parity). Streaming twin:
    * [[graft.streaming.CurationStream.benchmarkGrams]]. */
  /** The (gram count, serialized Bloom) sketch of a benchmark's n-grams —
    * the BUILD half of [[decontaminateBloom]], exposed (round 20) so a
    * caller that maintains the sketch per benchmark content can memoize
    * it instead of re-aggregating the benchmark per invocation. The
    * sketch is partitioning-independent: Bloom insertion ORs bits per
    * item and the partial-filter merge is a bitwise OR, so the same gram
    * set yields the same bytes under any task order — and even a
    * hypothetically different sketch could not change results, because
    * the exact verification join downstream keeps only true overlaps. */
  def benchmarkSketch(benchmark: DataFrame, idCol: String, textCol: String,
      n: Int = 13, fpp: Double = 1e-3): (Long, Array[Byte]) = {
    val bench = grams(benchmark, idCol, textCol, n, "__bid")
      .select(col("__h")).distinct()
    val nGrams = bench.count()
    if (nGrams == 0L) (0L, Array.emptyByteArray)
    else {
      val bf = bench.stat.bloomFilter("__h", nGrams, fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      (nGrams, bos.toByteArray)
    }
  }

  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 13, minOverlap: Long = 1L,
      fpp: Double = 1e-3,
      knownSketch: Option[(Long, Array[Byte])] = None): DataFrame = {
    val bench = grams(benchmark, idCol, textCol, n, "__bid")
      .select(col("__h")).distinct()
    val (nGrams, sketchBytes) = knownSketch.getOrElse(
      benchmarkSketch(benchmark, idCol, textCol, n, fpp))
    if (nGrams == 0L) return corpus // gram-less benchmark: nothing overlaps
    // broadcast handle, not a plan literal: a web-scale sketch (10⁸ grams at
    // fpp 1e-3 ≈ 170 MiB) embedded in the plan would inflate driver plan
    // memory and every analyzer/optimizer copy; the broadcast torrents it to
    // each executor once and the plan carries only the handle
    val bloom = corpus.sparkSession.sparkContext.broadcast(sketchBytes)
    val cand = corpus
      .withColumn("__tk", toks(col(textCol)))
      // materialized: predicate pushdown would otherwise inline the whole
      // tokenize+gram chain into the probe filter, where the token array
      // inside the n-gram lambda re-evaluates PER GRAM (measured 17× at
      // sf1.0) — the probe must reference the computed attribute
      .withColumn("__ghs", graft.functions.Materialize.materialized(
        transform(array_distinct(ngramsExact(col("__tk"), n)), g => h60(g))))
      .filter(graft.functions.BloomExprs.containsAnyBroadcast(bloom, col("__ghs")))
      .select(col(idCol), explode_outer(col("__ghs")).as("__h"))
      .filter(col("__h").isNotNull) // outer: no inferred-filter re-eval
    val bad = cand.join(bench, Seq("__h"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("__hit"))
      .filter(col("__hit") >= minOverlap)
      .select(col(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** Concat-then-chunk sequence packing: within each `partCol` partition,
    * documents are concatenated in `orderCol` order and the token stream is
    * split at `maxLen` boundaries. Adds `n_tok`, `bin` (which chunk the
    * doc's first token lands in) and `start_off` (offset within that chunk).
    *
    * One running-sum window per partition: `partCol` must be the shard-ish
    * key at scale so no single window partition approaches executor memory. */
  def packSequences(df: DataFrame, textCol: String, partCol: String,
      orderCol: String, maxLen: Int): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
    df.withColumn("n_tok", size(toks(col(textCol))).cast("long"))
      .withColumn("__cum", sum(col("n_tok")).over(w))
      .withColumn("bin", ((col("__cum") - col("n_tok")) / lit(maxLen)).cast("long"))
      .withColumn("start_off", (col("__cum") - col("n_tok")) % maxLen)
      .drop("__cum")
  }

  /** Deterministic hash-threshold stratified sampling: keep a row iff the
    * salted md5 hash of its id falls under its stratum's threshold in
    * [0, 1e6]. `rates` maps stratum value → keep probability; missing
    * strata default to 1.0 (kept in full).
    *
    * Stateless and reproducible: the same row is kept on every run, every
    * engine, and every subset of the data — the property that lets a 100 TB
    * sample be re-derived instead of stored. No corpus shuffle: the
    * threshold table is |strata| rows, broadcast by construction. */
  /** Mixture EPOCH/REPETITION plan — the data-recipe step between c04's
    * measured weights and an actual training run: given target mixture
    * weights and a total token budget, each source's target either fits
    * its available tokens (full_epochs 0, a fractional sampling rate) or
    * exceeds them (the published repeat-curated-sources-N-epochs setting:
    * full passes plus a fractional remainder pass). All quantities derive
    * from exact integer token counts; `frac_rate` is the only float and is
    * nudge-rounded. Sources without a weight plan to zero (kept in the
    * report — silent omission would hide a typo'd source name).
    *
    * Scale shape: one |sources|-row aggregation + a broadcast weight
    * table; nothing corpus-sized moves. Feed `frac_rate` to
    * [[sampleStratified]] to materialize the remainder pass. */
  def mixturePlan(df: DataFrame, sourceCol: String, textCol: String,
      weights: Map[String, Double], budgetTokens: Long): DataFrame = {
    require(weights.values.forall(_ >= 0.0), "weights must be non-negative")
    require(budgetTokens >= 0, "budget must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toSeq.toDF(sourceCol, "__w")
    df.withColumn("__ntok", size(toks(col(textCol))).cast("long"))
      .groupBy(col(sourceCol)).agg(sum(col("__ntok")).as("available_tokens"))
      .join(broadcast(w), Seq(sourceCol), "left")
      .withColumn("target_tokens",
        floor(coalesce(col("__w"), lit(0.0d)) * budgetTokens).cast("long"))
      .withColumn("full_epochs", expr("target_tokens DIV available_tokens"))
      .withColumn("__rem", col("target_tokens") % col("available_tokens"))
      .withColumn("frac_rate",
        round(col("__rem").cast("double") / col("available_tokens") + 1e-9, 4))
      .select(col(sourceCol), col("available_tokens"), col("target_tokens"),
        col("full_epochs"), col("frac_rate"))
  }

  def sampleStratified(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], salt: String = "samp"): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      "sampling rates must be in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val thr = rates.toSeq.map { case (k, r) => (k, math.floor(r * 1e6).toLong) }
      .toDF(strataCol, "__thr")
    val hv = h60(concat(lit(salt), col(idCol).cast("string"))) % 1000000
    df.join(broadcast(thr), Seq(strataCol), "left")
      .filter(hv < coalesce(col("__thr"), lit(1000000L)))
      .drop("__thr")
  }

  /** Temperature-based mixture sampling — the standard multilingual
    * rebalancing (sampling probability ∝ token-share^alpha, renormalized):
    * alpha = 1 reproduces the natural mixture, alpha → 0 approaches uniform,
    * the published mBERT/XLM-R setting is alpha ≈ 0.3–0.7. `budgetFrac`
    * scales the total token budget (1.0 = as many tokens as the corpus has;
    * strata whose target exceeds their size are kept in full — no
    * upsampling, matching the hash-threshold mechanism).
    *
    * Scale shape (same contract as [[sampleStratified]]): two |strata|-row
    * aggregations (token totals, then the alpha-power normalizer) and a
    * broadcast threshold table; the corpus itself never shuffles and each
    * row's keep decision is the stateless salted-hash threshold — the same
    * row is kept on every run, engine, and data subset. */
  def sampleTemperature(df: DataFrame, strataCol: String, idCol: String,
      textCol: String, alpha: Double, budgetFrac: Double = 1.0,
      salt: String = "temp"): DataFrame = {
    require(alpha > 0.0, s"alpha must be > 0, got $alpha")
    require(budgetFrac > 0.0 && budgetFrac <= 1.0,
      s"budgetFrac must be in (0, 1], got $budgetFrac")
    val perStratum = df
      .withColumn("__ntok", size(toks(col(textCol))).cast("double"))
      .groupBy(col(strataCol)).agg(sum(col("__ntok")).as("__tokens"))
    val tot = perStratum.agg(sum(col("__tokens")).as("__tot"))
    val withTot = perStratum.crossJoin(broadcast(tot))
    val z = withTot
      .agg(sum(pow(col("__tokens") / col("__tot"), alpha)).as("__z"))
    // rate_l = min(1, q_l * budget / tokens_l) with q_l = p_l^alpha / Z and
    // budget = budgetFrac * total tokens; arithmetic kept left-to-right so
    // the DuckDB oracle reproduces it operation-for-operation
    val thr = withTot.crossJoin(broadcast(z))
      .withColumn("__rate", least(lit(1.0),
        pow(col("__tokens") / col("__tot"), alpha) / col("__z")
          * budgetFrac * col("__tot") / col("__tokens")))
      // +1e-7 pushes both engines' floor off exact-integer boundaries (the
      // rate is a ratio of irrational alpha-powers — accumulated last-ulp
      // differences are ~1e-10, three orders below the epsilon)
      .withColumn("__thr", floor(col("__rate") * 1e6 + 1e-7).cast("long"))
      .select(col(strataCol), col("__thr"))
    val hv = h60(concat(lit(salt), col(idCol).cast("string"))) % 1000000
    df.join(broadcast(thr), Seq(strataCol))
      .filter(hv < col("__thr"))
      .drop("__thr")
  }

  /** Overlapping token-window chunking — the RAG/context-window splitter: a
    * document becomes `ceil(max(n - overlap, 1) / stride)` chunks of up to
    * `chunkLen` tokens, consecutive chunks sharing `overlap` tokens
    * (stride = chunkLen − overlap). Chunk starts run while `start <
    * n − overlap` (plus the mandatory start 0), so a final window fully
    * contained in its predecessor is never emitted; zero-token documents
    * produce no chunks. Output: (idCol, chunk_idx, chunk_text, n_tok) —
    * the last chunk of a document may be shorter than `chunkLen`.
    *
    * Scale shape: pure per-row projection + generator — no shuffle, no
    * state; the explode follows the posexplode_outer + isNotNull house
    * pattern so no inferred filter re-tokenizes at the scan. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, overlap: Int = 0): DataFrame = {
    require(chunkLen > 0, s"chunkLen must be > 0, got $chunkLen")
    require(overlap >= 0 && overlap < chunkLen,
      s"overlap must be in [0, chunkLen), got $overlap")
    val stride = chunkLen - overlap
    df.withColumn("__tk", toks(col(textCol)))
      .withColumn("__n", size(col("__tk")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__tk"),
        posexplode_outer(sequence(lit(0),
          greatest(col("__n") - overlap - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "__start")))
      .filter(col("__start").isNotNull) // outer: no inferred-filter re-eval
      .withColumn("__chunk", slice(col("__tk"), col("__start") + 1, lit(chunkLen)))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).cast("long").as("n_tok"))
  }

  /** Deterministic training-shard assignment — the reproducible global
    * shuffle a training run needs: every row gets a stable (shard, pos)
    * from salted hashes of its id, so the exact same ordering can be
    * re-derived on any engine/run/subset instead of stored (the
    * [[sampleStratified]] philosophy applied to data ordering). `pos` is
    * dense 0..count−1 within each shard, ordered by an independent hash
    * with id tie-break.
    *
    * Scale shape: one hash-keyed exchange into `shards` partitions and a
    * per-shard sort — exactly the shuffle a sharded training-data write
    * performs anyway, so the operator adds nothing beyond it. Shard sizes
    * concentrate around n/shards (hash uniformity); no driver state. */
  def assignShards(df: DataFrame, idCol: String, shards: Int,
      salt: String = "shard"): DataFrame = {
    require(shards > 0, s"shards must be > 0, got $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col("__ord"), col(idCol))
    df.withColumn("shard",
        h60(concat(lit(salt), col(idCol).cast("string"))) % shards)
      .withColumn("__ord",
        h60(concat(lit(salt + ":ord"), col(idCol).cast("string"))))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__ord")
  }

  /** Token-budget prefix sampling — materialize a deterministic subset of
    * (just over) `totalTokens · numer / denom` tokens: documents are
    * ordered by a salted 60-bit hash (a reproducible global shuffle, the
    * [[assignShards]] ordering) and the minimal prefix whose cumulative
    * token count reaches the integer budget `floor(T·numer/denom)` is kept,
    * crossing document included. This is the "give me N tokens of this
    * source" step every pretraining mixture performs; unlike
    * [[sampleStratified]] the decision depends on the corpus total, so the
    * guarantee is per-run/per-engine determinism, not subset stability.
    *
    * Scale shape — NO corpus-wide sort and NO corpus-sized window (the c12
    * histogram discipline applied to a running budget): the hash's top 16
    * bits slice the order into 65536 ordered buckets; per-bucket token
    * sums form a histogram whose exclusive cumulative offsets come from a
    * histogram-sized window (the one deliberate single-partition window —
    * 65536 rows max, never the corpus); each document's keep decision is
    * then `bucket offset + within-bucket exclusive running sum < budget`,
    * where the within-bucket window is PARTITIONED by bucket (~1/65536 of
    * the corpus per partition). Budget arithmetic is all-integer — no
    * float-threshold edge cases. */
  def sampleTokenBudget(df: DataFrame, idCol: String, textCol: String,
      numer: Long, denom: Long, salt: String = "budget"): DataFrame =
    sampleTokenBudgetByCount(
      df.withColumn("__ntok", size(toks(col(textCol))).cast("long")),
      idCol, "__ntok", numer, denom, salt)

  /** [[sampleTokenBudget]] over a CALLER-SUPPLIED per-document token count
    * column — the seam that lets the budget run on real tokenizer counts
    * (e.g. [[TextAnalysis.bpeSegment]]'s `n_subwords`, the t27 loop) instead
    * of whitespace tokens: a training budget is denominated in the tokens
    * the model will actually see. Same bucketed decomposition, same
    * determinism contract. */
  def sampleTokenBudgetByCount(df: DataFrame, idCol: String, countCol: String,
      numer: Long, denom: Long, salt: String = "budget"): DataFrame = {
    require(numer >= 0 && denom > 0, s"bad budget fraction $numer/$denom")
    val base = df
      .withColumn("__ntok", col(countCol).cast("long"))
      .withColumn("__h", h60(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("__b", shiftright(col("__h"), 44))
    // ONE corpus aggregation feeds bucket offsets AND the grand total: the
    // histogram (≤ 65536 rows) persists, so deriving __T from it re-reads
    // the cached rows, never the corpus. Without this the corpus was
    // tokenized+hashed three times per call (hist, total, probe) — the
    // probe scan below is the only remaining re-scan, which is the right
    // trade at 100 TB (recompute a narrow projection vs cache the corpus).
    val hist = base.groupBy(col("__b")).agg(sum(col("__ntok")).as("__bsum"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offs = hist
      .withColumn("__off", coalesce(
        sum(col("__bsum")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__b"), col("__off"))
    val total = hist.agg(sum(col("__bsum")).as("__T"))
    val within = Window.partitionBy(col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(offs), Seq("__b"))
      .crossJoin(broadcast(total))
      .withColumn("__cb", col("__off") + coalesce(sum(col("__ntok")).over(within), lit(0L)))
      .filter(col("__cb") < expr(s"(__T * ${numer}L) div ${denom}L"))
      .select(col(idCol), col("__ntok").as("n_tok"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", hashed-unigram form):
    * score every document by the MEAN unigram log-likelihood ratio between
    * the TARGET slice's token distribution and the full raw corpus, with
    * add-`lambda` smoothing so tokens absent from the target stay finite.
    * Documents whose rounded score is positive look more target-like than
    * raw-corpus-like and carry `selected = 1` — the standard way to skim a
    * web-scale crawl for in-domain training data. Returns
    * (idCol, n_tok, dsir_logratio, selected); zero-token documents are
    * absent (they have no tokens to score).
    *
    * Scale shape: identical to [[TextAnalysis.unigramSurprise]] — one
    * token-keyed aggregation builds BOTH distributions in the same pass
    * (conditional count for the target), a 1-row totals broadcast, a
    * vocab-sized keyed join back to the token instances (AQE broadcasts it
    * when the vocabulary fits), and a doc-keyed mean via
    * [[TextOps.foldMean]] (sorted-fold, bit-deterministic across task
    * orders — avg(double) merge order flipped a 4-decimal rounding
    * boundary in round 9). The corpus is scanned once; no driver state. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, lambda: Double = 0.5): DataFrame = {
    require(lambda > 0, s"lambda must be > 0, got $lambda")
    val inst = df
      .withColumn("__tk", toks(col(textCol)))
      .withColumn("__tgt", targetPred)
      .select(col(idCol), col("__tgt"), explode_outer(col("__tk")).as("__tok"))
      .filter(col("__tok").isNotNull) // outer: no inferred-filter re-eval (see TextOps)
    val freq = inst.groupBy(col("__tok"))
      .agg(count(lit(1)).cast("double").as("__ca"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).cast("double").as("__ct"))
    val tot = freq.agg(sum(col("__ca")).as("__ta"), sum(col("__ct")).as("__tt"),
      count(lit(1)).cast("double").as("__v"))
    inst.join(freq, Seq("__tok"))
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        TextOps.foldMean(
          log((col("__ct") + lambda) / (col("__tt") + col("__v") * lambda)) -
          log((col("__ca") + lambda) / (col("__ta") + col("__v") * lambda)),
          count(lit(1))).as("dsir_logratio"))
      .withColumn("selected", (col("dsir_logratio") > 0).cast("long"))
  }

  /** CCNet-style perplexity bucketing: assign every scored document to the
    * head / middle / tail third of the corpus by a quality score (CCNet
    * buckets on LM perplexity — lower = cleaner; pair with
    * [[TextAnalysis.bigramSurprise]] for the self-trained proxy). Tie
    * groups never straddle a boundary: the bucket is decided by each
    * DISTINCT score's cumulative count (head iff 3·cum(s) ≤ n, middle iff
    * 3·cum(s) ≤ 2n), so equal scores always share a bucket and the
    * assignment is integer-exact and engine-replayable — no interpolated
    * quantile float compare, no position-dependent ntile split.
    *
    * Scale shape (round-12 verdict #2 — the c13 bucketed decomposition
    * applied to a continuous score domain): the earlier plan ran a
    * cumulative window over the DISTINCT-score histogram with no
    * partitionBy, which is histogram-sized only when scores are
    * discretized — a continuous double score (this operator's actual
    * input: per-doc LM means) has distinct count ≈ corpus count, so at
    * 100 TB the whole score set sorted in ONE task. Now:
    * [[graft.functions.Layout.sortableBits]] maps each score to an
    * order-preserving 64-bit integer whose top 16 bits are a monotone
    * bucket id (≤ 2¹⁶ buckets REGARDLESS of the score distribution);
    * one corpus aggregation counts rows per bucket (≤ 65536 rows — bounded
    * by the bucket space, never the corpus), the exclusive prefix offsets
    * fold on the driver (the LshTuning closed-form discipline; the rows
    * collected are capped at 2¹⁶ by construction); each document's global
    * cumulative count is then `bucket offset + count over a PARTITIONED
    * per-bucket RANGE window` (peers included, so equal scores still share
    * a bucket label), ~1/65536 of the corpus per partition. No
    * partition-less window anywhere in the plan (PlanSpec-pinned), no
    * distinct-score-sized broadcast, and the corpus is never globally
    * sorted — the textbook ntile-over-everything formulation would
    * range-shuffle 100 TB for a 3-way label. Triggers one Spark job at
    * call time (the bounded histogram collect). */
  private val lastPerplexityBase = new java.util.concurrent.atomic
    .AtomicReference[((AnyRef, String, String), DataFrame)](null)
  def perplexityBuckets(scored: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    // +0.0 folds −0.0 into +0.0 so SQL-equal scores share one bucket id
    // (groupBy normalizes −0.0; the bit pattern would not).
    // Persisted: the histogram pass and the label pass both read this frame,
    // and it is NARROW (id + score + bucket — bytes/row, not the corpus), so
    // caching it beats recomputing the caller's scoring pipeline twice (the
    // c13 persisted-histogram discipline; at 100 TB the upstream score is
    // typically an LM pass you never want to run again). ONE-ENTRY memo
    // keyed on the input's canonicalized plan: a repeated identical call
    // (bench sweeps, a re-run pipeline) reuses the persisted frame instead
    // of re-paying the upstream scoring, a DIFFERENT input evicts and
    // unpersists the previous handle — no per-call cache leak in a
    // long-lived JVM (the modelCache eviction discipline; a plain
    // unpersist-per-call re-paid the scoring every sweep, measured
    // 0.58 → 1.94 s on c12 at sf0.1).
    // key on the CANONICALIZED PLAN OBJECT, not its string: plan equality
    // includes literal data (LocalRelation rows), where the string form
    // prints only the schema and would collide two different inputs
    val key = (scored.queryExecution.analyzed.canonicalized: AnyRef,
      idCol, scoreCol)
    val base = lastPerplexityBase.synchronized {
      lastPerplexityBase.get match {
        case (k, df) if k == key => df
        case old =>
          val fresh = scored.withColumn("__bkt",
            shiftright(graft.functions.Layout
              .sortableBits(col(scoreCol) + lit(0.0d)), 48))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          lastPerplexityBase.set((key, fresh))
          if (old != null) old._2.unpersist(blocking = false)
          fresh
      }
    }
    val counts = base.groupBy(col("__bkt")).agg(count(lit(1)).as("__bc")).collect()
    // n counts every scored row (null scores included — they occupy the
    // front of the cumulative order, matching the previous plan's
    // nulls-first window, and drop from the output at the inner join below
    // exactly as they dropped from the previous plan's equi-join).
    val n = counts.map(_.getLong(1)).sum
    val sorted = counts.filter(!_.isNullAt(0))
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = n - sorted.map(_._2).sum // null-score rows precede all buckets
    val offs = sorted.map { case (b, c) => val o = acc; acc += c; (b, o) }
    val within = Window.partitionBy(col("__bkt")).orderBy(col(scoreCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .join(broadcast(offs.toSeq.toDF("__bkt", "__off")), Seq("__bkt"))
      .withColumn("__cum", col("__off") + count(lit(1)).over(within))
      .select(scored.columns.map(col) :+
        when(col("__cum") * 3 <= lit(n), "head")
          .when(col("__cum") * 3 <= lit(n) * 2, "middle")
          .otherwise("tail").as("bucket"): _*)
  }

  /** Leakage-safe train/val/test split: documents connected by a near-dup
    * pair relation (any of the `DedupOps.*Pairs` operators) land in the SAME
    * split, so paraphrases of a training document can never leak into the
    * held-out sets — the within-corpus counterpart of c01/d09's
    * train-vs-benchmark decontamination. Every document gets a
    * `split_group` (its near-dup component's minimum id via
    * [[DedupOps.connectedComponents]]; its own id when unpaired) and the
    * GROUP is hashed into the split, so membership is deterministic,
    * engine-replayable, and stable under corpus growth that doesn't touch
    * the group (the [[assignShards]] philosophy applied to splitting).
    * `fractions` are percentage points and must sum to 100.
    *
    * Scale shape: the pair relation holds only duplicates — orders of
    * magnitude smaller than the corpus — so the component labeling is the
    * size-adaptive [[DedupOps.connectedComponents]] machinery and the label
    * join back to the corpus is a small-side join AQE broadcasts; the split
    * itself is a pure hash projection. No corpus-sized shuffle anywhere. */
  def splitLeakageSafe(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String,
      fractions: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5),
      salt: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      s"fractions must be positive, got $fractions")
    require(fractions.map(_._2).sum == 100,
      s"fractions must sum to 100, got ${fractions.map(_._2).sum}")
    val comp = DedupOps.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as("__cid"), col("component"))
    val grouped = df
      .join(comp, col(idCol).cast("long") === col("__cid"), "left")
      .withColumn("split_group",
        coalesce(col("component"), col(idCol).cast("long")))
      .drop("__cid", "component")
    val pct = h60(concat(lit(salt), col("split_group").cast("string"))) % 100
    val splitCol = fractions.tail
      .foldLeft((fractions.head._2, when(pct < fractions.head._2, fractions.head._1))) {
        case ((cum, acc), (name, w)) => (cum + w, acc.when(pct < cum + w, name))
      }._2
    grouped.withColumn("split", splitCol)
  }

  /** Cluster-balanced coreset sampling: keep the `perCluster` rows NEAREST
    * their centroid from an assigned frame (the [[graft.ext.Similarity]]
    * k-means output shape) — every region of the embedding space
    * contributes equally many prototypical representatives, where uniform
    * sampling over-draws the dense regions (the stratified-sampling idea
    * of c03 applied to learned structure instead of a metadata column).
    * Ranking is (distCol asc, idCol asc) — feed the rounded `dist2`
    * k-means assignment column and the rank replays in any engine.
    *
    * Scale shape: one window partitioned by cluster over a projection —
    * per-partition sort, no corpus-wide order. Cluster sizes stay bounded
    * when k follows the corpus-proportional rule
    * ([[graft.ext.Dedup.semanticDedupNlist]]); for a pathologically
    * skewed clustering, rank with a bounded-heap TopKAgg per cluster
    * instead (the [[DedupOps.knn]] discipline). */
  def coresetSample(assigned: DataFrame, idCol: String, clusterCol: String,
      distCol: String, perCluster: Int): DataFrame = {
    require(perCluster >= 1, s"perCluster >= 1, got $perCluster")
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(col(distCol).asc, col(idCol).asc)
    assigned.withColumn("coreset_rank", row_number().over(w).cast("long"))
      .filter(col("coreset_rank") <= perCluster)
  }

  /** Weighted sample WITHOUT replacement (Efraimidis & Spirakis, "Weighted
    * random sampling with a reservoir", IPL 2006): keep the `n` rows with
    * the largest order-statistic key `u^(1/w)`, where `u` is a
    * DETERMINISTIC per-id uniform in (0, 1] derived from the md5-based
    * [[TextOps.h60]] over `"<salt>:<id>"` (the kmeans++ sampling recipe) —
    * each row's inclusion probability is mass-proportional to its weight,
    * replayable in any engine, and the whole draw is one ranking, no
    * sequential reservoir. THE consumer [[softDedupWeights]]'s scaladoc
    * promises: feeding its 1/|cluster| weights here yields a sample where
    * each duplicated content unit contributes ~one document in
    * expectation while every variant stays eligible.
    *
    * Determinism contract: the key is round(pow(u, 1/w) + 1e-9, 6) with
    * id tie-break — the round-6 guard absorbs the last-ulp `pow`
    * differences between engines. Weights must be > 0 (a zero weight has
    * no order statistic: pow(u, ∞) is 0 or NaN).
    *
    * Scale shape: one shuffle-free key projection, then
    * TakeOrderedAndProject(n) — k rows cross the wire; the rank column is
    * a window over the already-bounded n-row result. */
  def sampleWeighted(df: DataFrame, idCol: String, weightCol: String,
      n: Int, salt: String = "ws"): DataFrame = {
    require(n >= 1, s"n >= 1, got $n")
    val u = ((h60(concat(lit(s"$salt:"), col(idCol).cast("string")))
      % 1048576L + 1L).cast("double")) / lit(1048576.0)
    // enforce the documented weight contract at runtime: a zero/negative/
    // null weight would silently corrupt the draw (a negative exponent
    // inverts the order statistic; pow(u, 1/0) degenerates to 0/NaN)
    // instead of failing fast (round-16 ADVICE #1)
    val wchk = when(col(weightCol).isNull || col(weightCol).cast("double") <= 0.0,
        raise_error(concat(lit("sampleWeighted: weight must be > 0, got "),
          coalesce(col(weightCol).cast("string"), lit("null")),
          lit(" at id "), col(idCol).cast("string"))).cast("double"))
      .otherwise(col(weightCol).cast("double"))
    val top = df
      .withColumn("__wkey",
        round(pow(u, lit(1.0) / wchk) + 1e-9, 6))
      .orderBy(col("__wkey").desc, col(idCol).asc)
      .limit(n)
    top.withColumn("sample_rank", row_number().over(
        Window.orderBy(col("__wkey").desc, col(idCol).asc)).cast("long"))
      .withColumnRenamed("__wkey", "wkey")
  }

  /** Soft deduplication — down-WEIGHT duplicates instead of dropping them:
    * every document gets `weight = 1 / |its near-dup cluster|`, so each
    * duplicated content unit contributes one document's worth of training
    * mass in expectation while keeping every stylistic variant available to
    * the sampler (the repetition-without-information-loss middle ground
    * between no dedup and hard removal; pair it with
    * [[sampleTokenBudgetByCount]] or a sampler that honors per-row
    * weights). Output per row: (id, dup_group, group_size, weight) —
    * group_size is an exact integer and weight divides two exact values,
    * so the row replays bit-for-bit in any IEEE engine.
    *
    * Scale shape is [[splitLeakageSafe]]'s: components run over the PAIR
    * graph only; group sizes aggregate pair-graph-sized (unpaired docs are
    * size-1 by construction and never shuffle); the corpus-side work is
    * one small-side join AQE broadcasts plus a projection. */
  def softDedupWeights(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val comp = DedupOps.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as("__cid"), col("component"))
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("__gsz"))
    softDedupWeightsJoin(df, idCol,
      comp.join(sizes, Seq("component"))
        .select(col("__cid").as("id"), col("component"), col("__gsz").as("group_size")))
  }

  /** [[softDedupWeights]] fed by a PRECOMPUTED (id, component, group_size)
    * label relation — the serving seam for a content-addressed component
    * table ([[graft.ext.Dedup.sigComponentsTable]], round-16 verdict #3):
    * the weight projection is the only per-invocation work; the pair join
    * and the component fold ran once at table build. `components` must
    * hold exactly the PAIRED ids (unpaired docs are size-1 by the left
    * join, as in the inline form) — outputs are bit-identical to
    * [[softDedupWeights]] over the pairs the table was built from. */
  def softDedupWeightsFromComponents(df: DataFrame, idCol: String,
      components: DataFrame): DataFrame =
    softDedupWeightsJoin(df, idCol,
      components.select(col("id"), col("component"), col("group_size")))

  private def softDedupWeightsJoin(df: DataFrame, idCol: String,
      comps: DataFrame): DataFrame = {
    // no forced broadcast: the pair-graph side is usually tiny and AQE
    // broadcasts it, but a pathological corpus (everything duplicated)
    // must still degrade to a shuffle join instead of OOMing the driver
    df.join(comps.select(col("id").as("__cid"), col("component"),
        col("group_size").as("__gsz")),
        col(idCol).cast("long") === col("__cid"), "left")
      .withColumn("dup_group", coalesce(col("component"), col(idCol).cast("long")))
      .withColumn("group_size", coalesce(col("__gsz"), lit(1L)))
      .withColumn("weight", lit(1.0d) / col("group_size"))
      .drop("__cid", "component", "__gsz")
  }

  /** Per-group unigram KL divergence KL(P_g ‖ P_corpus): how far each
    * slice's token distribution drifts from the whole corpus — the standard
    * monitor for source mix drift between crawl snapshots, dedup stages, or
    * mixture re-weightings (and the distance DoReMi/DSIR-style mixture
    * tuning optimizes against). `KL = Σ_t p_g(t) · ln(p_g(t) / p_c(t))`
    * over the group's own support (every group token is also a corpus
    * token, so the ratio is always finite and the sum needs no smoothing).
    * Returns one row per group: (byCol, n_tokens, vocab, kl_corpus).
    *
    * Scale shape: ONE (group, token)-keyed count aggregation off a single
    * corpus scan; corpus token totals derive from THAT table (vocab-sized
    * re-agg — the t12 pattern, the corpus never tokenizes twice), joined
    * back vocab-sized (AQE broadcasts when it fits); the per-group sum is
    * an order-deterministic sorted fold ([[TextOps.foldSum]] — all terms
    * derive from exact integer counts, so both engines fold bit-identical
    * doubles). Per-group state is the group's vocabulary, never the corpus. */
  def klDrift(df: DataFrame, textCol: String, byCol: String): DataFrame =
    klFromCounts(tokenCounts(df, textCol, byCol), byCol)

  /** The (byCol, __tok, __c) count table [[klDrift]] aggregates — exposed
    * so an INCREMENTAL state (per-micro-batch count partitions, see
    * [[graft.streaming.CurationStream.tokenCountsBatch]]) can feed the same
    * report math after a sum-merge. */
  def tokenCounts(df: DataFrame, textCol: String, byCol: String): DataFrame =
    df.withColumn("__tk", toks(col(textCol)))
      .select(col(byCol), explode_outer(col("__tk")).as("__tok"))
      .filter(col("__tok").isNotNull) // outer: no inferred-filter re-eval (see TextOps)
      .groupBy(col(byCol), col("__tok"))
      .agg(count(lit(1)).as("__c"))

  /** KL report from a (byCol, __tok, __c) count table — the second stage of
    * [[klDrift]]. `st` rows must already be unique per (byCol, __tok). */
  def klFromCounts(st: DataFrame, byCol: String): DataFrame = {
    val tt = st.groupBy(col("__tok")).agg(sum(col("__c")).as("__ct"))
    val tot = tt.agg(sum(col("__ct")).as("__T"))
    val gs = Window.partitionBy(col(byCol))
    st.join(tt, Seq("__tok"))
      .crossJoin(broadcast(tot))
      .withColumn("__ts", sum(col("__c")).over(gs)) // group total: long, exact
      .withColumn("__pg", col("__c").cast("double") / col("__ts").cast("double"))
      .withColumn("__pc", col("__ct").cast("double") / col("__T").cast("double"))
      .groupBy(col(byCol))
      .agg(
        max(col("__ts")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        TextOps.foldSum(col("__pg") * log(col("__pg") / col("__pc")))
          .as("kl_corpus"))
  }

  /** One-pass corpus report ("dataset card" accounting): doc / token /
    * char / vocabulary-free stats per (source, lang) cell, per source
    * subtotal, and the grand total, in ONE scan via `rollup` — the summary
    * block every corpus release publishes (counts by source and language,
    * longest docs, token budget). Subtotal rows carry `(all)` in the
    * rolled-up columns. All outputs are exact integers — no float
    * determinism surface at all.
    *
    * Scale shape: one corpus scan, one |sources×langs|-cardinality partial
    * aggregation (rollup adds subtotal combinations, not corpus rows); the
    * token count is `size(toks)` in the projection — the text never leaves
    * the map side. */
  def corpusReport(df: DataFrame, textCol: String, sourceCol: String,
      langCol: String): DataFrame =
    df.withColumn("__ntok", size(toks(col(textCol))).cast("long"))
      .withColumn("__nchr", length(col(textCol)).cast("long"))
      .rollup(col(sourceCol), col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("n_tokens"),
        sum(col("__nchr")).as("n_chars"),
        max(col("__ntok")).as("max_doc_tokens"))
      .select(
        coalesce(col(sourceCol), lit("(all)")).as("source_grp"),
        coalesce(col(langCol), lit("(all)")).as("lang_grp"),
        col("n_docs"), col("n_tokens"), col("n_chars"), col("max_doc_tokens"))

  /** Balanced variant: every stratum downsampled to (approximately) the
    * smallest stratum's size, thresholds computed from the data in one
    * |strata|-row aggregation (the c03 query's generic form). */
  def sampleBalanced(df: DataFrame, strataCol: String, idCol: String,
      salt: String = "samp"): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__cnt"))
    // 1-row global min via crossJoin, not an empty-partition window
    val thr = counts.crossJoin(broadcast(counts.agg(min(col("__cnt")).as("__mn"))))
      .withColumn("__thr", expr("(__mn * 1000000) div __cnt"))
      .select(col(strataCol), col("__thr"))
    val hv = h60(concat(lit(salt), col(idCol).cast("string"))) % 1000000
    df.join(broadcast(thr), Seq(strataCol))
      .filter(hv < col("__thr"))
      .drop("__thr")
  }
}
