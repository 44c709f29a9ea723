package graft.ext

/** LSH banding-parameter selection from a target similarity threshold —
  * the standard S-curve optimization (Leskovec, Rajaraman & Ullman, "Mining
  * of Massive Datasets" ch. 3.4; the same selection datasketch's MinHashLSH
  * performs at index construction).
  *
  * For a banded signature with `bands` bands of `rows` rows each, a pair
  * with Jaccard similarity `s` lands in at least one common bucket with
  * probability `P(s) = 1 − (1 − s^rows)^bands` — an S-curve whose
  * inflection sits near `(1/bands)^(1/rows)`. [[tune]] enumerates every
  * `(bands, rows)` with `bands · rows ≤ signatureBudget` and picks the pair
  * minimizing the weighted false-positive + false-negative probability
  * mass around the target threshold, so callers of
  * [[DedupOps.dropNearDuplicatesMinhash]] / [[DedupOps.simhashPairs]]-style
  * banded indexes can derive `(bands, rowsPerBand)` from the MEANINGFUL
  * number — the dedup threshold — instead of hand-picking a layout.
  *
  * Everything here is exact driver-side math over plan constants: no data,
  * no Spark session, no nondeterminism (the integration grid is fixed).
  */
object LshTuning {

  /** P(collision in ≥1 band) for a pair at similarity `s`. */
  def collisionProb(s: Double, bands: Int, rows: Int): Double = {
    require(bands >= 1 && rows >= 1, s"need bands,rows >= 1, got $bands,$rows")
    require(s >= 0.0 && s <= 1.0, s"similarity out of [0,1]: $s")
    1.0 - math.pow(1.0 - math.pow(s, rows), bands)
  }

  /** The S-curve's rule-of-thumb threshold: similarity at which collision
    * probability transitions — `(1/bands)^(1/rows)`. */
  def inflection(bands: Int, rows: Int): Double =
    math.pow(1.0 / bands, 1.0 / rows)

  /** (falsePositiveMass, falseNegativeMass) of the curve against an ideal
    * step at `threshold`: `fp = ∫₀ᵗ P(s) ds` (dissimilar pairs that still
    * collide and must be filtered by exact verification), `fn = ∫ᵗ¹
    * (1 − P(s)) ds` (true near-dups the index misses — unrecoverable).
    * Midpoint rule on a fixed 1000-cell grid — deterministic. */
  def errorMasses(threshold: Double, bands: Int, rows: Int,
      steps: Int = 1000): (Double, Double) = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold in (0,1): $threshold")
    var fp = 0.0
    var fn = 0.0
    var i = 0
    while (i < steps) {
      val s = (i + 0.5) / steps
      val p = collisionProb(s, bands, rows)
      if (s < threshold) fp += p else fn += 1.0 - p
      i += 1
    }
    (fp / steps, fn / steps)
  }

  /** Pick `(bands, rowsPerBand)` with `bands · rowsPerBand ≤
    * signatureBudget` minimizing `fpWeight·fp + fnWeight·fn` at
    * `threshold`. False negatives are unrecoverable (the exact-verify step
    * only sees candidates), so weight them higher when recall matters more
    * than candidate-verification cost. Deterministic tie-break: smaller
    * total signature first, then more bands. */
  def tune(threshold: Double, signatureBudget: Int,
      fpWeight: Double = 0.5, fnWeight: Double = 0.5): (Int, Int) = {
    require(signatureBudget >= 1, s"budget >= 1, got $signatureBudget")
    require(fpWeight >= 0 && fnWeight >= 0 && fpWeight + fnWeight > 0,
      s"weights must be non-negative and not both zero")
    val candidates = for {
      bands <- 1 to signatureBudget
      rows <- 1 to signatureBudget / bands
    } yield (bands, rows)
    candidates.minBy { case (b, r) =>
      val (fp, fn) = errorMasses(threshold, b, r)
      (fpWeight * fp + fnWeight * fn, b * r, -b)
    }
  }

  /** Per-plane agreement probability of random-hyperplane LSH for a pair at
    * cosine similarity `c`: `p = 1 − arccos(c)/π` (the Goemans–Williamson
    * rounding identity — the probability a random hyperplane does NOT
    * separate the two vectors). The hyperplane analogue of MinHash's
    * "per-row collision probability = Jaccard". */
  def hyperplaneAgreement(c: Double): Double = {
    require(c >= -1.0 && c <= 1.0, s"cosine out of [-1,1]: $c")
    1.0 - math.acos(c) / math.Pi
  }

  /** Analytic recall model of BUDGETED multi-probe on a single `w`-bit
    * random-hyperplane signature (the s02 serving shape): for a true
    * neighbor at cosine `c`, each signature bit disagrees independently
    * with probability `pFlip = arccos(c)/π` (the complement of
    * [[hyperplaneAgreement]]). The query probes its exact bucket plus a
    * family of perturbation subsets of `mBits` candidate bits; the
    * neighbor is found iff its disagreement set is exactly one of the
    * probed subsets. Under the a-priori model (no margin information) all
    * size-`i` subsets are equally likely, each with probability
    * `pFlip^i · (1 − pFlip)^(w − i)`, so the optimal budget-`t` family is
    * the first `t` subsets in SIZE order and
    * `P(found) = (1−p)^w + Σ_{first t subsets} p^|S| (1−p)^(w−|S|)`.
    * The SERVED family ([[Similarity]]'s margin-ordered probes) is the
    * data-conditioned refinement — the observed weakest-margin bits are
    * the MOST likely to disagree (Lv et al., VLDB 2007) — so this model is
    * a calibrated floor, not an upper bound (measured on the witness
    * corpus: model 0.45 at the round-16 57-probe config vs measured 0.46).
    * Exact driver-side math, no data. */
  def probeModelRecall(t: Int, pFlip: Double, w: Int, mBits: Int): Double = {
    require(pFlip > 0.0 && pFlip < 1.0, s"pFlip in (0,1): $pFlip")
    require(w >= 1 && mBits >= 1 && mBits <= w && mBits <= 24,
      s"need 1 <= mBits <= min(w,24), got w=$w mBits=$mBits")
    require(t >= 0, s"t >= 0, got $t")
    var found = math.pow(1.0 - pFlip, w) // the exact bucket
    var remaining = t.toLong
    var i = 1
    while (i <= mBits && remaining > 0) {
      val classSize = choose(mBits, i)
      val take = math.min(classSize, remaining)
      found += take * math.pow(pFlip, i) * math.pow(1.0 - pFlip, w - i)
      remaining -= take
      i += 1
    }
    found
  }

  /** Smallest probe budget `t` (non-empty perturbation subsets of the
    * `mBits` weakest bits) whose [[probeModelRecall]] reaches
    * `targetRecall` for neighbors at `neighborCos` on a `w`-bit signature
    * — the closed loop from a STATED recall target to the probe depth the
    * served config runs (round-16 verdict #1), the way [[tune]] derives
    * banding from a dedup threshold. Returns the full family size
    * `2^mBits − 1` when the target is unreachable at this width (the
    * (1−p)^(w−mBits) mass outside the candidate bits is never probed —
    * callers should log the achieved [[probeModelRecall]] and route
    * recall-sensitive use to a multi-band index). Deterministic integer
    * walk over exact driver-side floats — both engines consume the
    * resulting budget as a plan constant, never recompute it. */
  def probeBudget(targetRecall: Double, neighborCos: Double, w: Int,
      mBits: Int): Int = {
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"targetRecall in (0,1): $targetRecall")
    val p = 1.0 - hyperplaneAgreement(neighborCos)
    require(p > 0.0 && p < 1.0,
      s"neighborCos $neighborCos maps to degenerate flip probability $p")
    val full = (1L << mBits) - 1
    var cum = math.pow(1.0 - p, w)
    var t = 0L
    var i = 1
    while (i <= mBits && cum < targetRecall) {
      val wgt = math.pow(p, i) * math.pow(1.0 - p, w - i)
      val classSize = choose(mBits, i)
      // whole class if it still falls short, else just the needed count
      val need = math.ceil((targetRecall - cum) / wgt).toLong
      val take = math.min(classSize, need)
      cum += take * wgt
      t += take
      i += 1
    }
    math.min(t, full).toInt
  }

  private def choose(n: Int, k: Int): Long = {
    var r = 1L
    for (i <- 1 to k) r = r * (n - k + i) / i
    r
  }

  /** Per-band catch probability of the [[DedupOps.knnGraph]] multi-probe
    * banding for a pair whose per-plane agreement is `p`: the band catches
    * the pair when its `w` bits all agree, or exactly one disagrees AND
    * that bit is among EITHER endpoint's `probes` weakest margins (the
    * knnGraph probe side joins the exact index, so both endpoints' probes
    * help). A-priori (no margin information) a specific bit is among one
    * endpoint's probed set with probability `probes/w`, so the union over
    * both endpoints covers the flipped bit with `1 − (1 − probes/w)²` —
    * the margin-blind floor: observed flips concentrate on weak-margin
    * bits (Lv et al.), so the served config does better, exactly like
    * [[probeModelRecall]]'s floor. */
  def graphBandCatch(p: Double, w: Int, probes: Int): Double = {
    require(p > 0.0 && p < 1.0, s"p in (0,1): $p")
    require(w >= 1 && probes >= 0, s"need w >= 1, probes >= 0, got $w, $probes")
    val cover = 1.0 - math.pow(1.0 - math.min(probes, w).toDouble / w, 2)
    math.pow(p, w) + w * math.pow(p, w - 1) * (1 - p) * cover
  }

  /** Analytic recall model of the banded multi-probe knn-graph for
    * neighbors at cosine `c`: OR over `bands` independent
    * [[graphBandCatch]] bands. CALIBRATED against the measured s29 row:
    * at the gate-scale served config (bands 4, width 4, probes 2,
    * neighborCos 0.35) the model gives 0.879 vs 0.90 measured — a floor
    * within 0.03, the [[probeModelRecall]] pattern. */
  def graphModelRecall(c: Double, w: Int, bands: Int, probes: Int): Double = {
    require(bands >= 1, s"bands >= 1, got $bands")
    val p = hyperplaneAgreement(c)
    require(p > 0.0 && p < 1.0, s"cosine $c maps to degenerate agreement $p")
    1.0 - math.pow(1.0 - graphBandCatch(p, w, probes), bands)
  }

  /** The COSINE HORIZON of a knn-graph banding: the smallest neighbor
    * cosine the config still finds with probability ≥ `targetRecall`
    * under [[graphModelRecall]] — the number that makes the adaptive-width
    * contract concrete. [[DedupOps.knnGraphAuto]] widens the band
    * signature with the corpus (E[bucket] stays ≈ targetBucket), which
    * shifts the S-curve right: the graph keeps finding NEAR-duplicates at
    * every scale but silently stops finding far neighbors. This gauge
    * quantifies "how far": at the gate-scale width 4 the horizon at 0.9
    * is ≈ 0.40, at the 10× width 10 it is ≈ 0.94, at the 100× width 13
    * it is ≈ 0.97 — i.e. at scale the graph is a NEAR-DUP/closest-neighbor
    * structure, and recall targets for mid-cosine neighbors belong on a
    * coarser secondary index. 60-iteration bisection over the monotone
    * model — deterministic, exact driver math. Returns 1.0 when even
    * cos → 1 misses the target (degenerate — cannot happen for
    * probes ≥ 0, w ≥ 1 since recall → 1 as c → 1). */
  def graphCosineHorizon(targetRecall: Double, w: Int, bands: Int,
      probes: Int): Double = {
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"targetRecall in (0,1): $targetRecall")
    var lo = -0.999
    var hi = 0.999
    if (graphModelRecall(hi, w, bands, probes) < targetRecall) return 1.0
    if (graphModelRecall(lo, w, bands, probes) >= targetRecall) return lo
    var i = 0
    while (i < 60) {
      val mid = (lo + hi) / 2
      if (graphModelRecall(mid, w, bands, probes) >= targetRecall) hi = mid
      else lo = mid
      i += 1
    }
    hi
  }

  /** Smallest probe count whose [[graphModelRecall]] reaches
    * `targetRecall` for neighbors at `neighborCos` under the FIXED
    * (w, bands) banding, or `maxProbes` when unreachable (callers log the
    * achieved model value and consult [[graphCosineHorizon]]) — the
    * [[probeBudget]] discipline for the graph's probe knob. The knob is
    * bounded by the per-band width (probing more than w−1 flips per band
    * re-probes the same buckets) and by candidate cost: each probe
    * multiplies candidate volume by ~(1 + probes)/(1 + probes − 1). */
  def tuneGraphProbes(targetRecall: Double, neighborCos: Double, w: Int,
      bands: Int, maxProbes: Int = 3): Int = {
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"targetRecall in (0,1): $targetRecall")
    val cap = math.min(maxProbes, math.max(0, w - 1))
    var q = 0
    while (q < cap &&
        graphModelRecall(neighborCos, w, bands, q) < targetRecall) q += 1
    q
  }

  /** Calibrated recall model of IVF coarse-quantizer probing: the
    * probability that a true neighbor's inverted list is among the
    * query's `nprobe` nearest of `nlist` lists, modeled as
    * `1 − (1 − nprobe/nlist)^β`. β = 1 would be a uniformly-random list
    * assignment (recall = nprobe/nlist); real corpora concentrate a
    * neighbor's centroid in the query's TOP-ranked lists, so β > 1 —
    * measured β on the witness corpus (see [[IvfProbeBeta]]). Exactly
    * 1.0 at `nprobe = nlist` regardless of β (full probe is exact — the
    * s03 oracle property), monotone in `nprobe`: the properties the
    * inversion below needs. Deterministic driver-side math, no data. */
  def ivfModelRecall(nprobe: Int, nlist: Int,
      beta: Double = IvfProbeBeta): Double = {
    require(nlist >= 1 && nprobe >= 0, s"need nlist >= 1, nprobe >= 0, got $nlist, $nprobe")
    require(beta > 0.0, s"beta > 0, got $beta")
    if (nprobe >= nlist) 1.0
    else 1.0 - math.pow(1.0 - nprobe.toDouble / nlist, beta)
  }

  /** CALIBRATION of [[ivfModelRecall]], measured on the witness corpus
    * (scratch.IvfSweep; round 19): capture@10 of the d18-configuration
    * coarse quantizer — [[graft.ext.Similarity.kmeansFit]] on the
    * `vec_id < max(256, k)` slice, k = `semanticDedupNlist(n)` = 16 —
    * against the brute cosine top-10, swept over nprobe = 1..16 at both
    * gate scales (sf0.001 n=500, sf0.01 n=5000). The implied β per point
    * (`ln(1−capture)/ln(1−nprobe/nlist)`) is monotone-decreasing in
    * nprobe — 14.4 → 2.2 at sf0.001, 10.1 → 1.66 at sf0.01 — so the
    * shipped FLOOR is 1.6, under every measured point (the
    * probeModelRecall discipline: the model under-promises, measurement
    * decides — IvfSweep re-measures each derived config: targets
    * 0.8/0.9/0.95 → nprobe 11/13/14 of 16, measured capture
    * 0.965/0.99/0.99 at sf0.001 and 0.91/0.96/0.975 at sf0.01, every one
    * ≥ its target). The witness corpus' top-10 neighbors sit at
    * mid-cosine (~0.35, nearly uniform directions), which separates
    * WEAKLY into lists — hence the deep tail; the steep head (β ≈ 10–14
    * at nprobe ≤ 2) is what a clustered production embedding space looks
    * like at every depth, so re-running the sweep on such data and
    * re-flooring buys much cheaper probes. MEASURED on clustered data
    * (round-20, scratch.ClusteredIvfSweep — deterministic separable-mode
    * corpora at σ=0.12 mode noise): implied β 17.7 at the 16-mode
    * gate-scale corpus and 175 at the 128-mode 100×-shape corpus
    * (n=500k, nlist=123) — the re-floored 0.95-target nprobe drops
    * 105 → 3 of 123 and the s38-shape serving time 4.27 → 1.96 s with
    * the round-20 list-id pushdown. The per-corpus floor is wired at
    * serving time via `spark.graft.ivf.beta`
    * ([[graft.ext.Similarity.ivfRankingTop]]); this constant stays the
    * conservative cross-corpus floor. */
  val IvfProbeBeta: Double = 1.6

  /** The probe FRACTION `nprobe/nlist` that [[ivfModelRecall]] needs for
    * `targetRecall`, as an exact parts-per-million INTEGER (ceil, so the
    * derived nprobe always meets the model target) — the cross-engine
    * seam: nprobe then derives from nlist by pure integer arithmetic
    * (`ceil(nlist · ppm / 10⁶)`), which a SQL twin replays exactly with
    * no float-boundary risk (the d18 auto-k discipline applied to the
    * probe knob). */
  def ivfProbePpm(targetRecall: Double, beta: Double = IvfProbeBeta): Long = {
    // 1.0 is a LEGAL target here, unlike the width-capped LSH budgets:
    // full probe is exact, so the rule degrades cleanly to nprobe = nlist
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall in (0,1]: $targetRecall")
    math.ceil((1.0 - math.pow(1.0 - targetRecall, 1.0 / beta)) * 1e6).toLong
  }

  /** Smallest nprobe whose [[ivfModelRecall]] reaches `targetRecall` at
    * `nlist` lists — [[probeBudget]]'s discipline for the IVF family's
    * probe knob (round-18 verdict #4: the knob was a caller constant;
    * s33 measured probe GAIN but nothing inverted it). Computed by the
    * integer ppm rule so both engines derive the identical value from
    * nlist; always reachable (nprobe = nlist is exact), capped at nlist. */
  def ivfNprobe(targetRecall: Double, nlist: Int,
      beta: Double = IvfProbeBeta): Int = {
    require(nlist >= 1, s"nlist >= 1, got $nlist")
    val ppm = ivfProbePpm(targetRecall, beta)
    math.min(nlist.toLong, math.max(1L, (nlist * ppm + 999999L) / 1000000L))
      .toInt
  }

  /** [[tune]] for COSINE thresholds on banded random-hyperplane signatures
    * — the seam that closes the clustering/tuning loop (round-13 NEXT #5):
    * banded hyperplane sketches follow the identical OR-of-ANDs S-curve
    * `P = 1 − (1 − p^w)^L` with the per-plane agreement `p` in place of
    * Jaccard, so mapping the target cosine through
    * [[hyperplaneAgreement]] reduces the problem to the MinHash
    * optimization verbatim. Returns `(bands, planesPerBand)` for
    * [[DedupOps.cosinePairsLsh]] / [[DedupOps.dbscanTuned]].
    *
    * Same determinism contract as [[tune]]: exact driver-side math over
    * plan constants, fixed integration grid, no data. */
  def tuneCosine(cosThreshold: Double, signatureBudget: Int,
      fpWeight: Double = 0.5, fnWeight: Double = 0.5): (Int, Int) = {
    val p = hyperplaneAgreement(cosThreshold)
    require(p > 0.0 && p < 1.0,
      s"cosine $cosThreshold maps to degenerate agreement $p")
    tune(p, signatureBudget, fpWeight, fnWeight)
  }
}
