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
