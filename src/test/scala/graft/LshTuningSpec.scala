package graft

import graft.ext.{DedupOps, LshTuning, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** S-curve parameter selection: closed-form properties plus an end-to-end
  * check that tuned parameters drive the banded MinHash index sensibly. */
class LshTuningSpec extends AnyFunSuite {

  test("collisionProb is an S-curve: endpoints, monotonicity, closed form") {
    assert(LshTuning.collisionProb(0.0, 4, 4) == 0.0)
    assert(LshTuning.collisionProb(1.0, 4, 4) == 1.0)
    val ps = (0 to 20).map(i => LshTuning.collisionProb(i / 20.0, 4, 4))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b }, "must be monotone")
    // closed form at one hand point: P(0.5, b=2, r=2) = 1 - (1 - 0.25)^2
    assert(math.abs(LshTuning.collisionProb(0.5, 2, 2) - 0.4375) < 1e-12)
  }

  test("tuned parameters put the S-curve inflection near the threshold") {
    for (t <- Seq(0.3, 0.5, 0.7, 0.9)) {
      val (b, r) = LshTuning.tune(t, 128)
      assert(b * r <= 128 && b >= 1 && r >= 1)
      assert(math.abs(LshTuning.inflection(b, r) - t) < 0.15,
        s"threshold $t -> ($b, $r), inflection ${LshTuning.inflection(b, r)}")
    }
  }

  test("higher thresholds tune to more rows per band (steeper, right-shifted)") {
    val (_, rLow) = LshTuning.tune(0.3, 128)
    val (_, rHigh) = LshTuning.tune(0.8, 128)
    assert(rHigh >= rLow, s"rows at 0.8 ($rHigh) < rows at 0.3 ($rLow)")
  }

  test("tuned error mass beats both degenerate layouts") {
    val t = 0.5
    val (b, r) = LshTuning.tune(t, 64)
    def cost(bands: Int, rows: Int): Double = {
      val (fp, fn) = LshTuning.errorMasses(t, bands, rows)
      0.5 * fp + 0.5 * fn
    }
    // all-bands (collides everything) and one-band (misses everything near t)
    assert(cost(b, r) <= cost(64, 1) && cost(b, r) <= cost(1, 64),
      s"tuned ($b, $r) worse than a degenerate layout")
  }

  test("fn weighting shifts the curve left (recall-biased tuning)") {
    val t = 0.6
    val (bBal, rBal) = LshTuning.tune(t, 64)
    val (bRec, rRec) = LshTuning.tune(t, 64, fpWeight = 0.1, fnWeight = 0.9)
    val (_, fnBal) = LshTuning.errorMasses(t, bBal, rBal)
    val (_, fnRec) = LshTuning.errorMasses(t, bRec, rRec)
    assert(fnRec <= fnBal, "recall-weighted tuning must not lose more near-dups")
  }

  test("probeModelRecall: exact bucket only = (1-p)^w; full family covers all candidate-bit mass") {
    val p = 1.0 - LshTuning.hyperplaneAgreement(0.35)
    val w = 8
    assert(math.abs(LshTuning.probeModelRecall(0, p, w, 8) - math.pow(1 - p, w)) < 1e-12)
    // m = w and the full 2^m - 1 family: every disagreement set is probed
    assert(math.abs(LshTuning.probeModelRecall(255, p, w, 8) - 1.0) < 1e-12)
    // monotone in t
    val rs = (0 to 255).map(t => LshTuning.probeModelRecall(t, p, w, 8))
    assert(rs.zip(rs.tail).forall { case (a, b) => a <= b })
  }

  test("probeBudget: smallest budget reaching the target; caps at the full family when unreachable") {
    val p = 1.0 - LshTuning.hyperplaneAgreement(0.35)
    // the s02 serving config: target 0.8 at the floor-8 width = 148 probes
    val t8 = LshTuning.probeBudget(0.8, 0.35, 8, 8)
    assert(t8 == 148, s"expected the documented 148, got $t8")
    assert(LshTuning.probeModelRecall(t8, p, 8, 8) >= 0.8)
    assert(LshTuning.probeModelRecall(t8 - 1, p, 8, 8) < 0.8, "must be minimal")
    // monotone in target
    val budgets = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
      .map(tg => LshTuning.probeBudget(tg, 0.35, 8, 8))
    assert(budgets.zip(budgets.tail).forall { case (a, b) => a <= b })
    // past w ≈ 9 the (1-p)^(w-m) mass outside the 8 candidate bits makes
    // 0.8 unreachable: budget caps at the full 255-subset family
    for (w <- 9 to 20)
      assert(LshTuning.probeBudget(0.8, 0.35, w, 8) == 255, s"w=$w")
  }

  test("s02ProbeBits widens with the signature: the 0.8 target stays deliverable through w = 12") {
    val p = 1.0 - LshTuning.hyperplaneAgreement(
      graft.ext.Similarity.S02NeighborCos)
    // at the floor width nothing changes: min(8, 12) = 8, budget 148
    assert(graft.ext.Similarity.s02ProbeBits(8) == 8)
    assert(graft.ext.Similarity.s02Budget(8) == 148)
    // w = 9..12: the widened candidate window keeps the stated target
    // reachable where the fixed-8 window capped at 255 subsets and
    // delivered 0.61/0.38/0.23/0.14
    for (w <- 9 to 12) {
      val m = graft.ext.Similarity.s02ProbeBits(w)
      assert(m == w, s"w=$w")
      val t = graft.ext.Similarity.s02Budget(w)
      assert(t < (1 << m) - 1, s"w=$w: budget $t must not hit the family cap")
      assert(LshTuning.probeModelRecall(t, p, w, m) >= 0.8, s"w=$w")
      assert(LshTuning.probeModelRecall(t - 1, p, w, m) < 0.8,
        s"w=$w: must be minimal")
    }
    // past the 12-bit cap the budget pins at the 4095-subset family and
    // delivered recall decays ~6x slower than the fixed-8 window's
    for (w <- 13 to 20) {
      assert(graft.ext.Similarity.s02ProbeBits(w) == 12, s"w=$w")
      assert(graft.ext.Similarity.s02Budget(w) == 4095, s"w=$w")
      val wide = LshTuning.probeModelRecall(4095, p, w, 12)
      val old = LshTuning.probeModelRecall(255, p, w, 8)
      assert(wide > old * 5, s"w=$w: widened $wide vs fixed-8 $old")
    }
  }

  test("margin-ordered probe family: a singleton always precedes its supersets, so budget-2 = the two weakest singles") {
    // the s26 equivalence argument: score(S ∪ {b}) = score(S) + m_b ≥
    // score({b}) with tie only when score(S) = 0, where the mask
    // tie-break (mask({b}) < mask(S ∪ {b}) since masks are positive)
    // still puts the singleton first. Hence at budget 2 over ANY margins
    // the exact Lv et al. ranking serves exactly the two weakest singles
    // — the family knnGraph's probes=2 heuristic already probes.
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val m = Vector.fill(4)(rnd.nextInt(1000).toLong) // micro-margins, ties likely
      val sorted = m.zipWithIndex.sortBy { case (mm, i) => (mm, i) }
      val subsets = (1 until 16).map { sid =>
        val bits = (0 until 4).filter(b => ((sid >> b) & 1) == 1)
        val score = bits.map(b => sorted(b)._1).sum
        val mask = bits.map(b => 1L << sorted(b)._2).sum
        (score, mask)
      }.sorted
      val first2 = subsets.take(2).map(_._2).toSet
      val weakest2 = Set(1L << sorted(0)._2, 1L << sorted(1)._2)
      assert(first2 == weakest2, s"margins $m: $first2 != $weakest2")
    }
  }

  test("graph recall model: calibrated floor at the served config; horizon quantifies the width contract") {
    // calibration against the MEASURED s29 row: served gate config is
    // bands 4, width 4, probes 2; mean recall@3 measured 0.90 — the
    // a-priori model must be a floor within 0.03 of it
    val m = LshTuning.graphModelRecall(0.35, w = 4, bands = 4, probes = 2)
    assert(m >= 0.87 && m <= 0.90, s"model $m vs measured 0.90")
    // probes help, monotonically, and cap at w-1 distinct flips
    val rs = (0 to 3).map(q => LshTuning.graphModelRecall(0.35, 4, 4, q))
    assert(rs.zip(rs.tail).forall { case (a, b) => a < b })
    // the adaptive-width contract, quantified: at a FIXED neighbor cosine
    // the model collapses as the signature widens...
    assert(LshTuning.graphModelRecall(0.35, 10, 4, 2) < 0.15)
    // ...equivalently the cosine horizon (smallest servable neighbor
    // cosine at target 0.9) marches toward 1 with the width: ≈0.40 at the
    // gate scales, ≈0.94 at the 10× width, ≈0.97 at the 100× width
    val h = Seq(4, 8, 10, 13).map(w =>
      LshTuning.graphCosineHorizon(0.9, w, bands = 4, probes = 2))
    assert(h.zip(h.tail).forall { case (a, b) => a < b }, s"horizons $h")
    assert(math.abs(h(0) - 0.402) < 0.005 && math.abs(h(2) - 0.937) < 0.005 &&
      math.abs(h(3) - 0.967) < 0.005, s"horizons $h")
    // horizon is the model's inverse: recall AT the horizon meets the
    // target, just below it misses
    for (w <- Seq(4, 10)) {
      val c = LshTuning.graphCosineHorizon(0.9, w, 4, 2)
      assert(LshTuning.graphModelRecall(c, w, 4, 2) >= 0.9)
      assert(LshTuning.graphModelRecall(c - 1e-3, w, 4, 2) < 0.9)
    }
    // probe tuner: the served probes=2 default is exactly the minimal
    // probe count reaching the calibrated floor target at the gate config
    assert(LshTuning.tuneGraphProbes(0.87, 0.35, w = 4, bands = 4) == 2)
    assert(LshTuning.tuneGraphProbes(0.99, 0.35, w = 4, bands = 4) == 3,
      "unreachable targets return the cap")
  }

  test("tuneGraphConfig: cheapest (bands, probes) meeting a stated horizon; honest fallback when unreachable") {
    // the round-17 verdict #3 wiring: a caller states "serve cosine >= c
    // neighbors at recall r" and the config derives from the model
    val n = 500L
    // the gate-scale default (bands 4, probes 2, w 4) models ~0.879 at
    // cos 0.35 — ask for exactly that contract and the tuner must find a
    // config meeting it...
    val (b1, q1, r1) = DedupOps.tuneGraphConfig(n, targetHorizon = 0.35,
      horizonRecall = 0.85, targetBucket = 32L, minBands = 1)
    assert(r1 >= 0.85, s"model recall $r1 must meet the target")
    assert(LshTuning.graphModelRecall(0.35,
      DedupOps.adaptivePlanes(n, 32L, b1), b1, q1) == r1)
    // ...and MINIMALITY: no config with strictly smaller candidate volume
    // meets the target (cost = 2n*b*(1+q)*n/2^w, the tuner's own metric)
    def cost(b: Int, q: Int): Double = {
      val w = DedupOps.adaptivePlanes(n, 32L, b)
      2.0 * n * b * (1 + q) * (n.toDouble / (1L << w))
    }
    for (b <- 1 to 12; w = DedupOps.adaptivePlanes(n, 32L, b);
         q <- 0 to math.min(3, w - 1)
         if cost(b, q) < cost(b1, q1))
      assert(LshTuning.graphModelRecall(0.35, w, b, q) < 0.85,
        s"cheaper config ($b, $q) also meets the target - not minimal")
    // a stricter recall at the same horizon never gets CHEAPER
    val (b2, q2, _) = DedupOps.tuneGraphConfig(n, 0.35, 0.95, 32L)
    assert(cost(b2, q2) >= cost(b1, q1), "stricter target must not cost less")
    // unreachable: a FAR-cosine (0.1) near-perfect-recall target at a huge
    // corpus — no config in the space reaches it — returns the best-recall
    // config and reports a model value BELOW the target: the caller's
    // routing signal, never a silent lie
    val (_, _, r3) = DedupOps.tuneGraphConfig(100000000L, 0.1, 0.99, 32L)
    assert(r3 < 0.99, s"unreachable target must report the honest $r3")
  }

  test("fusion probe budget: deeper than the standalone budget at every width; the measured-curve constants hold") {
    // the s36 leg budget (target S02FusionTargetRecall) strictly dominates
    // the standalone 0.8-target budget wherever 0.8 was reachable below
    // the family cap, and stays within the full-family cap
    for (w <- 8 to 12) {
      val std = Similarity.s02Budget(w)
      val fus = Similarity.s02FusionBudget(w)
      val cap = (1L << math.min(w, 12)) - 1
      assert(fus >= std, s"w=$w: fusion $fus < standalone $std")
      assert(fus <= cap, s"w=$w: fusion budget $fus above the family cap")
      if (std < cap) assert(fus > std, s"w=$w: deeper target must buy probes")
    }
    // the gate-scale constants the s36 scaladoc states (floor-8 width)
    assert(Similarity.s02Budget(8) == 148)
    assert(Similarity.s02FusionBudget(8) == 214,
      s"fusion budget at w=8: ${Similarity.s02FusionBudget(8)}")
  }

  test("fusionLegPlan: probed while the budget delivers; past the cap, graph only when maintained, else ivf") {
    // gate scales (w = 8) and every width through the 12-bit probe cap:
    // the fusion budget stays under the family cap, so the single-band
    // probed leg delivers the stated 0.95 target (graphMaintained is
    // irrelevant while the cheap leg delivers)
    for (n <- Seq(500L, 5000L, 65536L, 256L << 12)) {
      assert(Similarity.fusionLegPlan(n) == "probed", s"n=$n")
      assert(Similarity.fusionLegPlan(n, graphMaintained = true) == "probed",
        s"n=$n maintained")
    }
    // one width past the cap the un-probed mass (1-p)^(w-12) caps model
    // recall near 0.61 - the router hands the leg to the graph ONLY when
    // the deployment already maintains it (round-18 verdict #2: the graph
    // leg prices at graph build), and to the IVF leg otherwise
    for (n <- Seq((256L << 12) + 1, 256L << 13, 100000000L)) {
      assert(Similarity.fusionLegPlan(n) == "ivf", s"n=$n")
      assert(Similarity.fusionLegPlan(n, graphMaintained = true) == "graph",
        s"n=$n maintained")
    }
  }

  test("probe-matrix literal boundary is machine-enforced at IvfProbeMatrixMaxNlist") {
    // round-19 verdict #4: the nlist-structs-per-row literal array was
    // documented to need a centroid join past nlist ≈ 4096 but nothing
    // asserted it — an assert-free cliff. centroidProbeArray now requires
    // the boundary (the _meta/requireMeta discipline applied to plans).
    import org.apache.spark.sql.functions.col
    val ok = Similarity.centroidProbeArray(
      Seq(Array(1.0), Array(0.5)), col("u"))
    assert(ok != null)
    val over = (0 to Similarity.IvfProbeMatrixMaxNlist)
      .map(i => Array(i.toDouble))
    val boom = intercept[IllegalArgumentException] {
      Similarity.centroidProbeArray(over, col("u"))
    }
    assert(boom.getMessage.contains("probe-matrix literal boundary"),
      boom.getMessage)
    // the d18 sizing rule cannot reach the boundary (min(4096, ...) cap):
    // the require is a tripwire for a future sizing change
    assert(graft.ext.DedupOps.semanticDedupNlist(Long.MaxValue / 2) <=
      Similarity.IvfProbeMatrixMaxNlist)
  }

  test("ivf probe model: monotone, exact at full probe, and the integer nprobe rule meets the target") {
    // monotone in nprobe; exactly 1.0 at nprobe = nlist (full probe is
    // exact — the s03 oracle property), regardless of beta
    for (nlist <- Seq(8, 16, 49, 4096)) {
      var prev = 0.0
      for (np <- 1 to math.min(nlist, 64)) {
        val r = LshTuning.ivfModelRecall(np, nlist)
        assert(r >= prev, s"model must be monotone at nlist=$nlist np=$np")
        prev = r
      }
      assert(LshTuning.ivfModelRecall(nlist, nlist) == 1.0)
      assert(LshTuning.ivfModelRecall(nlist + 7, nlist) == 1.0)
    }
    // the derived nprobe always meets the stated target under the model
    // (the ppm rule rounds UP), is minimal-or-off-by-ceil, and caps at nlist
    for (t <- Seq(0.5, 0.8, 0.9, 0.95, 0.99); nlist <- Seq(8, 16, 49, 4096)) {
      val np = LshTuning.ivfNprobe(t, nlist)
      assert(np >= 1 && np <= nlist, s"t=$t nlist=$nlist np=$np")
      assert(LshTuning.ivfModelRecall(np, nlist) >= t,
        s"t=$t nlist=$nlist np=$np model ${LshTuning.ivfModelRecall(np, nlist)}")
    }
    // cross-engine seam: nprobe derives from nlist by pure integer
    // arithmetic over the ppm constant — replay the SQL rule here
    for (t <- Seq(0.8, 0.95); nlist <- Seq(16, 49, 4096)) {
      val ppm = LshTuning.ivfProbePpm(t)
      val sqlRule = math.min(nlist.toLong,
        math.max(1L, (nlist.toLong * ppm + 999999L) / 1000000L))
      assert(LshTuning.ivfNprobe(t, nlist).toLong == sqlRule,
        s"t=$t nlist=$nlist")
    }
  }

  test("tuned layout drives the banded index end-to-end") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val (bands, rows) = LshTuning.tune(0.5, 16)
    // identical docs must collide at ANY tuned layout; a disjoint doc never
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val kept = DedupOps.dropNearDuplicatesMinhash(docs, "doc_id", "text",
        bands = bands, rowsPerBand = rows)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), s"kept $kept with layout ($bands, $rows)")
  }
}
