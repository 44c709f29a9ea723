package graft

import graft.ext.{DedupOps, LshTuning}
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
