package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench drift adjudication ([[Bench.adjudicate]]): the codified form of
  * the house rule the round-9/10 verdicts applied by hand — concentrated
  * per-query blowups are regressions, broad uniform drift is machine
  * contention, sub-0.6 s rows are scheduler noise. Pure-function spec; no
  * SparkSession. */
class BenchDriftSpec extends AnyFunSuite {

  private val base: Map[String, Double] =
    (1 to 40).map(i => f"q$i%02d" -> (0.4 + 0.1 * (i % 7))).toMap

  test("identical runs: median 1.0, no outliers, no_regression") {
    val (med, outliers, verdict) = Bench.adjudicate(base, base)
    assert(med === 1.0)
    assert(outliers.isEmpty)
    assert(verdict === "no_regression")
  }

  test("one 2.5x query on a stable bench is a concentrated regression (the round-9 q41 shape)") {
    val cur = base.updated("q05", base("q05") * 2.5) // prior 0.9s — above the noise floor
    assert(base("q05") >= 0.6)
    val (med, outliers, verdict) = Bench.adjudicate(cur, base)
    assert(med < 1.1)
    assert(outliers.map(_._1) === Seq("q05"))
    assert(verdict === "concentrated_regression")
  }

  test("everything x1.4 together: broad contention, NOT a regression — ratios normalize") {
    val cur = base.view.mapValues(_ * 1.4).toMap
    val (med, outliers, verdict) = Bench.adjudicate(cur, base)
    assert(math.abs(med - 1.4) < 1e-9)
    assert(outliers.isEmpty, s"uniform drift flagged: $outliers")
    assert(verdict === "broad_contention")
  }

  test("a 3x blowup on a sub-0.6s row is scheduler noise, not an outlier") {
    val prior = base.updated("q39", 0.15)
    val cur = prior.updated("q39", 0.45)
    val (_, outliers, verdict) = Bench.adjudicate(cur, prior)
    assert(outliers.isEmpty)
    assert(verdict === "no_regression")
  }

  test("a concentrated blowup still flags ON TOP of broad contention (ratio vs median)") {
    val cur = base.view.mapValues(_ * 1.4).toMap
      .updated("q06", base("q06") * 1.4 * 2.0)
    val (_, outliers, verdict) = Bench.adjudicate(cur, base)
    assert(outliers.map(_._1) === Seq("q06"))
    assert(verdict === "concentrated_regression")
  }

  test("disjoint query sets refuse loudly") {
    intercept[IllegalArgumentException] {
      Bench.adjudicate(Map("a" -> 1.0), Map("b" -> 1.0))
    }
  }

  test("a shifted box voids the comparison: env_factor >= 1.5 turns even a concentrated blowup into environment_shift") {
    // the 2026-08-15 q141 misfire: the box ran 3.2x slower than the prior
    // record (shared builds, identical code, measured it), and q141's
    // machine-state-hypersensitive sweep looked like a 3.75x concentrated
    // regression until a same-commit A/B reproduced it on old code.
    val cur = base.updated("q05", base("q05") * 2.5)
    val (_, outliers, verdict) = Bench.adjudicate(cur, base, envFactor = 3.2)
    assert(outliers.nonEmpty) // the flag itself still computes...
    assert(verdict === "environment_shift") // ...but the verdict voids it
    // a FASTER box voids the comparison symmetrically
    assert(Bench.adjudicate(base, base, envFactor = 0.5)._3 === "environment_shift")
    // a mild shift does not: normal rules apply
    assert(Bench.adjudicate(cur, base, envFactor = 1.2)._3 === "concentrated_regression")
  }

  test("parseShared reads a real record; absent shared section degrades to empty") {
    val sh = Bench.parseShared("BENCH_r11_builder_full2.json")
    assert(sh.contains("shared_minhash_pairs") && sh.size >= 4)
    val none = Bench.parseShared("BENCH_r10.json") // compact record, no shared
    assert(none.isEmpty)
  }

  test("parseSteady reads the committed r10 driver detail; self-comparison adjudicates clean") {
    val prior = Bench.parseSteady("BENCH_r10_full.json")
    assert(prior.size >= 167, s"expected the full r10 surface, got ${prior.size}")
    val (med, outliers, verdict) = Bench.adjudicate(prior, prior)
    assert(med === 1.0 && outliers.isEmpty && verdict === "no_regression")
    // the r9->r10 manual comparison's shape: ratios of a real run against
    // itself perturbed by +-20% uniform noise stay unflagged (contention
    // band), matching the verdict's "broad ~uniform deltas = contention"
    val rng = new scala.util.Random(3)
    val noisy = prior.map { case (k, v) => k -> v * (0.8 + 0.4 * rng.nextDouble()) }
    val (_, out2, v2) = Bench.adjudicate(noisy, prior)
    assert(out2.isEmpty && v2 === "no_regression")
  }
}
