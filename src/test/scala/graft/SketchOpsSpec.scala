package graft

import graft.operators.SketchOps
import org.apache.spark.sql.functions._

/** Laws of the engine-portable deterministic HLL (q126): fixed register
  * geometry, duplicate-insensitivity (the property that makes it a
  * DISTINCT counter), mergeability of register tables (the property that
  * makes it constant-state at 100 TB), and raw-regime accuracy. */
class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("X: register table is always 2^p rows with ranks in [0, 53]") {
    val regs = SketchOps.hllRegisters((1 to 100).toDF("k"), col("k"), p = 8).cache()
    assert(regs.count() === 256L)
    assert(regs.filter(col("reg") < 0 || col("reg") > 53).count() === 0L)
    assert(regs.filter(col("reg") > 0).count() > 0L)
    regs.unpersist()
  }

  test("X: duplicates never move the estimate — it is a distinct counter") {
    val once = (1 to 5000).toDF("k")
    val thrice = ((1 to 5000) ++ (1 to 5000) ++ (1 to 5000)).toDF("k")
    val e1 = SketchOps.hllEstimate(SketchOps.hllRegisters(once, col("k")))
      .select("hll_estimate").as[Double].head()
    val e3 = SketchOps.hllEstimate(SketchOps.hllRegisters(thrice, col("k")))
      .select("hll_estimate").as[Double].head()
    assert(e1 === e3)
  }

  test("X: register tables merge by max — two half-corpus sketches equal the full sketch") {
    val lo = (1 to 10000).toDF("k")
    val hi = (8000 to 20000).toDF("k") // overlapping halves
    val full = (1 to 20000).toDF("k")
    val merged = SketchOps.hllRegisters(lo, col("k"))
      .union(SketchOps.hllRegisters(hi, col("k")))
      .groupBy("bucket").agg(max("reg").as("reg"))
    val eMerged = SketchOps.hllEstimate(merged).select("hll_estimate").as[Double].head()
    val eFull = SketchOps.hllEstimate(SketchOps.hllRegisters(full, col("k")))
      .select("hll_estimate").as[Double].head()
    assert(eMerged === eFull)
  }

  test("X: CMS conservation — every sketch row's counters sum to the insertion count") {
    val keys = (1 to 3000).map(i => i % 97).toDF("k")
    val rows = SketchOps.cmsCounters(keys, col("k"), d = 4, w = 64).counters
      .groupBy("row").agg(org.apache.spark.sql.functions.sum("cnt").as("s"))
      .as[(Int, Long)].collect()
    assert(rows.length === 4 && rows.forall(_._2 == 3000L))
  }

  test("X: CMS estimates are one-sided (est >= true) and within eN for every probe") {
    val rnd = new scala.util.Random(11)
    // Zipf-ish stream: key i appears ~ 2000/i times.
    val stream = (1 to 50).flatMap(i => Seq.fill(2000 / i)(i))
    val df = rnd.shuffle(stream).toDF("k")
    val n = stream.size
    val (d, w) = (4, 512)
    val sketch = SketchOps.cmsCounters(df, col("k"), d, w)
    val truth = df.groupBy(col("k")).count().withColumnRenamed("count", "tf")
    val est = SketchOps.cmsQuery(sketch, truth, col("k"))
      .as[(Int, Long, Long)].collect()
    val epsN = math.E / w * n
    est.foreach { case (k, tf, e) =>
      assert(e >= tf, s"CMS undercounted key $k: $e < $tf")
      assert(e <= tf + epsN, s"key $k overcount ${e - tf} exceeds eN=$epsN")
    }
  }

  test("X: CMS unseen-key estimate is bounded by eN (and 0 when its cells are never hit)") {
    val df = (1 to 1000).toDF("k")
    val sketch = SketchOps.cmsCounters(df, col("k"), d = 4, w = 512)
    val unseen = Seq(100001, 100002, 100003).toDF("k")
    val est = SketchOps.cmsQuery(sketch, unseen, col("k"))
      .as[(Int, Long)].collect()
    val epsN = math.E / 512 * 1000
    est.foreach { case (_, e) => assert(e >= 0 && e <= epsN) }
  }

  test("X: histogram quantiles bound the true discrete quantile from above within err_bound") {
    val rnd = new scala.util.Random(3)
    val vals = (1 to 5000).map(_ => 10L + math.abs(rnd.nextGaussian() * 300).toLong)
    val df = vals.map(v => ("g0", v)).toDF("g", "v")
    val r = SketchOps.histogramQuantiles(df, col("g"), col("v"), bins = 64,
      qs = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    val (_, n, p50, p90, p99, err) = r
    assert(n === 5000L)
    val sorted = vals.sorted
    def disc(num: Int, den: Int): Long = sorted(((n * num + den - 1) / den - 1).toInt)
    for ((est, (num, den)) <- Seq(p50 -> (1, 2), p90 -> (9, 10), p99 -> (99, 100))) {
      val truth = disc(num, den)
      assert(est >= truth, s"estimate $est below true quantile $truth")
      assert(est - truth <= err, s"estimate $est exceeds $truth by more than err_bound $err")
    }
    assert(p50 <= p90 && p90 <= p99) // monotone across quantiles
  }

  test("X: hllEstimate rejects p outside [7,9] — the int64 fixed-point sum would wrap at p >= 10") {
    val regs12 = SketchOps.hllRegisters((1 to 10).toDF("k"), col("k"), p = 12)
    val e = intercept[IllegalArgumentException](SketchOps.hllEstimate(regs12, p = 12))
    assert(e.getMessage.contains("7 <= p <= 9"))
    // And the boundary case that motivated the guard: at p = 12 with mostly
    // empty buckets the worst-case sum is 2^65 > Long.MaxValue.
    assert(BigInt(1) << 65 > BigInt(Long.MaxValue))
  }

  test("X: a NULL group gets its own histogram instead of silently vanishing") {
    val df = ((1L to 10L).map(v => (Some("g"), v)) ++ (1L to 4L).map(v => (None: Option[String], v * 100)))
      .toDF("g", "v")
    val r = SketchOps.histogramQuantiles(df, col("g"), col("v"), bins = 4,
      qs = Seq(("p50", 1, 2)))
      .as[(Option[String], Long, Long, Long)].collect().sortBy(_._1)
    assert(r.length === 2)
    val nullGroup = r.find(_._1.isEmpty).get
    assert(nullGroup._2 === 4L) // n of the NULL group's own rows
    assert(nullGroup._3 >= 200L) // its p50 comes from ITS values (100..400), not g's
  }

  test("X: histogram quantiles drop null values as whole rows (complete-case n)") {
    val df = (Seq.fill(5)(Some(10L)) ++ Seq(None, None) ++ Seq.fill(5)(Some(20L)))
      .map(v => ("g", v)).toDF("g", "v")
    val r = SketchOps.histogramQuantiles(df, col("g"), col("v"), bins = 4,
      qs = Seq(("p50", 1, 2)))
      .as[(String, Long, Long, Long)].collect().head
    assert(r._2 === 10L) // n excludes the null rows
  }

  test("X: histogram bin arithmetic stays exact beyond 2^53 (wide-range long values)") {
    // Range ≈ 9e15 > 2^53: a double-based floor-divide misbins values near
    // bucket edges; SQL `div` is exact int64. Values at exact bucket
    // boundaries of a 4-bin sketch over [0, 4e15·9/4).
    val hi = 9000000000000000L // 9e15
    val df = Seq(0L, hi / 4, hi / 2, 3 * hi / 4, hi - 1).map(("g", _)).toDF("g", "v")
    val r = SketchOps.histogramQuantiles(df, col("g"), col("v"), bins = 4,
      qs = Seq(("p50", 1, 2), ("p99", 99, 100)))
      .as[(String, Long, Long, Long, Long)].collect().head
    val (_, n, p50, p99, err) = r
    assert(n === 5L)
    // Exact discrete quantiles of the 5 sorted values with the upper-edge
    // bound: p50 rank 3 → hi/2 is in bin 2, upper edge ≥ hi/2, within err.
    assert(p50 >= hi / 2 && p50 - hi / 2 <= err)
    assert(p99 >= hi - 1 && p99 - (hi - 1) <= err)
  }

  test("X: histogram sketch is exact when distinct values <= bins cover the range densely") {
    // Values 0..63 with bins=64: every value gets its own bucket, so the
    // upper-edge estimate IS the discrete quantile.
    val df = (0L to 63L).flatMap(v => Seq.fill(10)(("g", v))).toDF("g", "v")
    val r = SketchOps.histogramQuantiles(df, col("g"), col("v"), bins = 64,
      qs = Seq(("p50", 1, 2), ("p99", 99, 100)))
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(r._3 === 31L && r._4 === 63L && r._5 === 1L) // p50, p99, err_bound
  }

  test("X: grouped HLL — each group's estimate equals the global sketch over that " +
    "group's rows alone, and a NULL group keeps its own sketch") {
    val df = ((1 to 4000).map(k => (Some("a"), k)) ++
      (1 to 900).map(k => (Some("b"), k * 7)) ++
      (1 to 300).map(k => (None: Option[String], k * 13))).toDF("g", "k")
    val est = SketchOps.hllEstimateGrouped(
      SketchOps.hllRegistersGrouped(df, col("g"), col("k")))
      .select(col("g"), col("hll_estimate")).as[(Option[String], Double)]
      .collect().toMap
    assert(est.size === 3)
    def solo(rows: Seq[Int]): Double = SketchOps.hllEstimate(
      SketchOps.hllRegisters(rows.toDF("k"), col("k")))
      .select("hll_estimate").as[Double].head()
    assert(est(Some("a")) === solo((1 to 4000)))
    assert(est(Some("b")) === solo((1 to 900).map(_ * 7)))
    assert(est(None) === solo((1 to 300).map(_ * 13)))
  }

  test("X: grouped registers merge by (g, bucket) max across corpus halves") {
    val lo = (1 to 3000).map(k => ("g" + (k % 2), k)).toDF("g", "k")
    val hi = (2000 to 6000).map(k => ("g" + (k % 2), k)).toDF("g", "k")
    val full = lo.unionByName(hi)
    val merged = SketchOps.hllRegistersGrouped(lo, col("g"), col("k"))
      .union(SketchOps.hllRegistersGrouped(hi, col("g"), col("k")))
      .groupBy("g", "bucket").agg(max("reg").as("reg"))
    val eM = SketchOps.hllEstimateGrouped(merged)
      .select(col("g"), col("hll_estimate")).as[(String, Double)].collect().toMap
    val eF = SketchOps.hllEstimateGrouped(
      SketchOps.hllRegistersGrouped(full, col("g"), col("k")))
      .select(col("g"), col("hll_estimate")).as[(String, Double)].collect().toMap
    assert(eM === eF)
  }

  test("X: pairwise overlap — union estimate IS the union's sketch bit-for-bit, " +
    "and inclusion-exclusion recovers planted overlaps within sketch error") {
    // A = 1..4000, B = 2000..6000 (overlap 2001), C = 100000..104000 (disjoint).
    val df = ((1 to 4000).map(k => ("A", k)) ++ (2000 to 6000).map(k => ("B", k)) ++
      (100000 to 104000).map(k => ("C", k))).toDF("g", "k")
    val est = SketchOps.hllOverlapEstimates(
      SketchOps.hllRegistersGrouped(df, col("g"), col("k")))
      .select(col("ga"), col("gb"), col("union_est"), col("overlap_est"))
      .as[(String, String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(est.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
    // Register-level max IS the union sketch: the A∪B estimate equals the
    // single sketch over the concatenated keys EXACTLY.
    def solo(keys: Seq[Int]): Double = SketchOps.hllEstimate(
      SketchOps.hllRegisters(keys.toDF("k"), col("k")))
      .select("hll_estimate").as[Double].head()
    assert(est(("A", "B"))._1 === solo(((1 to 4000) ++ (2000 to 6000)).distinct))
    // Inclusion-exclusion lands near truth: |A∩B| = 2001 within the raw
    // estimator's compounded error; disjoint pairs sit near 0.
    assert(math.abs(est(("A", "B"))._2 - 2001) / 2001.0 < 0.25)
    assert(math.abs(est(("A", "C"))._2) < 4000 * 0.2)
    assert(math.abs(est(("B", "C"))._2) < 4000 * 0.2)
  }

  test("X: raw-regime accuracy — 50k distinct keys estimate within 10% (σ ≈ 1.04/√256 ≈ 6.5%)") {
    val n = 50000
    val est = SketchOps.hllEstimate(SketchOps.hllRegisters((1 to n).toDF("k"), col("k")))
      .select("hll_estimate").as[Double].head()
    assert(math.abs(est / n - 1.0) < 0.10, s"estimate $est for n=$n")
  }
}
