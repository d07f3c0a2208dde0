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

  test("X: raw-regime accuracy — 50k distinct keys estimate within 10% (σ ≈ 1.04/√256 ≈ 6.5%)") {
    val n = 50000
    val est = SketchOps.hllEstimate(SketchOps.hllRegisters((1 to n).toDF("k"), col("k")))
      .select("hll_estimate").as[Double].head()
    assert(math.abs(est / n - 1.0) < 0.10, s"estimate $est for n=$n")
  }
}
