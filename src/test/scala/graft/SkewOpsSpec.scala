package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._

/** Salting must be pure plumbing: identical results to the unsalted plan,
  * with the heavy key spread over multiple reducer partitions. */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows, 90% on one heavy key
  private lazy val skewed = (1 to 10000).map { i =>
    (if (i % 10 == 0) s"k${i % 7}" else "heavy", i.toLong, i * 0.5)
  }.toDF("k", "id", "v")

  test("saltedCountSum equals the direct groupBy aggregate") {
    val direct = skewed.groupBy(col("k")).agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_value"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), math.round(r.getDouble(2) * 1e6)))).toMap
    val salted = SkewOps.saltedCountSum(skewed, col("k"), col("v"), col("id"), salts = 8)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), math.round(r.getDouble(2) * 1e6)))).toMap
    assert(salted === direct)
  }

  test("saltedCountSum phase 1 actually spreads the heavy key") {
    val partials = skewed.groupBy(col("k"), pmod(hash(col("id")), lit(8)).as("s"))
      .agg(count(lit(1))).filter(col("k") === "heavy").count()
    assert(partials === 8L) // heavy key split across all 8 salts
  }

  test("saltedJoin equals the plain equi-join row-for-row") {
    val dim = Seq(("heavy", "H"), ("k0", "A"), ("k3", "B")).toDF("k", "label")
    val direct = skewed.join(dim, "k").groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedJoin(skewed, dim, Seq("k"), spread = col("id"), salts = 8)
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === direct)
  }
}
