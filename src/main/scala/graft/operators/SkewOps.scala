package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (builder prompt: "Skewed keys → salting or AQE
  * skew-join").
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * operators cover the two cases AQE does not re-plan: a grouped aggregation
  * whose key set is tiny relative to the cluster (all rows of a heavy key
  * land on one reducer), and a shuffle join against a small-but-not-broadcast
  * side with heavy-hitter keys.
  *
  * Salts are derived deterministically (hash of a spread column, never
  * rand()) so results are reproducible and retries/speculative tasks see
  * identical data.
  */
object SkewOps {

  private def saltOf(spread: Column, salts: Int): Column =
    pmod(hash(spread), lit(salts))

  /** Two-phase salted count+sum by `key`: phase 1 aggregates (key, salt)
    * partials — at most `salts` partitions per heavy key instead of one
    * straggler — phase 2 merges the ≤ |keys|·salts partial rows. Output is
    * IDENTICAL to `groupBy(key).agg(count, sum)` (count/sum are commutative
    * monoids), so the plain aggregate doubles as its oracle. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column, spread: Column,
      salts: Int = 16): DataFrame =
    df.groupBy(key.as("key"), saltOf(spread, salts).as("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(value).as("__sum"))
      .groupBy(col("key"))
      .agg(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as("sum_value"))

  /** Salted equi-join for heavy-hitter keys: the big side gets a
    * deterministic salt in [0, salts); the small side is replicated `salts`
    * times (explode of a literal range — a narrow map, no shuffle of the
    * replicas beyond the join's own); the join key becomes (keys..., salt),
    * spreading each heavy key over `salts` reducers. Row-for-row equal to
    * the unsalted join. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String], spread: Column,
      salts: Int = 16): DataFrame = {
    val bigS = big.withColumn("__salt", saltOf(spread, salts))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }
}
