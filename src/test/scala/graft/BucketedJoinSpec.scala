package graft

import graft.engine.Layout
import org.apache.spark.sql.functions._

/** Bucketing must remove the join-time shuffle entirely: both sides
  * pre-shuffled at write time → zero Exchange operators in the join plan,
  * with results identical to the plain join. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables join with no exchange and identical results") {
    val fact = (1 to 5000).map(i => (i.toLong % 97, i.toLong, i * 2.0)).toDF("k", "id", "v")
    val dim = (0L to 96L).map(k => (k, s"label$k")).toDF("k", "label")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast path
      Layout.writeBucketed(fact, "fact_b", "k", 4)
      Layout.writeBucketed(dim, "dim_b", "k", 4)
      val joined = spark.table("fact_b").join(spark.table("dim_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() === 5000L)
      // same rows as the plain (shuffled) join
      val direct = fact.join(dim, "k").agg(sum(col("v")), count(lit(1))).collect().head
      val bucketed = joined.agg(sum(col("v")), count(lit(1))).collect().head
      assert(bucketed === direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS fact_b")
      spark.sql("DROP TABLE IF EXISTS dim_b")
    }
  }
}
