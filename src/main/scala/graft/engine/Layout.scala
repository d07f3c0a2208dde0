package graft.engine

import org.apache.spark.sql.DataFrame

/** Physical-layout helpers for the 100 TB posture (SURVEY §4; builder
  * prompt: "bucketing for co-located joins").
  *
  * Bucketing pre-shuffles a table ONCE at write time: every subsequent
  * equi-join or aggregation on the bucket key reads co-located buckets and
  * plans with NO exchange on that side — the repeated-join fact⋈fact case
  * where broadcast doesn't apply and a per-query shuffle of the big table
  * would dominate. Verified in `BucketedJoinSpec`: two bucketed sides join
  * with zero Exchange operators in the plan.
  */
object Layout {

  /** Write `df` bucketed (and sorted) by `key` into the session catalog as
    * `table`. Readers joining/grouping on `key` inherit the bucketing. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
