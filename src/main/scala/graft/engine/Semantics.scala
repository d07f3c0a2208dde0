package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine semantics helpers (SURVEY §4 gotchas).
  *
  * The reference's queries execute in PostgreSQL (/root/reference/analytic.sql);
  * our results are oracle-checked against DuckDB; we run on Spark. Every place
  * the three engines disagree is normalized HERE, once, and every query goes
  * through these helpers:
  *
  *  1. day-of-week numbering: PG/DuckDB `EXTRACT(DOW)` is 0=Sunday..6=Saturday;
  *     Spark `dayofweek` is 1=Sunday..7=Saturday (analytic.sql:13,24,44).
  *  2. integer division: PG bigint/bigint truncates (analytic.sql:22); Spark
  *     `/` promotes to double — use `div`.
  *  3. interval-valued MAX(ts)-MIN(ts) (analytic.sql:100): compared as whole
  *     seconds (long) so all engines order identically.
  *  4. float aggregates: rounded before comparison (summation order differs
  *     across engines/partitionings at scale).
  */
object Semantics {

  /** Sargable event-date equality: `ts::date = d` (analytic.sql:4,8,31) as a
    * half-open timestamp range, so the predicate pushes down to the parquet
    * scan (and prunes date partitions at 100 TB) instead of wrapping the
    * column in a cast that blocks pushdown. */
  def onDate(ts: Column, date: String): Column = {
    val d0 = to_timestamp(lit(date))
    ts >= d0 && ts < d0 + expr("INTERVAL 1 DAY")
  }

  /** round() with IEEE negative zero normalized to +0.0.
    *
    * A value like -1e-9 rounds to `-0.0` in DuckDB but `+0.0` in Spark (bit
    * patterns 0x8000000000000000 vs 0x0), so a bitwise result hash diverges
    * even though every comparison agrees — this cost q14 its round-1 hash
    * match. Every rounded output column whose value can be NEGATIVE (speed
    * deltas, cosines of random vectors) must go through this helper, and its
    * oracle SQL must append `+ 0.0` after the round (IEEE: -0.0 + 0.0 = +0.0).
    * Spark treats -0.0 = 0.0 in comparisons, so the `when` catches both. */
  def roundz(c: Column, scale: Int): Column = {
    val r = round(c, scale)
    when(r === 0d, lit(0d)).otherwise(r)
  }

  /** Day-of-week, PostgreSQL/DuckDB numbering: 0=Sunday .. 6=Saturday.
    * (reference: EXTRACT(DOW FROM tstamp), analytic.sql:13,24,44,55) */
  def pgDow(ts: Column): Column = (dayofweek(ts) - lit(1)).cast("long")

  /** Hour-of-day as long (matches DuckDB EXTRACT(HOUR) → BIGINT).
    * Session TZ is pinned UTC, mirroring AT TIME ZONE 'UTC' (analytic.sql:45). */
  def hourOf(ts: Column): Column = hour(ts).cast("long")

  /** PG-style truncating integer division of two bigints (analytic.sql:22).
    * floor == truncate for the non-negative counts this is used on; Spark's
    * SQL `div` operator has no Column-API equivalent. */
  def intDiv(a: Column, b: Column): Column =
    floor(a.cast("long") / b.cast("long")).cast("long")

  /** Timestamp difference in whole seconds (engine-orderable stand-in for the
    * interval of analytic.sql:100). */
  def secondsBetween(later: Column, earlier: Column): Column =
    (unix_timestamp(later) - unix_timestamp(earlier)).cast("long")

  /** Service-key classification from PG DOW (reference transform.py:160-170,
    * which uses Python weekday() 0=Mon; normalized here to pgDow). */
  def serviceKey(dow0Sun: Column): Column =
    when(dow0Sun === 6, "Saturday")
      .when(dow0Sun === 0, "Sunday")
      .otherwise("Weekday")

  /** PG DOW → English day name (reference analytic.sql:13-21 CASE). */
  def dayName(dow0Sun: Column): Column =
    when(dow0Sun === 0, "Sunday")
      .when(dow0Sun === 1, "Monday")
      .when(dow0Sun === 2, "Tuesday")
      .when(dow0Sun === 3, "Wednesday")
      .when(dow0Sun === 4, "Thursday")
      .when(dow0Sun === 5, "Friday")
      .otherwise("Saturday")
}
