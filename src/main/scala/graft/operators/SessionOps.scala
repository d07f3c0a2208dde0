package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization (SURVEY §2.10 X6): split each entity's event stream into
  * sessions at inactivity gaps. Batch form = lag gap-flag + running sum over
  * one window (single shuffle on the entity key); the streaming form is
  * `session_window` in StreamingOps. */
object SessionOps {

  /** Assign a 1-based session id per entity: a new session starts at the
    * first event or when the gap from the previous event exceeds
    * `gapSeconds` (same unit as `timeSec`). Pass integer time columns in
    * their native unit (e.g. int64 nanos, gap in nanos): the lag difference
    * is then exact, whereas converting absolute epoch values to double first
    * quantizes them (256 ns at 2024-epoch nano magnitudes). */
  def sessionize(df: DataFrame, entity: Column, timeSec: Column, orderCols: Seq[Column],
      gapSeconds: Double): DataFrame = {
    val w = Window.partitionBy(entity).orderBy(orderCols: _*)
    val prev = lag(timeSec, 1).over(w)
    val newSession = when(prev.isNull || (timeSec - prev) > gapSeconds, 1L).otherwise(0L)
    df.withColumn("__new_session", newSession)
      .withColumn("session_id",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Cohort retention matrix: entities grouped by FIRST-ACTIVE date, then
    * distinct actives counted per (cohort, day offset) — the
    * day-0/day-N retention triangle every product-analytics stack reads.
    * Returns (cohort_date, day_offset, n_users).
    *
    * Plan: one (entity, date) distinct, one per-entity min, one equi-join
    * back on the ENTITY key (ids only, never event payloads), one hash
    * aggregate — every shuffle is on the entity or the small output key.
    * Output cardinality is cohorts × offsets regardless of event volume. */
  def cohortRetention(df: DataFrame, entity: Column, date: Column): DataFrame = {
    val act = df.select(entity.as("u"), date.as("d")).distinct()
    val cohort = act.groupBy(col("u")).agg(min(col("d")).as("cohort_date"))
    act.join(cohort, "u")
      .groupBy(col("cohort_date"),
        datediff(col("d"), col("cohort_date")).cast("long").as("day_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
  }

  /** Ordered funnel conversion: per stage k, the entities that performed
    * step 1..k in STRICT time order (each step strictly after the
    * previous; first qualifying occurrence wins). Returns one row per
    * stage: (stage, step, n_users).
    *
    * Pass an INTEGER time column (µs) so "strictly after" is decided
    * exactly in any engine. Plan: stage k is a per-entity min over step-k
    * events joined to stage k−1 on the entity key — k equi-joins shipping
    * (entity, time) pairs only; event payloads never move. At 100 TB
    * persist each stage frame (it is read by the count AND the next
    * stage); here Spark's exchange reuse covers the double read. */
  def funnel(df: DataFrame, entity: Column, time: Column, step: Column,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps must be non-empty and distinct")
    val ev = df.select(entity.as("u"), time.as("__tv"), step.as("__st"))
    val stages = steps.tail.scanLeft(
      ev.filter(col("__st") === steps.head).groupBy(col("u"))
        .agg(min(col("__tv")).as("t"))) { (prev, s) =>
      ev.filter(col("__st") === s)
        .join(prev, "u")
        .filter(col("__tv") > col("t"))
        .groupBy(col("u")).agg(min(col("__tv")).as("t"))
    }
    stages.zip(steps).zipWithIndex.map { case ((frame, s), i) =>
      frame.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("stage"), lit(s).as("step"), col("n_users"))
    }.reduce(_.unionAll(_))
  }
}
