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
}
