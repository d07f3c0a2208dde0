package graft.operators

import graft.engine.Semantics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end re-expression of the reference's batch transform
  * (/root/reference/transform.py:86-312): raw breadcrumb JSON records →
  * (Trip dimension, BreadCrumb fact), as two declarative Spark plans.
  *
  * The reference does this with a driver-side sort + dict-of-lists group +
  * per-trip Python loops; here it is one window over
  * partitionBy(trip).orderBy(time) — a single shuffle on the trip key that
  * scales linearly with executors.
  */
object BreadcrumbPipeline {

  /** Cleaned fact rows with synthesized timestamps and derived speed.
    * Input: raw schema per Tables.breadcrumbRawSchema (EVENT_NO_TRIP,
    * OPD_DATE, ACT_TIME, METERS, GPS_LATITUDE, GPS_LONGITUDE, VEHICLE_ID).
    * Output: BreadCrumb(tstamp, latitude, longitude, speed, trip_id)
    * (transform.py:235-249). */
  def breadcrumbs(raw: DataFrame): DataFrame = {
    val cleaned = raw
      .filter(col("EVENT_NO_TRIP").isNotNull && col("OPD_DATE").isNotNull &&
        col("ACT_TIME").isNotNull) // transform.py:213-215 validity guard
      .withColumn("opd", EtlOps.parseOpdDate(col("OPD_DATE")))
      .withColumn("tstamp", EtlOps.synthesizeTimestamp(col("opd"), col("ACT_TIME")))
    // W1/W2: Δmeters/Δseconds within trip ordered by ACT_TIME; ACT_TIME is the
    // reference's order + time axis (transform.py:133, 222-226).
    EtlOps.deriveSpeed(cleaned,
        partitionCol = col("EVENT_NO_TRIP"),
        orderCols = Seq(col("ACT_TIME")),
        meters = col("METERS"),
        timeSec = col("ACT_TIME").cast("double"))
      .select(
        col("tstamp"),
        col("GPS_LATITUDE").as("latitude"),
        col("GPS_LONGITUDE").as("longitude"),
        col("speed"),
        col("EVENT_NO_TRIP").as("trip_id"))
  }

  /** Trip dimension: first record per trip defines the row
    * (transform.py:146-183): service_key from OPD_DATE weekday, direction
    * hardcoded 'Out', route_id NULL-to-populate-later. */
  def trips(raw: DataFrame): DataFrame = {
    val withDate = raw
      .filter(col("EVENT_NO_TRIP").isNotNull && col("OPD_DATE").isNotNull)
      .withColumn("opd", EtlOps.parseOpdDate(col("OPD_DATE")))
    EtlOps.extractDim(withDate,
        key = col("EVENT_NO_TRIP"),
        orderCols = Seq(col("ACT_TIME")),
        dimCols = Seq(
          col("EVENT_NO_TRIP").as("trip_id"),
          lit(null).cast("int").as("route_id"), // transform.py:177
          col("VEHICLE_ID").as("vehicle_id"),
          Semantics.serviceKey(Semantics.pgDow(to_timestamp(col("opd")))).as("service_key"),
          lit("Out").as("direction"))) // transform.py:172-173
  }

  /** Full load with J2 upsert semantics against an existing Trip table
    * (transform.py:190-195 ON CONFLICT DO NOTHING). */
  def loadTrips(raw: DataFrame, existingTrips: DataFrame): DataFrame =
    EtlOps.upsertNewKeys(trips(raw), existingTrips, Seq("trip_id"))
}
