package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Readers + explicit schemas for the driver-generated testdata star schema
  * (TESTDATA.md / FIXTURES.md). The reference's implicit, key-access-discovered
  * JSON schema (/root/reference/transform.py:114-126) becomes explicit
  * `StructType`s here — schema-on-read with a declared contract, so Catalyst
  * can prune columns and push filters into the Parquet scan.
  *
  * All readers are pure `(SparkSession, sfDir) => DataFrame`; no caching, no
  * mutable state — at 100 TB each of these is a straight columnar scan whose
  * partitioning is inherited from the file layout.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Plain parquet scan. Filter/projection pushdown is Catalyst's job —
    * callers declare plans, never pre-materialize.
    *
    * `events.parquet` stores TIMESTAMP(NANOS) which Spark's TimestampType
    * (µs) cannot represent; `nanosAsLong` reads it as raw nanos (long) and
    * [[events]] derives a µs-truncated TimestampType column. Oracle SQL must
    * likewise truncate (`CAST(ts AS TIMESTAMP)` in DuckDB) when a timestamp
    * value is output. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    Engine.ensureInitialized(spark) // once per session, guarded
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** `events` with `ts` exposed BOTH ways: `ts` = µs-truncated TimestampType
    * (what queries filter/group on) and `ts_ns` = raw int64 nanos (kept for
    * precision-exact arithmetic like sessionization gaps). Integer `div`
    * (not `/`, which promotes to double and rounds above 2^53 ns) matches
    * DuckDB's CAST(ts AS TIMESTAMP) truncation exactly for positive epochs —
    * and gives [[graft.plans.SargableTimestampRules]] a monotone integer
    * chain it can invert to push date filters onto the raw ts_ns scan. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    table(spark, sfDir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Schema of the reference's raw breadcrumb JSON — the only schema contract
    * that exists in the reference (fields touched at
    * /root/reference/transform.py:133-249, data_subscriber.py:74-77).
    * Used by the corrupt-tolerant JSONL scan (SURVEY S7). */
  val breadcrumbRawSchema: StructType = StructType(Seq(
    StructField("EVENT_NO_TRIP", LongType),
    StructField("OPD_DATE", StringType),
    StructField("ACT_TIME", LongType),
    StructField("METERS", DoubleType),
    StructField("GPS_LATITUDE", DoubleType),
    StructField("GPS_LONGITUDE", DoubleType),
    StructField("VEHICLE_ID", LongType),
    StructField("timestamp", StringType),
    StructField("_corrupt_record", StringType)))

  /** Trip dimension schema (reference: transform.py:175-181, INSERT :190-194). */
  val tripSchema: StructType = StructType(Seq(
    StructField("trip_id", LongType, nullable = false),
    StructField("route_id", IntegerType, nullable = true),
    StructField("vehicle_id", LongType, nullable = true),
    StructField("service_key", StringType, nullable = true),
    StructField("direction", StringType, nullable = true)))

  /** BreadCrumb fact schema (reference: transform.py:235-249, INSERT :265-269). */
  val breadcrumbSchema: StructType = StructType(Seq(
    StructField("tstamp", TimestampType, nullable = false),
    StructField("latitude", DoubleType, nullable = true),
    StructField("longitude", DoubleType, nullable = true),
    StructField("speed", DoubleType, nullable = true),
    StructField("trip_id", LongType, nullable = false)))
}
