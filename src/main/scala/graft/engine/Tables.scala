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
    * callers declare plans, never pre-materialize. */
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
  /** `events` with `ts` exposed BOTH ways: `ts` = µs TimestampType (what
    * queries filter/group on) and `ts_ns` = int64 nanos (kept for
    * precision-exact arithmetic like sessionization gaps). The reader
    * ADAPTS to how the generator stamped the column — the physical parquet
    * type has changed across driver rounds, and a library must read both:
    *
    *  - TIMESTAMP(NANOS): Spark's TimestampType (µs) cannot represent it,
    *    so `nanosAsLong` (Engine.ensureInitialized) reads raw nanos and the
    *    µs `ts` is derived by integer `div` (not `/`, which promotes to
    *    double and rounds above 2^53 ns) — matching DuckDB's
    *    CAST(ts AS TIMESTAMP) truncation exactly for positive epochs, and
    *    giving [[graft.plans.SargableTimestampRules]] a monotone integer
    *    chain it inverts to push date filters onto the raw ts_ns scan.
    *  - TIMESTAMP(MICROS) (isAdjustedToUTC=false → TIMESTAMP_NTZ): `ts` is
    *    the session-TZ cast of the native column (value-preserving — every
    *    entrypoint pins the session TZ to UTC) and ts_ns = µs·1000. The
    *    sargable rule's NTZ case strips the cast from literal comparisons
    *    so day filters still reach the parquet scan natively. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
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
