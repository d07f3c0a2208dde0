package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's ingest path (/root/reference/data_collector.py) as
  * Spark-native operators (SURVEY §2.1 S1-S4).
  *
  * The reference fans a 200-vehicle work list over a 10-thread pool of HTTP
  * GETs and publishes record-at-a-time to a queue (data_collector.py:36,
  * 176-188). Here the work list is a Dataset and the fan-out is task
  * scheduling: each partition of ids fetches through a pluggable transport
  * (no network in this environment — a deterministic fake stands in), and
  * sinks are batched per partition. Same shape at 1000 executors.
  */
object IngestOps {

  /** S2: work-list scan — id file → trimmed, non-empty ids
    * (data_collector.py:42-52). */
  def readWorkList(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read.textFile(path)
      .map(_.trim)
      .filter(length(trim(col("value"))) > 0)
  }

  /** S1 transport: one HTTP GET per vehicle id returning raw JSON records
    * (data_collector.py:54-66). Implementations must be Serializable — they
    * run inside tasks. */
  trait FetchTransport extends Serializable {
    def fetch(vehicleId: String): Seq[String]
  }

  /** Deterministic stand-in for the REST endpoint (zero-egress container):
    * emits `n` well-formed breadcrumb JSON records per id. */
  final class FakeTransport(n: Int = 3) extends FetchTransport {
    override def fetch(vehicleId: String): Seq[String] = {
      val vid = vehicleId.toLong
      (0 until n).map { i =>
        s"""{"EVENT_NO_TRIP": ${vid * 1000 + 1}, "OPD_DATE": "25DEC2022:00:00:00", """ +
          s""""ACT_TIME": ${36000 + i * 10}, "METERS": ${i * 100.0}, """ +
          s""""GPS_LATITUDE": 45.5, "GPS_LONGITUDE": -122.6, "VEHICLE_ID": $vid}"""
      }
    }
  }

  /** S1: distributed fetch — ids are repartitioned across tasks (the
    * thread-pool analogue, but cluster-wide) and each task streams its ids
    * through the transport; payloads parse via from_json against the
    * explicit schema (F14). */
  def fetchBreadcrumbs(ids: Dataset[String], transport: FetchTransport,
      schema: StructType, parallelism: Int = 10): DataFrame = {
    import ids.sparkSession.implicits._
    val raw = ids.repartition(parallelism)
      .mapPartitions(it => it.flatMap(transport.fetch))
    raw.select(from_json(col("value"), schema).as("r")).select(col("r.*"))
  }

  /** S4 sink: per-record publish batched per partition
    * (data_collector.py:81-142's futures-of-100). The publisher is
    * pluggable; `batchSize` mirrors the reference's 100.
    *
    * Returns the (published, failed) record tally — the reference's
    * `(published, errors)` accounting (data_collector.py:130-134). A failed
    * batch counts as failed and does NOT fail the job (the reference logs
    * and continues); callers wanting at-least-once instead should rethrow
    * in their publisher so task retry kicks in, paired with an idempotent
    * consumer as in T1. */
  trait QueuePublisher extends Serializable {
    def publishBatch(records: Seq[String]): Unit
  }

  def publishToQueue(df: DataFrame, publisher: QueuePublisher, batchSize: Int = 100): (Long, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    df.toJSON
      .mapPartitions { it =>
        var ok = 0L
        var err = 0L
        it.grouped(batchSize).foreach { b =>
          try { publisher.publishBatch(b); ok += b.size }
          catch { case scala.util.control.NonFatal(_) => err += b.size }
        }
        Iterator((ok, err))
      }
      .collect() // one (ok, err) pair per partition — driver state is O(partitions)
      .foldLeft((0L, 0L)) { case ((o, e), (po, pe)) => (o + po, e + pe) }
  }
}
