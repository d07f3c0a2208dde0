package graft

import graft.engine.Tables
import graft.sources.IngestOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S1-S4 ingest path (data_collector.py re-expression). */
class IngestOpsSpec extends SparkSpec {
  import spark.implicits._

  test("S2: work-list scan trims and drops blank lines (data_collector.py:42-52)") {
    val f = Files.createTempFile("ids", ".txt")
    Files.writeString(f, "  101  \n\n102\n   \n103\n")
    val ids = IngestOps.readWorkList(spark, f.toString).collect().toSet
    assert(ids === Set("101", "102", "103"))
  }

  test("S1: distributed fetch parses transport payloads against the explicit schema") {
    val ids = Seq("101", "102").toDS()
    val df = IngestOps.fetchBreadcrumbs(ids, new IngestOps.FakeTransport(3),
      Tables.breadcrumbRawSchema, parallelism = 2)
    assert(df.count() === 6)
    assert(df.select("VEHICLE_ID").distinct().as[Long].collect().toSet === Set(101L, 102L))
    assert(df.schema.fieldNames.contains("ACT_TIME"))
  }

  test("S4: queue publish batches per partition at the configured size") {
    val df = (1 to 250).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1)
    IngestOps.publishToQueue(df, TestPublisher, batchSize = 100)
    // one partition of 250 → batches of 100/100/50
    assert(TestPublisher.sizes.get.groupBy(identity).view.mapValues(_.size).toMap ===
      Map(100 -> 2, 50 -> 1))
    assert(TestPublisher.total.get === 250)
  }
}

/** Local-mode capture: executors share the JVM, so a static sink records
  * publishes. */
object TestPublisher extends IngestOps.QueuePublisher {
  val sizes = new java.util.concurrent.atomic.AtomicReference[List[Int]](Nil)
  val total = new java.util.concurrent.atomic.AtomicInteger(0)
  override def publishBatch(records: Seq[String]): Unit = {
    sizes.updateAndGet(l => records.size :: l)
    total.addAndGet(records.size)
  }
}
