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

  test("S4: queue publish batches per partition at the configured size, returns (ok, err)") {
    val df = (1 to 250).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1)
    val (ok, err) = IngestOps.publishToQueue(df, TestPublisher, batchSize = 100)
    // one partition of 250 → batches of 100/100/50
    assert(TestPublisher.sizes.get.groupBy(identity).view.mapValues(_.size).toMap ===
      Map(100 -> 2, 50 -> 1))
    assert(TestPublisher.total.get === 250)
    assert((ok, err) === ((250L, 0L)))
  }

  test("S4: failed batches count as errors, not job failure (data_collector.py:130-134)") {
    val df = (1 to 250).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1)
    val (ok, err) = IngestOps.publishToQueue(df, FlakyPublisher, batchSize = 100)
    assert(ok === 150L) // the middle batch of 100 fails
    assert(err === 100L)
  }

  test("S10: header CSV source round-trips rows and types under an explicit schema") {
    val dir = Files.createTempDirectory("s10csv")
    val df = Seq((1, "A", 10), (2, "B", 20), (3, "C", 10)).toDF("k", "name", "grp")
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(dir.toString)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("grp", org.apache.spark.sql.types.IntegerType)))
    val back = graft.sources.CsvSource.readHeaderCsv(spark, dir.toString, Some(schema))
    assert(back.schema === schema)
    assert(back.orderBy("k").as[(Int, String, Int)].collect().toSeq ===
      Seq((1, "A", 10), (2, "B", 20), (3, "C", 10)))
    // inference path (ad-hoc use): values survive, header consumed
    val inferred = graft.sources.CsvSource.readHeaderCsv(spark, dir.toString)
    assert(inferred.count() === 3)
    assert(inferred.columns.toSeq === Seq("k", "name", "grp"))
  }

  test("S10: the reference's own OR.csv census fixture reads with the documented " +
    "shape (reference OR.csv:1)") {
    // The one reference artifact no test had ever touched: the 37-column
    // census-tract CSV the reference repo ships. Parity check = shape and
    // types under schema inference, plus value-level sanity aggregates.
    val path = new java.io.File("/root/reference/OR.csv")
    assume(path.isFile, "reference OR.csv not present in this environment")
    import org.apache.spark.sql.types._
    val df = graft.sources.CsvSource.readHeaderCsv(spark, path.toString)
    assert(df.columns.length === 37, "census fixture is 37 columns")
    assert(df.columns.take(6).toSeq ===
      Seq("TractId", "State", "County", "TotalPop", "Men", "Women"))
    assert(df.count() === 837L, "834 Oregon + 3 Missouri tracts")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("TractId") === LongType)        // 11-digit FIPS ids overflow Int
    assert(types("State") === StringType)
    assert(types("County") === StringType)
    assert(types("TotalPop") === IntegerType)
    assert(types("Hispanic") === DoubleType)     // percentage columns
    assert(types("Income") === DoubleType)       // has blanks -> nullable double
    // Value-level sanity: the inferred read really parsed rows, not headers.
    val byState = df.groupBy("State").count()
      .as[(String, Long)].collect().toMap
    assert(byState === Map("Oregon" -> 834L, "Missouri" -> 3L))
    assert(df.agg(sum(col("TotalPop"))).as[Long].head() > 1000000L,
      "state population must aggregate to millions")
    // Blank numeric cells must read as NULL, never as 0 (Income has gaps).
    assert(df.filter(col("Income").isNull).count() > 0L)
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

/** Fails the second batch it sees (per JVM) — exercises the error tally. */
object FlakyPublisher extends IngestOps.QueuePublisher {
  val n = new java.util.concurrent.atomic.AtomicInteger(0)
  override def publishBatch(records: Seq[String]): Unit =
    if (n.incrementAndGet() == 2) throw new RuntimeException("queue unavailable")
}
