package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.engine.Tables
import graft.sources.IngestOps
import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap

/** S1's REAL HTTP path, driven end-to-end against an in-process JDK
  * `HttpServer` (round-13 verdict task #3 — the round-13 PostgreSQL
  * discipline applied to ingest): real sockets, real GETs from executor
  * task threads, the reference's JSON-array body shape
  * (data_collector.py:54-66), the empty-fetch skip (:152-154), and the
  * loud-failure divergences the transport documents. No external network
  * is touched — the server binds 127.0.0.1 on an ephemeral port.
  */
class HttpIngestSpec extends SparkSpec {
  import spark.implicits._

  /** Fixture server: GET /breadcrumbs?vehicle_id=N → JSON array of
    * breadcrumb records (the reference endpoint's observable shape).
    * Records every vehicle_id requested, so the spec can assert the
    * work-list fan-out arrived — not just that rows came back. */
  private def withServer[A](
      body: String => String)(f: (String, java.util.Set[String]) => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val requested = ConcurrentHashMap.newKeySet[String]()
    server.createContext("/breadcrumbs", (ex: HttpExchange) => {
      val vid = Option(ex.getRequestURI.getQuery).getOrElse("")
        .split("&").collectFirst {
          case kv if kv.startsWith("vehicle_id=") =>
            java.net.URLDecoder.decode(kv.stripPrefix("vehicle_id="), "UTF-8")
        }.getOrElse("")
      requested.add(vid)
      val bytes = body(vid).getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    // A couple of worker threads: executor tasks fetch concurrently.
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/breadcrumbs", requested)
    finally server.stop(0)
  }

  /** The reference's record shape, two records per vehicle. */
  private def recordsFor(vid: String): String = {
    if (vid.isEmpty) "[]"
    else {
      val v = vid.toLong
      (0 until 2).map { i =>
        s"""{"EVENT_NO_TRIP": ${v * 1000 + 1}, "OPD_DATE": "25DEC2022:00:00:00", """ +
          s""""ACT_TIME": ${36000 + i * 10}, "METERS": ${i * 100.0}, """ +
          s""""GPS_LATITUDE": 45.5, "GPS_LONGITUDE": -122.6, "VEHICLE_ID": $v}"""
      }.mkString("[", ", ", "]")
    }
  }

  test("S1: real HTTP GETs from tasks — every work-list id requested, records parsed, empty fetch skipped") {
    withServer(vid => if (vid == "777") "[]" else recordsFor(vid)) { (base, requested) =>
      val ids = Seq("101", "102", "777", "103").toDS()
      val df = IngestOps.fetchBreadcrumbs(ids, new IngestOps.HttpTransport(base),
        Tables.breadcrumbRawSchema, parallelism = 2)
      val rows = df.collect()
      // 3 non-empty ids × 2 records; 777's [] contributes nothing — the
      // empty-fetch skip falls out of flatMap, no special casing.
      assert(rows.length === 6)
      assert(df.select("VEHICLE_ID").distinct().as[Long].collect().toSet ===
        Set(101L, 102L, 103L))
      // Fan-out completeness: the EMPTY id was still fetched (its absence
      // downstream is the payload's doing, not a dropped task).
      assert(requested.contains("777"))
      assert(Set("101", "102", "103").subsetOf(
        scala.jdk.CollectionConverters.SetHasAsScala(requested).asScala.toSet))
      // Field fidelity through the socket + from_json path.
      val r = df.where(df("VEHICLE_ID") === 101L && df("ACT_TIME") === 36010)
        .select("METERS").as[Double].collect()
      assert(r.toSeq === Seq(100.0))
    }
  }

  test("S1: baseUrl with an existing query string joins with '&', not a second '?'") {
    withServer(vid => if (vid.isEmpty) "[]" else recordsFor(vid)) { (base, requested) =>
      val ids = Seq("101").toDS()
      val df = IngestOps.fetchBreadcrumbs(ids,
        new IngestOps.HttpTransport(base + "?api_key=k"),
        Tables.breadcrumbRawSchema, parallelism = 1)
      // The request parses as TWO parameters — vehicle_id survives beside
      // the pre-existing one instead of hiding inside a malformed '??' URL.
      assert(df.count() === 2)
      assert(requested.contains("101"))
    }
  }

  test("S1: non-array body raises loudly (divergence from the reference's silent None)") {
    withServer(_ => """{"oops": true}""") { (base, _) =>
      val ids = Seq("101").toDS()
      val e = intercept[org.apache.spark.SparkException] {
        IngestOps.fetchBreadcrumbs(ids, new IngestOps.HttpTransport(base),
          Tables.breadcrumbRawSchema, parallelism = 1).count()
      }
      assert(e.getMessage.contains("expected a JSON array") ||
        Option(e.getCause).exists(_.getMessage.contains("expected a JSON array")))
    }
  }

  test("S1: non-2xx status raises loudly with the status code") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/breadcrumbs", (ex: HttpExchange) => {
      ex.sendResponseHeaders(503, -1); ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/breadcrumbs"
      val ids = Seq("101").toDS()
      val e = intercept[org.apache.spark.SparkException] {
        IngestOps.fetchBreadcrumbs(ids, new IngestOps.HttpTransport(base),
          Tables.breadcrumbRawSchema, parallelism = 1).count()
      }
      assert(e.getMessage.contains("HTTP 503") ||
        Option(e.getCause).exists(_.getMessage.contains("HTTP 503")))
    } finally server.stop(0)
  }

  test("S1: work-list → HTTP fetch → queue sink, the collector's whole chain on real sockets") {
    withServer(recordsFor) { (base, _) =>
      val f = java.nio.file.Files.createTempFile("ids", ".txt")
      java.nio.file.Files.writeString(f, " 201 \n\n202\n")
      val ids = IngestOps.readWorkList(spark, f.toString)
      val df = IngestOps.fetchBreadcrumbs(ids, new IngestOps.HttpTransport(base),
        Tables.breadcrumbRawSchema, parallelism = 2)
      val (ok, err) = IngestOps.publishToQueue(df, HttpChainPublisher, batchSize = 100)
      assert(ok === 4L && err === 0L) // 2 ids × 2 records, all published
      assert(HttpChainPublisher.total.get === 4)
    }
  }
}

/** Own capture sink — the suite must not mutate IngestOpsSpec's
  * TestPublisher accumulators (shared JVM, order-dependent asserts). */
object HttpChainPublisher extends IngestOps.QueuePublisher {
  val total = new java.util.concurrent.atomic.AtomicInteger(0)
  override def publishBatch(records: Seq[String]): Unit =
    total.addAndGet(records.size)
}
