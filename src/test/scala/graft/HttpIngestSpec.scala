package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._

/** Live-HTTP ingest (S1): the DSv2 census source fetches JSON
  * array-of-arrays payloads over HTTP on the executors — the reference's
  * `requests.get(api.census.gov...)` (`extractCensusACS5.py:26-27`). The
  * offline harness has no egress, so an in-process `HttpServer` on an
  * ephemeral localhost port stands in for the Census API; the wire format
  * and the fetch path are the real thing. */
class HttpIngestSpec extends SparkSpec {

  private def payload(year: Int, income: Int): String =
    s"""[["NAME","DP03_0062E","state","year"],
       |["Mississippi","$income","28","$year"],
       |["Missouri","${income + 9000}","29","$year"]]""".stripMargin

  private def serve(routes: Map[String, String]): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (route, body) =>
      server.createContext(route, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val bytes = body.getBytes("UTF-8")
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
      })
    }
    server.start()
    server
  }

  test("census source fetches live HTTP payloads, one partition per URL") {
    val server = serve(Map(
      "/acs5/2017" -> payload(2017, 42009),
      "/acs5/2018" -> payload(2018, 43567)))
    try {
      val port = server.getAddress.getPort
      val urls = Seq(2017, 2018)
        .map(y => s"http://127.0.0.1:$port/acs5/$y").mkString(",")
      val df = spark.read.format("graft.sources.CensusSource")
        .option("urls", urls).load()
      assert(df.columns.toSeq === Seq("NAME", "DP03_0062E", "state", "year"))
      assert(df.rdd.getNumPartitions === 2) // one fetch per executor task
      assert(df.count() === 4)
      val ms17 = df.filter(col("state") === "28" && col("year") === "2017")
        .collect()(0)
      assert(ms17.getAs[String]("DP03_0062E") === "42009")
      // the fetched frame drops straight into the EP1 rename path
      val renamed = graft.operators.CensusPipeline.renameAll(df,
        Map("NAME" -> "state_name", "DP03_0062E" -> "income",
          "state" -> "state_id"))
      assert(renamed.columns.toSeq ===
        Seq("state_name", "income", "state_id", "year"))
    } finally server.stop(0)
  }

  test("http fetch retries transient 503s with backoff, fails fast on " +
      "permanent 404, gives up after the attempt budget") {
    import java.util.concurrent.atomic.AtomicInteger
    val flakyHits = new AtomicInteger(0)
    val notFoundHits = new AtomicInteger(0)
    val downHits = new AtomicInteger(0)
    val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    def route(path: String, hits: AtomicInteger)(
        respond: (HttpExchange, Int) => Unit): Unit =
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          respond(ex, hits.incrementAndGet()); ex.close()
        }
      })
    val body = payload(2017, 42009).getBytes("UTF-8")
    route("/flaky", flakyHits) { (ex, n) =>
      if (n <= 2) ex.sendResponseHeaders(503, -1)
      else {
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
      }
    }
    route("/gone", notFoundHits) { (ex, _) =>
      ex.sendResponseHeaders(404, -1)
    }
    route("/down", downHits) { (ex, _) =>
      ex.sendResponseHeaders(503, -1)
    }
    server.start()
    try {
      val port = server.getAddress.getPort
      // transient: two 503s then success — the read recovers in-task
      val in = graft.sources.CensusSource
        .openHttp(s"http://127.0.0.1:$port/flaky")
      val got = new String(in.readAllBytes(), "UTF-8"); in.close()
      assert(got.contains("42009"))
      assert(flakyHits.get() === 3)
      // permanent 404: no retry — one request, immediate failure
      val e1 = intercept[java.io.IOException] {
        graft.sources.CensusSource.openHttp(s"http://127.0.0.1:$port/gone")
      }
      assert(e1.getMessage.contains("404") &&
        e1.getMessage.contains("permanent"))
      assert(notFoundHits.get() === 1)
      // persistent 503: bounded — exactly maxAttempts requests, then fail
      val e2 = intercept[java.io.IOException] {
        graft.sources.CensusSource.openHttp(s"http://127.0.0.1:$port/down")
      }
      assert(e2.getMessage.contains("after 3 attempts"))
      assert(downHits.get() === 3)
    } finally server.stop(0)
  }

  test("census source rejects missing and ambiguous location options") {
    // neither option
    intercept[Exception] {
      spark.read.format("graft.sources.CensusSource").load()
    }
    // both options — ambiguous, must throw rather than silently pick one
    intercept[Exception] {
      spark.read.format("graft.sources.CensusSource")
        .option("path", "/tmp/nowhere")
        .option("urls", "http://127.0.0.1:9/x").load()
    }
  }
}
