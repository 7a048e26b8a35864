package graft.observability

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.incremental.{StateStore, Watermark}
import graft.model.JobStatus

/**
 * Monitoring endpoint — the engine's replacement for the reference's
 * Thrift progress API (`thrift/src/main/resources/reair.thrift`,
 * `TReplicationService.getStatus`) and the small web UI that fronts it
 * (`web-server/src/main/java/com/airbnb/reair/WebServer.java`): one plain
 * HTTP/JSON endpoint on the JDK's built-in server (zero dependencies).
 *
 *  - `GET /status`  → job counts by status, watermark, lag seconds +
 *    alert bucket (the reference's 1800/3600/7200/10800/21600 thresholds),
 *    and any collected `observe` counters (A7/A8).
 *  - `GET /health`  → 200 "ok" (liveness).
 *
 * All numbers come from the state table's latest-wins view and the
 * in-memory metrics collector — the endpoint reads, never mutates.
 */
final class StatusServer(state: StateStore, watermark: Watermark,
    collector: Option[Metrics.Collector] = None, port: Int = 0) {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private var server: HttpServer = _

  /** Start listening; returns the bound port (useful with port=0). */
  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/status", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex, 200, statusJson())
    })
    server.createContext("/health", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex, 200, """{"ok":true}""")
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private[observability] def statusJson(): String = {
    val node = mapper.createObjectNode()
    val byStatus = state.current().groupByKey(_.status)(
        org.apache.spark.sql.Encoders.STRING)
      .count().collect().toMap
    val jobs = node.putObject("jobs")
    Seq(JobStatus.Pending, JobStatus.Running, JobStatus.Successful,
      JobStatus.Failed, JobStatus.NotCompletable, JobStatus.Aborted)
      .foreach(s => jobs.put(s, byStatus.getOrElse(s, 0L)))
    watermark.get().foreach(node.put("watermark", _))
    Metrics.jobLagSeconds(state, System.currentTimeMillis()).foreach { lag =>
      node.put("lagSeconds", lag)
      node.put("lagBucket", Metrics.lagBucket(lag))
    }
    val counters = node.putObject("counters")
    collector.foreach(_.metrics.foreach { case (name, m) =>
      val c = counters.putObject(name)
      m.foreach {
        case (k, v: Long) => c.put(k, v)
        case (k, v: Int) => c.put(k, v.toLong)
        case (k, v) => c.put(k, String.valueOf(v))
      }
    })
    mapper.writeValueAsString(node)
  }
}
