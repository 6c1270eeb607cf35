package graft.metrics

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** O1 — observability HTTP endpoints (reference: src/observability/http.zig):
  * GET /metrics (Prometheus text), /healthz (liveness: wire activity within
  * the window), /readyz (liveness ∧ no fatal error). JDK built-in server —
  * runs on the Spark driver beside the streaming query. */
final class MetricsHttp(metrics: GraftMetrics, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "text/plain; version=0.0.4")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/metrics", (ex: HttpExchange) =>
    respond(ex, 200, metrics.render))
  server.createContext("/healthz", (ex: HttpExchange) =>
    if (metrics.live) respond(ex, 200, "ok") else respond(ex, 503, "stalled"))
  server.createContext("/readyz", (ex: HttpExchange) =>
    if (metrics.ready) respond(ex, 200, "ok") else respond(ex, 503, "not ready"))
  server.setExecutor(null)

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)
}
