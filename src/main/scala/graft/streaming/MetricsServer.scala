package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Operator-facing HTTP endpoints — the reference exposes `/metrics`
  * (Prometheus text exposition of its counter registry) and a liveness
  * probe from the same process that runs the consumer loop (reference
  * src/listen.js:9-30). Here the same two routes serve the
  * [[StreamingOps.PipelineMetricsListener]] snapshot; a driver hosts one
  * instance alongside its streaming queries.
  *
  * JDK-built-in httpserver, a single-purpose scrape endpoint: no
  * dependency, no per-row cost, reads a concurrent-map snapshot on GET.
  */
final class MetricsServer(listener: StreamingOps.PipelineMetricsListener,
    port: Int = 0) {

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress(port), 0)
    s.createContext("/metrics", (ex: HttpExchange) => respond(ex, 200, prometheusText()))
    s.createContext("/health", (ex: HttpExchange) => respond(ex, 200, "ok\n"))
    s.setExecutor(null) // serve on the accept thread; scrape traffic only
    s.start()
    s
  }

  /** Bound port (useful with port=0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  /** Prometheus text exposition format: one `# TYPE name counter` plus
    * `name value` line per counter, names verbatim from the listener
    * (themselves verbatim from the reference's metric registry).
    */
  def prometheusText(): String = {
    val sb = new StringBuilder
    listener.snapshot().toSeq.sortBy(_._1).foreach { case (name, v) =>
      sb.append("# TYPE ").append(name).append(" counter\n")
      sb.append(name).append(' ').append(v).append('\n')
    }
    // duration histogram, sum/count exposition (per-batch trigger time —
    // the per-message histogram has no distributed analog, SURVEY §7.3)
    val (sumSec, n) = listener.durationSecondsAndBatches
    sb.append("# TYPE message_processing_duration_seconds histogram\n")
    // the +Inf bucket is mandatory for valid histogram exposition
    sb.append("message_processing_duration_seconds_bucket{le=\"+Inf\"} ")
      .append(n).append('\n')
    sb.append("message_processing_duration_seconds_sum ").append(sumSec).append('\n')
    sb.append("message_processing_duration_seconds_count ").append(n).append('\n')
    sb.toString
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "text/plain; version=0.0.4")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  def stop(): Unit = server.stop(0)
}
