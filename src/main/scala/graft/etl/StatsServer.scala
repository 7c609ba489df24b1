package graft.etl

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

/** P17: the ops stats HTTP surface — reference main.py:256-266 (Flask
  * `GET /` returning uptime + counters) and main.py:268-274 (the 500
  * handler that reports instead of crashing the loop). Served by the
  * JDK's built-in HttpServer: no new dependencies, single daemon
  * thread, entirely off the Spark driver's hot path.
  *
  * @param statsFn snapshot supplier (EtlLoop.stats); a throwing
  *                supplier yields a 500 response, mirroring the
  *                reference's error handler
  * @param port    0 = ephemeral (tests); fixed port in production
  */
final class StatsServer(statsFn: () => Map[String, String], port: Int = 8080) {

  private val startedAtMs = System.currentTimeMillis()
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** The GET / body: stats snapshot + uptime, as flat JSON. */
  private[etl] def render(): String = {
    val uptime = (System.currentTimeMillis() - startedAtMs) / 1000
    (statsFn() + ("uptime_sec" -> uptime.toString))
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
  }

  server.createContext("/", new HttpHandler {
    override def handle(x: HttpExchange): Unit =
      try {
        val b = render().getBytes("UTF-8")
        x.getResponseHeaders.add("Content-Type", "application/json")
        x.sendResponseHeaders(200, b.length)
        x.getResponseBody.write(b)
      } catch {
        case _: Exception =>
          val b = """{"error":"internal server error"}""".getBytes("UTF-8")
          x.sendResponseHeaders(500, b.length)
          x.getResponseBody.write(b)
      } finally x.close()
  })
  server.setExecutor(null) // single-threaded dispatch is plenty for ops polls

  def start(): this.type = { server.start(); this }

  /** Actual bound port (differs from the requested one when port=0). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}
