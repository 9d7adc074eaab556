package graft.kv

import java.net.InetSocketAddress
import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The reference's HTTP transport (A1–A4) over [[KvEngine]], using the
  * JDK's built-in HttpServer — no new dependencies.
  *
  * Route and envelope parity with reference `main.go:35-104`:
  *  - `GET /ready` → 200, empty body (`main.go:36`)
  *  - `GET /collections` → JSON string array (`main.go:37-46`); an empty
  *    engine yields `null`, faithfully mirroring Go's nil-slice encoding
  *  - `/collections/{id}/{key}` → read, `{"data":"<value>"}` (`main.go:48-77`)
  *  - `/collections/{id}/{key}/{value}` → write, empty 200 (`main.go:78-102`)
  *  - any engine error → 500 with `{"code":500,"message":"<err>"}`
  *    (`handleServerError`, `main.go:126-137`) — the message strings are the
  *    engine's own, which KvEngine already keeps byte-identical to the
  *    reference's error taxonomy
  *  - unknown paths → 404 (mux's no-match behavior)
  *
  * Like the reference mux handlers, routes do not discriminate on HTTP
  * method. Each JSON body ends with a newline (Go's `json.Encoder.Encode`).
  *
  * This is a driver-side control plane (the engine itself is one); request
  * handling delegates straight to the synchronized engine, so the server
  * inherits its thread safety — unlike the reference, whose per-request
  * goroutines race on unsynchronized maps.
  */
final class KvHttpServer(engine: KvEngine, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))

  /** Actual bound port (useful with port = 0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = server.start()

  /** Stop serving; optionally flush all hot collections to cold storage —
    * the reference's shutdown path (`main.go:113-122`).
    */
  def stop(flush: Boolean = true): Seq[Throwable] = {
    server.stop(0)
    if (flush) engine.flushAllCollections() else Nil
  }

  // ---- dispatch --------------------------------------------------------

  private def handle(ex: HttpExchange): Unit =
    try {
      // Path segments use percent-escapes only: URLDecoder applies
      // query-string semantics ('+' → space), so pre-escape '+' to keep a
      // literal '+' in keys/values literal, matching mux path handling.
      val segments = ex.getRequestURI.getRawPath
        .split("/")
        .filter(_.nonEmpty)
        .map(s => URLDecoder.decode(s.replace("+", "%2B"), UTF_8))
        .toList
      segments match {
        case List("ready") => respond(ex, 200, "")
        case List("collections") =>
          engineCall(ex) {
            val ids = engine.listCollections()
            // Go encodes a nil slice as null; the engine's empty listing is
            // indistinguishable from nil on the wire
            if (ids.isEmpty) "null\n"
            else ids.map(jsonString).mkString("[", ",", "]") + "\n"
          }
        case List("collections", id, key) =>
          engineCall(ex)(s"""{"data":${jsonString(engine.readKey(id, key))}}""" + "\n")
        case List("collections", id, key, value) =>
          engineCall(ex) { engine.writeKey(id, key, value); "" }
        case _ => respond(ex, 404, "")
      }
    } finally ex.close()

  /** Run an engine call; any failure becomes the reference's 500 envelope. */
  private def engineCall(ex: HttpExchange)(body: => String): Unit =
    try respond(ex, 200, body)
    catch {
      case e: Throwable =>
        respond(
          ex,
          500,
          s"""{"code":500,"message":${jsonString(Option(e.getMessage).getOrElse(e.toString))}}""" + "\n")
    }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    // -1 = no response body (Go writes the header and nothing else)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1L else bytes.length.toLong)
    if (bytes.nonEmpty) {
      val os = ex.getResponseBody
      try os.write(bytes)
      finally os.close()
    }
  }

  private def jsonString(s: String): String =
    if (s == null) "null"
    else
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
}
