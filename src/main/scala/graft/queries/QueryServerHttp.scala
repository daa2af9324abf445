package graft.queries

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Thin HTTP front end over [[QueryServer]] — the serving shape of the
  * reference's QueryServerFE, which registers one servlet per named
  * query over the master's query engine (QueryServerFE.java:111-118,
  * CrawlListServlet paging). Spark-side everything stays [[QueryServer]]:
  * this layer only parses the request, asks for one page, and streams it
  * out as JSON.
  *
  *   GET /query/<name>?sortBy=<col>[&dir=asc|desc][&offset=N][&pageSize=N]
  *       → JSON array of row objects (one page of the positional index)
  *   GET /count/<name>?sortBy=<col>[&dir=asc|desc]
  *       → {"count": N} (row-group metadata read, no data scan)
  *
  * JSON rendering rides DataFrame.toJSON (schema-aware, correct escaping)
  * rather than hand-rolled string building. Built on the JDK's HttpServer
  * so the library adds no dependency; production fronting (TLS, auth)
  * belongs on a reverse proxy, exactly like the reference's Jetty FE sat
  * behind the ops stack. */
final class QueryServerHttp(server: QueryServer, port: Int = 0) {

  private val http =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  http.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, UTF_8) ->
          java.net.URLDecoder.decode(v, UTF_8)
      }.toMap

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def handle(ex: HttpExchange)(f: => String): Unit =
    try respond(ex, 200, f)
    catch {
      // bad request names / sort columns surface as require() or map
      // lookups — client errors, not server faults
      case e @ (_: IllegalArgumentException | _: NoSuchElementException) =>
        respond(ex, 400, s"""{"error":${jsonStr(e.getMessage)}}""")
      case e: Exception =>
        respond(ex, 500, s"""{"error":${jsonStr(e.toString)}}""")
    }
    finally ex.close()

  private def jsonStr(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def reqOf(p: Map[String, String]) = {
    // the page is collected on the driver (one page = one response body),
    // so client-supplied sizes must be bounded — the reference's servlet
    // layer bounds paging the same way (ClientQueryInfo's bounded window,
    // queryserver.jr:50-62). Violations → 400 via the handle() path.
    val pageSize = p.getOrElse("pageSize", "25").toInt
    require(pageSize >= 1 && pageSize <= QueryServerHttp.MaxPageSize,
      s"pageSize must be in [1, ${QueryServerHttp.MaxPageSize}], got $pageSize")
    val offset = p.getOrElse("offset", "0").toLong
    require(offset >= 0, s"offset must be >= 0, got $offset")
    server.PageRequest(
      sortBy = p.getOrElse("sortBy",
        throw new IllegalArgumentException("missing sortBy parameter")),
      ascending = p.getOrElse("dir", "asc") != "desc",
      offset = offset,
      pageSize = pageSize)
  }

  http.createContext("/query/", (ex: HttpExchange) => handle(ex) {
    val name = ex.getRequestURI.getPath.stripPrefix("/query/")
    val p = params(ex)
    server.page(name, reqOf(p)).toJSON.collect().mkString("[", ",", "]")
  })

  http.createContext("/count/", (ex: HttpExchange) => handle(ex) {
    val name = ex.getRequestURI.getPath.stripPrefix("/count/")
    s"""{"count":${server.resultCount(name, reqOf(params(ex)))}}"""
  })

  /** Start listening; returns the bound port (ephemeral when port=0). */
  def start(): Int = {
    http.start()
    http.getAddress.getPort
  }

  def stop(): Unit = http.stop(0)
}

object QueryServerHttp {
  /** Upper bound on one page: keeps a single response's driver-side
    * collect O(MaxPageSize) no matter what the client asks for. */
  val MaxPageSize: Int = 10000
}
