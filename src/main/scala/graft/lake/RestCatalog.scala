package graft.lake

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** REST catalog client — table names resolve through an HTTP catalog
  * service, the reference's headline deployment shape
  * (`catalog_type = 'rest', uri = 'http://catalog:8181'`,
  * pg_lakehouse_iceberg/README.md:33-35; catalog_bridge.cpp). The service
  * owns only the name→location registry; every byte of table data and
  * metadata still moves directly between this engine and the storage
  * location, so the catalog is never on the data path (same posture as an
  * Iceberg REST catalog serving metadata pointers).
  *
  * Protocol (JSON over HTTP; [[InMemoryCatalogServer]] is the bundled
  * reference implementation used for local dev and the specs):
  * {{{
  *   GET    {uri}/tables          → 200 {"tables":["a","b"]}
  *   GET    {uri}/tables/{name}   → 200 {"name":"a","location":"..."} | 404
  *   POST   {uri}/tables          ← {"name":"a"}
  *                                → 201 {"name":"a","location":"..."} | 409 exists
  *   DELETE {uri}/tables/{name}   → 204 | 404
  * }}}
  */
class RestCatalog(val spark: SparkSession, uri: String) extends Catalog {
  private val base = uri.stripSuffix("/")
  private val http = HttpClient.newHttpClient()
  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  /** percent-encodes a table name as one URI path segment (URLEncoder is
    * form-encoding: '+' for space would corrupt the path; and a raw '?'
    * or '#' in a name would truncate it into query/fragment — resolving
    * a DIFFERENT table). */
  private def seg(name: String): String =
    java.net.URLEncoder.encode(name, "UTF-8").replace("+", "%20")

  private def request(method: String, path: String, body: Option[String] = None)
      : HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/json")
    val req = (method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body.getOrElse("{}")))
    }).build()
    http.send(req, HttpResponse.BodyHandlers.ofString())
  }

  private def field(json: String, name: String): String =
    mapper.readTree(json).get(name).asText()

  private def lookup(name: String): Option[String] = {
    val r = request("GET", s"/tables/${seg(name)}")
    r.statusCode() match {
      case 200 => Some(field(r.body(), "location"))
      case 404 => None
      case c => sys.error(s"catalog GET /tables/$name failed: HTTP $c ${r.body()}")
    }
  }

  override def tableLocation(name: String): String =
    lookup(name).getOrElse(
      throw new NoSuchElementException(s"no table '$name' in catalog $base"))

  override def exists(name: String): Boolean = lookup(name).isDefined

  override def list(): Seq[String] = {
    val r = request("GET", "/tables")
    require(r.statusCode() == 200, s"catalog GET /tables failed: HTTP ${r.statusCode()}")
    import scala.jdk.CollectionConverters._
    mapper.readTree(r.body()).get("tables").elements().asScala.map(_.asText()).toSeq.sorted
  }

  override protected def register(name: String): String = {
    val r = request("POST", "/tables",
      Some(mapper.writeValueAsString(java.util.Map.of("name", name))))
    r.statusCode() match {
      case 201 | 200 => field(r.body(), "location")
      case 409 => sys.error(s"table '$name' already exists in catalog $base")
      case c => sys.error(s"catalog POST /tables failed: HTTP $c ${r.body()}")
    }
  }

  override def drop(name: String): Boolean = lookup(name) match {
    case None => false
    case Some(loc) =>
      // files first, then the entry — a crash in between leaves a
      // harmless dangling entry (re-droppable), never orphaned data
      val p = new Path(loc)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      request("DELETE", s"/tables/${seg(name)}").statusCode() == 204
  }
}

/** Minimal in-process catalog service implementing the [[RestCatalog]]
  * protocol over `com.sun.net.httpserver` (JDK-only): an in-memory
  * name→location registry that assigns locations under `warehouse`.
  * Reference implementation for local dev and the lifecycle specs — a
  * production deployment would back the same protocol with a durable
  * store. */
class InMemoryCatalogServer(warehouse: String) {
  import com.sun.net.httpserver.{HttpExchange, HttpServer}

  private val tables = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  private def send(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    x.getResponseHeaders.set("Content-Type", "application/json")
    // 204 must not carry a body; -1 signals no content
    if (code == 204) x.sendResponseHeaders(code, -1)
    else { x.sendResponseHeaders(code, bytes.length); x.getResponseBody.write(bytes) }
    x.close()
  }

  private def entryJson(name: String): String =
    mapper.writeValueAsString(java.util.Map.of(
      "name", name, "location", tables.get(name)))

  server.createContext("/tables", (x: HttpExchange) => {
    try {
      val path = x.getRequestURI.getPath.stripSuffix("/")
      val name = if (path == "/tables") None else Some(path.stripPrefix("/tables/"))
      (x.getRequestMethod, name) match {
        case ("GET", None) =>
          val names = new java.util.ArrayList[String](tables.keySet())
          java.util.Collections.sort(names)
          send(x, 200, mapper.writeValueAsString(java.util.Map.of("tables", names)))
        case ("GET", Some(n)) =>
          if (tables.containsKey(n)) send(x, 200, entryJson(n))
          else send(x, 404, s"""{"error":"no table $n"}""")
        case ("POST", None) =>
          val n = mapper.readTree(x.getRequestBody).get("name").asText()
          if (tables.putIfAbsent(n, s"$warehouse/$n") == null) send(x, 201, entryJson(n))
          else send(x, 409, s"""{"error":"table $n exists"}""")
        case ("DELETE", Some(n)) =>
          if (tables.remove(n) != null) send(x, 204, "")
          else send(x, 404, s"""{"error":"no table $n"}""")
        case _ => send(x, 405, """{"error":"unsupported"}""")
      }
    } catch {
      case e: Exception => send(x, 500, s"""{"error":"${e.getMessage}"}""")
    }
  })
  server.setExecutor(null) // current thread of the server's dispatcher
  server.start()

  def port: Int = server.getAddress.getPort
  def uri: String = s"http://localhost:$port"
  def stop(): Unit = server.stop(0)
}
