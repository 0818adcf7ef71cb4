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
  * The catalog ALSO arbitrates commits: it holds each table's committed
  * version pointer, and [[GraftTable]] commits by compare-and-swapping it
  * ([[Catalog.arbiter]]) — the object-store-safe commit point (S3-class
  * rename cannot arbitrate; the reference's PG incarnation uses PG
  * transactions for exactly this, commit_ops.c:41-86).
  *
  * Protocol (JSON over HTTP; [[InMemoryCatalogServer]] is the bundled
  * reference implementation used for local dev and the specs):
  * {{{
  *   GET    {uri}/tables                → 200 {"tables":["a","b"]}
  *   GET    {uri}/tables/{name}         → 200 {"name":"a","location":"..."} | 404
  *   POST   {uri}/tables                ← {"name":"a"}
  *                                      → 201 {"name":"a","location":"..."} | 409 exists
  *   DELETE {uri}/tables/{name}         → 204 | 404
  *   GET    {uri}/tables/{name}/version → 200 {"version":N,"metadataFile":"…"} | 404
  *   POST   {uri}/tables/{name}/version ← {"expectedVersion":N,"newVersion":M,"metadataFile":"…"}
  *                                      → 200 committed | 409 CAS conflict | 404 no table
  *   POST   {uri}/tables/{name}/rename  ← {"to":"b"}
  *                                      → 200 {"name":"b","location":"…"} | 404 no table | 409 dest exists
  * }}}
  */
class RestCatalog(val spark: SparkSession, uri: String) extends Catalog {
  private val base = uri.stripSuffix("/")
  // bounded timeouts: a wedged catalog (half-open connection, GC'd
  // service) must fail fast so the commit retry loop can act — an
  // untimed send() blocks table resolution and commits forever
  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()
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
      .timeout(java.time.Duration.ofSeconds(30))
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

  /** Registry-only rename: the location (and its committed version
    * pointer) carries over to the new name server-side, atomically
    * against racing renames/creates — data and metadata never move. */
  override def rename(from: String, to: String): Unit = {
    val r = request("POST", s"/tables/${seg(from)}/rename",
      Some(mapper.writeValueAsString(java.util.Map.of("to", to))))
    r.statusCode() match {
      case 200 => ()
      case 404 => throw new NoSuchElementException(
        s"no table '$from' in catalog $base")
      case 409 => sys.error(s"table '$to' already exists in catalog $base")
      case c => sys.error(s"catalog POST /tables/$from/rename failed: HTTP $c ${r.body()}")
    }
  }

  override def drop(name: String): Boolean = lookup(name) match {
    case None => false
    case Some(loc) =>
      // entry first, then files: once the DELETE succeeds no resolver can
      // obtain the location again, so nobody reads data mid-destruction;
      // a crash after the DELETE leaves orphaned files for storage-level
      // GC — strictly better than a live catalog entry pointing at
      // destroyed data (ADVICE r04)
      val removed = request("DELETE", s"/tables/${seg(name)}").statusCode() == 204
      if (removed) {
        val p = new Path(loc)
        p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      }
      removed
  }

  /** Multi-table transaction: one POST carries every table's CAS; the
    * server applies all of them under one lock or none at all. */
  override def commitAll(commits: Seq[TableCommit]): Boolean = {
    val arr = commits.map(c => java.util.Map.of(
      "name", c.name.asInstanceOf[AnyRef],
      "expectedVersion", java.lang.Long.valueOf(c.expectedVersion),
      "newVersion", java.lang.Long.valueOf(c.newVersion),
      "metadataFile", c.metadataFile))
    val body = mapper.writeValueAsString(java.util.Map.of(
      "commits", java.util.List.of(arr: _*)))
    val r = request("POST", "/transactions", Some(body))
    r.statusCode() match {
      case 200 => true
      case 409 => false // some pointer moved — the transaction retries whole
      case c => sys.error(s"catalog POST /transactions failed: HTTP $c ${r.body()}")
    }
  }

  /** Catalog-side commit arbitration for `name` — see [[CommitArbiter]]. */
  override def arbiter(name: String): Option[CommitArbiter] = Some(new CommitArbiter {
    override def currentVersion(): Option[(Long, String)] = {
      val r = request("GET", s"/tables/${seg(name)}/version")
      r.statusCode() match {
        case 200 =>
          val n = mapper.readTree(r.body())
          Some((n.get("version").asLong(), n.get("metadataFile").asText()))
        case 404 => None
        case c => sys.error(s"catalog GET /tables/$name/version failed: HTTP $c ${r.body()}")
      }
    }
    override def commitVersion(expectedVersion: Long, newVersion: Long,
        metadataFile: String): Boolean = {
      val body = mapper.writeValueAsString(java.util.Map.of(
        "expectedVersion", java.lang.Long.valueOf(expectedVersion),
        "newVersion", java.lang.Long.valueOf(newVersion),
        "metadataFile", metadataFile))
      val r = request("POST", s"/tables/${seg(name)}/version", Some(body))
      r.statusCode() match {
        case 200 => true
        case 409 => false // CAS lost — the committer retries from fresh metadata
        case c => sys.error(s"catalog POST /tables/$name/version failed: HTTP $c ${r.body()}")
      }
    }
  })
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
  /** committed (version, metadataFile) pointer per table — the CAS target */
  private val versions =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, String)]()
  /** One lock arbitrates BOTH single-table CAS and multi-table
    * transactions — a per-key compute() would let a single-table commit
    * slip between a transaction's check and its writes. */
  private val casLock = new Object
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

  /** JSON-escaped error body (raw interpolation let exception text break
    * the JSON framing — ADVICE r04). */
  private def errJson(msg: String): String =
    mapper.writeValueAsString(java.util.Map.of("error", String.valueOf(msg)))

  server.createContext("/tables", (x: HttpExchange) => {
    try {
      val path = x.getRequestURI.getPath.stripSuffix("/")
      // /tables | /tables/{name} | /tables/{name}/version|rename — a
      // trailing op segment addresses the commit pointer / registry
      // entry of {name}
      val rest = if (path == "/tables") "" else path.stripPrefix("/tables/")
      val (name, op) =
        if (rest.endsWith("/version") && rest.length > "/version".length)
          (Some(rest.stripSuffix("/version")), "version")
        else if (rest.endsWith("/rename") && rest.length > "/rename".length)
          (Some(rest.stripSuffix("/rename")), "rename")
        else (if (rest.isEmpty) None else Some(rest), "")
      (x.getRequestMethod, name, op) match {
        case ("GET", None, _) =>
          val names = new java.util.ArrayList[String](tables.keySet())
          java.util.Collections.sort(names)
          send(x, 200, mapper.writeValueAsString(java.util.Map.of("tables", names)))
        case ("GET", Some(n), "") =>
          if (tables.containsKey(n)) send(x, 200, entryJson(n))
          else send(x, 404, errJson(s"no table $n"))
        case ("GET", Some(n), "version") =>
          val v = versions.get(n)
          if (v == null) send(x, 404, errJson(s"no committed version for $n"))
          else send(x, 200, mapper.writeValueAsString(java.util.Map.of(
            "version", java.lang.Long.valueOf(v._1), "metadataFile", v._2)))
        case ("POST", Some(n), "rename") =>
          val to = mapper.readTree(x.getRequestBody).get("to").asText()
          // under casLock: the rename serializes against commit CAS and
          // transactions, and the entry + version pointer move together —
          // a racing committer on the old name gets a clean 404, never a
          // split registry
          val outcome = casLock.synchronized {
            if (!tables.containsKey(n)) 404
            else if (tables.containsKey(to)) 409
            else {
              val loc = tables.remove(n)
              tables.put(to, loc) // location unchanged: data does not move
              val v = versions.remove(n)
              if (v != null) versions.put(to, v)
              200
            }
          }
          outcome match {
            case 200 => send(x, 200, entryJson(to))
            case 404 => send(x, 404, errJson(s"no table $n"))
            case _ => send(x, 409, errJson(s"table $to exists"))
          }
        case ("POST", Some(n), "version") =>
          val node = mapper.readTree(x.getRequestBody)
          val exp = node.get("expectedVersion").asLong()
          val nv = node.get("newVersion").asLong()
          val file = node.get("metadataFile").asText()
          // the CAS: existence check AND pointer decision under ONE
          // casLock hold — checking outside would let a racing DROP or
          // RENAME empty the pointer between check and swap, and the
          // `cur == null` first-commit branch would then acknowledge a
          // commit onto a dropped/renamed table (resurrecting a stale
          // pointer for any later re-create)
          val outcome = casLock.synchronized {
            if (!tables.containsKey(n)) 404
            else {
              val cur = versions.get(n)
              if (cur == null || cur._1 == exp) { versions.put(n, (nv, file)); 200 }
              else 409
            }
          }
          outcome match {
            case 200 => send(x, 200, mapper.writeValueAsString(java.util.Map.of(
              "version", java.lang.Long.valueOf(nv))))
            case 404 => send(x, 404, errJson(s"no table $n"))
            case _ => send(x, 409, errJson(s"version conflict: expected $exp is stale"))
          }
        case ("POST", None, _) =>
          val n = mapper.readTree(x.getRequestBody).get("name").asText()
          // unique nonce'd location: a re-created table must NEVER reuse
          // a dropped table's directory (a slow client-side drop could
          // otherwise destroy the re-created table's live data — real
          // catalogs suffix locations for the same reason). Under
          // casLock so a create cannot slip between a rename's
          // destination check and its put.
          val created = casLock.synchronized {
            if (tables.containsKey(n)) false
            else {
              tables.put(n,
                s"$warehouse/$n-${java.util.UUID.randomUUID().toString.take(8)}")
              true
            }
          }
          if (created) send(x, 201, entryJson(n))
          else send(x, 409, errJson(s"table $n exists"))
        case ("DELETE", Some(n), "") =>
          val removed = casLock.synchronized {
            if (tables.remove(n) != null) { versions.remove(n); true } else false
          }
          if (removed) send(x, 204, "")
          else send(x, 404, errJson(s"no table $n"))
        case _ => send(x, 405, errJson("unsupported"))
      }
    } catch {
      case e: Exception => send(x, 500, errJson(String.valueOf(e.getMessage)))
    }
  })
  /** Multi-table atomic commit: every (expected → new) pointer CAS in the
    * body applies, or none does. One synchronized check-then-write-all
    * block IS the transaction — the in-memory analog of a transactional
    * catalog database; the reference gets the equivalent from PG's
    * transaction manager wrapping commit_ops.c. */
  server.createContext("/transactions", (x: HttpExchange) => {
    try {
      if (x.getRequestMethod != "POST") send(x, 405, errJson("unsupported"))
      else {
        val node = mapper.readTree(x.getRequestBody)
        val commits = {
          import scala.jdk.CollectionConverters._
          node.get("commits").elements().asScala.map(c => (
            c.get("name").asText(),
            c.get("expectedVersion").asLong(),
            c.get("newVersion").asLong(),
            c.get("metadataFile").asText())).toSeq
        }
        if (commits.map(_._1).distinct.length != commits.length)
          send(x, 400, errJson("duplicate table in transaction"))
        else {
          // existence + CAS checks + writes all under ONE lock hold —
          // the transaction boundary (a drop racing the pre-check would
          // otherwise let the write-all land on a vanished table)
          val outcome = casLock.synchronized {
            if (commits.exists(c => !tables.containsKey(c._1))) 404
            else {
              val ok = commits.forall { case (n, exp, _, _) =>
                val cur = versions.get(n)
                cur == null || cur._1 == exp
              }
              if (ok) {
                commits.foreach { case (n, _, nv, file) =>
                  versions.put(n, (nv, file))
                }
                200
              } else 409
            }
          }
          outcome match {
            case 200 => send(x, 200, mapper.writeValueAsString(java.util.Map.of(
              "committed", java.lang.Integer.valueOf(commits.length))))
            case 404 => send(x, 404, errJson("unknown table in transaction"))
            case _ => send(x, 409, errJson("version conflict in transaction"))
          }
        }
      }
    } catch {
      case e: Exception => send(x, 500, errJson(String.valueOf(e.getMessage)))
    }
  })
  server.setExecutor(null) // current thread of the server's dispatcher
  server.start()

  def port: Int = server.getAddress.getPort
  def uri: String = s"http://localhost:$port"
  def stop(): Unit = server.stop(0)
}
