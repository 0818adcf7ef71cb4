package graft.lake.iceberg.rest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.lake.iceberg.{IceMeta, IcebergMeta}

/** Client for the PUBLISHED Apache Iceberg REST catalog protocol — the
  * reference's headline deployment shape (`catalog_type = 'rest',
  * uri = 'http://catalog:8181'`, pg_lakehouse_iceberg/README.md:29-32;
  * `iceberg_bridge_table_open(location, catalog_type, catalog_uri)`,
  * src/bridge/iceberg_bridge.h:117-133). Unlike [[graft.lake.RestCatalog]]
  * (graft's own name→location protocol for graft-native tables), this
  * speaks the open-spec API every standard catalog service implements
  * (Polaris / Gravitino / Tabular / Glue-REST / Lakekeeper), so real
  * Apache Iceberg tables REGISTERED IN SUCH A CATALOG resolve by name and
  * commit through the catalog's optimistic-concurrency arbitration:
  *
  * {{{
  *   GET    /v1/config                                → {defaults, overrides[, prefix]}
  *   GET    /v1/{p}/namespaces                        → {namespaces: [[..]]}
  *   POST   /v1/{p}/namespaces                        ← {namespace: [..]}
  *   GET    /v1/{p}/namespaces/{ns}/tables            → {identifiers: [..]}
  *   POST   /v1/{p}/namespaces/{ns}/tables            ← CreateTableRequest
  *   POST   /v1/{p}/namespaces/{ns}/register          ← {name, metadata-location}
  *   GET    /v1/{p}/namespaces/{ns}/tables/{t}        → LoadTableResult
  *   POST   /v1/{p}/namespaces/{ns}/tables/{t}        ← CommitTableRequest
  *                                                      {requirements, updates}
  *   DELETE /v1/{p}/namespaces/{ns}/tables/{t}        → 204
  * }}}
  *
  * The catalog owns ONLY `metadata.json` arbitration: data files,
  * manifests and manifest lists are written straight to storage by the
  * engine (this client never moves a data byte), and a commit is the
  * catalog validating `requirements` against the CURRENT table state and
  * applying `updates` — the CAS. Two racing committers POST from the same
  * base; exactly one's `assert-ref-snapshot-id` still holds.
  *
  * Multi-level namespaces join with the spec's `%1F` unit separator in
  * URL paths.
  *
  * AUTH (r13): managed deployments of this protocol (Polaris, Tabular,
  * Glue, Lakekeeper) sit behind the spec's OAuth2 client-credentials
  * flow — pass `credential = Some("client_id:client_secret")` and the
  * client obtains a bearer token from `POST /v1/oauth/tokens`
  * (form-encoded grant, per the spec's token endpoint), attaches
  * `Authorization: Bearer …` to every call, refreshes proactively
  * before the advertised `expires_in`, and on a 401 (token revoked /
  * expired server-side early) force-refreshes and retries ONCE — a
  * second 401 is a real credential problem and fails loudly. Bad
  * credentials reject at the token endpoint, never silently downgrade
  * to anonymous.
  *
  * PAGINATION (r13): the spec's list endpoints are paginated
  * (`pageSize`/`pageToken`, `next-page-token` in responses); both list
  * calls here request `listPageSize` per page and loop the opaque
  * token until the service stops returning one, so a 10⁵-table
  * namespace never demands a single giant response.
  */
final class IcebergRestCatalog(uri: String,
    credential: Option[String] = None,
    listPageSize: Int = 100) {
  private val mapper = new ObjectMapper()
  // bounded timeouts — a wedged service must fail fast, not hang every
  // resolution and the whole optimistic-commit retry loop
  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()
  private val base = uri.stripSuffix("/")

  /** Catalog identity for vend-ownership checks (applyVendedStorage). */
  def baseUri: String = base

  // ---- oauth ----------------------------------------------------------------

  /** (access_token, refresh-after-millis). */
  @volatile private var bearer: Option[(String, Long)] = None

  private def invalidateToken(): Unit = synchronized { bearer = None }

  /** Current valid token, fetching/refreshing under a lock (one token
    * request per expiry, not one per racing caller). */
  private def freshToken(): String = synchronized {
    bearer.filter(_._2 > System.currentTimeMillis()) match {
      case Some((t, _)) => t
      case None =>
        val cred = credential.get
        val i = cred.indexOf(':')
        require(i > 0, "iceberg-rest: credential must be client_id:client_secret")
        def form(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
        val body = "grant_type=client_credentials" +
          s"&client_id=${form(cred.substring(0, i))}" +
          s"&client_secret=${form(cred.substring(i + 1))}" +
          "&scope=catalog"
        val req = HttpRequest.newBuilder(URI.create(s"$base/v1/oauth/tokens"))
          .timeout(java.time.Duration.ofSeconds(30))
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build()
        val r = http.send(req, HttpResponse.BodyHandlers.ofString())
        require(r.statusCode() == 200,
          s"iceberg-rest: token request rejected: HTTP ${r.statusCode()} ${r.body()}")
        val n = mapper.readTree(r.body())
        val t = n.path("access_token").asText("")
        require(t.nonEmpty, s"iceberg-rest: token response without access_token")
        val ttlMs = math.max(n.path("expires_in").asLong(3600), 1L) * 1000L
        // refresh 30s early (or at half-life for very short tokens) so a
        // token never expires mid-request
        bearer = Some((t, System.currentTimeMillis() +
          math.max(ttlMs - 30000L, ttlMs / 2)))
        t
    }
  }

  /** `GET /v1/config` once per client: a service may route all further
    * calls under an account-specific `prefix` (overrides win over the
    * client's none). */
  private lazy val prefix: String = {
    val r = send("GET", s"$base/v1/config")
    require(r.statusCode() == 200,
      s"iceberg-rest: GET /v1/config failed: HTTP ${r.statusCode()} ${r.body()}")
    val n = mapper.readTree(r.body())
    val p = n.path("overrides").path("prefix").asText("")
    if (p.isEmpty) "" else s"/${p.stripPrefix("/").stripSuffix("/")}"
  }

  private def send(method: String, url: String, body: Option[String] = None)
      : HttpResponse[String] = {
    def once(): HttpResponse[String] = {
      val b = HttpRequest.newBuilder(URI.create(url))
        .timeout(java.time.Duration.ofSeconds(30))
        .header("Content-Type", "application/json")
      credential.foreach(_ => b.header("Authorization", s"Bearer ${freshToken()}"))
      val req = (method match {
        case "GET" => b.GET()
        case "DELETE" => b.DELETE()
        case "HEAD" => b.method("HEAD", HttpRequest.BodyPublishers.noBody())
        case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body.getOrElse("{}")))
      }).build()
      http.send(req, HttpResponse.BodyHandlers.ofString())
    }
    val r = once()
    if (r.statusCode() == 401 && credential.isDefined) {
      // token expired/revoked server-side before our proactive refresh:
      // force a new token and retry ONCE; a second 401 surfaces to the
      // caller as the real auth failure it is
      invalidateToken()
      once()
    } else r
  }

  /** GET a paginated list endpoint, looping `pageToken` until the
    * service stops returning `next-page-token`; yields every element of
    * `field` across pages. */
  private def pagedList(url: String, field: String): Seq[com.fasterxml.jackson.databind.JsonNode] = {
    import scala.jdk.CollectionConverters._
    val out = Seq.newBuilder[com.fasterxml.jackson.databind.JsonNode]
    var next: Option[String] = None
    var done = false
    while (!done) {
      val qs = s"pageSize=$listPageSize" +
        next.map(t => s"&pageToken=${seg(t)}").getOrElse("")
      val r = send("GET", s"$url?$qs")
      require(r.statusCode() == 200,
        s"iceberg-rest: GET $url failed: HTTP ${r.statusCode()} ${errorOf(r)}")
      val n = mapper.readTree(r.body())
      n.path(field).elements().asScala.foreach(out += _)
      next = Option(n.get("next-page-token"))
        .filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
      done = next.isEmpty
    }
    out.result()
  }

  /** one URI path segment, percent-encoded (form-encoding's '+' would
    * corrupt a space; a raw '#'/'?' would truncate the path). */
  private def seg(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** spec rule: namespace levels join with the 0x1F unit separator. */
  private def nsSeg(ns: Seq[String]): String = seg(ns.mkString("\u001F"))

  private def v1(path: String): String = s"$base/v1$prefix$path"

  private def errorOf(r: HttpResponse[String]): String = {
    val m = try mapper.readTree(r.body()).path("error").path("message").asText("")
    catch { case _: Exception => "" }
    if (m.nonEmpty) m else r.body()
  }

  // ---- namespaces -----------------------------------------------------------

  def createNamespace(ns: Seq[String]): Unit = {
    val body = mapper.createObjectNode()
    val arr = body.putArray("namespace"); ns.foreach(arr.add)
    val r = send("POST", v1("/namespaces"), Some(mapper.writeValueAsString(body)))
    require(r.statusCode() == 200 || r.statusCode() == 409, // 409 = exists, idempotent-ok
      s"iceberg-rest: create namespace $ns failed: HTTP ${r.statusCode()} ${errorOf(r)}")
  }

  /** DROP a namespace (spec: must be empty — a 409 surfaces loudly). */
  def dropNamespace(ns: Seq[String]): Boolean = {
    val r = send("DELETE", v1(s"/namespaces/${nsSeg(ns)}"))
    r.statusCode() match {
      case 204 => true
      case 404 => false
      case c => sys.error(
        s"iceberg-rest: drop namespace $ns failed: HTTP $c ${errorOf(r)}")
    }
  }

  /** Namespace properties (GetNamespaceResponse.properties). */
  def namespaceProperties(ns: Seq[String]): Map[String, String] = {
    val r = send("GET", v1(s"/namespaces/${nsSeg(ns)}"))
    require(r.statusCode() == 200,
      s"iceberg-rest: get namespace $ns failed: HTTP ${r.statusCode()} ${errorOf(r)}")
    import scala.jdk.CollectionConverters._
    mapper.readTree(r.body()).path("properties").properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap
  }

  /** UpdateNamespacePropertiesRequest — returns (updated, removed,
    * missing) per the spec's response shape. */
  def updateNamespaceProperties(ns: Seq[String],
      updates: Map[String, String] = Map.empty,
      removals: Seq[String] = Nil): (Seq[String], Seq[String], Seq[String]) = {
    val body = mapper.createObjectNode()
    val rm = body.putArray("removals"); removals.foreach(rm.add)
    val up = body.putObject("updates")
    updates.foreach { case (k, v) => up.put(k, v) }
    val r = send("POST", v1(s"/namespaces/${nsSeg(ns)}/properties"),
      Some(mapper.writeValueAsString(body)))
    require(r.statusCode() == 200,
      s"iceberg-rest: update namespace $ns properties failed: " +
        s"HTTP ${r.statusCode()} ${errorOf(r)}")
    import scala.jdk.CollectionConverters._
    val n = mapper.readTree(r.body())
    def arr(f: String) = n.path(f).elements().asScala.map(_.asText()).toSeq
    (arr("updated"), arr("removed"), arr("missing"))
  }

  def listNamespaces(): Seq[Seq[String]] = {
    import scala.jdk.CollectionConverters._
    pagedList(v1("/namespaces"), "namespaces")
      .map(_.elements().asScala.map(_.asText()).toSeq)
  }

  // ---- tables ---------------------------------------------------------------

  def listTables(ns: Seq[String]): Seq[String] =
    pagedList(v1(s"/namespaces/${nsSeg(ns)}/tables"), "identifiers")
      .map(_.path("name").asText()).sorted

  def tableExists(ns: Seq[String], name: String): Boolean =
    send("HEAD", v1(s"/namespaces/${nsSeg(ns)}/tables/${seg(name)}"))
      .statusCode() == 204

  import IcebergRestCatalog.LoadResult

  def loadTable(ns: Seq[String], name: String): LoadResult = {
    val r = send("GET", v1(s"/namespaces/${nsSeg(ns)}/tables/${seg(name)}"))
    r.statusCode() match {
      case 200 => parseLoadResult(r.body())
      case 404 => throw new NoSuchElementException(
        s"iceberg-rest: no table ${ns.mkString(".")}.$name in catalog $base: ${errorOf(r)}")
      case c => sys.error(s"iceberg-rest: load table $name failed: HTTP $c ${errorOf(r)}")
    }
  }

  /** CREATE through the catalog: the service builds + stores metadata v0
    * and assigns the location (under its warehouse) unless one is given. */
  def createTable(ns: Seq[String], name: String, schemaJson: String,
      specFieldsJson: Option[String] = None,
      location: Option[String] = None,
      properties: Map[String, String] = Map.empty): LoadResult = {
    val body = mapper.createObjectNode()
    body.put("name", name)
    location.foreach(body.put("location", _))
    body.set[ObjectNode]("schema", mapper.readTree(schemaJson))
    specFieldsJson.foreach { sj =>
      val spec = body.putObject("partition-spec")
      spec.put("spec-id", 0)
      spec.set[ObjectNode]("fields", mapper.readTree(sj))
    }
    if (properties.nonEmpty) {
      val p = body.putObject("properties")
      properties.foreach { case (k, v) => p.put(k, v) }
    }
    val r = send("POST", v1(s"/namespaces/${nsSeg(ns)}/tables"),
      Some(mapper.writeValueAsString(body)))
    r.statusCode() match {
      case 200 => parseLoadResult(r.body())
      case 409 => sys.error(
        s"iceberg-rest: table ${ns.mkString(".")}.$name already exists: ${errorOf(r)}")
      case c => sys.error(s"iceberg-rest: create table $name failed: HTTP $c ${errorOf(r)}")
    }
  }

  /** STAGED CREATE (r15; CreateTableRequest.stage-create): the service
    * returns the would-be table metadata WITHOUT registering anything —
    * the table materializes only when a transaction carrying
    * `assert-create` commits it ([[IcebergRestTransaction.createAndCommit]]:
    * transactional CTAS through the catalog). The returned LoadResult
    * carries metadata only (no metadata-location — nothing committed). */
  def stageCreateTable(ns: Seq[String], name: String, schemaJson: String,
      specFieldsJson: Option[String] = None,
      properties: Map[String, String] = Map.empty): LoadResult = {
    val body = mapper.createObjectNode()
    body.put("name", name)
    body.put("stage-create", true)
    body.set[ObjectNode]("schema", mapper.readTree(schemaJson))
    specFieldsJson.foreach { sj =>
      val spec = body.putObject("partition-spec")
      spec.put("spec-id", 0)
      spec.set[ObjectNode]("fields", mapper.readTree(sj))
    }
    if (properties.nonEmpty) {
      val p = body.putObject("properties")
      properties.foreach { case (k, v) => p.put(k, v) }
    }
    val r = send("POST", v1(s"/namespaces/${nsSeg(ns)}/tables"),
      Some(mapper.writeValueAsString(body)))
    r.statusCode() match {
      case 200 =>
        val n = mapper.readTree(r.body())
        LoadResult("", IcebergMeta.parse(
          mapper.writeValueAsString(n.get("metadata"))))
      case 409 => sys.error(
        s"iceberg-rest: table ${ns.mkString(".")}.$name already exists: ${errorOf(r)}")
      case c => sys.error(
        s"iceberg-rest: stage-create $name failed: HTTP $c ${errorOf(r)}")
    }
  }

  /** REGISTER an existing table (its current metadata.json) under a name
    * — the spec's adoption endpoint; zero data or metadata movement. */
  def registerTable(ns: Seq[String], name: String,
      metadataLocation: String): LoadResult = {
    val body = mapper.createObjectNode()
    body.put("name", name)
    body.put("metadata-location", metadataLocation)
    val r = send("POST", v1(s"/namespaces/${nsSeg(ns)}/register"),
      Some(mapper.writeValueAsString(body)))
    require(r.statusCode() == 200,
      s"iceberg-rest: register $name failed: HTTP ${r.statusCode()} ${errorOf(r)}")
    parseLoadResult(r.body())
  }

  /** DROP through the catalog; `purge = true` asks the service to also
    * delete the table's storage (the spec's `purgeRequested` flag — the
    * reference's `pg_catalog_drop_table(purge)`,
    * catalog_bridge.h:96-100). */
  def dropTable(ns: Seq[String], name: String, purge: Boolean = false): Boolean =
    send("DELETE", v1(s"/namespaces/${nsSeg(ns)}/tables/${seg(name)}") +
      (if (purge) "?purgeRequested=true" else ""))
      .statusCode() == 204

  /** RENAME through the catalog (the spec's `POST /v1/{p}/tables/rename`;
    * the reference's `pg_catalog_rename_table`,
    * catalog_bridge.h:115-120) — a metadata pointer move, zero data or
    * metadata-file movement; the table keeps its uuid and history. */
  def renameTable(fromNs: Seq[String], fromName: String,
      toNs: Seq[String], toName: String): Unit = {
    val body = mapper.createObjectNode()
    val src = body.putObject("source")
    val sa = src.putArray("namespace"); fromNs.foreach(sa.add)
    src.put("name", fromName)
    val dst = body.putObject("destination")
    val da = dst.putArray("namespace"); toNs.foreach(da.add)
    dst.put("name", toName)
    val r = send("POST", v1("/tables/rename"), Some(mapper.writeValueAsString(body)))
    require(r.statusCode() == 200 || r.statusCode() == 204,
      s"iceberg-rest: rename ${fromNs.mkString(".")}.$fromName -> " +
        s"${toNs.mkString(".")}.$toName failed: HTTP ${r.statusCode()} ${errorOf(r)}")
  }

  /** THE COMMIT: POST requirements + updates; the service validates the
    * requirements against its current state under its commit lock and
    * applies the updates — 409 means another committer moved the table
    * first (reopen, rebase, retry: the standard optimistic loop). */
  def commitTable(ns: Seq[String], name: String,
      requirements: ArrayNode, updates: ArrayNode): LoadResult = {
    val body = mapper.createObjectNode()
    val ident = body.putObject("identifier")
    val nsArr = ident.putArray("namespace"); ns.foreach(nsArr.add)
    ident.put("name", name)
    body.set[ObjectNode]("requirements", requirements)
    body.set[ObjectNode]("updates", updates)
    val r = send("POST", v1(s"/namespaces/${nsSeg(ns)}/tables/${seg(name)}"),
      Some(mapper.writeValueAsString(body)))
    r.statusCode() match {
      case 200 => parseLoadResult(r.body())
      case 409 => throw new java.util.ConcurrentModificationException(
        s"iceberg-rest: commit of ${ns.mkString(".")}.$name lost the race: ${errorOf(r)}")
      case c => sys.error(s"iceberg-rest: commit $name failed: HTTP $c ${errorOf(r)}")
    }
  }

  /** MULTI-TABLE TRANSACTION (`POST /v1/{prefix}/transactions/commit`,
    * r15): every (ns, name, requirements, updates) validated and
    * applied by the service under ONE commit arbitration —
    * all-or-nothing. A 409 means some table's requirement no longer
    * held and NOTHING moved: reopen every table, rebase, retry — the
    * optimistic loop, transaction-wide. */
  def commitTransaction(
      changes: Seq[(Seq[String], String, ArrayNode, ArrayNode)]): Unit = {
    require(changes.nonEmpty, "iceberg-rest: empty transaction")
    val body = mapper.createObjectNode()
    val arr = body.putArray("table-changes")
    changes.foreach { case (ns, name, reqs, ups) =>
      val c = arr.addObject()
      val ident = c.putObject("identifier")
      val nsArr = ident.putArray("namespace"); ns.foreach(nsArr.add)
      ident.put("name", name)
      c.set[ObjectNode]("requirements", reqs)
      c.set[ObjectNode]("updates", ups)
    }
    val r = send("POST", v1("/transactions/commit"),
      Some(mapper.writeValueAsString(body)))
    r.statusCode() match {
      case 200 | 204 => ()
      case 409 => throw new java.util.ConcurrentModificationException(
        s"iceberg-rest: multi-table transaction lost the race " +
          s"(no table changed): ${errorOf(r)}")
      case c => sys.error(
        s"iceberg-rest: transaction commit failed: HTTP $c ${errorOf(r)}")
    }
  }

  // ---- views (r14; the spec's views API) ------------------------------------

  import IcebergRestCatalog.{LoadViewResult, ViewVersion, ViewRepresentation}

  def listViews(ns: Seq[String]): Seq[String] =
    pagedList(v1(s"/namespaces/${nsSeg(ns)}/views"), "identifiers")
      .map(_.path("name").asText()).sorted

  def viewExists(ns: Seq[String], name: String): Boolean =
    send("HEAD", v1(s"/namespaces/${nsSeg(ns)}/views/${seg(name)}"))
      .statusCode() == 204

  /** CREATE a view: the service materializes view metadata v1 (version 1
    * carrying the SQL representation) under its warehouse. `schemaJson`
    * is the spec's Iceberg schema JSON of the view's output. */
  def createView(ns: Seq[String], name: String, sql: String,
      schemaJson: String, dialect: String = "spark",
      properties: Map[String, String] = Map.empty): LoadViewResult = {
    val body = mapper.createObjectNode()
    body.put("name", name)
    body.set[ObjectNode]("schema", mapper.readTree(schemaJson))
    val vv = body.putObject("view-version")
    vv.put("version-id", 1)
    vv.put("schema-id", 0)
    vv.putObject("summary").put("engine-name", "graft")
    val reps = vv.putArray("representations")
    val rep = reps.addObject()
    rep.put("type", "sql"); rep.put("sql", sql); rep.put("dialect", dialect)
    val dn = vv.putArray("default-namespace"); ns.foreach(dn.add)
    if (properties.nonEmpty) {
      val p = body.putObject("properties")
      properties.foreach { case (k, v) => p.put(k, v) }
    }
    val r = send("POST", v1(s"/namespaces/${nsSeg(ns)}/views"),
      Some(mapper.writeValueAsString(body)))
    r.statusCode() match {
      case 200 => parseLoadViewResult(r.body())
      case 409 => sys.error(
        s"iceberg-rest: view ${ns.mkString(".")}.$name already exists: ${errorOf(r)}")
      case c => sys.error(s"iceberg-rest: create view $name failed: HTTP $c ${errorOf(r)}")
    }
  }

  def loadView(ns: Seq[String], name: String): LoadViewResult = {
    val r = send("GET", v1(s"/namespaces/${nsSeg(ns)}/views/${seg(name)}"))
    r.statusCode() match {
      case 200 => parseLoadViewResult(r.body())
      case 404 => throw new NoSuchElementException(
        s"iceberg-rest: no view ${ns.mkString(".")}.$name in catalog $base: ${errorOf(r)}")
      case c => sys.error(s"iceberg-rest: load view $name failed: HTTP $c ${errorOf(r)}")
    }
  }

  /** REPLACE the view's SQL: one commit appending a new view version and
    * making it current (the spec's add-view-version +
    * set-current-view-version(-1) pair under assert-view-uuid). Racing
    * replacers from one base compute the same next version-id; the
    * SERVER arbitrates by rejecting a duplicate version-id with 409
    * (assert-view-uuid alone cannot — the view uuid never changes), so
    * exactly one wins and the loser surfaces as
    * ConcurrentModificationException. */
  def replaceView(ns: Seq[String], name: String, sql: String,
      dialect: String = "spark"): LoadViewResult = {
    val cur = loadView(ns, name)
    val body = mapper.createObjectNode()
    val reqs = body.putArray("requirements")
    val rq = reqs.addObject()
    rq.put("type", "assert-view-uuid"); rq.put("uuid", cur.uuid)
    val ups = body.putArray("updates")
    val add = ups.addObject()
    add.put("action", "add-view-version")
    val vv = add.putObject("view-version")
    vv.put("version-id", cur.versions.map(_.versionId).max + 1)
    vv.put("schema-id", 0)
    vv.putObject("summary").put("engine-name", "graft")
    val reps = vv.putArray("representations")
    val rep = reps.addObject()
    rep.put("type", "sql"); rep.put("sql", sql); rep.put("dialect", dialect)
    val dn = vv.putArray("default-namespace"); ns.foreach(dn.add)
    val setCur = ups.addObject()
    setCur.put("action", "set-current-view-version")
    setCur.put("view-version-id", -1) // the version just added, per spec
    val r = send("POST", v1(s"/namespaces/${nsSeg(ns)}/views/${seg(name)}"),
      Some(mapper.writeValueAsString(body)))
    r.statusCode() match {
      case 200 => parseLoadViewResult(r.body())
      case 409 => throw new java.util.ConcurrentModificationException(
        s"iceberg-rest: replace of view ${ns.mkString(".")}.$name lost the race: ${errorOf(r)}")
      case c => sys.error(s"iceberg-rest: replace view $name failed: HTTP $c ${errorOf(r)}")
    }
  }

  def dropView(ns: Seq[String], name: String): Boolean =
    send("DELETE", v1(s"/namespaces/${nsSeg(ns)}/views/${seg(name)}"))
      .statusCode() == 204

  def renameView(fromNs: Seq[String], fromName: String,
      toNs: Seq[String], toName: String): Unit = {
    val body = mapper.createObjectNode()
    val src = body.putObject("source")
    val sa = src.putArray("namespace"); fromNs.foreach(sa.add)
    src.put("name", fromName)
    val dst = body.putObject("destination")
    val da = dst.putArray("namespace"); toNs.foreach(da.add)
    dst.put("name", toName)
    val r = send("POST", v1("/views/rename"), Some(mapper.writeValueAsString(body)))
    require(r.statusCode() == 200 || r.statusCode() == 204,
      s"iceberg-rest: rename view ${fromNs.mkString(".")}.$fromName -> " +
        s"${toNs.mkString(".")}.$toName failed: HTTP ${r.statusCode()} ${errorOf(r)}")
  }

  private def parseLoadViewResult(json: String): LoadViewResult = {
    import scala.jdk.CollectionConverters._
    val n = mapper.readTree(json)
    val loc = n.path("metadata-location").asText("")
    require(loc.nonEmpty, "iceberg-rest: LoadViewResult without metadata-location")
    val m = n.path("metadata")
    val versions = m.path("versions").elements().asScala.map { v =>
      ViewVersion(
        v.path("version-id").asInt(),
        v.path("timestamp-ms").asLong(),
        v.path("schema-id").asInt(0),
        v.path("representations").elements().asScala.map { r =>
          ViewRepresentation(r.path("type").asText(),
            r.path("sql").asText(), r.path("dialect").asText())
        }.toSeq,
        v.path("default-namespace").elements().asScala.map(_.asText()).toSeq)
    }.toSeq
    LoadViewResult(loc, m.path("view-uuid").asText(),
      m.path("current-version-id").asInt(), versions,
      m.path("properties").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
  }

  private def parseLoadResult(json: String): LoadResult = {
    import scala.jdk.CollectionConverters._
    val n = mapper.readTree(json)
    val loc = n.path("metadata-location").asText("")
    require(loc.nonEmpty, s"iceberg-rest: LoadTableResult without metadata-location")
    def strMap(node: com.fasterxml.jackson.databind.JsonNode): Map[String, String] =
      node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    // vended per-table storage access (r14): the spec's LoadTableResult
    // carries `config` (table-scoped config overrides) and
    // `storage-credentials` ([{prefix, config}]) — managed catalogs
    // (Polaris/Tabular/Glue) vend SCOPED, short-lived object-store
    // credentials here instead of requiring static engine-wide keys
    val cfg = strMap(n.path("config"))
    val creds = n.path("storage-credentials").elements().asScala.map { c =>
      c.path("prefix").asText("") -> strMap(c.path("config"))
    }.toSeq
    LoadResult(loc,
      IcebergMeta.parse(mapper.writeValueAsString(n.get("metadata"))),
      cfg, creds)
  }
}

object IcebergRestCatalog {
  /** One SQL representation of a view version. */
  final case class ViewRepresentation(tpe: String, sql: String, dialect: String)

  /** One immutable view version (the spec's view-version). */
  final case class ViewVersion(versionId: Int, timestampMs: Long,
      schemaId: Int, representations: Seq[ViewRepresentation],
      defaultNamespace: Seq[String])

  /** LoadViewResult: metadata pointer + the parsed view metadata. */
  final case class LoadViewResult(metadataLocation: String, uuid: String,
      currentVersionId: Int, versions: Seq[ViewVersion],
      properties: Map[String, String]) {
    def currentVersion: ViewVersion =
      versions.find(_.versionId == currentVersionId).getOrElse(
        throw new IllegalStateException(
          s"view metadata has no version $currentVersionId"))
    /** The current version's SQL for `dialect` — or, when the version
      * carries exactly one representation, that one (the spec allows
      * engines to accept a single foreign-dialect text). */
    def sql(dialect: String = "spark"): String = {
      val reps = currentVersion.representations.filter(_.tpe == "sql")
      reps.find(_.dialect.equalsIgnoreCase(dialect))
        .orElse(if (reps.length == 1) reps.headOption else None)
        .map(_.sql)
        .getOrElse(throw new NoSuchElementException(
          s"view has no SQL representation for dialect '$dialect' " +
            s"(have: ${reps.map(_.dialect).mkString(", ")})"))
    }
  }

  /** LoadTableResult: the authoritative metadata pointer + parsed body,
    * plus the vended table-scoped `config` overrides and
    * `storage-credentials` ([prefix → config]) when the service sends
    * them. */
  final case class LoadResult(metadataLocation: String, metadata: IceMeta,
      config: Map[String, String] = Map.empty,
      storageCredentials: Seq[(String, Map[String, String])] = Nil)

  /** Honor vended storage credentials for an s3a table location:
    * the longest-prefix-matching `storage-credentials` entry (falling
    * back to the `config` overrides' s3.* keys) maps onto Hadoop's
    * PER-BUCKET s3a configuration (`fs.s3a.bucket.<bucket>.*`) — scoped
    * exactly like the spec scopes the vend, so two catalogs vending
    * different credentials for different buckets coexist in one session.
    * Spark sessions snapshot `sc.hadoopConfiguration` per query
    * (`newHadoopConf`), so the settings take effect for every
    * subsequent read/write of the table. Non-object-store locations
    * (file:/, hdfs:/) ignore the vend — nothing to configure. */
  /** Which catalog (base URI) last vended per-bucket config — a
    * different catalog re-vending the SAME bucket would clobber the
    * first one's credentials last-writer-wins mid-session, so that case
    * refuses loudly; the same catalog refreshing (rotated session
    * tokens) stays quiet. */
  private val vendOwner =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Expiring vend LEASE (r16, verdict #2): when the vended config
    * carries the spec's `s3.session-token-expires-at-ms`, the bucket is
    * registered with a re-resolve closure so a LONG session outlives a
    * short-TTL STS vend — [[refreshExpiredVends]] re-loads the table
    * through the catalog (the credential source, per the reference's
    * catalog-owned config chain — iceberg_bridge.h:117-133) and
    * re-applies the per-bucket conf BEFORE the next scan plans its IO. */
  private final case class VendLease(owner: String, expiresAtMs: Long,
      tableLocation: String, reResolve: () => LoadResult)
  private val vendLeases =
    new java.util.concurrent.ConcurrentHashMap[String, VendLease]()
  /** Refresh this long before nominal expiry: in-flight IO holding the
    * PREVIOUS FileSystem instance finishes on still-valid credentials
    * while new instances pick up the rotated ones. */
  private[rest] val VendRefreshMarginMs = 60000L
  /** Last cfg applied per bucket — rotation is detected by VALUE, and
    * only a real rotation evicts the cached s3a FileSystem (the cache
    * pins the client built from the OLD conf; without eviction a
    * re-applied conf never takes effect). */
  private val vendApplied =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  /** Re-resolve + re-apply every registered vend within
    * [[VendRefreshMarginMs]] of expiry. Invoked at each interop scan
    * build / plan substitution — a no-op when nothing is registered, so
    * non-REST sessions never pay for it. Returns refreshed-bucket count
    * (receipt surface for the spec). */
  def refreshExpiredVends(spark: org.apache.spark.sql.SparkSession,
      nowMs: Long = System.currentTimeMillis()): Int = {
    if (vendLeases.isEmpty) return 0
    var n = 0
    vendLeases.forEach { (bucket, lease) =>
      if (nowMs >= lease.expiresAtMs - VendRefreshMarginMs) {
        val fresh = lease.reResolve()
        applyVendedStorage(spark, lease.tableLocation, fresh, lease.owner,
          lease.reResolve)
        // a re-vend that still reports the SAME (stale) expiry would
        // re-fire on every call — that is intentional: the catalog is
        // the source of truth and a service that cannot rotate is a
        // real outage, not something to mask by backing off
        n += 1
      }
    }
    n
  }

  /** Eviction is best-effort: closing the cached instance removes it
    * from Hadoop's FileSystem cache so the NEXT get() constructs a
    * client from the rotated per-bucket conf. No s3a implementation on
    * the classpath (or no instance yet) means there is nothing pinned —
    * nothing to evict. */
  private def evictCachedFs(spark: org.apache.spark.sql.SparkSession,
      bucket: String): Unit =
    try org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(s"s3a://$bucket/"),
      spark.sparkContext.hadoopConfiguration).close()
    catch { case scala.util.control.NonFatal(_) => }

  def applyVendedStorage(spark: org.apache.spark.sql.SparkSession,
      tableLocation: String, lr: LoadResult, owner: String = "",
      reResolve: () => LoadResult = null): Unit = {
    val matching = lr.storageCredentials
      .filter { case (p, _) => p.nonEmpty && tableLocation.startsWith(p) }
    val cfg: Map[String, String] =
      if (matching.nonEmpty) matching.maxBy(_._1.length)._2
      else lr.config.filter(_._1.startsWith("s3."))
    if (cfg.isEmpty) return
    val uri = try new java.net.URI(tableLocation)
      catch { case _: Exception => return }
    val scheme = Option(uri.getScheme).getOrElse(return)
    // s3a ONLY: the fs.s3a.bucket.<bucket>.* keys written below are read
    // by the s3a filesystem alone — a vend for an s3:// or s3n:// location
    // would be silently dropped (those schemes' default Hadoop filesystems
    // never consult them), leaving reads to fail with stale/no
    // credentials. Reject loudly instead of configuring nothing.
    if (scheme != "s3a") {
      if (scheme == "s3" || scheme == "s3n") throw new IllegalArgumentException(
        s"iceberg-rest: storage credentials vended for $tableLocation cannot " +
          s"be applied: only the s3a:// scheme is supported (per-bucket " +
          s"fs.s3a.bucket.* configuration); remap the location to s3a://")
      return // file:/, hdfs:/ … — nothing to configure
    }
    val bucket = Option(uri.getHost).orElse(Option(uri.getAuthority))
      .getOrElse(return)
    // the hadoopConfiguration is session-global: two catalogs vending
    // different credentials for ONE bucket would clobber each other
    // last-writer-wins, silently breaking the first catalog's tables
    // mid-session — refuse loudly instead. The same catalog re-vending
    // (rotated session tokens) is the normal refresh path and proceeds.
    val prevOwner = vendOwner.putIfAbsent(bucket, owner)
    if (prevOwner != null && prevOwner != owner)
      throw new IllegalStateException(
        s"iceberg-rest: bucket '$bucket' already carries storage " +
          s"credentials vended by catalog $prevOwner; refusing to " +
          s"overwrite them with catalog $owner's vend — use distinct " +
          s"buckets per catalog (per-bucket s3a config is the scope unit)")
    val hc = spark.sparkContext.hadoopConfiguration
    def set(k: String, v: String): Unit = hc.set(s"fs.s3a.bucket.$bucket.$k", v)
    cfg.get("s3.access-key-id").foreach(set("access.key", _))
    cfg.get("s3.secret-access-key").foreach(set("secret.key", _))
    cfg.get("s3.session-token").foreach { t =>
      set("session.token", t)
      // session credentials need the temporary provider; without it s3a
      // ignores the token and signs with just the key pair
      set("aws.credentials.provider",
        "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider")
    }
    cfg.get("s3.endpoint").foreach(set("endpoint", _))
    cfg.get("s3.path-style-access").foreach(set("path.style.access", _))
    // ROTATION takes effect (r16): Hadoop's FileSystem cache pins the
    // s3a client built from the conf at first use — re-setting the conf
    // alone would never reach an already-created instance, so a
    // changed-by-value vend evicts the cached FS for this bucket
    val prevCfg = vendApplied.put(bucket, cfg)
    if (prevCfg != null && prevCfg != cfg) evictCachedFs(spark, bucket)
    // short-TTL lease: register for refresh when the vend declares its
    // expiry and the caller can re-resolve (catalog-backed resolution)
    cfg.get("s3.session-token-expires-at-ms")
      .flatMap(v => scala.util.Try(v.toLong).toOption)
      .foreach { exp =>
        if (reResolve != null)
          vendLeases.put(bucket, VendLease(owner, exp, tableLocation, reResolve))
      }
  }

  /** One client (HTTP connection pool + memoized `/v1/config` prefix)
    * per catalog URI per JVM: a single connector read needs the catalog
    * at several resolution steps, and constructing a client per step
    * re-fetches config each time. Sharing is safe — the client is
    * stateless beyond the memoized prefix, and table state is NEVER
    * cached here (`loadTable` always hits the service; that call is the
    * freshness guarantee). */
  private val clients =
    new java.util.concurrent.ConcurrentHashMap[(String, Option[String]), IcebergRestCatalog]()
  def cached(uri: String, credential: Option[String] = None): IcebergRestCatalog =
    clients.computeIfAbsent((uri.stripSuffix("/"), credential),
      k => new IcebergRestCatalog(k._1, k._2))
}
