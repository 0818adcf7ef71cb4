package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.lake.iceberg.{IceField, IcePartField, IcePartSpec, IceSchema, IcebergMeta, IcebergTable, IcebergWriter}
import graft.lake.iceberg.rest.{IcebergRestCatalog, IcebergRestServer, IcebergRestTransaction, RestCommit}

/** The PUBLISHED Apache Iceberg REST catalog protocol end to end against
  * the bundled in-process service: create / load / register / list /
  * drop by NAME, commits through the requirements/updates CAS (two
  * racing committers — exactly one winner, the loser rebases and
  * retries), metadata materialized by the SERVICE (the engine writes
  * only data files + manifests), schema evolution through add-schema
  * updates, and location-only readers staying compatible with the
  * catalog-written metadata files. */
class IcebergRestSpec extends AnyFunSuite {
  import TestSpark._

  private def fresh(name: String): String = {
    val d = s"/root/repo/target/graft-lake-test/$name"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  private def iceSchemaOf(df: org.apache.spark.sql.DataFrame): IceSchema =
    IceSchema(0, df.schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      IceField(i + 1, f.name, required = false, f.dataType,
        IcebergMeta.typeString(f.dataType))
    })

  test("create / commit / load / read by name; CAS race has one winner") {
    val server = new IcebergRestServer(fresh("icerest-wh"),
      spark.sessionState.newHadoopConf())
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("ns"))
      assert(cat.listNamespaces().contains(Seq("ns")))
      val o = Tables.orders(spark, sf)
      val sch = iceSchemaOf(o)
      val statusId = sch.fields.find(_.name == "o_orderstatus").get.id
      cat.createTable(Seq("ns"), "orders",
        IcebergMeta.renderSchemaJson(sch),
        Some(IcebergMeta.renderSpecFieldsJson(IcePartSpec(0,
          Seq(IcePartField("o_orderstatus", "identity", statusId, 1000))))))
      assert(cat.tableExists(Seq("ns"), "orders"))
      assert(cat.listTables(Seq("ns")) == Seq("orders"))

      // two handles from the SAME base: exactly one commit wins
      val w1 = IcebergWriter.openRest(spark, cat, Seq("ns"), "orders")
      val w2 = IcebergWriter.openRest(spark, cat, Seq("ns"), "orders")
      w1.append(o.limit(100))
      intercept[java.util.ConcurrentModificationException] {
        w2.append(o.limit(50))
      }
      // loser rebases (reopen) and retries — the standard optimistic loop
      IcebergWriter.openRest(spark, cat, Seq("ns"), "orders").append(o.limit(50))

      val lr = cat.loadTable(Seq("ns"), "orders")
      assert(lr.metadata.snapshots.length == 2,
        "exactly the two WINNING commits are in the table history")
      // the catalog materialized metadata; the engine never wrote one
      assert(new org.apache.hadoop.fs.Path(lr.metadataLocation).getName
        .matches("\\d{5}-[0-9a-f-]+\\.metadata\\.json"))

      // read through the catalog pointer AND location-only (hadoop-style)
      val byPointer = IcebergTable.load(spark, lr.metadataLocation)
      assert(byPointer.scan().count() == 150)
      val byLocation = IcebergTable.load(spark, lr.metadata.location)
      assert(byLocation.scan().count() == 150)
      // partition pruning works on the catalog-created identity spec
      assert(byPointer.planFiles(Some(col("o_orderstatus") === "F")).size <
        byPointer.planFiles().size)

      // connector read by name
      val viaSql = spark.read.format("graft-iceberg")
        .option("catalog-uri", server.uri)
        .option("table", "ns.orders").load()
      assert(viaSql.count() == 150)

      // connector WRITE commits through the catalog CAS
      val before = cat.loadTable(Seq("ns"), "orders").metadata.snapshots.length
      o.limit(25).write.format("graft-iceberg")
        .option("catalog-uri", server.uri).option("table", "ns.orders")
        .mode("append").save()
      val after = cat.loadTable(Seq("ns"), "orders")
      assert(after.metadata.snapshots.length == before + 1)
      assert(IcebergTable.load(spark, after.metadataLocation).scan().count() == 175)

      // RACING CONNECTOR WRITES: two concurrent df.write appends — the
      // CAS loser re-stages from a fresh base and retries (the standard
      // optimistic loop); BOTH statements land, nothing is lost
      val t1 = new Thread(() =>
        o.limit(10).write.format("graft-iceberg")
          .option("catalog-uri", server.uri).option("table", "ns.orders")
          .mode("append").save())
      val t2 = new Thread(() =>
        o.limit(15).write.format("graft-iceberg")
          .option("catalog-uri", server.uri).option("table", "ns.orders")
          .mode("append").save())
      t1.start(); t2.start(); t1.join(); t2.join()
      assert(IcebergTable.load(spark,
        cat.loadTable(Seq("ns"), "orders").metadataLocation)
        .scan().count() == 200, "both racing connector appends must land")

      // drop: gone by name, data left in place (spec default, no purge)
      assert(cat.dropTable(Seq("ns"), "orders"))
      assert(!cat.tableExists(Seq("ns"), "orders"))
      intercept[NoSuchElementException] { cat.loadTable(Seq("ns"), "orders") }
    } finally server.stop()
  }

  test("register adopts an existing location-built table by name") {
    val server = new IcebergRestServer(fresh("icerest-reg-wh"),
      spark.sessionState.newHadoopConf())
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("ns"))
      val o = Tables.orders(spark, sf)
      val loc = fresh("icerest-reg-tbl")
      val w = IcebergWriter.create(spark, loc, o.schema)
      w.append(o.limit(120))
      // current metadata file of the location-based table
      val metaDir = new org.apache.hadoop.fs.Path(loc, "metadata")
      val fs = metaDir.getFileSystem(spark.sessionState.newHadoopConf())
      val metaFile = fs.listStatus(metaDir).map(_.getPath)
        .filter(_.getName.endsWith(".metadata.json"))
        .maxBy(_.getName.stripPrefix("v").takeWhile(_.isDigit).toInt)
      val lr = cat.registerTable(Seq("ns"), "adopted", metaFile.toString)
      assert(lr.metadata.snapshots.length == 1)
      assert(cat.listTables(Seq("ns")) == Seq("adopted"))
      // loaded by name, committed through the catalog from here on
      IcebergWriter.openRest(spark, cat, Seq("ns"), "adopted").append(o.limit(30))
      val cur = cat.loadTable(Seq("ns"), "adopted")
      assert(IcebergTable.load(spark, cur.metadataLocation).scan().count() == 150)
      // the catalog commit CONTINUES the registered engine-written vN
      // version chain (not a restart at 00000 below it), and
      // location-only readers — hint-first AND max-version — resolve the
      // catalog-committed state, not the stale pre-register one
      val registeredV = metaFile.getName.stripPrefix("v").takeWhile(_.isDigit).toInt
      val committedV = new org.apache.hadoop.fs.Path(cur.metadataLocation)
        .getName.takeWhile(_.isDigit).toInt
      assert(committedV == registeredV + 1,
        s"catalog commit must continue the version chain " +
          s"($registeredV -> $committedV)")
      assert(IcebergTable.load(spark, loc).scan().count() == 150,
        "location-only read must see the catalog-committed state")
    } finally server.stop()
  }

  test("REST rollback keeps snapshot-log monotonic; as-of-time history intact") {
    val server = new IcebergRestServer(fresh("icerest-rb-wh"),
      spark.sessionState.newHadoopConf())
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("ns"))
      val o = Tables.orders(spark, sf)
      cat.createTable(Seq("ns"), "t", IcebergMeta.renderSchemaJson(iceSchemaOf(o)))
      val w = IcebergWriter.openRest(spark, cat, Seq("ns"), "t")
      w.append(o.limit(10))
      val s1 = cat.loadTable(Seq("ns"), "t").metadata.currentSnapshotId.get
      w.append(o.limit(20))
      val m2 = cat.loadTable(Seq("ns"), "t").metadata
      val s2 = m2.currentSnapshotId.get
      val t2 = m2.snapshotLog.last._1
      w.rollbackTo(s1) // travels as a bare set-snapshot-ref(main) update
      val m3 = cat.loadTable(Seq("ns"), "t").metadata
      assert(m3.currentSnapshotId.contains(s1))
      // the log must stay time-monotonic — the rollback entry is stamped
      // at COMMIT time, not with the old snapshot's stamp (which would
      // make as-of reads between the two commits resolve to the target)
      assert(m3.snapshotLog.map(_._1) == m3.snapshotLog.map(_._1).sorted,
        s"snapshot-log must be monotonic, got ${m3.snapshotLog}")
      assert(m3.snapshotLog.last._2 == s1)
      val t = IcebergTable.load(spark,
        cat.loadTable(Seq("ns"), "t").metadataLocation)
      assert(t.snapshotAsOfTime(t2) == s2,
        "a pre-rollback as-of time still resolves to the state current THEN")
      assert(t.scan().count() == 10)
    } finally server.stop()
  }

  test("partition evolution travels as the published add-spec/set-default-spec") {
    val server = new IcebergRestServer(fresh("icerest-spec-wh"),
      spark.sessionState.newHadoopConf())
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("ns"))
      val o = Tables.orders(spark, sf)
      val sch = iceSchemaOf(o)
      cat.createTable(Seq("ns"), "t", IcebergMeta.renderSchemaJson(sch))
      val base = cat.loadTable(Seq("ns"), "t").metadata
      // post the spec's own update actions (what any standard engine
      // sends for ALTER TABLE ... ADD PARTITION FIELD)
      val statusId = sch.fields.find(_.name == "o_orderstatus").get.id
      val newSpec = IcePartSpec(1,
        Seq(IcePartField("o_orderstatus", "identity", statusId, 1000)))
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val updates = mapper.createArrayNode()
      val a1 = updates.addObject(); a1.put("action", "add-spec")
      a1.set[com.fasterxml.jackson.databind.node.ObjectNode]("spec",
        IcebergMeta.renderSpecNode(newSpec))
      val a2 = updates.addObject(); a2.put("action", "set-default-spec")
      a2.put("spec-id", -1) // spec shorthand: the spec just added
      val committed = cat.commitTable(Seq("ns"), "t",
        graft.lake.iceberg.rest.RestCommit.requirements(base), updates).metadata
      assert(committed.defaultSpecId == 1)
      assert(committed.specs.map(_.specId) == Seq(0, 1))
      assert(committed.lastPartitionId == 1000,
        "the service recomputes last-partition-id from the added fields")
    } finally server.stop()
  }

  test("schema evolution + properties travel as REST updates") {
    val server = new IcebergRestServer(fresh("icerest-evo-wh"),
      spark.sessionState.newHadoopConf())
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("ns"))
      val o = Tables.orders(spark, sf)
      cat.createTable(Seq("ns"), "t", IcebergMeta.renderSchemaJson(iceSchemaOf(o)))
      val w = IcebergWriter.openRest(spark, cat, Seq("ns"), "t")
      w.append(o.limit(10))
      // rename lands as add-schema + set-current-schema updates applied
      // BY THE CATALOG — reload by name and the new schema is current
      w.renameColumn("o_orderpriority", "o_priority")
      val lr = cat.loadTable(Seq("ns"), "t")
      assert(lr.metadata.currentSchema.fields.exists(_.name == "o_priority"))
      assert(!lr.metadata.currentSchema.fields.exists(_.name == "o_orderpriority"))
      // field-id resolution: data written pre-rename reads under the
      // new name through the catalog pointer
      val t = IcebergTable.load(spark, lr.metadataLocation)
      assert(t.scan().select("o_priority").count() == 10)
    } finally server.stop()
  }

  test("expiring vended credentials refresh before the next scan (r16)") {
    // a 15-min STS vend must not kill a session that outlives it: a vend
    // carrying s3.session-token-expires-at-ms registers a refresh lease,
    // and refreshExpiredVends (invoked per interop scan build) re-resolves
    // through the catalog and re-applies the per-bucket conf
    val server = new IcebergRestServer(fresh("icerest-refresh-wh"),
      spark.sessionState.newHadoopConf())
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("ns"))
      val o = Tables.orders(spark, sf)
      cat.createTable(Seq("ns"), "t", IcebergMeta.renderSchemaJson(iceSchemaOf(o)))
      IcebergWriter.openRest(spark, cat, Seq("ns"), "t").append(o.limit(10))
      val lr = cat.loadTable(Seq("ns"), "t")
      val now = System.currentTimeMillis()
      def creds(token: String, expMs: Long) = Map(
        "s3.access-key-id" -> s"AK_$token", "s3.secret-access-key" -> s"SK_$token",
        "s3.session-token" -> token,
        "s3.session-token-expires-at-ms" -> expMs.toString)
      val loc = "s3a://vend-refresh/wh/ns/t"
      var resolves = 0
      def reResolve(): IcebergRestCatalog.LoadResult = {
        resolves += 1
        // the rotated vend: fresh token, fresh far-future expiry
        lr.copy(storageCredentials = Seq(loc -> creds("TOK_B", now + 3600000L)))
      }
      // initial vend: expires in 10 minutes — comfortably fresh
      IcebergRestCatalog.applyVendedStorage(spark, loc,
        lr.copy(storageCredentials = Seq(loc -> creds("TOK_A", now + 600000L))),
        owner = server.uri, reResolve = () => reResolve())
      val hc = spark.sparkContext.hadoopConfiguration
      assert(hc.get("fs.s3a.bucket.vend-refresh.session.token") == "TOK_A")
      // well before the margin: nothing refreshes
      assert(IcebergRestCatalog.refreshExpiredVends(spark, now) == 0)
      assert(resolves == 0)
      // inside the refresh margin of expiry: the lease re-resolves and
      // the rotated credentials land in the per-bucket conf
      assert(IcebergRestCatalog.refreshExpiredVends(spark, now + 600000L - 30000L) == 1)
      assert(resolves == 1)
      assert(hc.get("fs.s3a.bucket.vend-refresh.session.token") == "TOK_B")
      assert(hc.get("fs.s3a.bucket.vend-refresh.access.key") == "AK_TOK_B")
      // the rotated lease is fresh for an hour — no further refresh
      assert(IcebergRestCatalog.refreshExpiredVends(spark, now + 600000L) == 0)
      assert(resolves == 1)

      // END-TO-END: a scan of a REST-resolved table refreshes expired
      // leases as part of its own planning — register a lease already
      // past expiry, read through the connector, and the re-resolve
      // fires without any explicit refresh call
      IcebergRestCatalog.applyVendedStorage(spark, loc,
        lr.copy(storageCredentials = Seq(loc -> creds("TOK_OLD", now - 1000L))),
        owner = server.uri, reResolve = () => reResolve())
      val before = resolves
      // the data-column predicate keeps AggPushdown from answering the
      // count out of metadata — a real scan must build (and refresh)
      val n = spark.read.format("graft-iceberg")
        .option("catalog-uri", server.uri)
        .option("table", "ns.t").load()
        .filter(col("o_orderkey") >= 0).count()
      assert(n == 10)
      assert(resolves > before,
        "the scan build must refresh expired vend leases before IO plans")
      assert(hc.get("fs.s3a.bucket.vend-refresh.session.token") == "TOK_B")
    } finally server.stop()
  }

  test("row-lineage metadata refuses the REST diff loudly (r16, advice)") {
    // next-row-id has NO update action in the REST spec; before r16 the
    // completeness guard missed it, so a lineage enable/append through
    // the REST path silently dropped lineage at the catalog (the writer
    // then adopts the catalog's metadata as truth — invisible loss).
    // Now it refuses, naming the field.
    val server = new IcebergRestServer(fresh("icerest-lineage-wh"),
      spark.sessionState.newHadoopConf())
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("ns"))
      val o = Tables.orders(spark, sf)
      cat.createTable(Seq("ns"), "t", IcebergMeta.renderSchemaJson(iceSchemaOf(o)))
      val w = IcebergWriter.openRest(spark, cat, Seq("ns"), "t")
      val e = intercept[IllegalArgumentException] { w.enableRowLineage() }
      assert(e.getMessage.contains("next-row-id"), e.getMessage)
      // the catalog state did not move: still zero snapshots, no lineage
      val lr = cat.loadTable(Seq("ns"), "t")
      assert(lr.metadata.nextRowId.isEmpty)
      assert(lr.metadata.currentSnapshotId.isEmpty)
    } finally server.stop()
  }

  test("every writer mutation is equivalent REST-committed and location-committed") {
    // the REST path commits a metadata DIFF (RestCommit.updates) that the
    // service re-applies, while the location path persists the writer's
    // own metadata verbatim — this drives the writer's ENTIRE mutation
    // surface through both and pins the observable state equal after
    // every step, so no mutation can silently lose semantics in the diff
    val server = new IcebergRestServer(fresh("icerest-eq-wh"),
      spark.sessionState.newHadoopConf())
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("ns"))
      val o = Tables.orders(spark, sf).localCheckpoint()
      cat.createTable(Seq("ns"), "t", IcebergMeta.renderSchemaJson(iceSchemaOf(o)))
      val locDir = fresh("icerest-eq-loc")
      IcebergWriter.create(spark, locDir, o.schema)

      def restW() = IcebergWriter.openRest(spark, cat, Seq("ns"), "t")
      def locW() = IcebergWriter.open(spark, locDir)
      def restT() = IcebergTable.load(spark,
        cat.loadTable(Seq("ns"), "t").metadataLocation)
      def locT() = IcebergTable.load(spark, locDir)

      val steps: Seq[(String, IcebergWriter => Unit)] = Seq(
        "append A" -> (_.append(o.limit(60))),
        "append B" -> (_.append(o.orderBy(col("o_orderkey").desc).limit(40))),
        "dv delete" -> (_.deleteWhereDv(
          col("o_orderkey") % 7 === 0, requireMatch = false)),
        "update" -> (_.updateWhere(col("o_orderkey") % 5 === 0,
          Map("o_totalprice" -> org.apache.spark.sql.functions.lit(9.99)))),
        "upsert" -> (_.upsertKeys(o.limit(20)
          .withColumn("o_comment", org.apache.spark.sql.functions.lit("up")),
          Seq("o_orderkey"))),
        "tag" -> (w => w.tag("checkpoint", w.currentSnapshotId)),
        "rollback 2 back" -> (w =>
          w.rollbackTo(w.meta.snapshots(w.meta.snapshots.length - 3).id)),
        "append after rollback" -> (_.append(o.limit(5))),
        "rename column" -> (_.renameColumn("o_orderpriority", "o_priority")),
        "compact" -> (w => { w.compact(); () }),
        "expire" -> (w => { w.expireSnapshots(keepLast = 3); () }))

      steps.foreach { case (name, step) =>
        step(restW()); step(locW())
        val r = restT(); val l = locT()
        val rRows = r.scan().collect().map(_.toSeq).toSet
        val lRows = l.scan().collect().map(_.toSeq).toSet
        assert(rRows == lRows, s"step '$name': scans diverge " +
          s"(rest ${rRows.size} rows, location ${lRows.size} rows)")
        assert(r.schema == l.schema, s"step '$name': schemas diverge")
        assert(r.meta.snapshots.length == l.meta.snapshots.length,
          s"step '$name': snapshot counts diverge")
        assert(r.meta.refs.keySet == l.meta.refs.keySet ||
          (r.meta.refs.keySet - "main") == (l.meta.refs.keySet - "main"),
          s"step '$name': ref names diverge")
        assert(r.meta.formatVersion == l.meta.formatVersion,
          s"step '$name': format versions diverge")
      }
    } finally server.stop()
  }

  test("multi-level namespaces route with the 0x1F separator") {
    val server = new IcebergRestServer(fresh("icerest-ml-wh"),
      spark.sessionState.newHadoopConf())
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("a", "b"))
      val o = Tables.orders(spark, sf)
      cat.createTable(Seq("a", "b"), "t", IcebergMeta.renderSchemaJson(iceSchemaOf(o)))
      assert(cat.listNamespaces().contains(Seq("a", "b")))
      assert(cat.listTables(Seq("a", "b")) == Seq("t"))
      IcebergWriter.openRest(spark, cat, Seq("a", "b"), "t").append(o.limit(5))
      assert(IcebergTable.load(spark,
        cat.loadTable(Seq("a", "b"), "t").metadataLocation).scan().count() == 5)
      // sibling single-level namespace "ab" must NOT alias ["a","b"]
      cat.createNamespace(Seq("ab"))
      assert(cat.listTables(Seq("ab")).isEmpty)
    } finally server.stop()
  }

  test("rename moves the pointer only; purge drop deletes storage, plain drop keeps it") {
    val server = new IcebergRestServer(fresh("icerest-ren-wh"),
      spark.sessionState.newHadoopConf())
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("a"))
      cat.createNamespace(Seq("b"))
      val o = Tables.orders(spark, sf)
      cat.createTable(Seq("a"), "t", IcebergMeta.renderSchemaJson(iceSchemaOf(o)))
      IcebergWriter.openRest(spark, cat, Seq("a"), "t").append(o.limit(9))
      val locBefore = cat.loadTable(Seq("a"), "t").metadataLocation

      // rename across namespaces: pointer move, same metadata file, same
      // uuid/history; old name 404s, CAS commits keep working after
      cat.renameTable(Seq("a"), "t", Seq("b"), "t2")
      assert(!cat.tableExists(Seq("a"), "t"))
      val loaded = cat.loadTable(Seq("b"), "t2")
      assert(loaded.metadataLocation == locBefore,
        "rename must not rewrite metadata")
      IcebergWriter.openRest(spark, cat, Seq("b"), "t2").append(o.limit(4))
      assert(IcebergTable.load(spark,
        cat.loadTable(Seq("b"), "t2").metadataLocation).scan().count() == 13)
      // destination collision rejects
      cat.createTable(Seq("a"), "t3", IcebergMeta.renderSchemaJson(iceSchemaOf(o)))
      intercept[IllegalArgumentException] {
        cat.renameTable(Seq("a"), "t3", Seq("b"), "t2")
      }

      // plain drop: files remain (external vacuum's job)
      val keepLoc = cat.loadTable(Seq("a"), "t3").metadata.location
      assert(cat.dropTable(Seq("a"), "t3"))
      val fs = new org.apache.hadoop.fs.Path(keepLoc)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(fs.exists(new org.apache.hadoop.fs.Path(keepLoc)))
      // purge drop: storage gone too (the reference's drop_table(purge))
      val dataLoc = cat.loadTable(Seq("b"), "t2").metadata.location
      assert(cat.dropTable(Seq("b"), "t2", purge = true))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dataLoc)),
        "purgeRequested must delete the table's storage")
    } finally server.stop()
  }

  test("namespace lifecycle: properties round-trip, empty-only drop") {
    val server = new IcebergRestServer(fresh("icerest-ns-wh"),
      spark.sessionState.newHadoopConf())
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("ns"))
      assert(cat.namespaceProperties(Seq("ns")).isEmpty)
      // UpdateNamespacePropertiesRequest: updates + removals in one call,
      // missing removals reported (never an error, per spec)
      val (up1, rm1, ms1) = cat.updateNamespaceProperties(Seq("ns"),
        updates = Map("owner" -> "graft", "comment" -> "lake"))
      assert(up1.toSet == Set("owner", "comment") && rm1.isEmpty && ms1.isEmpty)
      assert(cat.namespaceProperties(Seq("ns")) ==
        Map("owner" -> "graft", "comment" -> "lake"))
      val (up2, rm2, ms2) = cat.updateNamespaceProperties(Seq("ns"),
        updates = Map("owner" -> "graft2"),
        removals = Seq("comment", "nonexistent"))
      assert(up2 == Seq("owner") && rm2 == Seq("comment") && ms2 == Seq("nonexistent"))
      assert(cat.namespaceProperties(Seq("ns")) == Map("owner" -> "graft2"))

      // drop: refused while non-empty (409 loud), clean once empty
      val o = Tables.orders(spark, sf)
      cat.createTable(Seq("ns"), "t", IcebergMeta.renderSchemaJson(iceSchemaOf(o)))
      val e = intercept[RuntimeException] { cat.dropNamespace(Seq("ns")) }
      assert(e.getMessage.contains("409"), s"non-empty drop must 409: ${e.getMessage}")
      assert(cat.dropTable(Seq("ns"), "t"))
      assert(cat.dropNamespace(Seq("ns")))
      assert(!cat.listNamespaces().contains(Seq("ns")))
      assert(!cat.dropNamespace(Seq("ns")), "second drop reports absence")
    } finally server.stop()
  }

  test("OAuth2: bearer flow, 401 without/with bad credentials, expired-token refresh") {
    val server = new IcebergRestServer(fresh("icerest-auth-wh"),
      spark.sessionState.newHadoopConf(),
      credentials = Map("svc" -> "s3cret"),
      tokenTtlMillis = 1500L) // short: exercises the refresh path below
    try {
      // anonymous client: EVERY route (config included) rejects with 401
      val anon = new IcebergRestCatalog(server.uri)
      val e1 = intercept[IllegalArgumentException] { anon.listNamespaces() }
      assert(e1.getMessage.contains("401"), s"expected 401, got: ${e1.getMessage}")

      // wrong secret: the token endpoint itself rejects — loud, never a
      // silent anonymous downgrade
      val bad = new IcebergRestCatalog(server.uri, Some("svc:wrong"))
      val e2 = intercept[IllegalArgumentException] { bad.listNamespaces() }
      assert(e2.getMessage.contains("token request rejected"),
        s"expected token rejection, got: ${e2.getMessage}")
      assert(e2.getMessage.contains("invalid_client"))

      // valid credentials: the full catalog surface works through bearer
      val cat = new IcebergRestCatalog(server.uri, Some("svc:s3cret"))
      cat.createNamespace(Seq("ns"))
      val o = Tables.orders(spark, sf)
      cat.createTable(Seq("ns"), "t", IcebergMeta.renderSchemaJson(iceSchemaOf(o)))
      IcebergWriter.openRest(spark, cat, Seq("ns"), "t").append(o.limit(7))
      assert(IcebergTable.load(spark,
        cat.loadTable(Seq("ns"), "t").metadataLocation).scan().count() == 7)

      // expiry: outlive the 1.5s ttl (the client's proactive half-life
      // refresh AND the server-side eviction both engage), then keep
      // working — a fresh grant must be negotiated transparently
      Thread.sleep(2200L)
      assert(cat.listTables(Seq("ns")) == Seq("t"))
      assert(cat.tableExists(Seq("ns"), "t"))
    } finally server.stop()
  }

  test("list pagination: pageSize/pageToken loop reassembles the full table list") {
    val server = new IcebergRestServer(fresh("icerest-page-wh"),
      spark.sessionState.newHadoopConf())
    try {
      // page size 3 against 8 tables: the client must walk 3 pages
      val cat = new IcebergRestCatalog(server.uri, listPageSize = 3)
      cat.createNamespace(Seq("ns"))
      val o = Tables.orders(spark, sf)
      val names = (1 to 8).map(i => f"t$i%02d")
      names.foreach(n =>
        cat.createTable(Seq("ns"), n, IcebergMeta.renderSchemaJson(iceSchemaOf(o))))
      assert(cat.listTables(Seq("ns")) == names)
      // namespaces paginate through the same loop
      (1 to 7).foreach(i => cat.createNamespace(Seq(f"extra$i%02d")))
      val nss = cat.listNamespaces()
      assert(nss.count(_.head.startsWith("extra")) == 7)
      assert(nss.contains(Seq("ns")))
      // a raw single page carries next-page-token and exactly pageSize rows
      val http = java.net.http.HttpClient.newHttpClient()
      val r = http.send(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"${server.uri}/v1/namespaces/ns/tables?pageSize=3"))
        .GET().build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200)
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(r.body())
      assert(n.get("identifiers").size() == 3)
      assert(n.hasNonNull("next-page-token"))
    } finally server.stop()
  }

  test("views API: create / load / execute / replace / rename / drop (r14)") {
    val server = new IcebergRestServer(fresh("icerest-views-wh"),
      spark.sessionState.newHadoopConf())
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("ns"))
      val o = Tables.orders(spark, sf)
      o.createOrReplaceTempView("views_src_orders")
      val viewSql =
        "SELECT o_orderstatus, count(*) AS n FROM views_src_orders " +
          "GROUP BY o_orderstatus"
      val outSchema = spark.sql(viewSql).schema
      val lr = cat.createView(Seq("ns"), "orders_by_status", viewSql,
        IcebergMeta.renderSchemaJson(iceSchemaOf(spark.sql(viewSql))),
        properties = Map("comment" -> "per-status counts"))
      assert(lr.currentVersionId == 1 && lr.versions.length == 1)
      assert(cat.viewExists(Seq("ns"), "orders_by_status"))
      assert(cat.listViews(Seq("ns")) == Seq("orders_by_status"))
      assert(lr.properties("comment") == "per-status counts")
      // a second create on the name 409s
      intercept[RuntimeException] {
        cat.createView(Seq("ns"), "orders_by_status", viewSql,
          IcebergMeta.renderSchemaJson(iceSchemaOf(spark.sql(viewSql))))
      }

      // the stored representation EXECUTES (spark dialect) and matches
      val got = spark.sql(cat.loadView(Seq("ns"), "orders_by_status").sql())
      assert(got.schema == outSchema)
      assert(got.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        o.groupBy("o_orderstatus").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)

      // REPLACE: one commit appends version 2 and makes it current;
      // version 1 stays in the metadata (view history, per spec)
      val sql2 = "SELECT o_orderpriority, count(*) AS n FROM " +
        "views_src_orders GROUP BY o_orderpriority"
      val lr2 = cat.replaceView(Seq("ns"), "orders_by_status", sql2)
      assert(lr2.currentVersionId == 2 && lr2.versions.map(_.versionId) == Seq(1, 2))
      assert(lr2.sql() == sql2)
      assert(spark.sql(lr2.sql()).collect().length ==
        o.select("o_orderpriority").distinct().count())

      // RACE arbitration (r15): two replacers from one base compute the
      // same next version-id; assert-view-uuid cannot arbitrate (the
      // uuid never changes across commits), so the SERVER rejects the
      // duplicate version-id with 409 — exactly one winner, loser
      // re-reads. Simulated deterministically with two raw commits
      // built from one loaded base.
      {
        val cur = cat.loadView(Seq("ns"), "orders_by_status")
        val nextId = cur.versions.map(_.versionId).max + 1
        def body(sqlTxt: String) =
          s"""{"requirements":[{"type":"assert-view-uuid","uuid":"${cur.uuid}"}],
              "updates":[
                {"action":"add-view-version","view-version":{
                  "version-id":$nextId,"schema-id":0,
                  "summary":{"engine-name":"graft"},
                  "representations":[{"type":"sql","sql":"$sqlTxt","dialect":"spark"}],
                  "default-namespace":["ns"]}},
                {"action":"set-current-view-version","view-version-id":-1}]}"""
        val raw = java.net.http.HttpClient.newHttpClient()
        def post(b: String) = raw.send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(
            s"${server.uri}/v1/namespaces/ns/views/orders_by_status"))
            .header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(b)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        val r1 = post(body("SELECT 11 AS a"))
        val r2 = post(body("SELECT 22 AS a"))
        assert(r1.statusCode() == 200, s"first racer must win: ${r1.body()}")
        assert(r2.statusCode() == 409,
          s"duplicate version-id must 409, got ${r2.statusCode()}: ${r2.body()}")
        val after = cat.loadView(Seq("ns"), "orders_by_status")
        assert(after.versions.map(_.versionId) == Seq(1, 2, nextId),
          "exactly one racer may append (no duplicate version-ids)")
        assert(after.sql() == "SELECT 11 AS a")
      }

      // rename is a pointer move; the old name 404s, history survives
      cat.renameView(Seq("ns"), "orders_by_status", Seq("ns"), "obs2")
      assert(!cat.viewExists(Seq("ns"), "orders_by_status"))
      assert(cat.loadView(Seq("ns"), "obs2").versions.length == 3)
      intercept[NoSuchElementException] {
        cat.loadView(Seq("ns"), "orders_by_status")
      }

      // a namespace holding a view is NOT empty (spec: 409 on drop)
      intercept[RuntimeException] { cat.dropNamespace(Seq("ns")) }
      assert(cat.dropView(Seq("ns"), "obs2"))
      assert(!cat.dropView(Seq("ns"), "obs2")) // idempotent-false
      assert(cat.listViews(Seq("ns")).isEmpty)

      // unknown dialect refuses loudly instead of running foreign SQL
      val lr3 = cat.createView(Seq("ns"), "multi", viewSql,
        IcebergMeta.renderSchemaJson(iceSchemaOf(spark.sql(viewSql))),
        dialect = "trino")
      // exactly one representation → served for any requested dialect
      assert(lr3.sql("spark") == viewSql)
    } finally server.stop()
  }

  test("vended storage credentials land as per-bucket s3a conf (r14)") {
    val server = new IcebergRestServer(fresh("icerest-vend-wh"),
      spark.sessionState.newHadoopConf(),
      vendedStorageCredentials = Map(
        "s3.access-key-id" -> "VENDED_AK",
        "s3.secret-access-key" -> "VENDED_SK",
        "s3.session-token" -> "VENDED_TOKEN",
        "s3.endpoint" -> "http://minio.local:9000",
        "s3.path-style-access" -> "true"))
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("ns"))
      val o = Tables.orders(spark, sf)
      cat.createTable(Seq("ns"), "vended", IcebergMeta.renderSchemaJson(iceSchemaOf(o)))
      val lr = cat.loadTable(Seq("ns"), "vended")
      // the spec surface: LoadTableResult carries storage-credentials
      // scoped to the table's location
      assert(lr.storageCredentials.nonEmpty, "service must vend credentials")
      val (prefix, cfg) = lr.storageCredentials.head
      assert(lr.metadata.location.startsWith(prefix))
      assert(cfg("s3.access-key-id") == "VENDED_AK")

      // application: an s3a table location maps the vend onto Hadoop's
      // per-bucket s3a keys (a SYNTHETIC location — the warehouse here is
      // file:/, where the vend is correctly a no-op, asserted below)
      val synthetic = lr.copy(storageCredentials =
        Seq("s3a://vend-bucket/wh/ns/vended" -> cfg))
      IcebergRestCatalog.applyVendedStorage(spark,
        "s3a://vend-bucket/wh/ns/vended", synthetic)
      val hc = spark.sparkContext.hadoopConfiguration
      assert(hc.get("fs.s3a.bucket.vend-bucket.access.key") == "VENDED_AK")
      assert(hc.get("fs.s3a.bucket.vend-bucket.secret.key") == "VENDED_SK")
      assert(hc.get("fs.s3a.bucket.vend-bucket.session.token") == "VENDED_TOKEN")
      assert(hc.get("fs.s3a.bucket.vend-bucket.aws.credentials.provider")
        .contains("TemporaryAWSCredentialsProvider"))
      assert(hc.get("fs.s3a.bucket.vend-bucket.endpoint") == "http://minio.local:9000")
      assert(hc.get("fs.s3a.bucket.vend-bucket.path.style.access") == "true")

      // a DIFFERENT catalog re-vending the same bucket would clobber
      // these credentials last-writer-wins — refuse loudly (r15); the
      // same owner re-vending (token rotation) stays quiet
      intercept[IllegalStateException] {
        IcebergRestCatalog.applyVendedStorage(spark,
          "s3a://vend-bucket/wh/other",
          lr.copy(storageCredentials = Seq("s3a://vend-bucket/wh" -> cfg)),
          owner = "https://other-catalog")
      }
      IcebergRestCatalog.applyVendedStorage(spark,
        "s3a://vend-bucket/wh/ns/vended", synthetic)
      // s3:// locations cannot ride fs.s3a.bucket.* keys — the default
      // Hadoop filesystems for that scheme never read them, so applying
      // the vend would silently configure nothing: loud reject (r15)
      intercept[IllegalArgumentException] {
        IcebergRestCatalog.applyVendedStorage(spark, "s3://vend-b2/wh",
          lr.copy(storageCredentials = Seq("s3://vend-b2/wh" -> cfg)))
      }

      // file:/ locations ignore the vend (nothing to configure) — the
      // REST resolution over this local warehouse must keep working
      IcebergRestCatalog.applyVendedStorage(spark, lr.metadata.location, lr)
      IcebergWriter.openRest(spark, cat, Seq("ns"), "vended").append(o.limit(20))
      val read = spark.read.format("graft-iceberg")
        .option("catalog-uri", server.uri)
        .option("table", "ns.vended").load()
      assert(read.count() == 20)
    } finally server.stop()
  }

  test("multi-table transaction: all-or-nothing commit; race loser changes NOTHING (r15)") {
    val server = new IcebergRestServer(fresh("icerest-txn-wh"),
      spark.sessionState.newHadoopConf())
    try {
      val cat = new IcebergRestCatalog(server.uri)
      cat.createNamespace(Seq("ns"))
      val o = Tables.orders(spark, sf)
      val sch = IcebergMeta.renderSchemaJson(iceSchemaOf(o))
      cat.createTable(Seq("ns"), "ingest", sch)
      cat.createTable(Seq("ns"), "retire", sch)

      // the ingest+retire pattern: one transaction appends to BOTH
      // tables; both move, atomically
      IcebergRestTransaction.commit(spark, cat, Seq(
        (Seq("ns"), "ingest") -> ((w: IcebergWriter) => { w.append(o.limit(100)); () }),
        (Seq("ns"), "retire") -> ((w: IcebergWriter) => { w.append(o.limit(40)); () })))
      def count(name: String): Long = IcebergTable.load(spark,
        cat.loadTable(Seq("ns"), name).metadataLocation).scan().count()
      assert(count("ingest") == 100 && count("retire") == 40,
        "both tables must move in one transaction")

      // a multi-commit op collapses to one change (chain CAS): two
      // appends inside the op land as one transaction entry
      IcebergRestTransaction.commit(spark, cat, Seq(
        (Seq("ns"), "ingest") -> ((w: IcebergWriter) => {
          w.append(o.limit(5)); w.append(o.limit(5)); () })))
      assert(count("ingest") == 110)

      // RACE: stage a transaction, then move ONE member table through a
      // plain single-table commit before the transaction posts — the
      // whole transaction must 409 and NEITHER table may change
      val (wI, chI) = IcebergWriter.openRestStaged(spark, cat, Seq("ns"), "ingest")
      val (wR, chR) = IcebergWriter.openRestStaged(spark, cat, Seq("ns"), "retire")
      wI.append(o.limit(7))
      wR.append(o.limit(9))
      IcebergWriter.openRest(spark, cat, Seq("ns"), "retire").append(o.limit(3))
      val retireAfterRace = count("retire")
      val ingestBefore = count("ingest")
      intercept[java.util.ConcurrentModificationException] {
        cat.commitTransaction(Seq(
          (Seq("ns"), "ingest",
            RestCommit.requirements(chI().head._1),
            RestCommit.updates(chI().head._1, chI().last._2)),
          (Seq("ns"), "retire",
            RestCommit.requirements(chR().head._1),
            RestCommit.updates(chR().head._1, chR().last._2))))
      }
      assert(count("ingest") == ingestBefore,
        "a losing transaction must not move ANY member table")
      assert(count("retire") == retireAfterRace)
      // the standard optimistic loop: rebase (reopen) and retry — lands
      IcebergRestTransaction.commit(spark, cat, Seq(
        (Seq("ns"), "ingest") -> ((w: IcebergWriter) => { w.append(o.limit(7)); () }),
        (Seq("ns"), "retire") -> ((w: IcebergWriter) => { w.append(o.limit(9)); () })))
      assert(count("ingest") == ingestBefore + 7)
      assert(count("retire") == retireAfterRace + 9)

      // unknown member table 404s the whole transaction
      intercept[RuntimeException] {
        IcebergRestTransaction.commit(spark, cat, Seq(
          (Seq("ns"), "ghost") -> ((w: IcebergWriter) => { w.append(o.limit(1)); () })))
      }

      // STAGED CREATE (transactional CTAS): stage-create returns
      // metadata without registering — the name stays invisible until
      // the assert-create transaction commits it WITH its data
      val sch2 = IcebergMeta.renderSchemaJson(iceSchemaOf(o))
      val staged0 = cat.stageCreateTable(Seq("ns"), "ctas", sch2)
      assert(staged0.metadataLocation.isEmpty, "staged create commits nothing")
      assert(!cat.tableExists(Seq("ns"), "ctas"),
        "a staged table must not be visible before its transaction")
      IcebergRestTransaction.createAndCommit(spark, cat, Seq("ns"), "ctas",
        sch2)(w => { w.append(o.limit(60)); () })
      assert(cat.tableExists(Seq("ns"), "ctas"))
      assert(count("ctas") == 60, "CTAS data must land with the create")
      // re-staging an existing name fails FAST at the stage call
      intercept[RuntimeException] {
        cat.stageCreateTable(Seq("ns"), "ctas", sch2)
      }
      assert(count("ctas") == 60)
      // the real RACE: stage first, another creator lands the name,
      // then the staged transaction 409s at assert-create and the
      // loser's staged files are never referenced
      val stagedRace = cat.stageCreateTable(Seq("ns"), "ctas2", sch2)
      val (wS, chS) = IcebergWriter.openStagedMeta(spark, stagedRace.metadata)
      wS.append(o.limit(5))
      cat.createTable(Seq("ns"), "ctas2", sch2) // the racing creator wins
      intercept[java.util.ConcurrentModificationException] {
        cat.commitTransaction(Seq((Seq("ns"), "ctas2",
          RestCommit.createRequirements(),
          RestCommit.concat(RestCommit.createUpdates(stagedRace.metadata),
            RestCommit.updates(stagedRace.metadata, chS().last._2)))))
      }
      assert(cat.loadTable(Seq("ns"), "ctas2")
          .metadata.currentSnapshotId.isEmpty,
        "the losing CTAS's staged data must never be referenced")
      // a data-less staged create still registers (empty table)
      IcebergRestTransaction.createAndCommit(spark, cat, Seq("ns"),
        "ctas_empty", sch2)(_ => ())
      assert(cat.tableExists(Seq("ns"), "ctas_empty"))
      assert(cat.loadTable(Seq("ns"), "ctas_empty")
        .metadata.currentSnapshotId.isEmpty)

      // SINGLE-TABLE endpoint parity (r16): the spec also lets a
      // stage-create finish as ONE CommitTableRequest with
      // assert-create — no transactions endpoint required
      IcebergRestTransaction.createAndCommitSingle(spark, cat, Seq("ns"),
        "ctas_single", sch2)(w => { w.append(o.limit(40)); () })
      assert(cat.tableExists(Seq("ns"), "ctas_single"))
      assert(count("ctas_single") == 40,
        "single-endpoint CTAS data must land with the create")
      // racing creator wins → 409 at assert-create, loser unreferenced
      val stagedS2 = cat.stageCreateTable(Seq("ns"), "ctas_single2", sch2)
      val (wS2, chS2) = IcebergWriter.openStagedMeta(spark, stagedS2.metadata)
      wS2.append(o.limit(5))
      cat.createTable(Seq("ns"), "ctas_single2", sch2)
      intercept[java.util.ConcurrentModificationException] {
        cat.commitTable(Seq("ns"), "ctas_single2",
          RestCommit.createRequirements(),
          RestCommit.concat(RestCommit.createUpdates(stagedS2.metadata),
            RestCommit.updates(stagedS2.metadata, chS2().last._2)))
      }
      assert(cat.loadTable(Seq("ns"), "ctas_single2")
          .metadata.currentSnapshotId.isEmpty,
        "the losing single-endpoint CTAS's staged data must never be referenced")
    } finally server.stop()
  }
}
