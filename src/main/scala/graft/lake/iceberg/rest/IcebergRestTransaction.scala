package graft.lake.iceberg.rest

import org.apache.spark.sql.SparkSession

import graft.lake.iceberg.{IceMeta, IcebergWriter}

/** Atomic MULTI-TABLE commits through a standard Iceberg REST catalog
  * (r15): the published protocol's `POST /v1/{prefix}/transactions/
  * commit` (CommitTransactionRequest) — graft's native cross-table
  * transaction semantics (lake_multi_txn) expressed through the
  * catalog, so the ingest+retire pattern works against ANY spec
  * catalog, not only graft-managed tables.
  *
  * Division of labor mirrors single-table REST commits: each table's
  * writer stages data files + manifests straight to table storage (the
  * heavy, arbitrage-free IO), while metadata materialization and
  * arbitration move to the service — here for N tables under ONE
  * arbitration. A 409 means some table's requirement no longer held
  * and NO table moved (all-or-nothing); reopen, rebase, retry.
  *
  * Reference basis: the catalog bridge's transaction surface
  * (pg_lakehouse_iceberg catalog_bridge.h:139-179) — begin/commit over
  * named tables — lifted onto the REST protocol's transaction
  * endpoint. */
object IcebergRestTransaction {

  /** Runs each `op` against a STAGED writer for its table (commits
    * captured, not posted), then sends every captured change as one
    * CommitTransactionRequest. Multiple commits by one op collapse to
    * a single (first-base → last-staged) change — the requirements
    * assert the first base, so the whole chain CASes as a unit.
    * Writer handles are consumed; on ANY failure nothing committed. */
  def commit(spark: SparkSession, catalog: IcebergRestCatalog,
      ops: Seq[((Seq[String], String), IcebergWriter => Unit)]): Unit = {
    require(ops.nonEmpty, "iceberg-rest transaction: no table ops")
    val staged: Seq[(Seq[String], String, Seq[(IceMeta, IceMeta)])] =
      ops.map { case ((ns, name), op) =>
        val (w, changesOf) = IcebergWriter.openRestStaged(spark, catalog, ns, name)
        op(w)
        (ns, name, changesOf())
      }
    val changes = staged.map { case (ns, name, chg) =>
      require(chg.nonEmpty,
        s"iceberg-rest transaction: op for ${ns.mkString(".")}.$name staged no commit")
      // chain collapse: requirements at the FIRST base; updates carry
      // everything from that base to the LAST staged metadata
      (ns, name,
        RestCommit.requirements(chg.head._1),
        RestCommit.updates(chg.head._1, chg.last._2))
    }
    catalog.commitTransaction(changes)
  }

  /** Transactional CTAS through the catalog (r15; the spec's
    * stage-create + assert-create pair): the service returns the
    * would-be metadata WITHOUT registering; `op` stages data files +
    * manifests at the staged location through a capturing writer; ONE
    * transaction carrying assert-create + the creation replay + the
    * data commits then registers the table all-or-nothing. A racing
    * create of the same name 409s the whole transaction and the staged
    * files are never referenced — no half-created table is ever
    * visible. */
  def createAndCommit(spark: SparkSession, catalog: IcebergRestCatalog,
      ns: Seq[String], name: String, schemaJson: String,
      specFieldsJson: Option[String] = None,
      properties: Map[String, String] = Map.empty)(
      op: IcebergWriter => Unit): Unit = {
    val staged = catalog.stageCreateTable(ns, name, schemaJson,
      specFieldsJson, properties)
    val (w, changesOf) = IcebergWriter.openStagedMeta(spark, staged.metadata)
    op(w)
    val chg = changesOf()
    val cur = if (chg.isEmpty) staged.metadata else chg.last._2
    catalog.commitTransaction(Seq((ns, name,
      RestCommit.createRequirements(),
      RestCommit.concat(RestCommit.createUpdates(staged.metadata),
        RestCommit.updates(staged.metadata, cur)))))
  }

  /** [[createAndCommit]] committed through the SINGLE-TABLE endpoint
    * (r16, protocol parity): the spec allows a stage-create to finish
    * as one CommitTableRequest carrying assert-create + the creation
    * replay + the data commits — same all-or-nothing semantics, no
    * transactions endpoint required of the service. A racing create of
    * the same name 409s and the loser's staged files are never
    * referenced. */
  def createAndCommitSingle(spark: SparkSession, catalog: IcebergRestCatalog,
      ns: Seq[String], name: String, schemaJson: String,
      specFieldsJson: Option[String] = None,
      properties: Map[String, String] = Map.empty)(
      op: IcebergWriter => Unit): Unit = {
    val staged = catalog.stageCreateTable(ns, name, schemaJson,
      specFieldsJson, properties)
    val (w, changesOf) = IcebergWriter.openStagedMeta(spark, staged.metadata)
    op(w)
    val chg = changesOf()
    val cur = if (chg.isEmpty) staged.metadata else chg.last._2
    catalog.commitTable(ns, name,
      RestCommit.createRequirements(),
      RestCommit.concat(RestCommit.createUpdates(staged.metadata),
        RestCommit.updates(staged.metadata, cur)))
  }
}
