package graft.lake.iceberg.rest

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.lake.iceberg.{IceMeta, IceRef, IcebergMeta}

/** Translates a committer's staged state into the Iceberg REST commit
  * body: `requirements` assert the base the writer built on (table uuid +
  * main-ref position — the optimistic-concurrency guard every standard
  * catalog validates), and `updates` are the METADATA DIFF base→current
  * expressed in the spec's update actions. The catalog, not the engine,
  * materializes the resulting metadata.json — the REST protocol's
  * division of labor (the engine wrote only data files + manifests). */
object RestCommit {

  private val mapper = new ObjectMapper()

  /** The STAGED-CREATE commit shape (r15): `assert-create` (the table
    * must not exist) + updates replaying the staged metadata's creation
    * over the service's empty seed — set-location first (a staged
    * custom location must not depend on the service re-deriving it),
    * then uuid / format-version / schemas / specs / properties. A
    * transaction then appends the data commits' updates after these. */
  def createRequirements(): ArrayNode = {
    val arr = mapper.createArrayNode()
    arr.addObject().put("type", "assert-create")
    arr
  }

  def createUpdates(staged: IceMeta): ArrayNode = {
    val arr = mapper.createArrayNode()
    def add(action: String): ObjectNode = {
      val o = arr.addObject(); o.put("action", action); o
    }
    add("set-location").put("location", staged.location)
    add("assign-uuid").put("uuid", staged.uuid)
    if (staged.formatVersion > 2)
      add("upgrade-format-version").put("format-version", staged.formatVersion)
    staged.schemas.foreach { s =>
      val o = add("add-schema")
      o.set[ObjectNode]("schema", IcebergMeta.renderSchemaNode(s))
      o.put("last-column-id", staged.lastColumnId)
    }
    add("set-current-schema").put("schema-id", staged.currentSchemaId)
    staged.specs.filterNot(sp => sp.specId == 0 && sp.fields.isEmpty)
      .foreach(sp =>
        add("add-spec").set[ObjectNode]("spec", IcebergMeta.renderSpecNode(sp)))
    if (staged.specs.exists(sp => sp.specId == staged.defaultSpecId && sp.fields.nonEmpty))
      add("set-default-spec").put("spec-id", staged.defaultSpecId)
    if (staged.properties.nonEmpty) {
      val o = add("set-properties").putObject("updates")
      staged.properties.toSeq.sortBy(_._1).foreach { case (k, v) => o.put(k, v) }
    }
    arr
  }

  /** Concatenate update arrays (creation replay + data-commit diff). */
  def concat(a: ArrayNode, b: ArrayNode): ArrayNode = {
    val out = mapper.createArrayNode()
    out.addAll(a); out.addAll(b)
    out
  }

  /** assert-table-uuid + assert-ref-snapshot-id(main) at the base state;
    * a null snapshot-id asserts the ref did not exist yet (first commit). */
  def requirements(base: IceMeta): ArrayNode = {
    val arr = mapper.createArrayNode()
    val u = arr.addObject()
    u.put("type", "assert-table-uuid"); u.put("uuid", base.uuid)
    val r = arr.addObject()
    r.put("type", "assert-ref-snapshot-id"); r.put("ref", "main")
    base.refs.get("main").map(_.snapshotId).orElse(base.currentSnapshotId) match {
      case Some(id) => r.put("snapshot-id", id)
      case None => r.putNull("snapshot-id")
    }
    arr
  }

  /** main is implicit when a table tracks only current-snapshot-id — the
    * spec models "current" AS the main branch ref. */
  private def refsOf(m: IceMeta): Map[String, IceRef] =
    m.refs ++ m.currentSnapshotId
      .filterNot(_ => m.refs.contains("main"))
      .map(id => "main" -> IceRef(id, "branch")).toMap

  def updates(base: IceMeta, cur: IceMeta): ArrayNode = {
    // LOUD completeness guard: this diff models schemas / partition
    // specs / snapshots / refs / properties / format-version (+
    // snapshot-log reconstruction server-side). Any writer mutation
    // OUTSIDE that set would otherwise vanish silently at the catalog —
    // and invisibly, because the writer adopts the catalog's committed
    // metadata as its new truth. Refuse instead, naming the change.
    def unchanged(what: String, b: Any, c: Any): Unit =
      require(b == c, s"iceberg-rest: $what changed ($b -> $c) — this " +
        "metadata change has no REST update action translation; commit " +
        "it through a location-based writer or extend RestCommit.updates")
    unchanged("table uuid", base.uuid, cur.uuid)
    unchanged("table location", base.location, cur.location)
    // v3 row lineage advances next-row-id on every append; the REST
    // spec has no update action carrying it, so a lineage write through
    // this path would silently lose lineage at the catalog (r16,
    // advice). Refuse loudly instead — lineage tables commit through a
    // location-based writer.
    unchanged("next-row-id (v3 row lineage; no REST update action)",
      base.nextRowId, cur.nextRowId)
    if (cur.specs == base.specs)
      unchanged("last-partition-id (without an add-spec to carry it)",
        base.lastPartitionId, cur.lastPartitionId)
    if (cur.schemas == base.schemas)
      unchanged("last-column-id (without an add-schema to carry it)",
        base.lastColumnId, cur.lastColumnId)
    val arr = mapper.createArrayNode()
    def add(action: String): ObjectNode = {
      val o = arr.addObject(); o.put("action", action); o
    }
    if (cur.formatVersion != base.formatVersion)
      add("upgrade-format-version").put("format-version", cur.formatVersion)
    // schema evolution: new schema ids + current pointer
    cur.schemas.filterNot(s => base.schemas.exists(_.schemaId == s.schemaId))
      .foreach { s =>
        val o = add("add-schema")
        o.set[ObjectNode]("schema", IcebergMeta.renderSchemaNode(s))
        o.put("last-column-id", cur.lastColumnId)
      }
    if (cur.currentSchemaId != base.currentSchemaId)
      add("set-current-schema").put("schema-id", cur.currentSchemaId)
    // partition evolution: new spec ids + default pointer (the spec's
    // add-spec / set-default-spec actions; the service recomputes
    // last-partition-id from the added fields)
    cur.specs.filterNot(sp => base.specs.exists(_.specId == sp.specId))
      .foreach(sp =>
        add("add-spec").set[ObjectNode]("spec", IcebergMeta.renderSpecNode(sp)))
    if (cur.defaultSpecId != base.defaultSpecId)
      add("set-default-spec").put("spec-id", cur.defaultSpecId)
    // snapshots: additions before ref moves (a ref can only target a
    // known snapshot), removals last (a removal may orphan old targets)
    val baseIds = base.snapshots.map(_.id).toSet
    cur.snapshots.filterNot(s => baseIds(s.id)).foreach { s =>
      add("add-snapshot").set[ObjectNode]("snapshot", IcebergMeta.renderSnapshot(s))
    }
    val curIds = cur.snapshots.map(_.id).toSet
    val bRefs = refsOf(base)
    val cRefs = refsOf(cur)
    cRefs.toSeq.sortBy(_._1).foreach { case (name, ref) =>
      if (!bRefs.get(name).contains(ref)) {
        val o = add("set-snapshot-ref")
        o.put("ref-name", name)
        o.put("snapshot-id", ref.snapshotId)
        o.put("type", ref.refType)
      }
    }
    bRefs.keys.toSeq.sorted.filterNot(cRefs.contains)
      .foreach(n => add("remove-snapshot-ref").put("ref-name", n))
    val removed = base.snapshots.map(_.id).filterNot(curIds)
    if (removed.nonEmpty) {
      val ids = add("remove-snapshots").putArray("snapshot-ids")
      removed.foreach(ids.add)
    }
    // properties
    val setProps = cur.properties.filter { case (k, v) =>
      !base.properties.get(k).contains(v) }
    if (setProps.nonEmpty) {
      val o = add("set-properties").putObject("updates")
      setProps.toSeq.sortBy(_._1).foreach { case (k, v) => o.put(k, v) }
    }
    val removedProps = base.properties.keys.toSeq.sorted
      .filterNot(cur.properties.contains)
    if (removedProps.nonEmpty) {
      val a = add("remove-properties").putArray("removals")
      removedProps.foreach(a.add)
    }
    arr
  }
}
