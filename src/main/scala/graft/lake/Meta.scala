package graft.lake

/** Metadata model for the graft lake table format.
  *
  * Deliberately Iceberg-shaped (cf. the reference's table metadata +
  * snapshot machinery, pg_lakehouse_iceberg/src/operations/commit_ops.c:41-86
  * and src/catalog/pg_catalog.cpp) but self-contained: one JSON document per
  * metadata version carries the *complete* table state — schema, partition
  * spec, and the full snapshot log where each snapshot lists its data and
  * delete files with per-column stats. This keeps scan planning a pure
  * driver-side O(files) metadata read (like Iceberg's planFiles): at 100 TB
  * the metadata for ~100k files is a few MB of JSON, and no data ever flows
  * through the driver.
  *
  * Sequence-number semantics follow Iceberg v2 equality deletes: a delete
  * file with sequence number t applies to data files with sequence s < t.
  * We use the snapshot id as the sequence number (ids are a dense 1..N
  * ordinal, so they double as commit order).
  */

/** Per-column min/max/null stats extracted from parquet footers at commit
  * time. `tag` picks the comparison domain: "l" = integral (long; also date
  * days / timestamp micros), "d" = floating, "s" = UTF-8 string. min/max are
  * stored as strings so the JSON codec never guesses numeric widths.
  */
case class ColStats(tag: String, min: String, max: String, nulls: Long)

case class DataFileMeta(
    path: String,           // relative to table location, e.g. data/[p=v/]s1-f<nonce>-00000.parquet
    seq: Long,              // sequence number = id of the committing snapshot
    rowCount: Long,
    sizeBytes: Long,
    partitionValues: Map[String, String], // hive-style; NULL_PARTITION for null
    stats: Map[String, ColStats])

case class DeleteFileMeta(
    path: String,
    seq: Long,
    rowCount: Long)

case class Snapshot(
    id: Long,               // dense ordinal, 1-based; doubles as sequence number
    parentId: Long,         // -1 for the first snapshot
    timestampMs: Long,
    operation: String,      // append | delete | update | replace
    dataFiles: Seq[DataFileMeta],
    deleteFiles: Seq[DeleteFileMeta])

case class TableMetadata(
    formatVersion: Int,
    version: Long,          // metadata version (vN.json)
    schemaDdl: String,      // Spark DDL, parsed with StructType.fromDDL
    partitionColumns: Seq[String],
    keyColumns: Seq[String],// equality-delete key (MoR delete/update)
    currentSnapshotId: Long,// -1 if no snapshot yet
    snapshots: Seq[Snapshot],
    properties: Map[String, String] = Map.empty) { // table properties (Iceberg-style)

  /** null-safe properties (metadata written before the field existed
    * deserializes it as null). */
  def props: Map[String, String] =
    if (properties == null) Map.empty else properties

  def snapshot(id: Long): Snapshot =
    snapshots.find(_.id == id).getOrElse(
      throw new IllegalArgumentException(s"no snapshot $id; have ${snapshots.map(_.id).mkString(",")}"))

  def currentSnapshot: Option[Snapshot] =
    if (currentSnapshotId < 0) None else Some(snapshot(currentSnapshotId))
}

object Meta {
  val NullPartition = "__HIVE_DEFAULT_PARTITION__"

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  def toJson(m: TableMetadata): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(m)

  def fromJson(s: String): TableMetadata =
    mapper.readValue(s, classOf[TableMetadata])
}
