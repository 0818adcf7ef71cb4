package graft.lake.hudi

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, countDistinct, lit, when}

import graft.lake.{GraftTable, PartitionTransforms, PIdentity}

/** Export a graft table AS a layout-conforming Apache Hudi MERGE_ON_READ
  * table — the third leg of the write-interop triangle (with
  * [[graft.lake.iceberg.IcebergExport]] and
  * [[graft.lake.delta.DeltaExport]], graft mirrors OUT to every format
  * it reads). [[HudiTable]] (and any Hudi reader) consumes the result:
  * `.hoodie` timeline, `fileId_token_instant` base files with the five
  * `_hoodie_*` meta columns, hive partition dirs, HoodieLogFormat delta
  * blocks.
  *
  * MERGE_ON_READ is the deliberate choice for a mirror: each
  * incremental sync lands as LOG-FILE APPENDS on the touched file
  * groups (Hudi's own steady-state ingest shape) — base files are never
  * rewritten by a sync, and a standard `compact()` folds deltas when
  * the read amplification warrants it.
  *
  * Identity partitions carry over as hive dirs; transform partitions
  * (`days`/`bucket`/`truncate`) are not expressible in Hudi's
  * hive-style layout and export with identity columns only (documented,
  * same posture as DeltaExport). Provenance rides the same
  * `_graft_export.json` sidecar ([[graft.lake.ExportProvenance]]).
  *
  * Each sync folds the range's graft commits FINAL-STATE-BY-KEY into
  * ≤2 deltacommits:
  *  1. `upsertLog` of the touched keys' current rows (log records on
  *     existing groups; new base groups for new keys), then
  *  2. `deleteMatchingLog` of touched keys with NO current row
  *     (`_hoodie_is_deleted` log records; skipped when none).
  * Insert-then-delete inside the range cannot resurrect (no current
  * row to upsert; the delete record masks any mirror state); an upsert
  * chain lands only its last version (latest-per-key merge order).
  */
object HudiExport {

  /** A keyed Hudi table stores ONE row per record key; a graft source
    * holding several current rows under one key (blind appends allow it)
    * cannot be mirrored faithfully — the merge would silently collapse
    * them (caught by the r10 sf0.1 gate: an appended duplicate of key 0
    * lost a row). Refuse loudly, naming a witness key. One aggregate job
    * over the rows being written (count vs distinct-key count). */
  private def requireUniqueKeys(df: org.apache.spark.sql.DataFrame,
      key: String, what: String): Long = {
    // count nulls explicitly: countDistinct IGNORES nulls, so a single
    // null-key row would trip the mismatch branch yet leave the
    // duplicate-witness query empty (head() on nothing) — report the
    // null key as its own named refusal instead of an unrelated crash
    val r = df.agg(count(lit(1)).as("n"),
      countDistinct(col(key)).as("k"),
      count(when(col(key).isNull, 1)).as("nulls")).head()
    if (r.getLong(2) > 0)
      throw new IllegalStateException(
        s"hudi export: $what has ${r.getLong(2)} rows with a NULL record " +
          s"key ($key) — a keyed Hudi table cannot address them")
    if (r.getLong(0) != r.getLong(1)) {
      val witness = df.groupBy(col(key)).count()
        .filter(col("count") > 1).select(col(key)).head().get(0)
      throw new IllegalStateException(
        s"hudi export: $what has ${r.getLong(0) - r.getLong(1)} duplicate-key " +
          s"rows (e.g. $key=$witness) — a keyed Hudi table cannot represent " +
          "them; deduplicate the source or mirror to a row-based format")
    }
    r.getLong(0) // row count — callers fold their emptiness probe into this pass
  }

  /** Exports `t`'s current snapshot to `dest` (cleared first). Requires
    * a SINGLE key column (Hudi's record key; composite keys would need
    * the key-generator machinery this writer doesn't model). */
  def export(spark: SparkSession, t: GraftTable, dest: String): HudiWriter = {
    val keyCols = t.meta.keyColumns
    require(keyCols.size == 1,
      s"hudi export needs exactly one key column, got $keyCols")
    val identityParts = PartitionTransforms.parseAll(t.meta.partitionColumns)
      .collect { case PIdentity(c) => c }
    // validate BEFORE create: HudiWriter.create clears dest, so a refused
    // export must not have destroyed the previous good mirror first
    requireUniqueKeys(t.scan(), keyCols.head, "source snapshot")
    val w = HudiWriter.create(spark, dest, t.schema,
      partitionFields = identityParts, keyField = keyCols.head,
      tableType = "MERGE_ON_READ")
    w.insert(t.scan())
    graft.lake.ExportProvenance.write(spark, dest, t.meta.currentSnapshotId)
    w
  }

  /** Folds graft commits since the last export into ≤2 deltacommits
    * (upsertLog current rows of touched keys + soft-delete the gone
    * ones). Returns the number of Hudi commits made (0 = current). */
  def exportIncremental(spark: SparkSession, t: GraftTable, dest: String): Int = {
    val from = graft.lake.ExportProvenance.read(spark, dest)
    val to = t.meta.currentSnapshotId
    if (to == from) return 0
    val keyCols = t.meta.keyColumns
    require(keyCols.size == 1,
      s"hudi export needs exactly one key column, got $keyCols")
    val key = keyCols.head
    val w = HudiWriter.open(spark, dest)
    // touched keys feed THREE consumers (the current-rows semi-join, the
    // gone-keys anti-join, and through them every ingest pass below) and
    // `current` feeds FOUR (emptiness probe, unique-key validation, the
    // upsert routing join, the fresh-key anti-join) — pin both so the cdc
    // scan and the snapshot semi-join run once, not once per consumer.
    // Both frames are sync-range-sized (touched keys / their current
    // rows), the bounded-artifact class a mirror refresh is allowed to
    // hold — never O(table).
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val touched = t.cdc(from, to).select(col(key)).distinct().persist(mem)
    val current = t.scan().join(touched, Seq(key), "left_semi").persist(mem)
    var commits = 0
    // the emptiness probe rides the unique-key validation aggregate — an
    // empty sync range reads count 0 from the same single pass (the old
    // separate isEmpty re-ran the whole cdc+semi-join chain)
    if (requireUniqueKeys(current, key, "sync range's current rows") > 0) {
      w.upsertLog(current)
      commits += 1
    }
    // touched keys with no current row are deletions; deleteMatchingLog
    // already no-ops (null) on zero matches, so no pre-probe
    val gone = touched.join(t.scan().select(col(key)), Seq(key), "left_anti")
    if (w.deleteMatchingLog(gone, key) != null) commits += 1
    current.unpersist(blocking = false)
    touched.unpersist(blocking = false)
    graft.lake.ExportProvenance.write(spark, dest, to)
    commits
  }
}
