package graft.lake.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.lake.{GraftTable, PartitionTransforms, PIdentity}

/** Export a graft table AS a protocol-conforming Delta Lake table — the
  * Delta counterpart of [[graft.lake.iceberg.IcebergExport]] (the
  * reference lists Delta under future support,
  * pg_lakehouse_iceberg/README.md:9; with the read interop this gives
  * graft BOTH directions on a second format). [[DeltaTable]] (and any
  * external Delta reader) consumes the result: %020d.json action log,
  * per-file stats JSON, hive partition dirs, int64-micros timestamps.
  *
  * Design choices, stated:
  *  - **Current-state export, rewriting data** (the IcebergExport
  *    posture): MoR deletes are netted out by `scan()` and final rows
  *    are written as fresh canonical Delta files.
  *  - **Identity partitions carry over; transform partitions do not.**
  *    Delta has no hidden partitioning — `days(ts)`/`bucket(n,c)`/
  *    `truncate(w,c)` specs cannot be expressed in partitionColumns
  *    (generated columns could approximate `days`, but approximating
  *    silently is worse than documenting) — such tables export with
  *    their identity columns only; pruning on the mirror then rides
  *    per-file stats instead of dirs. Correctness is unaffected.
  *  - **Provenance sidecar** `_graft_export.json` records the exported
  *    graft snapshot id — mirror bookkeeping, deliberately OUTSIDE the
  *    Delta log (it is state about the sync, not about the table).
  *
  * The steady-state mirror is [[exportIncremental]]: every graft commit
  * since the last sync folds into exactly TWO Delta commits —
  *  1. a DELETION-VECTOR delete of every key the range touched
  *     ([[DeltaWriter.deleteMatchingDv]] — write cost O(matched rows)
  *     of bitmaps, no file rewrite), then
  *  2. an append of the touched keys' CURRENT rows.
  * Final-state-by-key, so insert-then-delete can't resurrect and an
  * upsert chain lands only its last version (the DV masks the old
  * rows; the append adds fresh files). On a CDF-enabled mirror
  * (`export(enableCdf = true)`) both commits carry their change rows,
  * so downstream consumers can tail the MIRROR's feed
  * (`readStream.format("delta-cdf")`) and see the sync as deletes +
  * inserts — a cross-format CDC relay.
  *
  * At 100 TB: the initial export is one partitioned distributed write +
  * an O(files) driver commit; each sync is O(touched keys) distributed
  * rows (the DV scan reads the mirror once to locate positions — the
  * true cost of a keyed delete on Delta, which has no equality-delete
  * file concept).
  */
object DeltaExport {

  /** Exports `t`'s current snapshot to `dest` (cleared first). */
  def export(spark: SparkSession, t: GraftTable, dest: String,
      enableCdf: Boolean = false): DeltaWriter = {
    val identityParts = PartitionTransforms.parseAll(t.meta.partitionColumns)
      .collect { case PIdentity(c) => c }
    val w = DeltaWriter.create(spark, dest, t.schema,
      partitionColumns = identityParts, enableCdf = enableCdf)
    w.append(t.scan())
    graft.lake.ExportProvenance.write(spark, dest, t.meta.currentSnapshotId)
    w
  }

  /** Folds graft commits since the last export into ≤2 Delta commits
    * (DV-delete touched keys + append their current rows). Returns the
    * number of Delta commits made (0 = already current). */
  def exportIncremental(spark: SparkSession, t: GraftTable, dest: String): Int = {
    val from = graft.lake.ExportProvenance.read(spark, dest)
    val to = t.meta.currentSnapshotId
    if (to == from) return 0
    val keyCols = t.meta.keyColumns
    require(keyCols.nonEmpty,
      "incremental export needs key columns (keyless tables delete " +
        "positionally; positions don't survive the rewrite into Delta files)")
    val w = DeltaWriter.open(spark, dest)
    // pinned: touched keys feed both the DV delete and the current-rows
    // semi-join — one cdc scan + distinct, not one per consumer
    // (commit-sized keys, the IcebergExport posture)
    val touched = t.cdc(from, to).select(keyCols.map(col): _*).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ALWAYS delete the touched keys before re-appending their current
    // rows (the IcebergExport lesson: a pure-append range does not prove
    // the keys are new to the mirror — graft append is not upsert). The
    // DV delete is a no-op mask when the keys are absent.
    w.deleteMatchingDv(touched, keyCols)
    var commits = 1
    val current = t.scan().join(touched, keyCols, "left_semi")
    w.append(current)
    commits += 1
    touched.unpersist(blocking = false)
    graft.lake.ExportProvenance.write(spark, dest, to)
    commits
  }
}
