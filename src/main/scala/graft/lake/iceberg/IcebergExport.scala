package graft.lake.iceberg

import org.apache.spark.sql.SparkSession

import graft.lake.{GraftTable, PartitionTransforms, PBucket, PDays, PIdentity, PTruncate}

/** Export a graft table AS a spec-conforming Apache Iceberg v2 table —
  * the write half of the reference's Iceberg bridge
  * (pg_lakehouse_iceberg/src/bridge/iceberg_bridge.h:405-449
  * writer_create/append_batch/finish; commit path
  * src/operations/commit_ops.c). [[IcebergTable]] (and any external
  * engine: Spark+Iceberg, duckdb-iceberg, Trino) can read the result —
  * parquet data files carry spec field ids, manifests/manifest lists are
  * v2 Avro with sequence-number inheritance, and the partition layout is
  * recomputed with the SPEC's transforms.
  *
  * Design choices, stated:
  *  - **Current-state export, rewriting data.** The source's MoR
  *    equality/position deletes are netted out by `scan()` and the final
  *    rows are written as fresh Iceberg data files. A zero-copy
  *    metadata-only export (manifests pointing at graft's existing
  *    parquet) would be cheaper but NOT spec-clean: graft data files
  *    lack parquet field ids, so id-based readers would need a
  *    name-mapping property — interop surface is the point here, so the
  *    export pays one distributed pass to produce canonical files.
  *  - **Partition spec carries over** (graft spec strings → Iceberg
  *    transforms). Bucket values are recomputed with the Iceberg spec's
  *    Murmur3 bucket hash ([[IcebergTransforms.bucket]]): graft's own
  *    bucketing uses Spark's hash, which spec-conforming readers must
  *    not see in an Iceberg layout.
  *  - **Provenance tag** `graft-snapshot-<id>` pins which graft snapshot
  *    was exported, so incremental re-exports can diff against it.
  *
  * At 100 TB the export is one partitioned distributed write (the same
  * shuffle shape as the table's own hash-distributed append) plus an
  * O(files) driver-side commit — no driver data materialization.
  */
object IcebergExport {

  /** Exports `t`'s current snapshot to `dest` (cleared first). Returns
    * the writer handle (metadata view + further commits if needed). */
  def export(spark: SparkSession, t: GraftTable, dest: String): IcebergWriter = {
    val partition = PartitionTransforms.parseAll(t.meta.partitionColumns).map {
      case PIdentity(c)    => c -> "identity"
      case PDays(c)        => c -> "day"
      case PBucket(n, c)   => c -> s"bucket[$n]"
      case PTruncate(w, c) => c -> s"truncate[$w]"
    }
    val w = IcebergWriter.create(spark, dest, t.schema, partition)
    val snapId = w.append(t.scan())
    w.tag(s"graft-snapshot-${t.meta.currentSnapshotId}", snapId)
    w
  }
}
