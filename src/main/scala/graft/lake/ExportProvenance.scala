package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Mirror-sync bookkeeping shared by every format export
  * (IcebergExport keeps provenance in native snapshot TAGS — the one
  * format with a ref concept; Delta and Hudi have none, so their
  * mirrors record the last exported graft snapshot in this sidecar,
  * deliberately OUTSIDE the table's own log: it is state about the
  * sync, not about the table). */
object ExportProvenance {

  val FileName = "_graft_export.json"

  def write(spark: SparkSession, dest: String, snapshot: Long): Unit = {
    val p = new Path(dest, FileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s"""{"graft_snapshot": $snapshot}""".getBytes("UTF-8"))
    finally out.close()
  }

  def read(spark: SparkSession, dest: String): Long = {
    val p = new Path(dest, FileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p),
      s"$dest has no $FileName provenance sidecar — run export() first")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(text).get("graft_snapshot").asLong()
  }
}
