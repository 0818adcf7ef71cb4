package graft.lake.hudi

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.{DataFileMeta, FilePruner, Meta}

/** Read-only Apache Hudi COPY_ON_WRITE table reader — the third
  * real-format interop surface (with Delta, this completes the
  * reference's "future support" list, pg_lakehouse_iceberg/README.md:9).
  * Parses the published Hudi table layout directly:
  *
  *  - `.hoodie/hoodie.properties` (table type / partition fields;
  *    MERGE_ON_READ is REJECTED loudly — log-file merging is different
  *    semantics, and misreading base files only would silently drop
  *    updates).
  *  - the timeline: `<instant>.commit` files of COMPLETED commits, JSON
  *    `partitionToWriteStats` naming every written file — state is
  *    timeline-driven, NO directory listing of data dirs (the same
  *    O(metadata) posture as the Iceberg/Delta readers; data-dir listing
  *    is exactly what Hudi's timeline exists to avoid).
  *  - FILE SLICES: data files are `<fileId>_<writeToken>_<instant>.parquet`;
  *    a COW upsert rewrites a file group as a NEW slice of the same
  *    fileId at a later instant, and the snapshot is the LATEST slice
  *    per file group. Time travel reads the latest slice ≤ an instant.
  *
  * Schema derives from the newest slice's parquet footer minus the five
  * `_hoodie_*` meta columns — self-describing, no Avro schema-registry
  * dependency. Partition pruning lowers hive-style partition dirs onto
  * [[FilePruner]] identity pruning.
  */
final class HudiTable private (
    spark: SparkSession,
    val location: String,
    val schema: StructType,
    partitionFields: Seq[String],
    slices: Seq[HudiTable.Slice]) { // latest slice per file group

  def partitionColumns: Seq[String] = partitionFields

  private def toDataFileMeta(s: HudiTable.Slice): DataFileMeta = {
    val pvals = s.partitionPath.split("/").filter(_.contains("=")).map { seg =>
      val eq = seg.indexOf('=')
      seg.substring(0, eq) ->
        (if (seg.substring(eq + 1) == "__HIVE_DEFAULT_PARTITION__") Meta.NullPartition
         else seg.substring(eq + 1))
    }.toMap
    DataFileMeta(s.path, 0L, s.numWrites, 0L, pvals, Map.empty)
  }

  /** Live file slices surviving partition pruning (receipt hook). */
  def planFiles(filter: Option[Column] = None): Seq[String] = {
    val metas = slices.map(toDataFileMeta)
    FilePruner.prune(metas, filter, partitionFields, schema).map(_.path)
  }

  def scan(filter: Option[Column] = None): DataFrame = {
    val keep = planFiles(filter).toSet
    val live = slices.filter(s => keep(s.path))
    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val out = spark.read.schema(schema)
      .parquet(live.map(s => new Path(location, s.path).toString): _*)
    filter.map(out.filter).getOrElse(out)
  }
}

object HudiTable {

  private val mapper = new ObjectMapper()

  final case class Slice(fileId: String, instant: String,
      partitionPath: String, path: String, numWrites: Long)

  val MetaColumns: Seq[String] = Seq("_hoodie_commit_time",
    "_hoodie_commit_seqno", "_hoodie_record_key",
    "_hoodie_partition_path", "_hoodie_file_name")

  def load(spark: SparkSession, location: String): HudiTable =
    loadAsOf(spark, location, instant = null)

  /** Snapshot as of `instant` (inclusive; null = latest). */
  def loadAsOf(spark: SparkSession, location: String, instant: String): HudiTable = {
    val conf = spark.sessionState.newHadoopConf()
    val meta = new Path(location, ".hoodie")
    val fs = meta.getFileSystem(conf)
    require(fs.exists(meta), s"hudi: no .hoodie under $location")

    val props = new java.util.Properties()
    val pin = fs.open(new Path(meta, "hoodie.properties"))
    try props.load(pin) finally pin.close()
    val tableType = props.getProperty("hoodie.table.type", "COPY_ON_WRITE")
    require(tableType == "COPY_ON_WRITE",
      s"hudi: table type $tableType unsupported (MERGE_ON_READ needs " +
        "log-file merging; reading base files only would drop updates)")
    val partitionFields = Option(props.getProperty("hoodie.table.partition.fields"))
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)

    val timeline = fs.listStatus(meta).toSeq.map(_.getPath)

    // replay only understands `.commit` instants. Completed instants
    // that CHANGE which file groups are live — `.replacecommit`
    // (clustering, insert_overwrite, delete_partition; all legal on
    // COPY_ON_WRITE tables), `.savepoint`, `.restore` — must be
    // rejected loudly, mirroring the MERGE_ON_READ posture: silently
    // ignoring them would keep replaced file groups live and return
    // stale pre-overwrite data.
    val UnsupportedRe = """\d+\.(replacecommit|savepoint|restore)""".r
    val unsupported = timeline.map(_.getName).collect {
      case n @ UnsupportedRe(kind) => s"$n ($kind)"
    }
    require(unsupported.isEmpty,
      s"hudi: timeline has completed instants this reader does not " +
        s"replay — ${unsupported.mkString(", ")}; reading through them " +
        "would return stale/replaced file groups")

    val CommitRe = """(\d+)\.commit""".r
    val commits = timeline
      .flatMap(p => p.getName match {
        case CommitRe(t) if instant == null || t <= instant => Some((t, p))
        case _ => None
      }).sortBy(_._1)
    require(commits.nonEmpty, s"hudi: no completed commits under $location" +
      (if (instant != null) s" at or before $instant" else ""))

    // timeline replay: latest slice per file group wins
    val groups = scala.collection.mutable.LinkedHashMap[String, Slice]()
    commits.foreach { case (t, p) =>
      val in = fs.open(p)
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val n = mapper.readTree(json)
      val parts = n.path("partitionToWriteStats").fields()
      while (parts.hasNext) {
        val e = parts.next()
        val it = e.getValue.elements()
        while (it.hasNext) {
          val st = it.next()
          val fileId = st.path("fileId").asText()
          val s = Slice(fileId, t, e.getKey,
            st.path("path").asText(), st.path("numWrites").asLong(0L))
          // commits replay in instant order, so a later slice replaces
          groups(fileId) = s
        }
      }
    }
    val slices = groups.values.toSeq

    // schema: newest slice's footer minus hudi meta columns
    val sample = new Path(location, slices.maxBy(_.instant).path)
    val full = spark.read.parquet(sample.toString).schema
    val schema = StructType(full.fields.filterNot(f => MetaColumns.contains(f.name)))

    new HudiTable(spark, location, schema, partitionFields, slices)
  }
}
