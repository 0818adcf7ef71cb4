package graft.lake.delta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.{ColStats, DataFileMeta, FilePruner, Meta}

/** Read-only Delta Lake table reader — the SECOND real-format interop
  * surface (the reference lists Delta under future support,
  * pg_lakehouse_iceberg/README.md:9; graft ships it now). Parses the
  * published Delta transaction protocol directly (PROTOCOL.md in the
  * delta-io/delta repository): `_delta_log/%020d.json` commit files of
  * newline-delimited actions (protocol / metaData / add / remove),
  * optionally seeded from a `%020d.checkpoint.parquet` named by
  * `_last_checkpoint`, replayed into the live file set (per path, last
  * action wins). Planning then lowers onto graft's own [[FilePruner]]:
  *
  *  - `partitionValues` become identity partition values (Delta
  *    partitioning IS identity by definition), `stats` JSON min/max/
  *    nullCount become [[ColStats]] — file skipping is the audited walk,
  *    unchanged.
  *  - partition columns are typically NOT stored in the data files; the
  *    scan injects them per file group from `partitionValues` (the
  *    protocol makes the map authoritative), cast to the table schema.
  *  - version time travel replays a log prefix; timestamp time travel
  *    resolves through commit-file modification times (Delta's own
  *    default resolution).
  *
  * Protocol guard: tables that REQUIRE reader features beyond the base
  * protocol (minReaderVersion > 1 — column mapping, deletion vectors,
  * v2 checkpoints) are REJECTED loudly rather than misread: a silently
  * wrong scan is worse than an unsupported-table error.
  *
  * At 100 TB: state reconstruction is O(log actions) driver-side
  * metadata IO (checkpoint-seeded, like Delta's own snapshot code), and
  * the scan is ordinary distributed parquet reads with pushed filters.
  */
final class DeltaTable private (
    spark: SparkSession,
    val location: String,
    val version: Long,
    meta: DeltaTable.DMeta,
    adds: Seq[DeltaTable.AddFile]) {

  def schema: StructType = meta.schema
  def partitionColumns: Seq[String] = meta.partitionColumns

  private def dataSchema: StructType =
    StructType(meta.schema.fields.filterNot(f => meta.partitionColumns.contains(f.name)))

  // ---- planning ------------------------------------------------------------

  private def toDataFileMeta(a: DeltaTable.AddFile): DataFileMeta = {
    val pvals = meta.partitionColumns.flatMap { c =>
      a.partitionValues.get(c).map {
        case null => c -> Meta.NullPartition
        case v    => c -> v
      }
    }.toMap
    DataFileMeta(a.path, 0L, a.numRecords.getOrElse(0L), a.size, pvals, a.stats)
  }

  /** Live data files surviving partition + stats pruning (receipt hook). */
  def planFiles(filter: Option[Column] = None): Seq[String] = {
    val metas = adds.map(a => a.path -> toDataFileMeta(a)).toMap
    FilePruner.prune(metas.values.toSeq, filter,
      meta.partitionColumns, meta.schema).map(_.path)
  }

  // ---- scan ----------------------------------------------------------------

  def scan(filter: Option[Column] = None): DataFrame = {
    val keep = planFiles(filter).toSet
    val live = adds.filter(a => keep(a.path))
    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], meta.schema)
    // partition columns are injected from partitionValues (authoritative
    // per protocol; files usually omit them) — one read per distinct
    // partition-value tuple, then project to the table column order
    val out = live.groupBy(_.partitionValues).toSeq
      .sortBy(_._2.head.path)
      .map { case (pvals, files) =>
        val df = spark.read.schema(dataSchema)
          .parquet(files.map(f => DeltaTable.resolve(location, f.path).toString): _*)
        val withParts = meta.partitionColumns.foldLeft(df) { (d, c) =>
          val dt = meta.schema(c).dataType
          val v = pvals.get(c).orNull
          d.withColumn(c,
            (if (v == null) lit(null) else lit(v)).cast(dt))
        }
        withParts.select(meta.schema.fieldNames.map(col).toIndexedSeq: _*)
      }
      .reduce(_ unionByName _)
    filter.map(out.filter).getOrElse(out)
  }
}

object DeltaTable {

  private val mapper = new ObjectMapper()

  final case class DMeta(
      schema: StructType,
      partitionColumns: Seq[String],
      configuration: Map[String, String])

  final case class AddFile(
      path: String, // table-relative, decoded
      partitionValues: Map[String, String], // null value = null partition
      size: Long,
      numRecords: Option[Long],
      stats: Map[String, ColStats])

  def load(spark: SparkSession, location: String): DeltaTable =
    loadVersion(spark, location, -1L)

  /** Time travel by commit-file modification time (Delta's default
    * timestamp resolution): latest version whose commit mtime <= ts. */
  def loadAsOfTime(spark: SparkSession, location: String, timestampMs: Long): DeltaTable = {
    val conf = spark.sessionState.newHadoopConf()
    val logDir = new Path(location, "_delta_log")
    val fs = logDir.getFileSystem(conf)
    val versions = fs.listStatus(logDir).toSeq
      .flatMap(st => st.getPath.getName match {
        case CommitRe(v) if st.getModificationTime <= timestampMs => Some(v.toLong)
        case _ => None
      })
    require(versions.nonEmpty, s"delta: no commit at or before $timestampMs")
    loadVersion(spark, location, versions.max)
  }

  private val CommitRe = """(\d{20})\.json""".r
  private val CheckpointRe = """(\d{20})\.checkpoint\.parquet""".r

  /** Replay the log up to `versionAsOf` (-1 = latest), seeded from the
    * newest usable checkpoint at or below it. */
  def loadVersion(spark: SparkSession, location: String, versionAsOf: Long): DeltaTable = {
    val conf = spark.sessionState.newHadoopConf()
    val logDir = new Path(location, "_delta_log")
    val fs = logDir.getFileSystem(conf)
    require(fs.exists(logDir), s"delta: no _delta_log under $location")
    val entries = fs.listStatus(logDir).toSeq.map(_.getPath)
    val commits = entries.flatMap(p => p.getName match {
      case CommitRe(v) => Some((v.toLong, p)); case _ => None
    }).sortBy(_._1)
    require(commits.nonEmpty, s"delta: empty log under $location")
    val head = if (versionAsOf >= 0) versionAsOf else commits.map(_._1).max
    require(commits.exists(_._1 == head), s"delta: no commit $head under $location")

    val checkpoints = entries.flatMap(p => p.getName match {
      case CheckpointRe(v) if v.toLong <= head => Some((v.toLong, p)); case _ => None
    }).sortBy(_._1)

    var protoReader = 1
    var protoFeatures: Seq[String] = Nil
    var metaOpt: Option[DMeta] = None
    val live = scala.collection.mutable.LinkedHashMap[String, AddFile]()

    // seed from the newest checkpoint ≤ head, if any
    val cpVersion = checkpoints.lastOption.map { case (v, p) =>
      val cp = spark.read.parquet(p.toString)
      val cols = cp.columns.toSet
      if (cols.contains("protocol")) cp.select("protocol.*").collect().foreach { r =>
        if (!r.isNullAt(r.fieldIndex("minReaderVersion")))
          protoReader = r.getInt(r.fieldIndex("minReaderVersion"))
      }
      if (cols.contains("metaData")) cp.filter(col("metaData").isNotNull)
        .select("metaData.*").collect().foreach { r =>
          metaOpt = Some(parseMetaRow(r))
        }
      if (cols.contains("add")) cp.filter(col("add").isNotNull)
        .select("add.*").collect().foreach { r =>
          val a = parseAddRow(r)
          live(a.path) = a
        }
      v
    }.getOrElse(-1L)

    // replay JSON commits after the checkpoint
    commits.filter { case (v, _) => v > cpVersion && v <= head }.foreach { case (_, p) =>
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.split('\n').filter(_.trim.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("protocol")) {
          protoReader = n.get("protocol").path("minReaderVersion").asInt(1)
          val rf = n.get("protocol").path("readerFeatures")
          if (rf.isArray) {
            val it = rf.elements()
            val b = Seq.newBuilder[String]
            while (it.hasNext) b += it.next().asText()
            protoFeatures = b.result()
          }
        }
        if (n.has("metaData")) metaOpt = Some(parseMetaNode(n.get("metaData")))
        if (n.has("add")) {
          val a = parseAddNode(n.get("add"))
          live(a.path) = a
        }
        if (n.has("remove")) {
          live.remove(decodePath(n.get("remove").path("path").asText()))
        }
      }
    }

    // base-protocol guard: column mapping / deletion vectors / v2
    // checkpoints change what the bytes MEAN — misreading is worse than
    // rejecting (the unsupported-feature posture the protocol mandates)
    require(protoReader <= 1 || (protoReader == 3 && protoFeatures.isEmpty),
      s"delta: minReaderVersion $protoReader" +
        (if (protoFeatures.nonEmpty) s" with readerFeatures $protoFeatures" else "") +
        " requires features this reader does not implement " +
        "(column mapping / deletion vectors / v2 checkpoints)")
    val m = metaOpt.getOrElse(
      throw new IllegalStateException(s"delta: no metaData action in log at $location"))
    require(!m.configuration.get("delta.columnMapping.mode").exists(_ != "none"),
      s"delta: column mapping ${m.configuration("delta.columnMapping.mode")} unsupported")

    new DeltaTable(spark, location, head, m, live.values.toSeq)
  }

  private[delta] def resolve(location: String, rel: String): Path = {
    val hasScheme = rel.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")
    if (hasScheme || rel.startsWith("/")) new Path(rel) else new Path(location, rel)
  }

  /** add.path is RFC 2396 URI-encoded per the protocol. */
  private def decodePath(p: String): String =
    try new java.net.URI(p).getPath match {
      case null => p
      case d    => if (d.startsWith("/") && !p.startsWith("/")) d.stripPrefix("/") else d
    } catch { case _: java.net.URISyntaxException => p }

  private def parseMetaNode(n: JsonNode): DMeta = {
    val schema = DataType.fromJson(n.path("schemaString").asText())
      .asInstanceOf[StructType]
    val parts = {
      val it = n.path("partitionColumns").elements()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next().asText()
      b.result()
    }
    val confMap = {
      val it = n.path("configuration").fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
      b.result()
    }
    DMeta(schema, parts, confMap)
  }

  private def parseMetaRow(r: org.apache.spark.sql.Row): DMeta = {
    def str(f: String) = if (r.schema.fieldNames.contains(f) && !r.isNullAt(r.fieldIndex(f)))
      Some(r.getAs[Any](f)) else None
    val schema = DataType.fromJson(str("schemaString").get.toString).asInstanceOf[StructType]
    val parts = str("partitionColumns")
      .map(_.asInstanceOf[scala.collection.Seq[String]].toSeq).getOrElse(Nil)
    val confMap = str("configuration").map(_.asInstanceOf[Map[String, String]]).getOrElse(Map.empty)
    DMeta(schema, parts, confMap)
  }

  private def parseAddNode(n: JsonNode): AddFile = {
    require(!n.has("deletionVector") || n.get("deletionVector").isNull,
      "delta: deletion vectors unsupported")
    val pvals = {
      val it = n.path("partitionValues").fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
      }
      b.result()
    }
    val (nRec, stats) = n.path("stats") match {
      case s if s.isTextual && s.asText().nonEmpty => parseStats(s.asText())
      case _ => (None, Map.empty[String, ColStats])
    }
    AddFile(decodePath(n.path("path").asText()), pvals,
      n.path("size").asLong(0L), nRec, stats)
  }

  private def parseAddRow(r: org.apache.spark.sql.Row): AddFile = {
    val idx = r.schema.fieldNames.zipWithIndex.toMap
    val pvals = r.getAs[Map[String, String]]("partitionValues")
    val statsJson = idx.get("stats").filterNot(r.isNullAt).map(r.getString)
    val (nRec, stats) = statsJson.map(parseStats).getOrElse(
      (None, Map.empty[String, ColStats]))
    AddFile(decodePath(r.getAs[String]("path")),
      if (pvals == null) Map.empty else pvals,
      r.getAs[Long]("size"), nRec, stats)
  }

  /** Delta per-file stats JSON → graft ColStats. Only top-level columns
    * with both bounds present; tag by JSON value shape (the same l/d/s
    * domain FilePruner compares in). Date strings become epoch days —
    * the form graft stores for DateType stats. */
  private[delta] def parseStats(json: String): (Option[Long], Map[String, ColStats]) = {
    val n = try mapper.readTree(json) catch { case _: Throwable => return (None, Map.empty) }
    val nRec = if (n.has("numRecords")) Some(n.get("numRecords").asLong()) else None
    def bound(node: JsonNode): Option[(String, String)] = node match {
      case v if v.isIntegralNumber => Some(("l", v.asLong().toString))
      case v if v.isFloatingPointNumber => Some(("d", v.asDouble().toString))
      case v if v.isTextual =>
        val s = v.asText()
        // ISO date → epoch-day long (graft's DateType stat domain);
        // other strings stay strings (ASCII only, like the parquet path)
        if (s.matches("""\d{4}-\d{2}-\d{2}"""))
          Some(("l", java.time.LocalDate.parse(s).toEpochDay.toString))
        else if (s.forall(_ <= 127)) Some(("s", s))
        else None
      case _ => None
    }
    val nulls = scala.collection.mutable.Map[String, Long]()
    val it0 = n.path("nullCount").fields()
    while (it0.hasNext) {
      val e = it0.next()
      if (e.getValue.isIntegralNumber) nulls(e.getKey) = e.getValue.asLong()
    }
    val mins = scala.collection.mutable.Map[String, (String, String)]()
    val it1 = n.path("minValues").fields()
    while (it1.hasNext) {
      val e = it1.next(); bound(e.getValue).foreach(mins(e.getKey) = _)
    }
    val out = scala.collection.mutable.Map[String, ColStats]()
    val it2 = n.path("maxValues").fields()
    while (it2.hasNext) {
      val e = it2.next()
      for {
        (tagHi, hi) <- bound(e.getValue)
        (tagLo, lo) <- mins.get(e.getKey)
        if tagLo == tagHi
      } out(e.getKey) = ColStats(tagLo, lo, hi, nulls.getOrElse(e.getKey, 0L))
    }
    (nRec, out.toMap)
  }
}
