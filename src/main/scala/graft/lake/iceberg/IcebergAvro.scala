package graft.lake.iceberg

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import scala.jdk.CollectionConverters._

/** Avro codec for Iceberg manifest lists and manifest files (table spec
  * "Manifests" / "Manifest Lists" sections; the same layer the reference
  * reads through iceberg-cpp's avro_register.cpp).
  *
  * READ is writer-schema-driven: `DataFileStream` decodes with the schema
  * embedded in the file, and fields are pulled BY NAME with v1/v2 aliases
  * and absent-field defaults — so v1 manifests (no sequence numbers, no
  * content codes) and v2 manifests decode through one path. Integer-keyed
  * maps (column bounds/counts) arrive either as true Avro maps (string
  * keys) or as the spec's array<record{key,value}> logical-map form; both
  * are handled.
  *
  * WRITE emits the v2 schemas with the spec's field-ids attached, so other
  * readers can resolve columns by id. Only the fields graft writes are
  * declared; all optional spec fields are declared nullable.
  */
object IcebergAvro {

  // ---- generic helpers -----------------------------------------------------

  private def str(v: AnyRef): String = if (v == null) null else v.toString

  private def opt(r: GenericRecord, names: String*): Option[AnyRef] =
    names.collectFirst {
      case n if r.getSchema.getField(n) != null && r.get(n) != null => r.get(n)
    }

  private def optLong(r: GenericRecord, names: String*): Option[Long] =
    opt(r, names: _*).map(_.asInstanceOf[Number].longValue())

  private def optInt(r: GenericRecord, names: String*): Option[Int] =
    opt(r, names: _*).map(_.asInstanceOf[Number].intValue())

  /** Integer-keyed map field: true Avro map (utf8 keys) or logical-map
    * array<record{key,value}>. */
  private def intKeyMap(v: AnyRef): Map[Int, AnyRef] = v match {
    case null => Map.empty
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => k.toString.toInt -> vv.asInstanceOf[AnyRef] }.toMap
    case a: java.util.Collection[_] =>
      a.asScala.map { e =>
        val r = e.asInstanceOf[GenericRecord]
        r.get("key").asInstanceOf[Number].intValue() -> r.get("value")
      }.toMap
    case _ => Map.empty
  }

  private def bytesOf(v: AnyRef): Array[Byte] = v match {
    case null => null
    case b: java.nio.ByteBuffer =>
      val d = new Array[Byte](b.remaining()); b.duplicate().get(d); d
    case f: GenericData.Fixed => f.bytes()
    case b: Array[Byte] => b
    case _ => null
  }

  // ---- manifest list (read) ------------------------------------------------

  /** One manifest-list entry. `content`: 0 = data manifests, 1 = delete
    * manifests. `sequenceNumber` is the seq assigned when the manifest was
    * ADDED (inherited by its null-seq entries); v1 lists carry 0. */
  final case class ManifestFileEntry(
      path: String,
      length: Long,
      specId: Int,
      content: Int,
      sequenceNumber: Long,
      minSequenceNumber: Long,
      addedSnapshotId: Long,
      addedFiles: Int,
      existingFiles: Int,
      deletedFiles: Int,
      partitions: Seq[FieldSummary],
      /** v3 row lineage: first row id available to this manifest's
        * ADDED entries (null-entry inheritance base). */
      firstRowId: Option[Long] = None)

  /** Per-partition-field summary in a manifest-list entry (positional:
    * i-th summary describes the i-th partition field of the manifest's
    * spec). Bounds are spec single-value bytes of the transformed value. */
  final case class FieldSummary(
      containsNull: Boolean,
      containsNan: Option[Boolean],
      lowerBound: Option[Array[Byte]],
      upperBound: Option[Array[Byte]])

  def readManifestList(conf: Configuration, path: Path): Seq[ManifestFileEntry] =
    readManifestListWithRows(conf, path).map(_._1)

  /** Manifest-list entries WITH their (added, existing, deleted) row
    * counts — the writer's carried list state, so [[IcebergWriter.open]]
    * can resume committing against an existing table without re-reading
    * every manifest to recount rows. */
  def readManifestListWithRows(conf: Configuration,
      path: Path): Seq[(ManifestFileEntry, (Long, Long, Long))] =
    readRecords(conf, path) { r =>
      val partitions = opt(r, "partitions") match {
        case Some(a: java.util.Collection[_]) => a.asScala.map { e =>
          val s = e.asInstanceOf[GenericRecord]
          FieldSummary(
            opt(s, "contains_null").exists(_.asInstanceOf[Boolean]),
            opt(s, "contains_nan").map(_.asInstanceOf[Boolean]),
            Option(bytesOf(opt(s, "lower_bound").orNull)),
            Option(bytesOf(opt(s, "upper_bound").orNull)))
        }.toSeq
        case _ => Nil
      }
      val entry = ManifestFileEntry(
        str(r.get("manifest_path")),
        optLong(r, "manifest_length").getOrElse(0L),
        optInt(r, "partition_spec_id").getOrElse(0),
        optInt(r, "content").getOrElse(0),           // v1: data
        optLong(r, "sequence_number").getOrElse(0L), // v1: 0
        optLong(r, "min_sequence_number").getOrElse(0L),
        optLong(r, "added_snapshot_id").getOrElse(-1L),
        optInt(r, "added_files_count", "added_data_files_count").getOrElse(0),
        optInt(r, "existing_files_count", "existing_data_files_count").getOrElse(0),
        optInt(r, "deleted_files_count", "deleted_data_files_count").getOrElse(0),
        partitions,
        optLong(r, "first_row_id"))
      (entry, (optLong(r, "added_rows_count").getOrElse(0L),
        optLong(r, "existing_rows_count").getOrElse(0L),
        optLong(r, "deleted_rows_count").getOrElse(0L)))
    }

  // ---- manifest (read) -----------------------------------------------------

  /** One manifest entry (data or delete file). `status`: 1=ADDED,
    * 0=EXISTING, 2=DELETED (not live). `content` of the file: 0=data,
    * 1=position deletes, 2=equality deletes. `partition` maps the spec's
    * partition FIELD NAME to the decoded transformed value (null value =
    * null partition). Bounds/counts are keyed by table field id. */
  final case class ManifestEntry(
      status: Int,
      snapshotId: Option[Long],
      sequenceNumber: Option[Long],
      content: Int,
      filePath: String,
      fileFormat: String,
      partition: Map[String, Any],
      recordCount: Long,
      fileSizeBytes: Long,
      nullCounts: Map[Int, Long],
      nanCounts: Map[Int, Long],
      lowerBounds: Map[Int, Array[Byte]],
      upperBounds: Map[Int, Array[Byte]],
      equalityIds: Seq[Int],
      // v3 deletion-vector fields (null on data files / v2 deletes):
      // the puffin blob this entry frames, and the data file it masks
      referencedDataFile: Option[String] = None,
      contentOffset: Option[Long] = None,
      contentSizeInBytes: Option[Long] = None,
      /** v3 row lineage: the id of this data file's FIRST row; rows get
        * `_row_id = first_row_id + position` by inheritance. */
      firstRowId: Option[Long] = None)

  /** Header properties of a manifest file. `schemaId` is the table schema
    * in force when the manifest was written — graft resolves the PHYSICAL
    * column names of the manifest's data files through it (rename-safe
    * without reading parquet footers per file). */
  final case class ManifestHeader(schemaId: Option[Int], specId: Int, content: String)

  def readManifest(conf: Configuration, path: Path): (ManifestHeader, Seq[ManifestEntry]) = {
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try {
      val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try {
        val header = ManifestHeader(
          Option(stream.getMetaString("schema-id")).map(_.toInt),
          Option(stream.getMetaString("partition-spec-id")).map(_.toInt).getOrElse(0),
          Option(stream.getMetaString("content")).getOrElse("data"))
        val out = scala.collection.mutable.ArrayBuffer[ManifestEntry]()
        while (stream.hasNext) {
          val r = stream.next()
          val df = r.get("data_file").asInstanceOf[GenericRecord]
          val part = opt(df, "partition") match {
            case Some(p: GenericRecord) =>
              p.getSchema.getFields.asScala.map { f =>
                f.name() -> decodePartValue(p.get(f.name()))
              }.toMap
            case _ => Map.empty[String, Any]
          }
          out += ManifestEntry(
            optInt(r, "status").getOrElse(1),
            optLong(r, "snapshot_id"),
            optLong(r, "sequence_number", "data_sequence_number"),
            optInt(df, "content").getOrElse(0),      // v1 data_file: data
            str(df.get("file_path")),
            str(df.get("file_format")),
            part,
            optLong(df, "record_count").getOrElse(0L),
            optLong(df, "file_size_in_bytes").getOrElse(0L),
            intKeyMap(opt(df, "null_value_counts").orNull)
              .map { case (k, v) => k -> v.asInstanceOf[Number].longValue() },
            intKeyMap(opt(df, "nan_value_counts").orNull)
              .map { case (k, v) => k -> v.asInstanceOf[Number].longValue() },
            intKeyMap(opt(df, "lower_bounds").orNull)
              .map { case (k, v) => k -> bytesOf(v) }.filter(_._2 != null),
            intKeyMap(opt(df, "upper_bounds").orNull)
              .map { case (k, v) => k -> bytesOf(v) }.filter(_._2 != null),
            opt(df, "equality_ids") match {
              case Some(a: java.util.Collection[_]) =>
                a.asScala.map(_.asInstanceOf[Number].intValue()).toSeq
              case _ => Nil
            },
            opt(df, "referenced_data_file").map(str),
            optLong(df, "content_offset"),
            optLong(df, "content_size_in_bytes"),
            optLong(df, "first_row_id"))
        }
        (header, out.toSeq)
      } finally stream.close()
    } finally in.close()
  }

  /** Avro value of a partition struct field → JVM value usable as a typed
    * partition value (utf8 → String; int/long/etc. pass through). */
  private def decodePartValue(v: AnyRef): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer => bytesOf(b)
    case other => other
  }

  private def readRecords[A](conf: Configuration, path: Path)(f: GenericRecord => A): Seq[A] = {
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try {
      val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try {
        val out = scala.collection.mutable.ArrayBuffer[A]()
        while (stream.hasNext) out += f(stream.next())
        out.toSeq
      } finally stream.close()
    } finally in.close()
  }

  // ---- write side ----------------------------------------------------------

  /** v2 manifest-list Avro schema (spec field-ids attached). */
  val ManifestListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514},
      |{"name":"partitions","type":["null",{"type":"array","items":
      |  {"type":"record","name":"r508","fields":[
      |    {"name":"contains_null","type":"boolean","field-id":509},
      |    {"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
      |    {"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
      |    {"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
      |  ]},"element-id":508}],"default":null,"field-id":507},
      |{"name":"first_row_id","type":["null","long"],"default":null,"field-id":520}
      |]}""".stripMargin)

  /** Writer-side manifest-list entry → Avro record. */
  def manifestListRecord(e: ManifestFileEntry, rowCounts: (Long, Long, Long)): GenericRecord = {
    val r = new GenericData.Record(ManifestListSchema)
    r.put("manifest_path", e.path)
    r.put("manifest_length", e.length)
    r.put("partition_spec_id", e.specId)
    r.put("content", e.content)
    r.put("sequence_number", e.sequenceNumber)
    r.put("min_sequence_number", e.minSequenceNumber)
    r.put("added_snapshot_id", e.addedSnapshotId)
    r.put("added_files_count", e.addedFiles)
    r.put("existing_files_count", e.existingFiles)
    r.put("deleted_files_count", e.deletedFiles)
    r.put("added_rows_count", rowCounts._1)
    r.put("existing_rows_count", rowCounts._2)
    r.put("deleted_rows_count", rowCounts._3)
    if (e.partitions.nonEmpty) {
      val itemSchema = unwrap(ManifestListSchema.getField("partitions").schema())
        .getElementType
      val arr = new java.util.ArrayList[GenericRecord]()
      e.partitions.foreach { s =>
        val sr = new GenericData.Record(itemSchema)
        sr.put("contains_null", s.containsNull)
        sr.put("contains_nan", s.containsNan.map(Boolean.box).orNull)
        sr.put("lower_bound", s.lowerBound.map(java.nio.ByteBuffer.wrap).orNull)
        sr.put("upper_bound", s.upperBound.map(java.nio.ByteBuffer.wrap).orNull)
        arr.add(sr)
      }
      r.put("partitions", arr)
    }
    r.put("first_row_id", e.firstRowId.map(Long.box).orNull)
    r
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** v2 manifest-entry Avro schema; the partition struct is built from the
    * table's partition spec (`partFields`: name, avro primitive type name,
    * partition field id). */
  def manifestSchema(partFields: Seq[(String, String, Int)]): Schema = {
    val partJson = partFields.map { case (n, t, id) =>
      val typ =
        if (t == "date") """{"type":"int","logicalType":"date"}"""
        else "\"" + t + "\""
      s"""{"name":"$n","type":["null",$typ],"default":null,"field-id":$id}"""
    }.mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int","field-id":0},
         |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
         |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
         |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
         |{"name":"content","type":"int","field-id":134},
         |{"name":"file_path","type":"string","field-id":100},
         |{"name":"file_format","type":"string","field-id":101},
         |{"name":"partition","type":{"type":"record","name":"r102","fields":[$partJson]},"field-id":102},
         |{"name":"record_count","type":"long","field-id":103},
         |{"name":"file_size_in_bytes","type":"long","field-id":104},
         |{"name":"null_value_counts","type":["null",{"type":"array","items":
         |{"type":"record","name":"k121_v122","fields":[
         |{"name":"key","type":"int","field-id":121},
         |{"name":"value","type":"long","field-id":122}]},
         |"logicalType":"map"}],"default":null,"field-id":110},
         |{"name":"lower_bounds","type":["null",{"type":"array","items":
         |{"type":"record","name":"k126_v127","fields":[
         |{"name":"key","type":"int","field-id":126},
         |{"name":"value","type":"bytes","field-id":127}]},
         |"logicalType":"map"}],"default":null,"field-id":125},
         |{"name":"upper_bounds","type":["null",{"type":"array","items":
         |{"type":"record","name":"k129_v130","fields":[
         |{"name":"key","type":"int","field-id":129},
         |{"name":"value","type":"bytes","field-id":130}]},
         |"logicalType":"map"}],"default":null,"field-id":128},
         |{"name":"equality_ids","type":["null",{"type":"array","items":"int",
         |"element-id":136}],"default":null,"field-id":135},
         |{"name":"referenced_data_file","type":["null","string"],"default":null,"field-id":143},
         |{"name":"content_offset","type":["null","long"],"default":null,"field-id":144},
         |{"name":"content_size_in_bytes","type":["null","long"],"default":null,"field-id":145},
         |{"name":"first_row_id","type":["null","long"],"default":null,"field-id":142}
         |]},"field-id":2}
         |]}""".stripMargin)
  }

  /** Write an Avro file with the given header metadata. Returns file length. */
  def writeAvro(conf: Configuration, path: Path, schema: Schema,
      meta: Map[String, String], records: Seq[GenericRecord]): Long = {
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, true)
    try {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      meta.foreach { case (k, v) => w.setMeta(k, v) }
      w.create(schema, out)
      records.foreach(w.append)
      w.close() // closes the underlying stream too
    } catch { case e: Throwable => try out.close() catch { case _: Throwable => () }; throw e }
    fs.getFileStatus(path).getLen
  }
}
