package graft.lake.iceberg

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Apache Iceberg table-metadata model: the subset of `vN.metadata.json`
  * (format v1 and v2) that read planning needs, plus the single-value and
  * type serializations the spec fixes for manifest stats bounds.
  *
  * This is REAL-FORMAT interop — unlike [[graft.lake.Meta]], which is
  * Iceberg-shaped but private, these structures parse the published Apache
  * Iceberg table spec so graft can read tables written by other engines
  * (the reference's headline capability: pg_lakehouse_iceberg/README.md:5,
  * iceberg_bridge.cpp loads a table from its metadata location and scans a
  * snapshot). Everything here follows the public spec document; no Iceberg
  * library is used.
  */
/** `initialDefault`: the v3 default returned for this field when
  * reading data files written before the field existed (decoded from
  * the spec's JSON single-value serialization; None = return null). */
final case class IceField(id: Int, name: String, required: Boolean,
    dataType: DataType, typeStr: String,
    initialDefault: Option[Any] = None)

final case class IceSchema(schemaId: Int, fields: Seq[IceField]) {
  lazy val byId: Map[Int, IceField] = fields.map(f => f.id -> f).toMap
  def struct: StructType =
    StructType(fields.map(f => StructField(f.name, f.dataType, nullable = !f.required)))
}

/** One partition field: `name` is the partition struct's field name,
  * `transform` the spec string (identity, bucket[N], truncate[W], year,
  * month, day, hour, void), `sourceId` the table column it derives from. */
final case class IcePartField(name: String, transform: String, sourceId: Int, fieldId: Int)

final case class IcePartSpec(specId: Int, fields: Seq[IcePartField])

final case class IceSnapshot(
    id: Long,
    parentId: Option[Long],
    sequenceNumber: Long,     // v1 snapshots carry none → 0
    timestampMs: Long,
    manifestList: String,
    operation: String,
    schemaId: Option[Int],
    /** Snapshot summary entries BESIDES the required `operation` —
      * Iceberg's own engines stash engine state here (Flink's
      * checkpoint id, Spark's app id); graft's streaming sink records
      * its per-query batch id the same way. */
    summaryExtras: Map[String, String] = Map.empty,
    /** v3 row lineage: the first row id assigned by this snapshot
      * (`first-row-id`); present iff the table tracks lineage. */
    firstRowId: Option[Long] = None)

final case class IceRef(snapshotId: Long, refType: String) // branch | tag

final case class IceMeta(
    formatVersion: Int,
    uuid: String,
    location: String,
    lastSequenceNumber: Long,
    lastColumnId: Int,
    currentSchemaId: Int,
    schemas: Seq[IceSchema],
    defaultSpecId: Int,
    specs: Seq[IcePartSpec],
    lastPartitionId: Int,
    properties: Map[String, String],
    currentSnapshotId: Option[Long],
    snapshots: Seq[IceSnapshot],
    snapshotLog: Seq[(Long, Long)], // (timestampMs, snapshotId)
    refs: Map[String, IceRef],
    /** v3 row lineage: the id the NEXT snapshot's rows start at
      * (`next-row-id`). Present iff the table tracks lineage; the
      * writer assigns per-file first_row_id from it on append. */
    nextRowId: Option[Long] = None) {

  def schema(id: Int): IceSchema = schemas.find(_.schemaId == id).getOrElse(
    throw new IllegalArgumentException(
      s"iceberg: schema-id $id not in metadata (have ${schemas.map(_.schemaId).mkString(",")})"))

  def currentSchema: IceSchema = schema(currentSchemaId)

  def spec(id: Int): IcePartSpec = specs.find(_.specId == id).getOrElse(
    throw new IllegalArgumentException(
      s"iceberg: partition-spec-id $id not in metadata"))

  def snapshot(id: Long): IceSnapshot = snapshots.find(_.id == id).getOrElse(
    throw new IllegalArgumentException(
      s"iceberg: snapshot $id not in metadata (have ${snapshots.map(_.id).mkString(",")})"))
}

object IcebergMeta {

  private val mapper = new ObjectMapper()

  // ---- metadata.json parsing ----------------------------------------------

  def parse(json: String): IceMeta = {
    val n = mapper.readTree(json)
    val fv = n.path("format-version").asInt(1)
    require(fv == 1 || fv == 2 || fv == 3,
      s"iceberg: unsupported format-version $fv (supported: 1, 2, 3)")
    val schemas: Seq[IceSchema] =
      if (n.has("schemas")) n.get("schemas").elements().asScala.map(parseSchema).toSeq
      else Seq(parseSchema(n.get("schema"))) // v1 single-schema form
    val currentSchemaId =
      if (n.has("current-schema-id")) n.get("current-schema-id").asInt
      else schemas.head.schemaId
    val specs: Seq[IcePartSpec] =
      if (n.has("partition-specs"))
        n.get("partition-specs").elements().asScala.map(parseSpec).toSeq
      else if (n.has("partition-spec")) // v1 single-spec form: bare field list
        Seq(IcePartSpec(0, parseSpecFields(n.get("partition-spec"))))
      else Seq(IcePartSpec(0, Nil))
    val snaps = (if (n.has("snapshots")) n.get("snapshots").elements().asScala else Iterator.empty)
      .map(parseSnapshot).toSeq
    val log = (if (n.has("snapshot-log")) n.get("snapshot-log").elements().asScala else Iterator.empty)
      .map(e => (e.get("timestamp-ms").asLong, e.get("snapshot-id").asLong)).toSeq
    val refs = (if (n.has("refs")) n.get("refs").properties().asScala else Nil)
      .map { e =>
        e.getKey -> IceRef(e.getValue.get("snapshot-id").asLong,
          e.getValue.path("type").asText("branch"))
      }.toMap
    val props = (if (n.has("properties")) n.get("properties").properties().asScala else Nil)
      .map(e => e.getKey -> e.getValue.asText).toMap
    IceMeta(
      fv,
      n.path("table-uuid").asText(""),
      n.path("location").asText(""),
      n.path("last-sequence-number").asLong(0L),
      n.path("last-column-id").asInt(schemas.map(_.fields.map(_.id).maxOption.getOrElse(0)).max),
      currentSchemaId,
      schemas,
      n.path("default-spec-id").asInt(0),
      specs,
      n.path("last-partition-id").asInt(
        specs.flatMap(_.fields.map(_.fieldId)).maxOption.getOrElse(999)),
      props,
      if (n.has("current-snapshot-id") && n.get("current-snapshot-id").asLong(-1L) >= 0)
        Some(n.get("current-snapshot-id").asLong)
      else None,
      snaps,
      log,
      refs,
      if (n.hasNonNull("next-row-id")) Some(n.get("next-row-id").asLong) else None)
  }

  /** One snapshot object of `metadata.json` / an `add-snapshot` REST
    * update (same spec serialization both places). */
  def parseSnapshot(s: JsonNode): IceSnapshot =
    IceSnapshot(
      s.get("snapshot-id").asLong,
      if (s.has("parent-snapshot-id")) Some(s.get("parent-snapshot-id").asLong) else None,
      s.path("sequence-number").asLong(0L),
      s.get("timestamp-ms").asLong,
      s.get("manifest-list").asText,
      s.path("summary").path("operation").asText("append"),
      if (s.has("schema-id")) Some(s.get("schema-id").asInt) else None,
      summaryExtras =
        (if (s.has("summary")) s.get("summary").properties().asScala else Nil)
          .filter(_.getKey != "operation")
          .map(e => e.getKey -> e.getValue.asText).toMap,
      firstRowId =
        if (s.hasNonNull("first-row-id")) Some(s.get("first-row-id").asLong)
        else None)

  /** Schema object (the `{"type":"struct","fields":[…]}` spec form) —
    * the REST CreateTableRequest / add-schema update carry this shape. */
  def parseSchemaJson(json: String): IceSchema =
    parseSchema(mapper.readTree(json))

  def parseSchemaNode(n: JsonNode): IceSchema = parseSchema(n)

  /** Bare partition-field list (the REST CreateTableRequest's
    * partition-spec.fields / a manifest header's "partition-spec"). */
  def parseSpecFieldsNode(n: JsonNode): Seq[IcePartField] = parseSpecFields(n)

  private def parseSchema(n: JsonNode): IceSchema = {
    require(n.path("type").asText("struct") == "struct",
      "iceberg: top-level schema must be a struct")
    val fields = n.get("fields").elements().asScala.map { f =>
      val t = f.get("type")
      val dflt = f.get("initial-default") match {
        case null => None
        case d if d.isNull => None
        case d => Some(decodeDefault(
          if (t.isTextual) t.asText else t.toString, d))
      }
      IceField(
        f.get("id").asInt,
        f.get("name").asText,
        f.path("required").asBoolean(false),
        parseType(t),
        if (t.isTextual) t.asText else t.toString,
        dflt)
    }.toSeq
    IceSchema(n.path("schema-id").asInt(0), fields)
  }

  /** Iceberg JSON single-value serialization → JVM literal (v3
    * `initial-default`). Only primitive defaults are implemented;
    * anything else is rejected loudly — silently projecting null where
    * the spec demands a default would misread every pre-evolution file. */
  private def decodeDefault(typeStr: String, d: JsonNode): Any = typeStr match {
    case "int" => d.asInt
    case "long" => d.asLong
    case "float" => d.asDouble.toFloat
    case "double" => d.asDouble
    case "boolean" => d.asBoolean
    case "string" => d.asText
    case "date" => java.sql.Date.valueOf(d.asText)
    case other => throw new IllegalArgumentException(
      s"iceberg: initial-default for type $other not supported")
  }

  private def parseSpec(n: JsonNode): IcePartSpec =
    IcePartSpec(n.path("spec-id").asInt(0), parseSpecFields(n.get("fields")))

  private def parseSpecFields(n: JsonNode): Seq[IcePartField] =
    n.elements().asScala.map { f =>
      IcePartField(
        f.get("name").asText,
        f.get("transform").asText,
        f.get("source-id").asInt,
        f.path("field-id").asInt(1000))
    }.toSeq

  /** Iceberg type string/object → Spark type. Nested structs/lists/maps map
    * recursively (read works by name); `uuid` and `time` have no faithful
    * Spark column type and are refused loudly rather than read wrong. */
  def parseType(t: JsonNode): DataType =
    if (t.isTextual) parsePrimitive(t.asText)
    else t.path("type").asText match {
      case "struct" => StructType(t.get("fields").elements().asScala.map { f =>
        StructField(f.get("name").asText, parseType(f.get("type")),
          nullable = !f.path("required").asBoolean(false))
      }.toSeq)
      case "list" => ArrayType(parseType(t.get("element")),
        containsNull = !t.path("element-required").asBoolean(false))
      case "map" => MapType(parseType(t.get("key")), parseType(t.get("value")),
        valueContainsNull = !t.path("value-required").asBoolean(false))
      case other => throw new IllegalArgumentException(s"iceberg: unsupported type $other")
    }

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[(\d+)\]""".r

  def parsePrimitive(s: String): DataType = s match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "date" => DateType
    case "string" => StringType
    case "binary" => BinaryType
    case "timestamp" => TimestampNTZType
    case "timestamptz" => TimestampType
    case DecimalRe(p, sc) => DecimalType(p.toInt, sc.toInt)
    case FixedRe(_) => BinaryType
    // v3 VARIANT (r15; Delta-parity — lake_delta_variant): Spark's
    // VariantType maps 1:1, and the parquet encoding (a group of
    // binary metadata/value) is the same one Spark's own source
    // reads/writes — bounds are never recorded for it (no ordering)
    case "variant" => VariantType
    case other => throw new IllegalArgumentException(
      s"iceberg: unsupported primitive type '$other' (uuid/time are not readable as Spark columns)")
  }

  /** Spark type → Iceberg type string (writer side; primitives only). */
  def typeString(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType | ShortType | ByteType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case DateType => "date"
    case StringType => "string"
    case BinaryType => "binary"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case VariantType => "variant" // v3 (the writer bumps format-version)
    case other => throw new IllegalArgumentException(
      s"iceberg: cannot write Spark type $other")
  }

  // ---- single-value serialization (spec Appendix D) ------------------------
  // Bounds in manifests are the Iceberg single-value binary forms:
  // int/date = 4-byte little-endian, long/timestamp = 8-byte LE, float = 4
  // LE, double = 8 LE, string = UTF-8 bytes, decimal = unscaled big-endian.

  import java.nio.{ByteBuffer, ByteOrder}

  /** Decode a bound into graft's (ColStats tag, string) comparison domain.
    * None = a domain the pruner can't compare (conservative: no stat).
    * Non-ASCII string bounds are dropped — Iceberg orders strings by
    * unsigned UTF-8 byte, Java compareTo by UTF-16 unit; they agree only
    * on ASCII (same posture as Meta.foldRange). */
  def decodeBound(typeStr: String, bytes: Array[Byte]): Option[(String, String)] = {
    def le(n: Int): Option[ByteBuffer] =
      if (bytes.length < n) None
      else Some(ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN))
    typeStr match {
      case "int" | "date" => le(4).map(b => ("l", b.getInt.toLong.toString))
      case "long" | "timestamp" | "timestamptz" => le(8).map(b => ("l", b.getLong.toString))
      case "float" => le(4).map(b => ("d", b.getFloat.toDouble.toString))
      case "double" => le(8).map(b => ("d", b.getDouble.toString))
      case "string" =>
        val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        if (s.forall(_ <= 127)) Some(("s", s)) else None
      case DecimalRe(_, sc) =>
        Some(("c", new java.math.BigDecimal(new java.math.BigInteger(bytes), sc.toInt).toPlainString))
      case _ => None
    }
  }

  /** Encode a stat string (graft ColStats domain) back to spec bytes. */
  def encodeBound(typeStr: String, value: String): Option[Array[Byte]] = {
    def le(n: Int)(put: ByteBuffer => Unit): Array[Byte] = {
      val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN); put(b); b.array()
    }
    typeStr match {
      case "int" | "date" => value.toLongOption.map(v => le(4)(_.putInt(v.toInt)))
      case "long" | "timestamp" | "timestamptz" => value.toLongOption.map(v => le(8)(_.putLong(v)))
      case "float" => value.toDoubleOption.map(v => le(4)(_.putFloat(v.toFloat)))
      case "double" => value.toDoubleOption.map(v => le(8)(_.putDouble(v)))
      case "string" => Some(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case DecimalRe(_, sc) =>
        try Some(new java.math.BigDecimal(value).setScale(sc.toInt).unscaledValue.toByteArray)
        catch { case _: ArithmeticException => None }
      case _ => None
    }
  }

  // ---- metadata.json writing (writer side) ---------------------------------

  def render(m: IceMeta): String = {
    val root = mapper.createObjectNode()
    root.put("format-version", m.formatVersion)
    root.put("table-uuid", m.uuid)
    root.put("location", m.location)
    root.put("last-sequence-number", m.lastSequenceNumber)
    root.put("last-updated-ms", m.snapshots.map(_.timestampMs).maxOption.getOrElse(0L))
    root.put("last-column-id", m.lastColumnId)
    root.put("current-schema-id", m.currentSchemaId)
    val schemas = root.putArray("schemas")
    m.schemas.foreach(s => schemas.add(renderSchema(s)))
    root.put("default-spec-id", m.defaultSpecId)
    val specs = root.putArray("partition-specs")
    m.specs.foreach(sp => specs.add(renderSpecNode(sp)))
    root.put("last-partition-id", m.lastPartitionId)
    root.put("default-sort-order-id", 0)
    val orders = root.putArray("sort-orders")
    val o0 = orders.addObject(); o0.put("order-id", 0); o0.putArray("fields")
    val props = root.putObject("properties")
    m.properties.foreach { case (k, v) => props.put(k, v) }
    m.currentSnapshotId.foreach(root.put("current-snapshot-id", _))
    val snaps = root.putArray("snapshots")
    m.snapshots.foreach(s => snaps.add(renderSnapshot(s)))
    val log = root.putArray("snapshot-log")
    m.snapshotLog.foreach { case (ts, id) =>
      val o = log.addObject(); o.put("timestamp-ms", ts); o.put("snapshot-id", id)
    }
    root.putArray("metadata-log")
    m.nextRowId.foreach(root.put("next-row-id", _)) // v3 row lineage
    val refs = root.putObject("refs")
    m.refs.foreach { case (name, r) =>
      val o = refs.putObject(name)
      o.put("snapshot-id", r.snapshotId); o.put("type", r.refType)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Snapshot JSON — metadata.json entries and REST add-snapshot updates
    * share this serialization. */
  def renderSnapshot(s: IceSnapshot): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("snapshot-id", s.id)
    s.parentId.foreach(o.put("parent-snapshot-id", _))
    o.put("sequence-number", s.sequenceNumber)
    o.put("timestamp-ms", s.timestampMs)
    o.put("manifest-list", s.manifestList)
    val sum = o.putObject("summary"); sum.put("operation", s.operation)
    s.summaryExtras.toSeq.sortBy(_._1).foreach { case (k, v) => sum.put(k, v) }
    s.schemaId.foreach(o.put("schema-id", _))
    s.firstRowId.foreach(o.put("first-row-id", _)) // v3 row lineage
    o
  }

  /** Schema node for metadata.json / REST add-schema updates. */
  def renderSchemaNode(s: IceSchema): ObjectNode = renderSchema(s)

  /** Schema JSON for a manifest header's "schema" property. */
  def renderSchemaJson(s: IceSchema): String =
    mapper.writeValueAsString(renderSchema(s))

  /** Full partition-spec node (spec-id + fields) — metadata.json
    * entries and REST add-spec updates share this serialization. */
  def renderSpecNode(sp: IcePartSpec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("spec-id", sp.specId)
    val fs = o.putArray("fields")
    sp.fields.foreach { f =>
      val fo = fs.addObject()
      fo.put("name", f.name); fo.put("transform", f.transform)
      fo.put("source-id", f.sourceId); fo.put("field-id", f.fieldId)
    }
    o
  }

  /** Parse a full partition-spec node (REST add-spec updates). */
  def parseSpecNode(n: JsonNode): IcePartSpec = parseSpec(n)

  /** Partition-field JSON for a manifest header's "partition-spec"
    * property (the bare field list form Iceberg writes there). */
  def renderSpecFieldsJson(sp: IcePartSpec): String = {
    val arr = mapper.createArrayNode()
    sp.fields.foreach { f =>
      val fo = arr.addObject()
      fo.put("name", f.name); fo.put("transform", f.transform)
      fo.put("source-id", f.sourceId); fo.put("field-id", f.fieldId)
    }
    mapper.writeValueAsString(arr)
  }

  private def renderSchema(s: IceSchema): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("type", "struct")
    o.put("schema-id", s.schemaId)
    val fs = o.putArray("fields")
    s.fields.foreach { f =>
      val fo = fs.addObject()
      fo.put("id", f.id); fo.put("name", f.name)
      fo.put("required", f.required); fo.put("type", f.typeStr)
    }
    o
  }
}
