package graft.lake.hudi

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory, EncoderFactory}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Apache Hudi LOG-FILE format (the MERGE_ON_READ delta encoding),
  * parsed/emitted per the published HoodieLogFormat:
  *
  * A log file is a sequence of BLOCKS, each framed as
  *
  *   MAGIC "#HUDI#" (6 bytes)
  *   block size            : int64 BE (everything after this field,
  *                           including the trailing total-size long)
  *   log format version    : int32 BE (1)
  *   block type ordinal    : int32 BE (0 command, 1 delete, 2 corrupt,
  *                           3 avro data, 4 hfile, 5 parquet, 6 cdc)
  *   header metadata map   : int32 count, then per entry
  *                           (int32 key ordinal, int32 len, utf8 bytes);
  *                           key ordinals: 0 INSTANT_TIME,
  *                           1 TARGET_INSTANT_TIME, 2 SCHEMA, ...
  *   content length        : int64 BE
  *   content               : <content length> bytes
  *   footer metadata map   : same encoding as headers
  *   total block size      : int64 BE (including the magic)
  *
  * AVRO data block content (block version 3): int32 content-format
  * version, int32 record count, then per record int32 length + the
  * record's Avro binary encoding under the SCHEMA header's writer
  * schema. Deletes ride the documented `_hoodie_is_deleted` boolean
  * field; DELETE/COMMAND blocks (whose payload encoding is engine
  * version dependent) are REJECTED loudly rather than misread.
  *
  * Log file NAMING per the layout:
  * `.<fileId>_<baseInstant>.log.<version>_<writeToken>` — a hidden
  * dot-file in the partition dir, bound to the base-file slice whose
  * instant is `<baseInstant>` (compaction writes a new base slice; the
  * old slice's logs die with it).
  *
  * Scale posture: the log-file LIST is driver metadata (timeline-
  * driven, like base files); block parsing + record decode run in
  * EXECUTOR tasks (one per log file) — nothing data-sized touches the
  * driver on the read path.
  */
object HudiLog {

  val Magic: Array[Byte] = "#HUDI#".getBytes("UTF-8")
  val LogFormatVersion = 1

  // HoodieLogBlockType ordinals, per the published format
  val CommandBlock = 0
  val DeleteBlock = 1
  val CorruptBlock = 2
  val AvroDataBlock = 3

  // HeaderMetadataType ordinals
  val HeaderInstantTime = 0
  val HeaderTargetInstant = 1
  val HeaderSchema = 2

  /** The documented soft-delete field: a record whose
    * `_hoodie_is_deleted` is true deletes its key. */
  val IsDeletedField = "_hoodie_is_deleted"

  final case class Block(blockType: Int, headers: Map[Int, String], content: Array[Byte])

  /** `.<fileId>_<baseInstant>.log.<version>_<writeToken>` */
  val LogFileRe: scala.util.matching.Regex =
    """\.(.+)_(\d+)\.log\.(\d+)_(.+)""".r

  // ---- block framing -------------------------------------------------------

  private def metadataBytes(m: Map[Int, String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      out.writeInt(k)
      val b = v.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  private def readMetadata(in: DataInputStream): Map[Int, String] = {
    val n = in.readInt()
    (0 until n).map { _ =>
      val k = in.readInt()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      k -> new String(b, "UTF-8")
    }.toMap
  }

  /** Append-encode blocks into one log-file byte stream. */
  def encodeLogFile(blocks: Seq[Block]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    blocks.foreach { b =>
      val header = metadataBytes(b.headers)
      val footer = metadataBytes(Map.empty)
      // size after the block-size field: version + type + header +
      // content-length + content + footer + trailing total-size long
      val blockSize = 4L + 4L + header.length + 8L + b.content.length + footer.length + 8L
      val total = Magic.length + 8L + blockSize // incl. magic + size field
      out.write(Magic)
      out.writeLong(blockSize)
      out.writeInt(LogFormatVersion)
      out.writeInt(b.blockType)
      out.write(header)
      out.writeLong(b.content.length.toLong)
      out.write(b.content)
      out.write(footer)
      out.writeLong(total)
    }
    out.flush()
    bos.toByteArray
  }

  def writeLogFile(conf: Configuration, path: Path, blocks: Seq[Block]): Long =
    writeLogFileStreaming(conf, path, blocks.iterator)

  /** Streams blocks to the file as they are produced — task memory is
    * bounded by ONE block (the producing iterator rolls blocks at
    * `hoodie.logfile.data.block.max.size`-style caps), never the whole
    * log file. Real multi-block HoodieLogFormat files come from exactly
    * this shape. */
  def writeLogFileStreaming(conf: Configuration, path: Path,
      blocks: Iterator[Block]): Long = {
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, false)
    var written = 0L
    try blocks.foreach { b =>
      val bytes = encodeLogFile(Seq(b))
      out.write(bytes)
      written += bytes.length
    } finally out.close()
    written
  }

  private def readBlock(in: DataInputStream): Block = {
    val magic = new Array[Byte](Magic.length)
    in.readFully(magic)
    require(java.util.Arrays.equals(magic, Magic),
      s"hudi log: bad magic ${new String(magic, "UTF-8")}")
    in.readLong() // block size (redundant with the parsed fields)
    val version = in.readInt()
    require(version == LogFormatVersion,
      s"hudi log: format version $version unsupported (have $LogFormatVersion)")
    val blockType = in.readInt()
    val headers = readMetadata(in)
    val contentLen = in.readLong()
    require(contentLen >= 0 && contentLen <= Int.MaxValue - 8,
      s"hudi log: block content of $contentLen bytes exceeds the " +
        "single-block ceiling (blocks roll at the writer's cap)")
    val content = new Array[Byte](contentLen.toInt)
    in.readFully(content)
    readMetadata(in) // footers
    in.readLong()    // total block size
    Block(blockType, headers, content)
  }

  def decodeLogFile(bytes: Array[Byte]): Seq[Block] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.ArrayBuffer[Block]()
    while (in.available() > 0) out += readBlock(in)
    out.toSeq
  }

  /** Streams the log file BLOCK by BLOCK: blocks roll at ~256 MB but one
    * group's whole ingest appends to ONE file, so a log file can legally
    * exceed 2 GB — materializing it whole would overflow the Int array
    * size (and OOM the task well before that). Memory is bounded by one
    * block's content, the writer's own posture. */
  def readLogFile(conf: Configuration, path: Path): Seq[Block] = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    var consumed = 0L
    val counting = new java.io.FilterInputStream(
        new java.io.BufferedInputStream(fs.open(path), 1 << 16)) {
      override def read(): Int = {
        val r = super.read(); if (r >= 0) consumed += 1; r
      }
      override def read(b: Array[Byte], off: Int, l: Int): Int = {
        val r = super.read(b, off, l); if (r > 0) consumed += r; r
      }
    }
    val in = new DataInputStream(counting)
    val out = scala.collection.mutable.ArrayBuffer[Block]()
    try while (consumed < len) out += readBlock(in)
    finally in.close()
    out.toSeq
  }

  // ---- avro data block content (block version 3) ---------------------------

  private val AvroContentVersion = 3

  def avroDataBlockContent(recordBytes: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(AvroContentVersion)
    out.writeInt(recordBytes.size)
    recordBytes.foreach { b =>
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  def parseAvroDataBlock(content: Array[Byte]): Seq[Array[Byte]] = {
    val in = new DataInputStream(new ByteArrayInputStream(content))
    val v = in.readInt()
    require(v == AvroContentVersion,
      s"hudi log: avro data block content version $v unsupported")
    val n = in.readInt()
    (0 until n).map { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      b
    }
  }

  // ---- Spark <-> Avro row codec --------------------------------------------

  /** Avro writer-schema JSON for a Spark struct (nullable unions,
    * timestamp-micros / date logical types). Refuses non-primitive
    * columns loudly — misencoding is worse than an error. */
  def avroSchemaJson(struct: StructType, name: String): String = {
    def prim(dt: DataType): String = dt match {
      case IntegerType | ShortType | ByteType => "\"int\""
      case LongType => "\"long\""
      case StringType => "\"string\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case BooleanType => "\"boolean\""
      case BinaryType => "\"bytes\""
      case TimestampType | TimestampNTZType =>
        """{"type":"long","logicalType":"timestamp-micros"}"""
      case DateType => """{"type":"int","logicalType":"date"}"""
      case d: DecimalType => // avro decimal: unscaled big-endian bytes
        s"""{"type":"bytes","logicalType":"decimal","precision":${d.precision},"scale":${d.scale}}"""
      case other => throw new IllegalArgumentException(
        s"hudi log: unsupported column type $other")
    }
    val fields = struct.fields.map { f =>
      s"""{"name":"${f.name}","type":["null",${prim(f.dataType)}],"default":null}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }

  /** Row -> Avro binary bytes under `schema` (field order = struct order). */
  def encodeRow(schema: Schema, struct: StructType, row: Row): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    struct.fields.zipWithIndex.foreach { case (f, i) =>
      val v = if (row.isNullAt(i)) null else f.dataType match {
        // rows may carry either object model (java.sql vs java.time —
        // TimestampNTZ always materializes as LocalDateTime)
        case TimestampType | TimestampNTZType => Long.box(row.get(i) match {
          case t: java.sql.Timestamp =>
            t.getTime / 1000L * 1000000L + t.getNanos / 1000L
          case t: java.time.Instant =>
            Math.multiplyExact(t.getEpochSecond, 1000000L) + t.getNano / 1000L
          case t: java.time.LocalDateTime =>
            Math.multiplyExact(t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L) +
              t.getNano / 1000L
          case other => throw new IllegalArgumentException(
            s"hudi log: timestamp value ${other.getClass}")
        })
        case DateType => Int.box(row.get(i) match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
          case d: java.time.LocalDate => d.toEpochDay.toInt
          case other => throw new IllegalArgumentException(
            s"hudi log: date value ${other.getClass}")
        })
        case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
        case d: DecimalType => java.nio.ByteBuffer.wrap(
          row.getAs[java.math.BigDecimal](i)
            .setScale(d.scale).unscaledValue().toByteArray)
        // short/byte map to Avro int — box as Integer, or the datum
        // writer ClassCastExceptions on the raw Short/Byte
        case ShortType | ByteType =>
          Int.box(row.get(i).asInstanceOf[Number].intValue())
        case _ => row.get(i).asInstanceOf[AnyRef]
      }
      rec.put(f.name, v)
    }
    val bos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    bos.toByteArray
  }

  /** Avro binary bytes -> Row under `struct` (reads by field name;
    * missing fields null). */
  def decodeRow(reader: GenericDatumReader[GenericRecord], schema: Schema,
      struct: StructType, bytes: Array[Byte], reuse: BinaryDecoder): Row = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, reuse)
    val rec = reader.read(null, dec)
    Row.fromSeq(struct.fields.toIndexedSeq.map { f =>
      val v = if (schema.getField(f.name) == null) null else rec.get(f.name)
      if (v == null) null else f.dataType match {
        case StringType => v.toString
        case IntegerType => Int.box(v.asInstanceOf[Number].intValue())
        case ShortType => Short.box(v.asInstanceOf[Number].shortValue())
        case ByteType => Byte.box(v.asInstanceOf[Number].byteValue())
        case LongType => Long.box(v.asInstanceOf[Number].longValue())
        case DoubleType => Double.box(v.asInstanceOf[Number].doubleValue())
        case FloatType => Float.box(v.asInstanceOf[Number].floatValue())
        case BooleanType => v
        case BinaryType =>
          val bb = v.asInstanceOf[java.nio.ByteBuffer]
          val d = new Array[Byte](bb.remaining()); bb.duplicate().get(d); d
        case dt: DecimalType =>
          val bb = v.asInstanceOf[java.nio.ByteBuffer]
          val raw = new Array[Byte](bb.remaining()); bb.duplicate().get(raw)
          new java.math.BigDecimal(new java.math.BigInteger(raw), dt.scale)
        case TimestampType =>
          val us = v.asInstanceOf[Number].longValue()
          val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
          t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
          t
        case TimestampNTZType => // external type is LocalDateTime, always
          val us = v.asInstanceOf[Number].longValue()
          java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
        case DateType =>
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
            v.asInstanceOf[Number].intValue().toLong))
        case other => throw new IllegalArgumentException(
          s"hudi log: unsupported column type $other")
      }
    })
  }
}
