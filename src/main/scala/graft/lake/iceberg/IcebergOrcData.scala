package graft.lake.iceberg

import org.apache.hadoop.fs.Path
import org.apache.orc.{OrcFile, TypeDescription}
import org.apache.hadoop.hive.ql.exec.vector._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Positional reader for Iceberg ORC **data files** (r13; closes the last
  * loud reject in the reference's PARQUET/ORC/AVRO format enum,
  * iceberg_bridge.h:229-249): Spark's ORC source exposes no
  * `_metadata.row_index` (parquet-only), so position deletes / DVs over
  * ORC groups previously rejected. This reader rides orc-core (already a
  * Spark dependency): ONE executor task per file streams
  * VectorizedRowBatches IN FILE ORDER, so the per-file row ordinal — the
  * `pos` delete files and DV bitmaps address — is a counter on the emit
  * path, exactly like [[IcebergAvroData.readWithPos]].
  *
  * Column resolution is by ICEBERG FIELD ID when the ORC schema carries
  * the spec's `iceberg.id` field attribute (files written by real
  * Iceberg engines), by name otherwise (Spark-converted files). A field
  * absent from the file reads as null (the spec's schema-evolution
  * rule).
  *
  * This path serves ONLY scans that need positional machinery — plain
  * ORC groups keep Spark's vectorized `spark.read.orc` source (codegen,
  * column pruning, predicate pushdown).
  *
  * Task granularity is ONE STRIPE (r14; the reference chunks ORC by
  * stripe the same way, iceberg_bridge.h:229-249): a first distributed
  * footer pass collects each file's stripe list — (byte range, row
  * count) pairs, O(stripes) driver metadata — and the scan then runs
  * one task per stripe, seeded with the stripe's FIRST ROW ORDINAL
  * (the prefix sum of preceding stripes' row counts, exact from footer
  * metadata), reading only its byte range via the ORC reader's range
  * option. A DV'd multi-GB ORC file is no longer one task. The Avro
  * positional reader stays file-granular — Avro blocks carry no row
  * counts in the header, and the reference treats Avro the same way
  * (iceberg_bridge.h:233).
  */
object IcebergOrcData {

  /** One planned stripe: (file path, byte offset, byte length, ordinal
    * of the stripe's first row within its file). */
  final case class StripeSlice(path: String, offset: Long, length: Long,
      firstRow: Long)

  /** Distributed footer pass: every stripe of `paths` with its byte
    * range and first-row ordinal — O(files) tasks, O(stripes) collected
    * metadata (a few dozen bytes per stripe; footers only, no data).
    * Exposed for the spec's task-count receipt. */
  def planStripes(spark: SparkSession, paths: Seq[String]): Seq[StripeSlice] = {
    if (paths.isEmpty) return Nil
    val bcConf = spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))
    spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .flatMap { p =>
        import scala.jdk.CollectionConverters._
        val reader = OrcFile.createReader(new Path(p),
          OrcFile.readerOptions(bcConf.value.value))
        try {
          var base = 0L
          reader.getStripes.asScala.map { st =>
            val s = StripeSlice(p, st.getOffset, st.getLength, base)
            base += st.getNumberOfRows
            s
          }.toSeq
        } finally reader.close()
      }
      .collect().toSeq
  }

  /** Child index in the file's root struct serving target field `f` —
    * by `iceberg.id` attribute when present, by name otherwise; -1 when
    * absent (read as null). */
  private def sourceIndex(root: TypeDescription, fieldId: Int, name: String): Int = {
    import scala.jdk.CollectionConverters._
    val names = root.getFieldNames.asScala
    val kids = root.getChildren.asScala
    val byId = kids.indexWhere(k =>
      Option(k.getAttributeValue("iceberg.id")).contains(fieldId.toString))
    if (byId >= 0) byId else names.indexOf(name)
  }

  /** Decode one vector cell into the external Spark value for `dt`. */
  private def cell(v: ColumnVector, row: Int, dt: DataType): Any = {
    val r = if (v.isRepeating) 0 else row
    if (!v.noNulls && v.isNull(r)) return null
    (v, dt) match {
      case (c: LongColumnVector, IntegerType) => c.vector(r).toInt
      case (c: LongColumnVector, LongType) => c.vector(r)
      case (c: LongColumnVector, BooleanType) => c.vector(r) != 0L
      case (c: LongColumnVector, DateType) =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(c.vector(r)))
      case (c: DoubleColumnVector, DoubleType) => c.vector(r)
      case (c: DoubleColumnVector, FloatType) => c.vector(r).toFloat
      case (c: BytesColumnVector, StringType) =>
        new String(c.vector(r), c.start(r), c.length(r), "UTF-8")
      case (c: BytesColumnVector, BinaryType) =>
        java.util.Arrays.copyOfRange(c.vector(r), c.start(r), c.start(r) + c.length(r))
      case (c: TimestampColumnVector, TimestampType | TimestampNTZType) =>
        val t = new java.sql.Timestamp(c.time(r))
        t.setNanos(c.nanos(r))
        t
      case (_, other) => throw new IllegalArgumentException(
        s"iceberg orc data: unsupported column type $other " +
          s"(vector ${v.getClass.getName}) for positional read")
    }
  }

  /** Distributed positional scan: target columns under `writeSchema`
    * plus (`fileCol` = the path as planned, `posCol` = per-file row
    * ordinal). The caller normalizes `fileCol` before joining deletes. */
  def readWithPos(spark: SparkSession, writeSchema: IceSchema,
      paths: Seq[String], fileCol: String, posCol: String): DataFrame = {
    val target = StructType(writeSchema.struct.fields :+
      StructField(fileCol, StringType, nullable = false) :+
      StructField(posCol, LongType, nullable = false))
    if (paths.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], target)
    val stripes = planStripes(spark, paths)
    if (stripes.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], target)
    val bcConf = spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))
    val fieldMeta: Seq[(Int, String, DataType)] =
      writeSchema.fields.map(f => (f.id, f.name, f.dataType))
    // one task per stripe: the reader's range option confines the read
    // to stripes whose start offset falls inside [offset, offset+length)
    // — exactly this stripe — and the emit counter starts at the
    // stripe's footer-derived first-row ordinal
    val rows = spark.sparkContext
      .parallelize(stripes, stripes.size)
      .flatMap { sl =>
        val reader = OrcFile.createReader(new Path(sl.path),
          OrcFile.readerOptions(bcConf.value.value))
        val root = reader.getSchema
        require(root.getCategory == TypeDescription.Category.STRUCT,
          s"iceberg orc data: ${sl.path} root type ${root.getCategory} is not a struct")
        val srcIdx: Array[Int] = fieldMeta.map { case (id, name, _) =>
          sourceIndex(root, id, name)
        }.toArray
        val rr = reader.rows(reader.options().range(sl.offset, sl.length))
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try rr.close() finally reader.close()
          })
        val batch = root.createRowBatch()
        new Iterator[Row] {
          private var inBatch = 0
          private var ordinal = sl.firstRow - 1L
          private var exhausted = false
          private def ensure(): Unit =
            while (!exhausted && inBatch >= batch.size) {
              if (rr.nextBatch(batch)) inBatch = 0 else exhausted = true
            }
          override def hasNext: Boolean = { ensure(); !exhausted }
          override def next(): Row = {
            ensure()
            val r = inBatch
            inBatch += 1
            ordinal += 1
            Row.fromSeq(fieldMeta.indices.map { i =>
              val si = srcIdx(i)
              if (si < 0) null else cell(batch.cols(si), r, fieldMeta(i)._3)
            } :+ sl.path :+ ordinal)
          }
        }
      }
    spark.createDataFrame(rows, target)
  }
}
