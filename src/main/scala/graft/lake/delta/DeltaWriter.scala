package graft.lake.delta

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.ParquetStats

/** Minimal Delta Lake WRITER conforming to the published transaction
  * protocol (delta-io/delta PROTOCOL.md): parquet data files under
  * hive-style partition dirs, `_delta_log/%020d.json` commits of
  * newline-delimited actions, per-file `stats` JSON, classic
  * `%020d.checkpoint.parquet` + `_last_checkpoint`.
  *
  * Exists for the same two purposes as [[graft.lake.iceberg.IcebergWriter]]:
  * (a) round-trip receipts for [[DeltaTable]] — no Delta artifacts exist
  * in this sandbox, so the specs build REAL Delta layouts and read them
  * back; (b) an export seam. Intentionally narrow: create / append /
  * copy-on-write deleteWhere / checkpoint. Base protocol only
  * (minReaderVersion 1, minWriterVersion 2) — no column mapping, DVs,
  * or v2 checkpoints, which is exactly what the reader supports.
  */
final class DeltaWriter private (
    spark: SparkSession,
    val location: String,
    schema: StructType,
    partitionColumns: Seq[String]) {

  private val mapper = new ObjectMapper()
  private def conf: Configuration = spark.sessionState.newHadoopConf()
  private val root = new Path(location)
  private val fs = root.getFileSystem(conf)
  private val logDir = new Path(root, "_delta_log")

  private var version = -1L
  // live file state mirrored for checkpoint/deleteWhere: path -> (add node)
  private val live = scala.collection.mutable.LinkedHashMap[String, ObjectNode]()

  private def dataSchema: StructType =
    StructType(schema.fields.filterNot(f => partitionColumns.contains(f.name)))

  // ---- commits -------------------------------------------------------------

  private def commit(actions: Seq[ObjectNode]): Long = {
    version += 1
    val p = new Path(logDir, f"$version%020d.json")
    val out = fs.create(p, false) // commits never overwrite, per protocol
    try out.write(actions.map(mapper.writeValueAsString).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    version
  }

  private def protocolAction: ObjectNode = {
    val n = mapper.createObjectNode()
    val pr = n.putObject("protocol")
    pr.put("minReaderVersion", 1); pr.put("minWriterVersion", 2)
    n
  }

  private def metaAction: ObjectNode = {
    val n = mapper.createObjectNode()
    val m = n.putObject("metaData")
    m.put("id", java.util.UUID.randomUUID().toString)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", schema.json)
    val pc = m.putArray("partitionColumns")
    partitionColumns.foreach(pc.add)
    m.putObject("configuration")
    m.put("createdTime", 0L)
    n
  }

  /** Writes `df`'s rows as data files (hive dirs when partitioned,
    * partition columns dropped from the files per common writer
    * practice — partitionValues is authoritative) and returns their add
    * actions. */
  private def writeFiles(df: DataFrame): Seq[ObjectNode] = {
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(root, s"_tmp-$nonce")
    val writer = df.write.mode("overwrite")
    (if (partitionColumns.nonEmpty) writer.partitionBy(partitionColumns: _*)
     else writer).parquet(tmp.toString)
    val out = scala.collection.mutable.ArrayBuffer[ObjectNode]()
    var i = 0
    val it = fs.listFiles(tmp, true)
    val files = scala.collection.mutable.ArrayBuffer[Path]()
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) files += f
    }
    files.sortBy(_.toString).foreach { src =>
      val tmpQ = fs.makeQualified(tmp).toString
      val dirQ = fs.makeQualified(src.getParent).toString
      val rel = if (dirQ == tmpQ) "" else dirQ.stripPrefix(tmpQ + "/")
      val pvals: Seq[(String, String)] = rel.split("/").filter(_.contains("=")).toSeq.map { seg =>
        val eq = seg.indexOf('=')
        val k = seg.substring(0, eq)
        val v = seg.substring(eq + 1)
        k -> (if (v == "__HIVE_DEFAULT_PARTITION__") null else unescapeHive(v))
      }
      val destDir = if (rel.isEmpty) root else new Path(root, rel)
      fs.mkdirs(destDir)
      val dest = new Path(destDir, f"part-$nonce-$i%05d.parquet")
      require(fs.rename(src, dest), s"delta: rename $src -> $dest failed")
      i += 1
      val relPath = (if (rel.isEmpty) "" else s"$rel/") + dest.getName
      val (rows, stats) = ParquetStats.read(conf, dest)
      val n = mapper.createObjectNode()
      val a = n.putObject("add")
      a.put("path", relPath)
      val pv = a.putObject("partitionValues")
      pvals.foreach { case (k, v) =>
        if (v == null) pv.putNull(k) else pv.put(k, v)
      }
      a.put("size", fs.getFileStatus(dest).getLen)
      a.put("modificationTime", fs.getFileStatus(dest).getModificationTime)
      a.put("dataChange", true)
      // per-file stats JSON from the parquet footer (numRecords +
      // top-level min/max/nullCount, the columns FilePruner skips on)
      val st = mapper.createObjectNode()
      st.put("numRecords", rows)
      val minN = st.putObject("minValues")
      val maxN = st.putObject("maxValues")
      val nullN = st.putObject("nullCount")
      dataSchema.fields.foreach { f =>
        stats.get(f.name).foreach { cs =>
          nullN.put(f.name, cs.nulls)
          (cs.tag, f.dataType) match {
            case ("l", DateType) => // epoch days → ISO, the spec's form
              minN.put(f.name, java.time.LocalDate.ofEpochDay(cs.min.toLong).toString)
              maxN.put(f.name, java.time.LocalDate.ofEpochDay(cs.max.toLong).toString)
            case ("l", _) =>
              minN.put(f.name, cs.min.toLong); maxN.put(f.name, cs.max.toLong)
            case ("d", _) =>
              minN.put(f.name, cs.min.toDouble); maxN.put(f.name, cs.max.toDouble)
            case ("s", _) =>
              minN.put(f.name, cs.min); maxN.put(f.name, cs.max)
            case _ => ()
          }
        }
      }
      a.put("stats", mapper.writeValueAsString(st))
      out += n
    }
    fs.delete(tmp, true)
    out.toSeq
  }

  private def unescapeHive(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '%' && i + 3 <= s.length) {
        try { sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(ch); i += 1 }
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

  def append(df: DataFrame): Long = {
    val addsN = writeFiles(df.select(schema.fieldNames.map(col).toIndexedSeq: _*))
    addsN.foreach(n => live(n.get("add").get("path").asText()) = n)
    commit(addsN)
  }

  /** COPY-ON-WRITE delete (Delta's base-protocol delete): files that may
    * hold matching rows are rewritten without them; the commit removes
    * the old files and adds the rewrites. Untouched files are untouched
    * — O(affected files), not O(table). */
  def deleteWhere(cond: Column): Long = {
    val t = DeltaTable.load(spark, location)
    val affected = t.planFiles(Some(cond)).toSet
    if (affected.isEmpty) return version
    val affectedAdds = live.view.filterKeys(affected).values.toSeq
    // rewrite each affected partition group without the matching rows
    val byPart = affectedAdds.groupBy(n =>
      mapper.writeValueAsString(n.get("add").get("partitionValues")))
    val newAdds = scala.collection.mutable.ArrayBuffer[ObjectNode]()
    byPart.values.foreach { group =>
      val paths = group.map(n =>
        DeltaTable.resolve(location, n.get("add").get("path").asText()).toString)
      val pv = group.head.get("add").get("partitionValues")
      var df = spark.read.schema(dataSchema).parquet(paths: _*)
      // partition columns injected so `cond` can reference them
      partitionColumns.foreach { c =>
        val v = pv.get(c)
        val dt = schema(c).dataType
        df = df.withColumn(c,
          (if (v == null || v.isNull) lit(null) else lit(v.asText())).cast(dt))
      }
      // DELETE keeps rows where the predicate is NULL (tri-state SQL):
      // bare `!cond` would evaluate null and drop them
      val remaining = df.filter(!coalesce(cond, lit(false)))
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
      if (!remaining.isEmpty) newAdds ++= writeFiles(remaining)
    }
    val removes = affectedAdds.map { n =>
      val r = mapper.createObjectNode()
      val rm = r.putObject("remove")
      rm.put("path", n.get("add").get("path").asText())
      rm.put("deletionTimestamp", 0L)
      rm.put("dataChange", true)
      r
    }
    affectedAdds.foreach(n => live.remove(n.get("add").get("path").asText()))
    newAdds.foreach(n => live(n.get("add").get("path").asText()) = n)
    commit(removes ++ newAdds.toSeq)
  }

  /** Classic single-file checkpoint of the CURRENT state + the
    * `_last_checkpoint` pointer — what lets a reader skip the log
    * prefix. */
  def checkpoint(): Unit = {
    require(version >= 0, "delta: nothing to checkpoint")
    // rows: one protocol, one metaData, one per live add — built under
    // an explicit checkpoint schema (nullable structs per action type)
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType, true)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))
    val protoType = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val metaType = StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType, true))))
    val cpSchema = StructType(Seq(
      StructField("protocol", protoType, true),
      StructField("metaData", metaType, true),
      StructField("add", addType, true)))
    import org.apache.spark.sql.Row
    val protoRow = Row(Row(1, 2), null, null)
    val metaRow = Row(null,
      Row(java.util.UUID.randomUUID().toString, schema.json,
        partitionColumns, Map.empty[String, String]), null)
    val addRows = live.values.toSeq.map { n =>
      val a = n.get("add")
      val pvIt = a.get("partitionValues").fields()
      val pv = scala.collection.mutable.Map[String, String]()
      while (pvIt.hasNext) {
        val e = pvIt.next()
        pv(e.getKey) = if (e.getValue.isNull) null else e.getValue.asText()
      }
      Row(null, null, Row(a.get("path").asText(), pv.toMap,
        a.get("size").asLong(), a.get("modificationTime").asLong(),
        true, a.get("stats").asText()))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(protoRow +: metaRow +: addRows, 1), cpSchema)
    val tmp = new Path(root, s"_cp-tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val it = fs.listFiles(tmp, true)
      var found: Path = null
      while (it.hasNext && found == null) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) found = f
      }
      found
    }
    val dest = new Path(logDir, f"$version%020d.checkpoint.parquet")
    require(fs.rename(part, dest), s"delta: checkpoint rename failed")
    fs.delete(tmp, true)
    val lc = mapper.createObjectNode()
    lc.put("version", version)
    lc.put("size", live.size.toLong + 2)
    val out = fs.create(new Path(logDir, "_last_checkpoint"), true)
    try out.write(mapper.writeValueAsString(lc).getBytes("UTF-8"))
    finally out.close()
  }
}

object DeltaWriter {
  /** Fresh table at `location` (cleared first): version 0 carries
    * protocol + metaData, per the protocol's creation shape. */
  def create(spark: SparkSession, location: String, schema: StructType,
      partitionColumns: Seq[String] = Nil): DeltaWriter = {
    val p = new Path(location)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    fs.mkdirs(new Path(p, "_delta_log"))
    val w = new DeltaWriter(spark, location, schema, partitionColumns)
    w.commit(Seq(w.protocolAction, w.metaAction))
    w
  }
}
