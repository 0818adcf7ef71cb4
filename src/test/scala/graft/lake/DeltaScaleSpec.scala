package graft.lake

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.delta.{DeltaTable, DeltaWriter}

/** Distributed Delta snapshot-state reconstruction (r13, VERDICT r12 #1):
  * past `spark.graft.delta.stateCollectThresholdBytes` of checkpoint
  * parquet, the add-action payload must NEVER funnel through a driver
  * collect at load time — state stays in the checkpoint/sidecar parquet
  * and each scan replays it as a Spark job with the query predicate
  * pushed into the replay, collecting only surviving entries.
  *
  * Receipt style follows MigrateSpec: force both modes on the same log
  * (threshold 0 vs huge) and pin (a) bit-identical results across every
  * read surface, (b) the lazy replay actually runs as a Spark JOB while
  * the eager path runs none, (c) a predicate collects only the pruned
  * survivor set on a multi-10⁴-file checkpoint. */
class DeltaScaleSpec extends AnyFunSuite {
  import TestSpark._

  private val ThresholdKey = "spark.graft.delta.stateCollectThresholdBytes"

  private def freshDir(name: String): String = {
    val d = s"/root/repo/target/graft-delta-scale-test/$name"
    val p = new Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  private def withThreshold[T](bytes: Long)(body: => T): T = {
    spark.conf.set(ThresholdKey, bytes.toString)
    try body finally spark.conf.unset(ThresholdKey)
  }

  /** Count Spark jobs started by `body` (job-group bookkeeping; the
    * status store is fed async, so give the bus a moment to drain). */
  private def jobsDuring[T](body: => T): (T, Int) = {
    val group = s"delta-scale-receipt-${System.nanoTime()}"
    spark.sparkContext.setJobGroup(group, "receipt", false)
    val r = try body finally spark.sparkContext.clearJobGroup()
    val deadline = System.currentTimeMillis() + 5000
    var n = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    while (System.currentTimeMillis() < deadline && {
        Thread.sleep(50)
        val m = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
        val grew = m > n; n = m; grew
      }) {}
    (r, n)
  }

  test("lazy replay matches eager state bit-for-bit (real table: checkpoint + tail commits)") {
    val loc = freshDir("parity")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("p", StringType),
      StructField("v", DoubleType)))
    val w = DeltaWriter.create(spark, loc, schema, Seq("p"))
    import spark.implicits._
    def batch(r: Range) =
      r.map(i => (i.toLong, s"p${i % 5}", i * 1.5)).toDF("id", "p", "v")
    w.append(batch(0 until 500))
    w.append(batch(500 until 1000))
    w.deleteWhere(col("id") < 100) // removes + rewrites land in the checkpoint
    w.checkpoint()
    w.append(batch(1000 until 1200)) // post-checkpoint tail add
    w.deleteWhere(col("p") === "p3" && col("id") >= 1100) // tail removes + re-add

    val eager = withThreshold(Long.MaxValue >> 1)(DeltaTable.load(spark, loc))
    val lz = withThreshold(0L)(DeltaTable.load(spark, loc))
    val pred = Some(col("p") === "p2")

    assert(eager.planFiles().toSet == lz.planFiles().toSet)
    assert(eager.planFiles(pred).toSet == lz.planFiles(pred).toSet)
    assert(lz.planFiles(pred).size < lz.planFiles().size,
      "partition predicate must prune the replay")
    assert(eager.scanStats() == lz.scanStats())
    assert(eager.scanStats(pred) == lz.scanStats(pred))
    assert(eager.scan().collect().toSet == lz.scan().collect().toSet)
    assert(eager.scan(pred).collect().toSet == lz.scan(pred).collect().toSet)
    assert(eager.filesDf.collect().toSeq == lz.filesDf.collect().toSeq)
    assert(eager.partitionsDf.collect().toSeq == lz.partitionsDf.collect().toSeq)

    // the CDF remove-resolver probe: named-path lookups agree across
    // modes and return ONLY the named live paths (lazy mode ships the
    // wanted set to the replay instead of materializing the estate)
    val live2 = eager.planFiles().take(2).toSet
    val probe = live2 + "not/a/file.parquet"
    assert(lz.addsFor(probe).keySet == live2)
    assert(lz.addsFor(probe).view.mapValues(_.size).toMap ==
      eager.addsFor(probe).view.mapValues(_.size).toMap)

    // metadata-only aggregates: the r13 distributed fold answers
    // COUNT/MIN/MAX from log stats alone in BOTH modes — prove zero
    // data IO by destroying the data files first (the DecimalInteropSpec
    // technique), then pin lazy == eager == the pre-deletion answer
    val aggSql = s"SELECT count(*) AS n, count(v) AS nv, " +
      s"min(id) AS mn, max(id) AS mx FROM `graft-delta`.`$loc`"
    val expectAgg = spark.sql(aggSql).collect().toSeq
    val fs = new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(new Path(loc)).filter(_.getPath.getName.startsWith("p="))
      .foreach(st => fs.delete(st.getPath, true))
    val eagerAgg = withThreshold(Long.MaxValue >> 1)(
      spark.sql(aggSql).collect().toSeq)
    val lazyAgg = withThreshold(0L)(spark.sql(aggSql).collect().toSeq)
    assert(eagerAgg == expectAgg, "eager metadata agg must answer without data")
    assert(lazyAgg == expectAgg, "lazy fold must answer without data")
  }

  test("multi-10k-file checkpoint: replay is a distributed job collecting only predicate survivors") {
    val loc = freshDir("bigcp")
    val conf = spark.sessionState.newHadoopConf()
    val logDir = new Path(loc, "_delta_log")
    val fs = logDir.getFileSystem(conf)
    fs.mkdirs(logDir)
    val mapper = new ObjectMapper()
    val tblSchema = StructType(Seq(
      StructField("id", LongType), StructField("p", StringType)))
    val schemaStr = mapper.writeValueAsString(tblSchema.json) // JSON-escaped

    def writeText(name: String, text: String): Unit = {
      val out = fs.create(new Path(logDir, name), true)
      try out.write(text.getBytes("UTF-8")) finally out.close()
    }
    // commit 0: protocol + metaData (the checkpoint carries them too)
    val metaJson =
      s"""{"metaData":{"id":"big","format":{"provider":"parquet"},""" +
        s""""schemaString":$schemaStr,"partitionColumns":["p"],""" +
        s""""configuration":{}}}"""
    writeText("00000000000000000000.json",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" + "\n" +
        metaJson + "\n")

    // synthesize a 20,000-add checkpoint parquet DIRECTLY (planning never
    // opens data files, so the add paths need not exist)
    val nFiles = 20000
    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType, true)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))
    val protoT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType, true))))
    val cpSchema = StructType(Seq(
      StructField("protocol", protoT, true),
      StructField("metaData", metaT, true),
      StructField("add", addT, true)))
    def addRow(i: Int): Row = Row(null, null, Row(
      f"p=p${i % 10}%s/part-$i%05d.parquet", Map("p" -> s"p${i % 10}"),
      1000L, 0L, true,
      s"""{"numRecords":10,"minValues":{"id":$i},"maxValues":{"id":$i},"nullCount":{"id":0}}"""))
    val rows =
      Row(Row(1, 2), null, null) +:
        Row(null, Row("big", tblSchema.json, Seq("p"), Map.empty[String, String]), null) +:
        (0 until nFiles).map(addRow)
    val tmp = freshDir("bigcp-tmp")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), cpSchema)
      .coalesce(1).write.parquet(tmp)
    val part = fs.listStatus(new Path(tmp)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new Path(logDir, "00000000000000000000.checkpoint.parquet"))

    // commit 1: a bounded tail — 3 removes, 2 re-adds
    val tail =
      """{"remove":{"path":"p=p0/part-00000.parquet","deletionTimestamp":0,"dataChange":true}}""" + "\n" +
        """{"remove":{"path":"p=p1/part-00001.parquet","deletionTimestamp":0,"dataChange":true}}""" + "\n" +
        """{"remove":{"path":"p=p2/part-00002.parquet","deletionTimestamp":0,"dataChange":true}}""" + "\n" +
        """{"add":{"path":"p=p0/part-tail-a.parquet","partitionValues":{"p":"p0"},"size":10,"modificationTime":0,"dataChange":true,"stats":"{\"numRecords\":1}"}}""" + "\n" +
        """{"add":{"path":"p=p2/part-00002.parquet","partitionValues":{"p":"p2"},"size":77,"modificationTime":0,"dataChange":true,"stats":"{\"numRecords\":5}"}}""" + "\n"
    writeText("00000000000000000001.json", tail)

    val lz = withThreshold(0L)(DeltaTable.load(spark, loc))
    val eager = withThreshold(Long.MaxValue >> 1)(DeltaTable.load(spark, loc))

    // full live set: 20000 - 3 removed + 2 tail adds (one a re-add)
    val (allLazy, lazyJobs) = jobsDuring(lz.planFiles())
    val (allEager, eagerJobs) = jobsDuring(eager.planFiles())
    assert(allEager.toSet == allLazy.toSet)
    assert(allLazy.size == nFiles - 3 + 2)
    assert(lazyJobs >= 1, "lazy replay must run as a Spark job")
    assert(eagerJobs == 0, "eager planning must stay a driver walk")

    // predicate-pruned replay: only p=p7 survivors ever reach the driver
    val pred = Some(col("p") === "p7")
    val prunedLazy = lz.planFiles(pred)
    assert(prunedLazy.toSet == eager.planFiles(pred).toSet)
    assert(prunedLazy.size == nFiles / 10,
      s"expected ${nFiles / 10} p7 survivors, got ${prunedLazy.size}")
    // stats pruning rides the same executor-side walk: exactly one
    // checkpoint file can hold id=12345; the two tail adds carry no id
    // bounds, so the conservative walk keeps them (and only them) too
    val statPred = Some(col("id") === 12345L)
    val statFiles = lz.planFiles(statPred)
    assert(statFiles.contains("p=p5/part-12345.parquet"))
    assert(statFiles.size == 3, s"one stats survivor + two bound-less tail adds: $statFiles")
    assert(statFiles.toSet == eager.planFiles(statPred).toSet)

    // re-added path takes the TAIL's metadata (size 77), not the checkpoint's
    assert(lz.scanStats(Some(col("p") === "p2"))._1 ==
      eager.scanStats(Some(col("p") === "p2"))._1)

    // metadata views stay distributed and identical
    assert(lz.filesDf.count() == nFiles - 3 + 2)
    assert(lz.partitionsDf.collect().toSeq == eager.partitionsDf.collect().toSeq)
  }
}
