package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev utility (optimization guide §1): per-job / per-stage wall-clock and
  * shuffle-byte breakdown for named SparkEntry queries, with the bench's
  * setup/exec split. No caching, no result reuse — every run computes from
  * the parquet inputs exactly like the bench; this only LISTENS.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.StageProfile ann_ivf dedup_substring"
  */
object StageProfile {
  private case class StageRow(id: Int, name: String, tasks: Int,
      ms: Long, shufRead: Long, shufWrite: Long, input: Long,
      runMs: Long, cpuMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = mutable.Map[Int, StageRow]()
    val jobs = mutable.ArrayBuffer[(Int, String, Long, Long, Seq[Int])]() // id, desc, t0, t1, stageIds
    val jobStart = mutable.Map[Int, (String, Long, Seq[Int])]()
    val execSite = mutable.Map[Long, String]() // sql execution id -> root callsite
    val listener = new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execSite(e.executionId) = e.description.takeWhile(_ != '\n').take(90)
        case _ => ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
        val m = si.taskMetrics
        stages(si.stageId) = StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(90),
          si.numTasks, ms, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead,
          m.executorRunTime, m.executorCpuTime / 1000000L)
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart(js.jobId) = (Option(js.properties).flatMap(p =>
          Option(p.getProperty("spark.sql.execution.root.id"))
            .orElse(Option(p.getProperty("spark.sql.execution.id")))
            .flatMap(id => execSite.get(id.toLong))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse(""),
          js.time, js.stageIds.map(_.toInt).toSeq)
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach { case (d, t0, sids) =>
          jobs += ((je.jobId, d, t0, je.time, sids)) }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm up like the bench so query #1 doesn't absorb codegen cold-start
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      Thread.sleep(200) // let the async listener bus drain
      jobs.clear(); stages.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      val setupJobs = jobs.size // jobs fired during fn() = setup
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      Thread.sleep(200) // let the async listener bus drain
      println(f"\n===== $n  setup=${(t1 - t0) / 1e9}%.3fs  exec=${(t2 - t1) / 1e9}%.3fs " +
        f"jobs=${jobs.size} =====")
      // callsite attribution: jobs grouped by the action callsite of their
      // first stage — tells WHICH operator call pays the driver overhead
      val byCallsite = jobs.groupBy { case (_, d, _, _, sids) =>
        if (d.nonEmpty) d
        else sids.sorted.flatMap(stages.get).headOption.map(_.name).getOrElse("?") }
      byCallsite.toSeq.sortBy { case (_, js) => -js.map(j => j._4 - j._3).sum }
        .foreach { case (site, js) =>
          println(f"  SUM ${js.map(j => j._4 - j._3).sum / 1e3}%8.3fs over ${js.size}%3d jobs  $site") }
      jobs.zipWithIndex.foreach { case ((jid, desc, j0, j1, sids), i) =>
        val phase = if (i < setupJobs) "setup" else "exec "
        println(f"  [$phase] job $jid%4d ${(j1 - j0) / 1e3}%8.3fs  $desc")
        sids.sorted.foreach { sid =>
          stages.get(sid).foreach { st =>
            println(f"      stage ${st.id}%4d ${st.ms / 1e3}%8.3fs tasks=${st.tasks}%4d " +
              f"run=${st.runMs / 1e3}%7.3fs cpu=${st.cpuMs / 1e3}%7.3fs " +
              f"in=${st.input / 1024}%6dK sr=${st.shufRead / 1024}%6dK sw=${st.shufWrite / 1024}%6dK  ${st.name}")
          }
        }
      }
    }
    spark.stop()
  }
}
