package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SQLContext

/** `maxCommitsPerTrigger` admission control for graft's V1 streaming
  * sources (`graft-table`, `iceberg-incremental`, `delta-cdf`,
  * `hudi-incremental`) — the equivalent of the file source's
  * `maxFilesPerTrigger`: a stream catching up on a long backlog admits at
  * most N commits per micro-batch instead of folding the entire backlog
  * (or, on a cold start, the whole table PLUS the backlog) into ONE
  * batch — at 100 TB that single batch is the difference between a
  * bounded catch-up and an executor-OOM/shuffle-explosion restart loop.
  * All four sources' offsets are monotonic per-table ordinals (graft
  * snapshot id on its lineage / iceberg sequence number / delta version /
  * hudi instant), so the cap just selects the k-th next ordinal from the
  * metadata the source already lists for `getOffset`.
  *
  * Recovery safety: a capped offset must never run BEHIND a checkpointed
  * one — Spark would commit the regressed offset and re-deliver commits.
  * The cap base is therefore the last batch end this source instance has
  * seen (`noteBatchEnd`; Spark replays the pending batch on restart
  * before asking for new offsets), and only a source created against a
  * checkpoint with NO prior offsets may cap from its starting ordinal
  * (the bounded cold start). A restored source that has not yet seen a
  * batch serves the latest offset uncapped — correct, merely unthrottled
  * for that one batch.
  *
  * `Trigger.AvailableNow` captures the source's offset once at start, so
  * a capped source processes maxCommitsPerTrigger commits per RUN under
  * it; use the default/processing-time trigger (or rerun) for a full
  * throttled catch-up.
  */
private[graftshim] final class AdmissionControl(
    maxCommits: Option[Int], capFromStart: Boolean, starting: Long) {

  private var admitted: Option[Long] = None

  def noteBatchEnd(end: Long): Unit =
    admitted = Some(admitted.fold(end)(math.max(_, end)))

  /** The offset boundary to expose for `latest`, given `ordinalsAfter`
    * = base → the commit ordinals strictly after it, ascending. */
  def admit(latest: Long, ordinalsAfter: Long => Seq[Long]): Long =
    maxCommits match {
      case None => latest
      case Some(m) =>
        admitted.orElse(if (capFromStart) Some(starting) else None) match {
          case None => latest // restored, no replay seen yet: no safe base
          case Some(b) if latest <= b => latest
          case Some(b) =>
            val next = ordinalsAfter(b).take(m)
            val boundary = if (next.isEmpty) latest else next.last
            admitted = Some(math.max(b, boundary))
            boundary
        }
    }
}

private[graftshim] object AdmissionControl {
  def apply(parameters: Map[String, String], metadataPath: String,
      sqlContext: SQLContext, starting: Long): AdmissionControl = {
    val max = parameters.get("maxCommitsPerTrigger").map { raw =>
      val n = raw.toInt
      require(n > 0, s"maxCommitsPerTrigger must be a positive int, got '$raw'")
      n
    }
    // metadataPath = <checkpoint>/sources/<i>; prior entries under
    // <checkpoint>/offsets mean this is a RESTART — never cap below a
    // checkpointed offset this instance cannot see
    val fresh =
      try {
        val offsets = new Path(metadataPath).getParent.getParent
        val dir = new Path(offsets, "offsets")
        val fs = dir.getFileSystem(
          sqlContext.sparkSession.sessionState.newHadoopConf())
        !fs.exists(dir) || fs.listStatus(dir).isEmpty
      } catch { case _: Throwable => false }
    new AdmissionControl(max, capFromStart = fresh, starting)
  }
}
