package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.lake.hudi.{HudiTable, HudiWriter}

/** Round-trip receipts for the Hudi COPY_ON_WRITE reader: the sandbox
  * has no Hudi artifacts, so [[HudiWriter]] builds REAL layouts
  * (timeline .commit JSON, fileId_writeToken_instant base files with the
  * five _hoodie_* meta columns, hoodie.properties) and [[HudiTable]]
  * reads them back. */
class HudiSpec extends AnyFunSuite {
  import TestSpark._

  private def dir(name: String): String =
    s"/root/repo/target/graft-hudi-test/$name"

  private def freshDir(name: String): String = {
    val p = new Path(dir(name))
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    dir(name)
  }

  test("insert round-trip; schema drops the hudi meta columns") {
    val n = Tables.nation(spark, sf)
    val w = HudiWriter.create(spark, freshDir("roundtrip"), n.schema,
      keyField = "n_nationkey")
    w.insert(n)
    val t = HudiTable.load(spark, dir("roundtrip"))
    assert(t.schema.fieldNames.toSeq == n.schema.fieldNames.toSeq)
    assert(t.scan().orderBy("n_nationkey").collect().toSeq ==
      n.orderBy("n_nationkey").collect().toSeq)
  }

  test("partition pruning via timeline file slices, no data-dir listing") {
    val n = Tables.nation(spark, sf)
    val w = HudiWriter.create(spark, freshDir("prune"), n.schema,
      partitionFields = Seq("n_regionkey"), keyField = "n_nationkey")
    w.insert(n)
    val t = HudiTable.load(spark, dir("prune"))
    val all = t.planFiles()
    val kept = t.planFiles(Some(col("n_regionkey") === 2))
    assert(all.size == 5, s"expected 5 file groups, got ${all.size}")
    assert(kept.size == 1, s"pruning kept ${kept.size} of ${all.size}")
    assert(t.scan(Some(col("n_regionkey") === 2)).count() ==
      n.filter(col("n_regionkey") === 2).count())
  }

  test("COW upsert rewrites matched file groups as new slices, same fileId") {
    val n = Tables.nation(spark, sf)
    val w = HudiWriter.create(spark, freshDir("upsert"), n.schema,
      partitionFields = Seq("n_regionkey"), keyField = "n_nationkey")
    val t0instant = w.insert(n)
    val before = HudiTable.load(spark, dir("upsert")).planFiles().toSet
    // update two nations in region 2, insert one brand-new key
    import spark.implicits._
    val updates = n.filter(col("n_regionkey") === 2).limit(2)
      .withColumn("n_name", lit("RENAMED"))
      .unionByName(Seq((99, "ATLANTIS", 2)).toDF(
        "n_nationkey", "n_name", "n_regionkey")
        .select(n.columns.map(col).toIndexedSeq: _*))
    w.upsert(updates)
    val t = HudiTable.load(spark, dir("upsert"))
    val after = t.planFiles().toSet
    // the region-2 group was replaced by a same-fileId later slice, and
    // one new group appeared for the fresh key
    assert((before -- after).size == 1)
    assert((after -- before).size == 2)
    val removedId = (before -- after).head.split("/").last.split("_").head
    assert((after -- before).exists(_.split("/").last.split("_").head == removedId),
      "same fileId must reappear at a later instant")
    assert(t.scan().count() == n.count() + 1)
    assert(t.scan(Some(col("n_name") === "RENAMED")).count() == 2)
    // time travel: as of the first instant, the updates are invisible
    val t0 = HudiTable.loadAsOf(spark, dir("upsert"), t0instant)
    assert(t0.scan().orderBy("n_nationkey").collect().toSeq ==
      n.orderBy("n_nationkey").collect().toSeq)
  }

  test("MERGE_ON_READ tables are rejected, not misread") {
    val n = Tables.nation(spark, sf)
    val loc = freshDir("mor")
    HudiWriter.create(spark, loc, n.schema, keyField = "n_nationkey")
    // forge the table type
    val p = new Path(loc, ".hoodie/hoodie.properties")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val props = new java.util.Properties()
    val in = fs.open(p); try props.load(in) finally in.close()
    props.setProperty("hoodie.table.type", "MERGE_ON_READ")
    val out = fs.create(p, true)
    try props.store(out, "forged") finally out.close()
    val e = intercept[IllegalArgumentException] { HudiTable.load(spark, loc) }
    assert(e.getMessage.contains("MERGE_ON_READ"))
  }

  test("timelines with replacecommit/savepoint/restore instants are rejected") {
    // a completed replacecommit (clustering / insert_overwrite — legal
    // on COW tables) changes which file groups are live; a reader that
    // only replays .commit would silently serve the replaced groups
    val n = Tables.nation(spark, sf)
    val loc = freshDir("replace")
    val w = HudiWriter.create(spark, loc, n.schema, keyField = "n_nationkey")
    w.insert(n)
    val p = new Path(loc, ".hoodie/20990101000000000.replacecommit")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, false)
    try out.write("{}".getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalArgumentException] { HudiTable.load(spark, loc) }
    assert(e.getMessage.contains("replacecommit"))
  }
}
