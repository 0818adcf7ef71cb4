package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.delta.{DeltaTable, DeltaWriter}
import graft.lake.hudi.{HudiTable, HudiWriter}
import graft.lake.iceberg.{IcebergTable, IcebergWriter}

/** Batch CHANGE QUERIES through the DSv2 interop connectors
  * ([[graft.lake.sql.InteropSources]]): each format's own batch reader
  * conventions resolve to the existing change APIs —
  *
  *  - `graft-iceberg`: `start-snapshot-id`/`end-snapshot-id` →
  *    [[IcebergTable.incrementalAppends]]
  *  - `graft-delta`: `readChangeFeed` + `startingVersion`/`endingVersion`
  *    → [[DeltaTable.changes]]
  *  - `graft-hudi`: `query.type=incremental` + `begin/end.instanttime` →
  *    [[HudiTable.incrementalFrom]] bounded at `end`
  *
  * Receipts: row parity with the Scala API, range bounding, loud option
  * conflicts, read-only enforcement, and (iceberg) file pruning of a
  * WHERE through the native-scan substitution. */
class InteropChangeReadSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = s"/root/repo/target/graft-interop-change-test/$name"
    val p = new Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  private def rows(n0: Int, n1: Int, pmod: Int = 3): DataFrame =
    spark.range(n0, n1)
      .select(col("id"), (col("id") % pmod).cast("int").as("p"),
        concat(lit("v"), col("id")).as("v"))

  /** Order-insensitive frame equality. */
  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.sorted.sameElements(b.columns.sorted),
      s"columns differ: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val bb = b.select(a.columns.map(col).toIndexedSeq: _*)
    assert(a.exceptAll(bb).isEmpty && bb.exceptAll(a).isEmpty,
      "row sets differ")
  }

  // ---------------------------------------------------------------- iceberg

  test("iceberg: start/end-snapshot-id options serve incrementalAppends") {
    val loc = freshDir("ice_inc")
    val w = IcebergWriter.create(spark, loc, rows(0, 1).schema,
      partition = Seq("p" -> "identity"))
    val s1 = w.append(rows(0, 40))
    val s2 = w.append(rows(40, 70))
    val s3 = w.append(rows(70, 100))
    val t = IcebergTable.load(spark, loc)

    val viaOpts = spark.read.format("graft-iceberg")
      .option("start-snapshot-id", s1).load(loc)
    sameRows(viaOpts, t.incrementalAppends(s1))
    assert(viaOpts.count() == 60)

    val bounded = spark.read.format("graft-iceberg")
      .option("start-snapshot-id", s1).option("end-snapshot-id", s2).load(loc)
    sameRows(bounded, t.incrementalAppends(s1, s2))
    assert(bounded.count() == 30)
    assert(bounded.select("_snapshot_id").distinct().as[Long].collect()
      .toSet == Set(s2))
    assert(s3 > 0) // silence unused warning; s3 rows excluded above
  }

  test("iceberg: a WHERE on the partition column prunes incremental files") {
    val loc = freshDir("ice_inc_prune")
    val w = IcebergWriter.create(spark, loc, rows(0, 1).schema,
      partition = Seq("p" -> "identity"))
    val s1 = w.append(rows(0, 40))
    w.append(rows(40, 100))
    def planned(df: DataFrame): Int = graft.lake.sql.PlanFiles.planned(df)
    val all = spark.read.format("graft-iceberg")
      .option("start-snapshot-id", s1).load(loc)
    val one = all.filter(col("p") === 1)
    assert(one.count() == 20)
    assert(planned(one) < planned(all),
      s"partition WHERE must prune incremental files " +
        s"(${planned(one)} of ${planned(all)})")
  }

  test("iceberg: conflicting / dangling snapshot options reject loudly") {
    val loc = freshDir("ice_inc_opts")
    val w = IcebergWriter.create(spark, loc, rows(0, 1).schema)
    val s1 = w.append(rows(0, 10))
    intercept[IllegalArgumentException] {
      spark.read.format("graft-iceberg").option("start-snapshot-id", s1)
        .option("snapshot-id", s1).load(loc).collect()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-iceberg").option("end-snapshot-id", s1)
        .load(loc).collect()
    }
  }

  test("iceberg: an incremental resolution is read-only") {
    val loc = freshDir("ice_inc_ro")
    val w = IcebergWriter.create(spark, loc, rows(0, 1).schema)
    val s1 = w.append(rows(0, 10))
    // read-only resolutions advertise no write capability, so Spark
    // refuses the append before any data moves (same posture the
    // time-travel write rejection pins in InteropSqlSpec)
    intercept[Throwable] {
      rows(10, 20).write.format("graft-iceberg")
        .option("start-snapshot-id", s1).mode("append").save(loc)
    }
    assert(IcebergTable.load(spark, loc).scan().count() == 10,
      "rejected write must not have landed rows")
  }

  // ------------------------------------------------------------------ delta

  test("delta: readChangeFeed options serve changes() with bounds") {
    val loc = freshDir("delta_cdf")
    val d = rows(0, 100)
    val w = DeltaWriter.create(spark, loc, d.schema,
      partitionColumns = Seq("p"), enableCdf = true)
    w.append(d)                                                   // v1
    w.updateWhere(col("id") % 10 === 0, Map("v" -> lit("upd")))   // v2
    w.deleteWhere(col("id") % 7 === 0)                            // v3

    val viaOpts = spark.read.format("graft-delta")
      .option("readChangeFeed", "true").option("startingVersion", 1L)
      .load(loc)
    sameRows(viaOpts, DeltaTable.changes(spark, loc, 1L, 3L)) // default end
    val bounded = spark.read.format("graft-delta")
      .option("readChangeFeed", "true").option("startingVersion", 2L)
      .option("endingVersion", 2L).load(loc)
    sameRows(bounded, DeltaTable.changes(spark, loc, 2L, 2L))
    assert(bounded.select("_change_type").distinct().as[String].collect()
      .toSet == Set("update_preimage", "update_postimage"))
  }

  test("delta: CDF option conflicts reject loudly") {
    val loc = freshDir("delta_cdf_opts")
    val d = rows(0, 10)
    val w = DeltaWriter.create(spark, loc, d.schema, enableCdf = true)
    w.append(d)
    intercept[IllegalArgumentException] { // combined with time travel
      spark.read.format("graft-delta").option("readChangeFeed", "true")
        .option("startingVersion", 1L).option("versionAsOf", 1L)
        .load(loc).collect()
    }
    intercept[IllegalArgumentException] { // missing startingVersion
      spark.read.format("graft-delta").option("readChangeFeed", "true")
        .load(loc).collect()
    }
    intercept[IllegalArgumentException] { // dangling startingVersion
      spark.read.format("graft-delta").option("startingVersion", 1L)
        .load(loc).collect()
    }
  }

  // ------------------------------------------------------------------- hudi

  test("hudi: query.type=incremental serves incrementalFrom with bounds") {
    val loc = freshDir("hudi_inc")
    val d = rows(0, 100)
    val w = HudiWriter.create(spark, loc, d.schema,
      partitionFields = Seq("p"), keyField = "id")
    val base = w.insert(d)
    val first = w.upsert(d.filter(col("id") % 5 === 0)
      .withColumn("v", lit("first")))
    w.upsert(d.filter(col("id") % 25 === 0).withColumn("v", lit("second")))

    val t = HudiTable.load(spark, loc)
    val viaOpts = spark.read.format("graft-hudi")
      .option("query.type", "incremental")
      .option("begin.instanttime", base).load(loc)
    sameRows(viaOpts, t.incrementalFrom(base))
    // long hoodie.datasource.* aliases resolve identically
    val viaLong = spark.read.format("graft-hudi")
      .option("hoodie.datasource.query.type", "incremental")
      .option("hoodie.datasource.read.begin.instanttime", base).load(loc)
    sameRows(viaLong, t.incrementalFrom(base))
    // end-bounded: as of `first`, the second upsert is invisible
    val bounded = spark.read.format("graft-hudi")
      .option("query.type", "incremental")
      .option("begin.instanttime", base)
      .option("end.instanttime", first).load(loc)
    sameRows(bounded,
      HudiTable.loadAsOf(spark, loc, first).incrementalFrom(base))
    assert(bounded.select("v").distinct().as[String].collect()
      .toSet == Set("first"))
    assert(bounded.count() == 20)
  }

  test("hudi: incremental option conflicts reject loudly") {
    val loc = freshDir("hudi_inc_opts")
    val d = rows(0, 10)
    val w = HudiWriter.create(spark, loc, d.schema, keyField = "id")
    val i1 = w.insert(d)
    intercept[IllegalArgumentException] { // combined with as.of.instant
      spark.read.format("graft-hudi").option("query.type", "incremental")
        .option("begin.instanttime", i1).option("as.of.instant", i1)
        .load(loc).collect()
    }
    intercept[IllegalArgumentException] { // dangling begin.instanttime
      spark.read.format("graft-hudi").option("begin.instanttime", i1)
        .load(loc).collect()
    }
    intercept[IllegalArgumentException] { // missing begin: a full-table
      // read must never be silently served as a change pull
      spark.read.format("graft-hudi").option("query.type", "incremental")
        .load(loc).collect()
    }
  }
}
