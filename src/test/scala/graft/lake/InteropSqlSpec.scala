package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.lake.delta.DeltaWriter
import graft.lake.hudi.HudiWriter
import graft.lake.iceberg.IcebergWriter

/** DSv2 batch read connectors for the interop formats (r11) — the
  * reference's headline usage is plain SQL over an Iceberg table
  * (pg_lakehouse_iceberg/README.md:40-58), so the connector surface and
  * its pushdown/broadcast behavior get plan-audit receipts here:
  *  - `spark.read.format("graft-*").load(path)` returns the same rows as
  *    the Scala API for all three formats,
  *  - WHERE filters appear in `PushedFilters` of the produced scan (file
  *    pruning happens inside the bridged plan),
  *  - column pruning narrows `ReadSchema` of the inner parquet scan,
  *  - metadata-derived `estimateStatistics` makes a small interop table
  *    BROADCAST in a join (without it the V1 bridge reports "huge"),
  *  - time-travel reader options hit the right snapshot per format,
  *  - direct SQL over the path (`` FROM `graft-iceberg`.`loc` ``)
  *    resolves through [[graft.lake.sql.GraftInteropPathRule]]. */
class InteropSqlSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val d = s"/root/repo/target/graft-interop-sql-test/$name"
    val p = new Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  private lazy val orders = Tables.orders(spark, sf)

  test("graft-iceberg reader: rows match Scala API; filter pushes; ref time travel") {
    val loc = freshDir("ice")
    val w = IcebergWriter.create(spark, loc, orders.schema,
      partition = Seq("o_orderstatus" -> "identity"))
    val s1 = w.append(orders.filter(col("o_orderkey") % 2 === 0))
    w.append(orders.filter(col("o_orderkey") % 2 === 1))
    w.tag("halfway", s1)

    val df = spark.read.format("graft-iceberg").load(loc)
    assert(df.count() == orders.count())

    val q = df.filter(col("o_orderstatus") === "F").select("o_orderkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderstatus"),
      s"filter must reach the DSv2 scan:\n$plan")

    val tagged = spark.read.format("graft-iceberg")
      .option("ref", "halfway").load(loc)
    assert(tagged.count() == orders.filter(col("o_orderkey") % 2 === 0).count())
    val bySnap = spark.read.format("graft-iceberg")
      .option("snapshot-id", s1.toString).load(loc)
    assert(bySnap.count() == tagged.count())
  }

  test("graft-delta reader: versionAsOf option and direct SQL on path") {
    val loc = freshDir("delta")
    val w = DeltaWriter.create(spark, loc, orders.schema)
    w.append(orders.filter(col("o_orderkey") % 2 === 0)) // v1
    w.append(orders.filter(col("o_orderkey") % 2 === 1)) // v2

    val cur = spark.read.format("graft-delta").load(loc)
    assert(cur.count() == orders.count())
    val v1 = spark.read.format("graft-delta").option("versionAsOf", "1").load(loc)
    assert(v1.count() == orders.filter(col("o_orderkey") % 2 === 0).count())

    // direct SQL over the path — the GraftInteropPathRule surface
    val n = spark.sql(s"SELECT count(*) AS n FROM `graft-delta`.`$loc`")
      .head().getLong(0)
    assert(n == orders.count())
    val filtered = spark.sql(
      s"SELECT o_orderkey FROM `graft-delta`.`$loc` WHERE o_orderstatus = 'F'")
    assert(filtered.count() ==
      orders.filter(col("o_orderstatus") === "F").count())
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderstatus"),
      s"SQL WHERE must reach the DSv2 scan:\n$plan")
  }

  test("graft-hudi reader: as.of.instant + read_optimized query type") {
    val loc = freshDir("hudi")
    val w = HudiWriter.create(spark, loc, orders.schema,
      partitionFields = Seq("o_orderstatus"), keyField = "o_orderkey",
      tableType = "MERGE_ON_READ")
    val i1 = w.insert(orders)
    w.deleteLogWhere(col("o_orderpriority") === "1-URGENT")

    val cur = spark.read.format("graft-hudi").load(loc)
    assert(cur.count() ==
      orders.filter(col("o_orderpriority") =!= "1-URGENT").count())
    val pre = spark.read.format("graft-hudi").option("as.of.instant", i1).load(loc)
    assert(pre.count() == orders.count())
    // read_optimized ignores the uncompacted delete log
    val ro = spark.read.format("graft-hudi")
      .option("query.type", "read_optimized").load(loc)
    assert(ro.count() == orders.count())
    intercept[IllegalArgumentException] {
      spark.read.format("graft-hudi").option("query.type", "bogus").load(loc)
    }
  }

  test("interop stats: small iceberg table broadcasts in a join") {
    val loc = freshDir("ice-dim")
    val nation = Tables.nation(spark, sf)
    val w = IcebergWriter.create(spark, loc, nation.schema)
    w.append(nation)

    val dim = spark.read.format("graft-iceberg").load(loc)
    val joined = orders.limit(1000)
      .join(dim, col("o_custkey") % 25 === col("n_nationkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"manifest stats must make the 25-row iceberg dim broadcast:\n$plan")
  }

  test("iceberg aggregate pushdown: COUNT/MIN/MAX answered from manifests alone (r11)") {
    val o = Tables.orders(spark, sf)
    val loc = freshDir("ice-agg")
    val w = IcebergWriter.create(spark, loc, o.schema,
      partition = Seq("o_orderstatus" -> "identity"))
    w.append(o)
    val df = spark.read.format("graft-iceberg").load(loc)
    df.createOrReplaceTempView("ice_agg")
    val q = spark.sql(
      """SELECT count(*) AS n, count(o_custkey) AS nc,
                min(o_orderkey) AS mn, max(o_orderkey) AS mx
         FROM ice_agg WHERE o_orderstatus = 'F'""")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftAggScan"),
      s"aggregate must collapse to the metadata scan:\n$plan")
    val want = o.filter(col("o_orderstatus") === "F")
    val row = q.head()
    assert(row.getLong(0) == want.count())
    assert(row.getLong(1) == want.filter(col("o_custkey").isNotNull).count())
    assert(row.getLong(2) == want.agg(min("o_orderkey")).head().getLong(0))
    assert(row.getLong(3) == want.agg(max("o_orderkey")).head().getLong(0))
    // ZERO data IO, proven the AggPushdownSpec way: delete every data
    // file — the metadata answer must still come back identical
    val t = graft.lake.iceberg.IcebergTable.load(spark, loc)
    val fs = new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())
    t.planFiles().foreach(p => fs.delete(new Path(p), false))
    val again = spark.sql(
      "SELECT count(*) AS n FROM ice_agg WHERE o_orderstatus = 'F'").head()
    assert(again.getLong(0) == want.count(),
      "metadata-only count must not touch data files")
  }

  test("iceberg aggregate pushdown refuses when deletes are live (r11)") {
    val o = Tables.orders(spark, sf)
    val loc = freshDir("ice-agg-dv")
    val w = IcebergWriter.create(spark, loc, o.schema)
    w.append(o)
    w.equalityDelete(o.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey"))
    val q = spark.read.format("graft-iceberg").load(loc)
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftAggScan"),
      s"deletes make manifest counts upper bounds — must fall back:\n$plan")
    assert(q.head().getLong(0) ==
      o.filter(col("o_orderpriority") =!= "1-URGENT").count())
  }

  test("delta aggregate pushdown: COUNT/MIN/MAX answered from the log alone (r11)") {
    val o = Tables.orders(spark, sf)
    val loc = freshDir("delta-agg")
    val w = DeltaWriter.create(spark, loc, o.schema,
      partitionColumns = Seq("o_orderstatus"))
    w.append(o)
    val df = spark.read.format("graft-delta").load(loc)
    df.createOrReplaceTempView("delta_agg")
    val q = spark.sql(
      """SELECT count(*) AS n, count(o_custkey) AS nc,
                min(o_orderkey) AS mn, max(o_orderdate) AS mx
         FROM delta_agg WHERE o_orderstatus = 'F'""")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftAggScan"),
      s"aggregate must collapse to the metadata scan:\n$plan")
    val want = o.filter(col("o_orderstatus") === "F")
    val row = q.head()
    assert(row.getLong(0) == want.count())
    assert(row.getLong(1) == want.filter(col("o_custkey").isNotNull).count())
    assert(row.getLong(2) == want.agg(min("o_orderkey")).head().getLong(0))
    assert(row.get(3) == want.agg(max("o_orderdate")).head().get(0))
    // MIN over a DOUBLE column must refuse (NaN-blind parquet bounds)
    val dq = spark.sql("SELECT min(o_totalprice) AS mp FROM delta_agg")
    assert(!dq.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      "double min/max must fall back to a real scan")
    assert(dq.head().getDouble(0) ==
      o.agg(min("o_totalprice")).head().getDouble(0))
    // ZERO data IO: delete every data file — the answer must not change
    val t = graft.lake.delta.DeltaTable.load(spark, loc)
    val fs = new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())
    t.planFiles().foreach(p => fs.delete(new Path(loc, p), false))
    val again = spark.sql(
      "SELECT count(*) AS n FROM delta_agg WHERE o_orderstatus = 'F'").head()
    assert(again.getLong(0) == want.count(),
      "metadata-only count must not touch data files")
  }

  test("delta aggregate pushdown refuses when deletion vectors are live (r11)") {
    val o = Tables.orders(spark, sf)
    val loc = freshDir("delta-agg-dv")
    val w = DeltaWriter.create(spark, loc, o.schema)
    w.append(o)
    w.deleteWhereDv(col("o_orderpriority") === "1-URGENT")
    val q = spark.read.format("graft-delta").load(loc)
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("GraftAggScan"),
      s"DVs make log counts upper bounds — must fall back:\n$plan")
    assert(q.head().getLong(0) ==
      o.filter(col("o_orderpriority") =!= "1-URGENT").count())
  }

  test("SQL INSERT INTO / df.write append land native commits on all three formats (r11)") {
    val o = Tables.orders(spark, sf)
    val base = o.filter(col("o_orderkey") % 3 === 0)
    val extra = o.filter(col("o_orderkey") % 3 === 1).limit(50)
      .select(o.columns.map(c =>
        if (c == "o_orderkey") (-col(c) - 1).as(c) else col(c)).toIndexedSeq: _*)
    extra.createOrReplaceTempView("interop_insert_src")
    val wantRows = base.count() + extra.count()

    // iceberg: SQL INSERT INTO over the path (the reference's README INSERT)
    val iloc = freshDir("ice-insert")
    IcebergWriter.create(spark, iloc, o.schema,
      partition = Seq("o_orderstatus" -> "identity")).append(base)
    spark.sql(s"INSERT INTO `graft-iceberg`.`$iloc` SELECT * FROM interop_insert_src")
    val it = graft.lake.iceberg.IcebergTable.load(spark, iloc)
    assert(it.scan(None).count() == wantRows, "iceberg INSERT must be a native snapshot")
    assert(spark.read.format("graft-iceberg").load(iloc).count() == wantRows)

    // delta: DataFrame-writer append
    val dloc = freshDir("delta-insert")
    DeltaWriter.create(spark, dloc, o.schema,
      partitionColumns = Seq("o_orderstatus")).append(base)
    extra.write.format("graft-delta").mode("append").save(dloc)
    assert(graft.lake.delta.DeltaTable.load(spark, dloc).scan(None).count() == wantRows,
      "delta df.write append must be a native commit")

    // hudi: SQL INSERT INTO (keyed table; INSERT = fresh groups, no dedup)
    val hloc = freshDir("hudi-insert")
    HudiWriter.create(spark, hloc, o.schema,
      partitionFields = Seq("o_orderstatus"), keyField = "o_orderkey").insert(base)
    spark.sql(s"INSERT INTO `graft-hudi`.`$hloc` SELECT * FROM interop_insert_src")
    assert(graft.lake.hudi.HudiTable.load(spark, hloc).scan(None).count() == wantRows,
      "hudi INSERT must be a native deltacommit/commit")

    // overwrite refuses loudly; time-travel resolutions are read-only
    intercept[Throwable] {
      extra.write.format("graft-delta").mode("overwrite").save(dloc)
    }
    intercept[Throwable] {
      extra.write.format("graft-delta").option("versionAsOf", "0")
        .mode("append").save(dloc)
    }
  }

  test("CREATE TABLE … USING graft-* LOCATION: the reference's full DDL UX (r11)") {
    // pg_lakehouse_iceberg/README.md:22-44: CREATE TABLE orders USING
    // iceberg_am WITH (location=…) then INSERT / SELECT / JOIN against
    // local tables — the same statements against the session catalog,
    // resolved through the TableProvider (V2SessionCatalog path).
    val o = Tables.orders(spark, sf)
    val locs = Map(
      "graft-iceberg" -> freshDir("ddl-ice"),
      "graft-delta" -> freshDir("ddl-delta"),
      "graft-hudi" -> freshDir("ddl-hudi"))
    IcebergWriter.create(spark, locs("graft-iceberg"), o.schema,
      partition = Seq("o_orderstatus" -> "identity")).append(o)
    DeltaWriter.create(spark, locs("graft-delta"), o.schema,
      partitionColumns = Seq("o_orderstatus")).append(o)
    HudiWriter.create(spark, locs("graft-hudi"), o.schema,
      partitionFields = Seq("o_orderstatus"), keyField = "o_orderkey").insert(o)

    o.filter(col("o_orderkey") % 101 === 0)
      .select((-col("o_orderkey") - 1).as("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      .createOrReplaceTempView("ddl_insert_src")
    val nExtra = spark.table("ddl_insert_src").count()
    assert(nExtra > 0)

    for ((fmt, loc) <- locs) {
      val t = "ddl_" + fmt.replace("-", "_")
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING `$fmt` LOCATION '$loc'")
      assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == o.count(),
        s"$fmt: catalog-registered SELECT")
      spark.sql(s"INSERT INTO $t SELECT * FROM ddl_insert_src")
      assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) ==
        o.count() + nExtra, s"$fmt: INSERT INTO by name must land")
      // the README's local-table join
      val j = spark.sql(
        s"""SELECT count(*) FROM $t o JOIN ddl_insert_src s
            ON o.o_orderkey = s.o_orderkey""").head().getLong(0)
      assert(j == nExtra, s"$fmt: join with a local table")
      spark.sql(s"DROP TABLE $t")
    }
  }

  test("SQL DELETE FROM lands native row-level delete commits on all three formats (r11)") {
    val o = Tables.orders(spark, sf)
    val keep = o.filter(col("o_orderpriority") =!= "1-URGENT")

    // delta: protocol COW delete
    val dloc = freshDir("delta-del")
    DeltaWriter.create(spark, dloc, o.schema,
      partitionColumns = Seq("o_orderstatus")).append(o)
    spark.sql(s"DELETE FROM `graft-delta`.`$dloc` WHERE o_orderpriority = '1-URGENT'")
    assert(graft.lake.delta.DeltaTable.load(spark, dloc).scan(None).count()
      == keep.count(), "delta SQL DELETE")
    // zero-match DELETE is a no-op, not an error
    spark.sql(s"DELETE FROM `graft-delta`.`$dloc` WHERE o_orderpriority = 'nope'")

    // iceberg: v3 deletion-vector delete (no data-file rewrite)
    val iloc = freshDir("ice-del")
    IcebergWriter.create(spark, iloc, o.schema,
      partition = Seq("o_orderstatus" -> "identity")).append(o)
    val beforeFiles = graft.lake.iceberg.IcebergTable.load(spark, iloc)
      .planFiles().toSet
    spark.sql(s"DELETE FROM `graft-iceberg`.`$iloc` WHERE o_orderpriority = '1-URGENT'")
    val it = graft.lake.iceberg.IcebergTable.load(spark, iloc)
    assert(it.scan(None).count() == keep.count(), "iceberg SQL DELETE")
    assert(it.planFiles().toSet == beforeFiles,
      "DV delete must not rewrite data files")
    spark.sql(s"DELETE FROM `graft-iceberg`.`$iloc` WHERE o_orderpriority = 'nope'")

    // hudi MOR: soft-delete log records
    val hloc = freshDir("hudi-del")
    HudiWriter.create(spark, hloc, o.schema,
      partitionFields = Seq("o_orderstatus"), keyField = "o_orderkey",
      tableType = "MERGE_ON_READ").insert(o)
    spark.sql(s"DELETE FROM `graft-hudi`.`$hloc` WHERE o_orderpriority = '1-URGENT'")
    assert(graft.lake.hudi.HudiTable.load(spark, hloc).scan(None).count()
      == keep.count(), "hudi SQL DELETE")
    spark.sql(s"DELETE FROM `graft-hudi`.`$hloc` WHERE o_orderpriority = 'nope'")

    // a COW hudi table loud-rejects (rewrite-for-DELETE is an operator
    // decision, not a connector default)
    val cloc = freshDir("hudi-del-cow")
    HudiWriter.create(spark, cloc, o.schema,
      partitionFields = Nil, keyField = "o_orderkey").insert(o)
    intercept[Throwable] {
      spark.sql(s"DELETE FROM `graft-hudi`.`$cloc` WHERE o_orderpriority = '1-URGENT'")
    }
  }

  test("column pruning narrows the inner parquet ReadSchema") {
    val loc = freshDir("ice-prune")
    val w = IcebergWriter.create(spark, loc, orders.schema)
    w.append(orders)
    val two = spark.read.format("graft-iceberg").load(loc)
      .select("o_orderkey", "o_totalprice")
    // the bridge projects BEFORE the row boundary; the inner plan's
    // parquet scan must therefore read just the two columns (+ nothing)
    assert(two.columns.toSeq == Seq("o_orderkey", "o_totalprice"))
    assert(two.count() == orders.count())
  }
}
