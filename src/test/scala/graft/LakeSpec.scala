package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{GraftCatalog, GraftTable}

class LakeSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val d = s"/root/repo/target/graft-lake-test/$name"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  test("create + scan round-trips rows") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("roundtrip"), o, keyColumns = Seq("o_orderkey"))
    assert(t.scan().count() == o.count())
    assert(t.meta.currentSnapshotId == 1)
  }

  test("append accumulates snapshots and time travel reads the old one") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("tt"),
      o.filter(col("o_orderkey") % 2 === 0), keyColumns = Seq("o_orderkey"))
    val n1 = t.scan().count()
    t.append(o.filter(col("o_orderkey") % 2 === 1))
    assert(t.scan().count() == o.count())
    assert(t.scan(asOf = 1L).count() == n1)
    assert(t.meta.snapshots.map(_.id) == Seq(1L, 2L))
  }

  test("MoR delete removes exactly the matched rows without rewriting files") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("del"), o, keyColumns = Seq("o_orderkey"))
    val before = t.meta.currentSnapshot.get.dataFiles.map(_.path).toSet
    t.delete(col("o_orderstatus") === "F")
    val after = t.meta.currentSnapshot.get.dataFiles.map(_.path).toSet
    assert(before == after, "delete must not rewrite data files")
    assert(t.meta.currentSnapshot.get.deleteFiles.nonEmpty)
    assert(t.scan().count() == o.filter(col("o_orderstatus") =!= "F").count())
  }

  test("MoR update rewrites matched rows and keeps others") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("upd"), o, keyColumns = Seq("o_orderkey"))
    t.update(Map("o_totalprice" -> lit(0.0)), col("o_orderstatus") === "F")
    val got = t.scan()
    assert(got.count() == o.count())
    assert(got.filter(col("o_orderstatus") === "F" && col("o_totalprice") =!= 0.0).count() == 0)
    assert(got.filter(col("o_orderstatus") =!= "F" && col("o_totalprice") === 0.0).count() == 0)
  }

  test("partition pruning plans fewer files and loses no rows") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("pp"), o,
      partitionBy = Seq("o_orderstatus"), keyColumns = Seq("o_orderkey"))
    val total = t.planFiles().size
    val pruned = t.planFiles(Some(col("o_orderstatus") === "F"))
    assert(pruned.size < total, s"expected pruning: $total -> ${pruned.size}")
    assert(pruned.forall(_.partitionValues("o_orderstatus") == "F"))
    assert(t.scan(Some(col("o_orderstatus") === "F")).count() ==
      o.filter(col("o_orderstatus") === "F").count())
  }

  test("min/max stats pruning skips files outside the predicate range") {
    val o = Tables.orders(spark, sf).repartitionByRange(8, col("o_orderkey"))
    val t = GraftTable.create(spark, freshDir("sp"), o, keyColumns = Seq("o_orderkey"))
    val total = t.planFiles().size
    assert(total >= 8)
    val pruned = t.planFiles(Some(col("o_orderkey") < 500))
    assert(pruned.size < total, s"expected stats pruning: $total -> ${pruned.size}")
    assert(t.scan(Some(col("o_orderkey") < 500)).count() ==
      Tables.orders(spark, sf).filter(col("o_orderkey") < 500).count())
  }

  test("schema evolution: old files read NULL for the added column") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("evo"),
      o.filter(col("o_orderkey") % 2 === 0), keyColumns = Seq("o_orderkey"))
    t.addColumn("o_tier", "STRING")
    t.append(o.filter(col("o_orderkey") % 2 === 1).withColumn("o_tier", lit("new")))
    val got = t.scan()
    assert(got.schema.fieldNames.contains("o_tier"))
    assert(got.filter(col("o_tier").isNull).count() ==
      o.filter(col("o_orderkey") % 2 === 0).count())
  }

  test("compaction reduces file count, folds deletes, preserves rows") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("compact"), o.repartition(12),
      keyColumns = Seq("o_orderkey"))
    t.delete(col("o_orderstatus") === "P")
    val filesBefore = t.meta.currentSnapshot.get.dataFiles.size
    t.compact()
    val snap = t.meta.currentSnapshot.get
    assert(snap.dataFiles.size < filesBefore)
    assert(snap.deleteFiles.isEmpty)
    assert(t.scan().count() == o.filter(col("o_orderstatus") =!= "P").count())
  }

  test("catalog create/load/list/drop") {
    val wh = freshDir("warehouse")
    val cat = new GraftCatalog(spark, wh)
    cat.create("orders_t", Tables.orders(spark, sf), keyColumns = Seq("o_orderkey"))
    assert(cat.exists("orders_t"))
    assert(cat.list() == Seq("orders_t"))
    assert(cat.table("orders_t").scan().count() == Tables.orders(spark, sf).count())
    // SQL access through registered views, incl. metadata tables
    cat.registerViews()
    assert(spark.sql("SELECT count(*) FROM orders_t").head().getLong(0) ==
      Tables.orders(spark, sf).count())
    assert(spark.sql("SELECT count(*) FROM orders_t__snapshots").head().getLong(0) == 1L)
    assert(spark.sql("SELECT sum(row_count) FROM orders_t__files").head().getLong(0) ==
      Tables.orders(spark, sf).count())
    // view freshness (r02 verdict #9): a commit AFTER registration is
    // visible to the already-registered view without re-registering
    cat.table("orders_t").append(Tables.orders(spark, sf).limit(10))
    assert(spark.sql("SELECT count(*) FROM orders_t").head().getLong(0) ==
      Tables.orders(spark, sf).count() + 10)
    assert(cat.drop("orders_t"))
    assert(!cat.exists("orders_t"))
  }

  test("directory-catalog rename moves the table directory; guards both ends") {
    val wh = freshDir("warehouse-ren")
    val cat = new GraftCatalog(spark, wh)
    cat.create("src_t", Tables.orders(spark, sf).limit(60),
      keyColumns = Seq("o_orderkey"))
    cat.rename("src_t", "dst_t")
    assert(!cat.exists("src_t") && cat.exists("dst_t"))
    assert(cat.table("dst_t").scan().count() == 60)
    intercept[IllegalArgumentException] { cat.rename("src_t", "x") }
    cat.create("other_t", Tables.orders(spark, sf).limit(5),
      keyColumns = Seq("o_orderkey"))
    intercept[IllegalArgumentException] { cat.rename("dst_t", "other_t") }
  }

  test("concurrent appends from racing threads all commit via optimistic retry") {
    val o = Tables.orders(spark, sf).limit(50)
    val loc = freshDir("concurrent")
    GraftTable.create(spark, loc, o, keyColumns = Seq("o_orderkey"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    // 4 writers × 5 appends, each through its OWN handle, genuinely
    // racing — 21 commits total, deliberately CROSSING the manifest-merge
    // threshold (16) so merges rewrite manifest lists mid-race
    val futures = (1 to 4).map { _ =>
      Future {
        val t = GraftTable.load(spark, loc)
        (1 to 5).foreach(_ => t.append(o))
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    val fresh = GraftTable.load(spark, loc)
    assert(fresh.meta.snapshots.map(_.id).sorted == (1L to 21L),
      "all 21 commits must land with consecutive snapshot ids")
    assert(fresh.scan().count() == 21 * 50)
    assert(fresh.meta.currentSnapshot.get.manifestPaths.size <= 16,
      "manifest merge must bound the pointer list under racing commits")
    // every referenced file must actually exist (relocation left no danglers)
    val hconf = spark.sessionState.newHadoopConf()
    val rootP = new org.apache.hadoop.fs.Path(loc)
    val hfs = rootP.getFileSystem(hconf)
    fresh.meta.currentSnapshot.get.dataFiles.foreach { f =>
      assert(hfs.exists(new org.apache.hadoop.fs.Path(rootP, f.path)), f.path)
    }
  }

  test("two handles on one table interleave appends without losing commits") {
    val o = Tables.orders(spark, sf)
    val loc = freshDir("race")
    val t1 = GraftTable.create(spark, loc, o.limit(10), keyColumns = Seq("o_orderkey"))
    val t2 = GraftTable.load(spark, loc)
    t1.append(o.limit(10))
    t2.append(o.limit(10)) // stale handle refreshes before committing
    t1.append(o.limit(10))
    val fresh = GraftTable.load(spark, loc)
    assert(fresh.meta.snapshots.map(_.id) == Seq(1L, 2L, 3L, 4L))
    assert(fresh.scan().count() == 40)
  }

  test("time travel by timestamp resolves the snapshot current at that instant") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("tt-time"),
      o.filter(col("o_orderkey") % 2 === 0), keyColumns = Seq("o_orderkey"))
    val ts1 = t.meta.currentSnapshot.get.timestampMs
    Thread.sleep(5) // ensure distinct commit timestamps
    t.append(o.filter(col("o_orderkey") % 2 === 1))
    val ts2 = t.meta.currentSnapshot.get.timestampMs
    assert(t.snapshotAsOfTime(ts1 - 1) == -1L)
    assert(t.scanAsOfTime(ts1).count() == o.filter(col("o_orderkey") % 2 === 0).count())
    assert(t.scanAsOfTime((ts1 + ts2) / 2).count() ==
      o.filter(col("o_orderkey") % 2 === 0).count())
    assert(t.scanAsOfTime(ts2).count() == o.count())
    intercept[IllegalArgumentException] { t.scanAsOfTime(0L) }
  }

  test("time travel still sees rows that a later MoR delete removed") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("ttdel"), o, keyColumns = Seq("o_orderkey"))
    val before = t.scan().count()
    t.delete(col("o_orderstatus") === "F")
    assert(t.scan().count() < before)
    // snapshot 1 predates the delete file → unaffected
    assert(t.scan(asOf = 1L).count() == before)
  }

  test("upsert replaces matched keys and inserts new ones in one commit") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("merge"), o, keyColumns = Seq("o_orderkey"))
    val src = o.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", lit(1.0))
    val shifted = src.withColumn("o_orderkey", col("o_orderkey") + 100000000L)
    t.upsert(src.unionByName(shifted))
    val got = t.scan()
    assert(got.count() == o.count() + shifted.count())
    // matched rows rewritten, exactly once per key
    val m = got.filter(col("o_orderkey") % 10 === 0 && col("o_orderkey") < 100000000L)
    assert(m.count() == src.count())
    assert(m.filter(col("o_totalprice") =!= 1.0).count() == 0)
    assert(t.meta.currentSnapshot.get.operation == "upsert")
  }

  test("changes() returns exactly the rows added in a snapshot range") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("changes"),
      o.filter(col("o_orderkey") % 3 === 0), keyColumns = Seq("o_orderkey"))
    t.append(o.filter(col("o_orderkey") % 3 === 1))
    t.append(o.filter(col("o_orderkey") % 3 === 2))
    assert(t.changes(1L, 2L).count() == o.filter(col("o_orderkey") % 3 === 1).count())
    assert(t.changes(1L, 3L).count() == o.filter(col("o_orderkey") % 3 =!= 0).count())
    assert(t.changes(3L, 3L).count() == 0)
    // compaction adds no rows to an incremental consumer
    t.compact()
    assert(t.changes(3L, 4L).count() == 0)
  }

  test("string stats are truncated with sound bounds (no document bodies in metadata)") {
    val docs = Tables.documents(spark, sf)
    val t = GraftTable.create(spark, freshDir("strstats"), docs,
      keyColumns = Seq("doc_id"))
    val st = t.meta.currentSnapshot.get.dataFiles.head.stats("text")
    assert(st.min.length <= 65 && st.max.length <= 65,
      s"stats must be truncated, got ${st.min.length}/${st.max.length}")
    // bounds stay sound: every text row is within [min, max]
    val (mn, mx) = (st.min, st.max)
    val out = docs.select(min(col("text")), max(col("text"))).head()
    assert(mn <= out.getString(0) && mx >= out.getString(1))
    // and a text filter still loses no rows
    val some = docs.select(col("text")).head().getString(0)
    assert(t.scan(Some(col("text") === some)).count() ==
      docs.filter(col("text") === some).count())
  }

  test("partition evolution: new spec prunes new files, old files stay scannable") {
    val o = Tables.orders(spark, sf)
    val oldHalf = o.filter(col("o_orderkey") % 2 === 0)
    val newHalf = o.filter(col("o_orderkey") % 2 === 1)
    val t = GraftTable.create(spark, freshDir("pevo"), oldHalf,
      keyColumns = Seq("o_orderkey"))
    t.setPartitioning(Seq("o_orderstatus"))
    t.append(newHalf)
    val total = t.planFiles().size
    val pruned = t.planFiles(Some(col("o_orderstatus") === "F"))
    // every old (unpartitioned) file must survive; new files prune to F only
    val oldFiles = t.meta.currentSnapshot.get.dataFiles.filter(_.partitionValues.isEmpty)
    assert(oldFiles.nonEmpty && pruned.size < total)
    assert(oldFiles.forall(f => pruned.exists(_.path == f.path)),
      "pre-evolution files must be conservatively kept")
    assert(t.scan(Some(col("o_orderstatus") === "F")).count() ==
      o.filter(col("o_orderstatus") === "F").count())
    assert(t.scan().count() == o.count())
  }

  test("sort-order rewrite makes date-range stats pruning effective") {
    val o = Tables.orders(spark, sf)
    // random 8-way layout: every file spans the full date range
    val t = GraftTable.create(spark, freshDir("cluster"), o.repartition(8),
      keyColumns = Seq("o_orderkey"))
    val pred = col("o_orderdate") >= lit("1996-01-01").cast("date") &&
      col("o_orderdate") <= lit("1996-12-31").cast("date")
    val before = t.planFiles(Some(pred)).size
    assert(before == t.planFiles().size, "random layout should prune nothing")
    t.rewriteSorted(Seq("o_orderdate"), targetBytes = 8L * 1024)
    val total = t.planFiles().size
    val after = t.planFiles(Some(pred)).size
    assert(total > 2, s"rewrite should produce several files, got $total")
    assert(after < total, s"clustered layout must prune: $after of $total")
    // rows and content unchanged
    assert(t.scan().count() == o.count())
    assert(t.scan(Some(pred)).count() ==
      o.filter(pred).count())
  }

  test("append rejects columns the table does not have") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("strict"), o, keyColumns = Seq("o_orderkey"))
    val ex = intercept[IllegalArgumentException] {
      t.append(o.withColumn("surprise", lit(1)))
    }
    assert(ex.getMessage.contains("surprise"))
    // evolution-then-append is the sanctioned path
    t.addColumn("surprise", "INT")
    t.append(o.limit(5).withColumn("surprise", lit(1)))
    assert(t.scan().count() == o.count() + 5)
  }

  test("columnStats bounds contain the actual data") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("colstats"), o.repartition(4),
      keyColumns = Seq("o_orderkey"))
    val st = t.columnStats.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getString(3), r.getString(4))).toMap
    val (nf, mn, mx) = st("o_orderkey")
    assert(nf == t.meta.currentSnapshot.get.dataFiles.size.toLong)
    val bounds = o.agg(min("o_orderkey"), max("o_orderkey")).head()
    assert(mn.toLong == bounds.getLong(0) && mx.toLong == bounds.getLong(1))
  }

  test("z-order rewrite makes range pruning effective on BOTH dimensions") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("zorder"), o.repartition(8),
      keyColumns = Seq("o_orderkey"))
    val pk = col("o_orderkey") < 200
    val pc = col("o_custkey") < 40
    assert(t.planFiles(Some(pk)).size == t.planFiles().size,
      "random layout prunes nothing on orderkey")
    t.rewriteZOrdered(Seq("o_orderkey", "o_custkey"), targetBytes = 8L * 1024)
    val total = t.planFiles().size
    assert(total > 3, s"expected several files, got $total")
    val afterK = t.planFiles(Some(pk)).size
    val afterC = t.planFiles(Some(pc)).size
    assert(afterK < total, s"orderkey prune: $afterK of $total")
    assert(afterC < total, s"custkey prune: $afterC of $total")
    assert(t.property("zorder.by").contains("o_orderkey,o_custkey"))
    // content identical
    assert(t.scan().count() == o.count())
    assert(t.scan(Some(pk && pc)).count() == o.filter(pk && pc).count())
  }

  test("rollback restores an old state; expire + vacuum GC unreferenced files") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("maint"), o, keyColumns = Seq("o_orderkey"))
    val n0 = t.scan().count()
    t.delete(col("o_orderstatus") === "F")
    assert(t.scan().count() < n0)
    t.rollback(1L)
    assert(t.scan().count() == n0, "rollback must restore the pre-delete state")
    // compact rewrites data files; old ones become unreferenced once the
    // pre-compaction snapshots expire
    t.compact()
    t.expireSnapshots(keepLast = 1)
    assert(t.meta.snapshots.length == 1)
    val removed = t.vacuum(minAgeMs = 0L)
    assert(removed > 0, "vacuum should GC the replaced data + delete files")
    assert(t.scan().count() == n0, "current snapshot untouched by vacuum")
    intercept[IllegalArgumentException] { t.scan(asOf = 1L) } // expired
  }

  test("lake queries return rows and snapshots meta logs operations") {
    val snaps = queries.Lake.lakeSnapshotsMeta(spark, sf).collect()
    assert(snaps.length == 3)
    assert(snaps.map(_.getAs[String]("operation")).toSeq == Seq("append", "append", "delete"))
  }

  test("metadata views: file-count columns + raw file rows (spec-pinned halves)") {
    // the gate projections of lake_snapshots_meta / lake_files_meta are
    // oracle-checked (r12); the parallelism-dependent columns they drop
    // are pinned HERE: delete adds delete files without touching data
    // files, and files() rows carry nonce'd relative paths + commit seq
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("meta-views"), o,
      partitionBy = Seq("o_orderstatus"), keyColumns = Seq("o_orderkey"))
    t.delete(col("o_orderpriority") === "1-URGENT")
    val snaps = t.snapshots.orderBy("snapshot_id").collect()
    val (d1, x1) = (snaps(0).getAs[Long]("n_data_files"),
      snaps(0).getAs[Long]("n_delete_files"))
    val (d2, x2) = (snaps(1).getAs[Long]("n_data_files"),
      snaps(1).getAs[Long]("n_delete_files"))
    assert(d1 > 0 && x1 == 0, "create snapshot: data files only")
    assert(d2 == d1, "MoR delete must not add or remove data files")
    assert(x2 > 0, "MoR delete must add delete files")
    val files = t.files().collect()
    assert(files.nonEmpty)
    assert(files.forall(r => r.getAs[String]("path").startsWith("data/") &&
      r.getAs[String]("path").endsWith(".parquet")))
    assert(files.forall(_.getAs[Long]("seq") == 1L),
      "all files belong to the create commit")
    assert(files.map(_.getAs[Long]("row_count")).sum == o.count())
    assert(files.forall(_.getAs[String]("partition").startsWith("o_orderstatus=")))
  }

  test("data files carry parquet bloom filters for the key columns") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("bloom"), o, keyColumns = Seq("o_orderkey"))
    val file = new org.apache.hadoop.fs.Path(
      s"${t.location}/${t.meta.currentSnapshot.get.dataFiles.head.path}")
    val conf = spark.sessionState.newHadoopConf()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      import scala.jdk.CollectionConverters._
      val keyChunk = block.getColumns.asScala
        .find(_.getPath.toDotString == "o_orderkey").get
      val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(keyChunk)
      assert(bloom != null, "key column must carry a bloom filter")
      // a value present in the file tests positive (no false negatives)
      val present = o.select(org.apache.spark.sql.functions.min("o_orderkey"))
        .head().getLong(0)
      assert(bloom.findHash(bloom.hash(present)),
        "present key must hit the bloom filter")
      // a non-key column carries none (no per-column bloat by default)
      val other = block.getColumns.asScala
        .find(_.getPath.toDotString == "o_comment")
        .orElse(block.getColumns.asScala.find(_.getPath.toDotString == "o_orderstatus")).get
      assert(reader.getBloomFilterDataReader(block).readBloomFilter(other) == null)
    } finally reader.close()
  }

  test("full table lifecycle round-trips on a non-file: Hadoop scheme") {
    spark.sparkContext.hadoopConfiguration.set("fs.graftfs.impl",
      classOf[GraftFsFileSystem].getName)
    val loc = "graftfs:///root/repo/target/graft-lake-test/altscheme"
    val p = new org.apache.hadoop.fs.Path(loc)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, loc, o,
      partitionBy = Seq("o_orderstatus"), keyColumns = Seq("o_orderkey"))
    assert(t.scan().count() == o.count())
    // partition pruning consults per-file values parsed from graftfs paths
    assert(t.planFiles(Some(col("o_orderstatus") === "F")).size < t.planFiles().size)
    t.delete(col("o_orderpriority") === "1-URGENT")
    val kept = o.filter(col("o_orderpriority") =!= "1-URGENT").count()
    assert(t.scan().count() == kept)
    t.compact()
    t.expireSnapshots(keepLast = 1)
    // vacuum's relative-path computation must survive the scheme prefix
    assert(t.vacuum(minAgeMs = 0L) > 0)
    assert(t.scan().count() == kept)
  }

  test("decimal min/max stats prune files on a DECIMAL column") {
    // `amount DECIMAL` is the reference's own README schema example; r02
    // yielded no decimal stats so such a column never pruned.
    val o = Tables.orders(spark, sf)
      .withColumn("amount", col("o_totalprice").cast("decimal(12,2)"))
      .repartitionByRange(8, col("amount"))
    val t = GraftTable.create(spark, freshDir("decimal"), o, keyColumns = Seq("o_orderkey"))
    val total = t.planFiles().size
    assert(total >= 8)
    val bound = new java.math.BigDecimal("50000.00")
    val pruned = t.planFiles(Some(col("amount") < lit(bound)))
    assert(pruned.size < total, s"expected decimal stats pruning: $total -> ${pruned.size}")
    assert(t.scan(Some(col("amount") < lit(bound))).count() ==
      o.filter(col("amount") < lit(bound)).count())
    // a DOUBLE literal against the decimal column must NOT prune (Spark
    // evaluates it in double-rounded semantics — exact-domain pruning
    // would be unsound at the boundary) but must still return right rows
    assert(t.planFiles(Some(col("amount") < lit(50000.0))).size == total)
    assert(t.scan(Some(col("amount") < lit(50000.0))).count() ==
      o.filter(col("amount") < lit(50000.0)).count())
    // SQL path: decimal literals parse as DECIMAL, so WHERE prunes too
    val wh = freshDir("decimalsql")
    spark.conf.set("spark.sql.catalog.graft_dec",
      classOf[graft.lake.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_dec.warehouse", wh)
    o.createOrReplaceTempView("dec_src")
    spark.sql("DROP TABLE IF EXISTS graft_dec.t")
    spark.sql("CREATE TABLE graft_dec.t AS SELECT * FROM dec_src")
    assert(spark.sql("SELECT count(*) FROM graft_dec.t WHERE amount < 50000.00")
      .head().getLong(0) == o.filter(col("amount") < lit(bound)).count())
  }

  test("SQL DML through the DSv2 catalog: CTAS, INSERT, SELECT, fresh reads") {
    val wh = freshDir("sqlcat")
    spark.conf.set("spark.sql.catalog.graft_test",
      classOf[graft.lake.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_test.warehouse", wh)
    val o = Tables.orders(spark, sf)
    o.createOrReplaceTempView("orders_src_sql")
    spark.sql("DROP TABLE IF EXISTS graft_test.t1")
    spark.sql(
      """CREATE TABLE graft_test.t1 TBLPROPERTIES('key.columns'='o_orderkey')
         AS SELECT * FROM orders_src_sql WHERE o_orderkey % 2 = 0""")
    spark.sql(
      "INSERT INTO graft_test.t1 SELECT * FROM orders_src_sql WHERE o_orderkey % 2 = 1")
    assert(spark.sql("SELECT count(*) FROM graft_test.t1").head().getLong(0) == o.count())
    // fresh reads: an API commit is immediately visible to the NEXT SQL
    // query (no re-registration — loadTable re-reads metadata per query)
    val t = GraftTable.load(spark, s"$wh/t1")
    t.delete(col("o_orderstatus") === "P")
    val expAfterDel = o.filter(col("o_orderstatus") =!= "P").count()
    assert(spark.sql("SELECT count(*) FROM graft_test.t1").head().getLong(0) == expAfterDel)
    // WHERE pushes into the scan builder (file pruning + residual re-apply)
    val q = spark.sql(
      "SELECT o_orderkey FROM graft_test.t1 WHERE o_orderdate >= DATE '1996-01-01'")
    val expected = o.filter(col("o_orderstatus") =!= "P" &&
      col("o_orderdate") >= lit("1996-01-01").cast("date")).count()
    assert(q.count() == expected)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderdate"),
      s"filter must reach the scan, plan:\n$plan")
    // with GraftExtensions installed the read is SUBSTITUTED with the
    // native vectorized plan — no V1 RDD[Row] bridge node in the tree
    assert(!plan.contains("GraftV1Scan") && plan.contains("FileScan parquet"),
      s"native substitution must bypass the V1 bridge, plan:\n$plan")
    // pin the extension-less fallback: V1Scan path, same results
    spark.conf.set("spark.graft.nativeScan.enabled", "false")
    try {
      val v1 = spark.sql(
        "SELECT o_orderkey FROM graft_test.t1 WHERE o_orderdate >= DATE '1996-01-01'")
      assert(v1.count() == expected, "V1 fallback must return the same rows")
      assert(v1.queryExecution.executedPlan.toString.contains("GraftV1Scan"),
        "fallback must plan through the V1 bridge")
    } finally spark.conf.set("spark.graft.nativeScan.enabled", "true")
    // INSERT OVERWRITE replaces the whole table in one atomic commit
    spark.sql(
      "INSERT OVERWRITE graft_test.t1 SELECT * FROM orders_src_sql WHERE o_orderstatus = 'F'")
    assert(spark.sql("SELECT count(*) FROM graft_test.t1").head().getLong(0) ==
      o.filter(col("o_orderstatus") === "F").count())
    assert(t.refresh().snapshots.last.operation == "overwrite")
    // partitioned CREATE + ALTER ADD COLUMN + catalog listing
    spark.sql("DROP TABLE IF EXISTS graft_test.t2")
    spark.sql(
      """CREATE TABLE graft_test.t2 (k BIGINT, status STRING)
         PARTITIONED BY (status)
         TBLPROPERTIES ('retention'='7d')""")
    // user TBLPROPERTIES persist (reserved/Spark-managed keys filtered)
    assert(GraftTable.load(spark, s"$wh/t2").property("retention").contains("7d"))
    spark.sql("INSERT INTO graft_test.t2 VALUES (1, 'A'), (2, 'B'), (3, 'A')")
    assert(spark.sql("SELECT count(*) FROM graft_test.t2 WHERE status = 'A'")
      .head().getLong(0) == 2)
    val t2 = GraftTable.load(spark, s"$wh/t2")
    assert(t2.meta.partitionColumns == Seq("status"))
    assert(t2.planFiles(Some(col("status") === "A")).size <
      t2.planFiles().size, "partition pruning must skip the B file")
    spark.sql("ALTER TABLE graft_test.t2 ADD COLUMN note STRING")
    spark.sql("INSERT INTO graft_test.t2 VALUES (4, 'C', 'late')")
    val rows = spark.sql(
      "SELECT k, note FROM graft_test.t2 ORDER BY k").collect()
    assert(rows.map(_.isNullAt(1)).toSeq == Seq(true, true, true, false),
      "old files read NULL for the added column")
    assert(spark.sql("SHOW TABLES IN graft_test").collect()
      .map(_.getString(1)).toSet == Set("t1", "t2"))
    // SQL time travel: snapshot 1 is the CTAS content (even keys only),
    // read back after two later commits changed the table — on both the
    // native path and the V1 fallback
    val v1Rows = o.filter(col("o_orderkey") % 2 === 0).count()
    assert(spark.sql("SELECT count(*) FROM graft_test.t1 VERSION AS OF 1")
      .head().getLong(0) == v1Rows)
    spark.conf.set("spark.graft.nativeScan.enabled", "false")
    try assert(spark.sql("SELECT count(*) FROM graft_test.t1 VERSION AS OF 1")
      .head().getLong(0) == v1Rows)
    finally spark.conf.set("spark.graft.nativeScan.enabled", "true")
    intercept[Exception] {
      spark.sql("SELECT count(*) FROM graft_test.t1 VERSION AS OF 999").collect()
    }
    // SQL DELETE FROM → one MoR equality-delete commit
    val beforeDel = spark.sql("SELECT count(*) FROM graft_test.t1").head().getLong(0)
    val urgent = spark.sql(
      "SELECT count(*) FROM graft_test.t1 WHERE o_orderpriority = '1-URGENT'")
      .head().getLong(0)
    assert(urgent > 0)
    spark.sql("DELETE FROM graft_test.t1 WHERE o_orderpriority = '1-URGENT'")
    assert(spark.sql("SELECT count(*) FROM graft_test.t1").head().getLong(0) ==
      beforeDel - urgent)
    assert(t.refresh().snapshots.last.operation == "delete",
      "SQL DELETE must commit merge-on-read, not rewrite")
  }

  test("SQL UPDATE and MERGE INTO lower onto MoR commits") {
    val wh = freshDir("sqlwh-rowlevel")
    spark.conf.set("spark.sql.catalog.graft_rl",
      classOf[graft.lake.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_rl.warehouse", wh)
    val o = Tables.orders(spark, sf)
    o.createOrReplaceTempView("orders_src_rl")
    spark.sql("DROP TABLE IF EXISTS graft_rl.t")
    spark.sql(
      """CREATE TABLE graft_rl.t TBLPROPERTIES('key.columns'='o_orderkey')
         AS SELECT * FROM orders_src_rl""")
    // UPDATE … SET … WHERE → one MoR update commit
    spark.sql(
      "UPDATE graft_rl.t SET o_totalprice = 0.0D, o_custkey = o_custkey + 1000000 " +
        "WHERE o_orderstatus = 'F'")
    val t = GraftTable.load(spark, s"$wh/t")
    assert(t.meta.currentSnapshot.get.operation == "update")
    assert(spark.sql("SELECT count(*) FROM graft_rl.t").head().getLong(0) == o.count())
    assert(spark.sql(
      "SELECT count(*) FROM graft_rl.t WHERE o_orderstatus = 'F' AND o_totalprice <> 0.0D")
      .head().getLong(0) == 0, "matched rows must be rewritten")
    assert(spark.sql(
      "SELECT count(*) FROM graft_rl.t WHERE o_orderstatus <> 'F' AND o_custkey >= 1000000")
      .head().getLong(0) == 0, "unmatched rows must be untouched")
    // MERGE upsert: UPDATE SET * + INSERT * → one MoR upsert commit
    val upd = o.filter(col("o_orderkey") % 10 === 0).withColumn("o_totalprice", lit(1.0))
    val ins = upd.withColumn("o_orderkey", col("o_orderkey") + 100000000L)
    upd.unionByName(ins).createOrReplaceTempView("merge_src_rl")
    spark.sql(
      """MERGE INTO graft_rl.t t USING merge_src_rl s ON t.o_orderkey = s.o_orderkey
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(t.refresh().snapshots.last.operation == "upsert")
    assert(spark.sql("SELECT count(*) FROM graft_rl.t").head().getLong(0) ==
      o.count() + ins.count())
    assert(spark.sql(
      "SELECT count(*) FROM graft_rl.t WHERE o_orderkey % 10 = 0 AND o_totalprice <> 1.0D")
      .head().getLong(0) == 0, "matched keys must carry the source row")
    // MERGE delete shape: WHEN MATCHED THEN DELETE
    spark.sql(
      """MERGE INTO graft_rl.t t
         USING (SELECT * FROM merge_src_rl WHERE o_orderkey >= 100000000) s
         ON t.o_orderkey = s.o_orderkey
         WHEN MATCHED THEN DELETE""")
    assert(spark.sql("SELECT count(*) FROM graft_rl.t").head().getLong(0) == o.count(),
      "merge-delete must remove exactly the inserted keys")
    assert(t.refresh().snapshots.last.operation == "delete")
    // non-key merge condition fails loudly, not silently wrong
    val ex = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_rl.t t USING merge_src_rl s ON t.o_custkey = s.o_custkey
           WHEN MATCHED THEN DELETE""")
    }
    assert(ex.getMessage.contains("key.columns"), ex.getMessage)
    // duplicate source keys = SQL cardinality violation, never double rows
    upd.unionByName(upd).createOrReplaceTempView("merge_dup_rl")
    val dup = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft_rl.t t USING merge_dup_rl s ON t.o_orderkey = s.o_orderkey
           WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(dup.getMessage.contains("cardinality"), dup.getMessage)
    // UPDATE assignments are SIMULTANEOUS (all read the pre-update row):
    // swapping through SET a = f(b), b = 0 must see the OLD b
    val probe = spark.sql(
      "SELECT o_orderkey, o_totalprice FROM graft_rl.t " +
        "WHERE o_totalprice > 0 ORDER BY o_orderkey LIMIT 1").head()
    val (key, oldPrice) = (probe.getLong(0), probe.getDouble(1))
    spark.sql(
      s"UPDATE graft_rl.t SET o_custkey = CAST(o_totalprice AS BIGINT), " +
        s"o_totalprice = 0.0D WHERE o_orderkey = $key")
    val row = spark.sql(
      s"SELECT o_custkey, o_totalprice FROM graft_rl.t WHERE o_orderkey = $key").head()
    assert(row.getLong(0) == oldPrice.toLong,
      "assignment must read the PRE-update o_totalprice")
    assert(row.getDouble(1) == 0.0)
  }

  private def scanNodeCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.size

  test("scan plan stays O(delete boundaries), not O(snapshots)") {
    // r02 verdict scale-killer #2: per-seq grouping grew one union branch
    // per commit — a streaming-ingest table accumulated a 10k-branch plan
    // in a day. After the fix, files group by applicable-delete-set.
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("planwidth"),
      o.filter(col("o_orderkey") % 25 === 0), keyColumns = Seq("o_orderkey"))
    (1 until 25).foreach(i => t.append(o.filter(col("o_orderkey") % 25 === i)))
    assert(t.meta.snapshots.length == 25)
    // 25 append snapshots, zero deletes → ONE parquet scan node
    assert(scanNodeCount(t.scan()) == 1,
      s"append-only table must plan a single scan, got ${scanNodeCount(t.scan())}")
    assert(t.scan().count() == o.count())
    // one delete splits files into two delete-set groups: ≤ seq (anti-joined,
    // 2 scans: data + delete keys) and > seq (none yet). Later appends all
    // join the no-deletes group — the plan does NOT grow with commits.
    t.delete(col("o_orderstatus") === "P")
    val afterDelete = scanNodeCount(t.scan())
    (26 to 30).foreach(_ => t.append(o.limit(0))) // empty appends still commit
    t.append(o.filter(col("o_orderkey") % 25 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000))
    assert(scanNodeCount(t.scan()) == afterDelete + 1,
      "post-delete appends must share ONE no-deletes scan group")
    // compaction folds deletes → back to a single scan node
    t.compact()
    assert(scanNodeCount(t.scan()) == 1, "compacted table must plan a single scan")
  }

  test("rename + drop evolution: field ids keep files from every epoch readable") {
    val o = Tables.orders(spark, sf)
    val wh = freshDir("renamedrop-wh")
    val t = GraftTable.create(spark, s"$wh/t",
      o.filter(col("o_orderkey") % 2 === 0), keyColumns = Seq("o_orderkey"))
    t.renameColumn("o_totalprice", "o_price")
    t.dropColumn("o_custkey")
    t.append(o.filter(col("o_orderkey") % 2 === 1)
      .withColumnRenamed("o_totalprice", "o_price").drop("o_custkey"))
    val got = t.scan()
    assert(got.columns.contains("o_price") && !got.columns.contains("o_totalprice")
      && !got.columns.contains("o_custkey"))
    assert(got.count() == o.count())
    // pre-rename files resolve o_totalprice BY FIELD ID into o_price
    val want = o.agg(sum(col("o_totalprice"))).head().getDouble(0)
    assert(math.abs(got.agg(sum(col("o_price"))).head().getDouble(0) - want) < 1e-4)
    // time travel to the pre-DDL snapshot reads through the CURRENT schema
    assert(t.scan(asOf = 1L).columns.toSeq == got.columns.toSeq)
    assert(GraftTable.load(spark, t.location).scan().count() == o.count(), "fresh handle")
    // key column is protected (delete files reference it by name)
    intercept[IllegalArgumentException] { t.renameColumn("o_orderkey", "id") }
    intercept[IllegalArgumentException] { t.dropColumn("o_orderkey") }
    // re-adding a dropped NAME mints a fresh field id — the old column's
    // bytes must not resurrect under it
    t.addColumn("o_custkey", "STRING")
    assert(t.scan().filter(col("o_custkey").isNotNull).count() == 0,
      "re-added name must not resurrect dropped column data")
    // MoR delete still applies across epochs (key files by current name)
    t.delete(col("o_orderstatus") === "F")
    assert(t.scan().count() == o.filter(col("o_orderstatus") =!= "F").count())
    // SQL ALTER surface drives the same DDL
    spark.conf.set("spark.sql.catalog.graft_evo",
      classOf[graft.lake.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_evo.warehouse", wh)
    spark.sql("ALTER TABLE graft_evo.t RENAME COLUMN o_orderpriority TO priority")
    spark.sql("ALTER TABLE graft_evo.t DROP COLUMN o_orderdate")
    val cols = spark.sql("SELECT * FROM graft_evo.t").columns.toSeq
    assert(cols.contains("priority") && !cols.contains("o_orderpriority")
      && !cols.contains("o_orderdate"))
    assert(spark.sql("SELECT count(priority) FROM graft_evo.t").head().getLong(0) > 0,
      "renamed column must carry pre-rename values")
  }

  test("drop+re-add: the retired column's stale stats never serve the new one") {
    // ADVICE r05 (high): statNameFor used to fall back to the CURRENT name
    // when a field id was absent from a file's epoch, so after
    // drop('a')+add('a') the retired column's stats (nulls==0) answered for
    // the re-added column — `WHERE a IS NULL` wrongly pruned every pre-DDL
    // file whose re-added 'a' is all-NULL, and metadata COUNT(a) counted
    // the dead column's values. Now an absent id resolves to AbsentKey and
    // every stats/bloom lookup conservatively misses.
    val sp = spark; import sp.implicits._
    val wh = freshDir("readd-stats-wh")
    val t = GraftTable.create(spark, s"$wh/t",
      (1 to 100).map(i => (i, s"v$i", i * 2)).toDF("k", "a", "m"),
      keyColumns = Seq("k"))
    t.dropColumn("a")
    t.addColumn("a", "STRING")
    val total = t.meta.currentSnapshot.get.dataFiles.size
    assert(t.planFiles(Some(col("a").isNull)).size == total,
      "IS NULL must keep pre-DDL files: their re-added column is all-NULL " +
        "even though the retired column's stat says nulls==0")
    assert(t.scan(Some(col("a").isNull)).count() == 100)
    assert(t.scan(Some(col("a") === "v1")).count() == 0)
    // rename m->n then re-add 'm': pruning through 'n' keeps using the old
    // physical stats; the NEW 'm' gets no stale evidence
    t.renameColumn("m", "n")
    t.addColumn("m", "INT")
    assert(t.scan(Some(col("n") === 2)).count() == 1, "renamed column still prunable")
    assert(t.planFiles(Some(col("m").isNull)).size ==
      t.meta.currentSnapshot.get.dataFiles.size)
    assert(t.scan(Some(col("m").isNull)).count() == 100)
    // metadata agg pushdown must refuse stale stats: count(a) is 0, not 100
    spark.conf.set("spark.sql.catalog.graft_readd",
      classOf[graft.lake.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_readd.warehouse", wh)
    assert(spark.sql("SELECT count(a) FROM graft_readd.t").head().getLong(0) == 0L)
    assert(spark.sql("SELECT count(k) FROM graft_readd.t").head().getLong(0) == 100L)
  }

  test("type widening: int -> bigint is metadata-only; SQL ALTER COLUMN TYPE") {
    val sp = spark; import sp.implicits._
    val wh = freshDir("widen-wh")
    val t = GraftTable.create(spark, s"$wh/t",
      (1 to 100).map(i => (i, i * 2)).toDF("k", "v"))
    t.widenColumn("v", "BIGINT")
    t.append((101 to 110).map(i => (i, i * 1000000000L)).toDF("k", "v"))
    val got = t.scan()
    assert(got.schema("v").dataType == org.apache.spark.sql.types.LongType)
    val want = (1 to 100).map(_ * 2L).sum + (101 to 110).map(_ * 1000000000L).sum
    assert(got.agg(sum(col("v"))).head().getLong(0) == want,
      "old int files and new long files must merge widened")
    intercept[IllegalArgumentException] { t.widenColumn("v", "INT") } // narrowing
    intercept[IllegalArgumentException] { t.widenColumn("v", "STRING") } // cross-domain
    spark.conf.set("spark.sql.catalog.graft_widen",
      classOf[graft.lake.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_widen.warehouse", wh)
    spark.sql("ALTER TABLE graft_widen.t ALTER COLUMN k TYPE BIGINT")
    assert(GraftTable.load(spark, s"$wh/t").schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("stats pruning survives a rename: old files' stats resolve by field id") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("renstats"),
      o.repartitionByRange(8, col("o_totalprice")), keyColumns = Seq("o_orderkey"))
    t.renameColumn("o_totalprice", "o_price")
    val total = t.planFiles().size
    val maxP = o.agg(max(col("o_totalprice"))).head().getDouble(0)
    val pred = col("o_price") > lit(maxP * 0.9)
    val kept = t.planFiles(Some(pred)).size
    assert(kept < total,
      s"rename must not disable min/max pruning on pre-rename files: $kept of $total")
    assert(t.scan(Some(pred)).count() ==
      o.filter(col("o_totalprice") > maxP * 0.9).count())
  }

  test("snapshot tags: scanTag, retention pinning, SQL VERSION AS OF '<tag>'") {
    val o = Tables.orders(spark, sf)
    val wh = freshDir("tags-wh")
    val t = GraftTable.create(spark, s"$wh/t", o.limit(100),
      keyColumns = Seq("o_orderkey"))
    t.tag("v1", 1L)
    t.append(o.limit(200))
    t.append(o.limit(50))
    assert(t.scanTag("v1").count() == 100)
    intercept[NoSuchElementException] { t.scanTag("nope") }
    intercept[IllegalArgumentException] { t.tag("dangling", 99L) }
    // SQL time travel by tag name
    spark.conf.set("spark.sql.catalog.graft_tags",
      classOf[graft.lake.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_tags.warehouse", wh)
    assert(spark.sql("SELECT count(*) FROM graft_tags.t VERSION AS OF 'v1'")
      .head().getLong(0) == 100)
    // ALL-DIGIT ref names are rejected at creation (ADVICE r05): a tag
    // '20240110' would shadow snapshot-id resolution and silently change
    // the meaning of existing numeric VERSION AS OF queries
    intercept[IllegalArgumentException] { t.tag("20240110", 2L) }
    assert(spark.sql("SELECT count(*) FROM graft_tags.t VERSION AS OF 2")
      .head().getLong(0) == 300, "numeric namespace stays snapshot ids")
    // retention: expire keeps the tagged snapshot alive
    t.expireSnapshots(1)
    assert(t.meta.snapshots.map(_.id).toSet == Set(1L, 3L), "tag pins snapshot 1")
    assert(t.scanTag("v1").count() == 100)
    t.dropTag("v1")
    t.expireSnapshots(1)
    assert(t.meta.snapshots.map(_.id) == Seq(3L), "untagged snapshot expires")
  }

  test("cdc folds a 20-delete replay into one parent-scan branch; overwrite fails loudly") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("cdcfold"), o.limit(400),
      keyColumns = Seq("o_orderkey"))
    (0 until 20).foreach(i => t.delete(col("o_orderkey") % 40 === i))
    val df = t.cdc(0L, t.meta.currentSnapshotId)
    // 1 insert branch (the create's append) + ONE folded delete branch:
    // each LogicalRelation bounded — NOT one parent scan per delete commit
    val scans = scanNodeCount(df)
    assert(scans <= 4, s"20-delete replay must fold parent scans, planned $scans relations")
    // the folded changelog is still exactly right
    val inserts = df.filter(col("_change_type") === "insert").count()
    val deletes = df.filter(col("_change_type") === "delete").count()
    assert(inserts == 400)
    assert(deletes == o.limit(400).filter(col("o_orderkey") % 40 < 20).count())
    // state-replacing commits cannot be represented incrementally
    t.overwrite(o.limit(10))
    val ex = intercept[RuntimeException] { t.cdc(0L, t.meta.currentSnapshotId).count() }
    assert(ex.getMessage.contains("replaces table state"))
    val ex2 = intercept[RuntimeException] { t.changes(0L, t.meta.currentSnapshotId).count() }
    assert(ex2.getMessage.contains("replaces table state"))
    // ranges that STOP before the overwrite still read fine
    assert(t.cdc(0L, 21L).count() == inserts + deletes)
  }

  test("days(ts) hidden partitioning prunes day files from a raw-ts predicate") {
    val ev = Tables.events(spark, sf)
    val t = GraftTable.create(spark, freshDir("tday"), ev,
      partitionBy = Seq("days(ts)"))
    val total = t.planFiles().size
    assert(total >= 30, s"30 days of events should write >= 30 files, got $total")
    val pred = col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
      col("ts") < lit("2024-01-12 00:00:00").cast("timestamp")
    val kept = t.planFiles(Some(pred)).size
    assert(kept < total / 5, s"2 of 30 days must survive pruning: $kept of $total")
    assert(t.scan(Some(pred)).count() == ev.filter(pred).count(), "pruning loses no rows")
    // hidden: the scan schema is exactly the source schema — no derived col
    assert(t.scan().columns.toSeq == ev.columns.toSeq)
    assert(t.scan().count() == ev.count())
  }

  test("FilePruner maps predicates into bucket/truncate transform domains") {
    import graft.lake.{DataFileMeta, FilePruner}
    import org.apache.spark.sql.types.StructType
    def f(name: String, pv: Map[String, String]) =
      DataFileMeta(name, 1, 10, 100, pv, Map.empty) // NO stats: only transforms can prune
    // bucket(8, k): equality keeps exactly the literal's bucket — and the
    // kept bucket must be the one the WRITE path computes (pmod(hash, n))
    val bFiles = (0 until 8).map(i => f(s"b$i", Map("__p_k_bucket" -> i.toString)))
    val bKept = FilePruner.prune(bFiles, Some(col("k") === lit(42)),
      Seq("bucket(8,k)"), StructType.fromDDL("k INT"))
    val expected = spark.sql("SELECT pmod(hash(42), 8)").head().getInt(0)
    assert(bKept.map(_.path) == Seq(s"b$expected"))
    // range predicates keep all buckets (hash order proves nothing)
    assert(FilePruner.prune(bFiles, Some(col("k") < lit(5)),
      Seq("bucket(8,k)"), StructType.fromDDL("k INT")).size == 8)
    // truncate(2, s): string prefix buckets prune = and range predicates
    val sFiles = Seq(f("s1", Map("__p_s_trunc" -> "ab")), f("s2", Map("__p_s_trunc" -> "cd")))
    val sSchema = StructType.fromDDL("s STRING")
    assert(FilePruner.prune(sFiles, Some(col("s") === lit("abzz")),
      Seq("truncate(2,s)"), sSchema).map(_.path) == Seq("s1"))
    assert(FilePruner.prune(sFiles, Some(col("s") > lit("cc")),
      Seq("truncate(2,s)"), sSchema).map(_.path) == Seq("s2"))
    assert(FilePruner.prune(sFiles, Some(col("s") < lit("ac")),
      Seq("truncate(2,s)"), sSchema).map(_.path) == Seq("s1"))
    // truncate(100, k): integral step buckets [0,100) and [300,400)
    val iFiles = Seq(f("i0", Map("__p_k_trunc" -> "0")), f("i3", Map("__p_k_trunc" -> "300")))
    val iSchema = StructType.fromDDL("k INT")
    assert(FilePruner.prune(iFiles, Some(col("k") === lit(350)),
      Seq("truncate(100,k)"), iSchema).map(_.path) == Seq("i3"))
    assert(FilePruner.prune(iFiles, Some(col("k") < lit(50)),
      Seq("truncate(100,k)"), iSchema).map(_.path) == Seq("i0"))
    // a mistyped literal must NOT bucket-prune (long lit vs int column
    // hashes differently — the guard keeps every file)
    assert(FilePruner.prune(bFiles, Some(col("k") === lit(42L)),
      Seq("bucket(8,k)"), StructType.fromDDL("k INT")).size == 8)
  }

  test("bucket + truncate write path round-trips and prunes end-to-end") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("tbucket"), o,
      partitionBy = Seq("bucket(4,o_orderpriority)"), keyColumns = Seq("o_orderkey"))
    assert(t.scan().count() == o.count())
    assert(t.scan().columns.toSeq == o.columns.toSeq, "derived bucket col stays hidden")
    val pred = col("o_orderpriority") === "1-URGENT"
    val total = t.planFiles().size
    val kept = t.planFiles(Some(pred)).size
    assert(kept < total, s"bucket pruning must skip files: $kept of $total")
    assert(t.scan(Some(pred)).count() == o.filter(pred).count())
  }
}
