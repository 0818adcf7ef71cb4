package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.TestSpark

/** Model-based property test for ROW LINEAGE under random op sequences,
  * run against BOTH formats' lineage machinery (Iceberg v3 row lineage,
  * Delta row tracking) through one engine-agnostic invariant set — the
  * r16b lineage waves' interaction receipts (single-purpose specs cover
  * each op; this exercises sequences like update-after-DV-delete-after-
  * upsert-after-compact that none do):
  *
  *  1. content: the lineage scan's (key -> value) equals the model after
  *     every commit;
  *  2. id stability: a surviving key's row id NEVER changes, across
  *     updates, upserts, MoR deletes and compaction/optimize;
  *  3. id uniqueness: no two live rows share a row id;
  *  4. version semantics: rows changed by a commit carry a version/
  *     sequence strictly greater than every previously observed one
  *     (each commit outranks history in both protocols); untouched rows
  *     keep their version bit-for-bit;
  *  5. maintenance invariance: compact (Iceberg) / optimize (Delta)
  *     changes NOTHING observable.
  *
  * Ops are keyed with unique keys by construction (fresh appends mint
  * new keys; upserts replace) — the precondition both engines' keyed
  * upsert documents. */
class LineagePropertySpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val d = s"/root/repo/target/graft-lineage-prop/$name"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  private def toDf(rows: Seq[(Long, Long)]) = {
    val sp = spark; import sp.implicits._
    rows.toDF("k", "v").coalesce(1)
  }

  /** Engine adapter: keyed ops + a lineage scan of key -> (value,
    * rowId, version). */
  private trait Drv {
    def append(rows: Seq[(Long, Long)]): Unit
    def update(keys: Set[Long], newV: Long): Unit
    def upsert(rows: Seq[(Long, Long)]): Unit
    def delete(keys: Set[Long]): Unit
    def maintain(): Unit
    def scanLineage(): Map[Long, (Long, Long, Long)]
  }

  private final class IceDrv(loc: String) extends Drv {
    import graft.lake.iceberg.{IcebergTable, IcebergWriter}
    private val w = {
      val w0 = IcebergWriter.create(spark, loc,
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v BIGINT"))
      w0.enableRowLineage()
      w0
    }
    private var flip = false
    def append(rows: Seq[(Long, Long)]): Unit = w.append(toDf(rows))
    def update(keys: Set[Long], newV: Long): Unit =
      w.updateWhere(col("k").isInCollection(keys), Map("v" -> lit(newV)))
    def upsert(rows: Seq[(Long, Long)]): Unit =
      w.upsertKeys(toDf(rows), Seq("k"))
    def delete(keys: Set[Long]): Unit = {
      // alternate the two MoR delete encodings (equality file / DV)
      flip = !flip
      val sp = spark; import sp.implicits._
      if (flip) w.equalityDelete(keys.toSeq.toDF("k"))
      else w.deleteWhereDv(col("k").isInCollection(keys), requireMatch = false)
    }
    private var mflip = false
    def maintain(): Unit = {
      // alternate the data rewrite and the metadata-only consolidation
      mflip = !mflip
      if (mflip) w.compact() else w.rewriteManifests(targetEntries = 4)
    }
    def scanLineage(): Map[Long, (Long, Long, Long)] =
      IcebergTable.load(spark, loc).scanWithLineage()
        .select("k", "v", "_row_id", "_last_updated_sequence_number")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
  }

  private final class DeltaDrv(loc: String) extends Drv {
    import graft.lake.delta.{DeltaTable, DeltaWriter}
    private val w = DeltaWriter.create(spark, loc,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v BIGINT"),
      enableRowTracking = true)
    private var flip = false
    def append(rows: Seq[(Long, Long)]): Unit = w.append(toDf(rows))
    def update(keys: Set[Long], newV: Long): Unit =
      w.updateWhere(col("k").isInCollection(keys), Map("v" -> lit(newV)))
    def upsert(rows: Seq[(Long, Long)]): Unit =
      w.upsertKeys(toDf(rows), Seq("k"))
    def delete(keys: Set[Long]): Unit = {
      // alternate the COW rewrite and the DV mask
      flip = !flip
      if (flip) w.deleteWhere(col("k").isInCollection(keys))
      else w.deleteWhereDv(col("k").isInCollection(keys))
    }
    def maintain(): Unit = w.optimize(smallBytes = Long.MaxValue)
    def scanLineage(): Map[Long, (Long, Long, Long)] =
      DeltaTable.load(spark, loc).scanWithRowTracking()
        .select("k", "v", "_row_id", "_row_commit_version")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
  }

  private def runSequence(drv: Drv, seed: Int, nOps: Int): Unit = {
    val rnd = new Random(seed)
    var model = Map.empty[Long, Long] // key -> value
    var ids = Map.empty[Long, Long] // key -> learned row id
    var vers = Map.empty[Long, Long] // key -> learned version
    var maxVer = -1L
    var nextKey = 0L
    def mint(n: Int): Seq[(Long, Long)] = {
      val ks = (nextKey until nextKey + n).map(k => k -> rnd.nextInt(1000).toLong)
      nextKey += n
      ks
    }
    def check(changed: Set[Long], op: String): Unit = {
      val got = drv.scanLineage()
      assert(got.view.mapValues(_._1).toMap == model,
        s"[$op] content drifted from the model")
      got.foreach { case (k, (_, id, _)) =>
        ids.get(k).foreach(old => assert(old == id,
          s"[$op] row id drifted for key $k: $old -> $id"))
      }
      val allIds = got.values.map(_._2).toSeq
      assert(allIds.distinct.size == allIds.size, s"[$op] duplicate row ids")
      got.foreach { case (k, (_, _, ver)) =>
        if (changed(k))
          assert(ver > maxVer,
            s"[$op] changed key $k must outrank every prior version " +
              s"($ver <= $maxVer)")
        else vers.get(k).foreach(old => assert(old == ver,
          s"[$op] untouched key $k changed version: $old -> $ver"))
      }
      ids = got.map { case (k, (_, id, _)) => k -> id }
      vers = got.map { case (k, (_, _, ver)) => k -> ver }
      maxVer = math.max(maxVer, (vers.values ++ Seq(maxVer)).max)
    }
    // seed state
    val first = mint(8)
    drv.append(first)
    model = first.toMap
    check(first.map(_._1).toSet, "seed append")
    (0 until nOps).foreach { i =>
      val existing = model.keys.toSeq.sorted
      rnd.nextInt(5) match {
        case 0 =>
          val rows = mint(1 + rnd.nextInt(4))
          drv.append(rows)
          model ++= rows
          check(rows.map(_._1).toSet, s"op$i append")
        case 1 if existing.nonEmpty =>
          val keys = rnd.shuffle(existing).take(1 + rnd.nextInt(3)).toSet
          val v = rnd.nextInt(1000).toLong
          drv.update(keys, v)
          model = model.map { case (k, old) =>
            k -> (if (keys(k)) v else old) }
          check(keys, s"op$i update")
        case 2 =>
          val matched = rnd.shuffle(existing).take(rnd.nextInt(3))
            .map(k => k -> rnd.nextInt(1000).toLong)
          val rows = matched ++ mint(rnd.nextInt(3))
          if (rows.nonEmpty) {
            drv.upsert(rows)
            model ++= rows
            check(rows.map(_._1).toSet, s"op$i upsert")
          }
        case 3 if existing.size > 3 =>
          val keys = rnd.shuffle(existing).take(1 + rnd.nextInt(2)).toSet
          drv.delete(keys)
          model --= keys
          ids --= keys; vers --= keys
          check(Set.empty, s"op$i delete")
        case 4 =>
          drv.maintain()
          check(Set.empty, s"op$i maintain")
        case _ => () // guarded branches that didn't fire
      }
    }
  }

  test("iceberg v3 lineage invariants hold under random op sequences") {
    Seq(11, 42).foreach { seed =>
      runSequence(new IceDrv(freshDir(s"ice-$seed")), seed, nOps = 18)
    }
  }

  test("delta row-tracking invariants hold under random op sequences") {
    Seq(11, 42).foreach { seed =>
      runSequence(new DeltaDrv(freshDir(s"delta-$seed")), seed, nOps = 18)
    }
  }
}
