package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** sf0.1 regression receipts for the Hudi write mirror. The r10 sf0.1
  * gate run caught a one-row loss: orders contains o_orderkey=0, whose
  * negated append collided with itself, giving the graft source two
  * current rows under one key — unrepresentable in a KEYED Hudi mirror
  * (the merge collapsed them). The entry now appends at -k-1 and
  * HudiExport refuses duplicate-key sources loudly. */
class HudiScaleSpec extends AnyFunSuite {
  import TestSpark._

  test("lake_hudi_write mirrors its source and oracle exactly at sf0.1") {
    val d = "/root/testdata/sf0.1"
    val got = queries.Lake.all("lake_hudi_write")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getAs[Any](2))).toMap
    val o = Tables.orders(spark, d)
    val expected = o.filter(col("o_orderpriority") =!= "1-URGENT")
      .unionAll(o.filter(col("o_orderkey") % 10 === 0))
      .filter(col("o_orderstatus") =!= "P")
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._1).toMap == expected,
      "the keyed mirror must not collapse any source row")
  }

  test("hudi export refuses duplicate-key sources loudly, never collapses") {
    import graft.lake.GraftTable
    import graft.lake.hudi.HudiExport
    val base = "/root/repo/target/graft-hudi-dup"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    val n = Tables.nation(spark, sf)
    val t = GraftTable.create(spark, s"$base/src", n,
      keyColumns = Seq("n_nationkey"))
    t.append(n.filter(col("n_nationkey") === 3)) // duplicate key 3
    val e = intercept[IllegalStateException] {
      HudiExport.export(spark, t, s"$base/dst")
    }
    assert(e.getMessage.contains("n_nationkey=3"), e.getMessage)
    // incremental path refuses too: clean export first, then a dup append
    val t2 = GraftTable.create(spark, s"$base/src2", n,
      keyColumns = Seq("n_nationkey"))
    HudiExport.export(spark, t2, s"$base/dst2")
    t2.append(n.filter(col("n_nationkey") === 7))
    val e2 = intercept[IllegalStateException] {
      HudiExport.exportIncremental(spark, t2, s"$base/dst2")
    }
    assert(e2.getMessage.contains("n_nationkey=7"), e2.getMessage)
  }
}
