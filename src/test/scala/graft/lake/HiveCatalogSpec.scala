package graft.lake

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.lake.iceberg.{IcebergHiveCatalog, IcebergTable, IcebergWriter}

/** `catalog_type='hive'` resolution against a REAL in-process Hive
  * Metastore (embedded-Derby HMS — the standard embedded mode, zero
  * services): register an Iceberg table under a name using the entry
  * shape Iceberg's own HiveCatalog writes (EXTERNAL_TABLE +
  * table_type=ICEBERG + metadata_location), resolve + read by name,
  * advance the pointer with the check-and-swap after a commit, and get
  * a clean refusal for non-Iceberg entries. */
class HiveCatalogSpec extends AnyFunSuite {
  import TestSpark._

  private def fresh(name: String): String = {
    val d = s"/root/repo/target/graft-hive-test/$name"
    val p = new Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  test("register / resolve / read / pointer-swap / drop through a real HMS") {
    val base = fresh("hms")
    val cat = IcebergHiveCatalog.embedded(base)
    try {
      cat.createDatabase("lake", s"$base/warehouse/lake")
      assert(cat.listDatabases().contains("lake"))

      // build a real Iceberg table at a location, register it by name
      val o = Tables.orders(spark, sf)
      val loc = s"$base/warehouse/lake/orders"
      val w = IcebergWriter.create(spark, loc, o.schema)
      w.append(o.limit(100))
      val fs = new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())
      val metaFile = fs.listStatus(new Path(loc, "metadata")).map(_.getPath)
        .filter(_.getName.endsWith(".metadata.json"))
        .maxBy(_.getName.stripPrefix("v").takeWhile(_.isDigit).toInt).toString
      cat.registerTable("lake", "orders", loc, metaFile)
      assert(cat.listTables("lake") == Seq("orders"))
      assert(cat.exists("lake", "orders"))

      // the reference's table_open(catalog_type='hive') resolution:
      // name -> metadata_location -> table
      val resolved = cat.metadataLocation("lake", "orders")
      assert(resolved == metaFile)
      assert(IcebergTable.load(spark, resolved).scan().count() == 100)

      // commit then advance the pointer with the check-and-swap
      w.append(o.limit(50))
      val newMeta = fs.listStatus(new Path(loc, "metadata")).map(_.getPath)
        .filter(_.getName.endsWith(".metadata.json"))
        .maxBy(_.getName.stripPrefix("v").takeWhile(_.isDigit).toInt).toString
      assert(cat.updateMetadataLocation("lake", "orders", resolved, newMeta))
      assert(IcebergTable.load(spark,
        cat.metadataLocation("lake", "orders")).scan().count() == 150)
      // a STALE expected pointer loses the swap (no silent overwrite)
      assert(!cat.updateMetadataLocation("lake", "orders", resolved, metaFile))
      assert(cat.metadataLocation("lake", "orders") == newMeta)

      // unknown names + drop behave like a catalog should
      intercept[NoSuchElementException] { cat.metadataLocation("lake", "ghost") }
      assert(cat.dropTable("lake", "orders"))
      assert(!cat.exists("lake", "orders") && !cat.dropTable("lake", "orders"))
    } finally cat.close()
  }
}
