package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Lifecycle against a REAL S3-compatible object store (MinIO profile:
  * docker-compose.minio.yml) — converts the simulated-FS commit-protocol
  * receipts (S3CommitSpec races committers on a rename-overwrites store)
  * into an end-to-end run over s3a://.
  *
  * Env-gated: the suite CANCELS (not passes) unless
  * `GRAFT_S3_ENDPOINT` / `GRAFT_S3_ACCESS_KEY` / `GRAFT_S3_SECRET_KEY` /
  * `GRAFT_S3_BUCKET` are set AND the hadoop-aws S3AFileSystem is on the
  * classpath (the stock Spark distribution ships without it — add
  * hadoop-aws + aws-sdk-bundle matching the Hadoop version). The
  * zero-egress build sandbox has neither, so CI treats this as optional;
  * the compose file documents the one-command local run. */
class S3aLifecycleSpec extends AnyFunSuite {
  import TestSpark._

  private val env = Seq("GRAFT_S3_ENDPOINT", "GRAFT_S3_ACCESS_KEY",
    "GRAFT_S3_SECRET_KEY", "GRAFT_S3_BUCKET").flatMap(k => sys.env.get(k))

  private def s3aReady: Boolean =
    env.length == 4 &&
      (try { Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem"); true }
       catch { case _: Throwable => false })

  private def configureS3a(): String = {
    val Seq(endpoint, access, secret, bucket) = env
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.endpoint", endpoint)
    conf.set("fs.s3a.access.key", access)
    conf.set("fs.s3a.secret.key", secret)
    conf.set("fs.s3a.path.style.access", "true") // MinIO: no virtual hosts
    conf.set("fs.s3a.connection.ssl.enabled",
      endpoint.startsWith("https").toString)
    s"s3a://$bucket/graft-s3a-spec-${System.currentTimeMillis()}"
  }

  test("create / scan / append / MoR delete / time travel over s3a://") {
    assume(s3aReady, "set GRAFT_S3_* and add hadoop-aws to run (see docker-compose.minio.yml)")
    val base = configureS3a()
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, s"$base/orders_t", o.limit(200),
      keyColumns = Seq("o_orderkey"))
    assert(t.scan().count() == 200)
    t.append(o.limit(300))
    assert(t.scan().count() == 500)
    t.delete(col("o_orderstatus") === "F")
    assert(t.scan().count() ==
      o.limit(200).unionAll(o.limit(300)).filter(col("o_orderstatus") =!= "F").count())
    assert(t.scan(asOf = 1L).count() == 200, "time travel over s3a")
    assert(GraftTable.load(spark, t.location).scan().count() == t.scan().count())
  }

  test("catalog-arbitrated commits over s3a://: CAS is the commit point") {
    assume(s3aReady, "set GRAFT_S3_* and add hadoop-aws to run (see docker-compose.minio.yml)")
    val base = configureS3a()
    val server = new InMemoryCatalogServer(base)
    try {
      val cat = new RestCatalog(spark, server.uri)
      val o = Tables.orders(spark, sf)
      cat.create("orders_s3", o.limit(100), keyColumns = Seq("o_orderkey"))
      // racing appends through two independent handles: the catalog CAS
      // must serialize them — exactly one retry path, both rows land
      val t1 = cat.table("orders_s3")
      val t2 = cat.table("orders_s3")
      t1.append(o.limit(10))
      t2.append(o.limit(20))
      assert(cat.table("orders_s3").scan().count() == 130)
      // multi-table transaction over the object store
      cat.create("staging_s3", o.limit(40), keyColumns = Seq("o_orderkey"))
      cat.transact(Seq("orders_s3", "staging_s3")) { t =>
        t("orders_s3").append(t("staging_s3").scan().localCheckpoint())
        t("staging_s3").delete(lit(true))
      }
      assert(cat.table("orders_s3").scan().count() == 170)
      assert(cat.table("staging_s3").scan().count() == 0)
    } finally server.stop()
  }
}
