package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing scratch for curate_decontam (not a test; runMain only).
  * Usage: Test/runMain graft.DecontamPerfScratch [sfDir] */
object DecontamPerfScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    Tables.documents(spark, sfDir).count()

    val toks = tokens(col("text"))
    val ngrams = when(size(col("toks")) >= 8,
      transform(sequence(lit(1), size(col("toks")) - 7),
        i => concat_ws(" ", slice(col("toks"), i, lit(8)))))
      .otherwise(array().cast("array<string>"))

    val docs = Tables.fanOut(Tables.documents(spark, sfDir))
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), ngrams.as("grams"))

    time("ngrams only (noop)") {
      docs.write.format("noop").mode("overwrite").save()
    }
    time("explode only corpus") {
      docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), explode(col("grams")).as("g"))
        .write.format("noop").mode("overwrite").save()
    }
    println("[scratch] corpus gram rows = " +
      docs.filter(col("doc_id") % 97 =!= 0)
        .select(explode(col("grams")).as("g")).count())
    time("explode+distinct corpus") {
      docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), explode(col("grams")).as("g")).distinct()
        .write.format("noop").mode("overwrite").save()
    }
    time("explode+distinct via xxhash") {
      docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), explode(col("grams")).as("g"))
        .select(col("doc_id"), xxhash64(col("g")).as("h")).distinct()
        .write.format("noop").mode("overwrite").save()
    }
    time("explode after exchange boundary") {
      docs.filter(col("doc_id") % 97 =!= 0)
        .repartition(32)
        .select(col("doc_id"), explode(col("grams")).as("g"))
        .write.format("noop").mode("overwrite").save()
    }
    time("explode after localCheckpoint") {
      val mat = docs.filter(col("doc_id") % 97 =!= 0).localCheckpoint()
      mat.select(col("doc_id"), explode(col("grams")).as("g"))
        .write.format("noop").mode("overwrite").save()
    }
    time("posexplode variant") {
      docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), posexplode(col("grams")).as(Seq("p", "g")))
        .write.format("noop").mode("overwrite").save()
    }
    time("explode of sliding-window ngram ids (native expr)") {
      Tables.fanOut(Tables.documents(spark, sfDir))
        .filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"),
          explode(ngramIds(split(col("text"), "\\s+"), 8)).as("g"))
        .write.format("noop").mode("overwrite").save()
    }
    locally {
      val p = docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), explode(col("grams")).as("g"))
        .queryExecution.executedPlan.toString
      println("[scratch] plan Generate lines: " +
        p.linesIterator.filter(l => l.contains("Generate") || l.contains("Project"))
          .take(6).mkString(" || ").take(600))
    }
    time("eval grams distinct") {
      docs.filter(col("doc_id") % 97 === 0)
        .select(explode(col("grams")).as("g")).distinct()
        .write.format("noop").mode("overwrite").save()
    }
    time("full decontam") {
      queries.Curation.curateDecontam(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("full decontam again") {
      queries.Curation.curateDecontam(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
