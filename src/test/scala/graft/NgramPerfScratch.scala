package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** scratch stage-timing for dedup_ngram_jaccard at sf0.1 */
object NgramPerfScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = graft.Tables.fanOut(graft.Tables.documents(spark, d))
      .select(col("doc_id"), col("lang"), col("text"))
    val hashed = base.select(sha2(col("text"), 256).as("h"), col("lang"), col("doc_id"))
      .persist()
    val groups = hashed.groupBy(col("h"), col("lang"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("k")).persist()
    time("hash+groups")(groups.count())
    val docs = base
      .join(groups.select(col("rep_id")), col("doc_id") === col("rep_id"), "left_semi")
      .select(col("doc_id"), col("lang"), shingleIds(split(col("text"), "\\s+"), 2).as("ids"))
      .persist()
    val nReps = time("docs(shingleIds)")(docs.count())
    println(s"reps: $nReps")
    val tok = docs.select(col("doc_id"), col("lang"), size(col("ids")).as("n"), explode(col("ids")).as("id"))
    val nTok = time("tok explode")(tok.count())
    println(s"tokens: $nTok")
    val freq = tok.groupBy("id").agg(count(lit(1)).as("df"))
    time("freq")(freq.count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy(col("df"), col("id"))
    val prefix = tok.join(freq, "id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= floor(col("n") * 0.3) + 1)
      .select(col("doc_id"), col("lang"), col("n"), col("id")).persist()
    val nPre = time("prefix window")(prefix.count())
    println(s"prefix rows: $nPre")
    val cands = prefix.as("x").join(prefix.as("y"),
        col("x.id") === col("y.id") && col("x.lang") === col("y.lang") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(least(col("x.n"), col("y.n")).cast("double") >= greatest(col("x.n"), col("y.n")) * 0.65)
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct().persist()
    val nC = time("cands self-join+distinct")(cands.count())
    println(s"cands: $nC")
    val a = docs.select(col("doc_id").as("a_id"), col("ids").as("ids_a"))
    val b = docs.select(col("doc_id").as("b_id"), col("ids").as("ids_b"))
    val repPairs = cands.join(a, "a_id").join(b, "b_id")
      .select(col("a_id"), col("b_id"), round(jaccardHashed(col("ids_a"), col("ids_b")), 4).as("jac"))
      .filter(col("jac") >= 0.7)
    time("verify jaccard")(repPairs.count())
    spark.stop()
  }
}
