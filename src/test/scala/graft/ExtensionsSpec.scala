package graft

import org.scalatest.funsuite.AnyFunSuite

/** The graft_* functions must be callable from plain SQL once registered
  * (extension-library contract: spark.sql.extensions=graft.GraftExtensions
  * or GraftExtensions.register). */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  GraftExtensions.register(spark)

  test("graft_dot and graft_normalize from SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_dot(graft_normalize(array(3.0d, 4.0d)), graft_normalize(array(3.0d, 4.0d))) AS unit"
    ).head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("graft_shingle_ids + graft_sorted_intersect_count give SQL jaccard") {
    val r = spark.sql(
      """SELECT graft_sorted_intersect_count(
           graft_shingle_ids(split('a b c d', ' '), 2),
           graft_shingle_ids(split('a b c x', ' '), 2)) AS inter,
         size(graft_shingle_ids(split('a b c d', ' '), 2)) AS n""").head()
    assert(r.getLong(0) == 2L) // "a b", "b c" shared; "c d" vs "c x" differ
    assert(r.getInt(1) == 3)
  }

  test("graft_ngram_strings builds space-joined grams from SQL") {
    val r = spark.sql(
      "SELECT graft_ngram_strings(split('a b  c d', ' '), 3) AS g, " +
        "graft_ngram_strings(split('a b', ' '), 3) AS short").head()
    assert(r.getSeq[String](0) == Seq("a b c", "b c d")) // empty token skipped
    assert(r.getSeq[String](1) == Seq.empty) // sub-n doc yields no grams
  }

  test("graft_repetition_stats counts words, bigrams, and dominance from SQL") {
    val r = spark.sql(
      "SELECT graft_repetition_stats(split('a b a  b a', ' ')) AS r").head()
      .getStruct(0)
    // tokens: a b a b a (empty skipped): 5 words, 2 distinct;
    // bigrams: "a b","b a","a b","b a" → 4, 2 distinct; top = a×3
    assert(r.toSeq == Seq(5, 2, 4, 2, 3))
  }

  test("graft_iceberg_bucket from SQL matches the spec vectors") {
    val r = spark.sql(
      "SELECT graft_iceberg_bucket(34, 16) AS bi, " +
        "graft_iceberg_bucket(CAST(34 AS BIGINT), 16) AS bl, " +
        "graft_iceberg_bucket('iceberg', 16) AS bs, " +
        "graft_iceberg_bucket(DATE'2017-11-16', 100) AS bd, " +
        "graft_iceberg_bucket(CAST(NULL AS INT), 16) AS bn").head()
    assert(r.getInt(0) == 2017239379 % 16)
    assert(r.getInt(1) == 2017239379 % 16)
    assert(r.getInt(2) == 1210000089 % 16)
    assert(r.getInt(3) == (-653330422 & Integer.MAX_VALUE) % 100)
    assert(r.isNullAt(4))
  }

  test("signature functions are deterministic across invocations") {
    val q = "SELECT graft_simhash(split('the quick brown fox', ' ')) AS s, " +
      "graft_minhash_band_keys(graft_shingle_ids(split('the quick brown fox', ' '), 2), 64, 16) AS mk, " +
      "graft_hyperplane_band_keys(array(0.1d, -0.2d, 0.3d), 4, 4) AS hk, " +
      "graft_winnow(split('a b c d e f g h', ' '), 3, 4) AS w, " +
      "graft_ngram_ids(split('a b c', ' '), 2) AS ng, " +
      "graft_quantize8(array(0.0d, 0.5d, 1.0d)) AS qz"
    val a = spark.sql(q).head()
    val b = spark.sql(q).head()
    assert(a == b)
    assert(a.getSeq[Long](1).length == 16)
    assert(a.getSeq[Long](2).length == 4)
    assert(a.getStruct(3).getLong(0) > 0)
    assert(a.getSeq[Long](4).length == 2) // bigrams of 3 tokens
    assert(a.getStruct(5).getLong(0) == 3 && a.getStruct(5).getDouble(3) < 0.002)
  }
}
