package graft

import org.scalatest.funsuite.AnyFunSuite

/** Curation operators cross-checked against brute-force in-memory
  * computations on sf0.001, plus plan-shape assertions for the scale
  * postures each operator's scaladoc claims (broadcast where the small
  * side is bounded, no corpus shuffle where map-only is promised). */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs: Seq[(Long, String, String, String, Long)] =
    Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq

  private def toks(t: String): Seq[String] =
    t.split("\\s+").filter(_.nonEmpty).toSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---------------------------------------------------------------- decontam

  test("curate_decontam counts distinct shared 8-grams vs in-memory truth") {
    def grams(t: String): Set[String] = {
      val w = toks(t)
      if (w.length < 8) Set.empty else w.sliding(8).map(_.mkString(" ")).toSet
    }
    val evalGrams = docs.filter(_._1 % 97 == 0).flatMap(d => grams(d._2)).toSet
    assert(evalGrams.nonEmpty)
    val truth = docs.filter(_._1 % 97 != 0)
      .map(d => d._1 -> (grams(d._2) & evalGrams).size.toLong).toMap
    val got = queries.Curation.curateDecontam(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got.keySet == truth.keySet)
    truth.foreach { case (id, n) =>
      assert(got(id)._1 == n, s"doc $id: got ${got(id)._1} want $n")
      assert(got(id)._2 == (if (n > 0) 1 else 0))
    }
    // the corpus must contain contaminated docs for the test to mean anything
    assert(truth.values.exists(_ > 0), "fixture should plant eval overlaps")
  }

  test("curate_decontam broadcasts the eval n-gram set (bounded small side)") {
    val plan = queries.Curation.curateDecontam(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval-gram join should broadcast, got:\n$plan")
  }

  // ------------------------------------------------------------- stratified

  test("curate_sample_stratified keeps exactly the hash-threshold docs") {
    val thr = Map("de" -> "800000", "en" -> "199999", "es" -> "666666",
      "fr" -> "4ccccc", "zh" -> "333333")
    val truth = docs.filter { case (id, _, lang, _, _) =>
      thr.get(lang).exists(t => md5hex(id.toString).take(6) < t)
    }.map(_._1).toSet
    val got = queries.Curation.curateSampleStratified(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == truth, s"missing=${truth -- got} extra=${got -- truth}")
    // sanity: rare strata keep a higher fraction than the dominant one
    val byLang = docs.groupBy(_._3).view.mapValues(_.map(_._1).toSet)
    val enFrac = (truth & byLang("en")).size.toDouble / byLang("en").size
    val deFrac = (truth & byLang("de")).size.toDouble / byLang("de").size
    assert(deFrac > enFrac, s"de=$deFrac should exceed en=$enFrac")
  }

  test("curate_sample_stratified is map-only: no shuffle in the plan") {
    val plan = queries.Curation.curateSampleStratified(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  // ------------------------------------------------------------ mix domains

  test("curate_mix_domains caps each domain at its char budget") {
    val budget = 2500L
    val truth = docs.groupBy(_._4).flatMap { case (_, ds) =>
      val ordered = ds.sortBy(d => md5hex(d._1.toString))
      val cums = ordered.scanLeft(0L)(_ + _._5)
      ordered.zip(cums).collect { case (d, before) if before < budget =>
        d._1 -> before
      }
    }
    val got = queries.Curation.curateMixDomains(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == truth,
      s"missing=${truth.toSet -- got.toSet} extra=${got.toSet -- truth.toSet}")
    // every domain contributes at least one doc
    val sources = queries.Curation.curateMixDomains(spark, sf)
      .select("source").distinct().count()
    assert(sources == docs.map(_._4).distinct.size.toLong)
  }

  // ---------------------------------------------------------------- packing

  test("curate_pack_sequences equals the exact global prefix sum") {
    val ordered = docs.sortBy(d => md5hex(d._1.toString))
    val lens = ordered.map(d => toks(d._2).length.toLong)
    val cumBefore = lens.scanLeft(0L)(_ + _)
    val truth = ordered.zip(cumBefore).map { case (d, cb) =>
      d._1 -> ((cb / 64, cb % 64))
    }.toMap
    val got = queries.Curation.curatePackSequences(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == truth)
    // packing is dense: sequence ids cover 0..total/64 without gaps
    val totalToks = lens.sum
    val maxSeq = got.values.map(_._1).max
    assert(maxSeq == (totalToks - lens.min) / 64 ||
      maxSeq <= totalToks / 64, "seq ids bounded by total token count")
  }

  test("curate_pack_sequences windows per bucket, not one global partition") {
    val plan = queries.Curation.curatePackSequences(spark, sf)
      .queryExecution.executedPlan.toString
    // the doc-stream window must be hash-partitioned by bucket; a global
    // single-partition window over the corpus would plan SinglePartition
    // upstream of the doc columns
    assert(plan.contains("hashpartitioning(bkt"),
      s"doc cumsum must partition by bucket:\n$plan")
  }

  test("curate_shard_shuffle equals the naive per-shard global rank") {
    val keyed = docs.map(d => (d._1, (d._1 * 2654435761L) % 4294967296L))
    val truth = keyed.groupBy(_._2 % 8).flatMap { case (shard, xs) =>
      xs.sortBy(x => (x._2, x._1)).zipWithIndex.map {
        case ((id, _), i) => id -> ((shard, i.toLong))
      }
    }.toMap
    val got = queries.Curation.curateShardShuffle(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == truth)
    // per shard, positions are a dense 0..n-1 read order
    got.values.groupBy(_._1).foreach { case (shard, ps) =>
      assert(ps.map(_._2).toSeq.sorted == (0L until ps.size).toSeq,
        s"shard $shard positions not dense")
    }
  }

  test("curate_shard_shuffle windows per sub-bucket, not one task per shard") {
    val plan = queries.Curation.curateShardShuffle(spark, sf)
      .queryExecution.executedPlan.toString
    // the corpus-sized rank window must partition by (shard, sub-bucket);
    // a per-shard-only window would serialize 1/8th of the corpus per task
    assert(plan.contains("hashpartitioning(shard") && plan.contains("bkt"),
      s"rank window must partition by (shard, bkt):\n$plan")
  }

  test("pack_sequences at 2K/8K capacity stays exact on a 10x corpus (scale receipt)") {
    // the gate packs 64-token sequences; production packs 2-8K, where
    // sequences span documents and bucket boundaries far more often —
    // the two-phase prefix sum must stay equal to the exact global
    // cumsum regardless of capacity or corpus size
    import org.apache.spark.sql.functions._
    def synth(name: String, n: Long): String = {
      val d = s"/root/repo/target/graft-pack-scale/$name"
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", transform(
          sequence(lit(1), pmod(col("id"), lit(200)).cast("int") + lit(1)),
          _ => lit("w"))).as("text"))
        .write.parquet(s"$d/documents.parquet")
      d
    }
    def check(dir: String, n: Long, capacity: Long): Unit = {
      val ordered = (0L until n).map(i => (i, i % 200 + 1))
        .sortBy(x => md5hex(x._1.toString))
      var cum = 0L
      val truth = ordered.map { case (id, len) =>
        val cb = cum; cum += len; id -> ((cb / capacity, cb % capacity))
      }.toMap
      val got = queries.Curation.packSequences(spark, dir, capacity).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got.size == n)
      assert(got == truth,
        s"distributed prefix sum diverged at n=$n capacity=$capacity")
    }
    val d1 = synth("x1", 20000L)
    val d10 = synth("x10", 200000L)
    check(d1, 20000L, 2048L)
    check(d10, 200000L, 2048L)
    check(d10, 200000L, 8192L)
  }

  // ------------------------------------------------------------- repetition

  test("curate_quality_classify: student reproduces the teacher on held-out docs") {
    val conf = queries.Curation.curateQualityClassify(spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // both classes present in training (the confident bands are real)
    val trainByLabel = conf.filter(!_._1).groupBy(_._2).view.mapValues(_.map(_._4).sum)
    assert(trainByLabel.getOrElse(0L, 0L) > 0 && trainByLabel.getOrElse(1L, 0L) > 0,
      "confident bands must contain both classes")
    // held-out agreement with the teacher: the distillation must work
    val ho = conf.filter(_._1)
    val agree = ho.filter(r => r._2 == r._3).map(_._4).sum.toDouble
    val total = ho.map(_._4).sum.toDouble
    assert(total > 0, "holdout split must be non-empty")
    assert(agree / total >= 0.9,
      s"holdout teacher agreement ${agree / total} below 0.9")
    // determinism: a second run yields the identical confusion matrix
    val again = queries.Curation.curateQualityClassify(spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(conf.toSet == again.toSet, "classifier run must be deterministic")
  }

  test("curate_sample_semantic: cluster-balanced, anchored, deterministic") {
    val rows = queries.Curation.curateSampleSemantic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.size >= 4, "must form multiple clusters")
    byCluster.foreach { case (c, vs) =>
      val size = vs.head._3
      assert(vs.length.toLong == size, s"cluster_size must equal members in $c")
      val kept = vs.count(_._4)
      assert(kept >= 1, s"cluster $c must keep its anchor")
      assert(kept <= vs.length, s"cluster $c kept more than its members")
      // hash-threshold sampling concentrates near the 64-doc budget
      if (size >= 64) assert(kept >= 16 && kept <= 192,
        s"cluster $c kept $kept of $size — far from the 64 budget")
      // the min-id anchor is always kept
      assert(vs.filter(_._1 == vs.map(_._1).min).forall(_._4),
        s"cluster $c anchor not kept")
    }
    // balance: full-budget clusters keep within 4x of each other
    val full = byCluster.values.filter(_.head._3 >= 64).map(_.count(_._4))
    if (full.size >= 2)
      assert(full.max <= 4 * full.min,
        s"kept counts unbalanced: ${full.mkString(",")}")
    // determinism across runs
    val again = queries.Curation.curateSampleSemantic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.toSet == again.toSet, "sampler must be deterministic")
  }

  test("text_repetition matches in-memory Gopher signals") {
    def round4(d: Double): Double =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val truth = docs.map { case (id, text, _, _, _) =>
      val w = toks(text)
      val n = w.length.toDouble
      val dupW = round4(1.0 - w.distinct.length / n)
      val bg = if (w.length >= 2) w.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
      val dupB = if (bg.isEmpty) 0.0 else round4(1.0 - bg.distinct.length.toDouble / bg.length)
      val top = round4(w.groupBy(identity).values.map(_.length).max / n)
      id -> ((w.length.toLong, dupW, dupB, top))
    }.toMap
    val got = queries.Curation.textRepetition(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1).toLong, r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == truth.keySet)
    truth.foreach { case (id, t) =>
      assert(got(id) == t, s"doc $id: got ${got(id)} want $t")
    }
  }
}
