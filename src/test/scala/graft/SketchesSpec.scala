package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // adversarial stream: vocabulary (1000) >> sketch capacity (10), so
  // every partition's summary is under constant eviction pressure —
  // the path the 31-token corpus never exercises. Deterministically
  // shuffled so heavy tokens interleave with the rare-token flood.
  private def skewedTokens(): Seq[String] = {
    val heavy = Seq.fill(500)("h1") ++ Seq.fill(300)("h2") ++ Seq.fill(150)("h3")
    val rare = (1 to 1000).map(i => s"rare$i")
    val all = (heavy ++ rare).zipWithIndex
      .sortBy { case (t, i) => ((i * 2654435761L + t.hashCode) & 0x7fffffffL, t) }
      .map(_._1)
    all
  }

  test("MG candidates contain every true heavy hitter under eviction pressure") {
    val k = 10
    val toks = spark.createDataset(skewedTokens()).repartition(8).as[String]
    val n = toks.count()
    val exactHeavy = toks.groupBy("value").count()
      .filter(col("count") * k > n).select("value").as[String].collect().toSet
    assert(exactHeavy == Set("h1", "h2"), s"fixture drift: $exactHeavy")
    val cands = Sketches.mgCandidates(toks, k).as[String].collect().toSet
    // completeness (the law the exact recount relies on): any token
    // with global count > N/k must survive SOME partition's summary
    assert(exactHeavy.subsetOf(cands),
      s"MG lost a true heavy hitter: missing ${exactHeavy.diff(cands)}")
    // boundedness: at most k survivors per partition
    assert(cands.size <= 8 * k,
      s"candidate set ${cands.size} exceeds k×partitions = ${8 * k}")
    // the eviction path actually ran: a no-eviction sketch would
    // surface the whole 1003-token vocabulary as candidates
    assert(cands.size < 1003,
      "sketch never evicted — the fixture must overflow capacity")
  }

  test("sketch+verify composition equals the exact aggregate regardless of layout") {
    val k = 10
    for (parts <- Seq(1, 3, 8)) {
      val toks = spark.createDataset(skewedTokens()).repartition(parts).as[String]
      val n = toks.count()
      val cands = Sketches.mgCandidates(toks, k)
      val verified = toks.toDF("token")
        .join(broadcast(cands), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("c"))
        .filter(col("c") * k > n)
        .as[(String, Long)].collect().toSet
      val exact = toks.groupBy("value").count()
        .filter(col("count") * k > n)
        .as[(String, Long)].collect().toSet
      assert(verified == exact,
        s"verified heavy hitters diverged from exact at $parts partitions")
    }
  }

  test("MG with capacity >= vocabulary is the identity (no-eviction regime)") {
    // the corpus regime: k above distinct-token count — every token
    // must surface as a candidate, summaries never evict
    val toks = spark.createDataset(skewedTokens()).repartition(4).as[String]
    val vocab = toks.distinct().collect().toSet
    val cands = Sketches.mgCandidates(toks, vocab.size + 10).as[String].collect().toSet
    assert(cands == vocab)
  }

  test("q107 Bloom-prefiltered decontamination equals q66 row-for-row") {
    val bloom = SparkEntry.queries("q107_bloom_decontaminate")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSet
    val exact = SparkEntry.queries("q66_decontaminate")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(bloom.nonEmpty && bloom == exact,
      "the Bloom stage must only prune candidates, never change the answer")
    Caches.releaseAll()
    // budget gate (r10 verdict #2): an eval suite past the driver-Bloom
    // budget must route to the exact distributed semi-join — same rows.
    // budget=1 gram forces the past-budget route on this corpus.
    val gated = Sketches.bloomDecontaminate(spark, sf, evalGramBudget = 1L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(gated == exact,
      "past-budget route (exact semi-join, no driver Bloom) must equal the Bloom route")
    Caches.releaseAll()
  }

  test("q102 returns the corpus's exact heavy-hitter set") {
    val rows = SparkEntry.queries("q102_heavy_hitters")(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(rows.nonEmpty)
    val toks = Tables.documents(spark, sf)
      .select(explode(split(trim($"text"), "\\s+")).as("token"))
      .filter(length($"token") > 0)
    val n = toks.count()
    val exact = toks.groupBy("token").count().filter(col("count") * 40 > n)
      .as[(String, Long)].collect().toMap
    assert(rows == exact)
  }

  test("q181 HLL maintenance: merge == recompute, nightly algebra, 5% of exact") {
    val ev = Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"), $"user_id").cache()
    try {
      val daily = ev.groupBy("event_type", "day")
        .agg(hll_sketch_agg($"user_id").as("sk")).cache()
      // (1) merge == recompute: union of the daily sketches carries the
      // SAME register state as a one-shot sketch of the whole stream
      // (HLL union at equal lgConfigK is lossless) — estimates must be
      // EQUAL, not just close
      val merged = daily.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
        .as[(String, Long)].collect().toMap
      val oneShot = ev.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"))
        .as[(String, Long)].collect().toMap
      assert(merged.nonEmpty && merged == oneShot,
        s"union-of-dailies diverged from one-shot sketch: $merged vs $oneShot")
      // (2) the nightly algebra: stored state (all days but the last)
      // + tonight's single-day sketch == the full union — the append a
      // production pipeline performs without rescanning history
      val lastDay = ev.agg(max($"day")).head.getDate(0)
      val stored = daily.filter($"day" =!= lit(lastDay))
        .groupBy("event_type").agg(hll_union_agg($"sk").as("sk"))
      val tonight = ev.filter($"day" === lit(lastDay))
        .groupBy("event_type").agg(hll_sketch_agg($"user_id").as("sk"))
      val appended = stored.unionByName(tonight)
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
        .as[(String, Long)].collect().toMap
      assert(appended == merged,
        s"stored+tonight union diverged from full union: $appended vs $merged")
      // (3) exact-twin tolerance: the estimate serves within 5% of the
      // true distinct count (lgConfigK=12 default ≈ 1.6% RSE)
      val exact = ev.groupBy("event_type")
        .agg(countDistinct($"user_id").as("n")).as[(String, Long)].collect().toMap
      exact.foreach { case (et, n) =>
        val est = merged(et)
        assert(math.abs(est - n).toDouble / n.max(1L) <= 0.05,
          s"$et: estimate $est vs exact $n exceeds 5%")
      }
      daily.unpersist()
    } finally ev.unpersist()
  }

  test("q187 sliding distinct: window union == direct recompute, 5% of exact") {
    val rows = SparkEntry.queries("q187_sliding_distinct")(spark, sf)
      .select($"event_type", $"end_day".cast("string"), $"est_users_7d")
      .as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    Caches.releaseAll()
    val ev = Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"), $"user_id").cache()
    try {
      // direct recompute: for each served (type, end_day), one sketch
      // over the RAW events in [end-6, end] — the union of daily
      // sketches must carry the identical register state (HLL union
      // losslessness), so estimates are EQUAL, not just close
      val direct = ev
        .join(ev.select($"event_type", $"day".as("end_day")).distinct(),
          Seq("event_type"))
        .filter($"day" <= $"end_day" && $"day" >= date_sub($"end_day", 6))
        .groupBy($"event_type", $"end_day")
        .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"))
        .select($"event_type", $"end_day".cast("string"), $"est")
        .as[(String, String, Long)].collect()
        .map { case (t, d, e) => (t, d) -> e }.toMap
      rows.foreach { case (t, d, est) =>
        assert(direct((t, d)) == est,
          s"($t, $d): window union $est != direct recompute ${direct((t, d))}")
      }
      // exact-twin tolerance on the same windows
      val exact = ev
        .join(ev.select($"event_type", $"day".as("end_day")).distinct(),
          Seq("event_type"))
        .filter($"day" <= $"end_day" && $"day" >= date_sub($"end_day", 6))
        .groupBy($"event_type", $"end_day")
        .agg(countDistinct($"user_id").as("n"))
        .select($"event_type", $"end_day".cast("string"), $"n")
        .as[(String, String, Long)].collect()
        .map { case (t, d, n) => (t, d) -> n }.toMap
      rows.foreach { case (t, d, est) =>
        val n = exact((t, d))
        assert(math.abs(est - n).toDouble / n.max(1L) <= 0.05,
          s"($t, $d): estimate $est vs exact $n exceeds 5%")
      }
    } finally ev.unpersist()
  }
}
