package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextAnalysis._

/** Retrieval-side text operators (mechanical module split of the
  * former 4.3k-LoC TextAnalysis.scala, r8 verdict #7 — queries/oracles
  * maps concatenate in SparkEntry exactly as before): BM25 ranked
  * retrieval and incremental postings maintenance, sparse TF-IDF
  * cosine, winnowed fingerprints / MOSS-style plagiarism pairs, PMI
  * phrase mining, hybrid RRF fusion, RAG index build, positional
  * phrase search, per-doc keywords, and postings-size planning.
  * Shared scalar/scoring helpers live in [[TextAnalysis]]
  * (private[operators]) so the single-spelling laws keep holding
  * across the split. */
object TextRetrieval {

  val queries: Map[String, Q] = Map(
    // Winnowing fingerprints (rolling-hash document signatures), bounded
    // slice — the content-overlap-robust counterpart of q34's identity
    // fingerprint. Runs as the codegen'd [[graft.plans.WinnowFpExpr]]
    // (one pass: gram hashes + winnow mins + first-occurrence dedup);
    // the HOF spellings below stay as the executable reference it is
    // lockstep-tested against (TextDedupSpec) and the oracle replays.
    "q46_winnow_fingerprint" -> ((s, dir) => {
      graft.plans.WinnowFp.register(s)
      Tables.documents(s, dir)
        .filter(col("doc_id") < 100)
        // ASCII-normalize first: the ORACLE's byte-level replay of the
        // hash only matches code points for ASCII (the kernel itself is
        // code-point-exact at any input)
        .withColumn("t7", regexp_replace(col("text"), "[^\\x00-\\x7F]", ""))
        .withColumn("w", call_function(graft.plans.WinnowFp.NAME, col("t7")))
        .select(col("doc_id"),
          col("w.n_grams").as("n_grams"),
          size(col("w.wfp")).as("n_fp"),
          expr("array_min(w.wfp)").as("fp_min"),
          expr("array_max(w.wfp)").as("fp_max"))
        .orderBy("doc_id")
    }),

    // MOSS-style plagiarism pairs over WINNOWED fingerprints
    // (Schleimer et al. 2003, the winnowing paper's actual use case —
    // q46 computes char-level fingerprints, THIS generates pairs):
    // docs sharing >= 20% of the smaller side's fingerprint set,
    // discovered through an inverted index on fingerprints with a
    // df <= 10 ceiling (MOSS's "ignore fingerprints in too many
    // documents" — over-common hashes carry no plagiarism signal AND
    // are exactly what would blow the index join up; the ceiling is
    // semantics and scale guard at once). The winnow unit here is the
    // TOKEN 8-gram (md5 gram hashes, lexicographic min over windows
    // of 4 — pure HOFs, no kernel needed), for the same reason q65
    // uses token shingles: char n-grams saturate on a small-vocabulary
    // corpus, leaving every fingerprint over-common and the pair set
    // empty. Containment denominators use the FULL per-doc
    // fingerprint counts; only the shared-count numerator is
    // rare-scoped. All-integer overlap fraction ⇒ hash-matched.
    // Scale shape: one generate-only winnow pass, index join bounded
    // by the df ceiling, never doc×doc.
    "q140_winnow_pairs" -> ((s, dir) => {
      graft.plans.TokenGramMd5s.register(s)
      val fps = graft.Caches.cached(
        Tables.fanOut(Tables.documents(s, dir))
          .select(col("doc_id"), wsToks.as("toks"))
          .filter(size(col("toks")) >= 8)
          .withColumn("gh", call_function(graft.plans.TokenGramMd5s.NAME,
            col("toks"), lit(8)))
          .withColumn("fp", explode(expr(
            "array_distinct(transform(sequence(1, greatest(size(gh) - 3, 1)), " +
              "i -> array_min(slice(gh, i, 4))))")))
          .select("doc_id", "fp"))
      val sizes = fps.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
      val rare = fps.join(
        // (doc_id, fp) is UNIQUE by construction (fp comes from an
        // array_distinct per doc), so the document frequency is a plain
        // count — countDistinct's rewrite added a second corpus-sized
        // exchange + aggregate to dedup already-distinct pairs (r13,
        // guide §2.4, the components()/pageRank vouched-unique rule)
        fps.groupBy("fp").agg(count(lit(1)).as("nd"))
          .filter(col("nd") <= 10).select("fp"),
        Seq("fp"), "left_semi")
      rare.as("x").join(rare.as("y"),
          col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .agg(count(lit(1)).as("n_shared"))
        .join(sizes.select(col("doc_id").as("a_id"), col("n_fp").as("a_fp")), "a_id")
        .join(sizes.select(col("doc_id").as("b_id"), col("n_fp").as("b_fp")), "b_id")
        .withColumn("overlap_milli",
          expr("(n_shared * 1000) DIV least(a_fp, b_fp)"))
        .filter(col("overlap_milli") >= 200)
        .select("a_id", "b_id", "n_shared", "a_fp", "b_fp", "overlap_milli")
        .orderBy("a_id", "b_id")
    }),

    // Rarity-weighted characteristic terms — tf-idf-shaped keyword
    // extraction: per (doc, token) term frequency weighted by inverse
    // document frequency, top 3 per doc. The weight is tf/df (a
    // DIVISION, not tf·ln(N/df)): IEEE division is bit-exact on every
    // engine while libm log is not, and for a fixed tf the two rank df
    // identically — the deviation is documented, not accidental.
    // Scale shape: one (token → df) aggregate over distinct
    // (doc, token) pairs joined back by token (broadcast-sized for any
    // natural vocabulary), one (doc, token) count, one per-doc window.
    "q77_top_rarity_terms" -> ((s, dir) => {
      // filter BEFORE fanOut: the slice predicate reaches the scan as a
      // prunable pushed filter, and only the ~300 surviving docs pay the
      // repartition (fanning out the full corpus to keep 300 rows was
      // the r04 ADVICE finding)
      val docs = Tables.fanOut(Tables.documents(s, dir).filter(col("doc_id") < 300))
        .select(col("doc_id"), explode(wsToks).as("token"))
      val tf = docs.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("weight").desc, col("token").asc)
      tf.join(df, Seq("token"))
        .withColumn("weight", col("tf").cast("double") / col("df").cast("double"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"),
          col("weight"))
        .orderBy("doc_id", "rank")
    }),

    // Exact all-pairs sparse TF-IDF cosine over token-BIGRAM terms —
    // the inverted-index ("term-at-a-time") all-pairs similarity shape
    // (Bayardo et al., WWW'07): pairs are generated ONLY through
    // shared terms, never a doc×doc join, so cost is Σ_t C(df_t, 2),
    // bounded by the df ceiling. Weights are exact integers
    // (tf · (100000 DIV df) — integer division; the global N factor of
    // classic idf cancels inside cosine), so dot products and norms are
    // order-independent long sums and the final cosine is one IEEE
    // divide over two correctly-rounded sqrts: bit-identical on any
    // engine. Scale shape: at 100 TB the df ceiling (here 60) is the
    // knob — it caps per-term fan-out exactly like a stop-word list,
    // and the term join is salt-able by the q37 survivors spelling.
    // Complements q36 (set Jaccard) with magnitude-aware similarity.
    "q91_sparse_cosine" -> ((s, dir) => {
      val d = Tables.fanOut(Tables.documents(s, dir).filter(col("doc_id") < 300))
        .select(col("doc_id"), wsToks.as("toks"))
        .filter(size(col("toks")) >= 2) // explicit: sequence() descends when hi<1
      val terms = d.select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks)-1)," +
          " i -> concat(element_at(toks, i), ' ', element_at(toks, i+1)))"))
        .as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 60)
      val w = graft.Caches.cached(tf.join(dfT, Seq("term"))
        .select(col("doc_id"), col("term"),
          expr("tf * (100000 DIV df)").as("w")))
      val norms = w.groupBy("doc_id").agg(sum(col("w") * col("w")).as("nn"))
      val dots = w.as("a").join(w.as("b"),
          col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(sum(col("a.w") * col("b.w")).as("dot"))
      dots
        .join(norms.select(col("doc_id").as("a_id"), col("nn").as("na")), "a_id")
        .join(norms.select(col("doc_id").as("b_id"), col("nn").as("nb")), "b_id")
        .select(col("a_id"), col("b_id"),
          (col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
            .as("cos"))
        .filter(col("cos") >= 0.3)
        .orderBy("a_id", "b_id")
    }),

    // BM25-style ranked keyword retrieval — the postings-list scoring a
    // quality-targeted corpus search runs: broadcast query terms join a
    // (doc, token, tf) postings aggregate, per-term scores sum per
    // (query, doc), top-3 docs per query. The idf is the RATIONAL BM25
    // variant ((N - df + 0.5)/(df + 0.5), i.e. ln's argument — ln
    // itself is libm-dependent and not cross-engine bit-stable; the
    // transform is monotone so ranking semantics are preserved), and
    // per-term scores are floor-scaled to longs before summing so the
    // per-doc total is order-independent. k1 = 1.2, b = 0.75. Scale
    // shape: the corpus side is one scan + one (doc, token) aggregate;
    // queries and the global (N, avgdl) row broadcast; the only
    // wide exchange carries matching postings keyed by (query, doc);
    // the rank window partitions by query over ≤ N rows per query.
    "q92_bm25_topk" -> ((s, dir) => {
      bm25Ranked(s, dir)
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("doc_id"),
          (col("sts").cast("double") / lit(1e6)).as("score"))
        .orderBy("query_id", "rank")
    }),

    // INCREMENTAL POSTINGS MAINTENANCE — the serving-index analogue of
    // q93's rollup algebra, proved at the RESULT level: the stored BM25
    // index state (postings, term dfs, doc lengths, totals over the
    // pre-existing corpus) absorbs tonight's batch by pure state
    // algebra — postings/doclens UNION (doc sets are disjoint), dfs
    // ADD, totals ADD — and the query then serves top-3 retrieval FROM
    // THE MERGED STATE through the exact q92 scorer ([[bm25Score]],
    // single spelling). The oracle is q92's full-rebuild SQL, so the
    // driver hash proves append == rebuild all the way to ranked
    // results, idf/avgdl shifts included — the property that lets a
    // 100 TB index take nightly batches without re-tokenizing the
    // corpus. Spelled STATE-FREE (the q93/q121 exact-twin pattern):
    // the "stored" state is derived inline from the corpus slice so
    // the whole computation is oracle-checkable — in production that
    // side is READ from the persisted index, and only the batch pays
    // tokenization; the merge itself (the part this query proves) is
    // union + a vocab-sized df add + totals add.
    //
    // ONE tokenize pass (r8 verdict #3): the corpus is tagged with an
    // is_batch flag and BOTH slices' states come out of the same cached
    // (doc, is_batch, token, tf) postings aggregate via conditional
    // aggregation — the per-slice dfs are still computed separately
    // (the sum(when(is_batch...)) partials ARE the two states) and then
    // ADDED, so the state algebra this query proves is unchanged; what
    // went away is the second tokenize+explode of the corpus that the
    // two disjoint-slice pipelines used to pay (and a third, from the
    // uncached tf feeding both the df derivation and the scoring join).
    "q150_incremental_postings" -> ((s, dir) => {
      val d = Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), (col("doc_id") % 10 === 0).as("is_batch"),
          wsToks.as("toks"))
      val dl = d.select(col("doc_id"), col("is_batch"),
        size(col("toks")).cast("long").as("dl"))
      val tf = graft.Caches.cached(
        d.select(col("doc_id"), col("is_batch"), explode(col("toks")).as("token"))
          .groupBy("doc_id", "is_batch", "token").agg(count(lit(1)).as("tf")))
      // stored df + batch df, added — the two conditional partials are
      // exactly the per-slice df states the full-outer join used to merge
      val dfT = tf.groupBy("token")
        .agg(sum(when(col("is_batch"), 0L).otherwise(1L)).as("df_stored"),
          sum(when(col("is_batch"), 1L).otherwise(0L)).as("df_batch"))
        .select(col("token"), (col("df_stored") + col("df_batch")).as("df"))
      val stats = dl
        .agg(sum(when(col("is_batch"), 0L).otherwise(1L)).as("n_stored"),
          sum(when(col("is_batch"), 1L).otherwise(0L)).as("n_batch"),
          sum(when(col("is_batch"), 0L).otherwise(col("dl"))).as("tot_stored"),
          sum(when(col("is_batch"), col("dl")).otherwise(0L)).as("tot_batch"))
        .select((col("n_stored") + col("n_batch")).as("n_docs"),
          ((col("tot_stored") + col("tot_batch")).cast("double") /
            (col("n_stored") + col("n_batch")).cast("double")).as("avgdl"))
      bm25Score(bm25Qterms(s), tf.select("doc_id", "token", "tf"), dfT,
        dl.select("doc_id", "dl"), stats)
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("doc_id"),
          (col("sts").cast("double") / lit(1e6)).as("score"))
        .orderBy("query_id", "rank")
    }),

    // PMI phrase mining — the collocation-scoring pass of phrase-vocab
    // / tokenizer construction (word2phrase-style): corpus bigram and
    // unigram counts; since log is monotone, PMI ranking equals ranking
    // by c_xy·N/(c_x·c_y), emitted as ONE scaled BIGINT
    // (c_xy·N·10^6 DIV c_x·c_y) so the score is bit-stable across
    // engines (no log, no doubles); df floor 5, top-20 by (score desc,
    // bigram asc — unique keys ⇒ deterministic cutoff). Scale shape:
    // two hash aggregates over the exploded token/bigram streams
    // (map-side partials absorb the fan-out); the scoring join is
    // vocab-sized on every side (distinct tokens/bigrams, never the
    // corpus), N arrives as a broadcast 1-row frame, and the top-k is
    // a TakeOrdered over the bounded scored vocabulary.
    "q110_phrase_pmi" -> ((s, dir) => {
      val toks = graft.Caches.cached(Tables.fanOut(Tables.documents(s, dir))
        .select(wsToks.as("toks")))
      val uni = graft.Caches.cached(toks.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c")))
      val tot = uni.agg(sum(col("c")).as("n"))
      val bi = toks.filter(size(col("toks")) >= 2)
        .withColumn("i", explode(sequence(lit(1), size(col("toks")) - 1)))
        .select(element_at(col("toks"), col("i")).as("x"),
          element_at(col("toks"), col("i") + 1).as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= 5)
      bi.join(uni.select(col("w").as("x"), col("c").as("c_x")), Seq("x"))
        .join(uni.select(col("w").as("y"), col("c").as("c_y")), Seq("y"))
        .crossJoin(broadcast(tot))
        .select(concat(col("x"), lit(" "), col("y")).as("bigram"),
          col("c_xy"), col("c_x"), col("c_y"),
          expr("(c_xy * n * 1000000) DIV (c_x * c_y)").as("pmi_score"))
        .orderBy(col("pmi_score").desc, col("bigram").asc)
        .limit(20)
    }),

    // RAG index-build capstone — the retrieval-side sibling of q100's
    // pretraining capstone: chunk the corpus (q63's 50/40 overlapping
    // windows), dedup chunks exactly (md5 fingerprint, min
    // (doc, chunk) canonical — overlapping chunking plus corpus
    // near-dups makes chunk-level dedup load-bearing, not decorative),
    // then build BM25 over the SURVIVING chunks and serve the q92
    // query set with provenance (doc_id, chunk_id). Every stage is an
    // exact, already-proven spelling, so the whole build+serve chain
    // is DuckDB hash-checked end to end. Scale shape: chunking is a
    // generate (no shuffle); dedup is one fp-keyed aggregate + semi-
    // join; the postings/df aggregates are map-side combined; the
    // 1-row stats frame broadcasts (q92's documented shape).
    "q130_rag_index_build" -> ((s, dir) => {
      import s.implicits._
      val nChunks =
        greatest(ceil((size(col("toks")) - 50).cast("double") / 40.0).cast("int"),
          lit(0)) + 1
      val start = col("chunk_id") * 40 + 1
      val chunks = graft.Caches.cached(
        Tables.fanOut(Tables.documents(s, dir))
          .select(col("doc_id"), wsToks.as("toks"))
          .withColumn("chunk_id", explode(sequence(lit(0), nChunks - 1)))
          .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
            slice(col("toks"), start, lit(50)).as("ctoks"))
          .withColumn("fp", md5(array_join(col("ctoks"), " "))))
      val canon = chunks.groupBy("fp")
        .agg(min(struct(col("doc_id"), col("chunk_id"))).as("m"))
        .select(col("fp"), col("m.doc_id").as("doc_id"),
          col("m.chunk_id").as("chunk_id"))
      val surv = graft.Caches.cached(
        chunks.join(canon, Seq("fp", "doc_id", "chunk_id"), "left_semi"))
      val qterms = Seq(1L -> "hash", 1L -> "join", 2L -> "window",
        2L -> "agg", 3L -> "stream", 3L -> "batch", 4L -> "vector",
        4L -> "scan", 5L -> "customer", 5L -> "query")
        .toDF("query_id", "token")
      val dl = surv.select(col("doc_id"), col("chunk_id"),
        size(col("ctoks")).cast("long").as("dl"))
      val tf = surv
        .select(col("doc_id"), col("chunk_id"), explode(col("ctoks")).as("token"))
        .groupBy("doc_id", "chunk_id", "token").agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val stats = dl.agg(count(lit(1)).as("n_chunks"), sum(col("dl")).as("tot"))
        .select(col("n_chunks"),
          (col("tot").cast("double") / col("n_chunks").cast("double")).as("avgdl"))
      val scored = tf.join(broadcast(qterms), Seq("token"))
        .join(dfT, Seq("token"))
        .join(dl, Seq("doc_id", "chunk_id"))
        .crossJoin(broadcast(stats)) // 1 row (q92's documented shape)
        .withColumn("idf",
          (col("n_chunks").cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5)))
        .withColumn("nrm",
          lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl")))
        .withColumn("ts", floor(col("idf") *
          ((col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") + lit(1.2) * col("nrm"))) * lit(1e6))
          .cast("long"))
        .groupBy("query_id", "doc_id", "chunk_id")
        .agg(sum(col("ts")).as("sts"))
      val rk = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("sts").desc, col("doc_id").asc, col("chunk_id").asc)
      scored.withColumn("rank", row_number().over(rk))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("doc_id"), col("chunk_id"),
          (col("sts").cast("double") / lit(1e6)).as("score"))
        .orderBy("query_id", "rank")
    }),

    // Hybrid retrieval — reciprocal-rank fusion (Cormack et al. 2009)
    // of the two ranking modalities the engine already serves: q92's
    // BM25 keyword leg and the exact-cosine embedding leg (query
    // vector = the query's id, the synthetic corpus correspondence).
    // RRF stays ALL-INTEGER: 10^6 DIV (60 + rank) per leg, summed —
    // rank fusion needs no score calibration, which is exactly why
    // production hybrid search uses it. Scale shape: each leg is
    // already a bounded top-10-per-query frame when fusion sees it
    // (WindowGroupLimit prunes the vector leg; the BM25 leg only
    // ranks candidate docs containing a query term), so the
    // full-outer fusion join and the final top-5 window run on
    // |queries|·≤20 rows however large the corpus.
    "q123_hybrid_retrieval" -> ((s, dir) => {
      val bm = bm25Ranked(s, dir).filter(col("rank") <= 10)
        .select(col("query_id"), col("doc_id"),
          col("rank").cast("long").as("rank_b"))
      val e = Tables.embeddings(s, dir)
      val vec = graft.similarity.Similarity
        .topK(e.filter(col("vec_id").between(1, 5)), e, 10)
        .select(col("q_id").as("query_id"), col("c_id").as("doc_id"),
          col("rank").cast("long").as("rank_v"))
      val fused = bm.join(vec, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf_scaled", expr(
          """coalesce(1000000 DIV (60 + rank_b), 0) +
             coalesce(1000000 DIV (60 + rank_v), 0)"""))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("rrf_scaled").desc, col("doc_id").asc)
      fused.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("doc_id"), col("rrf_scaled"), col("rank_b"), col("rank_v"))
        .orderBy("query_id", "rank")
    }),

    // PHRASE-QUERY SERVING FROM POSITIONAL POSTINGS — the retrieval
    // op BM25 can't express: find every occurrence of an exact
    // 3-token phrase by INTERSECTING position lists (term t at p,
    // t' at p+1, t'' at p+2), never re-scanning document text. The
    // phrase is the corpus's own top trigram (count desc, lexical
    // asc — deterministic), so the query is self-contained and
    // non-empty at every SF. Scale shape: the phrase row is a 1-row
    // broadcast; each leg filters the postings to ONE term before
    // its equi-join on (doc, pos±k) — at production scale postings
    // live term-sharded, so each leg is a pushed-down point lookup,
    // and the join moves only the three terms' lists, not the corpus.
    "q168_phrase_search" -> ((s, dir) => {
      val toksDf = graft.Caches.cached(
        Tables.fanOut(Tables.documents(s, dir))
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"), wsToks.as("toks")))
      val top = toksDf.filter(size(col("toks")) >= 3)
        .select(explode(expr(
          """transform(sequence(1, size(toks) - 2),
             j -> concat_ws(' ', toks[j-1], toks[j], toks[j+1]))""")).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("g").asc).limit(1)
        .select(col("g"), split(col("g"), " ").as("ts"))
        .select(col("g"), col("ts").getItem(0).as("w1"),
          col("ts").getItem(1).as("w2"), col("ts").getItem(2).as("w3"))
      val pos = graft.Caches.cached(
        toksDf.select(col("doc_id"), posexplode(col("toks"))
          .as(Seq("p", "w"))))
      val b = broadcast(top)
      val m1 = pos.crossJoin(b).filter(col("w") === col("w1"))
        .select(col("doc_id"), col("p"), col("g"), col("w2"), col("w3"))
      // r8 verdict #2: legs 2 and 3 are TERM-FILTERED before the
      // positional join — a broadcast semi-join against the phrase
      // row's own term column prunes each leg to ONE term's posting
      // list, so the (doc, pos±k) equi-join moves three terms' lists,
      // never the full positional posting table (the term equality in
      // the join condition alone prunes nothing: it compares against a
      // non-literal, so the whole corpus-sized leg would stream into
      // the join). PlanSpec pins that no positional-join input is an
      // unfiltered corpus-sized posting scan.
      val m2 = pos.join(broadcast(top.select(col("w2").as("w"))), Seq("w"), "left_semi")
        .select(col("doc_id").as("d2"), col("p").as("q2"), col("w").as("u2"))
      val m3 = pos.join(broadcast(top.select(col("w3").as("w"))), Seq("w"), "left_semi")
        .select(col("doc_id").as("d3"), col("p").as("q3"), col("w").as("u3"))
      m1.join(m2, col("doc_id") === col("d2") &&
          col("q2") === col("p") + 1 && col("u2") === col("w2"))
        .join(m3, col("doc_id") === col("d3") &&
          col("q3") === col("p") + 2 && col("u3") === col("w3"))
        .groupBy(col("doc_id"), col("g").as("phrase"))
        .agg(count(lit(1)).as("n_occ"))
        .select(col("doc_id"), col("phrase"), col("n_occ"))
        .orderBy("doc_id")
    }),

    // PER-DOCUMENT KEYWORD EXTRACTION — top-3 TF-IDF terms per doc
    // (the tagging/routing signal a corpus catalog serves next to
    // q68's per-SOURCE vocabulary): idf is q92's rational integer
    // ((N+1)·10⁶ DIV (df+1)), so every score is exact fixed point
    // and ties break on the token itself. Scale shape: tf and df are
    // map-side-combined aggregates; the df table is vocab-sized and
    // stats-gated; N is a 1-row broadcast; the per-doc rank<=3
    // compiles to WindowGroupLimit (q120's plan shape) — top-k
    // per partition BEFORE the exchange, never a global sort.
    "q178_doc_keywords" -> ((s, dir) => {
      val wD = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score_scaled").desc, col("token").asc)
      val tok = graft.Caches.cached(Tables.fanOut(Tables.documents(s, dir))
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(wsToks).as("token")))
      val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfT = tok.select("doc_id", "token").distinct()
        .groupBy("token").agg(count(lit(1)).as("df"))
      val n = tok.select(countDistinct(col("doc_id")).as("n"))
      tf.join(Tables.maybeBroadcast(dfT), Seq("token"))
        .crossJoin(broadcast(n)) // 1 row: the doc count
        .withColumn("score_scaled",
          expr("tf * (((n + 1) * 1000000) DIV (df + 1))"))
        .withColumn("rank", row_number().over(wD))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("token"), col("tf"), col("df"), col("score_scaled"))
        .orderBy("doc_id", "rank")
    }),

    // POSTINGS-SIZE PLANNER — the index-capacity estimate an IR store
    // runs before choosing encodings: rare tokens (df ≤ 256) cost
    // their exact VARINT-coded doc-id gaps (7 bits per byte —
    // (len(bin(gap)) + 6) DIV 7, all-integer); hot tokens cost a
    // BITMAP (maxdoc DIV 8 + 1 bytes each) computed in CLOSED FORM
    // from df alone — no per-posting pass ever touches a hot list.
    // Report per df-octave band and encoding class. Scale shape: the
    // gap window partitions by token ONLY AFTER the df ≤ 256 filter,
    // so every window task is ceiling-bounded by construction — the
    // same df-ceiling idea that bounds the sparse-retrieval family,
    // here bounding a WINDOW instead of a join.
    "q179_postings_bytes" -> ((s, dir) => {
      val wT = org.apache.spark.sql.expressions.Window
        .partitionBy(col("token")).orderBy(col("doc_id"))
      val post = graft.Caches.cached(Tables.fanOut(Tables.documents(s, dir))
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(wsToks).as("token"))
        .distinct())
      val dfT = graft.Caches.cached(
        post.groupBy("token").agg(count(lit(1)).as("df")))
      val mx = post.agg(max(col("doc_id")).as("maxdoc"))
      val rare = post
        .join(Tables.maybeBroadcast(dfT.filter(col("df") <= 256)),
          Seq("token"))
        .withColumn("prev", lag(col("doc_id"), 1).over(wT))
        .withColumn("gap", when(col("prev").isNull, col("doc_id") + 1)
          .otherwise(col("doc_id") - col("prev")))
        .withColumn("vb", expr("(length(bin(gap)) + 6) DIV 7"))
        .withColumn("band", expr("CAST(length(bin(df)) AS BIGINT)"))
        .groupBy("band")
        .agg(countDistinct(col("token")).as("n_tokens"),
          count(lit(1)).as("n_postings"), sum(col("vb")).as("enc_bytes"))
        .select(lit("varint").as("cls"), col("band"), col("n_tokens"),
          col("n_postings"), col("enc_bytes"))
      val hot = dfT.filter(col("df") > 256)
        .crossJoin(broadcast(mx)) // 1 row: the doc-id ceiling
        .withColumn("band", expr("CAST(length(bin(df)) AS BIGINT)"))
        .groupBy("band")
        .agg(countDistinct(col("token")).as("n_tokens"),
          sum(col("df")).as("n_postings"),
          sum(expr("maxdoc DIV 8 + 1")).as("enc_bytes"))
        .select(lit("bitmap").as("cls"), col("band"), col("n_tokens"),
          col("n_postings"), col("enc_bytes"))
      rare.union(hot).orderBy("cls", "band")
    })
  )

  val oracles: Map[String, String] = Map(
    "q46_winnow_fingerprint" ->
      """WITH d AS (
           SELECT doc_id, regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS text
           FROM documents WHERE doc_id < 100),
         h AS (
           SELECT doc_id,
             CASE WHEN length(text) < 5 THEN CAST([] AS BIGINT[])
             ELSE list_transform(generate_series(1, length(text) - 4), i ->
               (unicode(substr(text, CAST(i AS INT), 1)) * 4362470401 +
                unicode(substr(text, CAST(i + 1 AS INT), 1)) * 16974593 +
                unicode(substr(text, CAST(i + 2 AS INT), 1)) * 66049 +
                unicode(substr(text, CAST(i + 3 AS INT), 1)) * 257 +
                unicode(substr(text, CAST(i + 4 AS INT), 1))) % 1000000007) END AS hs
           FROM d),
         w AS (
           SELECT doc_id, hs,
             CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
             ELSE list_distinct(list_transform(generate_series(1, greatest(len(hs) - 3, 1)),
               i -> list_aggregate(hs[CAST(i AS INT):CAST(i + 3 AS INT)], 'min'))) END AS wfp
           FROM h)
         SELECT doc_id, CAST(len(hs) AS INT) AS n_grams, CAST(len(wfp) AS INT) AS n_fp,
                list_aggregate(wfp, 'min') AS fp_min, list_aggregate(wfp, 'max') AS fp_max
         FROM w ORDER BY doc_id""",

    // token-8-gram md5 winnow (lexicographic-min windows of 4) + the
    // q91-style inverted-index pair CTEs with the df ceiling;
    // full-count denominators
    "q140_winnow_pairs" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         d8 AS (SELECT doc_id, toks, len(toks) AS n FROM d
                WHERE len(toks) >= 8),
         gh AS (
           SELECT doc_id,
             list_transform(generate_series(1, n - 7), i ->
               md5(array_to_string(toks[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')))
               AS gh
           FROM d8),
         w AS (
           SELECT doc_id,
             list_distinct(list_transform(generate_series(1, greatest(len(gh) - 3, 1)),
               i -> list_aggregate(gh[CAST(i AS INT):CAST(i + 3 AS INT)], 'min')))
               AS wfp
           FROM gh),
         fps AS (SELECT doc_id, unnest(wfp) AS fp FROM w),
         sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM fps GROUP BY 1),
         rare AS (
           SELECT fp FROM (
             SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM fps GROUP BY 1)
           WHERE nd <= 10),
         rf AS (SELECT * FROM fps WHERE fp IN (SELECT fp FROM rare)),
         sh AS (
           SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS n_shared
           FROM rf x JOIN rf y ON x.fp = y.fp AND x.doc_id < y.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id, n_shared, sa.n_fp AS a_fp, sb.n_fp AS b_fp,
           (n_shared * 1000) // LEAST(sa.n_fp, sb.n_fp) AS overlap_milli
         FROM sh JOIN sizes sa ON sa.doc_id = a_id
                 JOIN sizes sb ON sb.doc_id = b_id
         WHERE (n_shared * 1000) // LEAST(sa.n_fp, sb.n_fp) >= 200
         ORDER BY a_id, b_id""",

    "q77_top_rarity_terms" ->
      """WITH t AS (
           SELECT doc_id, unnest(str_split_regex(trim(text), '\s+')) AS token
           FROM documents WHERE doc_id < 300),
         tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
         r AS (
           SELECT doc_id, token, tf, df,
             CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS weight,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) DESC, token ASC)
               AS rank
           FROM tf JOIN df USING (token))
         SELECT doc_id, CAST(rank AS INT) AS rank, token, tf, df, weight
         FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",

    // q78's bigram spelling; integer weights make every sum
    // order-independent, cosine = one divide over two sqrts
    "q91_sparse_cosine" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE doc_id < 300),
         d2 AS (SELECT * FROM d WHERE len(toks) >= 2),
         g AS (
           SELECT doc_id, toks,
             unnest(generate_series(1, len(toks) - 1)) AS i
           FROM d2),
         t AS (
           SELECT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 1 AS INT)], ' ') AS term
           FROM g),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
                HAVING COUNT(*) <= 60),
         w AS (
           SELECT doc_id, term, CAST(tf * (100000 // df) AS BIGINT) AS w
           FROM tf JOIN df USING (term)),
         norms AS (SELECT doc_id, SUM(w * w) AS nn FROM w GROUP BY 1),
         dots AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, SUM(a.w * b.w) AS dot
           FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         cos AS (
           SELECT a_id, b_id,
             CAST(dot AS DOUBLE) /
               (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cos
           FROM dots JOIN norms na ON na.doc_id = a_id
                     JOIN norms nb ON nb.doc_id = b_id)
         SELECT a_id, b_id, cos FROM cos WHERE cos >= 0.3
         ORDER BY a_id, b_id""",

    // rational-idf BM25; per-term scores floor-scaled to BIGINT before
    // the per-doc sum (order-independent); parenthesization mirrors the
    // Spark expression term for term
    "q92_bm25_topk" -> bm25TopkOracleSql,

    // q92's FULL-REBUILD oracle verbatim: the Spark side serves from
    // the merged stored+batch index state, so hash equality proves
    // append == rebuild all the way to ranked results
    "q150_incremental_postings" -> bm25TopkOracleSql,

    // all-BIGINT score: COUNT(*) is BIGINT on both engines and the
    // total token count stays a COUNT (not SUM — DuckDB SUM(BIGINT)
    // widens to HUGEINT and would drag pmi_score to decimal128)
    "q110_phrase_pmi" ->
      """WITH d AS (
           SELECT str_split_regex(trim(text), '\s+') AS toks FROM documents),
         u AS (SELECT unnest(toks) AS w FROM d),
         uni AS (SELECT w, COUNT(*) AS c FROM u GROUP BY 1),
         tot AS (SELECT COUNT(*) AS n FROM u),
         bi0 AS (
           SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
           FROM d WHERE len(toks) >= 2),
         bi AS (
           SELECT toks[CAST(i AS INT)] AS x, toks[CAST(i + 1 AS INT)] AS y
           FROM bi0),
         cb AS (
           SELECT x, y, COUNT(*) AS c_xy FROM bi GROUP BY 1, 2
           HAVING COUNT(*) >= 5)
         SELECT cb.x || ' ' || cb.y AS bigram, cb.c_xy,
           ux.c AS c_x, uy.c AS c_y,
           (cb.c_xy * tot.n * 1000000) // (ux.c * uy.c) AS pmi_score
         FROM cb
         CROSS JOIN tot
         JOIN uni ux ON ux.w = cb.x
         JOIN uni uy ON uy.w = cb.y
         ORDER BY pmi_score DESC, bigram ASC LIMIT 20""",

    // chunk + dedup + BM25 stages each mirror their proven spellings
    // (q63 windows, min-struct canonical, q92 scoring over chunks)
    "q130_rag_index_build" ->
      """WITH q(query_id, token) AS (
           VALUES (1, 'hash'), (1, 'join'), (2, 'window'), (2, 'agg'),
                  (3, 'stream'), (3, 'batch'), (4, 'vector'), (4, 'scan'),
                  (5, 'customer'), (5, 'query')),
         d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id, toks,
             unnest(generate_series(0,
               GREATEST(CAST(ceil(CAST(len(toks) - 50 AS DOUBLE) / 40.0)
                 AS INT), 0))) AS chunk_id
           FROM d),
         chunks AS (
           SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             toks[(chunk_id * 40 + 1):(chunk_id * 40 + 50)] AS ctoks,
             md5(array_to_string(
               toks[(chunk_id * 40 + 1):(chunk_id * 40 + 50)], ' ')) AS fp
           FROM c),
         canon AS (
           SELECT fp, MIN({'d': doc_id, 'c': chunk_id}) AS m
           FROM chunks GROUP BY 1),
         surv AS (
           SELECT ch.* FROM chunks ch JOIN canon
             ON canon.fp = ch.fp AND (canon.m).d = ch.doc_id
                AND (canon.m).c = ch.chunk_id),
         dl AS (
           SELECT doc_id, chunk_id, CAST(len(ctoks) AS BIGINT) AS dl
           FROM surv),
         t AS (
           SELECT doc_id, chunk_id, unnest(ctoks) AS token FROM surv),
         tf AS (
           SELECT doc_id, chunk_id, token, COUNT(*) AS tf
           FROM t GROUP BY 1, 2, 3),
         df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
         stats AS (
           SELECT COUNT(*) AS n_chunks,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
           FROM dl),
         scored AS (
           SELECT q.query_id, tf.doc_id, tf.chunk_id,
             CAST(floor(
               ((CAST(s.n_chunks AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) /
                  (CAST(df.df AS DOUBLE) + 0.5)) *
               ((CAST(tf.tf AS DOUBLE) * 2.2) /
                  (CAST(tf.tf AS DOUBLE) +
                   1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / s.avgdl)))) *
               1e6) AS BIGINT) AS ts
           FROM tf JOIN q ON q.token = tf.token
                JOIN df ON df.token = tf.token
                JOIN dl ON dl.doc_id = tf.doc_id AND dl.chunk_id = tf.chunk_id
                CROSS JOIN stats s),
         agg AS (
           SELECT query_id, doc_id, chunk_id, SUM(ts) AS sts
           FROM scored GROUP BY 1, 2, 3),
         rk AS (
           SELECT query_id, doc_id, chunk_id, sts,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sts DESC, doc_id ASC, chunk_id ASC) AS rank
           FROM agg)
         SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(rank AS INT) AS rank, doc_id, chunk_id,
           CAST(sts AS DOUBLE) / 1e6 AS score
         FROM rk WHERE rank <= 3 ORDER BY query_id, rank""",

    // composed from the two legs' own proven spellings: cosSql's
    // decimal-pinned cosine ranks (the q38 oracle's core) + q92's
    // BM25 CTEs at rank<=10, fused with the identical integer RRF
    "q123_hybrid_retrieval" ->
      (graft.similarity.Similarity.cosSql(
        "WHERE vec_id BETWEEN 1 AND 5", "", "a.vec_id <> b.vec_id") +
      """, vrank AS (
           SELECT a_id AS query_id, b_id AS doc_id,
             CAST(row_number() OVER (PARTITION BY a_id
               ORDER BY cos DESC, b_id) AS BIGINT) AS rank_v
           FROM cosines),
         vtop AS (SELECT * FROM vrank WHERE rank_v <= 10),
         qt(query_id, token) AS (
           VALUES (1, 'hash'), (1, 'join'), (2, 'window'), (2, 'agg'),
                  (3, 'stream'), (3, 'batch'), (4, 'vector'), (4, 'scan'),
                  (5, 'customer'), (5, 'query')),
         d2 AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d2),
         t2 AS (SELECT doc_id, unnest(toks) AS token FROM d2),
         tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t2 GROUP BY 1, 2),
         df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
         stats AS (
           SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
           FROM dl),
         scored AS (
           SELECT qt.query_id, tf.doc_id,
             CAST(floor(
               ((CAST(s.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) /
                  (CAST(df.df AS DOUBLE) + 0.5)) *
               ((CAST(tf.tf AS DOUBLE) * 2.2) /
                  (CAST(tf.tf AS DOUBLE) +
                   1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / s.avgdl)))) *
               1e6) AS BIGINT) AS ts
           FROM tf JOIN qt ON qt.token = tf.token
                JOIN df ON df.token = tf.token
                JOIN dl ON dl.doc_id = tf.doc_id
                CROSS JOIN stats s),
         bagg AS (
           SELECT query_id, doc_id, SUM(ts) AS sts
           FROM scored GROUP BY 1, 2),
         brank AS (
           SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY sts DESC, doc_id ASC) AS BIGINT) AS rank_b
           FROM bagg),
         btop AS (SELECT * FROM brank WHERE rank_b <= 10),
         fused AS (
           SELECT COALESCE(b.query_id, v.query_id) AS query_id,
             COALESCE(b.doc_id, v.doc_id) AS doc_id,
             b.rank_b, v.rank_v,
             COALESCE(1000000 // (60 + b.rank_b), 0) +
               COALESCE(1000000 // (60 + v.rank_v), 0) AS rrf_scaled
           FROM btop b FULL OUTER JOIN vtop v
             ON v.query_id = b.query_id AND v.doc_id = b.doc_id),
         franked AS (
           SELECT query_id,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY rrf_scaled DESC, doc_id ASC) AS BIGINT) AS rank,
             doc_id, rrf_scaled, rank_b, rank_v
           FROM fused)
         SELECT query_id, rank, doc_id, rrf_scaled, rank_b, rank_v
         FROM franked WHERE rank <= 5 ORDER BY query_id, rank"""),

    // same top-trigram pick (count desc, lexical asc), then per-doc
    // occurrence counts replayed positionally; overlapping
    // occurrences count once per start position on both engines
    "q168_phrase_search" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE length(trim(text)) > 0),
         j AS (
           SELECT doc_id, toks,
             unnest(generate_series(1, len(toks) - 2)) AS j
           FROM d WHERE len(toks) >= 3),
         g AS (
           SELECT doc_id, array_to_string(toks[j:(j+2)], ' ') AS g
           FROM j),
         top AS (
           SELECT g, COUNT(*) AS c FROM g
           GROUP BY 1 ORDER BY c DESC, g ASC LIMIT 1)
         SELECT doc_id, (SELECT g FROM top) AS phrase,
           CAST(COUNT(*) AS BIGINT) AS n_occ
         FROM g WHERE g = (SELECT g FROM top)
         GROUP BY doc_id ORDER BY doc_id""",

    // q92's rational integer idf; rank ties break on the token
    "q178_doc_keywords" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE length(trim(text)) > 0),
         tok AS (SELECT doc_id, unnest(toks) AS token FROM d),
         tf AS (
           SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         dfT AS (
           SELECT token, COUNT(*) AS df
           FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY 1),
         n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tok),
         sc AS (
           SELECT tf.doc_id, tf.token, tf.tf, dfT.df,
             tf.tf * (((n.n + 1) * 1000000) // (dfT.df + 1))
               AS score_scaled
           FROM tf JOIN dfT USING (token) CROSS JOIN n),
         r AS (
           SELECT doc_id, token, tf, df, score_scaled,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score_scaled DESC, token ASC) AS rank
           FROM sc)
         SELECT doc_id, CAST(rank AS BIGINT) AS rank, token,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(score_scaled AS BIGINT) AS score_scaled
         FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",

    // same varint (7-bit groups via bin length) and closed-form
    // bitmap arithmetic; the first gap is doc_id + 1 (delta from -1)
    "q179_postings_bytes" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE length(trim(text)) > 0),
         post AS (
           SELECT DISTINCT doc_id, token
           FROM (SELECT doc_id, unnest(toks) AS token FROM d)),
         dfT AS (SELECT token, COUNT(*) AS df FROM post GROUP BY 1),
         mx AS (SELECT MAX(doc_id) AS maxdoc FROM post),
         rare AS (
           SELECT p.token, dfT.df, p.doc_id,
             lag(p.doc_id) OVER (PARTITION BY p.token
               ORDER BY p.doc_id) AS prev
           FROM post p JOIN dfT USING (token) WHERE dfT.df <= 256),
         rb AS (
           SELECT CAST(length(bin(df)) AS BIGINT) AS band, token,
             (length(bin(CASE WHEN prev IS NULL THEN doc_id + 1
                              ELSE doc_id - prev END)) + 6) // 7 AS vb
           FROM rare),
         rg AS (
           SELECT 'varint' AS cls, band,
             CAST(COUNT(DISTINCT token) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_postings, CAST(SUM(vb) AS BIGINT) AS enc_bytes
           FROM rb GROUP BY 2),
         hg AS (
           SELECT 'bitmap' AS cls,
             CAST(length(bin(df)) AS BIGINT) AS band,
             CAST(COUNT(DISTINCT token) AS BIGINT) AS n_tokens,
             CAST(SUM(df) AS BIGINT) AS n_postings,
             CAST(SUM(mx.maxdoc // 8 + 1) AS BIGINT) AS enc_bytes
           FROM dfT CROSS JOIN mx WHERE df > 256 GROUP BY 2)
         SELECT * FROM rg UNION ALL SELECT * FROM hg
         ORDER BY cls, band"""
  )
}
