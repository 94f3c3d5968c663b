package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextAnalysis._

/** LM-scoring, sampling, packing and mixture operators (mechanical
  * module split of the former TextAnalysis.scala, r8 verdict #7):
  * deterministic hash/stratified/weighted sampling, incremental and
  * decremental aggregate-state maintenance, sequence packing and
  * boundary manifests, mixture rebalancing (uniform and temperature),
  * unigram/bigram/backoff-LM surprisal scoring, DSIR importance
  * weights, filter AUC, compression-ratio signal, pad-waste and
  * context-length accounting, epoch shuffle, curriculum phases, and
  * interleave scheduling. Helpers shared with the sibling modules
  * stay in [[TextAnalysis]]. */
object TextScoring {

  val queries: Map[String, Q] = Map(
    // Reproducible hash-based sampling — how a training pipeline takes
    // a deterministic, rerun-stable, scale-independent subsample: keep
    // a doc iff the first md5 byte of its KEY falls under the rate
    // (here 0x20/0x100 = 12.5%). No RNG, no seed drift across engines
    // or partitionings; the same doc is in or out forever. Pure
    // codegen'd predicate ⇒ pushes into the scan stage.
    "q60_hash_sample" -> ((s, dir) => {
      val inSample =
        substring(md5(col("doc_id").cast("string")), 1, 2) < lit("20")
      Tables.documents(s, dir)
        .filter(inSample)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("n_chars")).as("sampled_chars"))
        .orderBy("source")
    }),

    // Stratified deterministic sampling — per-language rates (downsample
    // the dominant language, keep the rest), keyed by md5(doc_id) so
    // any engine reproduces the exact sample: the language-rebalancing
    // step of corpus assembly. Pure scan-side predicate (no RNG, no
    // shuffle before the accounting aggregate).
    "q74_stratified_sample" -> ((s, dir) => {
      // en is downsampled to ~30%: 16-bit hash bucket < 0x4ccc
      // (= floor(0.30 * 65536)); the 4-hex-char LEXICAL compare equals
      // the numeric one on lowercase hex, and any engine reproduces it
      val keep = col("lang") =!= "en" ||
        substring(md5(col("doc_id").cast("string")), 1, 4) < "4ccc"
      Tables.documents(s, dir)
        .withColumn("keep", keep)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"))
        .orderBy("lang")
    }),

    // CONTEXT-LENGTH SWEEP — the pack-vs-pad decision table: under
    // one-document-per-sequence batching at context length L, exactly
    // how many pad tokens (docs shorter than L) and truncated tokens
    // (docs longer than L) does each source cost, and what share of
    // the sequence budget is real text (util ppm)? Read next to
    // q94/q119/q147's packed manifests, this quantifies what packing
    // SAVES at each L before anyone commits to a context size. Exact
    // integer accounting at four L's from ONE narrow pass: the
    // 4-way explode multiplies rows before a bounded-key
    // ((source, L)) map-side-combined aggregate — no join, no window.
    "q155_context_sweep" -> ((s, dir) => {
      val ls = Seq(512, 1024, 2048, 4096).map(l => lit(l.toLong))
      Tables.fanOut(Tables.documents(s, dir))
        .select(col("source"), nTokens.cast("long").as("n_tok"))
        .withColumn("ctx_len", explode(array(ls: _*)))
        .groupBy("source", "ctx_len")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(greatest(col("ctx_len") - col("n_tok"), lit(0L))).as("pad_tokens"),
          sum(greatest(col("n_tok") - col("ctx_len"), lit(0L))).as("trunc_tokens"))
        .withColumn("util_ppm",
          expr("((n_tokens - trunc_tokens) * 1000000) DIV (n_docs * ctx_len)"))
        .orderBy("source", "ctx_len")
    }),

    // Incremental aggregate-state maintenance — the nightly-rollup
    // pattern: a STORED per-source state (count / sum / sum-of-squares
    // / min / max over the pre-existing corpus) merges with tonight's
    // DELTA batch's state by pure state algebra (sums add, mins min,
    // maxes max), never rescanning the corpus; mean and variance are
    // derived from the merged sums at the very end. The oracle
    // recomputes the same statistics DIRECTLY over the full table, so
    // the hash match PROVES merge == recompute — the algebraic property
    // the whole incremental pattern rests on. Exactness: states are
    // long sums (order-independent); the derived mean/variance are
    // three IEEE ops on exact longs, bit-identical cross-engine. Scale
    // shape: at 100 TB the stored state is source-keyed (thousands of
    // rows, not the corpus); each night touches only the delta — this
    // is the generalization of the reference's incremental update
    // accounting (update_psx_data.py's per-run new/updated counts).
    "q93_incremental_stats" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      def state(df: org.apache.spark.sql.DataFrame) = df.groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sm"),
          sum(col("n_chars") * col("n_chars")).as("ss"),
          min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      // doc_id % 10 == 0 plays tonight's delta; the rest is the stored
      // rollup from previous runs
      val stored = state(docs.filter(col("doc_id") % 10 =!= 0))
      val delta = state(docs.filter(col("doc_id") % 10 === 0))
      stored.unionByName(delta).groupBy("source")
        .agg(sum(col("n")).as("n_docs"), sum(col("sm")).as("sum_chars"),
          sum(col("ss")).as("ss_chars"),
          min(col("mn")).as("min_doc"), max(col("mx")).as("max_doc"))
        .select(col("source"), col("n_docs"), col("sum_chars"),
          col("min_doc"), col("max_doc"),
          (col("sum_chars").cast("double") / col("n_docs").cast("double"))
            .as("mean_chars"),
          ((col("ss_chars").cast("double") / col("n_docs").cast("double")) -
            (col("sum_chars").cast("double") / col("n_docs").cast("double")) *
              (col("sum_chars").cast("double") / col("n_docs").cast("double")))
            .as("var_chars"))
        .orderBy("source")
    }),

    // DECREMENTAL stats maintenance — q93's mirror image, and the
    // production operation a right-to-be-forgotten request forces: a
    // DELETE batch must leave the stored per-source rollup as if the
    // docs had never existed, without rescanning the world. The
    // sum-family state (count, Σ, Σ²) subtracts exactly — integer
    // subtraction is the true inverse of the merge, so mean/variance
    // re-derive bit-identically. MIN/MAX are NOT subtractable: a
    // deleted boundary doc invalidates the stored extreme, so the
    // operator flags exactly the sources whose deleted batch touched a
    // boundary and repairs ONLY those with a rescan of the remainder
    // (semi-join-scoped — at 100 TB a partition-pruned re-aggregate of
    // the affected sources, not the corpus). `repaired` exposes which
    // rows paid that rescan. The oracle is the DIRECT recompute over
    // the surviving docs — hash equality proves the decrement algebra,
    // not just its shape. A fully-deleted source retires its state row.
    "q149_decremental_stats" -> ((s, dir) =>
      decrementalStats(Tables.documents(s, dir), col("doc_id") % 10 === 0)
        .orderBy("source")),

    // Sequence packing — the batch-assembly step before pretraining:
    // concatenate each source's docs in doc_id order and cut the stream
    // into fixed 2048-token contexts; a doc belongs to the bin its
    // FIRST token lands in (bin = start-offset DIV 2048, start offset =
    // exclusive prefix sum of token counts). Output: per (source, bin)
    // doc/token accounting — the packing manifest a training-data
    // writer materializes. Scale shape: packing is inherently
    // sequential WITHIN a stream but embarrassingly parallel ACROSS
    // streams, which is exactly what the window spells: one exchange
    // keyed on source, a per-partition running sum (no corpus-global
    // order), then a map-side-combined rollup. At 100 TB sources are
    // the parallelism unit (thousands of shards), so the plan is flat.
    "q94_sequence_pack" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), nTokens.cast("long").as("n_tok"))
        .withColumn("start", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("bin", expr("start DIV 2048"))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("source", "bin")
    }),

    // PACKED-SEQUENCE BOUNDARY MANIFEST — the attention-mask metadata
    // q94's bin manifest implies: each doc occupies global token
    // interval [start, start+n_tok) of its source's stream and
    // contributes one SEGMENT to every 2048-token bin it overlaps,
    // with bin-local offset and length — exactly what a packing
    // pipeline emits so training can cut cross-document attention at
    // bin boundaries. Pure integer arithmetic over the same one-window
    // layout as q94 (the explode adds no shuffle), hash-matched.
    "q108_pack_boundaries" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), nTokens.cast("long").as("n_tok"))
        .withColumn("start", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("bin",
          explode(sequence(expr("start DIV 2048"), expr("(start + n_tok - 1) DIV 2048"))))
        .select(col("source"), col("bin"), col("doc_id"),
          (greatest(col("start"), col("bin") * 2048) - col("bin") * 2048).as("local_off"),
          (least(col("start") + col("n_tok"), (col("bin") + 1) * 2048)
            - greatest(col("start"), col("bin") * 2048)).as("seg_len"))
        .orderBy("source", "bin", "local_off")
    }),

    // Mixture rebalancing — the dataset-mixing step of corpus assembly
    // (DoReMi-style static reweighting applied as deterministic
    // sampling): target a 50%-of-corpus token budget split UNIFORMLY
    // across sources; each source's keep-rate = min(1, share/T_s) so
    // over-represented domains downsample while small domains keep
    // everything. The rate quantizes to a 16-bit md5-bucket threshold
    // (q74's mechanism with COMPUTED rates — lexical compare on
    // lowercase hex equals the numeric one), so any engine reproduces
    // the exact same kept set. Scale shape: rates come from a
    // source-keyed aggregate (thousands of rows) with a window total —
    // NO corpus-global broadcast row; the keep decision is a per-row
    // codegen'd predicate on the corpus scan; one rollup ends it.
    "q97_mixture_sample" -> ((s, dir) => {
      // no orderBy → default frame is the whole (single) partition;
      // the frame only ever holds one row per SOURCE, never the corpus
      val all = org.apache.spark.sql.expressions.Window.partitionBy()
      val toks = Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), nTokens.cast("long").as("n_tok"))
      val rates = toks.groupBy("source").agg(sum(col("n_tok")).as("t_s"))
        .withColumn("share",
          (lit(0.5) * sum(col("t_s")).over(all).cast("double")) /
            count(lit(1)).over(all).cast("double"))
        .withColumn("rate", least(lit(1.0),
          col("share") / col("t_s").cast("double")))
        .select(col("source"), col("rate"),
          lpad(lower(hex(floor(col("rate") * 65536).cast("long"))), 4, "0")
            .as("thr"))
      toks.join(broadcast(rates), Seq("source"))
        .withColumn("keep", col("rate") >= 1.0 ||
          substring(md5(col("doc_id").cast("string")), 1, 4) < col("thr"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(col("n_tok")).as("n_tokens"),
          sum(when(col("keep"), col("n_tok")).otherwise(0L)).as("kept_tokens"),
          first(col("rate")).as("rate"))
        .orderBy("source")
    }),

    // TEMPERATURE mixture sampling — the multilingual/multi-domain
    // mixing rule (mT5/XLM-R style): source weights ∝ T_s^α with
    // α = 1/2, so over-represented domains damp toward (not to) the
    // uniform share q97 targets — the standard middle ground between
    // proportional (α=1) and uniform (α=0) sampling. Determinism
    // contract: the weight is an EXACT integer floor-sqrt (a double
    // sqrt candidate bracketed by ±1 integer correction — immune to
    // any sqrt rounding), weight/token totals sum as longs (order-
    // free), and the per-source keep threshold is one nested all-
    // integer DIV chain quantized to q97's 16-bit md5 mechanism, so
    // the kept set is bit-identical on any engine. Overflow bound
    // (documented like q113's): (ΣT DIV 2)·65536 must fit int64 ⇒
    // ΣT < 2^47 tokens (≈ 560 TB of text). Scale shape: q97's —
    // source-keyed aggregate + single-row-per-source window totals,
    // broadcast rates, per-row codegen'd keep predicate, one rollup.
    "q138_temperature_mixture" -> ((s, dir) => {
      val all = org.apache.spark.sql.expressions.Window.partitionBy()
      val toks = Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), nTokens.cast("long").as("n_tok"))
      val rates = toks.groupBy("source").agg(sum(col("n_tok")).as("t_s"))
        .withColumn("tot", sum(col("t_s")).over(all))
        .withColumn("c", expr("CAST(floor(sqrt(CAST(t_s AS DOUBLE))) AS BIGINT)"))
        .withColumn("c2", expr("c - CAST(c * c > t_s AS INT)"))
        .withColumn("w", expr("c2 + CAST((c2 + 1) * (c2 + 1) <= t_s AS INT)"))
        .withColumn("wsum", sum(col("w")).over(all))
        .withColumn("thr", expr(
          "least(CAST(65536 AS BIGINT), (((tot DIV 2) * 65536) DIV wsum * w) DIV t_s)"))
        .select(col("source"), col("thr"),
          lpad(lower(hex(col("thr"))), 4, "0").as("thr_hex"))
      toks.join(broadcast(rates), Seq("source"))
        .withColumn("keep", col("thr") >= 65536L ||
          substring(md5(col("doc_id").cast("string")), 1, 4) < col("thr_hex"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(col("n_tok")).as("n_tokens"),
          sum(when(col("keep"), col("n_tok")).otherwise(0L)).as("kept_tokens"),
          first(col("thr")).as("thr"))
        .orderBy("source")
    }),

    // EXACT-QUOTA deterministic stratified sample — the third member
    // of the sampling family: q138 thresholds md5(doc_id) against a
    // per-source RATE (kept count is binomial around the rate), this
    // one RANKS by the same hash and takes exactly k=20 docs per
    // source — the reproducible "give me exactly N per stratum" eval/
    // holdout primitive. Scale shape: rank within stratum only (no
    // global sort); Spark 4 pushes rn <= k into WindowGroupLimit, so
    // each partition retains k rows before the final per-stratum
    // shuffle — a 100 TB stratum never materializes its full sort.
    // Hash ties are impossible (md5 of distinct ids), but doc_id
    // breaks them anyway so the oracle can never diverge on engine
    // sort stability.
    "q254_stratified_sample" -> ((s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("h"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string")).as("h"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 20)
        .select(col("source"), col("rn"), col("doc_id"), col("h"))
        .orderBy("source", "rn")
    }),

    // CORPUS-BUILD CAPSTONE — the full pretraining data pipeline as
    // ONE query, every stage the hash-matched spelling of an existing
    // one: quality filter (q80) → exact bag-of-words dedup (q57/q80's
    // min-id-per-fingerprint) → exact token-5-gram near-dup dedup
    // (q85's inverted index + components) → mixture rebalancing
    // (q97's computed md5 rates over the SURVIVORS' token mass) →
    // sequence packing (q94's exclusive prefix sums) → one funnel/
    // manifest row per source. Unlike q57/q80 (filter+exact only) and
    // q65 (dedup only), this is the WHOLE curation-to-packing chain,
    // DuckDB-oracle-proven end to end. Scale shape: each stage's
    // documented shape unchanged by composition — the near-dup stage
    // sees only exact-dedup survivors, the mixture rates see only
    // near-dup survivors, packing sees only sampled docs; nothing ever
    // rescans an earlier stage's input.
    "q100_corpus_build" -> ((s, dir) => {
      import graft.dedup.Dedup
      val W = org.apache.spark.sql.expressions.Window
      val docs = Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), col("text"))
      val feat = graft.Caches.cached(docs.select(
        col("doc_id"), col("source"), col("text"),
        nTokens.cast("long").as("n_tok"),
        (lit(1.0) - size(array_distinct(wsToks)).cast("double") /
          nTokens.cast("double")).as("dup_frac"),
        (nStopwords.cast("double") / nTokens.cast("double")).as("stop_ratio"),
        bagOfWordsFp.as("fp")))
      val quality = feat.filter(col("n_tok") >= 30 &&
        col("dup_frac") <= 0.70 && col("stop_ratio") >= 0.02)
      val exact = graft.Caches.cached(quality
        .withColumn("rn", row_number().over(
          W.partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
        .select("doc_id", "source", "text", "n_tok"))
      val pairs = graft.Caches.cached(
        Dedup.jaccardPairsTokens(exact.select("doc_id", "text"), 5)
          .filter(col("jaccard") >= 0.7))
      val removed = Dedup.components(pairs, uniquePairs = true) // groupBy(a,b) output
        .filter(col("doc_id") =!= col("canonical_id")).select("doc_id")
      val near = graft.Caches.cached(
        exact.join(removed, Seq("doc_id"), "left_anti")
          .select("doc_id", "source", "n_tok"))
      val all = W.partitionBy()
      val rates = near.groupBy("source").agg(sum(col("n_tok")).as("t_s"))
        .withColumn("share",
          (lit(0.5) * sum(col("t_s")).over(all).cast("double")) /
            count(lit(1)).over(all).cast("double"))
        .withColumn("rate", least(lit(1.0),
          col("share") / col("t_s").cast("double")))
        .select(col("source"), col("rate"),
          lpad(lower(hex(floor(col("rate") * 65536).cast("long"))), 4, "0")
            .as("thr"))
      val kept = graft.Caches.cached(near.join(broadcast(rates), Seq("source"))
        .filter(col("rate") >= 1.0 ||
          substring(md5(col("doc_id").cast("string")), 1, 4) < col("thr"))
        .select("doc_id", "source", "n_tok"))
      val packed = kept
        .withColumn("start", coalesce(sum(col("n_tok")).over(
          W.partitionBy(col("source")).orderBy(col("doc_id"))
            .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
        .withColumn("bin", expr("start DIV 2048"))
      def cnt(df: org.apache.spark.sql.DataFrame, as: String) =
        df.groupBy("source").agg(count(lit(1)).as(as))
      docs.groupBy("source").agg(count(lit(1)).as("n_raw"))
        .join(cnt(quality, "n_quality"), Seq("source"), "left")
        .join(cnt(exact, "n_exact"), Seq("source"), "left")
        .join(cnt(near, "n_near"), Seq("source"), "left")
        .join(packed.groupBy("source").agg(count(lit(1)).as("n_kept"),
          countDistinct(col("bin")).as("n_bins"),
          sum(col("n_tok")).as("n_tokens_packed")), Seq("source"), "left")
        .select(col("source"), col("n_raw"),
          coalesce(col("n_quality"), lit(0L)).as("n_quality"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"),
          coalesce(col("n_near"), lit(0L)).as("n_near"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("n_bins"), lit(0L)).as("n_bins"),
          coalesce(col("n_tokens_packed"), lit(0L)).as("n_tokens_packed"))
        .orderBy("source")
    }),

    // CCNet-style perplexity bucketing (Wenzek et al. 2020) with the
    // corpus's OWN unigram LM standing in for the external KenLM: each
    // token's surprisal -log2 p(w) = log2(N/c_w), each doc scored by
    // mean token surprisal, the corpus cut into head/middle/tail
    // thirds by score rank. Two bit-stability moves make it
    // hash-checkable: (1) log2 is computed ALL-INTEGER — the octave is
    // the bin()-string length of the 2^8-scaled ratio, plus a
    // 512-granule linear interpolation within the octave
    // ((r−2^k)·512 DIV 2^k; max 0.086-bit approximation error,
    // deterministic on both engines — no libm log anywhere); (2) the
    // global thirds come from RANK arithmetic (1 + (rank−1)·3 DIV N),
    // not percentile estimation. Scale shape: the vocab join is
    // stats-gated (vocab is corpus-sublinear but unbounded); N arrives
    // as a broadcast 1-row COUNT; and the global rank decomposes into
    // distributed prefix sums ([[Prefix.exclusiveSum]], which recurses
    // two-phase until every window task is bounded) plus a ≤4096-row
    // row_number — so no corpus-sized single-partition sort exists in
    // the plan at ANY distribution, including a hot score owning the
    // whole corpus. Integer-overflow bound documented at the r spelling:
    // N·256·512 must fit int64 ⇒ N ≤ 2^45 tokens (≈ 140 TB of text).
    "q113_surprisal_bucket" -> ((s, dir) => {
      val perDoc = surprisalPerDoc(s, dir)
      // Rank decomposition with NO corpus-sized (or histogram-sized)
      // single-partition window anywhere (r7 verdict #2 + ADVICE —
      // the former (score, sb) offsets window was single-partition,
      // and the (score, sb) histogram itself can approach Θ(N) rows
      // in adversarial distributions since each doc contributes one
      // distinct pair):
      //   rank = soff(score)        docs with strictly smaller score
      //        + boff(score, sb)    same score, smaller sub-bucket
      //        + row_number         within (score, sb), ≤ 4096 rows
      // soff runs [[Prefix.exclusiveSum]] over the ≤|scores|-row score
      // histogram; boff runs it PARTITIONED BY score over the
      // sub-bucket histogram — the operator recurses two-phase until
      // every window task holds ≤ span rows, whatever the sb domain
      // grows to, so the scale-safety claim no longer depends on a
      // per-query reduction argument. The (score, doc_id) total order
      // — and therefore the oracle hash — is unchanged.
      val hist = graft.Caches.cached(perDoc
        .groupBy(col("score"), expr("doc_id DIV 4096").as("sb"))
        .agg(count(lit(1)).as("cnt")))
      val scoreHist = hist.groupBy("score").agg(sum(col("cnt")).as("scnt"))
      val soff = Prefix.exclusiveSum(scoreHist, Nil, "score", "scnt", "soff")
        .select("score", "soff")
      val boff = Prefix.exclusiveSum(hist, Seq("score"), "sb", "cnt", "boff")
      val off = boff.join(soff, Seq("score"))
        .select(col("score"), col("sb"), (col("soff") + col("boff")).as("off"))
      val nDocs = perDoc.agg(count(lit(1)).as("n_docs"))
      val wD = org.apache.spark.sql.expressions.Window
        .partitionBy("score", "sb").orderBy("doc_id")
      perDoc.withColumn("sb", expr("doc_id DIV 4096"))
        .join(off, Seq("score", "sb"))
        .crossJoin(broadcast(nDocs))
        .withColumn("rank", col("off") + row_number().over(wD))
        .withColumn("bucket", expr("1 + ((rank - 1) * 3) DIV n_docs"))
        .select(col("doc_id"), col("n_tok"), col("score"), col("rank"),
          col("bucket"))
        .orderBy("doc_id")
    }),

    // BIGRAM-LM surprisal — the CCNet/KenLM filter family one order up
    // from q113's unigram: each position's surprisal is
    // -log2 p(w | prev) under the corpus's own add-one-smoothed bigram
    // LM, p = (c(prev,w)+1)/(c(prev)+V). The ratio (c(prev)+V) /
    // (c(prev,w)+1) is ≥ 1 by construction, so q113's ALL-INTEGER log2
    // (bin()-length octave + 512-granule interpolation — no libm
    // anywhere) applies verbatim and the per-source report is
    // bit-stable on both engines. Scale shape: context/bigram counts
    // are vocab-sized map-side-combined aggregates joined back by
    // equi-key (stats-gated broadcasts); V arrives as a broadcast
    // 1-row COUNT; the rollup is source-keyed. The bigram table grows
    // with vocab², not the corpus — the standard LM-table bound.
    "q142_bigram_lm_score" -> ((s, dir) => {
      val docs = graft.Caches.cached(Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), wsToks.as("toks")))
      val vsize = docs.select(explode(col("toks")).as("w"))
        .agg(countDistinct(col("w")).as("vsz"))
      val bi = graft.Caches.cached(docs
        .filter(size(col("toks")) >= 2)
        .withColumn("i", explode(sequence(lit(1), size(col("toks")) - 1)))
        .select(col("doc_id"), col("source"),
          element_at(col("toks"), col("i")).as("v"),
          element_at(col("toks"), col("i") + 1).as("w")))
      val cv = bi.groupBy("v").agg(count(lit(1)).as("cv"))
      val cvw = bi.groupBy("v", "w").agg(count(lit(1)).as("cvw"))
      bi.join(Tables.maybeBroadcast(cvw), Seq("v", "w"))
        .join(Tables.maybeBroadcast(cv), Seq("v"))
        .crossJoin(broadcast(vsize))
        .withColumn("r", expr("((cv + vsz) * 256) DIV (cvw + 1)"))
        .withColumn("k", expr("length(bin(r)) - 1"))
        .withColumn("sbits", expr(
          """(k - 8) * 512 +
             ((r - shiftleft(CAST(1 AS BIGINT), k)) * 512)
               DIV shiftleft(CAST(1 AS BIGINT), k)"""))
        .groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_bigrams"),
          sum(col("sbits")).as("sum_sbits"))
        .withColumn("mean_sbits", expr("sum_sbits DIV n_bigrams"))
        .orderBy("source")
    }),

    // TOKEN-BALANCED OUTPUT SHARDING — the writer step after packing:
    // split the corpus (in deterministic doc_id order) into contiguous
    // ~16Ki-token shards and emit each shard's manifest (doc/token
    // counts, id boundaries, boundary-straddler count — the docs a
    // splitting writer would cut across files). The running token
    // offset that decides every shard boundary rides
    // `Prefix.exclusiveSum` over the CORPUS-SIZED doc_id domain — the
    // operator's first call site where no pre-reduction exists at all:
    // the recursion (blocks of 2^20 keys, carry totals, ≤ 4 levels)
    // is the entire scale argument, there is no "histogram is small"
    // fallback. Greedy assignment shard = off DIV S keeps every doc
    // whole; manifests aggregate shard-keyed. One exchange for the
    // prefix, one for the rollup.
    "q147_token_shards" -> ((s, dir) => {
      val d = Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), size(wsToks).cast("long").as("n_tok"))
      Prefix.exclusiveSum(d, Nil, "doc_id", "n_tok", "off")
        .withColumn("shard", expr("off DIV 16384"))
        .withColumn("straddle",
          when(expr("(off + n_tok - 1) DIV 16384") > col("shard"), 1L)
            .otherwise(0L))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"),
          sum(col("straddle")).as("n_straddlers"))
        .orderBy("shard")
    }),

    // DSIR-style importance weights (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): each doc's
    // log importance log2(p_target/p_raw) under HASHED-unigram bag
    // models — feature hashing is what makes DSIR scale, and here both
    // models collapse to B = 256 bucket rows (md5-prefix buckets, the
    // engine-portable hash this repo already rides for q60), so the
    // per-token model lookup is a broadcast against a CONSTANT-size
    // table no matter how large the vocabulary or corpus grows.
    // Target = the corpus's own English slice; add-one smoothing
    // p = (c+1)/(N+B) keeps every ratio finite (an empty target
    // degrades gracefully to the uniform model). log_w = Σ_tok
    // (sbits_raw − sbits_tgt) in q113's all-integer 1/512-bit
    // granules — a SUM, exactly DSIR's Σ log-ratio, so no negative
    // integer division anywhere (Spark DIV truncates, DuckDB //
    // floors; subtraction sidesteps the one semantic the two engines
    // disagree on). selected = log_w > 0 is the resampling gate.
    // Scale shape: tokens reduce map-side to (doc, bucket) counts;
    // the 256-row model broadcasts; the only corpus-sized shuffle is
    // the per-doc rollup.
    "q145_dsir_weights" -> ((s, dir) => {
      val tok = graft.Caches.cached(Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("lang"), explode(wsToks).as("w"))
        .withColumn("b", substring(md5(col("w")), 1, 2)))
      val raw = tok.groupBy("b").agg(count(lit(1)).as("cr"))
      val tgt = tok.filter(col("lang") === "en")
        .groupBy("b").agg(count(lit(1)).as("ct"))
      val tots = tok.agg(count(lit(1)).as("nr"),
        count(when(col("lang") === "en", 1)).as("nt"))
      val model = raw.join(tgt, Seq("b"), "left")
        .na.fill(0L, Seq("ct"))
        .crossJoin(broadcast(tots)) // 1 row: (N_raw, N_target)
        .withColumn("rr", expr("((nr + 256) * 256) DIV (cr + 1)"))
        .withColumn("rt", expr("((nt + 256) * 256) DIV (ct + 1)"))
        .withColumn("kr", expr("length(bin(rr)) - 1"))
        .withColumn("kt", expr("length(bin(rt)) - 1"))
        .withColumn("sr", expr(
          """(kr - 8) * 512 +
             ((rr - shiftleft(CAST(1 AS BIGINT), kr)) * 512)
               DIV shiftleft(CAST(1 AS BIGINT), kr)"""))
        .withColumn("st", expr(
          """(kt - 8) * 512 +
             ((rt - shiftleft(CAST(1 AS BIGINT), kt)) * 512)
               DIV shiftleft(CAST(1 AS BIGINT), kt)"""))
        .select(col("b"), (col("sr") - col("st")).as("lw"))
      val db = tok.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      db.join(broadcast(model), Seq("b"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tok"), sum(col("c") * col("lw")).as("log_w"))
        .select(col("doc_id"), col("n_tok"), col("log_w"),
          (col("log_w") > 0).as("selected"))
        .orderBy("doc_id")
    }),

    // Exact filter-evaluation AUC — "how well does the surprisal
    // score separate English from the rest?" — computed ENTIRELY at
    // histogram level: Mann-Whitney U needs only each score group's
    // rank RANGE, so per-score (count, positives) + cumulative
    // offsets give the exact tie-averaged rank-sum with NO per-row
    // ranking and no global sort anywhere in the plan. Everything is
    // 2×-scaled integer (avg2rank = 2·off + cnt + 1), so the AUC is
    // bit-stable: auc_micro = (U2 · 10^6) DIV (2·n_pos·n_neg).
    // Exactness bound: ranksum2 ≤ 2N² must fit int64 ⇒ N ≤ 2·10^9
    // docs (beyond, stratify or widen). The ML-eval counterpart of
    // the q113 filter itself.
    "q126_filter_auc" -> ((s, dir) => {
      val lab = surprisalPerDoc(s, dir)
        .join(Tables.documents(s, dir).select(col("doc_id"),
          (col("lang") === "en").cast("long").as("pos")), Seq("doc_id"))
      val h = lab.groupBy("score")
        .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("npos"))
      // NULLIF on the divisor (r7 ADVICE): a single-class corpus makes
      // n_pos·n_neg = 0 — the AUC is undefined there, and without the
      // guard Spark's non-ANSI DIV yields NULL while DuckDB's // raises,
      // so the engines would diverge exactly on the degenerate case.
      // Both spellings now emit NULL. Offsets ride the shared
      // distributed prefix operator (r7 verdict #2) — the score
      // histogram is small today, but the operator caps the window-task
      // size by construction instead of by a per-query bound argument.
      Prefix.exclusiveSum(h, Nil, "score", "cnt", "off")
        .agg(sum(expr("npos * (2 * off + cnt + 1)")).as("ranksum2"),
          sum(col("npos")).as("n_pos"), sum(col("cnt")).as("n"))
        .select(col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
          expr("""((ranksum2 - n_pos * (n_pos + 1)) * 1000000)
                  DIV nullif(2 * n_pos * (n - n_pos), 0)""").as("auc_micro"))
    }),

    // Compression-ratio quality signal (the Gopher/RefinedWeb filter
    // family's "does it deflate like prose?" rule): per-doc raw-
    // DEFLATE length over byte length via the codegen'd deflate_len
    // kernel, rolled up per source with integer fixed-point ratios
    // and a band histogram (repetitive < 300 milli ≤ prose < 700 ≤
    // random). Rows-only by design — the byte-exact length is a
    // function of the JDK's zlib, deterministic within this
    // environment but not cross-engine; the kernel's SEMANTICS are
    // law-pinned on constructed fixtures (see ExtensionsSpec). Scale:
    // one narrow codegen'd pass + a source-keyed aggregate.
    "q124_compress_ratio" -> ((s, dir) => {
      graft.plans.DeflateLen.register(s)
      Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          call_function(graft.plans.DeflateLen.NAME, col("text")).as("n_defl"))
        .filter(col("n_bytes") > 0)
        .withColumn("ratio_milli", expr("(n_defl * 1000) DIV n_bytes"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bytes")).as("raw_bytes"),
          sum(col("n_defl")).as("deflate_bytes"),
          sum(when(col("ratio_milli") < 300, 1L).otherwise(0L)).as("n_repetitive"),
          sum(when(col("ratio_milli") >= 300 && col("ratio_milli") < 700, 1L)
            .otherwise(0L)).as("n_prose"),
          sum(when(col("ratio_milli") >= 700, 1L).otherwise(0L)).as("n_random"))
        .withColumn("corpus_ratio_milli",
          expr("(deflate_bytes * 1000) DIV raw_bytes"))
        .orderBy("source")
    }),

    // Length-bucketed padding-waste analysis — the measurement behind
    // dynamic-batching bucket design: under power-of-two length
    // buckets (floor 64), how many pad tokens does each (source,
    // bucket) burn, as a fixed-point share of the batch volume? The
    // next-power-of-two is all-integer via bin() length (q113's
    // octave trick: 1 << len(bin(n−1)) for n > 64), so the report is
    // bit-stable. Scale shape: one narrow pass + one map-side-combined
    // aggregate on a (sources × ~10 buckets) bounded key space.
    "q119_pad_waste" -> ((s, dir) => {
      Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"),
          wsToks.as("toks"))
        .select(col("doc_id"), col("source"),
          size(col("toks")).cast("long").as("n_tok"))
        .withColumn("bucket", expr(
          """CASE WHEN n_tok <= 64 THEN CAST(64 AS BIGINT)
             ELSE shiftleft(CAST(1 AS BIGINT), length(bin(n_tok - 1))) END"""))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(col("bucket") - col("n_tok")).as("n_pad"))
        .withColumn("waste_milli",
          expr("(n_pad * 1000) DIV (n_docs * bucket)"))
        .orderBy("source", "bucket")
    }),

    // Deterministic epoch shuffle — reproducible per-epoch corpus
    // permutations with no RNG state: epoch e orders by
    // md5(doc_id:e), so any worker (or either engine) derives the
    // same order, and different epochs decorrelate. The rank<=k
    // filter compiles to WindowGroupLimit (PlanSpec-pinned), i.e.
    // per-partition top-k BEFORE the exchange — the plan never
    // globally sorts the corpus to serve a bounded prefix, which is
    // what makes "give me the first k docs of epoch e" 100 TB-safe.
    "q120_epoch_shuffle" -> ((s, dir) => {
      val wE = org.apache.spark.sql.expressions.Window
        .partitionBy(col("epoch")).orderBy(col("skey"))
      Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"))
        .withColumn("epoch", explode(sequence(lit(1L), lit(3L))))
        .withColumn("skey",
          md5(concat(col("doc_id").cast("string"), lit(":"),
            col("epoch").cast("string"))))
        .withColumn("rank", row_number().over(wE))
        .filter(col("rank") <= 20)
        .select(col("epoch"), col("rank").cast("long").as("rank"),
          col("doc_id"), col("skey"))
        .orderBy("epoch", "rank")
    }),

    // DETERMINISTIC WEIGHTED SAMPLING — bottom-k by hash priority,
    // the reservoir-less spelling of weighted reservoir sampling:
    // priority = u DIV w with u a 48-bit md5 integer and w the token
    // count, so doubling a doc's weight halves its expected priority
    // (longer docs win proportionally) yet any engine, any re-run,
    // and the oracle derive the IDENTICAL sample with no RNG state —
    // the q60/q120 determinism contract extended to WEIGHTED draws.
    // Per-source bottom-5 by (priority, doc_id). Scale shape: the
    // rank<=k filter compiles to WindowGroupLimit (q120's plan
    // shape, PlanSpec-pinned): per-partition top-k BEFORE the
    // exchange — the corpus is never globally sorted to draw k docs.
    "q169_weighted_sample" -> ((s, dir) => {
      val wS = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("priority"), col("doc_id"))
      Tables.fanOut(Tables.documents(s, dir))
        .filter(length(trim(col("text"))) > 0)
        .select(col("source"), col("doc_id"),
          size(wsToks).cast("long").as("n_tok"))
        .withColumn("u", expr(
          """CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12),
             16, 10) AS BIGINT)"""))
        .withColumn("priority", expr("u DIV n_tok"))
        .withColumn("rank", row_number().over(wS))
        .filter(col("rank") <= 5)
        .select(col("source"), col("rank").cast("long").as("rank"),
          col("doc_id"), col("n_tok"), col("priority"))
        .orderBy("source", "rank")
    }),

    // QUALITY-ORDERED CURRICULUM PHASES — the schedule builder behind
    // curriculum training: docs sort by an integer quality signal
    // (type-token ratio, milli fixed-point) and split into 4
    // equal-TOKEN-budget phases, each phase's manifest emitted. The
    // running token offset that places every cut rides
    // `Prefix.exclusiveSum` over the COMPUTED key ttr·2⁴⁰ + doc_id —
    // the operator's first call site whose domain is an ORDERING THE
    // QUERY ITSELF DERIVES (q147's was the raw doc_id line): the
    // packed key keeps (ttr, doc_id) lexicographic inside one
    // non-negative long, and the two-phase recursion caps every
    // window task at span rows no matter how the scores distribute.
    // phase = 4·off DIV total needs one 1-row broadcast; the rollup
    // is a 4-key aggregate.
    "q174_curriculum_phases" -> ((s, dir) => {
      val d = Tables.fanOut(Tables.documents(s, dir))
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), wsToks.as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tok"),
          size(array_distinct(col("toks"))).cast("long").as("n_dis"))
        .withColumn("ttr", expr("(n_dis * 1000) DIV n_tok"))
        .withColumn("k", expr("ttr * 1099511627776 + doc_id")) // 2^40
      val tot = d.agg(sum(col("n_tok")).as("t"))
      Prefix.exclusiveSum(d, Nil, "k", "n_tok", "off")
        .crossJoin(broadcast(tot)) // 1 row: the corpus token budget
        .withColumn("phase", expr("(off * 4) DIV t"))
        .groupBy("phase")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("ttr")).as("min_ttr"), max(col("ttr")).as("max_ttr"))
        .orderBy("phase")
    }),

    // HELD-OUT BACKOFF LM SCORING — the LM-filter shape q142 cannot
    // show (training on the scored corpus itself means every bigram
    // is seen, so backoff never fires): counts train on the md5-¾
    // split, the held-out quarter is scored, and an eval bigram
    // UNSEEN in training backs off stupid-backoff-style to the
    // add-one unigram model plus a 2-bit penalty (1024 granules =
    // log2(1/α) for α = ¼ — exact in q113's integer 1/512-bit
    // granules, no doubles anywhere). Per-source eval report counts
    // how often the model had to back off — the OOV-pressure signal
    // a perplexity filter monitors. Scale shape: train tables are
    // vocab-bounded map-side-combined aggregates; eval bigrams LEFT
    // join the bigram table (null ⇒ backoff); unigram/vocab sides
    // are stats-gated / 1-row broadcasts.
    "q175_backoff_lm" -> ((s, dir) => {
      val docs = graft.Caches.cached(Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), wsToks.as("toks"))
        .withColumn("trainside",
          substring(md5(col("doc_id").cast("string")), 1, 1) < lit("c")))
      def bigrams(df: org.apache.spark.sql.DataFrame) = df
        .filter(size(col("toks")) >= 2)
        .withColumn("i", explode(sequence(lit(1), size(col("toks")) - 1)))
        .select(col("doc_id"), col("source"),
          element_at(col("toks"), col("i")).as("v"),
          element_at(col("toks"), col("i") + 1).as("w"))
      val tr = graft.Caches.cached(bigrams(docs.filter(col("trainside"))))
      val cv = tr.groupBy("v").agg(count(lit(1)).as("cv"))
      val cw = tr.groupBy("w").agg(count(lit(1)).as("cw"))
      val cvw = tr.groupBy("v", "w").agg(count(lit(1)).as("cvw"))
      val stats = tr.agg(count(lit(1)).as("nb"),
        countDistinct(col("w")).as("vsz"))
      bigrams(docs.filter(!col("trainside")))
        .join(Tables.maybeBroadcast(cvw), Seq("v", "w"), "left")
        .join(Tables.maybeBroadcast(cv), Seq("v"), "left")
        .join(Tables.maybeBroadcast(cw), Seq("w"), "left")
        .crossJoin(broadcast(stats)) // 1 row: (train bigrams, vocab)
        .na.fill(0L, Seq("cvw", "cv", "cw"))
        // both branches keep r >= 256 (denominator <= numerator/256),
        // so the octave k >= 8 and sbits stays nonnegative
        .withColumn("r", expr(
          """CASE WHEN cvw > 0 THEN ((cv + vsz) * 256) DIV (cvw + 1)
             ELSE ((nb + vsz) * 256) DIV (cw + 1) END"""))
        .withColumn("k", expr("length(bin(r)) - 1"))
        .withColumn("sbits", expr(
          """(k - 8) * 512 +
             ((r - shiftleft(CAST(1 AS BIGINT), k)) * 512)
               DIV shiftleft(CAST(1 AS BIGINT), k)
             + CASE WHEN cvw = 0 THEN 1024 ELSE 0 END"""))
        .groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_bigrams"),
          sum(when(col("cvw") === 0, 1L).otherwise(0L)).as("n_backoff"),
          sum(col("sbits")).as("sum_sbits"))
        .withColumn("mean_sbits", expr("sum_sbits DIV n_bigrams"))
        .orderBy("source")
    }),

    // SMOOTH WEIGHTED ROUND-ROBIN INTERLEAVE — the corpus-assembly
    // ORDER between full-shuffle and naive concatenation: when
    // training order must keep every source at its proportional
    // share in EVERY prefix (so no source floods early batches), the
    // classic smooth-WRR key ((2k−1)·N) DIV (2·q_s) for a source's
    // k-th doc places all N docs deterministically — Bresenham's
    // line algorithm as a mixing schedule, all-integer. The query
    // serves the schedule's head-48 manifest. Scale shape: the
    // per-source rank k comes from Prefix.exclusiveSum partitioned
    // by source (NO per-source single-task window at any corpus
    // size); quotas are a |sources|-row broadcast, N a 1-row
    // broadcast; the head-48 is TakeOrdered (top-k, never a global
    // sort materialization).
    "q177_interleave_schedule" -> ((s, dir) => {
      val d = Tables.fanOut(Tables.documents(s, dir))
        .select(col("source"), col("doc_id")).withColumn("one", lit(1L))
      val keyed = Prefix
        .exclusiveSum(d, Seq("source"), "doc_id", "one", "k0")
        .withColumn("k", col("k0") + 1)
      val quota = d.groupBy("source").agg(count(lit(1)).as("q"))
      val tot = d.agg(count(lit(1)).as("n"))
      keyed.join(Tables.maybeBroadcast(quota), "source")
        .crossJoin(broadcast(tot)) // 1 row: the corpus size
        .withColumn("key", expr("((2 * k - 1) * n) DIV (2 * q)"))
        .orderBy(col("key"), col("source"), col("k"))
        .limit(48)
        .select(col("key"), col("source"), col("k"), col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q60_hash_sample" ->
      """SELECT source, COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
         FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'
         GROUP BY source ORDER BY source""",

    // per-(source, L) pad/truncation accounting under
    // one-doc-per-sequence batching; util ppm integer fixed point
    "q155_context_sweep" ->
      """WITH d AS (
           SELECT source,
             CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
           FROM documents),
         ls(ctx_len) AS (VALUES (CAST(512 AS BIGINT)), (1024), (2048), (4096)),
         a AS (
           SELECT source, ctx_len, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             CAST(SUM(GREATEST(ctx_len - n_tok, 0)) AS BIGINT) AS pad_tokens,
             CAST(SUM(GREATEST(n_tok - ctx_len, 0)) AS BIGINT) AS trunc_tokens
           FROM d CROSS JOIN ls GROUP BY 1, 2)
         SELECT source, ctx_len, n_docs, n_tokens, pad_tokens, trunc_tokens,
           ((n_tokens - trunc_tokens) * 1000000) // (n_docs * ctx_len) AS util_ppm
         FROM a ORDER BY source, ctx_len""",

    "q74_stratified_sample" ->
      """SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN lang <> 'en'
                    OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4ccc'
               THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         FROM documents GROUP BY lang ORDER BY lang""",

    // DIRECT recompute over the full table — the Spark side merges a
    // stored state with a delta state instead; hash equality proves the
    // state algebra
    "q93_incremental_stats" ->
      """SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
           CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mean_chars,
           CAST(CAST(SUM(n_chars * n_chars) AS BIGINT) AS DOUBLE) /
               CAST(COUNT(*) AS DOUBLE) -
             (CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) *
             (CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
             AS var_chars
         FROM documents GROUP BY source ORDER BY source""",

    // the DIRECT recompute over surviving docs — hash equality against
    // the decremental spelling proves the subtraction algebra; the
    // repaired flag replays "deleted batch touched a stored boundary"
    "q149_decremental_stats" ->
      """WITH full_state AS (
           SELECT source, MIN(doc_id) AS fmn, MAX(doc_id) AS fmx
           FROM documents GROUP BY source),
         remain AS (
           SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
             CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_chars,
             CAST(CAST(SUM(n_chars * n_chars) AS BIGINT) AS DOUBLE) /
                 CAST(COUNT(*) AS DOUBLE) -
               (CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) *
               (CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
               AS var_chars
           FROM documents WHERE doc_id % 10 <> 0 GROUP BY source)
         SELECT r.source, r.n_docs, r.sum_chars, r.min_doc, r.max_doc,
           r.mean_chars, r.var_chars,
           (f.fmn % 10 = 0 OR f.fmx % 10 = 0) AS repaired
         FROM remain r JOIN full_state f ON r.source = f.source
         ORDER BY r.source""",

    // exclusive prefix sum via ROWS UNBOUNDED PRECEDING AND 1 PRECEDING;
    // token counts and offsets are exact BIGINTs on both engines
    "q94_sequence_pack" ->
      """WITH t AS (
           SELECT doc_id, source,
             CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
           FROM documents),
         p AS (
           SELECT doc_id, source, n_tok,
             COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
           FROM t)
         SELECT source, CAST(start // 2048 AS BIGINT) AS bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         FROM p GROUP BY 1, 2 ORDER BY source, bin""",

    // same layout as q94's p CTE (start cast to BIGINT immediately —
    // the HUGEINT-widening lesson); segment arithmetic stays BIGINT
    "q108_pack_boundaries" ->
      """WITH t AS (
           SELECT doc_id, source,
             CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
           FROM documents),
         p AS (
           SELECT doc_id, source, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
           FROM t),
         seg AS (
           SELECT source, doc_id, n_tok, start,
             unnest(generate_series(start // 2048, (start + n_tok - 1) // 2048)) AS bin
           FROM p)
         SELECT source, CAST(bin AS BIGINT) AS bin, doc_id,
           GREATEST(start, bin * 2048) - bin * 2048 AS local_off,
           LEAST(start + n_tok, (bin + 1) * 2048) - GREATEST(start, bin * 2048) AS seg_len
         FROM seg ORDER BY source, bin, local_off""",

    // rate spelling mirrors Spark term for term: (0.5 * total) /
    // n_sources, least(1, share / t_s), floor(rate * 65536) → 4-hex
    // lowercase threshold, lexical compare
    "q97_mixture_sample" ->
      """WITH t AS (
           SELECT doc_id, source,
             CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
           FROM documents),
         per AS (SELECT source, SUM(n_tok) AS t_s FROM t GROUP BY 1),
         rates AS (
           SELECT source,
             least(1.0,
               ((0.5 * CAST(SUM(t_s) OVER () AS DOUBLE)) /
                  CAST(COUNT(*) OVER () AS DOUBLE)) / CAST(t_s AS DOUBLE))
               AS rate
           FROM per),
         rt AS (
           SELECT source, rate,
             lpad(lower(hex(CAST(floor(rate * 65536) AS BIGINT))), 4, '0')
               AS thr
           FROM rates),
         k AS (
           SELECT t.source, t.n_tok,
             (rt.rate >= 1.0 OR
              substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 4) < rt.thr) AS keep,
             rt.rate
           FROM t JOIN rt ON rt.source = t.source)
         SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           ANY_VALUE(rate) AS rate
         FROM k GROUP BY source ORDER BY source""",

    // exact floor-sqrt weights (double candidate + ±1 integer
    // correction), long window totals, the identical nested DIV chain
    "q138_temperature_mixture" ->
      """WITH t AS (
           SELECT doc_id, source,
             CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
           FROM documents),
         per AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS t_s
                 FROM t GROUP BY 1),
         tw AS (
           SELECT source, t_s,
             CAST(SUM(t_s) OVER () AS BIGINT) AS tot,
             CAST(floor(sqrt(CAST(t_s AS DOUBLE))) AS BIGINT) AS c
           FROM per),
         w2 AS (SELECT source, t_s, tot,
                  c - CAST(c * c > t_s AS INT) AS c2 FROM tw),
         w3 AS (SELECT source, t_s, tot,
                  c2 + CAST((c2 + 1) * (c2 + 1) <= t_s AS INT) AS w FROM w2),
         rt AS (
           SELECT source, t_s,
             LEAST(CAST(65536 AS BIGINT),
               (((tot // 2) * 65536) // CAST(SUM(w) OVER () AS BIGINT) * w)
                 // t_s) AS thr
           FROM w3),
         rh AS (
           SELECT source, thr,
             lpad(lower(hex(thr)), 4, '0') AS thr_hex
           FROM rt),
         k AS (
           SELECT t.source, t.n_tok, rh.thr,
             (rh.thr >= 65536 OR
              substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 4) < rh.thr_hex) AS keep
           FROM t JOIN rh ON rh.source = t.source)
         SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           ANY_VALUE(thr) AS thr
         FROM k GROUP BY source ORDER BY source""",

    // identical md5 rank, identical k, rn cast to BIGINT on both sides
    // (Spark row_number is int, DuckDB's is int64)
    "q254_stratified_sample" ->
      """WITH h AS (
           SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         r AS (
           SELECT source, doc_id, h,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS rn
           FROM h)
         SELECT source, rn, doc_id, h FROM r
         WHERE rn <= 20 ORDER BY source, rn""",

    // q80's features → q85's closure → q97's rates → q94's prefix
    // sums, composed; each CTE is its source query's proven spelling
    "q100_corpus_build" ->
      s"""WITH RECURSIVE d AS (
           SELECT doc_id, source, str_split_regex(trim(text), '\\s+') AS toks
           FROM documents),
         feat AS (
           SELECT doc_id, source, toks, len(toks) AS n_tok,
             1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS dup_frac,
             CAST(len(list_filter(toks, t -> t IN ($stopList))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS stop_ratio,
             md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
           FROM d),
         quality AS (
           SELECT * FROM feat
           WHERE n_tok >= 30 AND dup_frac <= 0.70 AND stop_ratio >= 0.02),
         exact AS (
           SELECT doc_id, source, toks, n_tok FROM (
             SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id)
               AS rn FROM quality) WHERE rn = 1),
         sh AS (SELECT DISTINCT doc_id, g FROM (
           SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 4),
               i -> array_to_string(toks[i:i+4], ' '))) AS g
           FROM exact WHERE len(toks) >= 5)),
         sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         inter AS (
           SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
           FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT a_id, b_id FROM inter
           JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
           WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.7),
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         nodes AS (SELECT DISTINCT src AS id FROM edges),
         r(id, label) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT e.src, r.label FROM edges e JOIN r ON e.dst = r.id),
         removed AS (SELECT id FROM r GROUP BY id HAVING MIN(label) <> id),
         near AS (
           SELECT e.doc_id, e.source, e.n_tok
           FROM exact e LEFT JOIN removed rm ON rm.id = e.doc_id
           WHERE rm.id IS NULL),
         per AS (SELECT source, SUM(n_tok) AS t_s FROM near GROUP BY 1),
         rates AS (
           SELECT source,
             least(1.0,
               ((0.5 * CAST(SUM(t_s) OVER () AS DOUBLE)) /
                  CAST(COUNT(*) OVER () AS DOUBLE)) / CAST(t_s AS DOUBLE))
               AS rate
           FROM per),
         rt AS (
           SELECT source, rate,
             lpad(lower(hex(CAST(floor(rate * 65536) AS BIGINT))), 4, '0')
               AS thr
           FROM rates),
         kept AS (
           SELECT n.doc_id, n.source, n.n_tok
           FROM near n JOIN rt ON rt.source = n.source
           WHERE rt.rate >= 1.0 OR
             substr(md5(CAST(n.doc_id AS VARCHAR)), 1, 4) < rt.thr),
         packed AS (
           SELECT source, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048
               AS bin
           FROM kept),
         base AS (SELECT source, COUNT(*) AS n_raw FROM documents GROUP BY 1),
         f1 AS (SELECT source, COUNT(*) AS n_quality FROM quality GROUP BY 1),
         f2 AS (SELECT source, COUNT(*) AS n_exact FROM exact GROUP BY 1),
         f3 AS (SELECT source, COUNT(*) AS n_near FROM near GROUP BY 1),
         f4 AS (
           SELECT source, COUNT(*) AS n_kept, COUNT(DISTINCT bin) AS n_bins,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens_packed
           FROM packed GROUP BY 1)
         SELECT base.source, base.n_raw,
           COALESCE(f1.n_quality, 0) AS n_quality,
           COALESCE(f2.n_exact, 0) AS n_exact,
           COALESCE(f3.n_near, 0) AS n_near,
           COALESCE(f4.n_kept, 0) AS n_kept,
           COALESCE(f4.n_bins, 0) AS n_bins,
           COALESCE(f4.n_tokens_packed, 0) AS n_tokens_packed
         FROM base LEFT JOIN f1 USING (source) LEFT JOIN f2 USING (source)
              LEFT JOIN f3 USING (source) LEFT JOIN f4 USING (source)
         ORDER BY base.source""",

    // surprisal spelling mirrors Spark granule for granule: octave =
    // length(bin(256N // c)) - 1, 512-granule in-octave interpolation,
    // mean DIV per doc; thirds by ROW_NUMBER arithmetic (the oracle's
    // global sort equals Spark's two-phase offset+within-score rank by
    // construction: both are the (score, doc_id) total order). N is a
    // COUNT (BIGINT); the SUM of granules is cast back before DIV (the
    // q94 HUGEINT lesson).
    "q113_surprisal_bucket" -> (surprisalCteSql +
      """, r AS (
           SELECT doc_id, n_tok, score,
             ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rank,
             COUNT(*) OVER () AS n_docs
           FROM p)
         SELECT doc_id, n_tok, score, rank,
           1 + ((rank - 1) * 3) // n_docs AS bucket
         FROM r ORDER BY doc_id"""),

    // add-one bigram LM, q113's integer-log2 granule for granule;
    // ratio r >= 256 by construction so the octave is well-defined
    "q142_bigram_lm_score" ->
      """WITH d AS (
           SELECT doc_id, source, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         vs AS (
           SELECT COUNT(DISTINCT t) AS vsz FROM (
             SELECT unnest(toks) AS t FROM d)),
         d2 AS (SELECT doc_id, source, toks, len(toks) AS n FROM d
                WHERE len(toks) >= 2),
         bi AS (
           SELECT doc_id, source,
             toks[CAST(i AS INT)] AS v, toks[CAST(i + 1 AS INT)] AS w
           FROM (SELECT doc_id, source, toks,
                   unnest(generate_series(1, n - 1)) AS i FROM d2)),
         cv AS (SELECT v, COUNT(*) AS cv FROM bi GROUP BY 1),
         cvw AS (SELECT v, w, COUNT(*) AS cvw FROM bi GROUP BY 1, 2),
         sc AS (
           SELECT bi.doc_id, bi.source,
             ((cv.cv + vs.vsz) * 256) // (cvw.cvw + 1) AS r
           FROM bi JOIN cvw ON cvw.v = bi.v AND cvw.w = bi.w
                   JOIN cv ON cv.v = bi.v
                   CROSS JOIN vs),
         sb AS (SELECT doc_id, source, r, length(bin(r)) - 1 AS k FROM sc),
         st AS (
           SELECT source, COUNT(DISTINCT doc_id) AS n_docs,
             COUNT(*) AS n_bigrams,
             CAST(SUM((k - 8) * 512 +
                 ((r - (CAST(1 AS BIGINT) << k)) * 512)
                   // (CAST(1 AS BIGINT) << k)) AS BIGINT) AS sum_sbits
           FROM sb GROUP BY 1)
         SELECT source, n_docs, n_bigrams, sum_sbits,
           sum_sbits // n_bigrams AS mean_sbits
         FROM st ORDER BY source""",

    // histogram-level Mann-Whitney: per-score (cnt, npos) + cumulative
    // offsets replay Spark's sort-free rank ranges exactly
    // running-offset replay: SUM OVER (ORDER BY doc_id ROWS ... 1
    // PRECEDING) is the single-engine spelling of the distributed
    // prefix; shard boundaries and straddlers are integer arithmetic
    "q147_token_shards" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
           FROM documents),
         o AS (
           SELECT doc_id, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS off
           FROM d),
         s AS (
           SELECT doc_id, n_tok, off, off // 16384 AS shard,
             CASE WHEN (off + n_tok - 1) // 16384 > off // 16384
                  THEN 1 ELSE 0 END AS straddle
           FROM o)
         SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
           CAST(SUM(straddle) AS BIGINT) AS n_straddlers
         FROM s GROUP BY 1 ORDER BY 1""",

    // hashed-bucket model replay: bucket = md5 2-hex-char prefix,
    // add-one smoothed granule surprisals per bucket under raw/target,
    // log_w = Σ (sbits_raw − sbits_tgt) — a subtraction, never a
    // negative //, so Spark's truncating DIV can't diverge from
    // DuckDB's flooring //
    "q145_dsir_weights" ->
      """WITH d AS (
           SELECT doc_id, lang, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         u AS (SELECT doc_id, lang, unnest(toks) AS w FROM d),
         ub AS (SELECT doc_id, lang, substr(md5(w), 1, 2) AS b FROM u),
         raw AS (SELECT b, COUNT(*) AS cr FROM ub GROUP BY 1),
         tgt AS (SELECT b, COUNT(*) AS ct FROM ub WHERE lang = 'en' GROUP BY 1),
         tots AS (SELECT COUNT(*) AS nr,
                    COUNT(CASE WHEN lang = 'en' THEN 1 END) AS nt FROM ub),
         model AS (
           SELECT raw.b,
             ((nr + 256) * 256) // (cr + 1) AS rr,
             ((nt + 256) * 256) // (COALESCE(ct, 0) + 1) AS rt
           FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tots),
         g AS (
           SELECT b,
             ((length(bin(rr)) - 1 - 8) * 512 +
               ((rr - (CAST(1 AS BIGINT) << (length(bin(rr)) - 1))) * 512)
                 // (CAST(1 AS BIGINT) << (length(bin(rr)) - 1)))
             -
             ((length(bin(rt)) - 1 - 8) * 512 +
               ((rt - (CAST(1 AS BIGINT) << (length(bin(rt)) - 1))) * 512)
                 // (CAST(1 AS BIGINT) << (length(bin(rt)) - 1))) AS lw
           FROM model),
         db AS (SELECT doc_id, b, COUNT(*) AS c FROM ub GROUP BY 1, 2),
         agg AS (
           SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
             CAST(SUM(c * lw) AS BIGINT) AS log_w
           FROM db JOIN g ON db.b = g.b GROUP BY 1)
         SELECT doc_id, n_tok, log_w, log_w > 0 AS selected
         FROM agg ORDER BY doc_id""",

    "q126_filter_auc" -> (surprisalCteSql +
      """, lab AS (
           SELECT p.doc_id, p.score,
             CASE WHEN d2.lang = 'en' THEN 1 ELSE 0 END AS pos
           FROM p JOIN documents d2 ON d2.doc_id = p.doc_id),
         h AS (
           SELECT score, COUNT(*) AS cnt,
             CAST(SUM(pos) AS BIGINT) AS npos
           FROM lab GROUP BY 1),
         c AS (
           SELECT score, cnt, npos,
             CAST(COALESCE(SUM(cnt) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS off
           FROM h),
         agg AS (
           SELECT CAST(SUM(npos * (2 * off + cnt + 1)) AS BIGINT) AS ranksum2,
             CAST(SUM(npos) AS BIGINT) AS n_pos,
             CAST(SUM(cnt) AS BIGINT) AS n
           FROM c)
         SELECT n_pos, n - n_pos AS n_neg,
           ((ranksum2 - n_pos * (n_pos + 1)) * 1000000)
             // NULLIF(2 * n_pos * (n - n_pos), 0) AS auc_micro
         FROM agg"""),

    // bucket spelling mirrors Spark: 1 << len(bin(n-1)) above the 64
    // floor; SUMs cast back to BIGINT before the fixed-point DIV
    "q119_pad_waste" ->
      """WITH t AS (
           SELECT doc_id, source,
             CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
           FROM documents),
         b AS (
           SELECT source, n_tok,
             CASE WHEN n_tok <= 64 THEN CAST(64 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) << length(bin(n_tok - 1)) END AS bucket
           FROM t),
         g AS (
           SELECT source, bucket, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             CAST(SUM(bucket - n_tok) AS BIGINT) AS n_pad
           FROM b GROUP BY 1, 2)
         SELECT source, bucket, n_docs, n_tokens, n_pad,
           (n_pad * 1000) // (n_docs * bucket) AS waste_milli
         FROM g ORDER BY source, bucket""",

    // the md5 permutation key is engine-identical; ROW_NUMBER over
    // (epoch, key) replays Spark's WindowGroupLimit-pruned rank
    "q120_epoch_shuffle" ->
      """WITH e AS (
           SELECT doc_id, unnest(generate_series(1, 3)) AS epoch
           FROM documents),
         k AS (
           SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
             md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR))
               AS skey
           FROM e),
         r AS (
           SELECT epoch, doc_id, skey,
             ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY skey) AS rank
           FROM k)
         SELECT epoch, rank, doc_id, skey
         FROM r WHERE rank <= 20 ORDER BY epoch, rank""",

    // '0x'-prefixed hex cast replays Spark's conv(_, 16, 10); both
    // division operands are nonnegative, so DuckDB's flooring // and
    // Spark's truncating DIV agree
    "q169_weighted_sample" ->
      """WITH d AS (
           SELECT source, doc_id,
             CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tok
           FROM documents WHERE length(trim(text)) > 0),
         p AS (
           SELECT source, doc_id, n_tok,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
               AS BIGINT) // n_tok AS priority
           FROM d),
         r AS (
           SELECT source, doc_id, n_tok, priority,
             row_number() OVER (PARTITION BY source
               ORDER BY priority, doc_id) AS rank
           FROM p)
         SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, n_tok,
           priority
         FROM r WHERE rank <= 5 ORDER BY source, rank""",

    // window prefix-sum over (ttr, doc_id) replays the packed-key
    // Prefix order; one flooring division each for ttr and phase
    "q174_curriculum_phases" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE length(trim(text)) > 0),
         s AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
             (CAST(len(list_distinct(toks)) AS BIGINT) * 1000)
               // len(toks) AS ttr
           FROM d),
         o AS (
           SELECT doc_id, n_tok, ttr,
             COALESCE(SUM(n_tok) OVER (ORDER BY ttr, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS off,
             SUM(n_tok) OVER () AS t
           FROM s)
         SELECT CAST((off * 4) // t AS BIGINT) AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(MIN(ttr) AS BIGINT) AS min_ttr,
           CAST(MAX(ttr) AS BIGINT) AS max_ttr
         FROM o GROUP BY 1 ORDER BY phase""",

    // q142's octave spelling with the LEFT-join backoff branch; both
    // division operands stay nonnegative in every branch
    "q175_backoff_lm" ->
      """WITH d AS (
           SELECT doc_id, source, str_split_regex(trim(text), '\s+') AS toks,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' AS trainside
           FROM documents),
         big AS (
           SELECT doc_id, source, trainside,
             toks[CAST(i AS INT)] AS v, toks[CAST(i + 1 AS INT)] AS w
           FROM (SELECT doc_id, source, trainside, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
                 FROM d WHERE len(toks) >= 2)),
         tr AS (SELECT * FROM big WHERE trainside),
         cv AS (SELECT v, COUNT(*) AS cv FROM tr GROUP BY 1),
         cw AS (SELECT w, COUNT(*) AS cw FROM tr GROUP BY 1),
         cvw AS (SELECT v, w, COUNT(*) AS cvw FROM tr GROUP BY 1, 2),
         st AS (SELECT COUNT(*) AS nb, COUNT(DISTINCT w) AS vsz FROM tr),
         ev AS (
           SELECT e.doc_id, e.source,
             COALESCE(cvw.cvw, 0) AS cvw, COALESCE(cv.cv, 0) AS cv,
             COALESCE(cw.cw, 0) AS cw, st.nb, st.vsz
           FROM big e
           LEFT JOIN cvw ON cvw.v = e.v AND cvw.w = e.w
           LEFT JOIN cv ON cv.v = e.v
           LEFT JOIN cw ON cw.w = e.w
           CROSS JOIN st
           WHERE NOT e.trainside),
         sc AS (
           SELECT doc_id, source, cvw,
             CASE WHEN cvw > 0 THEN ((cv + vsz) * 256) // (cvw + 1)
                  ELSE ((nb + vsz) * 256) // (cw + 1) END AS r
           FROM ev),
         sb AS (SELECT doc_id, source, cvw, r,
                  length(bin(r)) - 1 AS k FROM sc)
         SELECT source, COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CASE WHEN cvw = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_backoff,
           CAST(SUM((k - 8) * 512 +
               ((r - (CAST(1 AS BIGINT) << k)) * 512)
                 // (CAST(1 AS BIGINT) << k)
               + CASE WHEN cvw = 0 THEN 1024 ELSE 0 END) AS BIGINT)
             AS sum_sbits,
           CAST(SUM((k - 8) * 512 +
               ((r - (CAST(1 AS BIGINT) << k)) * 512)
                 // (CAST(1 AS BIGINT) << k)
               + CASE WHEN cvw = 0 THEN 1024 ELSE 0 END) AS BIGINT)
             // COUNT(*) AS mean_sbits
         FROM sb GROUP BY source ORDER BY source""",

    // row_number per source replays the Prefix rank; (key, source, k)
    // is a total order so the 48-row head is unambiguous
    "q177_interleave_schedule" ->
      """WITH d AS (SELECT source, doc_id FROM documents),
         k AS (
           SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS k
           FROM d),
         q AS (SELECT source, COUNT(*) AS q FROM d GROUP BY 1),
         n AS (SELECT COUNT(*) AS n FROM d)
         SELECT ((2 * k.k - 1) * n.n) // (2 * q.q) AS key, k.source,
           CAST(k.k AS BIGINT) AS k, k.doc_id
         FROM k JOIN q USING (source) CROSS JOIN n
         ORDER BY key, k.source, k LIMIT 48"""
  )
}
