package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline surface
  * (BASELINE.json north star; generalizes the reference's keyword
  * classifier scrape_tickers.py:161-189): language-ID by marker-word
  * counting, quality scoring (length/stopword/token-shape), token
  * counting (whitespace + regex), and document fingerprinting
  * (md5 over whitespace-normalized text).
  *
  * Everything is built from codegen'd `functions._` string primitives —
  * no UDFs — so the whole pipeline stays inside WholeStageCodegen and
  * scales linearly with the corpus; each op is embarrassingly parallel
  * per document (no shuffle except the final rollup).
  */
object TextAnalysis {

  /** Occurrences of `marker` in padded text via the replace-length trick
    * (portable to the DuckDB oracle verbatim). */
  private def occ(padded: Column, marker: String): Column =
    ((length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(marker), ""))) /
      lit(marker.length)).cast("int")

  /** Marker table: language → distinctive function words. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and "),
    "de" -> Seq(" der ", " und "),
    "es" -> Seq(" el ", " los "),
    "fr" -> Seq(" le ", " et "))

  /** Deterministic argmax language-ID: first language (in langMarkers
    * order) whose score ties-or-beats the rest; "und" when all zero. */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val scores = langMarkers.map { case (l, ms) =>
      l -> ms.map(m => occ(padded, m)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  /** SQL twin of [[langId]] — must stay textually in lockstep. */
  val langIdSql: String = {
    def occSql(m: String) =
      s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', '$m', ''))) / ${m.length} AS INT)"
    val score = langMarkers.map { case (l, ms) =>
      l -> ms.map(occSql).mkString("(", " + ", ")")
    }
    val best = s"greatest(${score.map(_._2).mkString(", ")})"
    score.reverse.foldLeft("'und'") { case (acc, (l, s)) =>
      s"CASE WHEN $s > 0 AND $s = $best THEN '$l' ELSE $acc END"
    }
  }

  private val stopwords = Seq("the", "a", "and", "of", "to", "in")
  private val stopList = stopwords.map(w => s"'$w'").mkString(", ")

  /** Whitespace token / stopword counts — the ONE definition shared by
    * the q32 quality score and the q57 curation filter (both oracles
    * mirror this exact spelling); a tokenization tweak applied here
    * cannot diverge the two queries. */
  private def wsToks: Column = split(trim(col("text")), "\\s+")

  /** The q113 per-doc surprisal score — (doc_id, n_tok, score) in
    * 1/512-bit granules under the corpus's own unigram LM (all-integer
    * log2; see q113's doc comment). Shared by q113 (thirds report) and
    * q126 (filter-AUC evaluation); cached, consumed multiple times. */
  private def surprisalPerDoc(s: org.apache.spark.sql.SparkSession,
                              dir: String): org.apache.spark.sql.DataFrame = {
    val tok = graft.Caches.cached(Tables.fanOut(Tables.documents(s, dir))
      .select(col("doc_id"), explode(wsToks).as("w")))
    val voc = tok.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = tok.agg(count(lit(1)).as("n")) // COUNT, not SUM: stays BIGINT in the oracle too
    graft.Caches.cached(tok
      .join(Tables.maybeBroadcast(voc), Seq("w"))
      .crossJoin(broadcast(tot))
      .withColumn("r", expr("(n * 256) DIV c")) // ≥ 256 since c ≤ N
      .withColumn("k", expr("length(bin(r)) - 1")) // integer floor(log2 r)
      .withColumn("sbits", expr(
        """(k - 8) * 512 +
           ((r - shiftleft(CAST(1 AS BIGINT), k)) * 512)
             DIV shiftleft(CAST(1 AS BIGINT), k)"""))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("sbits")).as("bits"))
      .withColumn("score", expr("bits DIV n_tok"))
      .select("doc_id", "n_tok", "score"))
  }

  /** q151's per-source n-gram novelty core — (source, n_docs,
    * total_grams, novel_grams, novelty_ppm). One spelling shared by
    * q151 and the q162 health report, so the metric cannot drift
    * between its standalone and dashboard forms. */
  private def noveltyPerSource(s: org.apache.spark.sql.SparkSession,
                               dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), wsToks.as("toks"))
    val grams = docs.filter(size(col("toks")) >= 8)
      .withColumn("i", explode(sequence(lit(1), size(col("toks")) - 7)))
      .select(col("doc_id"),
        md5(array_join(slice(col("toks"), col("i"), lit(8)), " ")).as("gram"))
      .distinct()
    val perDoc = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val novel = grams.groupBy("gram").agg(min(col("doc_id")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    perDoc.join(novel, Seq("doc_id"), "left").join(src, Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_grams")).as("total_grams"),
        sum(coalesce(col("n_novel"), lit(0L))).as("novel_grams"))
      .withColumn("novelty_ppm",
        expr("(novel_grams * 1000000) DIV total_grams"))
  }

  /** q158's per-source length-drift core — (source, n_stored, n_batch,
    * tv_ppm, worst_band, worst_band_d_ppm). Shared by q158 and the
    * q162 health report (same no-drift-between-spellings argument as
    * [[noveltyPerSource]]). */
  private def lengthDriftPerSource(s: org.apache.spark.sql.SparkSession,
                                   dir: String): org.apache.spark.sql.DataFrame = {
    val banded = Tables.fanOut(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), nTokens.cast("long").as("n_tok"))
      .withColumn("band", expr("CAST(length(bin(n_tok + 1)) - 1 AS INT)"))
      // md5-keyed ~12.5% batch split (q60's idiom) — the testdata's
      // doc_id % 20 == source makes any modular split per-source
      // degenerate; the hash split is independent of source
      .withColumn("is_new",
        substring(md5(col("doc_id").cast("string")), 1, 1) < lit("2"))
    val counts = banded.groupBy("source", "band")
      .agg(sum(when(col("is_new"), 0L).otherwise(1L)).as("c_old"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("c_new"))
    val tots = banded.groupBy("source")
      .agg(sum(when(col("is_new"), 0L).otherwise(1L)).as("t_old"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("t_new"))
    counts.join(tots, Seq("source"))
      // a source absent from either side has no defined shares — emit
      // nothing for it rather than divide by zero (both engines would
      // otherwise disagree: Spark DIV nulls, DuckDB raises)
      .filter(col("t_old") > 0 && col("t_new") > 0)
      .withColumn("p_ppm", expr("(c_old * 1000000) DIV t_old"))
      .withColumn("q_ppm", expr("(c_new * 1000000) DIV t_new"))
      .withColumn("d", abs(col("p_ppm") - col("q_ppm")))
      .groupBy("source")
      .agg(max(col("t_old")).as("n_stored"), max(col("t_new")).as("n_batch"),
        expr("sum(d) DIV 2").as("tv_ppm"),
        expr("max_by(named_struct('band', band, 'd', d), " +
          "named_struct('d', d, 'b', -band)).band").as("worst_band"),
        max(col("d")).as("worst_band_d_ppm"))
  }

  /** The q149 decremental maintainer: remove the docs matching
    * `deleted` from the stored per-source rollup by SUBTRACTING their
    * partial state (exact for count/Σ/Σ² — integer subtraction is the
    * true inverse of the merge) and repairing MIN/MAX — which have no
    * inverse — only for the sources whose deleted batch touched a
    * stored boundary (semi-join-scoped rescan of the remainder).
    * Factored out so specs can drive the repair path on fixtures whose
    * boundary docs ARE deleted. */
  def decrementalStats(docs: org.apache.spark.sql.DataFrame,
                       deleted: Column): org.apache.spark.sql.DataFrame = {
    def st(df: org.apache.spark.sql.DataFrame, p: String) = df
      .groupBy("source")
      .agg(count(lit(1)).as(s"n$p"), sum(col("n_chars")).as(s"sm$p"),
        sum(col("n_chars") * col("n_chars")).as(s"ss$p"),
        min(col("doc_id")).as(s"mn$p"), max(col("doc_id")).as(s"mx$p"))
    val stored = st(docs, "")                   // full state
    val del = st(docs.filter(deleted), "_d")    // tonight's deletes
    val dec = stored.join(del, Seq("source"), "left")
      .select(col("source"),
        (col("n") - coalesce(col("n_d"), lit(0L))).as("n_docs"),
        (col("sm") - coalesce(col("sm_d"), lit(0L))).as("sum_chars"),
        (col("ss") - coalesce(col("ss_d"), lit(0L))).as("ss_chars"),
        col("mn"), col("mx"),
        (coalesce(col("mn_d") === col("mn"), lit(false)) ||
          coalesce(col("mx_d") === col("mx"), lit(false))).as("repaired"))
      .filter(col("n_docs") > 0)
    val affected = dec.filter(col("repaired")).select("source")
    val repair = docs.filter(!deleted)
      .join(broadcast(affected), Seq("source"), "left_semi")
      .groupBy("source")
      .agg(min(col("doc_id")).as("rmn"), max(col("doc_id")).as("rmx"))
    dec.join(repair, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("sum_chars"),
        when(col("repaired"), col("rmn")).otherwise(col("mn")).as("min_doc"),
        when(col("repaired"), col("rmx")).otherwise(col("mx")).as("max_doc"),
        (col("sum_chars").cast("double") / col("n_docs").cast("double"))
          .as("mean_chars"),
        ((col("ss_chars").cast("double") / col("n_docs").cast("double")) -
          (col("sum_chars").cast("double") / col("n_docs").cast("double")) *
            (col("sum_chars").cast("double") / col("n_docs").cast("double")))
          .as("var_chars"),
        col("repaired"))
  }

  /** The q92 BM25-style scorer, unfiltered: (query_id, doc_id, sts,
    * rank) per (query, candidate doc) — rational idf, floor-scaled
    * order-independent long sums (see q92's doc comment). Shared by
    * q92 (top-3 report) and q123 (hybrid-fusion leg). */
  private def bm25Ranked(s: org.apache.spark.sql.SparkSession,
                         dir: String): org.apache.spark.sql.DataFrame = {
    val d = Tables.fanOut(Tables.documents(s, dir))
      .select(col("doc_id"), wsToks.as("toks"))
    val dl = graft.Caches.cached(
      d.select(col("doc_id"), size(col("toks")).cast("long").as("dl")))
    val tf = d.select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
      .select(col("n_docs"),
        (col("tot").cast("double") / col("n_docs").cast("double")).as("avgdl"))
    bm25Score(bm25Qterms(s), tf, dfT, dl, stats)
  }

  /** The fixed 5-query term set shared by q92/q123/q150. */
  private def bm25Qterms(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Seq(1L -> "hash", 1L -> "join", 2L -> "window",
      2L -> "agg", 3L -> "stream", 3L -> "batch", 4L -> "vector",
      4L -> "scan", 5L -> "customer", 5L -> "query")
      .toDF("query_id", "token")
  }

  /** BM25 scoring from PREBUILT index state (postings `tf`, term
    * `dfT`, doc lengths `dl`, 1-row `stats` = (n_docs, avgdl)) — the
    * ONE scoring spelling, so the full-rebuild path (q92/q123 via
    * [[bm25Ranked]]) and the incremental-state path (q150's merged
    * stored+batch index) cannot drift. */
  private def bm25Score(qterms: org.apache.spark.sql.DataFrame,
                        tf: org.apache.spark.sql.DataFrame,
                        dfT: org.apache.spark.sql.DataFrame,
                        dl: org.apache.spark.sql.DataFrame,
                        stats: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val scored = tf.join(broadcast(qterms), Seq("token"))
      .join(dfT, Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats)) // 1 row: (N, avgdl)
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      .withColumn("nrm",
        lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl")))
      .withColumn("ts", floor(col("idf") *
        ((col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) * col("nrm"))) * lit(1e6))
        .cast("long"))
    val perDoc = scored.groupBy("query_id", "doc_id")
      .agg(sum(col("ts")).as("sts"))
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sts").desc, col("doc_id").asc)
    perDoc.withColumn("rank", row_number().over(rk))
  }
  private def nTokens: Column = size(wsToks)
  private def nStopwords: Column =
    size(expr(s"filter(split(trim(text), '\\\\s+'), t -> t IN ($stopList))"))

  /** md5 fingerprint over lower/trim/whitespace-collapsed text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Bag-of-words identity fingerprint (sorted distinct token set) —
    * the ONE spelling shared by q73's admission key and q80's dedup
    * key; both oracles mirror it, so a tokenization tweak here cannot
    * diverge the two accountings. */
  private def bagOfWordsFp: Column =
    md5(array_join(array_sort(array_distinct(wsToks)), " "))

  /** Rolling polynomial 5-gram hashes (base 257 mod 1e9+7) at every
    * character position — the Rabin-Karp hash family used by winnowing
    * fingerprinting (Schleimer et al., SIGMOD 2003). The window product
    * is unrolled so the whole pipeline is one codegen'd HOF pass and the
    * oracle spelling is literally identical FOR ASCII INPUT — Spark's
    * ascii() yields the signed first UTF-8 byte while DuckDB's unicode()
    * yields the code point, so callers must strip non-ASCII first (q46
    * normalizes with the same regexp on both sides); k is a
    * constant, so per-position evaluation is O(k)=O(1) per char — the
    * classic O(1) rolling update buys nothing at k=5 and would cost a
    * sequential dependency. */
  def rollingHashesExpr(textCol: String): String =
    // every ascii() is cast to BIGINT BEFORE its multiply: an INT×INT
    // product overflows ANSI arithmetic from code point 127 up (127 ×
    // 16974593 > Int.MaxValue) — printable ASCII survives only because
    // '~' is 126. Values are unchanged wherever the INT spelling didn't
    // overflow, and the hash is now total on any code point.
    s"""CASE WHEN length($textCol) < 5 THEN CAST(array() AS ARRAY<BIGINT>)
        ELSE transform(sequence(1, length($textCol) - 4), i ->
          (CAST(ascii(substring($textCol, i, 1)) AS BIGINT) * 4362470401 +
           CAST(ascii(substring($textCol, i + 1, 1)) AS BIGINT) * 16974593 +
           CAST(ascii(substring($textCol, i + 2, 1)) AS BIGINT) * 66049 +
           CAST(ascii(substring($textCol, i + 3, 1)) AS BIGINT) * 257 +
           CAST(ascii(substring($textCol, i + 4, 1)) AS BIGINT)) % 1000000007) END"""

  /** Winnowing selection: min hash of every w=4 window of consecutive
    * gram hashes, distinct — a document's O(len/w)-sized robust
    * fingerprint set (shared fingerprints ⇒ shared ≥k+w-1-char runs). */
  def winnowExpr(hashesCol: String): String =
    s"""CASE WHEN size($hashesCol) = 0 THEN CAST(array() AS ARRAY<BIGINT>)
        ELSE array_distinct(transform(sequence(1, greatest(size($hashesCol) - 3, 1)),
          i -> array_min(slice($hashesCol, i, 4)))) END"""

  val queries: Map[String, Q] = Map(
    // Language-ID heuristic, doc-level on a bounded slice.
    "q30_lang_id" -> ((s, dir) => {
      Tables.documents(s, dir)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), col("lang"), langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")
    }),

    // Language distribution + agreement with the labeled lang, full corpus.
    "q31_lang_distribution" -> ((s, dir) => {
      // fanOut: the single-file scan is 1 partition and langId is the
      // CPU-dense part of the whole query — without it the corpus pass
      // runs on one core
      Tables.fanOut(Tables.documents(s, dir))
        .select(col("lang"), langId(col("text")).as("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")
    }),

    // Quality scoring: length/stopword/token-shape components + composite.
    "q32_quality_score" -> ((s, dir) => {
      val nTok = nTokens
      val nStop = nStopwords
      val noWs = length(regexp_replace(col("text"), " ", ""))
      val avgTokLen = noWs.cast("double") / nTok
      val stopRatio = nStop.cast("double") / nTok
      val lenNorm = least(length(col("text")).cast("double") / 500.0, lit(1.0))
      Tables.documents(s, dir)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), length(col("text")).as("n_chars_obs"),
          nTok.as("n_tokens"), avgTokLen.as("avg_token_len"),
          stopRatio.as("stopword_ratio"),
          (lit(0.4) * stopRatio + lit(0.3) * least(avgTokLen / 10.0, lit(1.0)) +
            lit(0.3) * lenNorm).as("quality"))
        .orderBy("doc_id")
    }),

    // Token counting per source: whitespace, word-regex, and a BPE-style
    // pre-tokenizer (contractions | letter runs | digit runs | punct
    // runs — the GPT-2 pattern family, spelled lookahead-free so the
    // RE2 oracle and Java regex agree token-for-token).
    "q33_token_count" -> ((s, dir) => {
      val bpePat = "'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9\\s]+"
      // fanOut: regex tokenization over the full corpus is CPU-dense
      Tables.fanOut(Tables.documents(s, dir))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("ws_tokens"),
          sum(size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).cast("long")).as("re_tokens"),
          sum(size(regexp_extract_all(lower(col("text")), lit(bpePat), lit(0))).cast("long")).as("bpe_tokens"),
          sum(length(col("text")).cast("long")).as("total_chars"))
        .orderBy("source")
    }),

    // Document fingerprinting (rolling identity for dedup), bounded slice.
    "q34_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // Exact-dedup accounting: distinct fingerprints per source.
    "q35_exact_dedup" -> ((s, dir) => {
      Tables.fanOut(Tables.documents(s, dir))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(fingerprint(col("text"))).as("n_distinct"))
        .orderBy("source")
    }),

    // End-to-end curation pipeline — the composition a training-data
    // run actually executes: language-ID + quality signals computed in
    // ONE scan, low-quality docs filtered, exact dedup keeps the
    // min-id representative per fingerprint, survivors rolled up by
    // (predicted lang, source). Still just two shuffles total (dedup
    // window on fp, final aggregate) because every per-doc signal is a
    // codegen'd column expression, not a pass of its own.
    "q57_curation_pipeline" -> ((s, dir) => {
      // fanOut: lang-ID + tokenization + md5 are the CPU of this query,
      // and the single-file documents scan would otherwise run them on
      // one core (AQE coalesces by bytes, not by expression cost)
      val docs = Tables.fanOut(Tables.documents(s, dir))
        .withColumn("fp", fingerprint(col("text")))
        .withColumn("pred_lang", langId(col("text")))
        .withColumn("stop_ratio", nStopwords.cast("double") / nTokens)
        .filter(length(col("text")) >= 100 && col("stop_ratio") >= 0.05)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col("doc_id"))
      docs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("pred_lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("total_chars"))
        .orderBy("pred_lang", "source")
    }),

    // Document chunking — the sequence-prep step of a training/RAG
    // pipeline: overlapping token windows (50 tokens, stride 40) per
    // document, emitted as (doc, chunk) rows. Pure generate: one
    // explode over a computed chunk-count sequence, window text via
    // slice + array_join — no shuffle at all until the caller
    // aggregates; chunk text is fingerprinted (md5) so the compare
    // surface stays scalar.
    "q63_chunking" -> ((s, dir) => {
      val toks = wsToks
      val nChunks = // 1 chunk for n<=50, else ceil((n-50)/40)+1
        greatest(ceil((size(toks) - 50).cast("double") / 40.0).cast("int"), lit(0)) + 1
      val start = col("chunk_id") * 40 + 1
      Tables.documents(s, dir)
        .filter(col("doc_id") < 100)
        .withColumn("toks", toks)
        .withColumn("chunk_id", explode(sequence(lit(0), nChunks - 1)))
        .withColumn("chunk", array_join(slice(col("toks"), start, lit(50)), " "))
        .select(col("doc_id"), col("chunk_id"),
          size(slice(col("toks"), start, lit(50))).as("n_chunk_tokens"),
          md5(col("chunk")).as("chunk_fp"))
        .orderBy("doc_id", "chunk_id")
    }),

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

    // Benchmark decontamination — flag training docs sharing any token
    // 13-gram with a held-out eval set (the standard n-gram-overlap
    // decontamination check). Held-out set = doc_id % 20 == 0, chosen
    // deterministically so both engines agree. Scale shape: the eval
    // gram set is tiny relative to the corpus (distinct + broadcast),
    // corpus grams are generated by explode (never materialized fully),
    // and the semi-join marks a doc contaminated on first gram hit —
    // no corpus² anywhere, one distinct shuffle keyed by doc.
    "q66_decontaminate" -> ((s, dir) => {
      val docs = Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), wsToks.as("toks"))
      // cached: grams feeds BOTH the eval-set distinct and the
      // contamination semi-join side — uncached, the corpus tokenize +
      // explode + per-position md5 (the expensive work here) runs twice
      // (the same two-consumer shape q72 caches)
      val grams = graft.Caches.cached(docs
        // Spark's sequence(1, hi) DESCENDS when hi < 1 (DuckDB's
        // generate_series is empty) — filter short docs instead of
        // clamping, same row semantics on both engines
        .filter(size(col("toks")) >= 13)
        .withColumn("i", explode(sequence(lit(1), size(col("toks")) - 12)))
        .select(col("doc_id"), col("source"),
          md5(array_join(slice(col("toks"), col("i"), lit(13)), " ")).as("gram")))
      val benchGrams = grams.filter(col("doc_id") % 20 === 0)
        .select("gram").distinct()
      // no broadcast() hint: the eval gram set grows linearly with the
      // corpus (5% of token positions), so at cluster scale AQE must be
      // free to fall back to a shuffled semi-join past the 8 GB
      // broadcast limit; locally it broadcasts anyway
      val contaminated = grams.filter(col("doc_id") % 20 =!= 0)
        .join(benchGrams, Seq("gram"), "left_semi")
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
    }),

    // GRADED contamination report — q66's yes/no gate refined to the
    // report an eval-integrity review actually reads: per corpus doc,
    // the FRACTION of its 13-gram positions that appear in the held-out
    // eval set (fixed-point milli), bucketed clean / trace(<1%) /
    // light(<10%) / heavy, rolled up per (source, bucket) with exact
    // position accounting. A doc with one boilerplate gram in common
    // is a different remediation case than a verbatim eval copy — the
    // binary gate can't tell them apart. Scale shape: q66's exactly
    // (one cached tokenize+md5 pass feeding eval-distinct and corpus
    // sides; semi-join stays shuffled past broadcast scale), plus two
    // doc-keyed map-side-combined aggregates; buckets are a bounded
    // domain.
    "q139_contamination_report" -> ((s, dir) => {
      val docs = Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), wsToks.as("toks"))
      val grams = graft.Caches.cached(docs
        .filter(size(col("toks")) >= 13)
        .withColumn("i", explode(sequence(lit(1), size(col("toks")) - 12)))
        .select(col("doc_id"), col("source"),
          md5(array_join(slice(col("toks"), col("i"), lit(13)), " ")).as("gram")))
      val benchGrams = grams.filter(col("doc_id") % 20 === 0)
        .select("gram").distinct()
      val corpus = grams.filter(col("doc_id") % 20 =!= 0)
      val hits = corpus.join(benchGrams, Seq("gram"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      corpus.groupBy("doc_id", "source").agg(count(lit(1)).as("n_grams"))
        .join(hits, Seq("doc_id"), "left")
        .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
        .withColumn("frac_milli", expr("(n_hit * 1000) DIV n_grams"))
        .withColumn("bucket",
          when(col("n_hit") === 0, "0_clean")
            .when(col("frac_milli") < 10, "1_trace")
            .when(col("frac_milli") < 100, "2_light")
            .otherwise("3_heavy"))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_grams")).as("n_grams"),
          sum(col("n_hit")).as("n_hits"))
        .orderBy("source", "bucket")
    }),

    // Within-document repetition signals (the Gopher-style quality
    // rules): duplicate-token fraction and most-frequent-bigram mass.
    // Distinct-token count is a codegen'd array op in the scan stage;
    // the bigram mode needs a per-(doc,bigram) count — two hash
    // aggregates keyed by doc, map-side partials absorb the fan-in.
    "q67_repetition" -> ((s, dir) => {
      val base = Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"), wsToks.as("toks"))
      val bigrams = base
        .filter(size(col("toks")) >= 2) // sequence(1,0) descends in Spark
        .withColumn("i", explode(sequence(lit(1), size(col("toks")) - 1)))
        .select(col("doc_id"),
          array_join(slice(col("toks"), col("i"), lit(2)), " ").as("bigram"))
      val per = bigrams.groupBy(col("doc_id"), col("bigram"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_c"), sum(col("c")).as("n_bigrams"))
      base.select(col("doc_id"), size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"))
        .join(per, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens").cast("double"))
            .as("dup_token_frac"),
          (col("top_c").cast("double") / col("n_bigrams").cast("double"))
            .as("top_bigram_frac"))
        .orderBy("doc_id")
    }),

    // Exact per-source vocabulary heavy hitters — the corpus report a
    // data-curation run prints (top tokens per slice). Deterministic
    // tie-break (count desc, token asc) keeps it oracle-exact. Token
    // counting is one hash aggregate keyed (source, token) — map-side
    // partials absorb the explode fan-out — and the top-5 is a per-
    // source window over the (small) distinct-token aggregate, not the
    // token stream.
    "q68_top_terms" -> ((s, dir) => {
      val counts = Tables.fanOut(Tables.documents(s, dir))
        .select(col("source"), explode(wsToks).as("token"))
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("cnt").desc, col("token").asc)
      counts.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("source"), col("rank"), col("token"), col("cnt"))
        .orderBy("source", "rank")
    }),

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
      val fps = graft.Caches.cached(
        Tables.fanOut(Tables.documents(s, dir))
          .select(col("doc_id"), wsToks.as("toks"))
          .filter(size(col("toks")) >= 8)
          .withColumn("gh", expr(
            "transform(sequence(1, size(toks) - 7), " +
              "i -> md5(array_join(slice(toks, i, 8), ' ')))"))
          .withColumn("fp", explode(expr(
            "array_distinct(transform(sequence(1, greatest(size(gh) - 3, 1)), " +
              "i -> array_min(slice(gh, i, 4))))")))
          .select("doc_id", "fp"))
      val sizes = fps.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
      val rare = fps.join(
        fps.groupBy("fp").agg(countDistinct(col("doc_id")).as("nd"))
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

    // Cross-document duplicated-span fraction (the RefinedWeb-style
    // "fraction of my 8-gram positions that also occur in another doc"
    // signal — within-doc repetition is q67, this is ACROSS docs).
    // Scale shape: grams stream out of a generate (never a materialized
    // corpus-sized array), one (gram → n_docs) hash aggregate with
    // map-side partials carries the corpus-wide evidence, and the
    // per-doc fraction is a doc-keyed aggregate over the gram stream
    // semi-annotated by that table. Gram-frequency skew (stop-phrase
    // grams shared by thousands of docs) inflates ONLY the count table,
    // never a join fan-out: the shared-gram set is joined back to gram
    // positions by equi-key, row-per-position.
    "q72_dup_spans" -> ((s, dir) => {
      // cached: docs feeds the gram stream (itself consumed by the
      // shared-gram aggregate AND the per-doc semi-join side) plus the
      // n_pos projection — uncached, the corpus would be re-tokenized
      // three times
      val docs = graft.Caches.cached(Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), wsToks.as("toks"))
        .filter(size(col("toks")) >= 8)) // sequence(1,0) descends in Spark
      // corpus-sized cache, MEASURED under the honest (cache-charging)
      // bench r6: 1.90 s cached vs 2.25 s recomputing the gram stream
      // per consumer (sf0.1, reps=3 min) — the double tokenize+md5
      // costs more than the one materialization, so the cache stays
      val grams = graft.Caches.cached(docs
        .withColumn("i", explode(sequence(lit(1), size(col("toks")) - 7)))
        .select(col("doc_id"),
          md5(array_join(slice(col("toks"), col("i"), lit(8)), " ")).as("gram")))
      val shared = grams.select("doc_id", "gram").distinct()
        .groupBy("gram").agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2)
        .select("gram")
      val perDoc = grams.join(shared, Seq("gram"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup_pos"))
      docs.select(col("doc_id"), (size(col("toks")) - 7).as("n_pos"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_pos").cast("long").as("n_pos"),
          coalesce(col("n_dup_pos"), lit(0L)).as("n_dup_pos"),
          (coalesce(col("n_dup_pos"), lit(0L)).cast("double") /
            col("n_pos").cast("double")).as("dup_span_frac"))
        .orderBy("doc_id")
    }),

    // Incremental dedup — the nightly-batch shape of a training-data
    // pipeline: docs arriving in tonight's batch are admitted only if
    // their fingerprint collides with neither the existing corpus nor
    // an earlier doc of the same batch. The fingerprint is the sorted
    // distinct token SET (bag-of-words identity — robust to token
    // order, the coarsest exact-dedup key in the ladder below q34's
    // normalized-text md5). Accounting per source. Scale shape: the
    // corpus side reduces to DISTINCT fingerprints (bounded by content
    // diversity, not corpus size) before the anti-join; within-batch
    // survivorship is a min-id aggregate, not a self-join.
    "q73_incremental_dedup" -> ((s, dir) => {
      val all = Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), bagOfWordsFp.as("fp"))
      // hash split, decorrelated from doc_id's round-robin source
      // assignment: ~1/4 of docs are "tonight's batch"
      val h = substring(md5(col("doc_id").cast("string")), 1, 1)
      val corpus = all.filter(!h.isin("0", "1", "2", "3"))
      val batch = graft.Caches.cached(all.filter(h.isin("0", "1", "2", "3")))
      val corpusFps = corpus.select("fp").distinct()
      // cached: vsCorpus feeds three consumers (firstOfBatch, kept's
      // left side, keptBySrc via kept) — uncached, the corpus-side scan
      // + distinct-fingerprint aggregate would re-execute per consumer
      val vsCorpus = graft.Caches.cached(batch.join(corpusFps, Seq("fp"), "left_anti"))
      val firstOfBatch = vsCorpus.groupBy("fp").agg(min(col("doc_id")).as("keep_id"))
      val kept = vsCorpus.join(firstOfBatch,
        vsCorpus("fp") === firstOfBatch("fp") &&
          vsCorpus("doc_id") === firstOfBatch("keep_id"))
      val base = batch.groupBy("source").agg(count(lit(1)).as("n_batch"))
      val keptBySrc = kept.groupBy(vsCorpus("source").as("source"))
        .agg(count(lit(1)).as("n_admitted"))
      base.join(keptBySrc, Seq("source"), "left")
        .select(col("source"), col("n_batch"),
          coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
          (col("n_batch") - coalesce(col("n_admitted"), lit(0L))).as("n_rejected"))
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

    // Asymmetric containment near-dup — |A∩B| / |A| over token 3-gram
    // sets (catches a short doc embedded in a long one, which Jaccard
    // misses because the union is dominated by the long side). Same
    // inverted-index shape as q36: pairs come from shared grams only,
    // never a corpus self-join.
    "q78_containment" -> ((s, dir) => {
      graft.plans.SortedTokenShingles.register(s)
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      val idx = graft.Caches.cached(Tables.fanOut(docs)
        .select(col("doc_id"),
          explode(call_function(graft.plans.SortedTokenShingles.NAME,
            col("text"), lit(3))).as("g")))
      val sizes = idx.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val inter = idx.as("x").join(idx.as("y"),
          col("x.g") === col("y.g") && col("x.doc_id") =!= col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "a_n"), "a_id")
        .select(col("a_id"), col("b_id"),
          (col("inter").cast("double") / col("a_n").cast("double")).as("containment"))
        .filter(col("containment") >= 0.5)
        .orderBy("a_id", "b_id")
    }),

    // Curation funnel with reason attribution — the survival report a
    // production data-curation run prints: every doc is assigned its
    // FIRST failing rule (short → repetitive → low-quality → duplicate,
    // the standard filter-then-dedup order; dedup survivorship is
    // decided only among docs that passed the content filters, exactly
    // as a real pipeline would run it). q57 is the composition that
    // keeps the survivors; this is the accounting of everything else.
    // Scale shape: one corpus scan computes every feature in codegen,
    // the fingerprint window shuffles only filter-survivors, and the
    // output is a source-keyed rollup.
    "q80_curation_funnel" -> ((s, dir) => {
      val feat = Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"),
          nTokens.as("n_tok"),
          (lit(1.0) - size(array_distinct(wsToks)).cast("double") /
            nTokens.cast("double")).as("dup_frac"),
          (nStopwords.cast("double") / nTokens.cast("double")).as("stop_ratio"),
          bagOfWordsFp.as("fp"))
      val passed = col("n_tok") >= 30 && col("dup_frac") <= 0.70 &&
        col("stop_ratio") >= 0.02
      val featC = graft.Caches.cached(feat.withColumn("passed", passed))
      // the fingerprint window runs over filter-SURVIVORS only (dedup
      // is sequenced after the content filters, so failed docs never
      // join the fp shuffle); failed docs take the reason chain
      // directly and union back in
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col("doc_id"))
      val survivors = featC.filter(col("passed"))
        .withColumn("reason",
          when(row_number().over(w) > 1, "duplicate").otherwise("kept"))
      val failed = featC.filter(!col("passed"))
        .withColumn("reason",
          when(col("n_tok") < 30, "short")
            .when(col("dup_frac") > 0.70, "repetitive")
            .otherwise("low_quality"))
      val reasoned = survivors.select("source", "reason")
        .unionByName(failed.select("source", "reason"))
      reasoned.groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("reason") === "short", 1L).otherwise(0L)).as("n_short"),
          sum(when(col("reason") === "repetitive", 1L).otherwise(0L)).as("n_repetitive"),
          sum(when(col("reason") === "low_quality", 1L).otherwise(0L)).as("n_low_quality"),
          sum(when(col("reason") === "duplicate", 1L).otherwise(0L)).as("n_duplicate"),
          sum(when(col("reason") === "kept", 1L).otherwise(0L)).as("n_kept"))
        .orderBy("source")
    }),

    // Sensitive-term scrubbing — dictionary-driven token masking with
    // per-doc accounting and a cleaned-text digest (the PII-redaction
    // shape; the dictionary stands in for regex detectors, which slot
    // into the same transform). Pure codegen'd array ops, no shuffle
    // before the final sort.
    "q75_scrub_terms" -> ((s, dir) => {
      val masked = transform(wsToks,
        t => when(t.isin("customer", "spark", "vector"), lit("[MASKED]")).otherwise(t))
      Tables.documents(s, dir)
        .filter(col("doc_id") < 300)
        .withColumn("m", masked)
        .select(col("doc_id"),
          size(filter(col("m"), t => t === "[MASKED]")).cast("long").as("n_masked"),
          md5(array_join(col("m"), " ")).as("clean_md5"))
        .orderBy("doc_id")
    }),

    // REGEX-DETECTOR variant of q75's dictionary scrubber — the shape a
    // real PII pass uses: each detector is a regular expression, hit
    // counts come from regexp_extract_all, and regexp_replace masks
    // matches feeding the same cleaned-text digest accounting. The
    // email pattern is the production detector (zero hits on this
    // corpus — the n_emails column PROVES the negative rather than
    // assuming it); the "customer <token>" pseudo-identifier pattern is
    // corpus-ACTIVE, so the masking rewrite itself is oracle-exercised,
    // not just the counting. Patterns stay in the RE2 ∩ Java-regex
    // common subset (character classes, bounded repeats — no
    // lookaround), so both engines compile them identically. Pure
    // per-row codegen'd string ops; no shuffle before the output sort.
    "q89_regex_scrub" -> ((s, dir) => {
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val idRe = "customer [a-z]+"
      Tables.documents(s, dir)
        .filter(col("doc_id") < 300)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("text"), lit(idRe), lit(0)))
            .cast("long").as("n_ids"),
          md5(regexp_replace(regexp_replace(col("text"), emailRe, "[EMAIL]"),
            idRe, "[ID]")).as("clean_md5"))
        .orderBy("doc_id")
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

    // N-GRAM NOVELTY PROFILE — the marginal-value-of-data curve a
    // curation team reads before buying more of a source: in doc_id
    // (arrival) order, what fraction of each source's distinct token
    // 8-grams had NEVER appeared in any earlier document? A source
    // whose novelty rate has collapsed is re-crawling what the corpus
    // already holds. First occurrence = min(doc_id) over the gram's
    // whole posting, so the metric is exact, order-deterministic, and
    // all-integer (ppm fixed point). Scale shape: one tokenize+md5
    // pass → (doc, gram) distinct (doc+gram-keyed shuffle with partial
    // aggregation) → a gram-keyed min (the inverted index, map-side
    // combined) → two DOC-keyed aggregates joined doc-to-doc. No
    // gram-level join-back and no corpus² anywhere: the owner table
    // collapses to one row per distinct gram before anything joins.
    "q151_novelty_profile" -> ((s, dir) =>
      noveltyPerSource(s, dir).orderBy("source")),

    // CROSS-SOURCE DUPLICATION MATRIX — which sources are feeding the
    // mixture the same text? For every source pair, the number of
    // distinct token 8-grams both contain, plus a Jaccard ppm over
    // their gram-set union — the audit that catches two "independent"
    // crawls of the same site before they double-weight it in the
    // mixture. Scale shape: the only corpus-sized stages are the
    // tokenize pass and a (source, gram) distinct; the self-join is
    // gram-keyed and fans out at most C(|sources|, 2) rows per gram —
    // sources are a bounded mixture domain (here 20, in production
    // maybe hundreds), never corpus-sized, so the pair stream stays
    // linear in the distinct-gram count.
    "q152_source_overlap" -> ((s, dir) => {
      val docs = Tables.fanOut(Tables.documents(s, dir))
        .select(col("source"), wsToks.as("toks"))
      val sg = graft.Caches.cached(docs.filter(size(col("toks")) >= 8)
        .withColumn("i", explode(sequence(lit(1), size(col("toks")) - 7)))
        .select(col("source"),
          md5(array_join(slice(col("toks"), col("i"), lit(8)), " ")).as("gram"))
        .distinct())
      val tot = sg.groupBy("source").agg(count(lit(1)).as("n_grams"))
      val shared = sg.select(col("source").as("source_a"), col("gram"))
        .join(sg.select(col("source").as("source_b"), col("gram")), Seq("gram"))
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("shared_grams"))
      shared
        .join(tot.select(col("source").as("source_a"), col("n_grams").as("ga")), Seq("source_a"))
        .join(tot.select(col("source").as("source_b"), col("n_grams").as("gb")), Seq("source_b"))
        .withColumn("jaccard_ppm",
          expr("(shared_grams * 1000000) DIV (ga + gb - shared_grams)"))
        .select("source_a", "source_b", "shared_grams", "jaccard_ppm")
        .orderBy("source_a", "source_b")
    }),

    // VOCABULARY GROWTH (Heaps-law checkpoints) — distinct-token count
    // after each octile of the corpus in doc_id (arrival) order: the
    // curve whose flattening tells a tokenizer team the vocabulary has
    // saturated and more data buys types, not tokens. Exact, no
    // sampling: each token's FIRST document (gram-keyed min — the
    // inverted index again) is bucketed against 8 thresholds derived
    // from max(doc_id), and all 8 cumulative counts come out of ONE
    // map-side-combined conditional aggregate — no window, no sort, no
    // per-octile rescan; the unpivot at the end touches 8 values. The
    // 1-row max(doc_id) broadcast is the same stats-gating crossJoin
    // shape as q142/q145 (PlanSpec-allowlisted).
    "q153_vocab_growth" -> ((s, dir) => {
      val docs = Tables.fanOut(Tables.documents(s, dir))
      val firstT = docs
        .select(col("doc_id"), explode(wsToks).as("w"))
        .groupBy("w").agg(min(col("doc_id")).as("first_doc"))
      val mx = docs.agg(max(col("doc_id")).as("mx"))
      val sums = (1 to 8).map { k =>
        sum(when(col("first_doc") <= expr(s"(mx * $k) DIV 8"), 1L)
          .otherwise(0L)).as(s"c$k")
      }
      val row = firstT.crossJoin(broadcast(mx)).agg(sums.head, sums.tail: _*)
      row.select(expr(
        "stack(8, " + (1 to 8).map { k =>
          val prev = if (k == 1) "CAST(0 AS BIGINT)" else s"c${k - 1}"
          s"$k, c$k, c$k - $prev"
        }.mkString(", ") + ") AS (octile, cum_vocab, new_vocab)"))
        .select(col("octile").cast("long").as("octile"),
          col("cum_vocab"), col("new_vocab"))
        .orderBy("octile")
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

    // LENGTH-DISTRIBUTION DRIFT MONITOR — the nightly check a corpus
    // pipeline runs before admitting a new batch: per source, how far
    // has the batch's token-length distribution drifted from the
    // stored corpus's? Lengths land in power-of-two bands (the q156
    // bin()-length log2), shares are exact ppm integers, and the
    // drift statistic is total-variation distance over ppm shares —
    // TV = Σ|p−q|/2 — plus the single most-drifted band, so the alarm
    // says WHERE the shift is (q121 is this report's vector-index
    // sibling). All-integer end to end: ppm shares avoid the N²-sized
    // cross products an exact-rational TV would need at corpus scale.
    // Scale shape: one narrow pass → a (source, band, is_new)
    // conditional aggregate (bounded keys) → per-source rollup; the
    // per-source totals join is |sources|-sized.
    "q158_length_drift" -> ((s, dir) =>
      lengthDriftPerSource(s, dir).orderBy("source")),

    // QUALITY-SIGNAL CALIBRATION TABLE — the reliability diagram for
    // the q113/q126 surprisal score: per eighth-bit score band (score
    // DIV 64 — scores are 1/512-bit granules, and the whole corpus
    // fits inside one power-of-two octave, so the q156 bands would
    // collapse to a single row), how many docs land there and what
    // fraction are actually the target class ('en', q126's label)?
    // q126's AUC says the signal RANKS well; this table says what
    // purity a THRESHOLD at each band buys — the number a filtering
    // pipeline actually sets. Exact and all-integer (ppm rates); the
    // band domain is bounded by 512·log2(corpus tokens)/64 ≈ 8·log2 N
    // keys. Scale shape: the shared cached surprisal pass, one
    // doc-keyed label join, one bounded-band aggregate.
    "q159_score_calibration" -> ((s, dir) => {
      surprisalPerDoc(s, dir)
        .join(Tables.documents(s, dir).select(col("doc_id"),
          (col("lang") === "en").cast("long").as("pos")), Seq("doc_id"))
        .withColumn("band", expr("score DIV 64"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"))
        .withColumn("pos_rate_ppm", expr("(n_pos * 1000000) DIV n_docs"))
        .orderBy("band")
    }),

    // DEDUP SAVINGS ATTRIBUTION — who pays for whose duplicates?
    // Exact-duplicate clusters under the shared bag-of-words identity
    // (q73/q80's fingerprint), keeper = min doc_id; every dropped
    // duplicate's tokens are attributed to the (keeper_source,
    // dup_source) pair. The diagonal is intra-source redundancy; the
    // off-diagonal is the doc-level complement of q152's gram-level
    // matrix — it tells the mixture owner which source to bill for
    // re-crawled text. Scale shape: one fingerprint pass, an fp-keyed
    // min (map-side combined), one fp-keyed join back, one doc-keyed
    // keeper-source lookup, a bounded (source × source) rollup.
    "q160_dedup_attribution" -> ((s, dir) => {
      val d = graft.Caches.cached(Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), bagOfWordsFp.as("fp"),
          nTokens.cast("long").as("n_tok")))
      val keepers = d.groupBy("fp").agg(min(col("doc_id")).as("keeper_id"))
      d.join(keepers, Seq("fp"))
        .filter(col("doc_id") =!= col("keeper_id"))
        .join(d.select(col("doc_id").as("keeper_id"),
          col("source").as("keeper_source")), Seq("keeper_id"))
        .groupBy(col("keeper_source"), col("source").as("dup_source"))
        .agg(count(lit(1)).as("n_dup_docs"),
          sum(col("n_tok")).as("tokens_saved"))
        .orderBy("keeper_source", "dup_source")
    }),

    // LANG-ID PER-CLASS PRECISION/RECALL — the classifier scorecard
    // q31's raw confusion matrix implies but doesn't state: for each
    // language class, support, predicted count, correct count, and
    // recall/precision in ppm — the numbers that decide whether the
    // marker-based router is good enough to gate a mixture. NULLIF
    // guards keep zero-support ('und' appears only as a prediction)
    // and zero-predicted classes NULL on both engines. Scale shape:
    // one narrow lang-ID pass into a bounded (lang × pred) aggregate;
    // every rollup after that is on the ≤|langs|² matrix.
    "q161_langid_prf" -> ((s, dir) => {
      val cm = graft.Caches.cached(Tables.fanOut(Tables.documents(s, dir))
        .select(col("lang"), langId(col("text")).as("pred_lang"))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n")))
      val sup = cm.groupBy("lang").agg(sum(col("n")).as("support"))
      val pred = cm.groupBy(col("pred_lang").as("lang"))
        .agg(sum(col("n")).as("predicted"))
      val cor = cm.filter(col("lang") === col("pred_lang"))
        .select(col("lang"), col("n").as("correct"))
      sup.join(pred, Seq("lang"), "full").join(cor, Seq("lang"), "left")
        .select(col("lang"),
          coalesce(col("support"), lit(0L)).as("support"),
          coalesce(col("predicted"), lit(0L)).as("predicted"),
          coalesce(col("correct"), lit(0L)).as("correct"))
        .withColumn("recall_ppm",
          expr("(correct * 1000000) DIV nullif(support, 0)"))
        .withColumn("precision_ppm",
          expr("(correct * 1000000) DIV nullif(predicted, 0)"))
        .orderBy("lang")
    }),

    // CORPUS HEALTH REPORT — the one-page nightly dashboard a corpus
    // owner actually reads, one row per source: volume (docs, tokens),
    // exact-duplicate burden (bag-of-words, ppm), n-gram novelty (the
    // q151 marginal-value signal, via the SHARED noveltyPerSource
    // core), and length-distribution drift (the q158 monitor, via the
    // SHARED lengthDriftPerSource core). A capstone in the q100 sense:
    // it composes already-proven pipelines into the report that decides
    // re-crawl / re-weight / alarm — and because every component rides
    // the single shared spelling, the dashboard can never disagree
    // with its standalone queries. Scale shape: the union of its
    // parts' shapes (each documented at its core); the final joins are
    // all |sources|-sized.
    "q162_corpus_health" -> ((s, dir) => {
      val base = Tables.fanOut(Tables.documents(s, dir))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(nTokens.cast("long")).as("total_tokens"))
      val d = graft.Caches.cached(Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), bagOfWordsFp.as("fp")))
      val keepers = d.groupBy("fp").agg(min(col("doc_id")).as("keeper_id"))
      val dups = d.join(keepers, Seq("fp"))
        .filter(col("doc_id") =!= col("keeper_id"))
        .groupBy("source").agg(count(lit(1)).as("dup_docs"))
      base.join(dups, Seq("source"), "left")
        .withColumn("dup_docs", coalesce(col("dup_docs"), lit(0L)))
        .withColumn("dup_rate_ppm", expr("(dup_docs * 1000000) DIV n_docs"))
        .join(noveltyPerSource(s, dir).select("source", "novelty_ppm"),
          Seq("source"), "left")
        .join(lengthDriftPerSource(s, dir)
          .select(col("source"), col("tv_ppm").as("drift_tv_ppm")),
          Seq("source"), "left")
        .select("source", "n_docs", "total_tokens", "dup_docs",
          "dup_rate_ppm", "novelty_ppm", "drift_tv_ppm")
        .orderBy("source")
    }),

    // TOKEN FREQUENCY SPECTRUM — the Zipf head/tail profile a
    // tokenizer team reads next to q153's growth curve: token types
    // and occurrence mass per power-of-two frequency band (band =
    // ⌊log2 f⌋ via the all-integer bin()-length spelling shared with
    // q113/q142). A corpus whose mass sits in the top bands is
    // head-heavy (small vocab suffices); a fat tail says the opposite.
    // Scale shape: one token-keyed map-side-combined count, then a
    // ≤64-key band rollup — no sort, no rank, no corpus-sized window
    // (a RANK-based Zipf plot would need a global vocabulary sort;
    // the band histogram answers the same sizing question without it).
    "q156_token_spectrum" -> ((s, dir) => {
      Tables.fanOut(Tables.documents(s, dir))
        .select(explode(wsToks).as("w"))
        .groupBy("w").agg(count(lit(1)).as("f"))
        .withColumn("band", expr("CAST(length(bin(f)) - 1 AS INT)"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_types"), sum(col("f")).as("n_occurrences"))
        .orderBy("band")
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
      val removed = Dedup.components(pairs)
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

    // Cross-document boilerplate removal — the C4/CCNet "drop lines
    // repeated across many pages" pass, rewritten for scale: each doc
    // splits into consecutive 8-token lines; a line occurring in ≥3
    // DISTINCT docs corpus-wide is boilerplate and is STRIPPED from
    // every doc, and the query emits the rewrite itself (the retained
    // text, order-preserved) so the pass is hash-checkable end to end
    // (like q89's masking rewrite, not just an accounting). Scale
    // shape: the line stream is corpus-sized but narrow; the df
    // aggregate is keyed by line with map-side partials; the strip is
    // a left_anti against the (small) boilerplate set — never
    // corpus×corpus; reassembly is a per-doc sort_array over that
    // doc's own ≤len/8 lines (partial-agg'd), not a corpus window.
    "q109_boilerplate_strip" -> ((s, dir) => {
      val docs = Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), wsToks.as("toks"))
        .withColumn("n_lines", expr("CAST((size(toks) + 7) DIV 8 AS BIGINT)"))
      val lines = graft.Caches.cached(docs
        .withColumn("c", explode(sequence(lit(0L), col("n_lines") - 1)))
        .select(col("doc_id"), col("c"),
          array_join(
            slice(col("toks"), (col("c") * 8 + 1).cast("int"), lit(8)), " ")
            .as("line")))
      val boiler = lines.select("line", "doc_id").distinct()
        .groupBy("line").agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 3).select("line")
      val rebuilt = lines.join(boiler, Seq("line"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept_lines"),
          array_join(
            transform(array_sort(collect_list(struct(col("c"), col("line")))),
              x => x.getField("line")), " ").as("kept_text"))
      docs.select(col("doc_id"), col("n_lines"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_lines"),
          (col("n_lines") - coalesce(col("n_kept_lines"), lit(0L)))
            .as("n_removed"),
          coalesce(col("kept_text"), lit("")).as("kept_text"))
        .orderBy("doc_id")
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

    // Exact duplicated-substring manifest (the span-level view of
    // Lee et al. 2022's substring dedup; q72 counts, THIS emits the
    // cut list): positions whose 8-token gram occurs in ≥ 2 distinct
    // docs merge into MAXIMAL spans — fixed gram length makes interval
    // ends monotone in start, so the island rule is just
    // p − lag(p) > 8, one window pass per doc. Output: per (doc,
    // island) the token interval [span_start, span_end) a rewriter
    // would cut. Scale shape: gram df is an aggregate + semi-join
    // (q72's no-fan-out shape — duplicated POSITIONS come back
    // doc-keyed, never gram×gram); both windows partition by doc_id.
    "q125_dup_span_manifest" -> ((s, dir) => {
      val docs = Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), wsToks.as("toks"))
        .filter(size(col("toks")) >= 8)
      val grams = graft.Caches.cached(docs
        .withColumn("p", explode(sequence(lit(1L), size(col("toks")) - 7)))
        .select(col("doc_id"), col("p"),
          array_join(slice(col("toks"), col("p").cast("int"), lit(8)), " ")
            .as("gram")))
      val dup = grams.select("gram", "doc_id").distinct()
        .groupBy("gram").agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2).select("gram")
      val hits = grams.join(dup, Seq("gram"), "left_semi")
      val wP = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("p")
      val run = wP.rowsBetween(Long.MinValue, 0)
      hits
        .withColumn("newi",
          (lag(col("p"), 1).over(wP).isNull ||
            col("p") - lag(col("p"), 1).over(wP) > 8).cast("int"))
        .withColumn("island", sum(col("newi")).over(run))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("p")).as("span_start"),
          (max(col("p")) + 8).as("span_end"),
          count(lit(1)).as("n_grams"))
        .orderBy("doc_id", "island")
    }),

    // Duplicated-substring REWRITE — q125's cut list APPLIED (the
    // rewriter itself, closing the span-dedup loop the way q109 closed
    // the boilerplate loop): token positions covered by any
    // corpus-duplicated 8-gram are cut, survivors reassemble in order,
    // and the emitted rewrite is hash-checked — not just counted.
    // Scale shape: gram df is the q72/q125 aggregate + semi-join
    // (duplicated POSITIONS come back doc-keyed, never gram×gram);
    // coverage explodes each hit into its 8 positions (8× the HIT
    // count, not the corpus); the reassembly is one per-doc aggregate
    // over kept tokens with an in-group sort (q109's spelling) — no
    // window, no corpus-global order anywhere.
    "q136_dup_span_rewrite" -> ((s, dir) => {
      val docs = graft.Caches.cached(
        Tables.fanOut(Tables.documents(s, dir))
          .select(col("doc_id"), wsToks.as("toks"))
          .filter(size(col("toks")) >= 8))
      val grams = graft.Caches.cached(docs
        .withColumn("p", explode(sequence(lit(1L), size(col("toks")) - 7)))
        .select(col("doc_id"), col("p"),
          array_join(slice(col("toks"), col("p").cast("int"), lit(8)), " ")
            .as("gram")))
      val dup = grams.select("gram", "doc_id").distinct()
        .groupBy("gram").agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2).select("gram")
      val covered = grams.join(dup, Seq("gram"), "left_semi")
        .withColumn("t", explode(sequence(col("p"), col("p") + 7)))
        .select("doc_id", "t").distinct()
      val toks = docs
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("i", "tok")))
        .select(col("doc_id"), (col("i") + 1).cast("long").as("t"), col("tok"))
      val rebuilt = toks.join(covered, Seq("doc_id", "t"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(
            transform(array_sort(collect_list(struct(col("t"), col("tok")))),
              x => x.getField("tok")), " ").as("rewritten"))
      docs.select(col("doc_id"), size(col("toks")).cast("long").as("n_tok"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tok"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_tok") - coalesce(col("n_kept"), lit(0L))).as("n_cut"),
          coalesce(col("rewritten"), lit("")).as("rewritten"))
        .orderBy("doc_id")
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

    // C4-STYLE CROSS-DOCUMENT SEGMENT DEDUP (Raffel et al. 2020 §2.2's
    // "any three-sentence span occurring more than once in the data
    // set is removed, keeping one" rule, re-expressed over this
    // corpus's whitespace tokens): docs tile into fixed 16-token
    // paragraphs (short tail kept), the GLOBALLY FIRST occurrence in
    // (doc_id, tile) order survives, and every later occurrence —
    // across docs and intra-doc repeats alike — is scrubbed. The
    // per-doc manifest (kept/removed tiles and tokens + a kept-tile
    // checksum) pins exactly which spans survived. Scale shape: the
    // tile explode is narrow; first-occurrence is min(struct(doc_id,
    // tile)) — PARTIALLY AGGREGABLE, so a corpus-wide mega-duplicated
    // paragraph combines map-side instead of flooding one reducer
    // (the row_number-window spelling the oracle uses would sort
    // every occurrence of a hot paragraph in one task); the fan-back
    // join on the tile key inherits AQE skew splitting; shuffle keys
    // are ≤ 16 tokens, never whole documents.
    "q165_paragraph_dedup" -> ((s, dir) => {
      val tiles = graft.Caches.cached(
        Tables.fanOut(Tables.documents(s, dir))
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"), wsToks.as("toks"))
          .withColumn("nt", size(col("toks")).cast("long"))
          .select(col("doc_id"), col("toks"), col("nt"),
            explode(expr("sequence(CAST(0 AS BIGINT), (nt - 1) DIV 16)"))
              .as("i"))
          .withColumn("ptok", least(col("nt") - col("i") * 16, lit(16L)))
          .withColumn("para",
            concat_ws(" ", expr("slice(toks, CAST(i * 16 + 1 AS INT), 16)")))
          .select("doc_id", "i", "ptok", "para"))
      val first = tiles.groupBy("para")
        .agg(min(struct(col("doc_id"), col("i"))).as("f"))
      tiles.join(first, "para")
        .withColumn("keep",
          col("doc_id") === col("f.doc_id") && col("i") === col("f.i"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tiles"),
          sum(when(!col("keep"), 1L).otherwise(0L)).as("dup_tiles"),
          sum(when(col("keep"), col("ptok")).otherwise(0L)).as("kept_tokens"),
          sum(when(!col("keep"), col("ptok")).otherwise(0L))
            .as("removed_tokens"),
          sum(when(col("keep"), col("i") + 1).otherwise(0L))
            .as("kept_checksum"))
        .orderBy("doc_id")
    }),

    // EXACT per-source token-count percentiles WITHOUT a global sort:
    // percentile_disc(p) = the smallest value whose cumulative doc
    // count reaches p·N, computed at HISTOGRAM level. Per-doc token
    // counts reduce map-side to (source, n_tok) cells; each source's
    // histogram — bounded by its DISTINCT lengths, not its doc count
    // — cumulates in a per-source window; the three thresholds read
    // off with all-integer comparisons (2·cum ≥ N ⇔ cum ≥ N/2, no
    // doubles, no ceil). The corpus is never sorted; the only
    // corpus-sized exchange is the histogram reduce.
    "q166_token_percentiles" -> ((s, dir) => {
      val wS = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_tok"))
      val h = graft.Caches.cached(
        Tables.fanOut(Tables.documents(s, dir))
          .select(col("source"), size(wsToks).cast("long").as("n_tok"))
          .groupBy("source", "n_tok").agg(count(lit(1)).as("c")))
      val tot = h.groupBy("source").agg(sum(col("c")).as("n_docs"))
      h.withColumn("cum", sum(col("c")).over(wS))
        .join(tot, "source")
        .groupBy("source")
        .agg(max(col("n_docs")).as("n_docs"),
          min(when(col("cum") * 2 >= col("n_docs"), col("n_tok"))).as("p50"),
          min(when(col("cum") * 10 >= col("n_docs") * 9, col("n_tok")))
            .as("p90"),
          min(when(col("cum") * 100 >= col("n_docs") * 99, col("n_tok")))
            .as("p99"),
          max(col("n_tok")).as("max_tok"))
        .orderBy("source")
    }),

    // WINSORIZED robust statistics — the outlier-clamped per-source
    // length profile a mixture designer trusts over raw means (one
    // pathological megadoc can't move it): exact p05/p95 come from
    // q166's histogram-cumulation trick, then the clamp REAPPLIES at
    // histogram level too — sum over cells of c·clamp(n_tok, p05,
    // p95) — so neither pass touches per-doc rows after the first
    // reduce. The threshold table is sources-sized and broadcast;
    // wins_mean_milli is fixed-point all-integer.
    "q167_winsorized_stats" -> ((s, dir) => {
      val wS = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_tok"))
      val h = graft.Caches.cached(
        Tables.fanOut(Tables.documents(s, dir))
          .select(col("source"), size(wsToks).cast("long").as("n_tok"))
          .groupBy("source", "n_tok").agg(count(lit(1)).as("c")))
      val tot = h.groupBy("source").agg(sum(col("c")).as("n_docs"))
      val th = h.withColumn("cum", sum(col("c")).over(wS))
        .join(tot, "source")
        .groupBy("source")
        .agg(max(col("n_docs")).as("n_docs"),
          min(when(col("cum") * 20 >= col("n_docs"), col("n_tok"))).as("p05"),
          min(when(col("cum") * 20 >= col("n_docs") * 19, col("n_tok")))
            .as("p95"))
      h.join(broadcast(th), "source")
        .groupBy("source")
        .agg(max(col("n_docs")).as("n_docs"),
          max(col("p05")).as("p05"), max(col("p95")).as("p95"),
          sum(col("c") * greatest(least(col("n_tok"), col("p95")),
            col("p05"))).as("wins_sum"),
          sum(when(col("n_tok") < col("p05"), col("c")).otherwise(0L))
            .as("n_lo"),
          sum(when(col("n_tok") > col("p95"), col("c")).otherwise(0L))
            .as("n_hi"))
        .withColumn("wins_mean_milli", expr("(wins_sum * 1000) DIV n_docs"))
        .orderBy("source")
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

    // DELETE-PROPAGATION AUDIT — the right-to-be-forgotten cascade a
    // production corpus must prove: a deterministic delete list (the
    // md5 'f' bucket, 1/16 of docs) propagates through three derived
    // stores and each store's accounting is emitted. The fingerprint
    // store carries the real subtlety: a dedup-signature entry
    // SURVIVES the deletion of its canonical owner when another
    // holder of the same fingerprint remains — it is RE-OWNED, not
    // dropped (dropping it would let a future duplicate of a
    // surviving doc slip past admission). Scale shape: three
    // independent map-side-combined aggregates; the fingerprint
    // reduce keys on fp (conditional min reassigns ownership in the
    // same pass — no second scan, no join); output is 3 rows.
    "q176_delete_propagation" -> ((s, dir) => {
      val docs = graft.Caches.cached(Tables.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), wsToks.as("toks"))
        .withColumn("del",
          substring(md5(col("doc_id").cast("string")), 1, 1) === "f"))
      def acct(df: org.apache.spark.sql.DataFrame, name: String) =
        df.agg(count(lit(1)).as("b"),
          sum(when(!col("del"), 1L).otherwise(0L)).as("a"))
          .select(lit(name).as("store"), col("b").as("rows_before"),
            col("a").as("rows_after"),
            (col("b") - col("a")).as("rows_deleted"),
            lit(0L).as("rows_reowned"))
      val dStats = acct(docs, "docs")
      val pStats = acct(docs
        .select(col("doc_id"), col("del"), explode(col("toks")).as("w"))
        .distinct(), "postings")
      val fStats = docs
        .select(col("del"), col("doc_id"),
          md5(concat_ws(" ", array_sort(array_distinct(col("toks")))))
            .as("fp"))
        .groupBy("fp")
        .agg(min(col("doc_id")).as("owner_b"),
          sum(when(!col("del"), 1L).otherwise(0L)).as("survivors"),
          min(when(!col("del"), col("doc_id"))).as("owner_a"))
        .agg(count(lit(1)).as("b"),
          sum(when(col("survivors") > 0, 1L).otherwise(0L)).as("a"),
          sum(when(col("survivors") > 0 && col("owner_a") =!= col("owner_b"),
            1L).otherwise(0L)).as("ro"))
        .select(lit("fingerprints").as("store"), col("b").as("rows_before"),
          col("a").as("rows_after"),
          (col("b") - col("a")).as("rows_deleted"),
          col("ro").as("rows_reowned"))
      dStats.union(pStats).union(fStats).orderBy("store")
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

  /** q92's ranked-retrieval oracle — a full rebuild over the corpus.
    * Shared verbatim by q150, whose Spark side serves from MERGED
    * stored+batch index state: one oracle string, two proof targets. */
  private val bm25TopkOracleSql: String =
    """WITH q(query_id, token) AS (
           VALUES (1, 'hash'), (1, 'join'), (2, 'window'), (2, 'agg'),
                  (3, 'stream'), (3, 'batch'), (4, 'vector'), (4, 'scan'),
                  (5, 'customer'), (5, 'query')),
         d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
         t AS (SELECT doc_id, unnest(toks) AS token FROM d),
         tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
         stats AS (
           SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
           FROM dl),
         scored AS (
           SELECT q.query_id, tf.doc_id,
             CAST(floor(
               ((CAST(s.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) /
                  (CAST(df.df AS DOUBLE) + 0.5)) *
               ((CAST(tf.tf AS DOUBLE) * 2.2) /
                  (CAST(tf.tf AS DOUBLE) +
                   1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / s.avgdl)))) *
               1e6) AS BIGINT) AS ts
           FROM tf JOIN q ON q.token = tf.token
                JOIN df ON df.token = tf.token
                JOIN dl ON dl.doc_id = tf.doc_id
                CROSS JOIN stats s),
         agg AS (
           SELECT query_id, doc_id, SUM(ts) AS sts
           FROM scored GROUP BY 1, 2),
         rk AS (
           SELECT query_id, doc_id, sts,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sts DESC, doc_id ASC) AS rank
           FROM agg)
         SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
           doc_id, CAST(sts AS DOUBLE) / 1e6 AS score
         FROM rk WHERE rank <= 3 ORDER BY query_id, rank"""

  /** Shared CTE prefix for the q113/q126 surprisal oracles: mirrors
    * surprisalPerDoc granule for granule, ending at `p` =
    * (doc_id, n_tok, score). */
  private val surprisalCteSql: String =
    """WITH d AS (
         SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
         FROM documents),
       u AS (SELECT doc_id, unnest(toks) AS w FROM d),
       voc AS (SELECT w, COUNT(*) AS c FROM u GROUP BY 1),
       tot AS (SELECT COUNT(*) AS n FROM u),
       sc AS (
         SELECT u.doc_id, (tot.n * 256) // voc.c AS r
         FROM u JOIN voc ON voc.w = u.w CROSS JOIN tot),
       sb AS (SELECT doc_id, r, length(bin(r)) - 1 AS k FROM sc),
       st AS (
         SELECT doc_id, COUNT(*) AS n_tok,
           SUM((k - 8) * 512 +
               ((r - (CAST(1 AS BIGINT) << k)) * 512)
                 // (CAST(1 AS BIGINT) << k)) AS bits
         FROM sb GROUP BY 1),
       p AS (
         SELECT doc_id, n_tok,
           CAST(bits AS BIGINT) // n_tok AS score
         FROM st)"""

  val oracles: Map[String, String] = Map(
    "q30_lang_id" ->
      s"""SELECT doc_id, lang, $langIdSql AS pred_lang
          FROM documents WHERE doc_id < 200 ORDER BY doc_id""",
    "q31_lang_distribution" ->
      s"""SELECT lang, $langIdSql AS pred_lang, COUNT(*) AS n
          FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    "q32_quality_score" ->
      s"""SELECT doc_id, CAST(length(text) AS INT) AS n_chars_obs,
          CAST(len(str_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
          CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / len(str_split_regex(trim(text), '\\s+')) AS avg_token_len,
          CAST(len(list_filter(str_split_regex(trim(text), '\\s+'),
                               t -> t IN ($stopList))) AS DOUBLE)
            / len(str_split_regex(trim(text), '\\s+')) AS stopword_ratio,
          0.4 * (CAST(len(list_filter(str_split_regex(trim(text), '\\s+'),
                                      t -> t IN ($stopList))) AS DOUBLE)
                 / len(str_split_regex(trim(text), '\\s+')))
          + 0.3 * least((CAST(length(replace(text, ' ', '')) AS DOUBLE)
                         / len(str_split_regex(trim(text), '\\s+'))) / 10.0, 1.0)
          + 0.3 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS quality
          FROM documents WHERE doc_id < 200 ORDER BY doc_id""",
    "q33_token_count" ->
      """SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(str_split_regex(trim(text), '\s+'))) AS BIGINT) AS ws_tokens,
         CAST(SUM(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) AS re_tokens,
         CAST(SUM(len(regexp_extract_all(lower(text),
           '''(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9\s]+'))) AS BIGINT) AS bpe_tokens,
         CAST(SUM(length(text)) AS BIGINT) AS total_chars
         FROM documents GROUP BY source ORDER BY source""",
    "q34_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    "q35_exact_dedup" ->
      """SELECT source, COUNT(*) AS n_docs,
         COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_distinct
         FROM documents GROUP BY source ORDER BY source""",
    "q63_chunking" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE doc_id < 100),
         c AS (
           SELECT doc_id, toks,
             unnest(generate_series(0,
               GREATEST(CAST(ceil(CAST(len(toks) - 50 AS DOUBLE) / 40.0) AS INT), 0)))
               AS chunk_id
           FROM d)
         SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(len(toks[(chunk_id * 40 + 1):(chunk_id * 40 + 50)]) AS INT) AS n_chunk_tokens,
           md5(array_to_string(toks[(chunk_id * 40 + 1):(chunk_id * 40 + 50)], ' '))
             AS chunk_fp
         FROM c ORDER BY doc_id, chunk_id""",
    "q60_hash_sample" ->
      """SELECT source, COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
         FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'
         GROUP BY source ORDER BY source""",
    "q57_curation_pipeline" ->
      s"""WITH scored AS (
            SELECT doc_id, source, text,
              md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
              $langIdSql AS pred_lang,
              CAST(len(list_filter(str_split_regex(trim(text), '\\s+'),
                                   t -> t IN ($stopList))) AS DOUBLE)
                / len(str_split_regex(trim(text), '\\s+')) AS stop_ratio
            FROM documents),
          filtered AS (
            SELECT * FROM scored WHERE length(text) >= 100 AND stop_ratio >= 0.05),
          kept AS (
            SELECT * FROM (
              SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
              FROM filtered) WHERE rn = 1)
          SELECT pred_lang, source, COUNT(*) AS n_docs,
                 CAST(SUM(length(text)) AS BIGINT) AS total_chars
          FROM kept GROUP BY 1, 2 ORDER BY 1, 2""",
    "q66_decontaminate" ->
      """WITH d AS (
           SELECT doc_id, source, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         g AS (
           SELECT doc_id, source, toks,
             unnest(generate_series(1, len(toks) - 12)) AS i
           FROM d WHERE len(toks) >= 13),
         grams AS (
           SELECT doc_id, source,
             md5(array_to_string(toks[CAST(i AS INT):CAST(i + 12 AS INT)], ' ')) AS gram
           FROM g),
         bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0),
         contaminated AS (
           SELECT DISTINCT doc_id, source FROM grams
           WHERE doc_id % 20 <> 0 AND gram IN (SELECT gram FROM bench)),
         base AS (
           SELECT source, COUNT(*) AS n_docs FROM documents
           WHERE doc_id % 20 <> 0 GROUP BY source),
         cont AS (
           SELECT source, COUNT(*) AS n_contaminated FROM contaminated GROUP BY source)
         SELECT base.source, n_docs,
           COALESCE(n_contaminated, 0) AS n_contaminated,
           n_docs - COALESCE(n_contaminated, 0) AS n_clean
         FROM base LEFT JOIN cont USING (source) ORDER BY source""",
    // q66's gram CTEs + position-level hit counts + fixed-point
    // fraction buckets (clean requires EXACTLY zero hits)
    "q139_contamination_report" ->
      """WITH d AS (
           SELECT doc_id, source, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         g AS (
           SELECT doc_id, source, toks,
             unnest(generate_series(1, len(toks) - 12)) AS i
           FROM d WHERE len(toks) >= 13),
         grams AS (
           SELECT doc_id, source,
             md5(array_to_string(toks[CAST(i AS INT):CAST(i + 12 AS INT)], ' ')) AS gram
           FROM g),
         bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0),
         corpus AS (SELECT * FROM grams WHERE doc_id % 20 <> 0),
         hits AS (
           SELECT doc_id, COUNT(*) AS n_hit FROM corpus
           WHERE gram IN (SELECT gram FROM bench) GROUP BY doc_id),
         per AS (
           SELECT c.doc_id, c.source, COUNT(*) AS n_grams,
             COALESCE(ANY_VALUE(h.n_hit), 0) AS n_hit
           FROM corpus c LEFT JOIN hits h ON h.doc_id = c.doc_id
           GROUP BY c.doc_id, c.source),
         b AS (
           SELECT source, n_grams, n_hit,
             CASE WHEN n_hit = 0 THEN '0_clean'
                  WHEN (n_hit * 1000) // n_grams < 10 THEN '1_trace'
                  WHEN (n_hit * 1000) // n_grams < 100 THEN '2_light'
                  ELSE '3_heavy' END AS bucket
           FROM per)
         SELECT source, bucket, COUNT(*) AS n_docs,
           CAST(SUM(n_grams) AS BIGINT) AS n_grams,
           CAST(SUM(n_hit) AS BIGINT) AS n_hits
         FROM b GROUP BY source, bucket ORDER BY source, bucket""",
    "q67_repetition" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE doc_id < 200),
         b AS (
           SELECT doc_id, toks,
             unnest(generate_series(1, len(toks) - 1)) AS i
           FROM d WHERE len(toks) >= 2),
         bg AS (
           SELECT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 1 AS INT)], ' ') AS bigram
           FROM b),
         c AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
         p AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bigrams FROM c GROUP BY 1)
         SELECT d.doc_id, CAST(len(toks) AS INT) AS n_tokens,
           CAST(1 AS DOUBLE) - CAST(len(list_distinct(toks)) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) AS dup_token_frac,
           CAST(top_c AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS top_bigram_frac
         FROM d JOIN p USING (doc_id) ORDER BY doc_id""",
    "q68_top_terms" ->
      """WITH t AS (
           SELECT source, unnest(str_split_regex(trim(text), '\s+')) AS token
           FROM documents),
         c AS (SELECT source, token, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
         r AS (
           SELECT source, token, cnt,
             row_number() OVER (PARTITION BY source ORDER BY cnt DESC, token ASC)
               AS rank
           FROM c)
         SELECT source, CAST(rank AS INT) AS rank, token, cnt
         FROM r WHERE rank <= 5 ORDER BY source, rank""",
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
    // per-gram first owner = MIN(doc_id) over the gram's posting; a
    // doc's novel grams are those it owns; ppm is integer fixed point
    "q151_novelty_profile" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         g AS (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 7)) AS i
               FROM d WHERE len(toks) >= 8),
         grams AS (
           SELECT DISTINCT doc_id,
             md5(array_to_string(toks[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS gram
           FROM g),
         per_doc AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY 1),
         novel AS (
           SELECT first_doc AS doc_id, COUNT(*) AS n_novel
           FROM (SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY 1)
           GROUP BY 1)
         SELECT dd.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_grams) AS BIGINT) AS total_grams,
           CAST(SUM(COALESCE(v.n_novel, 0)) AS BIGINT) AS novel_grams,
           (CAST(SUM(COALESCE(v.n_novel, 0)) AS BIGINT) * 1000000)
             // CAST(SUM(p.n_grams) AS BIGINT) AS novelty_ppm
         FROM per_doc p LEFT JOIN novel v USING (doc_id)
              JOIN documents dd USING (doc_id)
         GROUP BY 1 ORDER BY 1""",
    // distinct (source, gram) sets self-joined on gram (fan-out ≤
    // C(|sources|,2) per gram); Jaccard over the union in ppm
    "q152_source_overlap" ->
      """WITH d AS (
           SELECT source, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         g AS (SELECT source, toks,
                 unnest(generate_series(1, len(toks) - 7)) AS i
               FROM d WHERE len(toks) >= 8),
         sg AS (
           SELECT DISTINCT source,
             md5(array_to_string(toks[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS gram
           FROM g),
         tot AS (SELECT source, COUNT(*) AS n_grams FROM sg GROUP BY 1),
         sh AS (
           SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS shared_grams
           FROM sg a JOIN sg b ON a.gram = b.gram AND a.source < b.source
           GROUP BY 1, 2)
         SELECT source_a, source_b, shared_grams,
           (shared_grams * 1000000)
             // (ta.n_grams + tb.n_grams - shared_grams) AS jaccard_ppm
         FROM sh JOIN tot ta ON ta.source = source_a
                 JOIN tot tb ON tb.source = source_b
         ORDER BY source_a, source_b""",
    // per-token first document bucketed against 8 max(doc_id)-derived
    // thresholds; cumulative counts from one conditional aggregate
    "q153_vocab_growth" ->
      """WITH t AS (
           SELECT doc_id, unnest(str_split_regex(trim(text), '\s+')) AS w
           FROM documents),
         f AS (SELECT w, MIN(doc_id) AS first_doc FROM t GROUP BY 1),
         m AS (SELECT MAX(doc_id) AS mx FROM documents),
         ks AS (SELECT unnest(generate_series(1, 8)) AS k),
         c AS (
           SELECT k, CAST(SUM(CASE WHEN f.first_doc <= (m.mx * k) // 8
                                   THEN 1 ELSE 0 END) AS BIGINT) AS cum
           FROM f CROSS JOIN m CROSS JOIN ks GROUP BY 1)
         SELECT CAST(k AS BIGINT) AS octile, cum AS cum_vocab,
           cum - COALESCE(lag(cum) OVER (ORDER BY k), 0) AS new_vocab
         FROM c ORDER BY octile""",
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
    // bag-of-words identity clusters (q73/q80's fp), keeper = MIN
    // doc_id; dropped duplicates' tokens attributed per source pair
    "q160_dedup_attribution" ->
      """WITH d AS (
           SELECT doc_id, source,
             str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         f AS (
           SELECT doc_id, source,
             CAST(len(toks) AS BIGINT) AS n_tok,
             md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
           FROM d),
         k AS (SELECT fp, MIN(doc_id) AS keeper_id FROM f GROUP BY 1),
         dup AS (
           SELECT f.source AS dup_source, f.n_tok, k.keeper_id
           FROM f JOIN k USING (fp) WHERE f.doc_id <> k.keeper_id),
         att AS (
           SELECT kf.source AS keeper_source, dup.dup_source,
             COUNT(*) AS n_dup_docs, CAST(SUM(dup.n_tok) AS BIGINT) AS tokens_saved
           FROM dup JOIN f kf ON kf.doc_id = dup.keeper_id
           GROUP BY 1, 2)
         SELECT keeper_source, dup_source, n_dup_docs, tokens_saved
         FROM att ORDER BY keeper_source, dup_source""",
    // q31's confusion CTE rolled to per-class support/predicted/
    // correct; ppm rates NULLIF-guarded like the Spark spelling
    "q161_langid_prf" ->
      s"""WITH cm AS (
           SELECT lang, $langIdSql AS pred_lang, COUNT(*) AS n
           FROM documents GROUP BY 1, 2),
         sup AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS support
                 FROM cm GROUP BY 1),
         pred AS (SELECT pred_lang AS lang, CAST(SUM(n) AS BIGINT) AS predicted
                  FROM cm GROUP BY 1),
         cor AS (SELECT lang, CAST(n AS BIGINT) AS correct
                 FROM cm WHERE lang = pred_lang),
         j AS (
           SELECT COALESCE(s.lang, p.lang) AS lang,
             COALESCE(s.support, 0) AS support,
             COALESCE(p.predicted, 0) AS predicted
           FROM sup s FULL JOIN pred p ON p.lang = s.lang)
         SELECT j.lang, j.support, j.predicted,
           COALESCE(c.correct, 0) AS correct,
           (COALESCE(c.correct, 0) * 1000000) // NULLIF(j.support, 0)
             AS recall_ppm,
           (COALESCE(c.correct, 0) * 1000000) // NULLIF(j.predicted, 0)
             AS precision_ppm
         FROM j LEFT JOIN cor c ON c.lang = j.lang
         ORDER BY j.lang""",
    // the q151/q158/q160 CTE blocks composed into one per-source
    // report; LEFT JOINs keep sources that lack a component defined
    "q162_corpus_health" ->
      """WITH d0 AS (
           SELECT doc_id, source,
             str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         base AS (
           SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(toks)) AS BIGINT) AS total_tokens
           FROM d0 GROUP BY 1),
         f AS (
           SELECT doc_id, source,
             md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
           FROM d0),
         kk AS (SELECT fp, MIN(doc_id) AS keeper_id FROM f GROUP BY 1),
         dups AS (
           SELECT f.source, COUNT(*) AS dup_docs
           FROM f JOIN kk USING (fp) WHERE f.doc_id <> kk.keeper_id
           GROUP BY 1),
         g AS (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 7)) AS i
               FROM d0 WHERE len(toks) >= 8),
         grams AS (
           SELECT DISTINCT doc_id,
             md5(array_to_string(toks[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS gram
           FROM g),
         per_doc AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY 1),
         novel AS (
           SELECT first_doc AS doc_id, COUNT(*) AS n_novel
           FROM (SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY 1)
           GROUP BY 1),
         nv AS (
           SELECT dd.source,
             (CAST(SUM(COALESCE(v.n_novel, 0)) AS BIGINT) * 1000000)
               // CAST(SUM(p.n_grams) AS BIGINT) AS novelty_ppm
           FROM per_doc p LEFT JOIN novel v USING (doc_id)
                JOIN documents dd USING (doc_id)
           GROUP BY 1),
         b AS (
           SELECT source,
             CAST(length(bin(CAST(len(toks) AS BIGINT) + 1)) - 1 AS INT) AS band,
             (substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '2') AS is_new
           FROM d0),
         counts AS (
           SELECT source, band,
             CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS c_old,
             CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS c_new
           FROM b GROUP BY 1, 2),
         tots AS (
           SELECT source,
             CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS t_old,
             CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS t_new
           FROM b GROUP BY 1),
         j AS (
           SELECT c.source,
             abs((c.c_old * 1000000) // t.t_old
               - (c.c_new * 1000000) // t.t_new) AS d
           FROM counts c JOIN tots t USING (source)
           WHERE t.t_old > 0 AND t.t_new > 0),
         drift AS (
           SELECT source, CAST(SUM(d) AS BIGINT) // 2 AS drift_tv_ppm
           FROM j GROUP BY 1)
         SELECT base.source, base.n_docs, base.total_tokens,
           COALESCE(dups.dup_docs, 0) AS dup_docs,
           (COALESCE(dups.dup_docs, 0) * 1000000) // base.n_docs AS dup_rate_ppm,
           nv.novelty_ppm, drift.drift_tv_ppm
         FROM base LEFT JOIN dups USING (source)
              LEFT JOIN nv USING (source)
              LEFT JOIN drift USING (source)
         ORDER BY base.source""",
    // stored-vs-batch ppm shares per power-of-two length band; TV =
    // floor(Σ|p−q| / 2); worst band via (d DESC, band ASC) rank —
    // mirrors Spark's max_by struct key
    "q158_length_drift" ->
      """WITH d AS (
           SELECT doc_id, source,
             CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
           FROM documents),
         b AS (
           SELECT source, CAST(length(bin(n_tok + 1)) - 1 AS INT) AS band,
             (substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '2') AS is_new
           FROM d),
         counts AS (
           SELECT source, band,
             CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS c_old,
             CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS c_new
           FROM b GROUP BY 1, 2),
         tots AS (
           SELECT source,
             CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS t_old,
             CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS t_new
           FROM b GROUP BY 1),
         j AS (
           SELECT c.source, c.band, t.t_old, t.t_new,
             abs((c.c_old * 1000000) // t.t_old
               - (c.c_new * 1000000) // t.t_new) AS d
           FROM counts c JOIN tots t USING (source)
           WHERE t.t_old > 0 AND t.t_new > 0),
         agg AS (
           SELECT source, MAX(t_old) AS n_stored, MAX(t_new) AS n_batch,
             CAST(SUM(d) AS BIGINT) // 2 AS tv_ppm
           FROM j GROUP BY 1),
         worst AS (
           SELECT source, band AS worst_band, d AS worst_band_d_ppm,
             row_number() OVER (PARTITION BY source
               ORDER BY d DESC, band ASC) AS rn
           FROM j)
         SELECT a.source, a.n_stored, a.n_batch, a.tv_ppm,
           w.worst_band, w.worst_band_d_ppm
         FROM agg a JOIN worst w ON w.source = a.source AND w.rn = 1
         ORDER BY a.source""",
    // token types + occurrence mass per power-of-two frequency band;
    // band = floor(log2 f) via the bin()-length spelling (q113's)
    "q156_token_spectrum" ->
      """WITH t AS (
           SELECT unnest(str_split_regex(trim(text), '\s+')) AS w
           FROM documents),
         tf AS (SELECT w, COUNT(*) AS f FROM t GROUP BY 1)
         SELECT CAST(length(bin(f)) - 1 AS INT) AS band,
           COUNT(*) AS n_types, CAST(SUM(f) AS BIGINT) AS n_occurrences
         FROM tf GROUP BY 1 ORDER BY band""",
    "q72_dup_spans" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         d8 AS (SELECT * FROM d WHERE len(toks) >= 8),
         g AS (
           SELECT doc_id, toks,
             unnest(generate_series(1, len(toks) - 7)) AS i
           FROM d8),
         grams AS (
           SELECT doc_id,
             md5(array_to_string(toks[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS gram
           FROM g),
         shared AS (
           SELECT gram FROM (
             SELECT gram, COUNT(DISTINCT doc_id) AS c FROM grams GROUP BY 1)
           WHERE c >= 2),
         per AS (
           SELECT doc_id, COUNT(*) AS n_dup_pos FROM grams
           WHERE gram IN (SELECT gram FROM shared) GROUP BY 1)
         SELECT d8.doc_id, CAST(len(toks) - 7 AS BIGINT) AS n_pos,
           COALESCE(n_dup_pos, 0) AS n_dup_pos,
           CAST(COALESCE(n_dup_pos, 0) AS DOUBLE)
             / CAST(len(toks) - 7 AS DOUBLE) AS dup_span_frac
         FROM d8 LEFT JOIN per USING (doc_id) ORDER BY doc_id""",
    "q73_incremental_dedup" ->
      """WITH all_d AS (
           SELECT doc_id, source,
             md5(array_to_string(list_sort(list_distinct(
               str_split_regex(trim(text), '\s+'))), ' ')) AS fp,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
           FROM documents),
         corpus AS (SELECT DISTINCT fp FROM all_d
                    WHERE h NOT IN ('0', '1', '2', '3')),
         batch AS (SELECT * FROM all_d WHERE h IN ('0', '1', '2', '3')),
         vs AS (SELECT * FROM batch
                WHERE fp NOT IN (SELECT fp FROM corpus)),
         firsts AS (SELECT fp, MIN(doc_id) AS keep_id FROM vs GROUP BY 1),
         kept AS (SELECT vs.* FROM vs JOIN firsts
                  ON vs.fp = firsts.fp AND vs.doc_id = firsts.keep_id),
         base AS (SELECT source, COUNT(*) AS n_batch FROM batch GROUP BY 1),
         k AS (SELECT source, COUNT(*) AS n_admitted FROM kept GROUP BY 1)
         SELECT base.source, n_batch,
           COALESCE(n_admitted, 0) AS n_admitted,
           n_batch - COALESCE(n_admitted, 0) AS n_rejected
         FROM base LEFT JOIN k USING (source) ORDER BY source""",
    "q74_stratified_sample" ->
      """SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN lang <> 'en'
                    OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4ccc'
               THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         FROM documents GROUP BY lang ORDER BY lang""",
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
    "q78_containment" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE doc_id < 300),
         d3 AS (SELECT * FROM d WHERE len(toks) >= 3),
         g AS (
           SELECT doc_id, toks,
             unnest(generate_series(1, len(toks) - 2)) AS i
           FROM d3),
         sh AS (
           SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 2 AS INT)], ' ') AS g
           FROM g),
         sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
         inter AS (
           SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS inter
           FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id <> y.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id,
           CAST(inter AS DOUBLE) / CAST(n_sh AS DOUBLE) AS containment
         FROM inter JOIN sizes ON sizes.doc_id = a_id
         WHERE CAST(inter AS DOUBLE) / CAST(n_sh AS DOUBLE) >= 0.5
         ORDER BY a_id, b_id""",
    "q80_curation_funnel" ->
      s"""WITH d AS (
           SELECT doc_id, source, str_split_regex(trim(text), '\\s+') AS toks
           FROM documents),
         feat AS (
           SELECT doc_id, source,
             len(toks) AS n_tok,
             1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS dup_frac,
             CAST(len(list_filter(toks, t -> t IN ($stopList))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS stop_ratio,
             md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
           FROM d),
         r AS (
           SELECT *,
             SUM(CASE WHEN n_tok >= 30 AND dup_frac <= 0.70
                       AND stop_ratio >= 0.02 THEN 1 ELSE 0 END)
               OVER (PARTITION BY fp ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rn
           FROM feat),
         reasoned AS (
           SELECT source,
             CASE WHEN n_tok < 30 THEN 'short'
                  WHEN dup_frac > 0.70 THEN 'repetitive'
                  WHEN stop_ratio < 0.02 THEN 'low_quality'
                  WHEN rn > 1 THEN 'duplicate'
                  ELSE 'kept' END AS reason
           FROM r)
         SELECT source, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN reason = 'short' THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
           CAST(SUM(CASE WHEN reason = 'repetitive' THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
           CAST(SUM(CASE WHEN reason = 'low_quality' THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
           CAST(SUM(CASE WHEN reason = 'duplicate' THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicate,
           CAST(SUM(CASE WHEN reason = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         FROM reasoned GROUP BY source ORDER BY source""",
    "q75_scrub_terms" ->
      """SELECT doc_id,
           CAST(len(list_filter(m, t -> t = '[MASKED]')) AS BIGINT) AS n_masked,
           md5(array_to_string(m, ' ')) AS clean_md5
         FROM (
           SELECT doc_id,
             list_transform(str_split_regex(trim(text), '\s+'),
               t -> CASE WHEN t IN ('customer', 'spark', 'vector')
                    THEN '[MASKED]' ELSE t END) AS m
           FROM documents WHERE doc_id < 300)
         ORDER BY doc_id""",
    "q89_regex_scrub" ->
      """SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, 'customer [a-z]+')) AS BIGINT) AS n_ids,
           md5(regexp_replace(
             regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}',
                            '[EMAIL]', 'g'),
             'customer [a-z]+', '[ID]', 'g')) AS clean_md5
         FROM documents WHERE doc_id < 300
         ORDER BY doc_id""",
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
    // line spelling mirrors Spark term for term: 8-token slices at
    // c*8+1 (1-based, tail-truncating on both engines), space-join,
    // df ≥ 3 over DISTINCT docs, order-preserving reassembly
    "q109_boilerplate_strip" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks,
             CAST((len(str_split_regex(trim(text), '\s+')) + 7) // 8 AS BIGINT)
               AS n_lines
           FROM documents),
         l AS (
           SELECT doc_id, toks,
             unnest(generate_series(0, n_lines - 1)) AS c
           FROM d),
         lines AS (
           SELECT doc_id, CAST(c AS BIGINT) AS c,
             array_to_string(toks[CAST(c*8+1 AS INT):CAST(c*8+8 AS INT)], ' ')
               AS line
           FROM l),
         boiler AS (
           SELECT line FROM (
             SELECT line, COUNT(DISTINCT doc_id) AS n_docs
             FROM lines GROUP BY 1)
           WHERE n_docs >= 3),
         reb AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(line, ' ' ORDER BY c) AS kept_text
           FROM lines
           WHERE line NOT IN (SELECT line FROM boiler)
           GROUP BY doc_id)
         SELECT d.doc_id, d.n_lines,
           d.n_lines - COALESCE(reb.n_kept, 0) AS n_removed,
           COALESCE(reb.kept_text, '') AS kept_text
         FROM d LEFT JOIN reb ON reb.doc_id = d.doc_id
         ORDER BY d.doc_id""",
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
    // surprisal CTEs + the en label join + eighth-bit score bands;
    // purity rates as ppm integer fixed point
    "q159_score_calibration" -> (surprisalCteSql +
      """, lab AS (
           SELECT p.doc_id, p.score,
             CASE WHEN d2.lang = 'en' THEN 1 ELSE 0 END AS pos
           FROM p JOIN documents d2 ON d2.doc_id = p.doc_id),
         h AS (
           SELECT score // 64 AS band,
             COUNT(*) AS n_docs, CAST(SUM(pos) AS BIGINT) AS n_pos
           FROM lab GROUP BY 1)
         SELECT band, n_docs, n_pos,
           (n_pos * 1000000) // n_docs AS pos_rate_ppm
         FROM h ORDER BY band"""),
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
    // island spelling mirrors Spark pass for pass: 1-based 8-token
    // slices, distinct-doc df >= 2, p − lag(p) > 8 island rule; the
    // island running SUM is cast to BIGINT (window-HUGEINT lesson)
    "q125_dup_span_manifest" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         d8 AS (SELECT * FROM d WHERE len(toks) >= 8),
         g AS (
           SELECT doc_id, toks,
             unnest(generate_series(1, len(toks) - 7)) AS p
           FROM d8),
         grams AS (
           SELECT doc_id, CAST(p AS BIGINT) AS p,
             array_to_string(toks[CAST(p AS INT):CAST(p + 7 AS INT)], ' ')
               AS gram
           FROM g),
         dup AS (
           SELECT gram FROM (
             SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY 1)
           WHERE nd >= 2),
         hits AS (
           SELECT doc_id, p FROM grams
           WHERE gram IN (SELECT gram FROM dup)),
         fl AS (
           SELECT doc_id, p,
             CASE WHEN lag(p) OVER w IS NULL OR p - lag(p) OVER w > 8
                  THEN 1 ELSE 0 END AS newi
           FROM hits
           WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
         isl AS (
           SELECT doc_id, p,
             CAST(SUM(newi) OVER (PARTITION BY doc_id ORDER BY p
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
           FROM fl)
         SELECT doc_id, island, MIN(p) AS span_start,
           MAX(p) + 8 AS span_end, COUNT(*) AS n_grams
         FROM isl GROUP BY 1, 2 ORDER BY doc_id, island""",
    // q125's dup machinery + coverage expansion + ordered reassembly
    // (string_agg ORDER BY t — the oracle twin of Spark's sorted
    // collect_list struct); 1-based token positions throughout
    "q136_dup_span_rewrite" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         d8 AS (SELECT doc_id, toks, len(toks) AS n FROM d
                WHERE len(toks) >= 8),
         g AS (
           SELECT doc_id, toks,
             unnest(generate_series(1, n - 7)) AS p
           FROM d8),
         grams AS (
           SELECT doc_id, CAST(p AS BIGINT) AS p,
             array_to_string(toks[CAST(p AS INT):CAST(p + 7 AS INT)], ' ')
               AS gram
           FROM g),
         dup AS (
           SELECT gram FROM (
             SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY 1)
           WHERE nd >= 2),
         hits AS (
           SELECT doc_id, p FROM grams
           WHERE gram IN (SELECT gram FROM dup)),
         cov AS (
           SELECT DISTINCT doc_id, t FROM (
             SELECT doc_id, unnest(generate_series(p, p + 7)) AS t FROM hits)),
         toks AS (
           SELECT doc_id, CAST(i AS BIGINT) AS t, toks[CAST(i AS INT)] AS tok
           FROM (SELECT doc_id, toks, unnest(generate_series(1, n)) AS i
                 FROM d8)),
         kept AS (
           SELECT k.doc_id, k.t, k.tok
           FROM toks k LEFT JOIN cov
             ON cov.doc_id = k.doc_id AND cov.t = k.t
           WHERE cov.t IS NULL),
         agg AS (
           SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(tok, ' ' ORDER BY t) AS rewritten
           FROM kept GROUP BY 1)
         SELECT d8.doc_id, CAST(n AS BIGINT) AS n_tok,
           COALESCE(a.n_kept, 0) AS n_kept,
           CAST(n AS BIGINT) - COALESCE(a.n_kept, 0) AS n_cut,
           COALESCE(a.rewritten, '') AS rewritten
         FROM d8 LEFT JOIN agg a ON a.doc_id = d8.doc_id
         ORDER BY d8.doc_id""",
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
    // row_number over (doc_id, tile) replays the min(struct) first-
    // occurrence pick; slice [a:b] is 1-based inclusive = Spark
    // slice(toks, a, 16)'s truncating window
    "q165_paragraph_dedup" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE length(trim(text)) > 0),
         t AS (
           SELECT doc_id, i,
             least(len(toks) - i * 16, 16) AS ptok,
             array_to_string(toks[(i*16+1):least(len(toks), i*16+16)], ' ')
               AS para
           FROM (SELECT doc_id, toks,
                   unnest(generate_series(0, (len(toks) - 1) // 16)) AS i
                 FROM d)),
         r AS (
           SELECT doc_id, i, ptok,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, i) AS rn
           FROM t)
         SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tiles,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_tiles,
           CAST(SUM(CASE WHEN rn = 1 THEN ptok ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           CAST(SUM(CASE WHEN rn > 1 THEN ptok ELSE 0 END) AS BIGINT)
             AS removed_tokens,
           CAST(SUM(CASE WHEN rn = 1 THEN i + 1 ELSE 0 END) AS BIGINT)
             AS kept_checksum
         FROM r GROUP BY doc_id ORDER BY doc_id""",
    // identical histogram-cumulation spelling; integer threshold
    // comparisons sidestep ceil/doubles on both engines
    "q166_token_percentiles" ->
      """WITH h AS (
           SELECT source,
             CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tok,
             COUNT(*) AS c
           FROM documents GROUP BY 1, 2),
         cum AS (
           SELECT source, n_tok, c,
             SUM(c) OVER (PARTITION BY source ORDER BY n_tok) AS cum
           FROM h),
         tot AS (
           SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs
           FROM h GROUP BY 1)
         SELECT source, n_docs,
           CAST(MIN(CASE WHEN cum * 2 >= n_docs THEN n_tok END) AS BIGINT)
             AS p50,
           CAST(MIN(CASE WHEN cum * 10 >= n_docs * 9 THEN n_tok END)
             AS BIGINT) AS p90,
           CAST(MIN(CASE WHEN cum * 100 >= n_docs * 99 THEN n_tok END)
             AS BIGINT) AS p99,
           CAST(MAX(n_tok) AS BIGINT) AS max_tok
         FROM cum JOIN tot USING (source)
         GROUP BY source, n_docs ORDER BY source""",
    "q167_winsorized_stats" ->
      """WITH h AS (
           SELECT source,
             CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tok,
             COUNT(*) AS c
           FROM documents GROUP BY 1, 2),
         cum AS (
           SELECT source, n_tok, c,
             SUM(c) OVER (PARTITION BY source ORDER BY n_tok) AS cum
           FROM h),
         tot AS (
           SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs
           FROM h GROUP BY 1),
         th AS (
           SELECT source, n_docs,
             CAST(MIN(CASE WHEN cum * 20 >= n_docs THEN n_tok END)
               AS BIGINT) AS p05,
             CAST(MIN(CASE WHEN cum * 20 >= n_docs * 19 THEN n_tok END)
               AS BIGINT) AS p95
           FROM cum JOIN tot USING (source)
           GROUP BY source, n_docs)
         SELECT h.source, th.n_docs, th.p05, th.p95,
           CAST(SUM(h.c * greatest(least(h.n_tok, th.p95), th.p05))
             AS BIGINT) AS wins_sum,
           CAST(SUM(CASE WHEN h.n_tok < th.p05 THEN h.c ELSE 0 END)
             AS BIGINT) AS n_lo,
           CAST(SUM(CASE WHEN h.n_tok > th.p95 THEN h.c ELSE 0 END)
             AS BIGINT) AS n_hi,
           CAST((SUM(h.c * greatest(least(h.n_tok, th.p95), th.p05)) * 1000)
             // th.n_docs AS BIGINT) AS wins_mean_milli
         FROM h JOIN th ON th.source = h.source
         GROUP BY h.source, th.n_docs, th.p05, th.p95
         ORDER BY h.source""",
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
    // the same md5-'f' delete bucket and q160 fingerprint spelling;
    // ownership reassignment is the conditional-min in one pass
    "q176_delete_propagation" ->
      """WITH d AS (
           SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'f' AS del
           FROM documents),
         ds AS (
           SELECT 'docs' AS store, COUNT(*) AS rows_before,
             CAST(SUM(CASE WHEN NOT del THEN 1 ELSE 0 END) AS BIGINT)
               AS rows_after
           FROM d),
         p AS (
           SELECT DISTINCT doc_id, del, t
           FROM (SELECT doc_id, del, unnest(toks) AS t FROM d)),
         ps AS (
           SELECT 'postings' AS store, COUNT(*) AS rows_before,
             CAST(SUM(CASE WHEN NOT del THEN 1 ELSE 0 END) AS BIGINT)
               AS rows_after
           FROM p),
         f AS (
           SELECT doc_id, del,
             md5(array_to_string(list_sort(list_distinct(toks)), ' '))
               AS fp
           FROM d),
         g AS (
           SELECT fp, MIN(doc_id) AS owner_b,
             SUM(CASE WHEN NOT del THEN 1 ELSE 0 END) AS survivors,
             MIN(CASE WHEN NOT del THEN doc_id END) AS owner_a
           FROM f GROUP BY 1),
         fs AS (
           SELECT 'fingerprints' AS store, COUNT(*) AS rows_before,
             CAST(SUM(CASE WHEN survivors > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS rows_after,
             CAST(SUM(CASE WHEN survivors > 0 AND owner_a <> owner_b
               THEN 1 ELSE 0 END) AS BIGINT) AS rows_reowned
           FROM g)
         SELECT store, rows_before, rows_after,
           rows_before - rows_after AS rows_deleted,
           CAST(0 AS BIGINT) AS rows_reowned FROM ds
         UNION ALL
         SELECT store, rows_before, rows_after,
           rows_before - rows_after, CAST(0 AS BIGINT) FROM ps
         UNION ALL
         SELECT store, rows_before, rows_after,
           rows_before - rows_after, rows_reowned FROM fs
         ORDER BY store""",
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
         ORDER BY key, k.source, k LIMIT 48""",
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
