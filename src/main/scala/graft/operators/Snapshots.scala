package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot lifecycle operators — the reference's heart (SURVEY.md §2.1):
  * set-difference diff (S13, scrape_tickers.py:586-591), fuzzy
  * rename-detection theta-join with deterministic greedy 1:1 matching
  * (S14, scrape_tickers.py:596-622), classified change log (S15,
  * scrape_tickers.py:517-571), sentinel-aware field-wise merge/upsert
  * (S16, update_ticker_info.py:83-211), update stats (S17,
  * update_ticker_info.py:98-105), latest-snapshot resolution (S12,
  * update_ticker_info.py:38-60).
  *
  * Scale notes: diffs are anti-joins that shuffle on the snapshot key
  * (hash-partitioned, no driver collection). Rename detection is the one
  * theta-join — the candidate space is (deleted × added), which is tiny
  * relative to the snapshots themselves (churn, not corpus). Greedy 1:1
  * selection is two window row_numbers over the candidates; the
  * reference's order-dependent greedy loop (scrape_tickers.py:605-622)
  * is replaced by an explicit deterministic order (SURVEY.md §7.4.1).
  */
object Snapshots {

  /** S13: rows of `cur` whose key is absent from `prev`. */
  def diffAdded(cur: DataFrame, prev: DataFrame, key: String): DataFrame =
    cur.join(prev.select(key), Seq(key), "left_anti")

  /** S13: rows of `prev` whose key is absent from `cur`. */
  def diffDeleted(cur: DataFrame, prev: DataFrame, key: String): DataFrame =
    prev.join(cur.select(key), Seq(key), "left_anti")

  /** Blocking keys for the rename candidate join: every contiguous
    * whitespace-token span of the name (single tokens included) longer
    * than 3 chars, de-duplicated. Why spans block the predicate's
    * TOKEN-ALIGNED match surface completely:
    *  - token branch, token-aligned: a >3-char token of old_name that is
    *    itself a whitespace-delimited token of new_name IS a shared
    *    single-token span on both sides;
    *  - containment branch, token-aligned: containment along token
    *    boundaries means the shorter full name equals one of the longer
    *    name's token spans, so the shorter name itself is the shared key.
    * Envelope (deliberate deviation from the quadratic reference scan,
    * encoded in BOTH the engine and the q11/q12 oracle SQL's cand CTE so
    * the two can never diverge on any data):
    *  - GLUED word-in-word matches — a token of one name occurring as a
    *    substring INSIDE a longer word of the other ('Steel' inside
    *    'PakSteelCo'), which the reference's instr() accepts — are not
    *    proposed;
    *  - containment of a ≤3-char name is not proposed.
    * At any realistic churn those are noise matches, and recovering them
    * exactly requires the O(D×A) scan this blocking exists to kill.
    * SnapshotsSpec pins the glued-word exclusion as intended behavior.
    * Span count is O(t²) in the token count t of one NAME (~4), not in
    * churn. */
  private def spanKeys(nameCol: Column): Column = {
    val toks = split(trim(nameCol), " +")
    val n = size(toks)
    array_distinct(filter(
      flatten(transform(sequence(lit(1), n),
        i => transform(sequence(i, n),
          j => array_join(slice(toks, i, (j - i) + 1), " ")))),
      s => length(s) > 3))
  }

  /** S14: blocked candidate generation + deterministic greedy 1:1.
    * Inputs must expose (old_symbol, old_name) / (new_symbol, new_name).
    *
    * Candidates come from an EQUI-JOIN on exploded name-span blocking
    * keys (see [[spanKeys]], incl. the documented token-aligned
    * envelope mirrored in the oracle SQL) — never a cross join, so pair
    * work scales with shared-vocabulary collisions, not churn². The full
    * reference predicate then re-verifies every candidate (blocking can
    * only drop pairs, never admit false ones). Greedy 1:1: the reference's
    * first-match-wins over Python set order is replaced by a
    * deterministic order — per old_symbol keep the lexicographically
    * smallest matching new_symbol, then per new_symbol the smallest
    * old_symbol. */
  def detectRenames(deleted: DataFrame, added: DataFrame): DataFrame = {
    // fanOut both sides: churn sets are byte-small, so upstream AQE
    // tends to leave them in 1-2 partitions — which would serialize the
    // per-candidate predicate evaluation on one core.
    val d = graft.Tables.fanOut(deleted)
      .select(col("old_symbol"), col("old_name"), explode(spanKeys(col("old_name"))).as("bk"))
    val a = graft.Tables.fanOut(added)
      .select(col("new_symbol"), col("new_name"), explode(spanKeys(col("new_name"))).as("bk"))
    val pairSimilar =
      expr("instr(new_name, old_name) > 0") ||
      expr("instr(old_name, new_name) > 0") ||
      (length(col("old_name")) > 10 && length(col("new_name")) > 10 &&
        expr("exists(filter(split(old_name, ' '), w -> length(w) > 3), " +
             "w -> instr(new_name, w) > 0)"))
    val cand = d.join(a, "bk").drop("bk")
      .distinct()            // a pair may share several spans — count once
      .filter(pairSimilar)
    val byOld = Window.partitionBy(col("old_symbol")).orderBy(col("new_symbol"))
    val byNew = Window.partitionBy(col("new_symbol")).orderBy(col("old_symbol"))
    cand
      .withColumn("rn_old", row_number().over(byOld))
      .filter(col("rn_old") === 1)
      .withColumn("rn_new", row_number().over(byNew))
      .filter(col("rn_new") === 1)
      .drop("rn_old", "rn_new")
  }

  /** S15: classified change log — ADDED/DELETED minus rename pairs,
    * RENAMED with both symbols. Rename exclusion is a left_anti join on
    * the (already-unique) snapshot keys — `except` would add a full
    * distinct shuffle on top of the same anti-join. */
  def changeLog(added: DataFrame, deleted: DataFrame, renamed: DataFrame): DataFrame = {
    val renOld = renamed.select(col("old_symbol").as("symbol"))
    val renNew = renamed.select(col("new_symbol").as("symbol"))
    added.select(col("new_symbol").as("symbol")).join(renNew, Seq("symbol"), "left_anti")
      .select(lit("ADDED").as("change_type"), col("symbol"), lit(null: String).as("new_symbol"))
      .unionByName(
        deleted.select(col("old_symbol").as("symbol")).join(renOld, Seq("symbol"), "left_anti")
          .select(lit("DELETED").as("change_type"), col("symbol"), lit(null: String).as("new_symbol")))
      .unionByName(
        renamed.select(lit("RENAMED").as("change_type"),
          col("old_symbol").as("symbol"), col("new_symbol")))
  }

  /** S16 sentinel-aware merge (update_ticker_info.py:170-181): fresh
    * values win only when present and meaningful. `old`/`fresh` share
    * schema (symbol, name, sector, url); fresh may be missing rows
    * (= fetch failure, keep original, update_ticker_info.py:205-209).
    *
    * The reference collapses details into a dict KEYED BY SYMBOL, so a
    * details source that yields the same symbol twice contributes ONE
    * row — a left join on a duplicated key would instead fan out
    * snapshot rows (r12 ADVICE). Collapse first via a deterministic
    * per-symbol max(struct(...)) — a map-side-combinable hash
    * aggregate, no window, layout-independent (dropDuplicates would
    * keep an arbitrary partition-order-dependent row). */
  def mergeUpsert(old: DataFrame, fresh: DataFrame): DataFrame = {
    val f = fresh.groupBy(col("symbol"))
      .agg(max(struct(col("name"), col("sector"), col("url"))).as("__f"))
      .select(col("symbol"), col("__f.name").as("f_name"),
        col("__f.sector").as("f_sector"), col("__f.url").as("f_url"),
        lit(1).as("f_present"))
    val nameOk = col("f_present").isNotNull && col("f_name").isNotNull &&
      col("f_name") =!= col("symbol") && col("f_name") =!= "No record found" &&
      col("f_name") =!= col("name")
    val sectorOk = col("f_present").isNotNull && col("f_sector").isNotNull &&
      col("f_sector") =!= "Unknown" && col("f_sector") =!= col("sector")
    val urlOk = col("f_present").isNotNull && col("f_url").isNotNull &&
      col("f_url") =!= "" && col("f_url") =!= col("url")
    old.join(f, Seq("symbol"), "left")
      .select(
        col("symbol"),
        when(nameOk, col("f_name")).otherwise(col("name")).as("name"),
        when(sectorOk, col("f_sector")).otherwise(col("sector")).as("sector"),
        when(urlOk, col("f_url")).otherwise(col("url")).as("url"),
        nameOk.cast("int").as("name_updated"),
        sectorOk.cast("int").as("sector_updated"),
        urlOk.cast("int").as("url_updated"),
        col("f_present").isNull.cast("int").as("failed"))
  }

  /** S12: latest row per key by (version, tieBreak) — window top-1. */
  def latestSnapshot(df: DataFrame, key: Column, version: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(version.desc, tieBreak.desc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  // --------------------------------------------------------------------
  // Ticker-generation synthesis (FIXTURES.md §B mapping): two snapshot
  // generations derived deterministically from `customer` so every
  // diff/rename/merge query stays DuckDB-oracle-expressible.
  //   mod 10 = 3 → pure add (G2 only)        mod 10 = 4 → pure delete
  //   mod 10 = 5 → rename, substring branch  mod 10 = 6 → rename, token branch
  // --------------------------------------------------------------------
  def generations(s: org.apache.spark.sql.SparkSession, dir: String): (DataFrame, DataFrame) = {
    val c = Tables.customer(s, dir).select("c_custkey", "c_name", "c_mktsegment")
    val m = col("c_custkey") % 10
    val sym = concat(lit("T"), col("c_custkey").cast("string"))
    val g1 = c.filter(m =!= 3).select(
      sym.as("symbol"),
      when(m === 6, concat(col("c_name"), lit(" HOLDINGS"))).otherwise(col("c_name")).as("name"),
      col("c_mktsegment").as("sector"))
    val g2 = c.filter(m =!= 4).select(
      when(m === 5, concat(sym, lit("X")))
        .when(m === 6, concat(sym, lit("Y"))).otherwise(sym).as("symbol"),
      when(m === 5, concat(col("c_name"), lit(" LIMITED")))
        .when(m === 6, concat(lit("GROUP "), col("c_name"))).otherwise(col("c_name")).as("name"),
      col("c_mktsegment").as("sector"))
    (g1, g2)
  }

  /** Shared oracle CTEs mirroring [[generations]] exactly. */
  val genSql: String =
    """WITH g1 AS (
         SELECT 'T' || CAST(c_custkey AS VARCHAR) AS symbol,
                CASE WHEN c_custkey % 10 = 6 THEN c_name || ' HOLDINGS' ELSE c_name END AS name,
                c_mktsegment AS sector
         FROM customer WHERE c_custkey % 10 <> 3),
       g2 AS (
         SELECT CASE WHEN c_custkey % 10 = 5 THEN 'T' || CAST(c_custkey AS VARCHAR) || 'X'
                     WHEN c_custkey % 10 = 6 THEN 'T' || CAST(c_custkey AS VARCHAR) || 'Y'
                     ELSE 'T' || CAST(c_custkey AS VARCHAR) END AS symbol,
                CASE WHEN c_custkey % 10 = 5 THEN c_name || ' LIMITED'
                     WHEN c_custkey % 10 = 6 THEN 'GROUP ' || c_name
                     ELSE c_name END AS name,
                c_mktsegment AS sector
         FROM customer WHERE c_custkey % 10 <> 4),
       added AS (
         SELECT symbol AS new_symbol, name AS new_name FROM g2
         WHERE symbol NOT IN (SELECT symbol FROM g1)),
       deleted AS (
         SELECT symbol AS old_symbol, name AS old_name FROM g1
         WHERE symbol NOT IN (SELECT symbol FROM g2)),
       -- blocked candidate semantics, identical to the engine's
       -- span-key equi-join (Snapshots.spanKeys): a pair is a candidate
       -- only if the names share a >3-char whitespace-token SPAN *and*
       -- the reference predicate accepts it. The span condition makes
       -- the blocking envelope explicit on both sides — glued
       -- word-in-word containment (token 'Steel' inside 'PakSteelCo')
       -- is excluded HERE exactly as the engine excludes it.
       dspan AS (
         SELECT old_symbol, old_name,
           list_filter(flatten(list_transform(range(1, len(toks)+1), i ->
             list_transform(range(i, len(toks)+1), j ->
               array_to_string(toks[i:j], ' ')))), s -> length(s) > 3) AS old_spans
         FROM (SELECT old_symbol, old_name,
                 regexp_split_to_array(trim(old_name), ' +') AS toks FROM deleted)),
       aspan AS (
         SELECT new_symbol, new_name,
           list_filter(flatten(list_transform(range(1, len(toks)+1), i ->
             list_transform(range(i, len(toks)+1), j ->
               array_to_string(toks[i:j], ' ')))), s -> length(s) > 3) AS new_spans
         FROM (SELECT new_symbol, new_name,
                 regexp_split_to_array(trim(new_name), ' +') AS toks FROM added)),
       cand AS (
         SELECT old_symbol, old_name, new_symbol, new_name
         FROM dspan, aspan
         WHERE len(list_intersect(old_spans, new_spans)) > 0
           AND (instr(new_name, old_name) > 0 OR instr(old_name, new_name) > 0
            OR (length(old_name) > 10 AND length(new_name) > 10 AND
                len(list_filter(str_split(old_name, ' '),
                    w -> length(w) > 3 AND instr(new_name, w) > 0)) > 0))),
       ren1 AS (
         SELECT *, row_number() OVER (PARTITION BY old_symbol ORDER BY new_symbol) AS rn_old
         FROM cand),
       renamed AS (
         SELECT old_symbol, old_name, new_symbol, new_name FROM (
           SELECT *, row_number() OVER (PARTITION BY new_symbol ORDER BY old_symbol) AS rn_new
           FROM ren1 WHERE rn_old = 1) WHERE rn_new = 1)
    """

  private def withDiff(s: org.apache.spark.sql.SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val (g1, g2) = generations(s, dir)
    // cached: q12 consumes added/deleted twice each (anti-join branch +
    // rename derivation) and renamed THREE times (two anti sides + the
    // RENAMED branch) — uncached, the span-blocked rename join would
    // re-run once per union branch. All three are churn-sized (hundreds
    // of rows), so the cache is a few KB.
    val added = graft.Caches.cached(diffAdded(g2, g1, "symbol")
      .select(col("symbol").as("new_symbol"), col("name").as("new_name")))
    val deleted = graft.Caches.cached(diffDeleted(g2, g1, "symbol")
      .select(col("symbol").as("old_symbol"), col("name").as("old_name")))
    (added, deleted, graft.Caches.cached(detectRenames(deleted, added)))
  }

  val queries: Map[String, Q] = Map(
    // S13: both set differences, labeled and unioned.
    "q10_snapshot_diff" -> ((s, dir) => {
      val (added, deleted, _) = withDiff(s, dir)
      added.select(lit("ADDED").as("change_type"), col("new_symbol").as("symbol"))
        .unionByName(deleted.select(lit("DELETED").as("change_type"),
          col("old_symbol").as("symbol")))
        .orderBy("change_type", "symbol")
    }),

    // S14: deterministic fuzzy rename pairs.
    "q11_rename_detect" -> ((s, dir) => {
      val (_, _, renamed) = withDiff(s, dir)
      renamed.orderBy("old_symbol")
    }),

    // S15: full classified change log.
    "q12_change_log" -> ((s, dir) => {
      val (added, deleted, renamed) = withDiff(s, dir)
      changeLog(added, deleted, renamed).orderBy("change_type", "symbol")
    }),

    // S16: sentinel-aware merge of a stale snapshot against fresh details.
    "q13_merge_upsert" -> ((s, dir) => {
      val (old, fresh) = mergeInputs(s, dir)
      mergeUpsert(old, fresh).orderBy("symbol")
    }),

    // S17: update statistics over the merge result.
    "q14_update_stats" -> ((s, dir) => {
      val (old, fresh) = mergeInputs(s, dir)
      mergeUpsert(old, fresh).agg(
        count(lit(1)).as("total"),
        sum(col("name_updated")).as("updated_names"),
        sum(col("sector_updated")).as("updated_sectors"),
        sum(col("url_updated")).as("updated_urls"),
        sum(col("failed")).as("failed"),
        sum(when(col("name_updated") + col("sector_updated") + col("url_updated") === 0
          && col("failed") === 0, 1).otherwise(0)).as("no_change"))
    }),

    // S12: latest-snapshot resolution — newest order per customer.
    "q15_latest_snapshot" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      latestSnapshot(o, col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .orderBy("o_custkey")
    }),

    // SCD type-2 history build — the S15 change log generalized to the
    // warehouse dimension-history shape: a per-key change stream
    // (here: each user's event_type acts as the tracked attribute)
    // run-length-encodes into validity intervals [valid_from,
    // valid_to), open-ended on the current version. Two window passes
    // + one aggregate, all riding the SAME user_id hash partitioning
    // (sessionless (ts, event_id) total order): flag attribute
    // changes with lag, number versions with a running sum, aggregate
    // each run, then lead() closes each interval with its successor's
    // start. At 100 TB this is one exchange on the key and bounded
    // per-key state — the standard distributed SCD2 rebuild.
    "q117_scd2_intervals" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val versioned = Tables.events(s, dir)
        .filter(col("user_id") < 100)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("chg",
          (lag(col("event_type"), 1).over(byUser).isNull ||
            lag(col("event_type"), 1).over(byUser) =!= col("event_type"))
            .cast("int"))
        .withColumn("version", sum(col("chg")).over(run))
      val runs = versioned.groupBy(col("user_id"), col("version"))
        .agg(min(col("ts")).as("valid_from"),
          count(lit(1)).as("n_events"),
          min(col("event_type")).as("attr")) // constant within the run
      val byVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
      runs
        .withColumn("valid_to", lead(col("valid_from"), 1).over(byVer))
        .withColumn("is_current", col("valid_to").isNull)
        .select(col("user_id"), col("version"), col("attr"),
          col("valid_from"), col("valid_to"), col("n_events"),
          col("is_current"))
        .orderBy("user_id", "version")
    }),

    // JOIN-backed materialized-view maintenance — the S17 update-stats
    // pattern generalized to a view over a JOIN (revenue/order count
    // per customer nation): the STORED partial aggregate covers orders
    // before the cut, tonight's DELTA re-keys its orders through the
    // SAME dimension join and aggregates, and the merge is pure state
    // algebra (decimal sums add, counts add) — never a fact rescan.
    // The stored state is keyed by the dimension SURROGATE
    // (c_nationkey), with the display name joined at SERVE time, so a
    // dimension attribute rename relabels the view without
    // invalidating state (a dim KEY re-assignment would invalidate —
    // documented out of scope, as in every incremental-view system).
    // The oracle recomputes the view directly over the full join: the
    // hash match proves merge == recompute THROUGH the join. Scale
    // shape: state is nation-keyed (bounded); each night touches only
    // the delta; the customer hop is a stats-gated broadcast.
    "q204_mv_join_maintenance" -> ((s, dir) => {
      val cut = lit("1999-01-01 00:00:00").cast("timestamp")
      val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      def partial(orders: DataFrame) = orders
        .join(Tables.maybeBroadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(sum(col("o_totalprice").cast(graft.functions.Exact.D18_4)).as("rev"),
          count(lit(1)).as("n"))
      val o = Tables.orders(s, dir).select("o_custkey", "o_orderdate", "o_totalprice")
      val stored = partial(o.filter(col("o_orderdate") < cut))
      val delta = partial(o.filter(col("o_orderdate") >= cut))
      stored.unionByName(delta)
        .groupBy("c_nationkey")
        .agg(sum(col("rev")).as("rev"), sum(col("n")).as("n_orders"))
        .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("rev").cast("double").as("total_revenue"),
          col("n_orders"))
        .orderBy("n_name")
    })
  )

  /** S16 inputs: stale snapshot with planted in-band sentinels
    * (update_ticker_info.py / test_ticker_update.py:43-49 shape) and a
    * fresh-details table covering only even keys (odd = fetch failure). */
  private def mergeInputs(s: org.apache.spark.sql.SparkSession, dir: String): (DataFrame, DataFrame) = {
    val c = Tables.customer(s, dir).select("c_custkey", "c_name", "c_mktsegment")
    val sym = concat(lit("T"), col("c_custkey").cast("string"))
    val old = c.select(
      sym.as("symbol"),
      when(col("c_custkey") % 3 === 0, lit("No record found")).otherwise(col("c_name")).as("name"),
      when(col("c_custkey") % 4 === 0, lit("Unknown")).otherwise(col("c_mktsegment")).as("sector"),
      when(col("c_custkey") % 5 === 0, lit(""))
        .otherwise(concat(lit("https://dps.psx.com.pk/company/"), sym)).as("url"))
    val fresh = c.filter(col("c_custkey") % 2 === 0).select(
      sym.as("symbol"),
      col("c_name").as("name"),
      col("c_mktsegment").as("sector"),
      concat(lit("https://dps.psx.com.pk/company/"), sym).as("url"))
    (old, fresh)
  }

  private val mergeSql: String =
    """WITH old AS (
         SELECT 'T' || CAST(c_custkey AS VARCHAR) AS symbol,
                CASE WHEN c_custkey % 3 = 0 THEN 'No record found' ELSE c_name END AS name,
                CASE WHEN c_custkey % 4 = 0 THEN 'Unknown' ELSE c_mktsegment END AS sector,
                CASE WHEN c_custkey % 5 = 0 THEN ''
                     ELSE 'https://dps.psx.com.pk/company/T' || CAST(c_custkey AS VARCHAR) END AS url
         FROM customer),
       fresh AS (
         SELECT 'T' || CAST(c_custkey AS VARCHAR) AS symbol,
                c_name AS name, c_mktsegment AS sector,
                'https://dps.psx.com.pk/company/T' || CAST(c_custkey AS VARCHAR) AS url
         FROM customer WHERE c_custkey % 2 = 0),
       merged AS (
         SELECT o.symbol,
           CASE WHEN f.symbol IS NOT NULL AND f.name IS NOT NULL AND f.name <> o.symbol
                     AND f.name <> 'No record found' AND f.name <> o.name
                THEN f.name ELSE o.name END AS name,
           CASE WHEN f.symbol IS NOT NULL AND f.sector IS NOT NULL
                     AND f.sector <> 'Unknown' AND f.sector <> o.sector
                THEN f.sector ELSE o.sector END AS sector,
           CASE WHEN f.symbol IS NOT NULL AND f.url IS NOT NULL
                     AND f.url <> '' AND f.url <> o.url
                THEN f.url ELSE o.url END AS url,
           CAST(f.symbol IS NOT NULL AND f.name IS NOT NULL AND f.name <> o.symbol
                AND f.name <> 'No record found' AND f.name <> o.name AS INT) AS name_updated,
           CAST(f.symbol IS NOT NULL AND f.sector IS NOT NULL
                AND f.sector <> 'Unknown' AND f.sector <> o.sector AS INT) AS sector_updated,
           CAST(f.symbol IS NOT NULL AND f.url IS NOT NULL
                AND f.url <> '' AND f.url <> o.url AS INT) AS url_updated,
           CAST(f.symbol IS NULL AS INT) AS failed
         FROM old o LEFT JOIN fresh f ON o.symbol = f.symbol)
    """

  val oracles: Map[String, String] = Map(
    "q10_snapshot_diff" -> (genSql +
      """SELECT 'ADDED' AS change_type, new_symbol AS symbol FROM added
         UNION ALL
         SELECT 'DELETED' AS change_type, old_symbol AS symbol FROM deleted
         ORDER BY change_type, symbol"""),
    "q11_rename_detect" -> (genSql +
      """SELECT old_symbol, old_name, new_symbol, new_name FROM renamed
         ORDER BY old_symbol"""),
    "q12_change_log" -> (genSql +
      """SELECT 'ADDED' AS change_type, new_symbol AS symbol, CAST(NULL AS VARCHAR) AS new_symbol
         FROM added WHERE new_symbol NOT IN (SELECT new_symbol FROM renamed)
         UNION ALL
         SELECT 'DELETED' AS change_type, old_symbol AS symbol, CAST(NULL AS VARCHAR) AS new_symbol
         FROM deleted WHERE old_symbol NOT IN (SELECT old_symbol FROM renamed)
         UNION ALL
         SELECT 'RENAMED' AS change_type, old_symbol AS symbol, new_symbol FROM renamed
         ORDER BY change_type, symbol"""),
    "q13_merge_upsert" -> (mergeSql +
      """SELECT * FROM merged ORDER BY symbol"""),
    "q14_update_stats" -> (mergeSql +
      """SELECT COUNT(*) AS total,
         CAST(SUM(name_updated) AS BIGINT) AS updated_names,
         CAST(SUM(sector_updated) AS BIGINT) AS updated_sectors,
         CAST(SUM(url_updated) AS BIGINT) AS updated_urls,
         CAST(SUM(failed) AS BIGINT) AS failed,
         CAST(SUM(CASE WHEN name_updated + sector_updated + url_updated = 0 AND failed = 0
             THEN 1 ELSE 0 END) AS BIGINT) AS no_change
         FROM merged"""),
    "q15_latest_snapshot" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn = 1 ORDER BY o_custkey""",
    // run-length spelling mirrors Spark pass for pass; the version
    // running SUM is cast to BIGINT (window SUM widens to HUGEINT)
    "q117_scd2_intervals" ->
      """WITH e AS (
           SELECT user_id, event_id, ts, event_type FROM events
           WHERE user_id < 100),
         g AS (
           SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                  OR lag(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         v AS (
           SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS version
           FROM g),
         runs AS (
           SELECT user_id, version, MIN(ts) AS valid_from,
             COUNT(*) AS n_events, MIN(event_type) AS attr
           FROM v GROUP BY 1, 2)
         SELECT user_id, version, attr, valid_from,
           lead(valid_from) OVER w2 AS valid_to, n_events,
           lead(valid_from) OVER w2 IS NULL AS is_current
         FROM runs
         WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
         ORDER BY user_id, version""",
    "q204_mv_join_maintenance" ->
      """SELECT n_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
           COUNT(*) AS n_orders
         FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name"""
  )
}
