package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import graft.functions.Exact._

/** Structured-data QUALITY AUDITS — the validation layer every
  * ingest pipeline runs before facts are trusted (the reference's
  * defensive parsing culture — `scrape_tickers.py`'s fallback ladder
  * and column checks — generalized to declarative rule audits over
  * fact tables):
  *
  *  - q223: rule-based validation quarantine (which rows violate
  *    which policy, how many are clean) — the multi-rule split that
  *    feeds a dead-letter queue;
  *  - q224: Benford first-digit audit — the fraud/synthetic-data
  *    smell test over a monetary column;
  *  - q225: fact-vs-rollup reconciliation (order header total vs its
  *    lines) — the drift report between two sources of the same
  *    truth.
  *
  * Everything that crosses an aggregation is an exact integer (counts,
  * 1e-3 shares via DIV, cent-granule diffs), so all three hash-match
  * DuckDB. Scale shape: each audit is ONE pass over the fact table
  * (the rules evaluate as codegen'd boolean columns, the digit/diff
  * derivations as integer expressions) plus a tiny rollup — no joins
  * except q225's order-grain aggregate-then-join, which collapses the
  * fact table to order grain BEFORE the header join (the q07
  * aggregate-before-join discipline).
  */
object Quality {

  /** Benford expected first-digit shares, in 1e-3 granules — computed
    * once driver-side and inlined as literals into BOTH spellings, so
    * no engine ever evaluates log10 at query time. */
  private val benfordMilli: Map[Int, Long] =
    (1 to 9).map(d => d -> math.floor(math.log10(1.0 + 1.0 / d) * 1000).toLong).toMap

  val queries: Map[String, Q] = Map(
    // RULE-BASED VALIDATION QUARANTINE: each policy evaluates as a
    // boolean column in the same scan pass; the report is one row per
    // rule (flag counts overlap — a row can break several policies)
    // plus the clean/quarantined accounting a dead-letter router
    // needs. A rule that fires zero times is signal too (the flag
    // domain is intact), so it stays in the report.
    "q223_quarantine" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_discount"), col("l_quantity"), col("l_returnflag"))
        .withColumn("r_overdiscount", col("l_discount") > 0.08)
        .withColumn("r_qty_range",
          col("l_quantity") <= 0 || col("l_quantity") > 45)
        .withColumn("r_flag_domain",
          !col("l_returnflag").isin("A", "N", "R"))
      val agg = li.agg(
        count(lit(1)).as("n_rows"),
        sum(col("r_overdiscount").cast("long")).as("overdiscount"),
        sum(col("r_qty_range").cast("long")).as("qty_range"),
        sum(col("r_flag_domain").cast("long")).as("flag_domain"),
        sum((col("r_overdiscount") || col("r_qty_range") ||
          col("r_flag_domain")).cast("long")).as("quarantined"))
      agg.select(col("n_rows"), col("quarantined"),
          (col("n_rows") - col("quarantined")).as("clean"),
          expr("stack(3, 'overdiscount', overdiscount, " +
            "'qty_range', qty_range, 'flag_domain', flag_domain) " +
            "AS (rule, n_flagged)"))
        .select(col("rule"), col("n_flagged"), col("n_rows"),
          col("quarantined"), col("clean"),
          expr("(n_flagged * 1000) DIV n_rows").as("share_milli"))
        .orderBy("rule")
    }),

    // BENFORD FIRST-DIGIT AUDIT over l_extendedprice: the first
    // significant digit is taken INTEGER-only (floor → BIGINT →
    // string head — no log10 at query time, whose last-ulp rounding
    // is not portable across engines), counts roll up per digit, and
    // the report carries observed vs expected 1e-3 shares and their
    // signed deviation. Uniform synthetic prices deviate from Benford
    // — the audit's job is to SAY so, with exact numbers.
    "q224_benford" -> ((s, dir) => {
      val exp = typedlit((1 to 9).map(d => benfordMilli(d)))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_extendedprice") >= 1)
        .select(substring(floor(col("l_extendedprice")).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
      val tot = li.groupBy("digit").agg(count(lit(1)).as("n"))
        .withColumn("total", sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      tot.select(col("digit").cast("long").as("digit"), col("n"),
          expr("(n * 1000) DIV total").as("obs_milli"),
          element_at(exp, col("digit").cast("int")).as("exp_milli"))
        .withColumn("dev_milli", col("obs_milli") - col("exp_milli"))
        .orderBy("digit")
    }),

    // FACT-VS-ROLLUP RECONCILIATION: order header totals against the
    // sum of their lines (extendedprice·(1−disc)·(1+tax), the TPC-H
    // pricing identity). Diffs compare in exact CENT granules —
    // floor(header·100) vs the DECIMAL line sum scaled to cents —
    // so the mismatch count and the diff extremes are integers, not
    // fp comparisons. The line sum collapses to ORDER grain before
    // the header join; headers without lines surface as their own
    // count, never silently vanish (left join + null accounting).
    "q225_order_reconcile" -> ((s, dir) => {
      // ALL-INTEGER pricing identity: price/discount/tax carry ≤2
      // decimals, so cent-granule longs are exact and the triple
      // product needs no decimal type at all (whose intermediate
      // precision/scale rules differ between engines); the final
      // DIV 10000 is floor on non-negative values in both.
      val ls = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o_orderkey"),
          floor(col("l_extendedprice") * 100).cast("long").as("pc"),
          floor(col("l_discount") * 100).cast("long").as("dc"),
          floor(col("l_tax") * 100).cast("long").as("tc"))
        .groupBy("o_orderkey")
        .agg(expr("SUM(pc * (100 - dc) * (100 + tc)) DIV 10000")
          .as("line_cents"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("hdr_cents"))
        .join(ls, Seq("o_orderkey"), "left")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("line_cents").isNull.cast("long")).as("n_no_lines"),
          sum((col("line_cents").isNotNull &&
            abs(col("hdr_cents") - col("line_cents")) > 1).cast("long"))
            .as("n_mismatched"),
          max(when(col("line_cents").isNotNull,
            abs(col("hdr_cents") - col("line_cents")))).as("max_abs_diff_cents"),
          sum(when(col("line_cents").isNotNull,
            abs(col("hdr_cents") - col("line_cents"))).otherwise(lit(0L)))
            .as("sum_abs_diff_cents"))
        .orderBy("o_orderpriority")
    }),

    // COLUMN PROFILER — the one-pass table summary (null rate, exact
    // distinct count, numeric/lexicographic envelopes per column)
    // every catalog/data-discovery layer computes on ingest. One scan:
    // all per-column aggregates ride a single agg row (exact multi-
    // column COUNT(DISTINCT) — Catalyst plans one Expand; at true
    // 100 TB the profiler would swap in approx_count_distinct, noted
    // here, but the profile CONTRACT is exact), then one explode
    // unpivots the row to column grain. Cross-engine discipline:
    // numeric envelopes surface as DOUBLE (every source type here is
    // exactly representable), string envelopes as binary-collation
    // min/max (ASCII data — identical order both engines); no
    // double→string rendering anywhere (engines format differently).
    "q242_column_profile" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      def numProf(cname: String) = struct(
        lit(cname).as("column_name"),
        sum(col(cname).isNull.cast("long")).as("n_null"),
        count_distinct(col(cname)).as("n_distinct"),
        min(col(cname)).cast("double").as("min_num"),
        max(col(cname)).cast("double").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
      def strProf(cname: String) = struct(
        lit(cname).as("column_name"),
        sum(col(cname).isNull.cast("long")).as("n_null"),
        count_distinct(col(cname)).as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        min(col(cname)).as("min_str"),
        max(col(cname)).as("max_str"))
      c.agg(count(lit(1)).as("n_rows"),
          numProf("c_custkey").as("p1"), strProf("c_name").as("p2"),
          numProf("c_nationkey").as("p3"), numProf("c_acctbal").as("p4"),
          strProf("c_mktsegment").as("p5"))
        .select(col("n_rows"), explode(array(
          col("p1"), col("p2"), col("p3"), col("p4"), col("p5"))).as("p"))
        .select(col("p.column_name"), col("n_rows"), col("p.n_null"),
          col("p.n_distinct"), col("p.min_num"), col("p.max_num"),
          col("p.min_str"), col("p.max_str"))
        .orderBy("column_name")
    })
  )

  val oracles: Map[String, String] = Map(
    "q223_quarantine" ->
      """WITH f AS (
           SELECT CAST(l_discount > 0.08 AS INT) AS r_over,
             CAST(l_quantity <= 0 OR l_quantity > 45 AS INT) AS r_qty,
             CAST(l_returnflag NOT IN ('A', 'N', 'R') AS INT) AS r_flag
           FROM lineitem),
         a AS (
           SELECT COUNT(*) AS n_rows,
             CAST(SUM(r_over) AS BIGINT) AS overdiscount,
             CAST(SUM(r_qty) AS BIGINT) AS qty_range,
             CAST(SUM(r_flag) AS BIGINT) AS flag_domain,
             CAST(SUM(CAST(r_over + r_qty + r_flag > 0 AS INT)) AS BIGINT)
               AS quarantined
           FROM f),
         rules AS (
           SELECT 'overdiscount' AS rule, overdiscount AS n_flagged,
             n_rows, quarantined FROM a
           UNION ALL
           SELECT 'qty_range', qty_range, n_rows, quarantined FROM a
           UNION ALL
           SELECT 'flag_domain', flag_domain, n_rows, quarantined FROM a)
         SELECT rule, n_flagged, n_rows, quarantined,
           n_rows - quarantined AS clean,
           (n_flagged * 1000) // n_rows AS share_milli
         FROM rules ORDER BY rule""",
    "q224_benford" -> {
      val expCase = (1 to 9).map(d =>
        s"WHEN $d THEN CAST(${benfordMilli(d)} AS BIGINT)").mkString(" ")
      s"""WITH d AS (
           SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
             AS VARCHAR), 1, 1) AS INT) AS digit
           FROM lineitem WHERE l_extendedprice >= 1),
         c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
         t AS (SELECT digit, n,
                 CAST(SUM(n) OVER () AS BIGINT) AS total FROM c)
         SELECT CAST(digit AS BIGINT) AS digit, n,
           (n * 1000) // total AS obs_milli,
           CASE digit $expCase END AS exp_milli,
           (n * 1000) // total - (CASE digit $expCase END) AS dev_milli
         FROM t ORDER BY digit"""
    },
    "q225_order_reconcile" ->
      """WITH li AS (
           SELECT l_orderkey AS o_orderkey,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(floor(l_discount * 100) AS BIGINT) AS dc,
             CAST(floor(l_tax * 100) AS BIGINT) AS tc
           FROM lineitem),
         ls AS (
           SELECT o_orderkey,
             CAST(SUM(pc * (100 - dc) * (100 + tc)) AS BIGINT) // 10000
               AS line_cents
           FROM li GROUP BY 1),
         j AS (
           SELECT o.o_orderpriority,
             CAST(floor(o.o_totalprice * 100) AS BIGINT) AS hdr_cents,
             ls.line_cents
           FROM orders o LEFT JOIN ls ON o.o_orderkey = ls.o_orderkey)
         SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN line_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_no_lines,
           CAST(SUM(CASE WHEN line_cents IS NOT NULL
             AND abs(hdr_cents - line_cents) > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mismatched,
           CAST(MAX(CASE WHEN line_cents IS NOT NULL
             THEN abs(hdr_cents - line_cents) END) AS BIGINT)
             AS max_abs_diff_cents,
           CAST(SUM(CASE WHEN line_cents IS NOT NULL
             THEN abs(hdr_cents - line_cents) ELSE 0 END) AS BIGINT)
             AS sum_abs_diff_cents
         FROM j GROUP BY 1 ORDER BY 1""",
    "q242_column_profile" ->
      """SELECT 'c_custkey' AS column_name, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(DISTINCT c_custkey) AS n_distinct,
           CAST(MIN(c_custkey) AS DOUBLE) AS min_num,
           CAST(MAX(c_custkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         FROM customer
         UNION ALL
         SELECT 'c_name', COUNT(*),
           CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT c_name), NULL, NULL, MIN(c_name), MAX(c_name)
         FROM customer
         UNION ALL
         SELECT 'c_nationkey', COUNT(*),
           CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT c_nationkey),
           CAST(MIN(c_nationkey) AS DOUBLE), CAST(MAX(c_nationkey) AS DOUBLE),
           NULL, NULL
         FROM customer
         UNION ALL
         SELECT 'c_acctbal', COUNT(*),
           CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT c_acctbal),
           CAST(MIN(c_acctbal) AS DOUBLE), CAST(MAX(c_acctbal) AS DOUBLE),
           NULL, NULL
         FROM customer
         UNION ALL
         SELECT 'c_mktsegment', COUNT(*),
           CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT c_mktsegment), NULL, NULL,
           MIN(c_mktsegment), MAX(c_mktsegment)
         FROM customer
         ORDER BY column_name"""
  )
}
